"""Smoke-run every examples/ script end-to-end at sf0.001.

The examples are the repo's user-facing entry points; nothing else in
CI imports them, so an API rename that breaks `examples/*.py` would
otherwise ship silently.  Each runs as a subprocess (the scripts own
their SparkSession lifecycle, including spark.stop(), which must not
kill the shared test fixture session) against the smallest testdata
scale, asserting exit code 0 and a non-empty stdout.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import pytest

# Fast-tier policy (r15): this whole module is a crash-injection /
# randomized-differential / end-to-end marathon -- the coverage the
# FULL suite owns.  The driver's budgeted run uses the default
# `-m "not slow"` tier (pytest.ini); run everything with `-m ""`.
pytestmark = pytest.mark.slow


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

# script -> argv tail (every script defaults its sf_dir, but passing
# sf0.001 explicitly keeps the smoke run at the smallest scale even
# where the default is sf0.01)
EXAMPLES: dict[str, list[str]] = {
    "ann_pipeline.py": [SF],
    "quickstart.py": [],
    "chained_views.py": [],
    "corpus_pipeline.py": [SF],
    "event_analytics.py": [SF],
    "media_pipeline.py": [],
    "retrieval_pipeline.py": [SF],
    "training_prep.py": [SF],
    "transactional_cdc.py": [],
    "replica_maintenance.py": [],
}


@pytest.mark.parametrize("script", sorted(EXAMPLES))
def test_example_runs_clean(script):
    args = list(EXAMPLES[script])
    if script in ("corpus_pipeline.py", "training_prep.py"):
        args.append(tempfile.mkdtemp(prefix=f"ex-{script.split('.')[0]}-"))
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
        env=env,
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stderr[-2000:]}"
    assert proc.stdout.strip(), f"{script} printed nothing"
