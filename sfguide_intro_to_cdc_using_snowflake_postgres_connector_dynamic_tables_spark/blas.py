"""Scoped control of the in-process BLAS thread pool.

The quantizer trainers (``operators/similarity.kmeans_on_sample`` and
everything built on it) run thousands of TINY numpy GEMV/GEMM calls on
the driver.  numpy's bundled OpenBLAS sizes its pool to every visible
core (32 here), and for matrices this small the pool's wake/handshake
cost dwarfs the math: measured on the 8x256 PQ tier at sf0.1, one
(2000, 8) GEMV costs ~3.7 ms with the 32-thread pool vs ~10 us single-
threaded -- 8.5 s -> 0.55 s for one ``pq_train_on_sample`` call.  Worse,
the spinning threads contend with the 32 local-mode Spark task threads,
so the overhead GROWS with box load (the r14 driver record read
pq_topk_rerank at 25.5 s warm under full-bench conditions vs 2.6 s
isolated, and the 8-core run beat the 32-core run 3.5x).

``single_thread_blas()`` pins the pool to one thread for the duration
of a block and restores the previous setting after.  Thread count does
not change results for these shapes (OpenBLAS partitions the output,
not the reduction axis; bit-identity of the trained centroids across
thread counts is pinned by tests/test_blas.py) -- but the trainers are
ALSO shared verbatim with the oracle generators, so even a rounding
flip could never put the engine and its oracle on different centroids.

Python workers get the same treatment via the ``OPENBLAS_NUM_THREADS``
environment variable exported in ``session.get_spark`` before the JVM
(and therefore the worker daemon) starts: 32 concurrent tasks each
spinning up a 32-thread BLAS pool is pure oversubscription at full
parallelism.  The ctypes path below exists because the driver's numpy
is typically imported (and its pool initialized) long before any of
our code runs, when the env var can no longer take effect.
"""

from __future__ import annotations

import contextlib
import ctypes
import os

_SET = None
_GET = None
_RESOLVED = False


def _resolve() -> None:
    """Locate openblas_{set,get}_num_threads in the ALREADY-LOADED
    OpenBLAS (found via /proc/self/maps; ``ctypes.CDLL`` on a loaded
    path returns the live instance).  Best-effort: on a non-Linux box
    or a non-OpenBLAS numpy the context manager degrades to a no-op."""
    global _SET, _GET, _RESOLVED
    if _RESOLVED:
        return
    _RESOLVED = True
    try:
        import numpy  # noqa: F401  -- ensure the BLAS is mapped
    except ImportError:
        return
    try:
        with open(f"/proc/{os.getpid()}/maps") as fh:
            paths = sorted(
                {
                    line.split()[-1]
                    for line in fh
                    if "openblas" in line and line.split()[-1].startswith("/")
                }
            )
    except OSError:
        return
    for path in paths:
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        # ILP64 builds (numpy's bundled lib) suffix the API with '64_'
        for suffix in ("64_", ""):
            setter = getattr(lib, f"openblas_set_num_threads{suffix}", None)
            getter = getattr(lib, f"openblas_get_num_threads{suffix}", None)
            if setter is not None and getter is not None:
                globals()["_SET"], globals()["_GET"] = setter, getter
                return


@contextlib.contextmanager
def single_thread_blas():
    """Run the block with the BLAS pool pinned to 1 thread, restoring
    the previous pool size on exit.  No-op where OpenBLAS control is
    unavailable."""
    _resolve()
    if _SET is None or _GET is None:
        yield
        return
    prev = _GET()
    _SET(1)
    try:
        yield
    finally:
        _SET(prev)
