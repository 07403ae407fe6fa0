"""Corpus-assembly operators for training-data pipelines: mixture
sampling, token-budget selection, and sequence packing.

These are the steps BETWEEN a cleaned/deduped corpus and a training
run: decide how much of each source to keep (mixture), cap each
stratum at a token budget (selection), and lay documents into
fixed-length training sequences (packing).  All three are built from
deterministic hashes and partition-local window functions:

- no RNG state, no sampling pass, no driver-side ordering -- every
  decision derives from ``md5(doc_id)`` or a shard-local prefix sum,
  so results are stable under appends, retries, and repartitioning
  (the property a resumable 100 TB ingestion actually needs);
- windows are always partitioned by a bounded-cardinality shard key
  (never a single global window), so each window task sees ~1/shards
  of the stratum and the operators parallelize like any keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .corpus import hash_bucket
from .text import tokens


def mixture_sample(
    docs: DataFrame,
    rate_thresholds: list[tuple[str, int]],
    default_threshold: int = 26,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic per-source downsampling -- the domain-mixing step
    of a training-data pipeline (e.g. keep 100% of books, 25% of web).

    ``rate_thresholds``: (source-prefix, threshold) pairs; a doc
    survives when its md5 bucket (uniform in [0, 256)) is below the
    first matching threshold, so threshold 128 = 50% of that source,
    256 = keep all.  Hash-gated rather than ``sample()``: membership
    is a pure function of the id, so re-running a failed shard or
    appending new data never changes previous decisions, and no
    sampling pass or RNG seed plumbing exists at all.  Filter is a
    codegen'd expression -- pushed into the scan, zero shuffles.
    """
    b = hash_bucket(F.col(id_col))
    # when-chain in declaration order: first matching prefix wins
    thr = F.lit(default_threshold)
    for prefix, t in reversed(rate_thresholds):
        thr = F.when(F.col(source_col).startswith(prefix), F.lit(t)).otherwise(thr)
    return docs.filter(b < thr)


def shuffle_shards(
    rows: DataFrame,
    n_shards: int = 64,
    seed: str = "0",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards.

    The last training-prep step after ``sequence_pack``: training wants
    the corpus in random order, but a 100 TB backfill also wants
    RERUNS to produce byte-identical shards (resume a failed write,
    regenerate one shard, diff two pipeline versions).  So the
    "shuffle" is a pure function of (seed, key): every row lands in
    ``shard = md5(seed|key) nibbles 1-6 mod n_shards`` and gets a
    within-shard position ``pos`` by ordering on DISJOINT hash nibbles
    7-32 (key as tiebreak) -- uniform placement, deterministic order,
    no RNG state, no sampling pass, stable under retries/appends/input
    layout, matching the determinism contract of ``mixture_sample``
    and ``corpus_split``.

    ONE exchange: the shard window's hash partitioning.  Window task
    size is |rows| / n_shards -- pick n_shards for the shard FILE size
    you want (hundreds at corpus scale), which simultaneously bounds
    the sort.  Changing ``seed`` is a full reshuffle by construction.
    Returns the input columns + (shard int, pos bigint).
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(f"{seed}|"), F.col(key_col).cast("string")))
    w = Window.partitionBy("shard").orderBy(
        F.substring("__h", 7, 26).asc(), F.col(key_col).asc()
    )
    return (
        rows.withColumn("__h", h)
        .withColumn(
            "shard",
            F.pmod(
                F.conv(F.substring("__h", 1, 6), 16, 10).cast("long"),
                F.lit(n_shards),
            ).cast("int"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__h")
    )


def token_budget_select(
    docs: DataFrame,
    budget_per_shard: int,
    n_shards: int = 8,
    stratum_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    order_col: str = "n_chars",
) -> DataFrame:
    """Cap each stratum at a token budget, preferring higher
    ``order_col`` docs -- 'take the best N tokens per language'.

    The budget is enforced per (stratum, shard) where shard =
    ``md5(doc_id) % n_shards``: the global stratum budget is
    ``n_shards * budget_per_shard`` and each shard fills its quota
    independently.  That sharding is the scale design, not a
    shortcut -- a single-stratum prefix sum would serialize millions
    of docs through one window task, while the per-shard window is
    bounded and embarrassingly parallel (the standard approximation
    for distributed budget selection; the hash makes shard quotas
    statistically even).

    Returns (doc_id, stratum, shard, n_tok, cum_tok) for every doc
    whose shard-local running total fits the budget.
    """
    from pyspark.sql.window import Window

    tok = F.size(tokens(F.col(text_col))).cast("long")
    shard = (hash_bucket(F.col(id_col)) % n_shards).alias("shard")
    w = (
        Window.partitionBy("stratum", "shard")
        .orderBy(F.col(order_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(stratum_col).alias("stratum"),
            shard,
            F.col(order_col),
            tok.alias("n_tok"),
        )
        .withColumn("cum_tok", F.sum("n_tok").over(w))
        .filter(F.col("cum_tok") <= budget_per_shard)
        .select(id_col, "stratum", "shard", "n_tok", "cum_tok")
    )


def sequence_pack(
    docs: DataFrame,
    max_len: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to fixed-token-length training sequences.

    Deterministic contiguous packing: within shard =
    ``md5(doc_id) % n_shards``, docs are laid out in id order and a
    doc joins the sequence in which its running token total starts
    (``seq_id = floor(cum_before / max_len)``).  A doc longer than
    ``max_len`` owns the sequences it spans, exactly like a real
    token-stream packer; the downstream tokenizer splits at token
    granularity.

    One shuffle (the per-shard window); shard count bounds window
    task size, so packing 100 TB is n_shards-way parallel and
    restart-stable (no RNG, no order dependence on input file
    layout).  Returns (doc_id, shard, seq_id, n_tok).
    """
    from pyspark.sql.window import Window

    tok = F.size(tokens(F.col(text_col))).cast("long")
    shard = (hash_bucket(F.col(id_col)) % n_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(F.col(id_col), shard, tok.alias("n_tok"))
        .withColumn("cum_tok", F.sum("n_tok").over(w))
        .select(
            id_col,
            "shard",
            F.floor((F.col("cum_tok") - F.col("n_tok")) / max_len).alias("seq_id"),
            "n_tok",
        )
    )


# ---------------------------------------------------------------------------
# Shard export with integrity manifest -- the final write of the
# training-prep chain (mixture -> budget -> pack -> shuffle -> EXPORT).
# ---------------------------------------------------------------------------

_CHECKSUM_MOD = 1_000_000_007


def _shard_stats(shards: DataFrame) -> DataFrame:
    """Per-shard (rows, checksum): the checksum is a commutative sum
    of row hashes over EVERY column (``pos`` included), safe to
    compute in any order.  It detects CONTENT corruption -- a
    dropped/duplicated row, a mutated cell, a corrupted ``pos`` value
    -- not physical file layout: shard order is DEFINED by the ``pos``
    column, so a consumer must read ``ORDER BY pos`` (or trust the
    single-writer layout) rather than rely on the checksum to notice
    physically shuffled rows whose ``pos`` values are intact."""
    cols = sorted(shards.columns)
    return shards.groupBy("shard").agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.pmod(F.xxhash64(*cols), F.lit(_CHECKSUM_MOD))).alias("checksum"),
    )


def export_shards(
    shards: DataFrame,
    path: str,
    manifest_path: str | None = None,
) -> dict:
    """Write :func:`shuffle_shards` output as ``shard=<k>/`` parquet
    directories, one file per shard, rows ordered by ``pos``, plus a
    JSON manifest recording each shard's row count and content
    checksum.

    Why a manifest: a 100 TB training export is written by thousands
    of tasks over hours; the consumer (a training job on a different
    cluster, possibly weeks later) needs a cheap answer to "is this
    the complete, uncorrupted export?" without re-deriving the
    pipeline.  :func:`verify_shards` re-aggregates the written files
    against the manifest -- row count and content checksum per shard
    (order is carried by the ``pos`` column, not the checksum; see
    ``_shard_stats``) -- in one scan.

    Mechanics: each shard is hash-routed to one task (``repartition``
    on the shard column) and sorted by ``pos`` inside it, so every
    ``shard=<k>`` directory holds exactly ONE file whose row order is
    the deterministic shuffle order -- reruns produce byte-identical
    shard contents.  The manifest aggregate is O(n_shards) driver
    state.  Two passes over the rows (stats + write); callers
    exporting from a long lineage should checkpoint/persist upstream.
    """
    import json as _json
    import os as _os

    stats = {
        int(r["shard"]): (int(r["rows"]), int(r["checksum"]))
        for r in _shard_stats(shards).collect()
    }
    (
        # sort by (shard, pos): the dynamic-partition writer requires
        # an ordering on the partition column and would insert its own
        # (pos-destroying) sort if the data didn't already satisfy it
        shards.repartition(F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    manifest = {
        "n_shards": len(stats),
        "total_rows": sum(r for r, _ in stats.values()),
        "shards": {
            str(k): {"rows": r, "checksum": c}
            for k, (r, c) in sorted(stats.items())
        },
    }
    mpath = manifest_path or _os.path.join(path, "_shard_manifest.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump(manifest, fh, indent=1, sort_keys=True)
    _os.replace(tmp, mpath)
    return manifest


def verify_shards(
    spark,
    path: str,
    manifest_path: str | None = None,
) -> dict:
    """Re-aggregate a shard export against its manifest.  Returns
    ``{"ok": bool, "missing": [...], "extra": [...], "mismatched":
    [...]}`` -- one scan of the export, O(n_shards) driver state.

    Catches the three 100 TB failure modes: a shard directory lost
    (task retried into the void, partial copy), a foreign/duplicated
    shard, and silent CONTENT corruption -- a mutated cell, a dropped
    or duplicated row, a corrupted ``pos`` value (the checksum hashes
    every column including ``pos``).  Physical row order within a file
    is NOT checked: shard order is defined by ``pos``, which consumers
    read ``ORDER BY`` (see ``_shard_stats``)."""
    import json as _json
    import os as _os

    mpath = manifest_path or _os.path.join(path, "_shard_manifest.json")
    with open(mpath) as fh:
        manifest = _json.load(fh)
    actual = {
        int(r["shard"]): (int(r["rows"]), int(r["checksum"]))
        for r in _shard_stats(spark.read.parquet(path)).collect()
    }
    expected = {
        int(k): (v["rows"], v["checksum"])
        for k, v in manifest["shards"].items()
    }
    missing = sorted(k for k in expected if k not in actual)
    extra = sorted(k for k in actual if k not in expected)
    mismatched = sorted(
        k for k in expected if k in actual and actual[k] != expected[k]
    )
    return {
        "ok": not (missing or extra or mismatched),
        "missing": missing,
        "extra": extra,
        "mismatched": mismatched,
    }


def export_shards_incremental(
    shards: DataFrame,
    path: str,
    manifest_path: str | None = None,
) -> dict:
    """Re-export after an upstream change, rewriting ONLY the shards
    whose content actually moved.

    Because shard assignment is a pure hash of (seed, key)
    (:func:`shuffle_shards`), an appended/backfilled document changes
    exactly one shard's membership -- so a delta ingest should not
    rewrite the other N-1 shard files.  This pass recomputes the
    per-shard (rows, checksum) stats (one scan -- compute is
    O(corpus), unavoidable since within-shard positions are
    rank-based), diffs them against the stored manifest, and uses
    dynamic partition overwrite to replace only the changed
    ``shard=<k>`` directories; unchanged shards' files are untouched
    on disk (asserted byte-for-byte in tests).  Shards that lost ALL
    rows are deleted.  Returns ``{"rewritten": [...], "removed":
    [...], "unchanged": [...], "manifest": {...}}``.

    At 100 TB this is the difference between "nightly full shard
    rewrite" and write I/O proportional to the delta's shard
    footprint -- the same contract as the store's bucket-pruned MERGE.
    """
    import json as _json
    import os as _os
    import shutil as _shutil

    mpath = manifest_path or _os.path.join(path, "_shard_manifest.json")
    try:
        with open(mpath) as fh:
            old = {
                int(k): (v["rows"], v["checksum"])
                for k, v in _json.load(fh)["shards"].items()
            }
    except (OSError, ValueError, KeyError):
        old = {}

    stats = {
        int(r["shard"]): (int(r["rows"]), int(r["checksum"]))
        for r in _shard_stats(shards).collect()
    }
    changed = sorted(k for k in stats if old.get(k) != stats[k])
    removed = sorted(k for k in old if k not in stats)
    unchanged = sorted(k for k in stats if old.get(k) == stats[k])

    if changed:
        (
            shards.filter(F.col("shard").isin([int(k) for k in changed]))
            .repartition(F.col("shard"))
            .sortWithinPartitions("shard", "pos")
            .write.partitionBy("shard")
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(path)
        )
    for k in removed:
        _shutil.rmtree(_os.path.join(path, f"shard={k}"), ignore_errors=True)

    manifest = {
        "n_shards": len(stats),
        "total_rows": sum(r for r, _ in stats.values()),
        "shards": {
            str(k): {"rows": r, "checksum": c}
            for k, (r, c) in sorted(stats.items())
        },
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump(manifest, fh, indent=1, sort_keys=True)
    _os.replace(tmp, mpath)
    return {
        "rewritten": changed,
        "removed": removed,
        "unchanged": unchanged,
        "manifest": manifest,
    }
