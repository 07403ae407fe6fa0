"""Deduplication family for large text corpora.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine -- the
standard near-dup toolkit for LLM training-data pipelines, each built
scale-first:

- exact + minhash are pure built-in expressions (codegen'd, no Python);
- the LSH band join is the only shuffle, keyed on (band_id, band_hash)
  so candidate generation is O(sum of bucket sizes squared), never the
  full cross join;
- simhash uses a vectorized pandas UDF (Arrow-batched numpy, no
  per-row Python);
- embedding near-dup offers brute-force (oracle/baseline) and
  LSH-bucketed (scale path) variants.

MinHash design note: each "permutation" is the lexicographic MIN of a
salted md5 over the token set.  md5 is identical across engines, and
``min(varchar)`` is plain ASCII ordering -- so the DuckDB oracle can
reproduce signatures byte-for-byte, which keeps this operator under the
strong hash-match gate instead of a weak rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens


def dedup_exact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Hash-groupBy exact dedup: one surviving (min-id) doc per distinct
    text, with the duplicate count."""
    h = F.md5(F.encode(F.col(text_col), "UTF-8"))
    return (
        docs.select(h.alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_doc_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def _token_set(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("token"))
        .distinct()
    )


def minhash_signatures(
    tok: DataFrame, num_hashes: int = 6
) -> DataFrame:
    """k salted-md5 minimum hashes per doc (columns h1..hk)."""
    aggs = [
        F.min(F.md5(F.encode(F.concat(F.lit(f"{i}|"), F.col("token")), "UTF-8"))).alias(f"h{i}")
        for i in range(1, num_hashes + 1)
    ]
    return tok.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 6,
    band_size: int = 2,
    threshold: float = 0.5,
    block_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs by MinHash banding + exact Jaccard verify.

    Pipeline: token sets -> k min-hashes -> k/band_size band keys ->
    self-join on band key (candidates) -> exact token-set Jaccard ->
    filter >= threshold.  Returns (doc_a, doc_b, jaccard) with
    doc_a < doc_b.

    ``block_col``: optional blocking key (e.g. source/shard/language)
    folded into the band hash, so only same-block pairs become
    candidates.  At corpus scale this is the standard lever that keeps
    LSH bucket sizes bounded when the similarity distribution is dense
    (every skewed bucket is split by block), and it turns the band
    self-join into a per-block shuffle.
    """
    tok = _token_set(docs, text_col, id_col)
    blocks = (
        docs.select(F.col(id_col).alias("doc_id"), F.col(block_col).alias("__block"))
        if block_col is not None
        else None
    )
    return lsh_pairs_from_tokens(tok, num_hashes, band_size, threshold, blocks)


def lsh_pairs_from_tokens(
    tok: DataFrame,
    num_hashes: int = 6,
    band_size: int = 2,
    threshold: float = 0.5,
    blocks: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs over a prepared (doc_id, token) set
    table -- the shared engine behind word-set and shingle-set dedup.
    ``blocks``: optional (doc_id, __block) blocking-key table.

    One shuffle of the token table produces BOTH the minhash signature
    and the verification token-set/size per doc (fused aggregate);
    everything downstream works on the per-doc table (|docs| rows).
    """
    per_doc_aggs = [
        F.min(
            F.md5(F.encode(F.concat(F.lit(f"{i}|"), F.col("token")), "UTF-8"))
        ).alias(f"h{i}")
        for i in range(1, num_hashes + 1)
    ] + [F.collect_set("token").alias("toks"), F.count(F.lit(1)).alias("n")]
    sig = tok.groupBy("doc_id").agg(*per_doc_aggs).cache()
    if blocks is not None:
        sig = sig.join(blocks, "doc_id")
    block_col = None if blocks is None else "__block"

    n_bands = num_hashes // band_size
    band_frames = []
    for b in range(n_bands):
        cols = [F.col(f"h{b * band_size + j + 1}") for j in range(band_size)]
        if block_col is not None:
            cols = [F.col("__block"), F.lit("|"), *cols]
        band_frames.append(
            sig.select("doc_id", F.md5(F.encode(F.concat(*cols), "UTF-8")).alias("band"))
        )
    bands = band_frames[0]
    for f in band_frames[1:]:
        bands = bands.unionByName(f)

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # Exact-verify via per-doc token-set arrays: one array_intersect per
    # candidate pair beats re-exploding tokens through two joins (the
    # doc-set table is |docs| rows -- broadcastable at any corpus size
    # where candidates fit; at larger scale it hash-joins on doc id).
    docsets = sig.select("doc_id", "toks", "n")
    jac = (
        cand.join(
            docsets.select(
                F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a"), F.col("n").alias("n_a")
            ),
            "doc_a",
        )
        .join(
            docsets.select(
                F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b"), F.col("n").alias("n_b")
            ),
            "doc_b",
        )
        .withColumn("n_inter", F.size(F.array_intersect("toks_a", "toks_b")))
        .select(
            "doc_a",
            "doc_b",
            (F.col("n_inter") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias(
                "jaccard"
            ),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.6,
) -> DataFrame:
    """Word n-gram (shingle) Jaccard near-dup: exact pairwise Jaccard
    over n-gram sets, with MinHash banding pruning the pair space.

    Same LSH skeleton as ``minhash_lsh_pairs`` but the set elements are
    order-sensitive n-grams, so reordered documents stop matching.
    """
    toks = tokens(F.col(text_col))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws("_", F.slice(toks, i + 1, n)),
        )
    )
    gram_docs = docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("token")).distinct()
    # shingle sets feed the shared LSH engine directly -- no re-serialize/
    # re-tokenize round trip
    return lsh_pairs_from_tokens(gram_docs, threshold=threshold)


def embedding_cosine_pairs_bruteforce(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs with cosine >= threshold, exact O(n^2) -- the
    correctness baseline and the oracle for the LSH variant.

    Kernel: the full (normalized) matrix is broadcast to executors and
    each Arrow batch of rows computes one BLAS block-multiply against
    it, emitting only qualifying pairs -- the standard all-pairs
    similarity layout.  A 10M x 128-dim corpus broadcasts ~5 GB, which
    is the practical ceiling; beyond that, switch to
    ``embedding_cosine_pairs_lsh`` (bucketed, no broadcast) -- same
    output contract, tested against this baseline.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    rows = emb.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    M = np.array([[float(x) for x in r[1]] for r in rows], dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((ids, M))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_M = bc.value
        for pdf in it:
            A = np.array([[float(x) for x in v] for v in pdf[vec_col]], dtype=np.float64)
            A = A / np.linalg.norm(A, axis=1, keepdims=True)
            S = A @ b_M.T  # (batch, n) cosine block
            out_a, out_b, out_c = [], [], []
            left_ids = pdf[id_col].to_numpy()
            for i in range(len(left_ids)):
                mask = (S[i] >= threshold) & (b_ids > left_ids[i])
                out_a.extend([left_ids[i]] * int(mask.sum()))
                out_b.extend(b_ids[mask])
                out_c.extend(S[i][mask])
            yield pd.DataFrame(
                {
                    "id_a": pd.array(out_a, dtype="int64"),
                    "id_b": pd.array(out_b, dtype="int64"),
                    "cosine": pd.array(out_c, dtype="float64"),
                }
            )

    schema = "id_a long, id_b long, cosine double"
    return emb.select(id_col, vec_col).mapInPandas(batches, schema)


def embedding_cosine_pairs_lsh(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Scale path: random-hyperplane LSH buckets, exact cosine verify
    within buckets.  Two vectors with cosine >= 0.95 agree on a random
    hyperplane sign with p ~ 0.93, so a 12-bit signature keeps recall
    useful while shrinking candidate pairs from O(n^2) to per-bucket;
    recall is measured against the brute-force oracle in tests."""
    import random

    rng = random.Random(seed)
    dim = len(emb.select(vec_col).first()[0])
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    sig_bits = []
    for p in planes:
        plane = F.array(*[F.lit(x) for x in p])
        dot = F.aggregate(F.zip_with(v, plane, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
        sig_bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    base = emb.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        norm.alias("nrm"),
        F.concat(*sig_bits).alias("bucket"),
    )
    a, b = base.alias("a"), base.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (dot / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
