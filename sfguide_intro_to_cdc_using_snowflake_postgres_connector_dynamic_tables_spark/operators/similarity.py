"""Similarity search over embedding columns (array<float>).

- ``topk_cosine``: brute-force exact top-k against a query vector --
  the baseline and oracle.  One scan, per-row dot product in codegen'd
  higher-order functions, TakeOrdered top-k; distributes trivially.
- ``topk_cosine_ivf``: IVF-style scale path -- k-means-ish coarse
  centroids (seeded sample), probe the closest ``nprobe`` cells, exact
  re-rank inside.  At 100 TB the full-scan baseline reads everything;
  IVF reads ~nprobe/ncells of it, with recall measured against the
  brute-force oracle in tests.
- ``topk_pq`` / ``topk_pq_ivf``: PQ/ADC tiers -- codes-only scans
  (m ints per row instead of d floats).
- ``topk_pq_rerank`` (and ``search_pq_index(rerank_with=...)``): the
  documented DEFAULT for unclustered corpora -- fine 8x256 codebooks
  shortlist by ADC, exact cosine reranks the shortlist (recall
  thresholds pinned in tests/test_extensions.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..blas import single_thread_blas
from ..session import one_partition_df


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_to_query(emb: DataFrame, query_vec: list[float], vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """Cosine similarity of every row to a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col(vec_col))
    return emb.select(
        F.col(id_col),
        (_dot(v, q) / (_norm(v) * _norm(q))).alias("cosine"),
    )


def topk_cosine(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on id.  orderBy +
    limit compiles to TakeOrderedAndProject (per-partition heap + driver
    merge of k rows, no global sort)."""
    return (
        cosine_to_query(emb, query_vec, vec_col, id_col)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def kmeans_on_sample(
    X: "np.ndarray", n_cells: int, seed: int, iters: int = 8
) -> list[list[float]]:
    """Seeded Lloyd's k-means (the IVF coarse quantizer), kmeans++-style
    spread init.  Pure numpy on an in-memory sample so the engine and
    the oracle generator (plans/catalog_ext.py) derive bit-identical
    centroids from the same rows.

    Runs under ``single_thread_blas``: the k-means++ loop issues one
    tiny GEMV per chosen center, and OpenBLAS's default all-cores pool
    costs ~3.7 ms/call in wake-up overhead (vs ~10 us of math) while
    its spinning threads fight the local-mode task threads -- the r14
    driver record's pq_topk_rerank 25.5 s-warm collapse.  Centroids are
    bit-identical across pool sizes (pinned by tests/test_blas.py), and
    the oracle generators share this function either way."""
    if len(X) == 0:
        raise ValueError("k-means needs at least one sample vector")
    with single_thread_blas():
        return _kmeans_on_sample_pinned(X, n_cells, seed, iters)


def _kmeans_on_sample_pinned(
    X: "np.ndarray", n_cells: int, seed: int, iters: int
) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    k = min(n_cells, len(X))
    # k-means++ init.  d2 (distance to the NEAREST chosen center) is
    # maintained incrementally -- one new-center distance pass per
    # step, O(k n d) total.  The naive form recomputed every center's
    # distances each step (O(k^2 n d)): at the r14 fine-codebook tier
    # (k=256, 8 subspaces, 4096-sample) that was ~25 s of driver numpy
    # per query.  np.minimum folds are the exact same min the stacked
    # np.min took, so centroids are bit-identical to the old code
    # (the generated DuckDB oracles depend on that).
    xsqf = (X ** 2).sum(axis=1)

    def _d2_to(c):
        # GEMV form of ||x - c||^2, clamped: rounding can produce tiny
        # negatives on (near-)duplicate points, and d2 feeds a
        # probability vector that must be non-negative
        return np.maximum(xsqf - 2.0 * (X @ c) + c @ c, 0.0)

    centers = [X[rng.integers(len(X))]]
    d2 = _d2_to(centers[0])
    for _ in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centers.append(X[rng.choice(len(X), p=probs)])
        d2 = np.minimum(d2, _d2_to(centers[-1]))
    C = np.array(centers)
    # Lloyd iterations.  The argmin runs in GEMM form (||x||^2 - 2xC'
    # + ||c||^2) instead of materializing the (n, k, d) difference
    # tensor -- at the fine-codebook tier (k=256 x 8 subspaces) the
    # naive form spent ~2 s/query allocating 32 MB temps per
    # iteration.  GEMM rounding can flip a near-tie assignment vs the
    # naive form, which is fine: the ENGINE and the ORACLE GENERATORS
    # share this one function, so both sides always embed the same
    # centroids, and the search-time cell assignment (assign_cells /
    # the generated SQL) stays in the naive form on both sides.
    xsq = (X ** 2).sum(axis=1)[:, None]
    for _ in range(iters):
        d2m = xsq - 2.0 * (X @ C.T) + (C ** 2).sum(axis=1)[None, :]
        assign = np.argmin(d2m, axis=1)
        # vectorized per-cluster means: the per-j boolean-mask loop was
        # O(k n) python passes per iteration -- at the fine-codebook
        # tier (k=256 x 8 subspaces) it dominated quantizer training.
        # np.add.at accumulates in row order; empty clusters keep their
        # center (the same rule the old masked-mean loop applied).
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        sums = np.zeros_like(C)
        np.add.at(sums, assign, X)
        nonempty = counts > 0
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
    return [list(map(float, c)) for c in C]


def _sample_matrix(emb: DataFrame, vec_col: str, sample_cap: int = 4096) -> "np.ndarray":
    """The shared constant-size (<= sample_cap rows, scan order)
    driver-side training sample: ONE collect job feeds every quantizer
    built from it (IVF centroids and all PQ subspace codebooks), so
    composed builders never risk two limits returning different row
    sets under multi-file scan ordering.  Empty input returns an empty
    (0, 0) matrix -- callers decide between an empty result and a
    loud error."""
    rows = emb.select(vec_col).limit(sample_cap).collect()
    return np.array([[float(x) for x in r[0]] for r in rows])


def _kmeans_centroids(
    emb: DataFrame, vec_col: str, n_cells: int, seed: int, iters: int = 8,
    sample_cap: int = 4096,
) -> list[list[float]]:
    """Constant-size (<= sample_cap rows) driver-side sample in scan
    order, quantized by :func:`kmeans_on_sample`."""
    return kmeans_on_sample(_sample_matrix(emb, vec_col, sample_cap), n_cells, seed, iters)


def assign_cells(
    emb: DataFrame, centroids: list[list[float]], vec_col: str,
    out_col: str = "__cell",
) -> DataFrame:
    """Nearest-centroid cell id per row as an extra column.

    Fully distributed: the centroid matrix is a Spark broadcast, the
    argmin is one vectorized Arrow batch per partition (first-tie
    argmin, matching DuckDB's ``list_position(dl, list_min(dl))`` the
    generated oracles use).  Shared by IVF search and semantic dedup.
    """
    from pyspark.sql.functions import pandas_udf

    C = np.array(centroids, dtype=np.float64)
    bc = emb.sparkSession.sparkContext.broadcast(C)

    @pandas_udf("int")
    def cell_of(vecs: pd.Series) -> pd.Series:
        # vectorized argmin over the broadcast centroid matrix
        cm = bc.value
        X = np.array([[float(x) for x in v] for v in vecs], dtype=np.float64)
        if len(X) == 0:
            return pd.Series([], dtype="int32")
        d2 = ((X[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(np.argmin(d2, axis=1).astype("int32"))

    return emb.withColumn(out_col, cell_of(F.col(vec_col)))


def topk_cosine_ivf(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: assign rows to their nearest of ``n_cells``
    sampled centroids (one-time, cacheable), search only the
    ``n_probe`` cells nearest the query.

    The cell assignment is the expensive part and in a real deployment
    is precomputed and stored partitioned-by-cell, so a query touches
    n_probe partitions only -- classic IVF-Flat layout mapped onto
    parquet partitioning.  The coarse quantizer is a seeded mini
    k-means over a bounded driver-side sample (<=4096 rows) -- at 100 TB
    that sample is still constant-size, and assignment stays fully
    distributed.
    """
    X = _sample_matrix(emb, vec_col)
    if X.size == 0:
        return emb.select(F.col(id_col), F.lit(0.0).alias("cosine")).limit(0)
    centroids = kmeans_on_sample(X, n_cells, seed)
    qv = [float(x) for x in query_vec]
    probed = probe_cells(centroids, qv, n_probe)

    assigned = assign_cells(emb, centroids, vec_col)
    pruned = assigned.filter(F.col("__cell").isin(probed))
    return topk_cosine(pruned.drop("__cell"), qv, k, vec_col, id_col)


def pq_train(
    emb: DataFrame,
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    seed: int = 42,
    sample_cap: int = 4096,
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jegou et al. 2011): split the
    dimension into ``m`` subspaces and run an independent seeded
    k-means (``kmeans_on_sample``, per-subspace seed offset) over the
    same bounded driver-side sample the IVF quantizer uses.  Returns
    ``m`` codebooks of ``k`` centroids each -- constant-size driver
    state at any data scale."""
    return pq_train_on_sample(_sample_matrix(emb, vec_col, sample_cap), m, k, seed)


def pq_train_on_sample(
    X: "np.ndarray", m: int, k: int, seed: int
) -> list[list[list[float]]]:
    """Per-subspace codebooks from an in-memory sample (the matrix
    half of :func:`pq_train`, shared with composed builders that train
    IVF and PQ from the SAME collected sample)."""
    if X.size == 0:
        raise ValueError("pq_train needs at least one vector to train codebooks")
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    sub = d // m
    return [
        kmeans_on_sample(X[:, s * sub : (s + 1) * sub], k, seed + s)
        for s in range(m)
    ]


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Encode every vector as ``m`` centroid codes (one Arrow-batched
    argmin per subspace over the broadcast codebooks).  The code array
    is the 100 TB story: m small ints per row instead of d floats --
    at d=16/m=4/k=16 that is 16x less scan I/O for the search pass,
    and a real deployment stores the codes column and never re-reads
    the raw vectors except to re-rank."""
    from pyspark.sql.functions import pandas_udf

    C = [np.array(cb, dtype=np.float64) for cb in codebooks]
    sub = C[0].shape[1]
    bc = emb.sparkSession.sparkContext.broadcast(C)

    @pandas_udf("array<int>")
    def codes_of(vecs: pd.Series) -> pd.Series:
        cbs = bc.value
        X = np.array([[float(x) for x in v] for v in vecs], dtype=np.float64)
        if len(X) == 0:
            return pd.Series([], dtype=object)
        out = np.empty((len(X), len(cbs)), dtype=np.int32)
        for s, cb in enumerate(cbs):
            Xs = X[:, s * sub : (s + 1) * sub]
            d2 = ((Xs[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            out[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(out))

    return emb.withColumn(out_col, codes_of(F.col(vec_col)))


def pq_distance_tables(
    codebooks: list[list[list[float]]], query_vec: list[float]
) -> list[list[float]]:
    """Asymmetric-distance (ADC) lookup tables: per subspace, the
    squared distance from the query's slice to each centroid.  m*k
    doubles total -- shared by the engine expression and the oracle
    generator."""
    qv = [float(x) for x in query_vec]
    sub = len(codebooks[0][0])
    tables = []
    for s, cb in enumerate(codebooks):
        qs = qv[s * sub : (s + 1) * sub]
        tables.append(
            [sum((qs[j] - c[j]) ** 2 for j in range(sub)) for c in cb]
        )
    return tables


#: m*k above which the ADC tables ride a one-row broadcast instead of
#: inline literals: a PySpark list literal is a CreateArray with one
#: child PER ELEMENT, so an 8x256 codebook costs a 2048-node expression
#: tree of analyzer/codegen work PER QUERY (measured ~1 s of driver
#: plan time on the rerank tier at sf0.1) while the scan math is
#: identical either way.
_ADC_LITERAL_MAX = 256


def _adc_dist(tables: list[list[float]], codes_col, flat_col=None) -> "F.Column":
    """The ADC scoring expression: approximate distance as the SUM of
    m ``element_at`` lookups -- pure whole-stage-codegen, no Python in
    the scan.  The ONE place the scoring convention lives (inline
    top-k and stored-index search both compile through it, so a tweak
    cannot drift between them).  With ``flat_col`` the lookups index a
    FLATTENED (m*k) table column (row-major: subspace s at offset
    s*k) carried on a one-row broadcast; otherwise each subspace's
    table is an inline literal array."""
    k = len(tables[0])
    dist = None
    for s, t in enumerate(tables):
        if flat_col is not None:
            term = F.element_at(flat_col, codes_col[s] + s * k + 1)
        else:
            term = F.element_at(
                F.array(*[F.lit(float(x)) for x in t]),
                codes_col[s] + 1,
            )
        dist = term if dist is None else dist + term
    return dist


def _with_adc_dist(
    df: DataFrame, tables: list[list[float]], codes_col, out: str = "approx_dist"
) -> DataFrame:
    """Attach the ADC distance column, choosing the representation by
    table size: inline literal arrays for small codebooks (cheapest
    plan, zero joins), a single-row broadcast carrying the flattened
    table for large ones (the 8x256 rerank tier) -- the same
    bounded-driver-artifact pattern as the Bloom bitmap in
    operators/corpus.py, for the same reason (a m*k-child literal
    tree is analyzer-time-quadratic in practice, the broadcast row is
    one expression node)."""
    if sum(len(t) for t in tables) <= _ADC_LITERAL_MAX:
        return df.withColumn(out, _adc_dist(tables, codes_col))
    flat = [float(x) for t in tables for x in t]
    row = one_partition_df(
        df.sparkSession, [(flat,)], "__adc_tbl array<double>"
    )
    return (
        df.crossJoin(F.broadcast(row))
        .withColumn(out, _adc_dist(tables, codes_col, F.col("__adc_tbl")))
        .drop("__adc_tbl")
    )


def topk_pq(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    n_codes: int = 16,
    seed: int = 42,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance: encode once (in a
    real deployment the codes column is precomputed and stored), then
    score each row as the SUM of m table lookups -- pure codegen
    expressions over tiny array literals, no Python in the scan -- and
    TakeOrdered the k best (ascending distance, id tie-break).

    Complements the ANN tiers: brute-force exact (`topk_cosine`), IVF
    cell pruning (`topk_cosine_ivf`, reads ~n_probe/n_cells of the
    data), and PQ (reads ALL rows but only m code bytes each + no
    float math per dimension).  IVF-PQ composition = assign cells with
    `assign_cells`, filter to probed cells, then this scorer
    (:func:`topk_pq_ivf`); pass ``codebooks`` to score a pruned subset
    with codebooks trained on the full table.

    METRIC CONTRACT: PQ/ADC ranks by squared EUCLIDEAN distance.  For
    a cosine deployment, L2-normalize the vectors before
    indexing/encoding (on the unit sphere ||x-q||^2 = 2-2cos, so the
    rankings coincide); on unnormalized vectors the norm term
    dominates and the shortlist silently ranks by vector LENGTH, not
    similarity -- measured in SCALE.md's r13 ANN section."""
    if codebooks is None:
        X = _sample_matrix(emb, vec_col)
        if X.size == 0:
            # nothing to train on OR score: an empty top-k, not an
            # IndexError (composed pipelines legitimately filter
            # everything away upstream)
            return emb.select(
                F.col(id_col), F.lit(0.0).alias("approx_dist")
            ).limit(0)
        codebooks = pq_train_on_sample(X, m, n_codes, seed)
    tables = pq_distance_tables(codebooks, query_vec)
    encoded = pq_encode(emb, codebooks, vec_col)
    return (
        _with_adc_dist(encoded, tables, F.col("pq_codes"))
        .select(F.col(id_col), "approx_dist")
        .orderBy(F.asc("approx_dist"), F.asc(id_col))
        .limit(k)
    )


def topk_pq_ivf(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    n_codes: int = 16,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ: the composition real large-scale ANN deployments run
    (FAISS IVFx,PQy) -- coarse cells prune the candidate set to
    ~n_probe/n_cells of the data, PQ codes score the survivors without
    touching raw vectors.  Both quantizers train on the SAME bounded
    driver-side sample (IVF with ``seed``, PQ subspaces with
    ``seed + s``), so the whole path stays deterministic and
    oracle-reproducible.  In a stored deployment both the cell id and
    the code array are precomputed columns partitioned by cell: a
    query reads n_probe partitions x m ints per row."""
    X = _sample_matrix(emb, vec_col)
    if X.size == 0:
        return emb.select(F.col(id_col), F.lit(0.0).alias("approx_dist")).limit(0)
    centroids = kmeans_on_sample(X, n_cells, seed)
    codebooks = pq_train_on_sample(X, m, n_codes, seed)
    qv = [float(x) for x in query_vec]
    probed = probe_cells(centroids, qv, n_probe)

    assigned = assign_cells(emb, centroids, vec_col)
    pruned = assigned.filter(F.col("__cell").isin(probed)).drop("__cell")
    return topk_pq(
        pruned, qv, k, vec_col, id_col, m, n_codes, seed, codebooks=codebooks
    )


def topk_pq_rerank(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    n_codes: int = 256,
    n_cells: int = 16,
    n_probe: int = 8,
    n_candidates: int = 200,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ shortlist -> exact cosine rerank: the DOCUMENTED DEFAULT
    for unclustered (isotropic) corpora.

    The r13 ANN matrix (SCALE.md) showed coarse 8x16 codebooks flat at
    0.20-0.27 recall@10 on an isotropic 200k corpus while ivf-flat
    reached 0.93: with no cluster structure, near-tie neighbors need
    finer quantization than 16 centroids/subspace can express.  This
    tier fixes both halves: a finer codebook (default 8x256 -- still
    m bytes/row stored) shortlists ``n_candidates`` by ADC, then an
    EXACT cosine pass over just those rows restores the true ranking.

    Scale shape: the ADC shortlist reads codes only (m ints/row over
    n_probe/n_cells of the data); the rerank joins the shortlist ids
    back to the raw-vector table as a broadcast semi-join (the
    shortlist is n_candidates rows -- driver-small by construction),
    so the exact math touches n_candidates vectors regardless of
    corpus size.  In a stored deployment the same shape is
    :func:`search_pq_index` with ``rerank_with=`` the vector table.

    Tuning at scale (measured, SCALE.md r14 x100 matrix): on large
    UNCLUSTERED corpora the shortlist is code-resolution-bound, so
    raise ``m`` before raising ``n_candidates`` -- at 200k isotropic
    vectors, 8x256 with a 10x larger shortlist only reached 0.77
    recall@10 while 16x256 with the default 200 candidates read 0.87
    (the ivf-flat ceiling at that n_probe).

    METRIC CONTRACT: the shortlist ranks by squared euclidean ADC --
    L2-normalize before indexing when the metric is cosine (see
    :func:`topk_pq`); the rerank itself is true cosine either way."""
    X = _sample_matrix(emb, vec_col)
    if X.size == 0:
        return emb.select(F.col(id_col), F.lit(0.0).alias("cosine")).limit(0)
    centroids = kmeans_on_sample(X, n_cells, seed)
    codebooks = pq_train_on_sample(X, m, n_codes, seed)
    qv = [float(x) for x in query_vec]
    probed = probe_cells(centroids, qv, n_probe)
    tables = pq_distance_tables(codebooks, qv)

    assigned = assign_cells(emb, centroids, vec_col)
    pruned = assigned.filter(F.col("__cell").isin(probed)).drop("__cell")
    encoded = pq_encode(pruned, codebooks, vec_col)
    shortlist = (
        _with_adc_dist(encoded, tables, F.col("pq_codes"))
        .select(F.col(id_col), "approx_dist")
        .orderBy(F.asc("approx_dist"), F.asc(id_col))
        .limit(n_candidates)
    )
    cands = emb.join(F.broadcast(shortlist.select(id_col)), id_col, "left_semi")
    return topk_cosine(cands, qv, k, vec_col, id_col)


def build_pq_index(
    emb: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    n_codes: int = 16,
    n_cells: int = 16,
    seed: int = 42,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Materialize the IVF-PQ index as parquet PARTITIONED BY cell:
    each row stores only (id, pq_codes) -- m small ints instead of d
    floats -- under its coarse cell's directory.  Returns the
    (centroids, codebooks) pair the searcher needs; persist them next
    to the index in a real deployment (they are a few KB).

    This is the storage layout the IVF literature assumes: a query
    later reads ONLY the n_probe matching partitions (directory-level
    pruning, verified by plan in tests) and only the codes column --
    the double win that makes ANN over 100 TB of vectors a
    few-partition scan.

    METRIC CONTRACT: the stored codes score by squared euclidean ADC;
    L2-normalize the corpus before building when the query metric is
    cosine (see :func:`topk_pq`)."""
    X = _sample_matrix(emb, vec_col)
    if X.size == 0:
        raise ValueError("build_pq_index: no vectors to index")
    centroids = kmeans_on_sample(X, n_cells, seed)
    codebooks = pq_train_on_sample(X, m, n_codes, seed)
    assigned = assign_cells(emb, centroids, vec_col, out_col="cell")
    encoded = pq_encode(assigned, codebooks, vec_col)
    (
        encoded.select(F.col(id_col), F.col("pq_codes"), F.col("cell"))
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )
    return centroids, codebooks


def search_pq_index(
    spark,
    path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    n_probe: int = 4,
    rerank_with: DataFrame | None = None,
    n_candidates: int = 200,
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a :func:`build_pq_index` layout: filter to the n_probe
    nearest cells (a PARTITION filter -- Spark prunes the directories,
    never opening the rest), score the stored codes with the ADC
    tables, TakeOrdered the k best.  No raw vectors are read at all.

    Pass ``rerank_with=`` the raw-vector table to get the PQ->rerank
    tier (the documented default for unclustered corpora, see
    :func:`topk_pq_rerank`): the codes-only scan shortlists
    ``n_candidates`` ids, a broadcast semi-join fetches just those
    vectors, and an exact cosine pass returns the true top-k
    (column ``cosine`` instead of ``approx_dist``)."""
    qv = [float(x) for x in query_vec]
    probed = probe_cells(centroids, qv, n_probe)
    tables = pq_distance_tables(codebooks, qv)
    idx = spark.read.parquet(path).filter(F.col("cell").isin(probed))
    scored = _with_adc_dist(idx, tables, F.col("pq_codes")).select(
        F.col(id_col), "approx_dist"
    )
    if rerank_with is None:
        return scored.orderBy(F.asc("approx_dist"), F.asc(id_col)).limit(k)
    shortlist = scored.orderBy(F.asc("approx_dist"), F.asc(id_col)).limit(
        n_candidates
    )
    cands = rerank_with.join(
        F.broadcast(shortlist.select(id_col)), id_col, "left_semi"
    )
    return topk_cosine(cands, qv, k, vec_col, id_col)


def probe_cells(centroids: list[list[float]], qv: list[float], n_probe: int) -> list[int]:
    """The n_probe cells whose centroids sit closest to the query --
    shared by the engine and the oracle generator."""
    import math

    return sorted(
        range(len(centroids)),
        key=lambda ci: math.dist([float(x) for x in centroids[ci]], qv),
    )[:n_probe]
