"""The BLAS thread-pool pin (blas.py): the quantizer trainers must be
bit-identical whatever the pool size (the oracle generators share the
functions, but the committed recall numbers and the r14 plan captures
assume the exact centroids), and the scope must restore the pool."""

import numpy as np

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark import blas
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.similarity import (
    kmeans_on_sample,
    pq_train_on_sample,
)


def _sample(n=512, d=16, seed=7):
    return np.random.default_rng(seed).random((n, d))


def test_kmeans_bit_identical_across_pool_sizes():
    """Centroids from the pinned path == centroids computed with the
    ambient (multi-thread) pool: OpenBLAS partitions the output, not
    the reduction axis, so the fold order per element is unchanged."""
    X = _sample()
    pinned = kmeans_on_sample(X, 16, 42)
    blas._resolve()
    if blas._SET is None:
        # non-OpenBLAS numpy: the context manager is a no-op and the
        # equality below is trivially exercised single-path
        ambient = kmeans_on_sample(X, 16, 42)
    else:
        prev = blas._GET()
        blas._SET(max(prev, 4))
        try:
            # run the raw impl under a multi-thread pool
            from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.similarity import (
                _kmeans_on_sample_pinned,
            )

            ambient = _kmeans_on_sample_pinned(X, 16, 42, 8)
        finally:
            blas._SET(prev)
    assert pinned == ambient


def test_pq_train_deterministic_repeat():
    X = _sample(n=1024, d=32, seed=3)
    assert pq_train_on_sample(X, 4, 32, 42) == pq_train_on_sample(X, 4, 32, 42)


def test_single_thread_blas_sets_and_restores():
    blas._resolve()
    if blas._SET is None:
        # no-op platform: the context manager must still be usable
        with blas.single_thread_blas():
            pass
        return
    prev = blas._GET()
    with blas.single_thread_blas():
        assert blas._GET() == 1
    assert blas._GET() == prev


def test_single_thread_blas_restores_on_exception():
    blas._resolve()
    if blas._SET is None:
        return
    prev = blas._GET()
    try:
        with blas.single_thread_blas():
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert blas._GET() == prev
