"""CDC schema evolution: upstream ALTER TABLE ADD COLUMN propagates
through the apply/merge path (reference: the Postgres connector
replicates DDL changes into the destination table automatically).

Semantics pinned here:
- a change batch carrying a NEW column widens the snapshot; pre-existing
  rows read NULL for it;
- a batch MISSING a snapshot column (upstream DROP) keeps the column,
  NULL for new rows (soft drop -- no data destruction);
- in the partitioned store, buckets untouched by the evolving merge
  keep their old files, and reads still present the union schema (the
  refreshed zero-row schema marker + mergeSchema);
- time travel to a pre-evolution version shows the old schema.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.cdc_apply import (
    apply_changes,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.streaming.store import (
    ParquetTableStore,
)


def test_apply_changes_add_column(spark):
    current = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    batch = spark.createDataFrame(
        [(2, "b2", "x@y.z", "U", 10), (3, "c", "c@y.z", "I", 11)],
        "id long, name string, email string, op string, lsn long",
    )
    out = apply_changes(current, batch, key="id")
    rows = {r["id"]: (r["name"], r["email"]) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b2", "x@y.z"), 3: ("c", "c@y.z")}


def test_apply_changes_soft_drop_column(spark):
    current = spark.createDataFrame(
        [(1, "a", "a@y.z")], "id long, name string, email string"
    )
    batch = spark.createDataFrame(  # upstream dropped email
        [(2, "b", "I", 5)], "id long, name string, op string, lsn long"
    )
    out = apply_changes(current, batch, key="id")
    rows = {r["id"]: (r["name"], r["email"]) for r in out.collect()}
    assert rows == {1: ("a", "a@y.z"), 2: ("b", None)}


@pytest.fixture()
def evolved_store(spark, tmp_path):
    """Partitioned table seeded with 2 columns, then merged with a
    3-column batch that touches only SOME buckets."""
    store = ParquetTableStore(str(tmp_path / "s"))
    base = spark.createDataFrame(
        [(i, f"n{i}") for i in range(20)], "id long, name string"
    )
    store.overwrite("t", base, partition_key="id", n_buckets=4)
    ups = spark.createDataFrame(
        [(0, "n0v2", "e0"), (99, "n99", "e99")], "id long, name string, email string"
    )
    store.merge(spark, "t", ups, ups.select("id"))
    return store


def test_partitioned_merge_widens_schema(spark, evolved_store):
    got = evolved_store.read(spark, "t")
    assert set(got.columns) == {"id", "name", "email"}
    rows = {r["id"]: (r["name"], r["email"]) for r in got.collect()}
    assert len(rows) == 21
    assert rows[0] == ("n0v2", "e0")
    assert rows[99] == ("n99", "e99")
    assert rows[5] == ("n5", None)  # untouched bucket row: NULL back-fill


def test_untouched_bucket_pruned_read_sees_union_schema(spark, evolved_store):
    B = evolved_store.partition_spec("t")[1]
    touched = {
        r[0]
        for r in spark.createDataFrame([(0,), (99,)], "id long")
        .select(ParquetTableStore.bucket_expr("id", B).alias("b"))
        .collect()
    }
    untouched = [b for b in range(B) if b not in touched]
    got = evolved_store.read_buckets(spark, "t", untouched)
    # pruned read over pre-evolution files must still present the
    # evolved schema (via the refreshed marker + mergeSchema)
    assert set(got.columns) == {"id", "name", "email"}
    assert got.filter(F.col("email").isNotNull()).count() == 0


def test_time_travel_preserves_old_schema(spark, evolved_store):
    v = evolved_store.current_version("t")
    old = evolved_store.read_version(spark, "t", v - 1)
    assert set(old.columns) == {"id", "name"}
    assert old.count() == 20


def test_merge_without_evolution_keeps_marker(spark, tmp_path):
    """A plain merge (same schema) must not rewrite the schema marker."""
    store = ParquetTableStore(str(tmp_path / "s"))
    base = spark.createDataFrame([(i, i * 10) for i in range(8)], "id long, v long")
    store.overwrite("t", base, partition_key="id", n_buckets=2)
    m1 = store._read_manifest("t", store.current_version("t"))
    ups = spark.createDataFrame([(1, 111)], "id long, v long")
    store.merge(spark, "t", ups, ups.select("id"))
    m2 = store._read_manifest("t", store.current_version("t"))
    assert m2["schema_dir"] == m1["schema_dir"]


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EXTRA_COLS = ["email", "phone", "score"]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(
        st.tuples(
            st.lists(st.sampled_from(_EXTRA_COLS), unique=True, max_size=3),
            st.lists(
                st.tuples(
                    st.integers(0, 12),
                    st.sampled_from(["I", "U", "D"]),
                ),
                min_size=1,
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=3,
    )
)
def test_evolution_sequences_match_model(spark, batches):
    """Randomized batch sequences where every batch ships its own
    column set (adds AND soft-drops interleaved): after each apply, the
    snapshot must equal a dict-model that unions schemas and NULL-fills
    both directions."""
    model: dict[int, dict] = {}
    all_cols: set[str] = {"name"}
    current = None
    lsn = 0
    for extra_cols, ops in batches:
        cols = ["name"] + sorted(extra_cols)
        all_cols.update(extra_cols)
        rows, schema = [], "id long, " + ", ".join(
            f"{c} string" for c in cols
        ) + ", op string, lsn long"
        for rid, op in ops:
            lsn += 1
            payload = {c: f"{c}{rid}b{lsn}" for c in cols}
            if op == "D":
                model.pop(rid, None)
                rows.append((rid, *[None] * len(cols), "D", lsn))
            else:
                model[rid] = payload
                rows.append((rid, *[payload[c] for c in cols], op, lsn))
        changes = spark.createDataFrame(rows, schema)
        current = apply_changes(current, changes, key="id")
        got = {
            r["id"]: {c: r[c] for c in current.columns if c != "id"}
            for r in current.collect()
        }
        want = {
            rid: {c: vals.get(c) for c in got[rid]} for rid, vals in model.items()
        }
        assert got == want
        # union-schema invariant: every column ever seen is retained
        assert set(current.columns) - {"id"} <= all_cols
