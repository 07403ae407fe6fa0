"""Z-order layout: per-file min-max ranges must be narrow on EVERY
z-ordered column (the property that makes multi-column file pruning
work), vs a single-column sort where only the sorted column prunes."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.zorder import (
    zorder_write,
)
from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.sources.testdata import (
    load_table,
)

SF = "/root/testdata/sf0.01"


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in glob.glob(os.path.join(path, "part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    v0, v1 = float(c.statistics.min), float(c.statistics.max)
                    lo = v0 if lo is None else min(lo, v0)
                    hi = v1 if hi is None else max(hi, v1)
        if lo is not None:
            out.append((lo, hi))
    return out


def _avg_range_frac(ranges: list[tuple[float, float]]) -> float:
    glo = min(r[0] for r in ranges)
    ghi = max(r[1] for r in ranges)
    span = (ghi - glo) or 1.0
    return sum((hi - lo) / span for lo, hi in ranges) / len(ranges)


def test_zorder_narrows_ranges_on_both_columns(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    zpath = str(tmp_path / "z")
    zorder_write(ev, zpath, ["user_id", "value"], n_files=16, bits=12)

    # baseline: classic single-column sort
    spath = str(tmp_path / "s")
    (
        ev.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(spath)
    )

    z_user = _avg_range_frac(_file_ranges(zpath, "user_id"))
    z_val = _avg_range_frac(_file_ranges(zpath, "value"))
    s_user = _avg_range_frac(_file_ranges(spath, "user_id"))
    s_val = _avg_range_frac(_file_ranges(spath, "value"))

    # sorted layout: user_id tight, value wide (no clustering benefit)
    assert s_user < 0.2
    assert s_val > 0.5
    # z-order: BOTH columns well under half the global range per file
    # (measured ~0.27 / ~0.22 at sf0.01 with 16 files)
    assert z_user < 0.4, z_user
    assert z_val < 0.4, z_val
    # the multi-column win: the z-layout's WORST dimension is still
    # markedly tighter than the sort's unsorted dimension
    assert max(z_user, z_val) < 0.6 * s_val

    # row preservation
    got = spark.read.parquet(zpath)
    assert got.count() == ev.count()
    assert set(got.columns) == {"event_id", "user_id", "value"}
    assert (
        got.selectExpr("sum(event_id)").first()[0]
        == ev.selectExpr("sum(event_id)").first()[0]
    )


def test_zorder_validates_args(spark):
    import pytest as _pytest

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.zorder import (
        zorder_dataframe,
    )

    ev = load_table(spark, SF, "events")
    with _pytest.raises(ValueError):
        zorder_dataframe(ev, [])
    with _pytest.raises(ValueError):
        zorder_dataframe(ev, ["user_id", "value"], bits=32)


def test_zorder_string_column_clusters_not_nulls(spark, tmp_path):
    """Strings must map to an order-preserving numeric position, not
    silently cast to NULL/0 (ADVICE r4): the string dimension's
    per-file byte-prefix ranges must be narrow after z-ordering."""
    import string as _string

    from pyspark.sql import functions as F

    from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.operators.zorder import (
        _numeric_projection,
        zorder_write,
    )

    # order preservation of the projection itself
    words = ["", "a", "ab", "abc", "b", "ba", "zz", "Z", "0", "~~~~~~~~"]
    proj = (
        spark.createDataFrame([(w,) for w in words], "w string")
        .select("w", _numeric_projection("w", "string").alias("p"))
        .collect()
    )
    by_word = sorted(proj, key=lambda r: r["w"])
    by_proj = sorted(proj, key=lambda r: r["p"])
    assert [r["w"] for r in by_word] == [r["w"] for r in by_proj]

    # end-to-end: 26 alphabet buckets x 40 rows, z-ordered by the
    # string key alone -> each of 8 files must span few letters
    rows = [(f"{c}{i:03d}", i) for c in _string.ascii_lowercase for i in range(40)]
    df = spark.createDataFrame(rows, "k string, v long")
    path = str(tmp_path / "zs")
    zorder_write(df, path, ["k"], n_files=8, bits=12)
    got = spark.read.parquet(path)
    assert got.count() == len(rows)
    spans = (
        got.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.countDistinct(F.substring("k", 1, 1)).alias("letters"))
        .collect()
    )
    assert len(spans) == 8
    # 26 letters over 8 files: perfect clustering = ~4 letters/file;
    # the old NULL-cast bug would put all 26 in every file
    assert max(r["letters"] for r in spans) <= 6

    # unsupported types raise instead of silently degenerating
    arr = spark.createDataFrame([([1, 2],)], "a array<int>")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported type"):
        zorder_write(arr, str(tmp_path / "bad"), ["a"])
    with _pytest.raises(ValueError, match="not in DataFrame"):
        zorder_write(df, str(tmp_path / "bad2"), ["nope"])
