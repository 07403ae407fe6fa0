"""Skew-handling join helper: key salting.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on by default in our
session).  Salting is the manual lever for the cases AQE can't fix --
e.g. a single hot key in a shuffle join where one side must be
replicated: the hot side gets a random salt in [0, n), the other side
is exploded across all n salts, and the join key becomes (key, salt),
spreading one reducer's work over n.

Cost model: replicates the build side n_salts times -- use only when
the build side is small relative to the skew being split (classic
hot-key fact x dim case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Join ``skewed`` (hot keys) with ``other`` on column ``on``,
    spreading each key of the skewed side over ``n_salts`` shuffle
    partitions.  Result columns match a plain ``join(on=...)``."""
    salted = skewed.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    exploded = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(exploded, on=[on, "__salt"], how=how).drop("__salt")
