"""Skew-aware shuffles: salting for hot keys at 100 TB.

The reference is single-node, so skew is not its concern — on a
1000-executor cluster a hot join/grouping key (a viral document's term, a
null-heavy foreign key) serializes one task. Spark's AQE skew-join split
(spark.sql.adaptive.skewJoin) handles sort-merge joins automatically;
these helpers cover the remaining shapes:

  * salted_aggregate — two-phase aggregation with an explicit salt for
    algebraic aggs whose partial form Catalyst can't derive (e.g. a UDAF),
    or when a single groupBy key dominates. For built-in aggs Spark's
    partial aggregation already handles skew — prefer that.
  * salted_broadcast_join — replicate the SMALL side salt-ways and salt
    the big side, so one hot key spreads over `salt` tasks even in a
    shuffle join (used when the small side is too big to broadcast whole
    but its hot-key rows fit).
  * hot_keys — find keys above a frequency threshold (drives a hybrid
    plan: broadcast the hot keys' rows, shuffle the rest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic row salt in [0, salt) — crc32 of all columns, not
    rand(), so retried tasks keep their salt (exactly-once shuffles)."""
    h = F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                      for c in df.columns]))
    return df.withColumn(col_name, (h % salt).cast("int"))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase groupBy: (keys, salt) partial → keys final. `aggs` maps
    output name → partial aggregate expression; the final phase re-applies
    a merging aggregate (sum/max/min by name prefix convention:
    sum_*/cnt_* merge with sum, max_* with max, min_* with min)."""
    partial = with_salt(df, salt).groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )

    def _merge(name: str) -> Column:
        if name.startswith(("sum_", "cnt_", "n_")):
            return F.sum(name).alias(name)
        if name.startswith("max_"):
            return F.max(name).alias(name)
        if name.startswith("min_"):
            return F.min(name).alias(name)
        raise ValueError(
            f"salted_aggregate can't infer the merge fn for {name!r};"
            " prefix with sum_/cnt_/n_/max_/min_"
        )

    return partial.groupBy(*keys).agg(*[_merge(n) for n in aggs])


def hot_keys(df: DataFrame, key: str, min_fraction: float = 0.01) -> DataFrame:
    """Keys holding more than `min_fraction` of all rows (approximate by
    exact count — itself a skew-safe partial aggregation)."""
    total = df.count()
    return (
        df.groupBy(key).count()
        .where(F.col("count") >= total * min_fraction)
        .select(key)
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with the hot-key spread: big side gets a deterministic
    PER-ROW salt (key-derived salt would put the hot key back in one
    partition), small side is replicated salt-ways — each (key, salt)
    pair lands on its own task."""
    b = with_salt(big, salt)
    s = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")
