"""Skew utilities: salted plans must answer identically to the plain
plans, and the salt must actually spread the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from serenedb_spark.operators.skew import (
    hot_keys, salted_aggregate, salted_broadcast_join, with_salt,
)


def _skewed(spark):
    # 5000 rows of hot key 0 + uniform tail
    hot = spark.range(5000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    tail = spark.range(1000).select(
        (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.n, r.s, r.mx)
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
            F.max("v").alias("mx"),
        ).collect()
    }
    salted = {
        (r.k): (r.n_rows, r.sum_v, r.max_v)
        for r in salted_aggregate(
            df, ["k"],
            {"n_rows": F.count(F.lit(1)), "sum_v": F.sum("v"),
             "max_v": F.max("v")},
            salt=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark):
    big = _skewed(spark)
    small = spark.range(51).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = sorted((r.k, r.v, r.w) for r in big.join(small, "k").collect())
    salted = sorted(
        (r.k, r.v, r.w)
        for r in salted_broadcast_join(big, small, "k", salt=8).collect()
    )
    assert plain == salted


def test_salt_spreads_hot_key(spark):
    df = with_salt(_skewed(spark).where(F.col("k") == 0), 8)
    counts = [r["count"] for r in df.groupBy("__salt").count().collect()]
    assert len(counts) == 8  # the hot key occupies all salt slots
    assert max(counts) < 5000  # and no slot holds everything


def test_hot_keys(spark):
    hk = {r.k for r in hot_keys(_skewed(spark), "k", 0.5).collect()}
    assert hk == {0}
