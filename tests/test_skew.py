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


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join evidence (SCALE.md: 'salting OR AQE skew-join'): a
    join where one key owns ~90% of rows must be SPLIT by AQE —
    SortMergeJoin(skew=true) in the final plan — once the byte
    thresholds are scaled to test data. The hot rows carry an
    INCOMPRESSIBLE payload: with a bare key column the all-equal hot
    partition compresses to under any threshold and the rule never sees
    the skew."""
    conf = spark.conf
    keys = ("spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold")
    saved = {}
    for k in keys:
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin."
                 "skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                 "2.0")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                 "32KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.range(0, 60_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id") % 64).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"))
        right = spark.range(0, 64).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("w"))
        out = big.join(right, "k").select(
            F.sum(F.length("pad") + F.col("w")).alias("s"))
        rows = out.collect()   # materialize: AQE finalizes the plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:800]
        assert "skewed" in plan  # the split AQEShuffleRead
        assert rows[0].s is not None
    finally:
        for k, v in saved.items():
            if v is None:
                try:
                    conf.unset(k)
                except Exception:
                    pass
            else:
                conf.set(k, v)
