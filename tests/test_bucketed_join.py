"""Bucketing = co-located joins (SCALE.md's 100 TB join story): two
tables bucketed+sorted on the join key must join with NO Exchange in the
physical plan — the shuffle is paid once at write time, every subsequent
join is free. This is the evidence for the 'pre-partition the fact
tables' design note."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable writes into the session's warehouse dir; use unique
    # names so reruns in one JVM don't collide
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
     .mode("overwrite").saveAsTable("b_customer"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    # MERGE hint: at test scale AQE would broadcast the tiny dim (also
    # shuffle-free, but not the bucketing proof)
    joined = spark.table("b_orders").hint("merge").join(
        spark.table("b_customer"),
        F.col("o_custkey") == F.col("c_custkey"))
    agg = joined.groupBy("c_mktsegment").agg(
        F.sum("o_totalprice").alias("rev"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("HashAggregate")[-1]
    # the join itself must read both sides bucket-aligned: no Exchange
    # below the join (the final aggregate may exchange on its own key)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    below_join = plan[plan.index("Join"):]
    assert "Exchange hashpartitioning(o_custkey" not in below_join
    assert "Exchange hashpartitioning(c_custkey" not in below_join

    # correctness unchanged vs the unbucketed plan
    plain = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .join(spark.read.parquet(
            "/root/testdata/sf0.001/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment").agg(F.sum("o_totalprice").alias("rev"))
    )
    got = {r.c_mktsegment: float(r.rev) for r in agg.collect()}
    want = {r.c_mktsegment: float(r.rev) for r in plain.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_bucket_pruning_on_aggregate(warehouse):
    spark = warehouse
    # group-by on the bucket key also avoids the exchange
    agg = spark.table("b_orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert agg.count() > 0
