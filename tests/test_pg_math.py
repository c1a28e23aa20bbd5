"""PG math extras (reference math.cpp): Euclid-fold gcd/lcm against
Python's exact math.gcd, erf against math.erf within the stated 1.5e-7
bound, date_bin anchoring, and the seeded random_normal's moments."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from serenedb_spark.functions import pg_math as PM


def test_gcd_lcm_exact(spark):
    df = spark.createDataFrame(
        [(a, b) for a in [0, 1, 7, 36, 48, 97, 360, 2**31] for b in
         [0, 1, 6, 18, 35, 64, 81]],
        "a long, b long",
    )
    rows = df.select(
        "a", "b", PM.gcd(F.col("a"), F.col("b")).alias("g"),
        PM.lcm(F.col("a"), F.col("b")).alias("l"),
    ).collect()
    for r in rows:
        assert r.g == math.gcd(r.a, r.b), (r.a, r.b)
        assert r.l == math.lcm(r.a, r.b), (r.a, r.b)


def test_erf_within_stated_bound(spark):
    xs = [x / 10.0 for x in range(-40, 41)]
    df = spark.createDataFrame([(x,) for x in xs], "x double")
    rows = df.select("x", PM.erf(F.col("x")).alias("e")).collect()
    for r in rows:
        assert abs(r.e - math.erf(r.x)) <= 1.6e-7, r.x


def test_date_bin_anchor(spark):
    df = spark.createDataFrame(
        [("2024-03-05 10:30:15",), ("1992-01-01 00:00:00",)], "ts string"
    )
    rows = df.select(
        PM.date_bin(86400, F.col("ts").cast("timestamp"),
                    "1992-01-01 00:00:00").alias("b")
    ).collect()
    assert str(rows[0].b) == "2024-03-05 00:00:00"
    assert str(rows[1].b) == "1992-01-01 00:00:00"


def test_div_trunc_toward_zero(spark):
    df = spark.createDataFrame(
        [(7, 2), (-7, 2), (7, -2), (-7, -2)], "a long, b long"
    )
    got = [r.d for r in
           df.select(PM.div_trunc(F.col("a"), F.col("b")).alias("d"))
           .collect()]
    assert got == [3, -3, -3, 3]


def test_random_normal_moments(spark):
    df = spark.range(20_000)
    stats = df.select(
        F.avg(PM.random_normal(F.col("id"))).alias("mu"),
        F.stddev(PM.random_normal(F.col("id"))).alias("sd"),
    ).collect()[0]
    assert abs(stats.mu) < 0.03
    assert abs(stats.sd - 1.0) < 0.03
    # deterministic: identical seeds → identical draws
    a = df.select(PM.random_normal(F.col("id")).alias("v")).collect()
    b = df.select(PM.random_normal(F.col("id")).alias("v")).collect()
    assert [r.v for r in a] == [r.v for r in b]
