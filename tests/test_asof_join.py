"""asof_join (operators/temporal_join.py) vs DuckDB's native ASOF JOIN —
the engine the reference embeds is the oracle, including inclusive-tie,
no-match, forward, inner, and tolerance behavior."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from serenedb_spark.operators.temporal_join import asof_join

L = [(1, 5, 50.0), (1, 10, 100.0), (1, 2, 20.0), (2, 3, 30.0), (3, 7, 70.0)]
R = [(1, 5, 500.0), (1, 9, 900.0), (2, 99, 990.0), (3, 1, 110.0)]


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(L, "k int, t int, a double")
    right = spark.createDataFrame(R, "k int, t int, v double")
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k int, t int, a double)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", L)
    con.execute("CREATE TABLE r(k int, t int, v double)")
    con.executemany("INSERT INTO r VALUES (?,?,?)", R)
    return left, right, con


def _spark_rows(df):
    return [tuple(r) for r in df.orderBy("k", "t").collect()]


def test_backward_left_matches_duckdb(sides):
    left, right, con = sides
    got = _spark_rows(asof_join(left, right, on="t", by=["k"]))
    want = con.execute("""
        SELECT l.k, l.t, l.a, r.t AS t_r, r.v AS v_r
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t
        ORDER BY l.k, l.t
    """).fetchall()
    assert got == want


def test_forward_left_matches_duckdb(sides):
    left, right, con = sides
    got = _spark_rows(asof_join(left, right, on="t", by=["k"],
                                direction="forward"))
    want = con.execute("""
        SELECT l.k, l.t, l.a, r.t AS t_r, r.v AS v_r
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t <= r.t
        ORDER BY l.k, l.t
    """).fetchall()
    assert got == want


def test_inner_drops_unmatched(sides):
    left, right, _ = sides
    got = _spark_rows(asof_join(left, right, on="t", by=["k"], how="inner"))
    assert all(r[3] is not None for r in got)
    # (1, 2) has no right row at-or-before t=2; (2, 3) none before 99
    assert (1, 2, 20.0) not in [r[:3] for r in got]
    assert all(r[0] != 2 for r in got)


def test_tolerance_nulls_stale_matches(sides):
    left, right, _ = sides
    got = {r[:2]: r[3:] for r in _spark_rows(
        asof_join(left, right, on="t", by=["k"], tolerance=F.lit(1)))}
    # (1,10) nearest right is t=9 (delta 1, kept); (1,5) exact (kept);
    # (3,7) nearest is t=1 (delta 6, nulled)
    assert got[(1, 10)] == (9, 900.0)
    assert got[(1, 5)] == (5, 500.0)
    assert got[(3, 7)] == (None, None)


def test_global_asof_no_by(spark):
    left = spark.createDataFrame([(10,), (1,)], "t int")
    right = spark.createDataFrame([(5, "x"), (7, "y")], "t int, s string")
    got = {r.t: r.s_r for r in asof_join(left, right, on="t").collect()}
    assert got == {10: "y", 1: None}


def test_timestamp_on_column(spark):
    left = spark.sql("""
      SELECT * FROM VALUES (1, TIMESTAMP'2026-01-01 00:01:00', 'p1'),
                           (1, TIMESTAMP'2026-01-01 00:03:30', 'p2')
      AS t(k, ts, tag)""")
    right = spark.sql("""
      SELECT * FROM VALUES (1, TIMESTAMP'2026-01-01 00:00:30', 1.0),
                           (1, TIMESTAMP'2026-01-01 00:02:00', 2.0)
      AS t(k, ts, px)""")
    out = {r.tag: r.px_r for r in
           asof_join(left, right, on="ts", by=["k"]).collect()}
    assert out == {"p1": 1.0, "p2": 2.0}
    # with a 60s tolerance p2's match (90s stale) is nulled
    out2 = {r.tag: r.px_r for r in asof_join(
        left, right, on="ts", by=["k"],
        tolerance=F.expr("INTERVAL 60 SECONDS")).collect()}
    assert out2 == {"p1": 1.0, "p2": None}


def test_null_times_never_match(spark):
    """DuckDB ASOF never matches NULL: right rows with NULL t must not
    become running-last payloads; left rows with NULL t stay unmatched
    (left join) / drop (inner) — in BOTH directions."""
    left = spark.createDataFrame(
        [(1, 5, "a"), (1, None, "b")], "k int, t int, tag string")
    right = spark.createDataFrame(
        [(1, None, 999.0), (1, 3, 30.0), (1, 8, 80.0)],
        "k int, t int, v double")

    back = {r.tag: (r.t_r, r.v_r)
            for r in asof_join(left, right, on="t", by=["k"]).collect()}
    assert back == {"a": (3, 30.0), "b": (None, None)}

    fwd = {r.tag: (r.t_r, r.v_r)
           for r in asof_join(left, right, on="t", by=["k"],
                              direction="forward").collect()}
    assert fwd == {"a": (8, 80.0), "b": (None, None)}

    inner = asof_join(left, right, on="t", by=["k"], how="inner").collect()
    assert [(r.tag, r.t_r, r.v_r) for r in inner] == [("a", 3, 30.0)]


def test_tie_break_picks_max_deterministically(spark):
    """tie_break: among right rows tied on (by, on), the max-tie_break row
    wins — equivalent to pre-aggregating right per (by, on) with max, but
    inside the window's single shuffle. NULL tie values lose to non-NULL;
    an all-NULL tie group still matches (with a NULL value), exactly like
    max() over the group."""
    left = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "k int, t int, tag string")
    right = spark.createDataFrame(
        [(1, 5, 3.0), (1, 5, 7.0), (1, 5, None), (1, 2, 99.0),
         (2, 5, None), (2, 5, None)],
        "k int, t int, v double")
    out = {r.tag: (r.t_r, r.v_r)
           for r in asof_join(left, right, on="t", by=["k"],
                              tie_break="v").collect()}
    assert out == {"a": (5, 7.0), "b": (5, None)}


def test_tie_break_matches_preagg_plan(spark):
    """Differential: tie_break ≡ caller-side groupBy(max) pre-aggregation
    on a randomized input with heavy (k, t) duplication."""
    import random

    rnd = random.Random(7)
    rows_l = [(rnd.randint(0, 5), rnd.randint(0, 30), i) for i in range(80)]
    rows_r = [(rnd.randint(0, 5), rnd.randint(0, 30),
               None if rnd.random() < 0.2 else round(rnd.random(), 3))
              for _ in range(300)]
    left = spark.createDataFrame(rows_l, "k int, t int, lid int")
    right = spark.createDataFrame(rows_r, "k int, t int, v double")

    pre = right.groupBy("k", "t").agg(F.max("v").alias("v"))
    want = sorted((r.lid, r.t_r, r.v_r) for r in
                  asof_join(left, pre, on="t", by=["k"]).collect())
    got = sorted((r.lid, r.t_r, r.v_r) for r in
                 asof_join(left, right, on="t", by=["k"],
                           tie_break="v").collect())
    assert got == want
