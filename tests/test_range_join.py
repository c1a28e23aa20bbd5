"""range_join (operators/temporal_join.py) vs a DuckDB BETWEEN join —
bucketized interval-containment must match the naive inequality spec for
every bucket width, including widths far smaller than interval lengths."""

from __future__ import annotations

import duckdb
import pytest

from serenedb_spark.operators.temporal_join import range_join

P = [(1, 0), (2, 5), (3, 10), (4, 17), (5, 100), (6, -3)]
IV = [(10, 0, 4), (11, 3, 12), (12, 10, 10), (13, 90, 120), (14, -5, -1)]


@pytest.fixture(scope="module")
def sides(spark):
    pts = spark.createDataFrame(P, "pid int, x int")
    ivs = spark.createDataFrame(IV, "iid int, s int, e int")
    con = duckdb.connect()
    con.execute("CREATE TABLE p(pid int, x int)")
    con.executemany("INSERT INTO p VALUES (?,?)", P)
    con.execute("CREATE TABLE iv(iid int, s int, e int)")
    con.executemany("INSERT INTO iv VALUES (?,?,?)", IV)
    return pts, ivs, con


WANT_SQL = """
SELECT p.pid, iv.iid FROM p JOIN iv ON p.x BETWEEN iv.s AND iv.e
ORDER BY pid, iid
"""


@pytest.mark.parametrize("width", [None, 1, 3, 1000])
def test_matches_between_spec_any_width(sides, width):
    pts, ivs, con = sides
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(pts, ivs, "x", "s", "e",
                            bucket_width=width).collect()
    )
    assert got == con.execute(WANT_SQL).fetchall()


def test_no_duplicate_pairs(sides):
    pts, ivs, _ = sides
    rows = [(r.pid, r.iid)
            for r in range_join(pts, ivs, "x", "s", "e",
                                bucket_width=2).collect()]
    assert len(rows) == len(set(rows))


def test_by_key_scopes_matches(spark):
    pts = spark.createDataFrame([("a", 1, 5), ("b", 2, 5)],
                                "k string, pid int, x int")
    ivs = spark.createDataFrame([("a", 10, 0, 9)],
                                "k string, iid int, s int, e int")
    got = [(r.k, r.pid, r.iid)
           for r in range_join(pts, ivs, "x", "s", "e", by=["k"]).collect()]
    assert got == [("a", 1, 10)]


def test_date_columns(spark):
    pts = spark.sql("""
      SELECT * FROM VALUES (1, DATE'2026-03-15'), (2, DATE'2026-07-01')
      AS t(pid, d)""")
    ivs = spark.sql("""
      SELECT * FROM VALUES (10, DATE'2026-03-01', DATE'2026-03-31'),
                           (11, DATE'2026-06-01', DATE'2026-06-30')
      AS t(iid, s, e)""")
    got = [(r.pid, r.iid)
           for r in range_join(pts, ivs, "d", "s", "e").collect()]
    assert got == [(1, 10)]


def test_overlapping_columns_rejected(spark):
    pts = spark.createDataFrame([(1, 2)], "x int, dup int")
    ivs = spark.createDataFrame([(0, 9, 3)], "s int, e int, dup int")
    with pytest.raises(ValueError, match="dup"):
        range_join(pts, ivs, "x", "s", "e")
