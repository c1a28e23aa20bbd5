"""Order-preserving key encoding (functions/key_encoding.py) — the memcmp
contract of reference server/connector/key_encoding.h: encoded-byte order
== value order, three-way agreement between the JVM expression, the
Python twin, and the DuckDB oracle fragment."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from serenedb_spark.functions import key_encoding as K

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(st.lists(I64, min_size=2, max_size=30, unique=True))
@settings(max_examples=50, deadline=None)
def test_int_encoding_order_preserving(vals):
    keys = [K.py_encode_int(v) for v in vals]
    assert sorted(range(len(vals)), key=lambda i: vals[i]) == sorted(
        range(len(vals)), key=lambda i: keys[i]
    )


@given(st.lists(I64, min_size=1, max_size=8, unique=True))
@settings(max_examples=10, deadline=None)
def test_int_three_way_agreement(vals):
    con = duckdb.connect()
    for v in vals:
        duck = con.execute(
            "SELECT " + K.duckdb_encode_int(str(v))
        ).fetchone()[0]
        assert duck == K.py_encode_int(v)


def test_spark_encode_matches_python(spark):
    vals = [-(2**63), -5, -1, 0, 1, 42, 2**63 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.v: r.k
        for r in df.select("v", K.encode_int(F.col("v")).alias("k")).collect()
    }
    assert got == {v: K.py_encode_int(v) for v in vals}


def test_decode_round_trip(spark):
    vals = [-(2**63), -123456789, 0, 7, 2**62]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    out = df.select(
        "v", K.decode_int(K.encode_int(F.col("v"))).alias("back")
    ).collect()
    assert all(r.v == r.back for r in out)


def test_string_prefix_orders_before_extension(spark):
    # 'a' must order before 'a\x00b' and 'ab' after both escaping; a raw
    # concat without termination would get this wrong
    vals = ["a", "a\x00b", "ab", "", "b"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    rows = df.select(
        "v", K.encode_string(F.col("v")).alias("k")
    ).collect()
    by_val = [r.v for r in sorted(rows, key=lambda r: r.v)]
    by_key = [r.v for r in sorted(rows, key=lambda r: r.k)]
    assert by_val == by_key


def test_composite_field_isolation(spark):
    # ('ab', 'x') must order after ('a', 'z'): without the terminator the
    # concatenated raw strings would compare 'abx' < 'az' — wrong
    df = spark.createDataFrame(
        [("a", "z"), ("ab", "x")], "s1 string, s2 string")
    rows = df.select(
        "s1", "s2",
        K.composite(K.encode_string(F.col("s1")),
                    K.encode_string(F.col("s2"))).alias("k"),
    ).collect()
    ordered = sorted(rows, key=lambda r: r.k)
    assert [(r.s1, r.s2) for r in ordered] == [("a", "z"), ("ab", "x")]


def test_null_greatest_in_composite(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None)], "i long, s string")
    rows = df.select(
        "i",
        K.composite(K.encode_string(F.col("s"))).alias("k"),
    ).collect()
    ordered = sorted(rows, key=lambda r: r.k)
    assert [r.i for r in ordered] == [1, 2]


def test_date_timestamp_monotone(spark):
    df = spark.sql("""
      SELECT * FROM VALUES
        (DATE'1969-07-20', TIMESTAMP'1969-07-20 20:17:00'),
        (DATE'1970-01-01', TIMESTAMP'1970-01-01 00:00:00'),
        (DATE'2026-08-14', TIMESTAMP'2026-08-14 12:00:00.000001')
      AS t(d, ts)
    """)
    rows = df.select(
        "d",
        K.encode_date(F.col("d")).alias("kd"),
        K.encode_timestamp(F.col("ts")).alias("kt"),
    ).collect()
    assert [r.d for r in sorted(rows, key=lambda r: r.kd)] == sorted(
        r.d for r in rows)
    assert sorted(r.kt for r in rows) == [r.kt for r in rows]


def test_double_scaled_order(spark):
    vals = [-2.5, -0.000001, 0.0, 0.000001, 3.14159, 1e6]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select(
        "v", K.encode_double(F.col("v")).alias("k")).collect()
    assert [r.v for r in sorted(rows, key=lambda r: r.k)] == sorted(vals)
