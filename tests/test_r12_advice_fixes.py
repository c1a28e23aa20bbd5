"""Regression tests for the round-12 advice fixes: fresh-database
sequence catalogs, string_agg separators containing commas, SIMILAR TO
literal-dot/escape semantics, pre-1970 encoded_ts keys, and ts_dict
ORDER BY over ts_dict_*() calls."""

from __future__ import annotations

import pytest

from serenedb_spark.session import SereneSession


@pytest.fixture()
def ss(spark):
    return SereneSession(spark)


def test_create_sequence_in_new_database(ss):
    """CREATE DATABASE used to initialize _sequences as a plain dict —
    CREATE SEQUENCE after USE then raised AttributeError."""
    ss.sql("CREATE DATABASE r12db")
    ss.sql("USE r12db")
    try:
        ss.sql("CREATE SEQUENCE s12")
        rows = ss.sql("SELECT nextval('s12') AS n").collect()
        assert rows[0]["n"] == 1
        ss.sql("CREATE TABLE ser12 (id SERIAL, v INT)")
        ss.sql("INSERT INTO ser12 (v) VALUES (7)")
        got = ss.sql("SELECT id, v FROM ser12").collect()
        assert [(r["id"], r["v"]) for r in got] == [(1, 7)]
    finally:
        ss.sql("USE serene")
        ss.sql("DROP DATABASE r12db")


def test_string_agg_separator_with_comma(ss, spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (2, "c")], "k long, s string")
    ss._tables["sagg"] = df
    df.createOrReplaceTempView("sagg")
    out = ss.sql(
        "SELECT k, string_agg(s, ', ' ORDER BY s) AS agg "
        "FROM sagg GROUP BY k ORDER BY k").collect()
    assert [(r["k"], r["agg"]) for r in out] == [(1, "a, b"), (2, "c")]
    # nested function call in the value argument still splits correctly
    out2 = ss.sql(
        "SELECT string_agg(concat(s, ','), '; ' ORDER BY s) AS agg "
        "FROM sagg").collect()
    assert out2[0]["agg"] == "a,; b,; c,"


def test_similar_to_literal_dot_and_escape(ss, spark):
    df = spark.createDataFrame(
        [("a.b",), ("axb",), ("a%b",), ("aXb",)], "s string")
    ss._tables["simto"] = df
    df.createOrReplaceTempView("simto")
    dot = ss.sql(
        "SELECT s FROM simto WHERE s SIMILAR TO 'a.b'").collect()
    assert [r["s"] for r in dot] == ["a.b"]
    esc = ss.sql(
        r"SELECT s FROM simto WHERE s SIMILAR TO 'a\%b'").collect()
    assert [r["s"] for r in esc] == ["a%b"]
    wild = sorted(r["s"] for r in ss.sql(
        "SELECT s FROM simto WHERE s SIMILAR TO 'a_b'").collect())
    assert wild == ["a%b", "a.b", "aXb", "axb"]


def test_encts_py_pre_1970_matches_column_twin():
    import datetime as dt

    from serenedb_spark.analysis.analyzers import analyzers
    from serenedb_spark.functions.key_encoding import py_encode_int

    a = analyzers()["encoded_ts"]
    # -0.5s epoch: int(total_seconds()) truncation used to yield +500000
    v = dt.datetime(1969, 12, 31, 23, 59, 59, 500000)
    assert a.tokens("1969-12-31 23:59:59.5") == [py_encode_int(-500_000)]
    assert a.tokens(v) == [py_encode_int(-500_000)]
    # tz-aware input normalizes to UTC instead of raising
    aware = dt.datetime(1970, 1, 1, 1, 0, 0,
                        tzinfo=dt.timezone(dt.timedelta(hours=1)))
    assert a.tokens(aware) == [py_encode_int(0)]
    assert a.tokens("1970-01-01T01:00:00+01:00") == [py_encode_int(0)]


def test_ts_dict_order_by_freq_call(ss, spark):
    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"),
         (3, "banana")], "id long, body string")
    ss._tables["tsd12"] = df
    df.createOrReplaceTempView("tsd12")
    ss.sql("CREATE INDEX i12 ON tsd12 USING inverted(body simple)")
    out = ss.sql(
        "SELECT unnest(ts_dict_agg(body)) AS term, "
        "unnest(ts_dict_freq(body)) AS f "
        "FROM i12 ORDER BY ts_dict_freq(body) DESC, "
        "ts_dict_agg(body) LIMIT 2").collect()
    assert [(r["term"], r["f"]) for r in out] == [
        ("banana", 3), ("apple", 2)]
