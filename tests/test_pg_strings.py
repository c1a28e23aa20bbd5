"""PG-compat string/binary helpers without a DuckDB twin (get_bit/get_byte
use PG's LSB-first numbering; like_escape honors a custom escape char) —
verified against hand-computed PG semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from serenedb_spark.functions import pg_strings as PS


def test_get_bit_and_byte(spark):
    # 0xAA = 0b10101010 → PG get_bit(… ,0)=0, 1=1, … (LSB-first)
    df = spark.createDataFrame([(bytearray([0xAA, 0x01]),)], "b binary")
    row = df.select(
        *[PS.get_bit(F.col("b"), i).alias(f"bit{i}") for i in range(8)],
        PS.get_byte(F.col("b"), 0).alias("byte0"),
        PS.get_byte(F.col("b"), 1).alias("byte1"),
        PS.get_bit(F.col("b"), 8).alias("bit8"),
    ).collect()[0]
    assert [row[f"bit{i}"] for i in range(8)] == [0, 1, 0, 1, 0, 1, 0, 1]
    assert (row.byte0, row.byte1) == (0xAA, 0x01)
    assert row.bit8 == 1  # low bit of the second byte


def test_quote_and_like_escape(spark):
    df = spark.createDataFrame(
        [('he said "hi"', "it's", "50% off_now")], "a string, b string, c string"
    )
    row = df.select(
        PS.quote_ident(F.col("a")).alias("qi"),
        PS.quote_literal(F.col("b")).alias("ql"),
        PS.quote_nullable(F.lit(None).cast("string")).alias("qn"),
        PS.like_escape(F.col("c"), r"50\% off\_now").alias("exact"),
        PS.like_escape(F.col("c"), "50% off_now").alias("wild"),
    ).collect()[0]
    assert row.qi == '"he said ""hi"""'
    assert row.ql == "'it''s'"
    assert row.qn == "NULL"
    assert row.exact is True   # escaped % and _ are literals
    assert row.wild is True    # unescaped: % and _ are wildcards
