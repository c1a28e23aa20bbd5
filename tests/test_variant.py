"""VARIANT/UNION surface (functions/variant.py): parquet round-trip of
the native VariantType, shredded projection (variant.test example_005's
SHREDDING as typed columns), and union NULL semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from serenedb_spark.functions import variant as V

MEMBERS = {"num": "long", "str": "string"}


def test_variant_parquet_roundtrip(spark, tmp_path):
    df = spark.sql("""
        SELECT id, parse_json(js) AS data FROM VALUES
          (1, '42'), (2, '"hello world"'), (3, '[1,2,3]'),
          (4, '{"age":30,"name":"Alice"}') AS t(id, js)
    """)
    p = str(tmp_path / "v.parquet")
    df.write.parquet(p)
    back = spark.read.parquet(p)
    assert dict(back.dtypes)["data"] == "variant"
    got = {r.id: r.j for r in back.select(
        "id", F.to_json("data").alias("j")).collect()}
    assert got == {1: "42", 2: '"hello world"', 3: "[1,2,3]",
                   4: '{"age":30,"name":"Alice"}'}


def test_shred_variant_projection(spark, tmp_path):
    df = spark.sql("""
        SELECT id, parse_json(js) AS data FROM VALUES
          (1, '{"age":30,"name":"Alice"}'),
          (2, '{"name":"Bob"}'),
          (3, '42') AS t(id, js)
    """)
    shredded = V.shred_variant(
        df, "data", {"name": "string", "age": "long"}, keep=["id"])
    p = str(tmp_path / "s.parquet")
    shredded.write.parquet(p)
    back = spark.read.parquet(p)
    # the shredded paths are plain typed columns (prunable), the full
    # variant rides along for untyped access
    assert dict(back.dtypes)["name"] == "string"
    assert dict(back.dtypes)["age"] == "bigint"
    rows = {r.id: (r.name, r.age) for r in back.collect()}
    assert rows == {1: ("Alice", 30), 2: ("Bob", None), 3: (None, None)}
    # column-pruned read touches only the shredded column
    plan = back.select("name")._jdf.queryExecution().executedPlan().toString()
    assert "data" not in plan.split("ReadSchema")[-1]


def test_union_null_and_member_semantics(spark):
    df = spark.range(4).select(
        F.when(F.col("id") % 2 == 0,
               V.union_value("num", F.col("id"), MEMBERS))
        .otherwise(V.union_value(
            "str", F.concat(F.lit("x"), F.col("id").cast("string")),
            MEMBERS)).alias("u"))
    got = [(r.tag, r.num, r.s, r.rend) for r in df.select(
        V.union_tag(F.col("u")).alias("tag"),
        V.union_extract(F.col("u"), "num").alias("num"),
        V.union_extract(F.col("u"), "str").alias("s"),
        V.union_render(F.col("u"), MEMBERS).alias("rend"),
    ).orderBy(V.union_extract(F.col("u"), "num").asc_nulls_last(),
              "s").collect()]
    assert got == [("num", 0, None, "0"), ("num", 2, None, "2"),
                   ("str", None, "x1", "x1"), ("str", None, "x3", "x3")]


def test_union_value_rejects_unknown_member():
    import pytest

    with pytest.raises(KeyError):
        V.union_value("nope", F.lit(1), MEMBERS)
