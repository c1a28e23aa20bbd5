"""Source/sink round-trips (the COPY surface), CTAS, format gating, the
UDF/SQL-macro registration surface (SURVEY §2.13), and approximate
aggregates sanity."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from serenedb_spark.sources.io import ctas, format_available, read_table, write_table
from tests.conftest import SF_DIR


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="serene_io_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, tmpdir, fmt):
    df = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    write_table(df, f"{tmpdir}/t", fmt=fmt)
    # JSON/CSV lose exact types without a schema — read back with the
    # source schema (the engine's convention for schema-full formats)
    schema = df.schema.toDDL() if fmt in ("csv", "json") else None
    back = read_table(spark, f"{tmpdir}/t", fmt=fmt, schema=schema)
    assert back.count() == df.count()
    a = sorted(df.select("c_custkey", "c_name").collect())
    b = sorted(back.select("c_custkey", "c_name").collect())
    assert a == b


def test_single_file_copy_to(spark, tmpdir):
    import glob

    df = spark.read.parquet(f"{SF_DIR}/region.parquet")
    write_table(df, f"{tmpdir}/one", fmt="csv", single_file=True)
    files = glob.glob(f"{tmpdir}/one/part-*")
    assert len(files) == 1


def test_ctas(spark, tmpdir):
    spark.read.parquet(f"{SF_DIR}/orders.parquet").createOrReplaceTempView("orders")
    out = ctas(
        spark, "big_orders",
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000",
        path=f"{tmpdir}/big_orders",
    )
    assert out.count() == spark.sql("SELECT count(*) FROM big_orders").first()[0]
    assert out.count() > 0


def test_format_gating(spark):
    assert format_available(spark, "parquet")
    # avro jar may or may not be present — the call must not raise
    format_available(spark, "avro")


def test_udf_and_sql_macro(spark):
    """CREATE MACRO / CREATE FUNCTION analogue (function.h:30-33):
    python UDF + SQL-bodied function both registered and callable."""
    spark.udf.register("py_revenue", lambda p, d: p * (1 - d), "double")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").createOrReplaceTempView("lineitem")
    got = spark.sql(
        "SELECT round(sum(py_revenue(l_extendedprice, l_discount)), 2) AS r FROM lineitem"
    ).first()[0]
    want = spark.sql(
        "SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS r FROM lineitem"
    ).first()[0]
    assert abs(got - want) < 1e-6

    # table-macro analogue: a named view over a parameter-free SQL body
    spark.sql(
        "CREATE OR REPLACE TEMPORARY VIEW v_macro AS "
        "SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS net FROM lineitem"
    )
    assert spark.sql("SELECT count(*) FROM v_macro").first()[0] > 0


def test_approx_aggregates(spark):
    """approx_count_distinct / percentile_approx (reference approx_quantile,
    demo6:66-78): sanity-bounded vs exact — approximate results can't
    hash-match an oracle, so they're asserted here instead."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = ev.select(F.count_distinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id")).first()[0]
    assert abs(approx - exact) / exact < 0.05
    p50 = ev.select(F.percentile_approx("value", 0.5)).first()[0]
    lo, hi = ev.select(F.min("value"), F.max("value")).first()
    assert lo <= p50 <= hi


def test_macro_catalog_facade(spark):
    """Session-level CREATE MACRO parity (DuckDB scalar + table macros,
    function.cpp:78-96) via Spark 4 SQL UDFs."""
    from serenedb_spark.session import SereneSession

    ss = SereneSession(spark)
    ss.create_macro("net_price", "p DOUBLE, d DOUBLE", "p * (1 - d)")
    assert ss.sql("SELECT net_price(10.0, 0.1) AS v").first().v == 9.0

    ss.create_table_macro(
        "int_range", "n INT", "x INT",
        "SELECT explode(sequence(1, n))",
    )
    got = [r.x for r in ss.sql("SELECT * FROM int_range(4)").collect()]
    assert got == [1, 2, 3, 4]

    ss.drop_macro("net_price")
    import pytest as _pytest
    with _pytest.raises(Exception):
        ss.sql("SELECT net_price(1.0, 0.5)").collect()
