"""PG system/introspection subset (reference system.cpp + pg_catalog):
pg_typeof/format_type spellings, current_setting/set_config over session
conf, pg_table_size, the pg_catalog view shim, has_table_privilege."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serenedb_spark.functions import pg_system as PSY
from serenedb_spark.session import SereneSession
from tests.conftest import SF_DIR


@pytest.fixture()
def ss(spark):
    s = SereneSession(spark)
    s.load_dir(SF_DIR, tables=("orders", "documents"))
    return s


def test_format_type():
    assert PSY.format_type("string") == "text"
    assert PSY.format_type("double") == "double precision"
    assert PSY.format_type("decimal(12,2)") == "numeric(12,2)"
    assert PSY.format_type("array<string>") == "text[]"
    assert PSY.format_type("binary") == "bytea"


def test_pg_typeof(spark):
    df = spark.createDataFrame([(1, "x", 2.5)], "a long, b string, c double")
    r = df.select(
        PSY.pg_typeof(F.col("a")).alias("ta"),
        PSY.pg_typeof(F.col("b")).alias("tb"),
        PSY.pg_typeof(F.col("c")).alias("tc"),
    ).first()
    assert (r.ta, r.tb, r.tc) == ("bigint", "text", "double precision")


def test_settings_roundtrip(spark):
    PSY.set_config(spark, "serene.custom.knob", "42")
    assert PSY.current_setting(spark, "serene.custom.knob") == "42"
    assert PSY.current_setting(spark, "serene.not.there",
                               missing_ok=True) is None
    with pytest.raises(Exception):
        PSY.current_setting(spark, "serene.not.there")


def test_pg_table_size(ss):
    n = PSY.pg_table_size(ss.spark, ss._tables["orders"])
    assert n > 0


def test_pg_catalog_views(ss):
    ss.create_index("documents", {"text": "simple"}, key="doc_id",
                    name="docs_catalog_idx")
    ss.install_pg_catalog()
    tabs = {r.tablename for r in ss.sql("SELECT * FROM pg_tables").collect()}
    assert {"orders", "documents"} <= tabs
    cols = ss.sql(
        "SELECT attname, atttypid FROM pg_attribute "
        "WHERE attrelid = 'orders' ORDER BY attnum"
    ).collect()
    names = [r.attname for r in cols]
    assert names[0] == "o_orderkey"
    assert dict((r.attname, r.atttypid) for r in cols)["o_orderkey"] == \
        "bigint"
    idx = ss.sql("SELECT * FROM pg_indexes").collect()
    assert any(r.indexname == "docs_catalog_idx" for r in idx)


def test_has_table_privilege(ss):
    assert not ss.has_table_privilege("bob", "orders")
    ss.grant("bob", "orders")
    assert ss.has_table_privilege("bob", "orders")
    assert not ss.has_table_privilege("bob", "orders", "INSERT")
