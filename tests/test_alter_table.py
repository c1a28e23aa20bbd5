"""ALTER TABLE surgery on the session catalog (reference ddl/alter_*.test:
add/rename/drop column, SET NOT NULL validation, struct-field surgery).
Alters rewrite the registered relation + temp view; both access paths
must see the new shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serenedb_spark.session import SereneSession
from tests.conftest import SF_DIR


@pytest.fixture()
def ss(spark):
    s = SereneSession(spark)
    s.load_dir(SF_DIR, tables=("orders",))
    return s


def test_add_rename_drop_column(ss):
    ss.alter_add_column("orders", "net", "o_totalprice * 0.9")
    r = ss.sql("SELECT o_totalprice, net FROM orders LIMIT 1").first()
    assert abs(r.net - r.o_totalprice * 0.9) < 1e-9

    ss.alter_rename_column("orders", "net", "net_price")
    assert "net_price" in ss.table("orders").columns
    assert "net" not in ss.table("orders").columns

    ss.alter_drop_column("orders", "net_price")
    assert "net_price" not in ss.table("orders").columns


def test_add_column_default(ss):
    ss.alter_add_column("orders", "region_code", None, default=7)
    vals = [r.region_code for r in
            ss.sql("SELECT DISTINCT region_code FROM orders").collect()]
    assert vals == [7]


def test_set_not_null_validates(ss):
    ss.alter_set_not_null("orders", "o_orderkey")  # no NULLs: accepted
    ss.alter_add_column("orders", "maybe", "CASE WHEN o_orderkey % 2 = 0"
                                           " THEN NULL ELSE 1 END")
    with pytest.raises(ValueError, match="NULL"):
        ss.alter_set_not_null("orders", "maybe")


def test_struct_field_surgery(ss):
    ss.alter_add_column(
        "orders", "meta",
        F.struct(F.col("o_orderkey").alias("k"),
                 F.lit("x").alias("tag")),
    )
    ss.alter_struct_field("orders", "meta", "tag", "'updated'")
    r = ss.table("orders").select("meta").first()
    assert r.meta.tag == "updated"
    ss.alter_struct_field("orders", "meta", "extra", F.lit(5))
    assert ss.table("orders").select("meta").first().meta.extra == 5
    ss.alter_drop_struct_field("orders", "meta", "tag")
    assert "tag" not in ss.table("orders").select("meta.*").columns


def test_add_column_serial_default(ss):
    """ADD COLUMN with a sequence default: unique gap-free ids across the
    existing rows (reference alter_add_column_sequence_default.test)."""
    ss.create_sequence("row_seq", start=100)
    n = ss.table("orders").count()
    ss.alter_add_column_serial("orders", "rid", "row_seq")
    vals = sorted(r.rid for r in ss.table("orders").select("rid").collect())
    assert vals == list(range(100, 100 + n))
    assert ss.nextval("row_seq") == 100 + n


def test_comment_on(ss):
    ss.comment_on("orders", "the orders fact table")
    ss.comment_on("orders.o_totalprice", "gross price")
    assert ss.get_comment("orders") == "the orders fact table"
    assert ss.get_comment("orders.o_totalprice") == "gross price"
    ss.comment_on("orders", None)
    assert ss.get_comment("orders") is None
