"""Row-level security: a policy set on a table must filter BOTH access
paths (DataFrame `table()` and `sql()` over the temp view), compose with
index builds, and push down to the scan (reference optimizer/rbac.cpp
injects access predicates at plan time)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serenedb_spark.session import SereneSession
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def ss(spark):
    s = SereneSession(spark)
    s.load_dir(SF_DIR, tables=("documents", "orders"))
    return s


def test_policy_filters_both_paths(ss):
    total = ss.table("documents").count()
    ss.set_row_policy("documents", "lang = 'en'")
    try:
        en_df = ss.table("documents").count()
        en_sql = ss.sql("SELECT count(*) AS n FROM documents").collect()[0].n
        want = ss._tables["documents"].where(F.col("lang") == "en").count()
        assert en_df == en_sql == want < total
    finally:
        ss.drop_row_policy("documents")
    assert ss.table("documents").count() == total


def test_policy_composes_with_index(ss):
    ss.set_row_policy("documents", F.col("lang") == "en")
    try:
        idx = ss.create_index("documents", {"text": "simple"}, key="doc_id",
                              name="docs_en_policy")
        from serenedb_spark.plans import tsquery as q

        ids = {r.doc_id for r in ss.match(idx, q.Term("spark")).collect()}
        allowed = {
            r.doc_id
            for r in ss._tables["documents"].where("lang = 'en'")
            .select("doc_id").collect()
        }
        assert ids and ids <= allowed
    finally:
        ss.drop_row_policy("documents")


def test_policy_pushes_down(ss):
    ss.set_row_policy("orders", "o_orderstatus = 'F'")
    try:
        plan = ss.table("orders")._jdf.queryExecution().executedPlan().toString()
        assert "o_orderstatus" in plan  # filter reached the physical plan
    finally:
        ss.drop_row_policy("orders")


def test_column_mask_both_paths(ss):
    """Column masking (reference rbac.cpp column privileges): the masked
    expression replaces the column on table() and sql(); dropping the
    mask restores the raw values; composes with a row policy."""
    raw = ss._tables["orders"].select("o_orderstatus").first().o_orderstatus
    ss.set_column_mask("orders", "o_orderstatus", "'***'")
    try:
        assert ss.table("orders").select("o_orderstatus").first().o_orderstatus == "***"
        got = ss.sql("SELECT o_orderstatus FROM orders LIMIT 1").first().o_orderstatus
        assert got == "***"
        # typed mask: numeric column rounded to bucket
        ss.set_column_mask("orders", "o_totalprice",
                           F.floor(F.col("o_totalprice") / 1000) * 1000)
        p = ss.table("orders").select("o_totalprice").first().o_totalprice
        assert p % 1000 == 0
    finally:
        ss.drop_column_mask("orders")
    assert ss.table("orders").select("o_orderstatus").first().o_orderstatus == raw


def test_column_mask_composes_with_row_policy(ss):
    ss.set_row_policy("orders", "o_orderkey < 100")
    ss.set_column_mask("orders", "o_orderstatus", None)
    try:
        rows = ss.table("orders").select("o_orderkey", "o_orderstatus").collect()
        assert all(r.o_orderstatus is None for r in rows)
        assert all(r.o_orderkey < 100 for r in rows)
        n_sql = ss.sql(
            "SELECT count(*) AS n FROM orders WHERE o_orderstatus IS NULL"
        ).first().n
        assert n_sql == len(rows)
    finally:
        ss.drop_column_mask("orders")
        ss.drop_row_policy("orders")


def test_grant_revoke_enforcement(ss):
    """GRANT/REVOKE at the catalog boundary (reference rbac.cpp): a
    scoped user needs SELECT; superuser (None) is unenforced."""
    ss.set_user("analyst")
    try:
        # PG's message names the relation, not the user
        # ("permission denied for table orders")
        with pytest.raises(PermissionError, match="orders"):
            ss.table("orders")
        ss.grant("analyst", "orders")
        assert ss.table("orders").count() > 0
        ss.revoke("analyst", "orders")
        with pytest.raises(PermissionError):
            ss.table("orders")
    finally:
        ss.set_user(None)
    assert ss.table("orders").count() > 0
