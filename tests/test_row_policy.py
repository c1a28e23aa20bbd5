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
