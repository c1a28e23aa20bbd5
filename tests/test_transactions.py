"""Session transaction blocks (reference: implicit multi-statement
blocks mirroring postgres.c, pg_wire_session.cpp:1369-1398;
tests any/pg/txn/): BEGIN/COMMIT/ROLLBACK over the session's mutable
state — DML, constraints, comments, grants — with all-or-nothing
visibility through both the API and registered temp views."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serenedb_spark.session import SereneSession

from tests.conftest import SF_DIR


@pytest.fixture()
def ss(spark):
    s = SereneSession(spark)
    s.load_dir(SF_DIR, tables=("nation", "region"))
    return s


def test_rollback_restores_dml(ss, spark):
    n0 = ss.table("nation").count()
    ss.begin()
    ss.insert("nation", spark.createDataFrame(
        [(900, "NEWLAND", 0)], ss._tables["nation"].schema))
    ss.delete("nation", F.col("n_nationkey") < 5)
    assert ss.table("nation").count() == n0 + 1 - 5
    # the registered VIEW sees the in-block state too
    assert ss.sql("SELECT count(*) AS n FROM nation").first().n \
        == n0 + 1 - 5
    ss.rollback()
    assert ss.table("nation").count() == n0
    assert ss.sql("SELECT count(*) AS n FROM nation").first().n == n0
    assert ss.table("nation").where("n_nationkey = 900").count() == 0


def test_commit_persists(ss, spark):
    n0 = ss.table("nation").count()
    ss.begin()
    ss.insert("nation", spark.createDataFrame(
        [(901, "COMMITTED", 1)], ss._tables["nation"].schema))
    ss.commit()
    assert ss.table("nation").count() == n0 + 1
    with pytest.raises(ValueError):
        ss.commit()  # no transaction in progress


def test_rollback_restores_catalog_state(ss):
    ss.begin()
    ss.set_primary_key("nation", "n_nationkey")
    ss.add_check("nation", "key_pos", F.col("n_nationkey") >= 0)
    ss.comment_on("nation", "tpch nations")
    ss.grant("analyst", "nation", "SELECT")
    assert getattr(ss, "_pks", {}).get("nation") == "n_nationkey"
    ss.rollback()
    assert getattr(ss, "_pks", {}).get("nation") is None
    assert "key_pos" not in getattr(ss, "_checks", {}).get("nation", {})
    assert ss.get_comment("nation") is None
    assert not ss.has_table_privilege("analyst", "nation", "SELECT")


def test_transaction_context_manager(ss, spark):
    n0 = ss.table("nation").count()
    with ss.transaction():
        ss.insert("nation", spark.createDataFrame(
            [(902, "CTX", 2)], ss._tables["nation"].schema))
    assert ss.table("nation").count() == n0 + 1

    with pytest.raises(RuntimeError):
        with ss.transaction():
            ss.insert("nation", spark.createDataFrame(
                [(903, "DOOMED", 2)], ss._tables["nation"].schema))
            raise RuntimeError("boom")
    assert ss.table("nation").count() == n0 + 1  # rolled back
    assert ss.table("nation").where("n_nationkey = 903").count() == 0


def test_nested_begin_refused(ss):
    ss.begin()
    with pytest.raises(ValueError):
        ss.begin()
    ss.rollback()
    with pytest.raises(ValueError):
        ss.rollback()


def test_failed_statement_inside_block_keeps_block_consistent(ss, spark):
    """A statement that FAILS its constraints applies nothing (statement
    atomicity), and the surrounding block can still roll back cleanly."""
    ss.set_primary_key("nation", "n_nationkey")
    n0 = ss.table("nation").count()
    ss.begin()
    with pytest.raises(ValueError):
        ss.insert("nation", spark.createDataFrame(
            [(0, "DUPKEY", 0)], ss._tables["nation"].schema))
    assert ss.table("nation").count() == n0
    ss.rollback()
    assert ss.table("nation").count() == n0
    # PK survives: it was set BEFORE the block
    assert getattr(ss, "_pks", {}).get("nation") == "n_nationkey"
