"""Session catalog DML with constraint enforcement (reference
add_column_constraints / alter_add_primary_key /
drop_cascade_check_constraints tests): PK uniqueness, CHECK validation on
add and on every write, NOT NULL, privilege composition — all-or-nothing
application."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serenedb_spark.session import SereneSession


@pytest.fixture()
def ss(spark):
    s = SereneSession(spark)
    s._tables["t"] = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double")
    s._tables["t"].createOrReplaceTempView("t")
    return s


def test_primary_key_validates_and_enforces(ss, spark):
    ss.set_primary_key("t", "k")
    with pytest.raises(ValueError, match="primary key"):
        ss.insert("t", spark.createDataFrame([(1, 99.0)],
                                             "k long, v double"))
    ss.insert("t", spark.createDataFrame([(4, 40.0)], "k long, v double"))
    assert ss.table("t").count() == 4
    # duplicate existing data rejects the PK itself
    ss._tables["t2"] = spark.createDataFrame([(1,), (1,)], "k long")
    with pytest.raises(ValueError, match="duplicate"):
        ss.set_primary_key("t2", "k")


def test_check_constraint_on_add_and_insert(ss, spark):
    ss.add_check("t", "v_positive", "v > 0")
    with pytest.raises(ValueError, match="v_positive"):
        ss.insert("t", spark.createDataFrame([(9, -1.0)],
                                             "k long, v double"))
    assert ss.table("t").count() == 3, "failed insert applied nothing"
    with pytest.raises(ValueError, match="violated by existing"):
        ss.add_check("t", "v_big", "v > 15")
    ss.drop_check("t", "v_positive")
    ss.insert("t", spark.createDataFrame([(9, -1.0)], "k long, v double"))
    assert ss.table("t").count() == 4


def test_update_validates_checks(ss, spark):
    ss.add_check("t", "v_positive", "v > 0")
    with pytest.raises(ValueError, match="v_positive"):
        ss.update("t", "k = 1", {"v": "-5.0"})
    ss.update("t", "k = 1", {"v": "55.0"})
    got = {r.k: r.v for r in ss.table("t").collect()}
    assert got[1] == 55.0


def test_delete_and_sql_view_sync(ss):
    ss.delete("t", "k = 2")
    assert ss.sql("SELECT count(*) AS n FROM t").first().n == 2


def test_dml_respects_grants(ss, spark):
    ss.set_user("writer")
    try:
        with pytest.raises(PermissionError):
            ss.insert("t", spark.createDataFrame([(7, 7.0)],
                                                 "k long, v double"))
        ss.grant("writer", "t", "INSERT")
        ss.insert("t", spark.createDataFrame([(7, 7.0)],
                                             "k long, v double"))
        with pytest.raises(PermissionError):
            ss.delete("t", "k = 7")
    finally:
        ss.set_user(None)


def test_update_cannot_violate_pk(ss, spark):
    # ADVICE r9 (high): UPDATE re-checks PK uniqueness over the FULL
    # post-update state — `SET k = 1 WHERE k = 2` must reject, PG-style
    ss.set_primary_key("t", "k")
    with pytest.raises(ValueError, match="duplicate"):
        ss.update("t", "k = 2", {"k": "1"})
    got = sorted(r.k for r in ss.table("t").collect())
    assert got == [1, 2, 3], "failed UPDATE applied nothing"
    # setting the PK to NULL is a not-null violation
    with pytest.raises(ValueError, match="not-null"):
        ss.update("t", "k = 2", {"k": "NULL"})
    # a PK-moving update to a FREE value is fine
    ss.update("t", "k = 2", {"k": "20"})
    assert sorted(r.k for r in ss.table("t").collect()) == [1, 3, 20]


def test_update_cannot_violate_unique(ss, spark):
    ss.add_unique("t", "v")
    with pytest.raises(ValueError, match="UNIQUE"):
        ss.update("t", "k = 2", {"v": "10.0"})
    # NULLs never collide (PG UNIQUE)
    ss.update("t", "k = 2", {"v": "NULL"})
    ss.update("t", "k = 3", {"v": "NULL"})
    vals = sorted((r.v is None) for r in ss.table("t").collect())
    assert vals == [False, True, True]
