"""PG sequences (reference sequence.cpp): the four scalar functions,
durability via the JSON-state commit, cycle/limit semantics, and the
distributed block-assignment operator (unique, gap-free ids without a
global sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serenedb_spark.operators.sequences import SequenceCatalog


def test_nextval_currval_lastval():
    c = SequenceCatalog()
    c.create("s1", start=10, increment=5)
    with pytest.raises(ValueError):
        c.currval("s1")
    with pytest.raises(ValueError):
        c.lastval()
    assert c.nextval("s1") == 10
    assert c.nextval("s1") == 15
    assert c.currval("s1") == 15
    assert c.lastval() == 15


def test_setval_and_restart():
    c = SequenceCatalog()
    c.create("s", start=1)
    c.nextval("s")
    c.setval("s", 100)
    assert c.nextval("s") == 101
    c.setval("s", 200, is_called=False)
    assert c.nextval("s") == 200


def test_maxvalue_and_cycle():
    c = SequenceCatalog()
    c.create("cap", start=1, maxvalue=3)
    assert [c.nextval("cap") for _ in range(3)] == [1, 2, 3]
    with pytest.raises(ValueError, match="maximum value"):
        c.nextval("cap")
    c.create("cyc", start=1, minvalue=1, maxvalue=3, cycle=True)
    assert [c.nextval("cyc") for _ in range(5)] == [1, 2, 3, 1, 2]


def test_durability(tmp_path):
    p = str(tmp_path / "seqs.json")
    c = SequenceCatalog(p)
    c.create("d", start=7)
    c.nextval("d")
    c2 = SequenceCatalog(p)  # recovery: reopen the committed state
    assert c2.nextval("d") == 8


def test_assign_unique_gap_free(spark):
    c = SequenceCatalog()
    c.create("ids", start=1000)
    df = spark.range(0, 5000).repartition(8)
    out = c.assign(df, "ids", "row_id")
    vals = sorted(r.row_id for r in out.collect())
    assert vals == list(range(1000, 6000))
    # next reservation continues after the block
    assert c.nextval("ids") == 6000


def test_assign_ordered(spark):
    c = SequenceCatalog()
    c.create("o", start=1)
    df = spark.createDataFrame(
        [(30,), (10,), (20,)], "v int"
    )
    out = c.assign(df, "o", "n", order_by=[F.col("v")])
    got = {r.v: r.n for r in out.collect()}
    assert got == {10: 1, 20: 2, 30: 3}
