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


def test_cycle_off_grid_start():
    # PG advances from the ACTUAL value and wraps to MIN only when the
    # bound is passed: inc 3, 1..10 START 2 → 2,5,8,1,4 (ADVICE r9 —
    # not the anchor-grid projection 2,4,7,10,1)
    c = SequenceCatalog()
    c.create("g", start=2, increment=3, minvalue=1, maxvalue=10,
             cycle=True)
    vals = [c.nextval("g") for _ in range(6)]
    assert vals == [2, 5, 8, 1, 4, 7]
    assert c.currval("g") == 7
    # setval to an off-grid value: same continue-then-wrap rule
    c.setval("g", 3)
    assert [c.nextval("g") for _ in range(4)] == [6, 9, 1, 4]
    # descending twin
    c.create("d", start=9, increment=-3, minvalue=1, maxvalue=10,
             cycle=True)
    assert [c.nextval("d") for _ in range(5)] == [9, 6, 3, 10, 7]


def test_cycle_off_grid_assign(spark):
    # the distributed block-assignment stamps the same stream
    c = SequenceCatalog()
    c.create("g", start=2, increment=3, minvalue=1, maxvalue=10,
             cycle=True)
    df = spark.createDataFrame([(i,) for i in range(6)], "i int")
    out = c.assign(df, "g", "n", order_by=[F.col("i")])
    got = [r.n for r in out.orderBy("i").collect()]
    assert got == [2, 5, 8, 1, 4, 7]


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
