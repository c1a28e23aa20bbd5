"""INSERT conflict handling (reference insert_conflict.test): plain
INSERT rejects duplicates — against the target AND within the batch —
with nothing applied; DO NOTHING skips; OR REPLACE upserts."""

from __future__ import annotations

import pytest

from serenedb_spark.operators.dml import insert_rows


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "a long, b long"
    )


def test_plain_insert_rejects_target_conflict(spark, base):
    rows = spark.createDataFrame([(1, 10), (4, 40)], "a long, b long")
    with pytest.raises(ValueError, match="primary key"):
        insert_rows(base, rows, "a")


def test_plain_insert_rejects_batch_conflict(spark, base):
    rows = spark.createDataFrame([(100, 1), (100, 1)], "a long, b long")
    with pytest.raises(ValueError, match="within the inserted batch"):
        insert_rows(base, rows, "a")


def test_plain_insert_appends(spark, base):
    rows = spark.createDataFrame([(4, 400), (5, 500)], "a long, b long")
    out = {r.a: r.b for r in insert_rows(base, rows, "a").collect()}
    assert out == {1: 10, 2: 20, 3: 30, 4: 400, 5: 500}


def test_do_nothing_skips_conflicts(spark, base):
    rows = spark.createDataFrame([(1, 100), (2, 200), (6, 600)],
                                 "a long, b long")
    out = {r.a: r.b for r in
           insert_rows(base, rows, "a", on_conflict="nothing").collect()}
    assert out == {1: 10, 2: 20, 3: 30, 6: 600}


def test_or_replace_upserts(spark, base):
    rows = spark.createDataFrame([(1, 100), (7, 700)], "a long, b long")
    out = {r.a: r.b for r in
           insert_rows(base, rows, "a", on_conflict="replace").collect()}
    assert out == {1: 100, 2: 20, 3: 30, 7: 700}
