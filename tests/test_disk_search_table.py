"""Durable segmented search table: DML visibility in tick order, recovery
by reopening the manifest, compaction equivalence, and vacuum of
unreferenced segments (reference WAL + recovery + compaction loops,
server/search/search_db_wal.cpp, task.h:32-43)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from serenedb_spark.operators.maintenance import DiskSearchTable
from serenedb_spark.plans import tsquery as q
from serenedb_spark.plans.planner import compile_query
from tests.conftest import SF_DIR


@pytest.fixture()
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text").limit(100)
    )


def _match_ids(st, term):
    return {
        r.doc_id
        for r in compile_query(st.index(), "text", q.Term(term)).doc_ids.collect()
    }


def test_dml_visibility_and_recovery(spark, docs, tmp_path):
    path = str(tmp_path / "dst")
    st = DiskSearchTable.create(docs, path, {"text": "simple"}, key="doc_id")

    st.insert(spark.createDataFrame(
        [(900001, "zzzdurable token"), (900002, "zzzdurable again")],
        "doc_id long, text string",
    ))
    assert _match_ids(st, "zzzdurable") == {900001, 900002}

    st.delete(spark.createDataFrame([(900001,)], "doc_id long"))
    assert _match_ids(st, "zzzdurable") == {900002}

    st.update(spark.createDataFrame(
        [(900002, "replaced entirely")], "doc_id long, text string"
    ))
    assert _match_ids(st, "zzzdurable") == set()
    assert _match_ids(st, "replaced") == {900002}

    # recovery: a fresh handle sees the identical committed state
    st2 = DiskSearchTable.open(spark, path)
    assert _match_ids(st2, "replaced") == {900002}
    assert st2.current().count() == st.current().count()


def test_update_is_single_commit(spark, docs, tmp_path):
    """update() must flip visibility of delete+insert with ONE manifest
    write — a crash between two separate commits would durably lose the
    updated rows (ADVICE r4)."""
    path = str(tmp_path / "dst3")
    st = DiskSearchTable.create(docs, path, {"text": "simple"}, key="doc_id")
    calls = []
    orig = st._write_manifest
    st._write_manifest = lambda: (calls.append(1), orig())[1]
    st.update(spark.createDataFrame(
        [(900003, "atomically replaced")], "doc_id long, text string"
    ))
    assert len(calls) == 1
    assert _match_ids(st, "atomically") == {900003}
    # both ops landed in the committed manifest
    st2 = DiskSearchTable.open(spark, path)
    kinds = [k for _t, k, _r in st2._ops[-2:]]
    assert kinds == ["del", "seg"]


def test_time_travel_snapshot(spark, docs, tmp_path):
    """open(path, tick=N) replays only ops with tick <= N — every
    committed tick stays a readable consistent snapshot until vacuum
    (reference tick_domain); snapshots are read-only."""
    path = str(tmp_path / "dst_tt")
    st = DiskSearchTable.create(docs, path, {"text": "simple"}, key="doc_id")
    t1 = st.insert(spark.createDataFrame(
        [(910001, "zzztravel alpha")], "doc_id long, text string"))
    t2 = st.delete(spark.createDataFrame([(910001,)], "doc_id long"))
    assert _match_ids(st, "zzztravel") == set()

    snap = DiskSearchTable.open(spark, path, tick=t1)
    assert _match_ids(snap, "zzztravel") == {910001}, \
        "pre-delete snapshot must still see the row"
    snap0 = DiskSearchTable.open(spark, path, tick=t2)
    assert _match_ids(snap0, "zzztravel") == set()

    with pytest.raises(ValueError, match="read-only"):
        snap.insert(spark.createDataFrame(
            [(910002, "nope")], "doc_id long, text string"))
    with pytest.raises(ValueError, match="read-only"):
        snap.update(spark.createDataFrame(
            [(910001, "nope")], "doc_id long, text string"))


def test_compact_and_vacuum(spark, docs, tmp_path):
    path = str(tmp_path / "dst2")
    st = DiskSearchTable.create(docs, path, {"text": "simple"}, key="doc_id")
    st.insert(spark.createDataFrame(
        [(900010, "compactme now")], "doc_id long, text string"))
    st.delete(spark.createDataFrame([(1,)], "doc_id long"))

    before = {r.doc_id for r in st.current().select("doc_id").collect()}
    n_dirs_before = len(os.listdir(f"{path}/segments"))
    st.compact()
    after = {r.doc_id for r in st.current().select("doc_id").collect()}
    assert after == before
    assert len(st._ops) == 1

    removed = st.vacuum()
    assert removed == n_dirs_before  # every pre-compact segment is dead
    # reopening the compacted table still works
    st3 = DiskSearchTable.open(spark, path)
    assert {r.doc_id for r in st3.current().select("doc_id").collect()} == before
