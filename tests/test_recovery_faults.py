"""Crash-recovery fault matrix for DiskSearchTable — the reference's
``SET sdb_faults`` + tests/sqllogic/recovery/ methodology: every
DML/maintenance path is crashed at every injection point, the table is
REOPENED FROM DISK, and the invariants hold:

  I1  visibility is snapshot-atomic: the reopened table shows exactly
      the last committed state — never a torn one (an update's delete
      half without its insert half is the canonical tear)
  I2  a crashed table is not wedged: the next DML commits normally
  I3  orphan artifacts (segments written but never referenced, leftover
      manifest.json.tmp) are inert and vacuum-collectable
"""

from __future__ import annotations

import os

import pytest

from serenedb_spark.operators import maintenance as M

ROWS0 = [(1, "alpha doc"), (2, "bravo doc"), (3, "charlie doc")]


@pytest.fixture()
def disk_table(spark, tmp_path):
    df = spark.createDataFrame(ROWS0, "doc_id long, text string")
    t = M.DiskSearchTable.create(
        df, str(tmp_path / "t"), {"text": "simple"}, key="doc_id")
    yield t
    M.FAULTS.clear()


def _visible(spark, path) -> set:
    t = M.DiskSearchTable.open(spark, path)
    return {tuple(r) for r in t.current().select("doc_id", "text").collect()}


def _crash(fn, point):
    M.FAULTS.add(point)
    try:
        with pytest.raises(M.InjectedFault):
            fn()
    finally:
        M.FAULTS.clear()


@pytest.mark.parametrize("point", ["segment_written",
                                   "manifest_tmp_written"])
def test_insert_crash_leaves_old_snapshot(spark, disk_table, point):
    new = spark.createDataFrame([(4, "delta doc")],
                                "doc_id long, text string")
    _crash(lambda: disk_table.insert(new), point)
    assert _visible(spark, disk_table.path) == set(ROWS0)  # I1
    # I2: reopen and commit the same insert successfully
    t2 = M.DiskSearchTable.open(spark, disk_table.path)
    t2.insert(new)
    assert _visible(spark, disk_table.path) == set(ROWS0) | {(4, "delta doc")}


def test_delete_crash_keeps_row(spark, disk_table):
    victim = spark.createDataFrame([(2,)], "doc_id long")
    _crash(lambda: disk_table.delete(victim), "segment_written")
    assert _visible(spark, disk_table.path) == set(ROWS0)
    t2 = M.DiskSearchTable.open(spark, disk_table.path)
    t2.delete(victim)
    assert _visible(spark, disk_table.path) == {
        r for r in ROWS0 if r[0] != 2}


@pytest.mark.parametrize("point", ["update_del_written",
                                   "update_seg_written",
                                   "manifest_tmp_written"])
def test_update_crash_never_tears(spark, disk_table, point):
    """The canonical tear: rows deleted but not reinserted. Every crash
    point inside update() must leave the full pre-update snapshot."""
    upd = spark.createDataFrame([(2, "bravo RE-WRITTEN")],
                                "doc_id long, text string")
    _crash(lambda: disk_table.update(upd), point)
    assert _visible(spark, disk_table.path) == set(ROWS0)  # I1: no tear
    t2 = M.DiskSearchTable.open(spark, disk_table.path)
    t2.update(upd)
    assert _visible(spark, disk_table.path) == {
        (1, "alpha doc"), (2, "bravo RE-WRITTEN"), (3, "charlie doc")}


def test_compact_crash_preserves_state_and_orphan_is_collectable(
        spark, disk_table):
    extra = spark.createDataFrame([(4, "delta doc")],
                                  "doc_id long, text string")
    disk_table.insert(extra)
    before = _visible(spark, disk_table.path)
    _crash(disk_table.compact, "compact_segment_written")
    assert _visible(spark, disk_table.path) == before  # I1
    # I3: the crashed compaction's segment is an unreferenced orphan
    t2 = M.DiskSearchTable.open(spark, disk_table.path)
    live = {rel.split("/", 1)[1] for _t, _k, rel in t2._ops}
    on_disk = set(os.listdir(f"{t2.path}/segments"))
    assert on_disk - live, "expected an orphan segment from the crash"
    removed = t2.vacuum()
    assert removed >= 1
    assert _visible(spark, disk_table.path) == before
    # compaction retried to completion
    t2.compact()
    t2.vacuum()
    assert _visible(spark, disk_table.path) == before
    assert len(os.listdir(f"{t2.path}/segments")) == 1


def test_vacuum_crash_mid_delete_is_harmless(spark, disk_table):
    disk_table.insert(spark.createDataFrame(
        [(4, "delta doc")], "doc_id long, text string"))
    disk_table.compact()  # leaves the old segments dead
    before = _visible(spark, disk_table.path)
    _crash(disk_table.vacuum, "vacuum_after_first_delete")
    # only DEAD segments were touched: the table reads identically
    assert _visible(spark, disk_table.path) == before
    t2 = M.DiskSearchTable.open(spark, disk_table.path)
    t2.vacuum()  # finishes the job
    assert _visible(spark, disk_table.path) == before


def test_leftover_manifest_tmp_is_ignored_and_overwritten(
        spark, disk_table):
    new = spark.createDataFrame([(5, "echo doc")],
                                "doc_id long, text string")
    _crash(lambda: disk_table.insert(new), "manifest_tmp_written")
    assert os.path.exists(f"{disk_table.path}/manifest.json.tmp")  # I3
    t2 = M.DiskSearchTable.open(spark, disk_table.path)  # tmp ignored
    assert {r[0] for r in t2.current().select("doc_id").collect()} \
        == {1, 2, 3}
    t2.insert(new)  # rewrites tmp then commits
    assert not os.path.exists(f"{disk_table.path}/manifest.json.tmp")
    assert (5, "echo doc") in _visible(spark, disk_table.path)


def test_time_travel_snapshots_survive_crashes(spark, disk_table):
    """Every committed tick stays readable after a crashed later op."""
    disk_table.insert(spark.createDataFrame(
        [(4, "delta doc")], "doc_id long, text string"))
    _crash(lambda: disk_table.delete(
        spark.createDataFrame([(1,)], "doc_id long")), "segment_written")
    t1 = M.DiskSearchTable.open(spark, disk_table.path, tick=1)
    assert {r[0] for r in t1.current().select("doc_id").collect()} \
        == {1, 2, 3}
    t2 = M.DiskSearchTable.open(spark, disk_table.path, tick=2)
    assert {r[0] for r in t2.current().select("doc_id").collect()} \
        == {1, 2, 3, 4}
