"""Iceberg-lite scan (sources/iceberg_lite.py) + pure-Python Avro codec
(sources/avro_io.py): live reads of a spec-shaped Iceberg table on disk
— snapshot pinning, time travel, delete-manifest refusal — and Avro
write→distributed-read roundtrips, all without any Avro/Iceberg jar."""

from __future__ import annotations

import json
import os

import pytest

from serenedb_spark.sources import avro_io
from serenedb_spark.sources import io as IO
from serenedb_spark.sources.iceberg_lite import IcebergLite

#: the spec's manifest-list and manifest-entry shapes (field names are
#: spec-fixed; the generic reader resolves by the embedded schema, so a
#: fixture carrying the subset of fields the walk touches is a faithful
#: read-side test)
_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "content", "type": "int"},
    ],
}
_MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "data_file", "type": {
            "type": "record", "name": "data_file",
            "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "record_count", "type": "long"},
            ],
        }},
    ],
}


def _write_snapshot(table_dir: str, snap_id: int, parquet_files: list,
                    statuses: list | None = None, content: int = 0):
    """One manifest + one manifest-list for a snapshot; returns the
    manifest-list path."""
    mdir = os.path.join(table_dir, "metadata")
    os.makedirs(mdir, exist_ok=True)
    manifest = os.path.join(mdir, f"manifest-{snap_id}.avro")
    statuses = statuses or [1] * len(parquet_files)
    avro_io.write_ocf(manifest, _MANIFEST_SCHEMA, [
        {"status": st,
         "data_file": {"content": 0, "file_path": p, "record_count": 0}}
        for st, p in zip(statuses, parquet_files)
    ])
    mlist = os.path.join(mdir, f"snap-{snap_id}.avro")
    avro_io.write_ocf(mlist, _MANIFEST_LIST_SCHEMA, [
        {"manifest_path": manifest,
         "manifest_length": os.path.getsize(manifest),
         "content": content},
    ])
    return mlist


def _build_table(spark, tmp_path) -> tuple[str, list, list]:
    """A two-snapshot Iceberg-shaped table: snapshot 100 has batch A,
    snapshot 200 adds batch B."""
    tdir = str(tmp_path / "ice_table")
    data = os.path.join(tdir, "data")
    a = spark.createDataFrame([(i, f"a{i}") for i in range(10)],
                              "id long, v string")
    b = spark.createDataFrame([(i, f"b{i}") for i in range(10, 25)],
                              "id long, v string")
    a.coalesce(1).write.parquet(os.path.join(data, "batch_a"))
    b.coalesce(1).write.parquet(os.path.join(data, "batch_b"))

    def parts(sub):
        out = []
        for root, _, names in os.walk(os.path.join(data, sub)):
            out += [os.path.join(root, n) for n in names
                    if n.endswith(".parquet")]
        return sorted(out)

    fa, fb = parts("batch_a"), parts("batch_b")
    ml1 = _write_snapshot(tdir, 100, fa)
    ml2 = _write_snapshot(tdir, 200, fa + fb)
    meta = {
        "format-version": 2,
        "table-uuid": "0000-test",
        "location": tdir,
        "current-snapshot-id": 200,
        "snapshots": [
            {"snapshot-id": 100, "timestamp-ms": 1_000,
             "manifest-list": ml1},
            {"snapshot-id": 200, "timestamp-ms": 2_000,
             "manifest-list": ml2},
        ],
    }
    with open(os.path.join(tdir, "metadata", "v2.metadata.json"),
              "w") as fh:
        json.dump(meta, fh)
    return tdir, fa, fb


def test_snapshot_pinning_and_time_travel(spark, tmp_path):
    tdir, fa, fb = _build_table(spark, tmp_path)
    t = IcebergLite.load(tdir)

    assert [s["snapshot-id"] for s in t.snapshots()] == [100, 200]
    # current snapshot: both batches
    assert t.read(spark).count() == 25
    # pinned snapshot: batch A only (the view fast-path's zero-ETL pin)
    assert t.read(spark, snapshot_id=100).count() == 10
    assert sorted(t.data_files(snapshot_id=100)) == fa
    # time travel by timestamp
    assert t.read(spark, as_of_ms=1_500).count() == 10
    assert t.read(spark, as_of_ms=2_500).count() == 25
    with pytest.raises(ValueError):
        t.snapshot(as_of_ms=500)
    with pytest.raises(ValueError):
        t.snapshot(snapshot_id=999)


def test_version_hint_and_deleted_entries(spark, tmp_path):
    tdir, fa, fb = _build_table(spark, tmp_path)
    # a v3 metadata that DELETES batch A (copy-on-write rewrite)
    ml3 = _write_snapshot(tdir, 300, fa + fb, statuses=[2] * len(fa)
                          + [0] * len(fb))
    meta3 = {
        "format-version": 2, "location": tdir,
        "current-snapshot-id": 300,
        "snapshots": [{"snapshot-id": 300, "timestamp-ms": 3_000,
                       "manifest-list": ml3}],
    }
    with open(os.path.join(tdir, "metadata", "v3.metadata.json"),
              "w") as fh:
        json.dump(meta3, fh)
    with open(os.path.join(tdir, "metadata", "version-hint.text"),
              "w") as fh:
        fh.write("3")
    t = IcebergLite.load(tdir)
    # DELETED entries drop out of the scan
    assert t.read(spark).count() == 15
    assert sorted(t.data_files()) == fb


def test_delete_manifests_are_refused(spark, tmp_path):
    tdir, fa, _ = _build_table(spark, tmp_path)
    ml = _write_snapshot(tdir, 400, fa, content=1)  # a DELETE manifest
    meta = {
        "format-version": 2, "location": tdir,
        "current-snapshot-id": 400,
        "snapshots": [{"snapshot-id": 400, "timestamp-ms": 4_000,
                       "manifest-list": ml}],
    }
    with open(os.path.join(tdir, "metadata", "v4.metadata.json"),
              "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(tdir, "metadata", "version-hint.text"),
              "w") as fh:
        fh.write("4")
    with pytest.raises(NotImplementedError):
        IcebergLite.load(tdir).data_files()


def test_avro_roundtrip_distributed(spark, tmp_path):
    """write_avro_pure → read_avro_pure: types, NULLs, arrays and
    nesting survive; the read is a real distributed mapInPandas scan."""
    from tests.conftest import SF_DIR

    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    out = str(tmp_path / "nation_avro")
    IO.write_avro_pure(nation, out)
    back = IO.read_avro_pure(spark, out)
    assert back.schema == nation.schema or \
        [f.name for f in back.schema.fields] == \
        [f.name for f in nation.schema.fields]
    a = sorted(tuple(r) for r in nation.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b

    rich = spark.createDataFrame(
        [(1, None, [1.5, 2.5], {"k": "v"}, (7, "x")),
         (2, "s", [], {}, (8, "y"))],
        "id long, s string, arr array<double>, m map<string,string>,"
        " st struct<a:int,b:string>")
    out2 = str(tmp_path / "rich_avro")
    IO.write_avro_pure(rich, out2)
    back2 = IO.read_avro_pure(spark, out2)
    got = sorted([r.asDict(recursive=True) for r in back2.collect()],
                 key=lambda d: d["id"])
    assert got[0]["s"] is None and got[0]["arr"] == [1.5, 2.5]
    assert got[0]["st"] == {"a": 7, "b": "x"}
    assert got[1]["m"] == {}


def test_avro_deflate_codec_reads(tmp_path):
    """The reader handles deflate blocks (zlib raw) — written here by
    hand-compressing a null-codec file's block."""
    import zlib

    schema = {"type": "record", "name": "r",
              "fields": [{"name": "x", "type": "long"}]}
    p = str(tmp_path / "plain.avro")
    avro_io.write_ocf(p, schema, [{"x": 1}, {"x": -2}, {"x": 3}])
    with open(p, "rb") as fh:
        _, rows = avro_io.read_ocf(fh.read())
    assert [r["x"] for r in rows] == [1, -2, 3]

    # rebuild the same file with a deflate block
    body = bytearray()
    for v in (1, -2, 3):
        avro_io._write_long(body, v)
    payload = zlib.compress(bytes(body), 6)[2:-4]  # raw deflate
    out = bytearray()
    out += avro_io.MAGIC
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"deflate"}
    avro_io._write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        avro_io._write_long(out, len(kb))
        out += kb
        avro_io._write_long(out, len(v))
        out += v
    avro_io._write_long(out, 0)
    sync = bytes(range(16))
    out += sync
    avro_io._write_long(out, 3)
    avro_io._write_long(out, len(payload))
    out += payload
    out += sync
    _, rows = avro_io.read_ocf(bytes(out))
    assert [r["x"] for r in rows] == [1, -2, 3]
