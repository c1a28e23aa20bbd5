"""Iceberg-lite: read Apache Iceberg table METADATA without jars, plan
the scan as a plain parquet read over the snapshot's live data files.

Reference parity target: the view fast-path's zero-ETL story pins an
Iceberg SNAPSHOT and reads its files directly
(server/connector/view_fast_path.h:59-110); the scan extension is
`.gitmodules` duckdb_iceberg. This module implements the PUBLISHED
Iceberg spec layout (iceberg.apache.org/spec — v1/v2 metadata):

  metadata/vN.metadata.json    table metadata: snapshots[], each with
                               snapshot-id + manifest-list (Avro)
  manifest list (Avro)         one row per manifest: manifest_path
  manifest (Avro)              one row per file: status
                               (0 EXISTING / 1 ADDED / 2 DELETED) +
                               data_file record with file_path,
                               record_count, ...

Avro decoding rides the pure-Python generic OCF reader
(sources/avro_io.py), which resolves rows by the EMBEDDED writer schema
— so the walk navigates by spec-fixed field NAMES and tolerates the
schema-evolution differences between Iceberg writers.

Scope (honest): metadata walk + snapshot pinning + time travel by
snapshot-id or timestamp; positional/equality DELETE FILES (v2
merge-on-read) are detected and REFUSED with a clear error rather than
silently returning wrong rows; writes are out of scope (the reference's
iceberg use is also scan-only).
"""

from __future__ import annotations

import glob
import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

from serenedb_spark.sources import avro_io


def _strip_scheme(p: str) -> str:
    return re.sub(r"^file:/{0,2}", "/", p).replace("//", "/") \
        if p.startswith("file:") else p


class IcebergLite:
    """A loaded Iceberg table's metadata tree."""

    def __init__(self, table_dir: str, metadata: dict):
        self.table_dir = table_dir
        self.metadata = metadata

    @classmethod
    def load(cls, table_dir: str) -> "IcebergLite":
        """Load the CURRENT metadata file: version-hint.text when the
        catalog wrote one, else the highest vN.metadata.json."""
        mdir = os.path.join(table_dir, "metadata")
        hint = os.path.join(mdir, "version-hint.text")
        if os.path.exists(hint):
            with open(hint) as fh:
                v = fh.read().strip()
            path = os.path.join(mdir, f"v{v}.metadata.json")
        else:
            cands = glob.glob(os.path.join(mdir, "v*.metadata.json"))
            if not cands:
                raise FileNotFoundError(
                    f"no Iceberg metadata under {mdir}")
            path = max(cands, key=lambda p: int(
                re.search(r"v(\d+)\.metadata\.json$", p).group(1)))
        with open(path) as fh:
            return cls(table_dir, json.load(fh))

    # -- snapshot selection --------------------------------------------

    def snapshots(self) -> list[dict]:
        return list(self.metadata.get("snapshots", []))

    def snapshot(self, snapshot_id: int | None = None,
                 as_of_ms: int | None = None) -> dict:
        snaps = self.snapshots()
        if not snaps:
            raise ValueError("table has no snapshots")
        if snapshot_id is not None:
            for s in snaps:
                if s["snapshot-id"] == snapshot_id:
                    return s
            raise ValueError(f"no snapshot {snapshot_id}")
        if as_of_ms is not None:
            eligible = [s for s in snaps
                        if s.get("timestamp-ms", 0) <= as_of_ms]
            if not eligible:
                raise ValueError(f"no snapshot at or before {as_of_ms}")
            return max(eligible, key=lambda s: s["timestamp-ms"])
        cur = self.metadata.get("current-snapshot-id")
        for s in snaps:
            if s["snapshot-id"] == cur:
                return s
        return snaps[-1]

    # -- the manifest walk ----------------------------------------------

    def data_files(self, snapshot_id: int | None = None,
                   as_of_ms: int | None = None) -> list[str]:
        """Live data-file paths of the pinned snapshot (status EXISTING
        or ADDED; DELETED rows drop out — copy-on-write semantics)."""
        snap = self.snapshot(snapshot_id, as_of_ms)
        ml_path = _strip_scheme(snap["manifest-list"])
        with open(ml_path, "rb") as fh:
            _, manifests = avro_io.read_ocf(fh.read())
        files: list[str] = []
        for m in manifests:
            # manifest list rows: content 0 = data manifests,
            # 1 = delete manifests (v2 merge-on-read)
            if m.get("content", 0) == 1:
                raise NotImplementedError(
                    "Iceberg v2 delete manifests present — merge-on-read "
                    "is not supported; compact/rewrite the table to "
                    "copy-on-write first")
            mp = _strip_scheme(m["manifest_path"])
            with open(mp, "rb") as fh:
                _, entries = avro_io.read_ocf(fh.read())
            for e in entries:
                if e.get("status", 1) == 2:  # DELETED
                    continue
                df_rec = e["data_file"]
                if df_rec.get("content", 0) != 0:
                    raise NotImplementedError(
                        "delete files are not supported (merge-on-read)")
                files.append(_strip_scheme(df_rec["file_path"]))
        return files

    def read(self, spark: SparkSession, snapshot_id: int | None = None,
             as_of_ms: int | None = None) -> DataFrame:
        """The pinned snapshot as a DataFrame — a plain parquet scan
        over its live files, so pushdown/pruning/AQE all apply exactly
        as on any parquet relation."""
        files = self.data_files(snapshot_id, as_of_ms)
        if not files:
            raise ValueError("snapshot has no data files")
        return spark.read.parquet(*files)
