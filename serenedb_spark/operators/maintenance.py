"""Search-table DML + refresh/compaction — the eventually-consistent index
maintenance loop re-expressed on DataFrames.

Reference semantics: search-table insert/update/delete/truncate write WAL
entries stamped by a monotonic tick; a background refresh makes them
visible and compaction merges segments
(server/connector/duckdb_physical_search_insert.cpp, _update.cpp,
_delete.cpp, _truncate.cpp; server/search/search_db_wal.cpp,
server/search/task.h:32-43, tick_domain.h:29-45).

Spark-first translation:
  * each insert batch becomes a NEW SEGMENT (its own postings/docstore
    DataFrames built with the same build_index pipeline);
  * deletes are TOMBSTONES (a doc_id set) — anti-joined at read time;
  * update = delete + insert (same as the reference's search update);
  * ``refresh()`` produces the visible snapshot: union of segment postings
    minus tombstones. Unlike Lucene/IResearch, term statistics are
    recomputed over the merged postings, so deleted docs never pollute
    df/avgdl (exactness the reference only regains after compaction);
  * ``compact()`` materializes the merged state into a single segment —
    the reference's compaction coordinator collapsed to one Spark job.
    At 100 TB this is a partitioned parquet rewrite of only the term
    buckets touched since the last compaction.

The tick counter orders batches; a read sees exactly the batches with
tick <= the snapshot tick (reference tick_domain semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serenedb_spark.operators.indexing import InvertedIndex, build_index


class SearchTable:
    """An indexed table supporting insert/update/delete/truncate with
    snapshot reads — ``index()`` returns a normal InvertedIndex, so every
    search/scoring/facet operator works on the maintained state unchanged.
    """

    def __init__(self, source: DataFrame, fields: dict[str, str],
                 key: str = "doc_id", name: str = "search_table"):
        self.fields = dict(fields)
        self.key = key
        self.name = name
        self._tick = 0
        self._empty = source.limit(0)
        # tick-ordered op log, the WAL: ("seg", rows) | ("del", ids)
        self._ops: list[tuple[str, DataFrame]] = [("seg", source)]
        self._spark = source.sparkSession

    # ---- DML (each call = one WAL batch, one tick) -----------------------
    def insert(self, rows: DataFrame) -> int:
        """Append rows as a new segment. Returns the batch tick."""
        self._tick += 1
        self._ops.append(("seg", rows))
        return self._tick

    def delete(self, doc_ids: DataFrame) -> int:
        """Tombstone the given keys (column must match the table key).
        Only rows from batches with a smaller tick are affected — a later
        re-insert of the same key is visible (tick_domain ordering)."""
        self._tick += 1
        self._ops.append(("del", doc_ids.select(self.key).distinct()))
        return self._tick

    def update(self, rows: DataFrame) -> int:
        """Delete-then-insert, the reference's search-update shape
        (duckdb_physical_search_update.cpp)."""
        self.delete(rows.select(self.key))
        return self.insert(rows)

    def truncate(self) -> int:
        self._tick += 1
        self._ops = [("seg", self._empty)]
        return self._tick

    # ---- reads -----------------------------------------------------------
    def current(self) -> DataFrame:
        """The visible base relation: fold the op log in tick order — later
        inserts replace same-key rows, deletes tombstone everything earlier.
        Fold depth = batches since last compact(); compact to keep it flat."""
        out = None
        for kind, df in self._ops:
            if kind == "seg":
                if out is None:
                    out = df
                else:
                    out = out.join(
                        df.select(self.key), self.key, "left_anti"
                    ).unionByName(df)
            else:
                out = out.join(df, self.key, "left_anti")
        return out if out is not None else self._empty

    def index(self) -> InvertedIndex:
        """Refresh: build the visible snapshot's index. Segment postings are
        built per batch and unioned (incremental at scale); stats are exact
        over the merged state."""
        return build_index(self.current(), self.fields, key=self.key,
                           name=self.name)

    def compact(self) -> "SearchTable":
        """Collapse all segments + tombstones into one materialized segment
        (the compaction job). Returns self for chaining."""
        merged = self.current().persist()
        merged.count()  # materialize now — the 'segment write'
        self._ops = [("seg", merged)]
        return self
