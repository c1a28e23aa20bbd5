"""Covered ordered scan by file statistics — `ORDER BY col LIMIT k` that
reads only the files that can contain the top-k.

Reference: the fork's `set_scan_order` hook iterates segments best-first by
per-file statistics so a covered `ORDER BY .col LIMIT` stops early
(server/connector/duckdb_table_function.h:186-199, hook :1202).

Spark-first shape:
  * WRITE: `write_sorted` range-repartitions by the order column before
    writing, so every parquet file owns a disjoint value range and its
    footer min/max are tight.
  * READ: `ordered_topk` reads ONLY the parquet FOOTERS driver-side
    (pyarrow, no row groups touched), sorts files by their min, and scans
    just enough files — by footer row counts — to cover k rows, then runs
    the ordinary `orderBy().limit(k)` (TakeOrderedAndProject) on that
    subset.  At 100 TB this is the difference between touching ~k/rows
    files and scanning the table; the fallback when stats are missing is
    the plain full orderBy/limit, never a wrong answer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_sorted(
    df: DataFrame,
    path: str,
    order_col: str,
    n_files: int = 16,
    descending: bool = False,
) -> None:
    """Persist with disjoint per-file ranges of `order_col` (tight footer
    min/max = the file-skipping contract)."""
    key = F.col(order_col).desc() if descending else F.col(order_col)
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def _file_stats(path: str, order_col: str):
    """(file, min, max, rows) per parquet file — footer metadata only."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = os.path.join(path, name)
        md = pq.ParquetFile(f).metadata
        schema_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if order_col not in schema_idx:
            return None
        ci = schema_idx[order_col]
        mn = mx = None
        nulls = 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            if not st.has_null_count:
                # unknown null population → stats can't be trusted for
                # ordering; caller falls back to the full scan
                return None
            nulls += st.null_count
            if st.num_values > 0:  # min/max meaningless in an all-null group
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
        out.append((f, mn, mx, md.num_rows, nulls))
    return out


def _plan_files(stats, k: int, descending: bool):
    """Choose the file subset that provably contains the top-k, or None for
    a full scan.  NULL-sound: parquet min/max stats exclude NULLs, but
    Spark's ascending sort is NULLS FIRST — so every null-bearing file is
    included unconditionally when ascending, only non-null rows count
    toward covering k, and an all-null file contributes no cutoff bound.
    Descending (NULLS LAST) needs k covered by non-null rows alone, else
    the tail would be nulls that pruned files' values could outrank."""
    must = [s for s in stats if not descending and s[4] > 0]
    null_head = sum(s[4] for s in must)  # rows preceding every value (asc)
    valued = [s for s in stats if s[1] is not None]
    valued.sort(key=lambda s: s[2], reverse=True) if descending else valued.sort(
        key=lambda s: s[1]
    )
    picked, covered = [], null_head
    for s in valued:
        if covered >= k:
            break
        picked.append(s)
        covered += s[3] - s[4]
    if covered < k:
        return None  # can't cover k with rows whose order is provable
    if not picked:  # k satisfied by leading nulls alone (ascending)
        return sorted({s[0] for s in must})
    cutoff = min(p[1] for p in picked) if descending else max(p[2] for p in picked)
    keep = {
        s[0] for s in valued
        if (s[2] >= cutoff if descending else s[1] <= cutoff)
    }
    keep.update(s[0] for s in must)
    return sorted(keep)


def ordered_topk(
    spark: SparkSession,
    path: str,
    order_col: str,
    k: int,
    descending: bool = False,
    columns: list[str] | None = None,
) -> DataFrame:
    """Top-k by `order_col` reading only the files whose ranges can reach
    the k-th value. Exact: files are pruned by a cutoff derived from footer
    row counts, then the real sort-limit runs on the survivors."""
    stats = _file_stats(path, order_col)
    key = F.col(order_col).desc() if descending else F.col(order_col)

    files = _plan_files(stats, k, descending) if stats else None
    if files is None:
        df = spark.read.parquet(path)
        out = df.select(*columns) if columns else df
        return out.orderBy(key).limit(k)
    df = spark.read.parquet(*files)
    out = df.select(*columns) if columns else df
    return out.orderBy(key).limit(k)


def files_scanned(
    path: str, order_col: str, k: int, descending: bool = False
) -> tuple[int, int]:
    """(files read, files total) for a given top-k — the observability hook
    tests assert on."""
    stats = _file_stats(path, order_col)
    if not stats:
        return (0, 0)
    total = len(stats)
    files = _plan_files(stats, k, descending)
    return (total if files is None else len(files), total)
