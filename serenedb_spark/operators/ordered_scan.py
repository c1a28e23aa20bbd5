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
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        out.append((f, mn, mx, md.num_rows))
    return out


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

    if not stats:
        df = spark.read.parquet(path)
        out = df.select(*columns) if columns else df
        return out.orderBy(key).limit(k)

    # best-first by the file's best possible value
    stats.sort(key=lambda s: s[2], reverse=True) if descending else stats.sort(
        key=lambda s: s[1]
    )
    picked, covered = [], 0
    for f, mn, mx, rows in stats:
        picked.append((f, mn, mx))
        covered += rows
        if covered >= k:
            break
    # cutoff: the k-th row is no worse than the worst value inside the
    # picked set — any file whose best value is beyond that can't contribute
    cutoff = min(p[1] for p in picked) if descending else max(p[2] for p in picked)
    files = [
        f for f, mn, mx, rows in stats
        if (mx >= cutoff if descending else mn <= cutoff)
    ]
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
    stats.sort(key=lambda s: s[2], reverse=True) if descending else stats.sort(
        key=lambda s: s[1]
    )
    picked, covered = [], 0
    for f, mn, mx, rows in stats:
        picked.append((f, mn, mx))
        covered += rows
        if covered >= k:
            break
    cutoff = min(p[1] for p in picked) if descending else max(p[2] for p in picked)
    n = sum(
        1 for f, mn, mx, rows in stats
        if (mx >= cutoff if descending else mn <= cutoff)
    )
    return (n, total)
