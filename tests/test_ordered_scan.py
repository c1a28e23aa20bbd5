"""Covered ordered scan by file stats: sorted writes give disjoint per-file
ranges; ordered_topk must read a strict subset of files and still return
exactly the full orderBy/limit answer (reference `set_scan_order` hook,
duckdb_table_function.h:186-199)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serenedb_spark.operators.ordered_scan import (
    files_scanned, ordered_topk, write_sorted,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def sorted_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("osort") / "orders_by_price")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    write_sorted(orders, path, "o_totalprice", n_files=8)
    return path


@pytest.mark.parametrize("descending", [False, True])
def test_topk_equals_full_sort(spark, sorted_path, descending):
    got = ordered_topk(
        spark, sorted_path, "o_totalprice", k=25, descending=descending,
        columns=["o_orderkey", "o_totalprice"],
    ).collect()
    full = spark.read.parquet(sorted_path).select("o_orderkey", "o_totalprice")
    key = full.o_totalprice.desc() if descending else full.o_totalprice
    want = full.orderBy(key, "o_orderkey").collect()[:25]
    assert sorted(r.o_totalprice for r in got) == sorted(
        r.o_totalprice for r in want
    )


def test_file_skipping_actually_skips(sorted_path):
    n, total = files_scanned(sorted_path, "o_totalprice", k=25)
    assert total == 8
    assert n < total, "top-25 of a range-sorted layout must not read all files"
    n_desc, _ = files_scanned(sorted_path, "o_totalprice", k=25, descending=True)
    assert n_desc < total


@pytest.mark.parametrize("descending", [False, True])
def test_nulls_not_dropped_by_pruning(spark, tmp_path, descending):
    """Parquet min/max stats exclude NULLs; ascending Spark sort is NULLS
    FIRST — a pruned file's null rows belong at the head and must still be
    returned (ADVICE r4)."""
    path = str(tmp_path / f"nullsort_{descending}")
    df = spark.createDataFrame(
        [(i, None if i % 100 == 7 else float(i)) for i in range(800)],
        "id long, v double",
    )
    write_sorted(df, path, "v", n_files=8, descending=descending)
    got = ordered_topk(spark, path, "v", k=10, descending=descending).collect()
    key = F.col("v").desc() if descending else F.col("v")
    want = (
        spark.read.parquet(path).orderBy(key, "id").limit(10).collect()
    )
    assert sorted(
        (-1.0 if r.v is None else r.v) for r in got
    ) == sorted((-1.0 if r.v is None else r.v) for r in want)


def test_unsorted_layout_falls_back(spark, tmp_path):
    path = str(tmp_path / "unsorted")
    spark.range(1000).selectExpr("id", "id % 7 AS v").write.parquet(path)
    got = ordered_topk(spark, path, "v", k=5).collect()
    assert [r.v for r in got] == [0, 0, 0, 0, 0]
