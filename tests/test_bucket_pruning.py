"""Persisted-index layout: term-bucket partition pruning must (a) keep
results identical to the in-memory index and (b) actually prune — the
physical plan's partition filters reference the bucket directories."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from serenedb_spark.operators.indexing import (
    build_index, load_index, py_term_bucket, save_index,
)
from serenedb_spark.plans import tsquery as q
from serenedb_spark.plans.planner import compile_query
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def saved(spark):
    d = tempfile.mkdtemp(prefix="serene_bucket_")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    idx = build_index(docs, {"text": "simple"}, key="doc_id")
    save_index(idx, d)
    yield idx, load_index(spark, d, {"text": "simple"})
    shutil.rmtree(d, ignore_errors=True)


PROBES = [
    q.Term("spark"),
    q.AllOf(["data", "join"]),
    q.Phrase(["hash", "join"]),
    q.Compound(must=[q.Term("data")], should=[q.Term("spark")],
               min_should_match=1),
    q.Prefix("wind"),
    ~q.Term("spark"),
]


@pytest.mark.parametrize("node", PROBES, ids=[repr(p)[:40] for p in PROBES])
def test_loaded_equals_memory(saved, node):
    mem, disk = saved
    a = {r.doc_id for r in compile_query(mem, "text", node).doc_ids.collect()}
    b = {r.doc_id for r in compile_query(disk, "text", node).doc_ids.collect()}
    assert a == b and len(a) > 0


def test_partition_pruning_in_plan(saved):
    import contextlib
    import io

    _, disk = saved
    plan = compile_query(disk, "text", q.Term("spark")).doc_ids
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan.explain("formatted")
    txt = buf.getvalue()
    b = py_term_bucket("spark")
    assert "PartitionFilters" in txt and f"bucket#" in txt, txt[:2000]
    assert str(b) in txt, txt[:2000]
