"""Search-table DML equivalence: a maintained index (insert/update/delete/
compact) must answer queries identically to an index rebuilt from scratch
on the equivalent final table — the reference's recovery/consistency
invariant (tests/sqllogic/recovery/) expressed as a differential test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serenedb_spark.operators.indexing import build_index
from serenedb_spark.operators.maintenance import SearchTable
from serenedb_spark.plans import tsquery as q
from serenedb_spark.plans.planner import compile_query
from tests.conftest import SF_DIR

PROBES = [
    q.Term("spark"),
    q.Phrase(["hash", "join"]),
    ~q.Term("spark"),
    q.AnyOf(["new", "data"], min_match=1),
]


def _doc_ids(idx, node):
    return {r.doc_id for r in compile_query(idx, "text", node).doc_ids.collect()}


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
    )


def test_dml_matches_rebuild(spark, docs):
    st = SearchTable(docs, {"text": "simple"}, key="doc_id")
    new_rows = spark.createDataFrame(
        [(900001, "spark new data stream"), (900002, "totally new content")],
        "doc_id long, text string",
    )
    st.insert(new_rows)
    st.delete(spark.createDataFrame([(3,), (7,)], "doc_id long"))
    st.update(spark.createDataFrame(
        [(11, "spark replaced text")], "doc_id long, text string"))

    # equivalent final table, built fresh
    final = (
        docs.where(~F.col("doc_id").isin([3, 7, 11]))
        .unionByName(new_rows)
        .unionByName(spark.createDataFrame(
            [(11, "spark replaced text")], "doc_id long, text string"))
    )
    fresh = build_index(final, {"text": "simple"}, key="doc_id")
    maintained = st.index()

    for node in PROBES:
        assert _doc_ids(maintained, node) == _doc_ids(fresh, node), node

    # compaction must not change any answer
    compacted = st.compact().index()
    for node in PROBES:
        assert _doc_ids(compacted, node) == _doc_ids(fresh, node), node


def test_insert_visibility_and_update_wins(spark, docs):
    st = SearchTable(docs.limit(0), {"text": "simple"}, key="doc_id")
    st.insert(spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string"))
    assert _doc_ids(st.index(), q.Term("alpha")) == {1}
    st.update(spark.createDataFrame([(1, "gamma delta")], "doc_id long, text string"))
    idx = st.index()
    assert _doc_ids(idx, q.Term("alpha")) == set()
    assert _doc_ids(idx, q.Term("gamma")) == {1}


def test_truncate(spark, docs):
    st = SearchTable(docs, {"text": "simple"}, key="doc_id")
    st.truncate()
    assert st.current().count() == 0
