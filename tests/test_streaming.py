"""Streaming refresh: file-source micro-batches → SearchTable inserts →
index snapshot equals a batch rebuild (the refresh-loop invariant); plus
watermarked windowed aggregation ≡ its batch equivalent."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from serenedb_spark.operators.indexing import build_index
from serenedb_spark.operators.maintenance import SearchTable
from serenedb_spark.plans import tsquery as q
from serenedb_spark.plans.planner import compile_query
from serenedb_spark.streaming.refresh import (
    stream_into_search_table, windowed_event_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="serene_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_refresh_matches_batch(spark, tmpdir):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
    )
    # stage the corpus as streaming input files (3 shards = ≥1 micro-batch)
    src = f"{tmpdir}/in"
    docs.repartition(3).write.parquet(src)

    st = SearchTable(docs.limit(0), {"text": "simple"}, key="doc_id")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    qy = stream_into_search_table(stream, st, f"{tmpdir}/ckpt")
    qy.awaitTermination(120)

    got = {
        r.doc_id
        for r in compile_query(st.index(), "text", q.Term("spark")).doc_ids.collect()
    }
    want = {
        r.doc_id
        for r in compile_query(
            build_index(docs, {"text": "simple"}, key="doc_id"), "text",
            q.Term("spark"),
        ).doc_ids.collect()
    }
    assert got == want and len(want) > 0


def test_windowed_counts_batch_equivalence(spark):
    from tests.conftest import load_events

    events = load_events(spark)
    agg = windowed_event_counts(events).orderBy("window_start", "event_type")
    rows = agg.collect()
    naive = (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert [(r.window_start, r.event_type, r.n_events) for r in rows] == [
        (r.window_start, r.event_type, r.n_events) for r in naive
    ]
