"""Cookbook recipe semantics (operators/cookbook.py) on tiny in-memory
corpora mirroring the reference's own cookbook fixtures
(tests/sqllogic/sdb/pg/site_docs/cookbook/search/*.test), where expected
outputs are known by hand."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serenedb_spark.operators import cookbook as CB
from serenedb_spark.operators.indexing import build_index


@pytest.fixture(scope="module")
def searches_idx(spark):
    # autocomplete.test fixture: whole phrases under a keyword analyzer
    rows = [
        (1, "running shoes"), (2, "running shoes"), (3, "running shoes"),
        (4, "running jacket"), (5, "running jacket"), (6, "running watch"),
        (7, "rain jacket"), (8, "rain jacket"), (9, "road bike"),
        (10, "road running"), (11, "hiking boots"), (12, "hiking boots"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, query string")
    return build_index(df, {"query": "keyword"}, key="doc_id")


def test_autocomplete_prefix_ranked(searches_idx):
    got = [tuple(r) for r in CB.autocomplete(searches_idx, "run").collect()]
    assert got == [("running shoes", 3), ("running jacket", 2),
                   ("running watch", 1)]


def test_autocomplete_limit(searches_idx):
    got = [r.suggestion
           for r in CB.autocomplete(searches_idx, "r", limit=2).collect()]
    assert got == ["running shoes", "rain jacket"]


@pytest.fixture(scope="module")
def terms_idx(spark):
    # spell-correction.test fixture: one term per row
    words = (["jacket"] * 5 + ["running"] * 8 + ["basket", "racket"]
             + ["boot"] * 6 + ["boat"] * 2 + ["boots"] * 3 + ["watch"] * 4)
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id int, term string")
    return build_index(df, {"term": "keyword"}, key="doc_id")


def test_spell_suggest_reference_rows(terms_idx):
    got = [tuple(r) for r in CB.spell_suggest(terms_idx, "jaket").collect()]
    assert got == [("jacket", 0.8, 5), ("basket", 0.6, 1), ("racket", 0.6, 1)]


def test_spell_suggest_similarity_then_frequency(terms_idx):
    got = [tuple(r) for r in CB.spell_suggest(terms_idx, "bost").collect()]
    # boot (d=1, df=6) before boat (d=1, df=2) before boots (d=2)
    assert got == [("boot", 0.75, 6), ("boat", 0.75, 2), ("boots", 0.5, 3)]


def test_percolate_conjunction(spark):
    docs = spark.createDataFrame(
        [(1, "wireless noise cancelling headphones with long battery life"),
         (2, "wired headphones")],
        "doc_id int, body string")
    idx = build_index(docs, {"body": "simple"}, key="doc_id")
    alerts = spark.createDataFrame(
        [(1, ["headphones"]), (2, ["battery"]), (3, ["laptop"]),
         (4, ["wireless", "battery"]), (5, ["wireless", "wired"])],
        "query_id int, terms array<string>")
    got = {(r.doc_id, r.query_id)
           for r in CB.percolate(idx, alerts).collect()}
    # q4 needs BOTH wireless and battery (doc 1 only); q5's conjunction
    # never co-occurs; q3 matches nothing
    assert got == {(1, 1), (2, 1), (1, 2), (1, 4)}


def test_percolate_stream_equals_postings_percolate(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    alerts = spark.createDataFrame(
        [(1, ["spark", "stream"]), (2, ["dup"]), (3, ["quantum", "flux"])],
        "query_id int, terms array<string>")
    idx = build_index(docs, {"text": "simple"}, key="doc_id")
    via_index = {(r.doc_id, r.query_id)
                 for r in CB.percolate(idx, alerts).collect()}
    via_expr = {(r.doc_id, r.query_id)
                for r in CB.percolate_stream(docs, alerts, "text").collect()}
    assert via_expr == via_index and via_expr


def test_percolate_stream_on_live_stream(spark, tmp_path):
    # the same plan must run under Structured Streaming (stateless — no
    # watermark/output-mode constraints)
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    src = str(tmp_path / "in")
    docs.repartition(3).write.parquet(src)
    alerts = spark.createDataFrame(
        [(1, ["spark", "stream"]), (2, ["dup"])],
        "query_id int, terms array<string>")

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = CB.percolate_stream(stream, alerts, "text").select(
        "doc_id", "query_id")
    qy = (out.writeStream.format("memory").queryName("percolated")
          .trigger(availableNow=True)
          .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    qy.awaitTermination(120)

    got = {(r.doc_id, r.query_id)
           for r in spark.sql("SELECT * FROM percolated").collect()}
    want = {(r.doc_id, r.query_id)
            for r in CB.percolate_stream(docs, alerts, "text").collect()}
    assert got == want and got


def test_pinned_order_curated_first(spark):
    scored = spark.createDataFrame(
        [(1, 5.0), (2, 4.0), (3, 3.0), (4, 2.0)], "doc_id int, score double")
    got = [r.doc_id for r in CB.pinned_order(scored, [4, 2]).collect()]
    # curated order 4 then 2, remainder by score
    assert got == [4, 2, 1, 3]


def test_pinned_position_absent_is_null(spark):
    df = spark.range(1).select(
        CB.pinned_position(F.lit(99), [1, 2, 3]).alias("p"))
    assert df.first().p is None


def test_collapse_top_n(spark):
    scored = spark.createDataFrame(
        [(1, "a", 9.0), (2, "a", 8.0), (3, "a", 7.0),
         (4, "b", 5.0), (5, "b", 6.0)],
        "doc_id int, grp string, score double")
    got = {(r.grp, r.doc_id, r.rn)
           for r in CB.collapse_top_n(scored, "grp", n=2).collect()}
    assert got == {("a", 1, 1), ("a", 2, 2), ("b", 5, 1), ("b", 4, 2)}


def test_more_like_this_excludes_source_and_ranks_by_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta delta"),
         (3, "alpha zeta"), (4, "omega psi")],
        "doc_id int, body string")
    idx = build_index(docs, {"body": "simple"}, key="doc_id")
    got = [(r.doc_id, r.overlap)
           for r in CB.more_like_this(idx, 1, n_terms=3, k=10).collect()]
    assert got == [(2, 2), (3, 1)]


def test_significant_terms_lift(spark):
    # significant-terms.test shape: 'market' is business-specific, 'data'
    # is everywhere (lift 0)
    docs = spark.createDataFrame(
        [(1, "science", "quantum data"), (2, "science", "quantum data"),
         (3, "science", "genome data"),
         (4, "business", "market data"), (5, "business", "market data"),
         (6, "business", "data revenue")],
        "doc_id int, category string, body string")
    idx = build_index(docs, {"body": "simple"}, key="doc_id")
    fg = docs.where(F.col("category") == "business").select("doc_id")
    rows = {r.term: (r.fg_docs, r.bg_docs, r.lift)
            for r in CB.significant_terms(idx, fg, min_fg_docs=2).collect()}
    assert rows["market"] == (2, 2, 1.0)
    assert rows["data"] == (3, 6, 0.0)


def test_percolate_duplicate_and_empty_terms(spark):
    """Repeated terms in a stored query must still match (n_req counts
    DISTINCT terms), and an empty terms array matches nothing in BOTH
    percolate shapes."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha only")],
        "doc_id int, body string")
    idx = build_index(docs, {"body": "simple"}, key="doc_id")
    alerts = spark.createDataFrame(
        [(1, ["alpha", "alpha", "beta"]), (2, [])],
        "query_id int, terms array<string>")
    via_index = {(r.doc_id, r.query_id)
                 for r in CB.percolate(idx, alerts).collect()}
    assert via_index == {(1, 1)}
    via_expr = {(r.doc_id, r.query_id)
                for r in CB.percolate_stream(
                    docs, alerts, "body").collect()}
    assert via_expr == {(1, 1)}
