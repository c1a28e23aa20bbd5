"""Cookbook retrieval recipes — the end-user query shapes the reference
documents as its search cookbook (reference
tests/sqllogic/sdb/pg/site_docs/cookbook/search/*.test). Each recipe is a
composition of the engine's existing relations (term dictionary, postings,
scorers), expressed as declarative DataFrame plans so Catalyst keeps
pushdown/broadcast decisions:

- autocomplete.test          -> ``autocomplete``        (prefix dictionary)
- spell-correction.test      -> ``spell_suggest``       (fuzzy dictionary)
- significant-terms.test     -> ``significant_terms``   (fg-vs-bg lift)
- similar-documents.test     -> ``more_like_this``      (query-by-document)
- saved-searches.test        -> ``percolate``           (queries as data)
- pinned-results.test        -> ``pinned_order``        (curated-first sort)
- grouping-results.test      -> ``collapse_top_n``      (top-N per group)

Scale notes (100 TB): every recipe works on the pre-aggregated dictionary /
postings relations, never the raw text; the query-side relations (prefix
terms, alert terms, per-doc top terms) are tiny by construction and
broadcast, so the only shuffles are the groupBys that already back the
index. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from serenedb_spark.operators.indexing import InvertedIndex


def autocomplete(
    idx: InvertedIndex,
    prefix: str,
    field: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Suggestions for a prefix, most-searched first (autocomplete.test
    example_002/003: ``ts_dict_agg``/``ts_dict_count`` + ``LIKE 'run%'``).

    Pure dictionary scan: term_stats is already one row per term, so at any
    corpus size this reads |dictionary| rows and the prefix predicate prunes
    term-bucketed storage.
    """
    field = field or idx.default_field()
    out = (
        idx.term_stats.where(F.col("field") == field)
        .where(F.col("term").startswith(prefix))
        .select(F.col("term").alias("suggestion"),
                F.col("df").alias("searches"))
        .orderBy(F.col("searches").desc(), F.col("suggestion"))
    )
    return out.limit(limit) if limit is not None else out


def spell_suggest(
    idx: InvertedIndex,
    word: str,
    max_dist: int = 2,
    field: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Did-you-mean corrections from the term dictionary
    (spell-correction.test): terms within ``max_dist`` edits, ranked by
    similarity ``1 - dist/len(word)`` then by how often the term occurs.

    The length pre-filter (|len(term) - len(word)| <= max_dist) prunes the
    dictionary before the O(len^2) edit-distance kernel — same trick the
    fuzzy predicate expansion uses (plans/planner.py Fuzzy branch).
    """
    field = field or idx.default_field()
    w = F.lit(word)
    cand = (
        idx.term_stats.where(F.col("field") == field)
        .where(F.abs(F.length("term") - F.length(w)) <= max_dist)
        .withColumn("dist", F.levenshtein(F.col("term"), w))
        .where(F.col("dist") <= max_dist)
    )
    out = (
        cand.select(
            F.col("term").alias("suggestion"),
            F.round(F.lit(1.0) - F.col("dist") / F.lit(float(len(word))), 4)
             .alias("similarity"),
            F.col("df").alias("searches"),
        )
        .orderBy(F.col("similarity").desc(), F.col("searches").desc(),
                 F.col("suggestion"))
    )
    return out.limit(limit) if limit is not None else out


def significant_terms(
    idx: InvertedIndex,
    fg_doc_ids: DataFrame,
    field: str | None = None,
    min_fg_docs: int = 2,
    limit: int | None = None,
) -> DataFrame:
    """Terms over-represented in a foreground doc set vs the whole corpus
    (significant-terms.test example_003): lift = fg_docs − bg_docs ×
    fg_total/bg_total.

    Foreground facets are a postings semi-join (one shuffle on term);
    background facets and the two totals come straight from the index's
    pre-aggregated term_stats/globals, broadcast at one row each.
    """
    field = field or idx.default_field()
    fg = (
        idx.postings.where(F.col("field") == field)
        .join(fg_doc_ids, "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fg_docs"))
    )
    bg = idx.term_stats.where(F.col("field") == field).select(
        "term", F.col("df").alias("bg_docs"))
    fg_total = fg_doc_ids.agg(F.count(F.lit(1)).alias("fg_total"))
    bg_total = idx.globals_.where(F.col("field") == field).select(
        F.col("n_docs").alias("bg_total"))
    out = (
        fg.where(F.col("fg_docs") >= min_fg_docs)
        .join(F.broadcast(bg), "term")
        .crossJoin(F.broadcast(fg_total))
        .crossJoin(F.broadcast(bg_total))
        .select(
            "term", "fg_docs", "bg_docs",
            F.round(
                F.col("fg_docs")
                - F.col("bg_docs") * F.col("fg_total")
                / F.col("bg_total").cast("double"),
                2,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("term"))
    )
    return out.limit(limit) if limit is not None else out


def more_like_this(
    idx: InvertedIndex,
    doc_id,
    n_terms: int = 5,
    k: int = 10,
    field: str | None = None,
) -> DataFrame:
    """Query-by-document (similar-documents.test, ES more_like_this): take
    the source doc's ``n_terms`` most frequent terms, rank other docs by how
    many of them they share.

    The query-term relation is <= n_terms rows — broadcast; the candidate
    scan is a postings join on term (bucket-pruned), then one groupBy.
    """
    field = field or idx.default_field()
    qterms = (
        idx.postings.where(
            (F.col("field") == field) & (F.col("doc_id") == doc_id))
        .orderBy(F.col("freq").desc(), F.col("term"))
        .limit(n_terms)
        .select("term")
    )
    return (
        idx.postings.where(F.col("field") == field)
        .where(F.col("doc_id") != doc_id)
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("overlap"))
        .orderBy(F.col("overlap").desc(), F.col("doc_id"))
        .limit(k)
    )


def percolate(
    idx: InvertedIndex,
    alerts: DataFrame,
    query_id: str = "query_id",
    terms_col: str = "terms",
    field: str | None = None,
) -> DataFrame:
    """Reverse search / saved searches (saved-searches.test): a table of
    stored conjunctive term queries is matched against every indexed doc;
    returns (doc_id, query_id) for each doc that contains ALL of a query's
    terms.

    This is the streaming-classification shape (alert subscriptions over a
    100 TB corpus): alerts explode to (query_id, term, n_req) — tiny,
    broadcast — postings join on term, then one groupBy(doc_id, query_id)
    checking the conjunction count. No cartesian anywhere.

    Duplicate terms in a stored query are collapsed (matching is by
    DISTINCT term, so n_req must count distinct terms too). A query with
    an EMPTY terms array matches nothing — same convention as
    ``percolate_stream``, which filters empty queries out explicitly.
    """
    field = field or idx.default_field()
    q = (
        alerts.select(
            F.col(query_id).alias("query_id"),
            F.size(F.array_distinct(F.col(terms_col))).alias("n_req"),
            F.explode(F.array_distinct(F.col(terms_col))).alias("term"),
        )
    )
    P = idx.postings.where(F.col("field") == field)
    if alerts.isLocal():
        # the stored queries are a driver-local relation (the saved-search
        # catalog): their term vocabulary is known before the scan, so it
        # becomes a pushable isin predicate — the postings read prunes to
        # the claimed term buckets / cached batches instead of scanning
        # the whole corpus dictionary (guide §6: make the predicate reach
        # the scan). The broadcast join already dropped every other term;
        # this only moves that drop below the scan.
        vocab = sorted({t for r in alerts.select(terms_col).collect()
                        for t in (r[0] or [])})
        if vocab:
            P = P.where(F.col("term").isin(vocab))
    hits = (
        P.select("doc_id", "term")
        .join(F.broadcast(q), "term")
        .groupBy("doc_id", "query_id", "n_req")
        # postings are unique per (term, doc_id) and the alert side is
        # array_distinct-exploded, so each (doc, query, term) joins at
        # most once: count ≡ count_distinct
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .where(F.col("n_hit") == F.col("n_req"))
        .select("doc_id", "query_id")
    )
    return hits


def percolate_stream(
    docs: DataFrame,
    alerts: DataFrame,
    text_col: str,
    analyzer: str = "simple",
    query_id: str = "query_id",
    terms_col: str = "terms",
) -> DataFrame:
    """Stateless percolate for ingestion time: classify each incoming doc
    against the stored queries with a broadcast alert set and a pure
    `forall` expression — no index, no shuffle, no state, so the SAME plan
    runs on a batch DataFrame or inside readStream→writeStream (alert
    notification on a live document feed). Complements ``percolate``,
    which is the postings-join shape for re-classifying a large static
    corpus.

    Empty-terms queries match nothing (a bare `forall` over an empty
    array is vacuously true — filtered out here so both percolate shapes
    agree on the edge case)."""
    from serenedb_spark.analysis.analyzers import get_analyzer

    an = get_analyzer(analyzer)
    tagged = docs.withColumn("__toks", an.expr(F.col(text_col)))
    joined = tagged.join(
        F.broadcast(
            alerts.select(F.col(query_id).alias("query_id"),
                          F.col(terms_col).alias("__terms"))
            .where(F.size("__terms") > 0)))
    hit = F.forall(
        F.col("__terms"),
        lambda t: F.array_contains(F.col("__toks"), t),
    )
    return (
        joined.where(F.col("__toks").isNotNull() & hit)
        .drop("__toks", "__terms")
    )


def pinned_position(doc_id: Column, pinned: list) -> Column:
    """Sort key for curated-first ordering (pinned-results.test
    example_003: ``array_position(ARRAY[...], id) NULLS LAST``). Spark's
    array_position returns 0 for 'absent'; map that to NULL so
    asc_nulls_last matches the reference semantics exactly."""
    pos = F.array_position(F.array(*[F.lit(p) for p in pinned]), doc_id)
    return F.when(pos > 0, pos)


def pinned_order(
    scored: DataFrame,
    pinned: list,
    doc_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Apply curated-first ordering to a scored result set: pinned ids in
    their curated order, then everything else by relevance."""
    return scored.orderBy(
        pinned_position(F.col(doc_col), pinned).asc_nulls_last(),
        F.col(score_col).desc(),
        F.col(doc_col),
    )


def collapse_top_n(
    scored: DataFrame,
    group_col: str,
    n: int = 1,
    doc_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Field collapsing (grouping-results.test): keep the top-``n`` hits per
    group by relevance. One window shuffle on the collapse key — the same
    plan Spark gives the reference's ROW_NUMBER() OVER (PARTITION BY ...)
    formulation."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(doc_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
    )
