"""Term-dictionary aggregates (facets) — the ts_dict_* family.

Reference: `ts_dict_agg, ts_dict_raw_agg, ts_dict_count, ts_dict_freq,
ts_dict_score, ts_dict_min, ts_dict_max` answered from the term dictionary
without touching rows (server/connector/functions/search.h:105-112, planner
server/connector/optimizer/ts_dict_plan.cpp). In the postings design facets
ARE the term dictionary: a groupBy on the postings/term_stats table — free
(SURVEY §2.6).

`ts_dict_filtered` covers the reference's "facets under a WHERE" form
(ts_dict_* FROM idx WHERE pred): postings semi-joined to the predicate's
doc-id set, then the same groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serenedb_spark.operators.indexing import InvertedIndex


def ts_dict(idx: InvertedIndex, field: str | None = None) -> DataFrame:
    """(term, doc_count, total_freq) straight from term stats —
    ts_dict_agg/ts_dict_count/ts_dict_freq in one relation. doc_count
    is live-exact; total_freq is the RAW index statistic (deleted docs
    stay counted until compaction — ts_dict_deletes.test:125)."""
    field = field or idx.default_field()
    live = idx.term_stats.where(F.col("field") == field).select(
        "term",
        F.col("df").alias("doc_count"),
        F.col("ctf").alias("total_freq"),
    )
    segs = getattr(idx, "_segments", None)
    if not segs or len(segs) == 1:
        return live
    # per-segment RAW totals: a segment contributes a term's raw ctf
    # while the term still has a live LATEST-copy doc in it — a doc
    # rewritten later is masked here, a deleted doc keeps counting in
    # ctf but no longer keeps the term alive
    # (ts_dict_deletes_matrix.test:300)
    live_ids = (idx.universe.where(F.col("field") == field)
                .select("doc_id").distinct())
    n = len(segs)
    laters: list = [None] * n
    acc = None
    for i in range(n - 1, -1, -1):
        laters[i] = acc
        ids_i = segs[i][0]
        acc = ids_i if acc is None else \
            acc.unionByName(ids_i).distinct()
    contribs = []
    for i, (ids_i, post_i) in enumerate(segs):
        latest_live = ids_i.join(live_ids, "doc_id", "left_semi")
        if laters[i] is not None:
            latest_live = latest_live.join(laters[i], "doc_id",
                                           "left_anti")
        p = post_i.where(F.col("field") == field)
        alive_terms = (p.join(latest_live, "doc_id", "left_semi")
                       .select("term").distinct())
        contribs.append(
            p.groupBy("term")
            .agg(F.sum("freq").cast("long").alias("__raw_ctf"))
            .join(alive_terms, "term", "left_semi"))
    raw = contribs[0]
    for c in contribs[1:]:
        raw = raw.unionByName(c)
    raw = raw.groupBy("term").agg(
        F.sum("__raw_ctf").cast("long").alias("__raw_ctf"))
    return (
        live.join(raw, "term", "left")
        .select(
            "term", "doc_count",
            F.coalesce("__raw_ctf", "total_freq").alias("total_freq"),
        )
    )


def ts_dict_top(
    idx: InvertedIndex, n: int = 10, field: str | None = None,
    by: str = "doc_count",
) -> DataFrame:
    """Top-N facet values (per-partition top-N then merge — no global sort)."""
    return ts_dict(idx, field).orderBy(
        F.col(by).desc(), F.col("term")
    ).limit(n)


def ts_dict_minmax(idx: InvertedIndex, field: str | None = None) -> DataFrame:
    """ts_dict_min / ts_dict_max — lexicographic term bounds."""
    field = field or idx.default_field()
    return (
        idx.term_stats.where(F.col("field") == field)
        .agg(
            F.min("term").alias("term_min"),
            F.max("term").alias("term_max"),
            F.count(F.lit(1)).alias("n_terms"),
        )
    )


def ts_dict_filtered(
    idx: InvertedIndex, doc_ids: DataFrame, field: str | None = None
) -> DataFrame:
    """Facets restricted to a matched doc set (the reference's single-
    predicate WHERE form): postings ⋉ doc_ids → groupBy term."""
    field = field or idx.default_field()
    return (
        idx.postings.where(F.col("field") == field)
        .join(doc_ids, "doc_id", "left_semi")
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("freq").alias("total_freq"),
        )
    )


def ts_dict_score(
    idx: InvertedIndex, doc_ids: DataFrame, field: str | None = None,
    k1: float = 1.2, b: float = 0.75,
) -> DataFrame:
    """ts_dict_score: facet values ranked by their total BM25 contribution
    over the matched doc set (reference search.h:105-112) — 'which terms
    explain this result set'. Postings ⋉ docs × broadcast stats → groupBy
    term."""
    field = field or idx.default_field()
    P = idx.postings.where(F.col("field") == field).join(
        doc_ids, "doc_id", "left_semi"
    )
    ts = idx.term_stats.where(F.col("field") == field).select("term", "df")
    ds = idx.doc_stats.where(F.col("field") == field).select("doc_id", "dl")
    g = idx.globals_.where(F.col("field") == field).select("n_docs", "avgdl")
    base = (
        P.join(F.broadcast(ts), "term")
        .join(ds, "doc_id")
        .crossJoin(F.broadcast(g))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("freq") * F.lit(k1 + 1.0)) / (
        F.col("freq")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        base.groupBy("term")
        .agg(F.round(F.sum(idf * tfn), 4).alias("score"),
             F.count(F.lit(1)).alias("doc_count"))
    )


def duckdb_ts_dict_sql(
    table: str, column: str, analyzer_duckdb_toks: str,
    where: str | None = None, top_n: int | None = None, by: str = "doc_count",
) -> str:
    """Oracle: tokenize → unnest → groupBy, optionally filtered/top-N."""
    w = f"WHERE {where}" if where else ""
    order_limit = (
        f" ORDER BY {by} DESC, term LIMIT {top_n}" if top_n is not None else ""
    )
    return f"""
WITH base AS (SELECT *, {analyzer_duckdb_toks} AS toks FROM {table}),
tok AS (SELECT doc_id, unnest(toks) AS term FROM base {w}),
p AS (SELECT doc_id, term, count(*) AS freq FROM tok GROUP BY 1, 2)
SELECT term, count(*) AS doc_count, CAST(sum(freq) AS BIGINT) AS total_freq
FROM p GROUP BY term{order_limit}
"""
