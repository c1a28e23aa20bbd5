"""Driver contract for the spark-graft builder (PySpark target).

All query definitions live in ``serenedb_spark.queries`` — a single
registry of (spark_fn, duckdb_oracle) pairs covering the SURVEY.md §2
operator inventory: relational (TPC-H-ish, windows, rollup, setops,
subqueries), full-text search (the TSQUERY family over the inverted-index
postings plan), scoring (BM25/TFIDF), facets, dedup (exact/MinHash-LSH/
Jaccard/SimHash), text analysis (token count/quality/langid/fingerprint),
and vector search (exact kNN/radius/IVF/hybrid).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from serenedb_spark import queries as _Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-k full-text search
    over the documents table through the inverted-index DataFrame plan
    (the reference's demo0 shape: match → score → late materialization)."""
    from pyspark.sql import functions as F

    from serenedb_spark.operators.scoring import score
    from serenedb_spark.plans import tsquery as q
    from serenedb_spark.plans.planner import compile_query

    sf_dir = "/root/testdata/sf0.001"
    idx = _Q.doc_index(spark, sf_dir)
    node = q.to_tsquery("spark & (data | batch) & !slow")
    compiled = compile_query(idx, "text", node)
    s = score(idx, "text", compiled.score_terms, "bm25")
    return (
        idx.docstore.join(compiled.doc_ids, "doc_id", "left_semi")
        .join(s, "doc_id", "left")
        .select(
            "doc_id", "lang", "source",
            F.substring("text", 1, 80).alias("snippet"),
            F.round(F.coalesce(F.col("score"), F.lit(0.0)), 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(10)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    return _Q.oracle_sql()
