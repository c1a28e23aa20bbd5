"""Substring / code search over an n-gram index — the reference's
sparse-ngram scheme (demo6: GitHub-code-search-style substring queries;
`sparse_ngram` tokenizer create_tsdictionary.cpp:465, covering query mode;
BASELINE.md row "code search": postings path "stays flat" vs LIKE-scan
growing linearly).

Spark-first shape: the needle is covered by its character n-grams; an
AllOf over the ngram postings produces a SMALL candidate id set (postings
semi-joins, term-pruned parquet scans); the exact ``contains`` check runs
only on the candidates (late materialization). The differential oracle is
the naive LIKE scan — equality proves the cover lossless.

(The reference's sparse_ngram selects a subset of grams via a monotonic
stack to shrink the index; we index all grams — denser index, same query
semantics. Documented deviation.)"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serenedb_spark.analysis.analyzers import get_analyzer
from serenedb_spark.operators.indexing import InvertedIndex


def substring_search(
    idx: InvertedIndex,
    field: str,
    needle: str,
    ngram: str = "ngram3",
) -> DataFrame:
    """doc ids whose `field` contains `needle` (case-insensitive), answered
    from ngram postings + exact residual check."""
    an = get_analyzer(ngram)
    grams = list(dict.fromkeys(an.tokens(needle)))
    P = idx.postings.where(F.col("field") == field)

    if not grams:
        raise ValueError(f"needle shorter than the ngram size: {needle!r}")

    cand = (
        P.where(F.col("term").isin(grams))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("m"))
        .where(F.col("m") >= len(grams))
        .select("doc_id")
    )
    # exact residual check on candidates only (grams are necessary, not
    # sufficient: they may match out of order)
    docs = idx.docstore.join(cand, "doc_id", "left_semi")
    return docs.where(
        F.instr(F.lower(F.col(field)), needle.lower()) > 0
    ).select("doc_id")


def duckdb_substring_sql(table: str, column: str, needle: str) -> str:
    """The naive scan the reference benchmarks against (LIKE path)."""
    n = needle.lower().replace("'", "''").replace("%", r"\%").replace("_", r"\_")
    return (
        f"SELECT doc_id FROM {table}"
        f" WHERE lower({column}) LIKE '%{n}%' ESCAPE '\\'"
        f" ORDER BY doc_id"
    )
