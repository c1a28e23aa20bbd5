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

Two index layouts:
  * ``substring_search`` — all grams indexed (ngram3), needle covered by
    every gram.
  * ``sparse_substring_search`` — the reference's sparse scheme
    (`sparse_ngram` create_tsdictionary.cpp:465, demo6): only local-min
    grams are indexed (~1/3 density), and the needle requires its
    interior-selected grams.  Superstring invariance of the selection
    keeps the cover lossless (see analyzers._sparse_ngram); a needle with
    no selected gram falls back to the exact scan."""

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


def sparse_substring_search(
    idx: InvertedIndex,
    field: str,
    needle: str,
    analyzer: str = "sparse_ngram3",
) -> DataFrame:
    """Substring search over a SPARSE ngram index: candidates must contain
    every interior-selected gram of the needle (AllOf over ~len/3 postings
    terms), then the exact ``contains`` residual runs on candidates only.
    Falls back to the exact docstore scan when the needle selects nothing
    (short/degenerate needles) — still exact, just unaccelerated."""
    an = get_analyzer(analyzer)
    grams = list(dict.fromkeys(an.tokens(needle)))
    exact = F.instr(F.lower(F.col(field)), needle.lower()) > 0
    if not grams:
        return idx.docstore.where(exact).select("doc_id")
    P = idx.postings.where(F.col("field") == field)
    cand = (
        P.where(F.col("term").isin(grams))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("m"))
        .where(F.col("m") >= len(grams))
        .select("doc_id")
    )
    docs = idx.docstore.join(cand, "doc_id", "left_semi")
    return docs.where(exact).select("doc_id")


def duckdb_substring_sql(table: str, column: str, needle: str) -> str:
    """The naive scan the reference benchmarks against (LIKE path)."""
    n = needle.lower().replace("'", "''").replace("%", r"\%").replace("_", r"\_")
    return (
        f"SELECT doc_id FROM {table}"
        f" WHERE lower({column}) LIKE '%{n}%' ESCAPE '\\'"
        f" ORDER BY doc_id"
    )
