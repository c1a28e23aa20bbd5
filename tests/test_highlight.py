"""Sentence-boundary highlighting with ICU-style abbreviation suppression
(functions/highlight.py): the Spark expression and the generated DuckDB
oracle SQL must agree on abbreviation-rich prose, and a '.' after a known
abbreviation must NOT end the snippet's sentence."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from serenedb_spark.functions.highlight import (
    duckdb_ts_highlight_sql,
    ts_highlight,
)

DOCS = [
    (1, "Dr. Smith joined the spark team. It ran fast. Done."),
    (2, "We shipped, e.g. the spark operator. More news soon. Bye."),
    (3, "Costs fell 40 pct. vs. last year the spark job was slow. Fin."),
    (4, "A plain sentence about spark here. Another sentence follows."),
    (5, "Results due Jan. 5 show spark ahead. Next review in Feb."),
    (6, "No match in this one. Nothing to see. Bye."),
    (7, "spark at the very start. Second sentence."),
    (8, "Trailing match mentions spark"),
    (9, "Ask\nDr. Smith about the spark plan. Then stop."),
    (10, "A word like xMessrs. ends the spark sentence. Next one."),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def _both(spark, docs_df, term: str, boundary: str):
    got = {
        r["doc_id"]: r["snippet"]
        for r in ts_highlight(docs_df, "text", term,
                              boundary=boundary).collect()
    }
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    sql = duckdb_ts_highlight_sql("docs", "text", term, boundary=boundary)
    want = dict(con.execute(sql).fetchall())
    return got, want


@pytest.mark.parametrize("boundary", ["sentence", "word", "char"])
def test_spark_matches_duckdb_oracle(spark, docs_df, boundary):
    got, want = _both(spark, docs_df, "spark", boundary)
    assert got == want and got  # non-empty and identical


def test_abbreviations_do_not_split_sentences(spark, docs_df):
    got, _ = _both(spark, docs_df, "spark", "sentence")
    # Dr. must not end the sentence: snippet spans from the text start
    assert got[1] == "Dr. Smith joined the <b>spark</b> team."
    # e.g. suppressed -> sentence starts at the text start, not after 'e.g.'
    assert got[2] == "We shipped, e.g. the <b>spark</b> operator."
    # vs. suppressed (pct. is NOT on the list -> break stands)
    assert got[3].startswith("vs. last year")
    # Jan. suppressed -> one sentence through the match
    assert got[5].startswith("Results due Jan. 5")
    # unsuppressed control: plain sentences still split normally
    assert got[4] == "A plain sentence about <b>spark</b> here."
    # no-match doc absent; match-at-start and unterminated-tail still work
    assert 6 not in got
    assert got[7].startswith("<b>spark</b> at the very start.")
    assert got[8].endswith("<b>spark</b>")
    # newline-separated abbreviation still suppressed (whitespace-aware
    # lookback, not just single spaces)
    assert got[9].endswith("Dr. Smith about the <b>spark</b> plan.")
    # a longer word that merely ENDS in an abbreviation is not suppressed
    assert got[10] == "ends the <b>spark</b> sentence."


def test_sentence_locale_suppressions(spark):
    """de tailoring: 'z.B.'/'Nr.'/'Dr.' must not end a sentence; under
    the en list the same dots DO break — proving the locale parameter
    changes behavior, not just the list object."""
    from serenedb_spark.functions.highlight import ts_highlight

    text = ("Nr. 7 gilt hier. Wir sehen z.B. das fenster klar "
            "laut Dr. Weber heute. Ende.")
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    de = ts_highlight(df, "text", "fenster", boundary="sentence",
                      locale="de").first().snippet
    en = ts_highlight(df, "text", "fenster", boundary="sentence",
                      locale="en").first().snippet
    # de: the sentence runs from after 'gilt hier.' to 'heute.'
    assert de == ("Wir sehen z.B. das <b>fenster</b> klar "
                  "laut Dr. Weber heute.")
    # en: 'z.B.' is not suppressed -> the sentence starts after it
    assert en == "das <b>fenster</b> klar laut Dr. Weber heute."
