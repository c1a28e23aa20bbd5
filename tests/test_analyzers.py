"""Analyzer 3-way consistency — THE invariant of the engine: for every
registered analyzer, the JVM expression (``expr``), the pure-Python
tokenizer (``tokens``) and the DuckDB SQL fragment (``duckdb``) must
produce identical token arrays on the same inputs (the reference enforces
the analogous property via its index≡scan fuzz oracle,
tests/fuzz/null_semantics_fuzz.py)."""

from __future__ import annotations

import duckdb
import pytest

from serenedb_spark.analysis.analyzers import analyzers

SAMPLES = [
    "The quick brown Fox; jumps-over the lazy dog!",
    "spark data JOIN merge,sort;batch|stream",
    "a/b/c/deep/path",
    "x",
    "",
    "  punctuation...only!!!  ",
    "MixedCASE tokens 123 456-789",
    "unicode café naïve 中文",
    '{"type":"Point","coordinates":[10.5,20.5]}',
    '{"type":"Polygon","coordinates":'
    '[[[1.0,1.0],[2.5,1.0],[2.5,2.5],[1.0,2.5],[1.0,1.0]]]}',
    '{"type":"LineString","coordinates":[[-0.9,0.1],[1.9,0.4]]}',
    '{"type":"MultiPolygon","coordinates":[]}',
]


@pytest.mark.parametrize("name", sorted(analyzers()))
def test_three_way_consistency(name, spark):
    an = analyzers()[name]
    con = duckdb.connect()
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i long, s string")
    spark_rows = {
        r.i: list(r.toks) if r.toks is not None else None
        for r in df.select("i", an.expr(df.s).alias("toks")).collect()
    }
    for i, s in enumerate(SAMPLES):
        py_toks = an.tokens(s)
        lit = s.replace("'", "''")
        duck_toks = con.sql(
            "SELECT " + an.duckdb(f"'{lit}'") + " AS t"
        ).fetchone()[0]
        assert spark_rows[i] == py_toks, (name, s, spark_rows[i], py_toks)
        assert list(duck_toks or []) == py_toks, (name, s, duck_toks, py_toks)


def test_null_handling(spark):
    for name, an in analyzers().items():
        df = spark.createDataFrame([(1, None)], "i long, s string")
        row = df.select(an.expr(df.s).alias("t")).collect()[0]
        # NULL input must never produce tokens (3VL soundness upstream)
        assert row.t is None or row.t == [], (name, row.t)
