"""The correctness gate, in-repo: every REGISTRY query runs on Spark (the
engine) AND on DuckDB (its oracle SQL) at sf0.001; results must match.

This reproduces the driver's t2 gate AND the reference's differential
test strategy (index-scan ≡ full-scan; reference
tests/fuzz/null_semantics_fuzz.py:4-8) in one parameterized test."""

from __future__ import annotations

import pytest

from serenedb_spark import queries as Q
from tests.conftest import SF_DIR, assert_frames_match

CASES = sorted(Q.REGISTRY)


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(name, spark, duck):
    d = Q.REGISTRY[name]
    sdf = d.fn(spark, SF_DIR)
    if d.oracle is None:
        # rows-only contract (approximate results can't value-hash)
        assert sdf.count() >= 0 and len(sdf.schema.fields) > 0
        return
    rel = duck.sql(d.oracle)
    assert_frames_match(sdf, rel)


#: queries registered WITHOUT an oracle — each needs a stated reason
ROWS_ONLY = {
    "approx_aggregates",   # approximate values, no exact twin
    "vec_rabitq_highdim",  # 1536-dim: the DuckDB twin would be a 2.4M-
    #                        literal statement (the expr path cannot
    #                        codegen there either — that's the point);
    #                        numpy==expr parity is pinned at gate dims
    #                        in test_vector_ops
}


def test_all_queries_have_oracles():
    missing = [n for n, d in Q.REGISTRY.items()
               if d.oracle is None and n not in ROWS_ONLY]
    assert not missing, f"queries without oracles: {missing}"


def test_entry_contract(spark):
    import __spark_entry__ as E

    qs = E.queries()
    os_ = E.oracle_sql()
    assert set(os_) <= set(qs)
    df = E.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
