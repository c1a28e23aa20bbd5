"""F3 fixture (FIXTURES.md): the reference's null_semantics_fuzz table —
keyword-analyzed NULLABLE columns with typed predicates. Random
equality/range/NOT/compound claims over (kw, num, pad) must return exactly
the naive-scan rows under 3VL (reference
tests/fuzz/null_semantics_fuzz.py:43-49 shape)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from serenedb_spark.operators.indexing import build_index
from serenedb_spark.plans import tsquery as q
from serenedb_spark.plans.oracle import match_fragment
from serenedb_spark.plans.planner import compile_query

ROWS = 2000


@pytest.fixture(scope="module")
def fz(spark):
    # deterministic synthetic: kw ∈ {a..e} 30% NULL, num ∈ 1..9 30% NULL,
    # pad ∈ {p,q} NOT NULL (seed = row id arithmetic, no RNG)
    rows = []
    for i in range(ROWS):
        kw = None if i % 10 < 3 else "abcde"[(i * 7) % 5]
        num = None if (i * 3) % 10 < 3 else str((i * 11) % 9 + 1)
        pad = "pq"[i % 2]
        rows.append((i, kw, num, pad))
    df = spark.createDataFrame(rows, "id long, kw string, num string, pad string")
    idx = build_index(
        df, {"kw": "keyword", "num": "keyword", "pad": "keyword"}, key="id"
    )
    idx.postings.persist(); idx.universe.persist()
    con = duckdb.connect()
    con.register("fz", df.toPandas())
    return idx, con


FIELDS = ["kw", "num", "pad"]
VALUES = {"kw": ["a", "c", "e", "zz"], "num": ["1", "5", "9"], "pad": ["p", "q"]}

field_leaf = st.sampled_from(FIELDS).flatmap(
    lambda f: st.one_of(
        st.sampled_from(VALUES[f]).map(lambda v: (f, q.Term(v))),
        st.tuples(st.sampled_from(VALUES[f]), st.sampled_from(VALUES[f])).map(
            lambda p: (f, q.Between(min(p), max(p)))
        ),
        st.sampled_from(VALUES[f]).map(lambda v: (f, ~q.Term(v))),
    )
)


def _duck_field_sql(field: str, node: q.TSQuery) -> str:
    """Per-field oracle: keyword tokens = [CAST(col AS VARCHAR)]."""
    toks = f"CASE WHEN {field} IS NULL THEN NULL ELSE [CAST({field} AS VARCHAR)] END"
    return (
        f"SELECT id FROM (SELECT id, {toks} AS toks FROM fz)"
        f" WHERE toks IS NOT NULL AND ({match_fragment(node)})"
    )


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(leaves=st.lists(field_leaf, min_size=1, max_size=3),
       combine=st.sampled_from(["and", "or"]))
def test_typed_claims_match_oracle(fz, leaves, combine):
    idx, con = fz
    # per-field doc-id sets composed with set algebra (multi-field queries
    # — each field has its own postings/universe)
    sets = []
    sqls = []
    for field, node in leaves:
        ids = {
            r.doc_id
            for r in compile_query(idx, field, node).doc_ids.collect()
        }
        sets.append(ids)
        sqls.append(_duck_field_sql(field, node))
    if combine == "and":
        got = set.intersection(*sets)
        glue = " INTERSECT "
    else:
        got = set.union(*sets)
        glue = " UNION "
    want = {r[0] for r in con.sql(glue.join(f"({s})" for s in sqls)).fetchall()}
    assert got == want, (leaves, combine, got ^ want)


def test_null_rows_excluded_from_not(fz):
    idx, con = fz
    got = {r.doc_id for r in compile_query(idx, "kw", ~q.Term("a")).doc_ids.collect()}
    # NULL kw rows are not in the kw universe → never match NOT
    null_ids = {r[0] for r in con.sql("SELECT id FROM fz WHERE kw IS NULL").fetchall()}
    assert not (got & null_ids)
    a_ids = {r[0] for r in con.sql("SELECT id FROM fz WHERE kw = 'a'").fetchall()}
    assert not (got & a_ids)
    rest = {r[0] for r in con.sql(
        "SELECT id FROM fz WHERE kw IS NOT NULL AND kw <> 'a'"
    ).fetchall()}
    assert got == rest
