"""Filter-optimizer rewrites: structural assertions (the shape collapses)
plus semantics preservation (already continuously fuzzed — compile_query
applies optimize(), so every differential/fuzz test exercises it)."""

from __future__ import annotations

from serenedb_spark.plans import tsquery as q
from serenedb_spark.plans.optimizer import optimize


def test_or_of_terms_becomes_anyof():
    node = q.Term("a") | q.Term("b") | q.Term("c")
    assert optimize(node) == q.AnyOf(["a", "b", "c"])


def test_and_of_terms_becomes_allof():
    node = q.Term("a") & q.Term("b") & q.Term("c")
    assert optimize(node) == q.AllOf(["a", "b", "c"])


def test_double_negation():
    assert optimize(~~q.Term("a")) == q.Term("a")


def test_dedupe_and_flatten():
    node = q.Or([q.Or([q.Term("a"), q.Term("b")]), q.Term("a")])
    assert optimize(node) == q.AnyOf(["a", "b"])


def test_boost_folding():
    node = q.Boost(q.Boost(q.Term("a"), 2.0), 3.0)
    assert optimize(node) == q.Boost(q.Term("a"), 6.0)


def test_compound_negation_lowering():
    node = q.Compound(must=[~q.Term("a"), q.Term("b")],
                      must_not=[~q.Term("c")])
    got = optimize(node)
    assert got == q.Compound(must=[q.Term("b"), q.Term("c")],
                             must_not=[q.Term("a")])


def test_mixed_or_keeps_non_terms():
    node = q.Term("a") | q.Phrase(["x", "y"]) | q.Term("b")
    got = optimize(node)
    assert isinstance(got, q.Or)
    assert q.AnyOf(["a", "b"]) in got.parts
    assert q.Phrase(["x", "y"]) in got.parts


def test_semantics_preserved_on_corpus(spark):
    """The rewritten plans answer identically — spot-check the rewrite
    pairs on real data (full coverage via the fuzz suite)."""
    from serenedb_spark.operators.indexing import build_index
    from serenedb_spark.plans.planner import compile_query
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    idx = build_index(docs, {"text": "simple"}, key="doc_id")

    pairs = [
        (q.Term("spark") | q.Term("batch"), q.AnyOf(["spark", "batch"])),
        (q.Term("data") & q.Term("join"), q.AllOf(["data", "join"])),
        (~~q.Term("slow"), q.Term("slow")),
        (q.Compound(must=[~q.Term("dup")]),
         q.Compound(must_not=[q.Term("dup")])),
    ]
    for a, b in pairs:
        ga = {r.doc_id for r in compile_query(idx, "text", a).doc_ids.collect()}
        gb = {r.doc_id for r in compile_query(idx, "text", b).doc_ids.collect()}
        assert ga == gb, (a, b)


# ---- _ordered collect-only contract (r13 verdict item 9) -------------------

def test_ordered_is_terminal_and_bounded(spark):
    """`queries._ordered` is a TERMINAL, collect-only transform: every
    registry query that ends in it must produce a driver-collectable
    result (bounded at the gate SF), and the single-partition sort must
    sit at the TOP of the plan — nothing distributed may consume it."""
    from serenedb_spark import queries as Q
    from tests.conftest import SF_DIR

    df = Q.REGISTRY["text_quality"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the repartition(1) + local sort is the outermost pair of operators
    head = "\n".join(plan.splitlines()[:2])
    assert "Sort" in head and "Repartition" in head, head
    # and the result is collect-bounded at this SF (the contract's reason)
    assert df.count() <= 200_000


def test_ordered_contract_documented():
    from serenedb_spark.queries import _ordered

    doc = _ordered.__doc__ or ""
    assert "collect-only" in doc and "TERMINAL" in doc
