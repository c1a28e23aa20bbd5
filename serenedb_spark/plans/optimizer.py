"""TSQuery filter optimizer — AST simplification before plan emission.

Reference: IResearch's filter optimizer performs boolean simplification,
negation lowering, and range/term merging over irs filters
(libs/iresearch/include/iresearch/search/filter_optimizer.{hpp,cpp};
tests sdb/pg/index/filter_optimizer_{boolean,boost,lowering,negation,
range_terms,semantics}.test). SURVEY §4.1 assigns the TSQUERY-tree pass
to us; Catalyst only sees the emitted DataFrame graph, so collapsing the
AST first removes whole joins/unions, not just predicates.

Rewrites (each preserves 3VL match semantics — the hypothesis fuzz suite
runs the optimizer implicitly via compile_query):
  * flatten nested And/Or; single-child unwrap
  * double negation: Not(Not(x)) → x
  * dedupe identical siblings
  * Or of Terms → AnyOf (one postings scan instead of a union per term)
  * And of Terms → AllOf (one scan + count aggregate instead of a
    semi-join chain)
  * merge AnyOf(min_match=1) siblings under Or; merge Term into sibling
    AnyOf
  * De Morgan negation lowering inside Compound: must_not[Not(x)] → must[x]
  * Boost folding through pure containers (matching scores is the caller's
    concern: boosts multiply down, as in compile_query)
"""

from __future__ import annotations

from serenedb_spark.plans import tsquery as q


def optimize(node: q.TSQuery) -> q.TSQuery:
    node = _rewrite(node)
    return node


def _rewrite(node: q.TSQuery) -> q.TSQuery:
    if isinstance(node, q.And):
        parts = _flatten([_rewrite(p) for p in node.parts], q.And)
        parts = _dedupe(parts)
        merged = _merge_and_terms(parts)
        if len(merged) == 1:
            return merged[0]
        return q.And(merged)

    if isinstance(node, q.Or):
        parts = _flatten([_rewrite(p) for p in node.parts], q.Or)
        parts = _sum_duplicate_boosts(parts)
        parts = _dedupe(parts)
        merged = _merge_or_terms(parts)
        if len(merged) == 1:
            return merged[0]
        return q.Or(merged)

    if isinstance(node, q.Not):
        inner = _rewrite(node.part)
        if isinstance(inner, q.Not):
            return inner.part
        return q.Not(inner)

    if isinstance(node, q.Boost):
        inner = _rewrite(node.part)
        if isinstance(inner, q.Boost):
            return q.Boost(inner.part, node.factor * inner.factor)
        return q.Boost(inner, node.factor)

    if isinstance(node, q.Compound):
        must = [_rewrite(p) for p in node.must]
        must_not = [_rewrite(p) for p in node.must_not]
        should = [_rewrite(p) for p in node.should]
        # negation lowering: NOT x in must ⇒ x in must_not; NOT x in
        # must_not ⇒ x in must (2-valued inside the compound's positive
        # universe — sound because must_not is evaluated as anti-join on
        # the already-positive doc set)
        new_must, new_must_not = [], []
        for p in must:
            (new_must_not if isinstance(p, q.Not) else new_must).append(
                p.part if isinstance(p, q.Not) else p
            )
        for p in must_not:
            (new_must if isinstance(p, q.Not) else new_must_not).append(
                p.part if isinstance(p, q.Not) else p
            )
        return q.Compound(
            must=_dedupe(new_must),
            must_not=_dedupe(new_must_not),
            should=_dedupe(should),
            min_should_match=node.min_should_match,
        )

    return node


def _flatten(parts: list[q.TSQuery], kind: type) -> list[q.TSQuery]:
    out: list[q.TSQuery] = []
    for p in parts:
        if isinstance(p, kind):
            out.extend(p.parts)
        else:
            out.append(p)
    return out


def _sum_duplicate_boosts(parts: list[q.TSQuery]) -> list[q.TSQuery]:
    """Identical disjuncts merge with SUMMED boosts — a disjunction's
    score is the sum of its matching clauses, so `(x)^2 || (x)^3` is one
    clause boosted 5 (filter_optimizer_boost.test:36-55 pins the merged
    `Boost: 5` filter).  A plain node is boost 1.0."""
    merged: dict[str, tuple[q.TSQuery, float, bool]] = {}
    for p in parts:
        inner, b = (p.part, p.factor) if isinstance(p, q.Boost) else (p, 1.0)
        k = repr(inner)
        if k in merged:
            prev, pb, _ = merged[k]
            merged[k] = (prev, pb + b, True)
        else:
            merged[k] = (inner, b, isinstance(p, q.Boost))
    out: list[q.TSQuery] = []
    for inner, b, boosted in merged.values():
        out.append(q.Boost(inner, b) if boosted else inner)
    return out


def _dedupe(parts) -> list[q.TSQuery]:
    seen, out = set(), []
    for p in parts:
        k = repr(p)
        if k not in seen:
            seen.add(k)
            out.append(p)
    return out


def _merge_or_terms(parts: list[q.TSQuery]) -> list[q.TSQuery]:
    """Terms and min_match=1 AnyOfs under Or collapse into one AnyOf —
    one postings scan replaces a union of scans."""
    terms: list[str] = []
    rest: list[q.TSQuery] = []
    for p in parts:
        if isinstance(p, q.Term):
            terms.append(p.term)
        elif isinstance(p, q.AnyOf) and p.min_match <= 1:
            terms.extend(p.terms)
        else:
            rest.append(p)
    if len(terms) == 1 and not any(isinstance(r, q.AnyOf) for r in rest):
        return [q.Term(terms[0]), *rest]
    if terms:
        return [q.AnyOf(list(dict.fromkeys(terms))), *rest]
    return rest


def _merge_and_terms(parts: list[q.TSQuery]) -> list[q.TSQuery]:
    """Terms and AllOfs under And collapse into one AllOf — one scan +
    count aggregate replaces a semi-join chain."""
    terms: list[str] = []
    rest: list[q.TSQuery] = []
    for p in parts:
        if isinstance(p, q.Term):
            terms.append(p.term)
        elif isinstance(p, q.AllOf):
            terms.extend(p.terms)
        else:
            rest.append(p)
    if len(terms) == 1:
        return [q.Term(terms[0]), *rest]
    if terms:
        return [q.AllOf(list(dict.fromkeys(terms))), *rest]
    return rest
