"""Claimed-vs-residual EXPLAIN — the planner's introspection surface.

Reference: EXPLAIN over an index relation renders an ``IRESEARCH_SCAN``
node carrying the serving index, the lookup mode, the projections, the
CLAIMED index filter as a tree of typed leaves (Term/Terms/Phrase/...),
and the residual ``Column Filter`` evaluated after the index
(tests/sqllogic/sdb/pg/explain/basic.test:7-13,
tests/sqllogic/any/pg/index/secondary_index.test:1014,
tests/sqllogic/sdb/pg/index/null_semantics.test:56-100).

This module renders the same split for this engine: the TSQuery AST
AFTER the filter-optimizer pass (what compile_query actually plans), the
residual SQL conjuncts, the serving analyzer per field, the scorer and
top-k, and — for ANN scans — the probe/prune counts. Plain indented
text, not box drawing: the content contract (claimed tree + residual
split) is what the tests pin.
"""

from __future__ import annotations

from serenedb_spark.plans import tsquery as q
from serenedb_spark.plans.optimizer import optimize


def _leaf(label: str, boost: float = 1.0) -> str:
    return label + (f" boost={boost:g}" if boost != 1.0 else "")


def render_tsquery(node: q.TSQuery, indent: int = 0,
                   boost: float = 1.0) -> list[str]:
    """One line per AST node, children indented — the Index Filter tree."""
    pad = "  " * indent

    def kids(parts, extra_indent=1):
        out = []
        for p in parts:
            out.extend(render_tsquery(p, indent + extra_indent))
        return out

    if isinstance(node, q.Boost):
        return render_tsquery(node.part, indent, boost * node.factor)
    if isinstance(node, q.Term):
        return [pad + _leaf(f"Term value={node.term!r}", boost)]
    if isinstance(node, q.AnyOf):
        mm = f" min_match={node.min_match}" if node.min_match > 1 else ""
        return [pad + _leaf(
            f"Terms values={list(node.terms)!r}{mm}", boost)]
    if isinstance(node, q.AllOf):
        return [pad + _leaf(f"AllTerms values={list(node.terms)!r}", boost)]
    if isinstance(node, q.Phrase):
        return [pad + _leaf(
            f"Phrase words={list(node.words)!r} gaps={list(node.gaps)!r}",
            boost)]
    if isinstance(node, q.PhraseSeq):
        return ([pad + _leaf(f"PhraseSeq gaps={list(node.gaps)!r}", boost)]
                + kids(node.parts))
    if isinstance(node, q.Prefix):
        return [pad + _leaf(f"Prefix value={node.prefix!r}", boost)]
    if isinstance(node, q.Wildcard):
        return [pad + _leaf(f"Wildcard pattern={node.pattern!r}", boost)]
    if isinstance(node, q.Regexp):
        return [pad + _leaf(f"Regexp pattern={node.pattern!r}", boost)]
    if isinstance(node, q.Fuzzy):
        return [pad + _leaf(
            f"Fuzzy value={node.term!r} distance={node.distance}"
            f" max_terms={node.max_terms}", boost)]
    if isinstance(node, q.Between):
        lo = "(" if not node.lo_inclusive else "["
        hi = ")" if not node.hi_inclusive else "]"
        return [pad + _leaf(
            f"Range {lo}{node.lo!r} .. {node.hi!r}{hi}", boost)]
    if isinstance(node, q.NgramSim):
        return [pad + _leaf(
            f"NgramSim value={node.text!r} threshold={node.threshold}",
            boost)]
    if isinstance(node, q.And):
        return [pad + _leaf("And", boost)] + kids(node.parts)
    if isinstance(node, q.Or):
        return [pad + _leaf("Or", boost)] + kids(node.parts)
    if isinstance(node, q.Not):
        return [pad + _leaf("Not", boost)] + render_tsquery(
            node.part, indent + 1)
    if isinstance(node, q.Compound):
        out = [pad + _leaf(
            f"Compound min_should_match={node.min_should_match}", boost)]
        for name, parts in (("must", node.must), ("should", node.should),
                            ("must_not", node.must_not)):
            if parts:
                out.append(pad + f"  {name}:")
                out.extend(kids(parts, 2))
        return out
    return [pad + repr(node)]


def explain_search(
    index_name: str,
    matches: list[tuple[str, q.TSQuery, str]],  # (field, node, analyzer)
    projections: list[str] | None = None,
    residual: str | None = None,
    scorer: str | None = None,
    scorer_params: dict | None = None,
    order: list[tuple[str, bool]] | None = None,
    limit: int | None = None,
) -> str:
    """The IRESEARCH_SCAN-analogue block: claimed filter (post-optimizer,
    i.e. what compile_query plans) split from the residual column
    filter."""
    lines = ["IRESEARCH_SCAN", f"  Index: {index_name}", "  Lookup: table"]
    if projections:
        lines.append(f"  Projections: {', '.join(projections)}")
    lines.append("  Index Filter (claimed):")
    for field, node, analyzer in matches:
        lines.append(f"    field={field} analyzer={analyzer}")
        lines.extend(render_tsquery(optimize(node), 3))
    lines.append(
        f"  Column Filter (residual): {residual}" if residual
        else "  Column Filter (residual): none")
    if scorer:
        params = ", ".join(
            f"{k}={v:g}" for k, v in (scorer_params or {}).items())
        lines.append(f"  Scorer: {scorer}" + (f" ({params})" if params else ""))
    if order:
        keys = ", ".join(f"{k} {'DESC' if d else 'ASC'}" for k, d in order)
        lines.append(f"  Order: {keys}")
    if limit is not None:
        lines.append(f"  Top-K: {limit}")
    return "\n".join(lines)


def explain_ann(n_centroids: int, n_probes: int, k: int,
                metric: str = "cosine",
                quantization: str | None = None) -> str:
    """ANN scan introspection: how many IVF partitions the probe list
    keeps vs prunes (the reference's ANN index scan stats)."""
    probes = min(n_probes, n_centroids)
    lines = [
        "ANN_SCAN",
        f"  Metric: {metric}",
        f"  Centroids: {n_centroids}",
        f"  Probes: {probes}",
        f"  Pruned partitions: {n_centroids - probes}",
        f"  Top-K: {k}",
    ]
    if quantization:
        lines.insert(2, f"  Quantization: {quantization}")
    return "\n".join(lines)
