"""TSQUERY → DuckDB-SQL compiler (the differential-correctness oracle).

The reference's most valuable test idea is the index-scan ≡ full-scan
differential oracle (tests/fuzz/null_semantics_fuzz.py:4-8). We reproduce it
as a *second backend* for the same AST: naive tokenization + list lambdas in
DuckDB SQL. The driver's t2 gate runs these strings directly.

NULL semantics: the emitted WHERE is ``toks IS NOT NULL AND (<frag>)`` —
``col @@ q`` is NULL for NULL col, so the row never qualifies, matching the
planner's universe/anti-join treatment. Inside the guard everything is
2-valued.

Scoring: ``scored_sql`` emits the full CTE pipeline (tokenize → postings →
stats → contributions) mirroring operators/scoring.py symbol-for-symbol.
"""

from __future__ import annotations

import math

from serenedb_spark.analysis.analyzers import Analyzer, get_analyzer
from serenedb_spark.plans import tsquery as q


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def match_fragment(node: q.TSQuery, toks: str = "toks") -> str:
    """Boolean SQL fragment over a token-array column (non-null assumed)."""
    if isinstance(node, q.Term):
        return f"list_contains({toks}, {_sq(node.term)})"

    if isinstance(node, q.AnyOf):
        terms = ", ".join(_sq(t) for t in dict.fromkeys(node.terms))
        return (
            f"len(list_filter([{terms}], t -> list_contains({toks}, t)))"
            f" >= {node.min_match}"
        )

    if isinstance(node, q.AllOf):
        terms = ", ".join(_sq(t) for t in dict.fromkeys(node.terms))
        return f"list_has_all({toks}, [{terms}])"

    if isinstance(node, q.Phrase):
        return _phrase_fragment(node, toks)

    if isinstance(node, q.PhraseSeq):
        return _phrase_seq_fragment(node, toks)

    if isinstance(node, q.Prefix):
        return (
            f"len(list_filter({toks}, t -> t LIKE {_sq(node.prefix + '%')}))"
            " > 0"
        )

    if isinstance(node, q.Wildcard):
        return f"len(list_filter({toks}, t -> t LIKE {_sq(node.pattern)})) > 0"

    if isinstance(node, q.Regexp):
        return (
            f"len(list_filter({toks},"
            f" t -> regexp_full_match(t, {_sq(node.pattern)}))) > 0"
        )

    if isinstance(node, q.Fuzzy):
        w, d = node.term, node.distance
        fn = ("damerau_levenshtein"
              if getattr(node, "transpositions", True) else "levenshtein")
        pre = ""
        if getattr(node, "prefix", ""):
            p = node.prefix
            pre = (f" AND starts_with(t, {_sq(p)})")
            return (
                f"len(list_filter({toks}, t ->"
                f" abs(length(t) - {len(p) + len(w)}) <= {d}{pre}"
                f" AND {fn}(t[{len(p) + 1}:], {_sq(w)}) <= {d})) > 0"
            )
        return (
            f"len(list_filter({toks}, t -> abs(length(t) - {len(w)}) <= {d}"
            f" AND {fn}(t, {_sq(w)}) <= {d})) > 0"
        )

    if isinstance(node, q.Between):
        conds = []
        if node.lo is not None:
            op = ">=" if node.lo_inclusive else ">"
            conds.append(f"t {op} {_sq(node.lo)}")
        if node.hi is not None:
            op = "<=" if node.hi_inclusive else "<"
            conds.append(f"t {op} {_sq(node.hi)}")
        cond = " AND ".join(conds) or "TRUE"
        return f"len(list_filter({toks}, t -> {cond})) > 0"

    if isinstance(node, q.NgramSim):
        raise ValueError(
            "NgramSim needs the field analyzer — use ngram_sim_fragment()"
        )

    if isinstance(node, q.And):
        return "(" + " AND ".join(match_fragment(p, toks) for p in node.parts) + ")"

    if isinstance(node, q.Or):
        return "(" + " OR ".join(match_fragment(p, toks) for p in node.parts) + ")"

    if isinstance(node, q.Not):
        return f"(NOT {match_fragment(node.part, toks)})"

    if isinstance(node, q.Boost):
        return match_fragment(node.part, toks)

    if isinstance(node, q.Compound):
        parts = []
        for m in node.must:
            parts.append(match_fragment(m, toks))
        for mn in node.must_not:
            parts.append(f"(NOT {match_fragment(mn, toks)})")
        if node.should:
            shoulds = " + ".join(
                f"(CASE WHEN {match_fragment(s, toks)} THEN 1 ELSE 0 END)"
                for s in node.should
            )
            msm = node.min_should_match
            if not node.must:
                msm = max(msm, 1)
            if msm > 0:
                parts.append(f"({shoulds}) >= {msm}")
        return "(" + " AND ".join(parts) + ")" if parts else "TRUE"

    raise TypeError(f"unsupported node for oracle: {node!r}")


def ngram_sim_fragment(node: q.NgramSim, analyzer: Analyzer, toks: str = "toks") -> str:
    grams = list(dict.fromkeys(analyzer.tokens(node.text)))
    need = math.ceil(node.threshold * len(grams))
    lits = ", ".join(_sq(g) for g in grams)
    return f"len(list_intersect(list_distinct({toks}), [{lits}])) >= {need}"


def _phrase_fragment(ph: q.Phrase, toks: str) -> str:
    words = ph.words
    if len(words) == 1:
        return f"list_contains({toks}, {_sq(words[0])})"
    if all(g == (1, 1) for g in ph.gaps):
        # contiguous fast form: ∃ i: toks[i]=w0 ∧ toks[i+1]=w1 ∧ …
        n = len(words)
        conds = " AND ".join(
            f"{toks}[i + {j}] = {_sq(w)}" for j, w in enumerate(words)
        )
        return (
            f"len(list_filter(range(1, len({toks}) - {n - 2}),"
            f" i -> {conds})) > 0"
        )
    # general slop fold, mirrors planner._compile_phrase
    def positions(w: str) -> str:
        return f"list_filter(range(1, len({toks}) + 1), i -> {toks}[i] = {_sq(w)})"

    valid = positions(words[0])
    for i in range(1, len(words)):
        lo, hi = ph.gaps[i - 1]
        valid = (
            f"list_filter({positions(words[i])},"
            f" p -> len(list_filter({valid},"
            f" v -> p - v BETWEEN {lo} AND {hi})) > 0)"
        )
    return f"len({valid}) > 0"


def _seq_part_token_pred(part: q.TSQuery, t: str) -> str:
    """Boolean SQL over one token expression `t` — the per-position member
    test for a heterogeneous phrase part (mirrors planner._seq_part_positions
    candidate-term semantics)."""
    if isinstance(part, q.Term):
        return f"{t} = {_sq(part.term)}"
    if isinstance(part, q.AnyOf):
        terms = ", ".join(_sq(x) for x in dict.fromkeys(part.terms))
        return f"list_contains([{terms}], {t})"
    if isinstance(part, q.Prefix):
        return f"{t} LIKE {_sq(part.prefix + '%')}"
    if isinstance(part, q.Wildcard):
        return f"{t} LIKE {_sq(part.pattern)}"
    if isinstance(part, q.Regexp):
        return f"regexp_full_match({t}, {_sq(part.pattern)})"
    if isinstance(part, q.Fuzzy):
        w, d = part.term, part.distance
        fn = ("damerau_levenshtein"
              if getattr(part, "transpositions", True) else "levenshtein")
        return (
            f"(abs(length({t}) - {len(w)}) <= {d}"
            f" AND {fn}({t}, {_sq(w)}) <= {d})"
        )
    if isinstance(part, q.Between):
        conds = []
        if part.lo is not None:
            conds.append(f"{t} {'>=' if part.lo_inclusive else '>'} {_sq(part.lo)}")
        if part.hi is not None:
            conds.append(f"{t} {'<=' if part.hi_inclusive else '<'} {_sq(part.hi)}")
        return "(" + (" AND ".join(conds) or "TRUE") + ")"
    raise TypeError(f"unsupported phrase-sequence part: {part!r}")


def _phrase_seq_fragment(ph: q.PhraseSeq, toks: str) -> str:
    """Same positional slop fold as _phrase_fragment, with each word
    membership generalized to the part's token predicate."""

    def positions(part: q.TSQuery) -> str:
        pred = _seq_part_token_pred(part, f"{toks}[i]")
        return f"list_filter(range(1, len({toks}) + 1), i -> {pred})"

    parts = ph.parts
    if len(parts) == 1:
        return f"len({positions(parts[0])}) > 0"
    valid = positions(parts[0])
    for i in range(1, len(parts)):
        lo, hi = ph.gaps[i - 1]
        valid = (
            f"list_filter({positions(parts[i])},"
            f" p -> len(list_filter({valid},"
            f" v -> p - v BETWEEN {lo} AND {hi})) > 0)"
        )
    return f"len({valid}) > 0"


def _collect_score_terms(node: q.TSQuery, analyzer: Analyzer, boost: float = 1.0):
    """(kind, payload, boost) triples for positive leaves — mirrors
    planner score_terms. kind ∈ {'terms','prefix','wildcard','regexp',
    'fuzzy','between'}."""
    if isinstance(node, q.Term):
        return [("terms", [node.term], boost)]
    if isinstance(node, (q.AnyOf, q.AllOf)):
        return [("terms", list(dict.fromkeys(node.terms)), boost)]
    if isinstance(node, q.Phrase):
        return [("terms", list(dict.fromkeys(node.words)), boost)]
    if isinstance(node, q.PhraseSeq):
        out = []
        for p in node.parts:
            out += _collect_score_terms(p, analyzer, boost)
        return out
    if isinstance(node, q.NgramSim):
        return [("terms", list(dict.fromkeys(analyzer.tokens(node.text))), boost)]
    if isinstance(node, q.Prefix):
        return [("prefix", node.prefix, boost)]
    if isinstance(node, q.Wildcard):
        return [("wildcard", node.pattern, boost)]
    if isinstance(node, q.Regexp):
        return [("regexp", node.pattern, boost)]
    if isinstance(node, q.Fuzzy):
        return [("fuzzy", (node.term, node.distance), boost)]
    if isinstance(node, q.Between):
        return [("between", node, boost)]
    if isinstance(node, (q.And, q.Or)):
        out = []
        for p in node.parts:
            out += _collect_score_terms(p, analyzer, boost)
        return out
    if isinstance(node, q.Not):
        return []
    if isinstance(node, q.Boost):
        return _collect_score_terms(node.part, analyzer, boost * node.factor)
    if isinstance(node, q.Compound):
        out = []
        for p in list(node.must) + list(node.should):
            out += _collect_score_terms(p, analyzer, boost)
        return out
    raise TypeError(f"unsupported node: {node!r}")


def _qterms_sql(node: q.TSQuery, analyzer: Analyzer) -> str:
    """SQL producing (term, boost) for all positive leaves; expansion leaves
    select from the tstats term dictionary, mirroring planner._expand."""
    selects = []
    for kind, payload, boost in _collect_score_terms(node, analyzer):
        if kind == "terms":
            for t in payload:
                selects.append(f"SELECT {_sq(t)} AS term, {boost!r} AS boost")
        elif kind == "prefix":
            selects.append(
                f"SELECT term, {boost!r} AS boost FROM tstats"
                f" WHERE term LIKE {_sq(payload + '%')}"
            )
        elif kind == "wildcard":
            selects.append(
                f"SELECT term, {boost!r} AS boost FROM tstats"
                f" WHERE term LIKE {_sq(payload)}"
            )
        elif kind == "regexp":
            selects.append(
                f"SELECT term, {boost!r} AS boost FROM tstats"
                f" WHERE regexp_full_match(term, {_sq(payload)})"
            )
        elif kind == "fuzzy":
            w, d = payload
            selects.append(
                f"SELECT term, {boost!r} AS boost FROM tstats"
                f" WHERE abs(length(term) - {len(w)}) <= {d}"
                f" AND levenshtein(term, {_sq(w)}) <= {d}"
            )
        elif kind == "between":
            b: q.Between = payload
            conds = []
            if b.lo is not None:
                conds.append(f"term {'>=' if b.lo_inclusive else '>'} {_sq(b.lo)}")
            if b.hi is not None:
                conds.append(f"term {'<=' if b.hi_inclusive else '<'} {_sq(b.hi)}")
            selects.append(
                f"SELECT term, {boost!r} AS boost FROM tstats"
                f" WHERE {' AND '.join(conds) or 'TRUE'}"
            )
    body = " UNION ALL ".join(selects)
    return f"SELECT term, max(boost) AS boost FROM ({body}) GROUP BY term"


_SCORE_EXPRS = {
    "bm25": (
        "ln(1.0 + (g.n_docs - s.df + 0.5) / (s.df + 0.5))"
        " * (p.freq * {k1_plus_1}) / (p.freq + {k1} *"
        " (1.0 - {b} + {b} * d.dl / g.avgdl))"
    ),
    "tfidf": "sqrt(p.freq) * ln(1.0 + (g.n_docs + 1.0) / (s.df + 1.0))",
    "raw_tf": "p.freq",
    # Zhai-Lafferty Dirichlet smoothing, dl-penalty folded per term —
    # mirrors operators/scoring.py::_lm_dirichlet_contrib symbol-for-symbol
    "lm_dirichlet": (
        "greatest(ln(1.0 + p.freq / ({mu} *"
        " ((s.ctf + 1.0) / (g.total_dl + 1.0))))"
        " + ln({mu} / (d.dl + {mu})) / (SELECT count(*) FROM qterms), 0.0)"
    ),
    "lm_jm": (
        "ln(1.0 + ((1.0 - {lam}) * (p.freq / d.dl))"
        " / ({lam} * ((s.ctf + 1.0) / (g.total_dl + 1.0))))"
    ),
    "dfi": (
        "CASE WHEN p.freq > s.ctf * d.dl / g.total_dl THEN"
        " ln(1.0 + (p.freq - s.ctf * d.dl / g.total_dl)"
        " / sqrt(s.ctf * d.dl / g.total_dl)) ELSE 0.0 END"
    ),
    "indri_dirichlet": (
        "ln((p.freq + {mu} * ((s.ctf + 1.0) / (g.total_dl + 1.0)))"
        " / (d.dl + {mu}))"
    ),
    "raw_dl": "d.dl",
    # frequency-independent: contribution is the boost alone (×q.boost in
    # the contrib select supplies it)
    "raw_boost": "1.0",
}


def match_sql(
    table: str,
    column: str,
    analyzer: str,
    node: q.TSQuery,
    select: str = "doc_id",
    key: str = "doc_id",
    order: str | None = None,
) -> str:
    """Full DuckDB query: unscored match returning `select` columns."""
    an = get_analyzer(analyzer)
    toks_expr = an.duckdb(column)
    if isinstance(node, q.NgramSim):
        frag = ngram_sim_fragment(node, an)
    else:
        frag = match_fragment(node)
    order_clause = f" ORDER BY {order}" if order else ""
    return (
        f"SELECT {select} FROM (SELECT *, {toks_expr} AS toks FROM {table})"
        f" WHERE toks IS NOT NULL AND ({frag}){order_clause}"
    )


def scored_sql(
    table: str,
    column: str,
    analyzer: str,
    node: q.TSQuery,
    scorer: str = "bm25",
    k: int | None = 10,
    select: str = "m.doc_id AS doc_id",
    key: str = "doc_id",
    round_to: int = 4,
    k1: float = 1.2,
    b: float = 0.75,
    mu: float = 2000.0,
    lam: float = 0.1,
) -> str:
    """Full DuckDB query mirroring SereneSession.search(): matched docs +
    rounded score, ordered by (score desc, key), optional LIMIT."""
    an = get_analyzer(analyzer)
    toks_expr = an.duckdb(column)
    frag = (
        ngram_sim_fragment(node, an)
        if isinstance(node, q.NgramSim)
        else match_fragment(node)
    )
    qterms = _qterms_sql(node, an)
    score_expr = _SCORE_EXPRS[scorer].format(
        k1=k1, b=b, k1_plus_1=k1 + 1.0, mu=mu, lam=lam
    )
    agg_fn = "max" if scorer == "raw_dl" else "sum"
    limit = f" LIMIT {k}" if k is not None else ""
    return f"""
WITH base AS (SELECT *, {toks_expr} AS toks FROM {table}),
tok AS (SELECT {key} AS doc_id, unnest(toks) AS term FROM base),
postings AS (SELECT doc_id, term, count(*)::INT AS freq FROM tok GROUP BY 1, 2),
tstats AS (SELECT term, count(*) AS df, sum(freq) AS ctf FROM postings GROUP BY 1),
dstats AS (SELECT {key} AS doc_id, len(toks) AS dl FROM base WHERE toks IS NOT NULL),
g AS (SELECT count(*) AS n_docs,
             (SELECT coalesce(sum(len(toks)), 0) FROM base)::DOUBLE / count(*) AS avgdl,
             (SELECT coalesce(sum(len(toks)), 0) FROM base)::DOUBLE AS total_dl
      FROM base),
qterms AS ({qterms}),
matched AS (SELECT {key} AS doc_id FROM base WHERE toks IS NOT NULL AND ({frag})),
contrib AS (
  SELECT p.doc_id, {agg_fn}(({score_expr}) * q.boost) AS raw_score
  FROM postings p
  JOIN qterms q USING (term)
  JOIN tstats s USING (term)
  JOIN dstats d ON d.doc_id = p.doc_id
  CROSS JOIN g
  GROUP BY p.doc_id
)
SELECT {select}, round(coalesce(c.raw_score, 0.0), {round_to}) AS score
FROM matched m
JOIN base bb ON bb.{key} = m.doc_id
LEFT JOIN contrib c ON c.doc_id = m.doc_id
ORDER BY score DESC, m.doc_id{limit}
"""
