"""TSQUERY AST — the reference's custom query type re-expressed in Python.

Reference: the TSQUERY type and its leaf constructors/combinators
(server/connector/functions/search.h:31-132): ts_phrase, ts_starts_with,
ts_like, ts_regexp, ts_levenshtein, ts_ngram, ts_any/ts_all, ts_between,
ts_compound, combinators && || !! ^ (boost) ##.

These never execute as scalar functions in the reference either — they are
"optimizer-claimed stubs" compiled to an irs::Filter at plan time
(search.h:129-132). Here each node is a dataclass; two compilers consume the
AST: ``plans.planner`` (→ Spark DataFrame graph over postings) and
``plans.oracle`` (→ DuckDB SQL over naive tokenization) — the pair forms the
differential-correctness oracle (tests/fuzz/null_semantics_fuzz.py:4-8).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class TSQuery:
    """Base node. Combinators mirror the reference operators."""

    def __and__(self, other: "TSQuery") -> "TSQuery":  # &&
        return And([self, other])

    def __or__(self, other: "TSQuery") -> "TSQuery":  # ||
        return Or([self, other])

    def __invert__(self) -> "TSQuery":  # !!
        return Not(self)

    def boost(self, b: float) -> "TSQuery":  # ^
        return Boost(self, b)


@dataclass(frozen=True)
class Term(TSQuery):
    """A single analyzed token (simplest leaf)."""

    term: str


@dataclass(frozen=True)
class AnyOf(TSQuery):
    """ts_any(arr[, min_match]) — disjunction with minimum-should-match
    (reference ts_anyall.cpp)."""

    terms: tuple[str, ...]
    min_match: int = 1

    def __init__(self, terms, min_match: int = 1):
        object.__setattr__(self, "terms", tuple(terms))
        object.__setattr__(self, "min_match", min_match)


@dataclass(frozen=True)
class AllOf(TSQuery):
    """ts_all(arr) — conjunction of token matches."""

    terms: tuple[str, ...]

    def __init__(self, terms):
        object.__setattr__(self, "terms", tuple(terms))


@dataclass(frozen=True)
class Phrase(TSQuery):
    """ts_phrase(w1, [gap], w2, ...) — ordered phrase with per-gap slop
    windows (reference ts_phrase.cpp, slop_phrase.hpp).

    ``gaps[i] = (lo, hi)`` constrains ``pos(words[i+1]) - pos(words[i])`` to
    ``lo..hi`` (adjacent = (1, 1)). ``slop(n)`` sugar = every gap (1, 1+n).
    """

    words: tuple[str, ...]
    gaps: tuple[tuple[int, int], ...] = ()

    def __init__(self, words, gaps=None, slop: int = 0):
        object.__setattr__(self, "words", tuple(words))
        if gaps is None:
            gaps = tuple((1, 1 + slop) for _ in range(len(self.words) - 1))
        object.__setattr__(self, "gaps", tuple(tuple(g) for g in gaps))
        assert len(self.gaps) == max(len(self.words) - 1, 0)


@dataclass(frozen=True)
class PhraseSeq(TSQuery):
    """`##` phrase-sequence of HETEROGENEOUS parts (reference
    search.h:37-39,87; examples/demo3/demo.sql:181-205): each position of
    the phrase is itself a term-set leaf — Term, AnyOf, Prefix, Wildcard,
    Regexp, Fuzzy or Between — stitched with per-gap slop windows like
    Phrase.  A part matches at position p when ANY of its candidate terms
    occurs at p.

    ``gaps[i] = (lo, hi)`` constrains ``pos(part[i+1]) - pos(part[i])``;
    ``slop(n)`` sugar = every gap (1, 1+n), the reference's ``::slop(N)``
    modifier.  Plain strings are accepted as Term sugar.
    """

    parts: tuple[TSQuery, ...]
    gaps: tuple[tuple[int, int], ...] = ()

    def __init__(self, parts, gaps=None, slop: int = 0):
        norm = tuple(Term(p) if isinstance(p, str) else p for p in parts)
        object.__setattr__(self, "parts", norm)
        if gaps is None:
            gaps = tuple((1, 1 + slop) for _ in range(len(norm) - 1))
        object.__setattr__(self, "gaps", tuple(tuple(g) for g in gaps))
        assert len(self.gaps) == max(len(self.parts) - 1, 0)

    def with_slop(self, n: int) -> "PhraseSeq":
        """`::slop(N)` — widen every gap to (1, 1+n)."""
        return PhraseSeq(self.parts, slop=n)


def seq(*parts, gaps=None, slop: int = 0) -> PhraseSeq:
    """Sugar for the `##` operator: seq('hash', Prefix('jo')) etc."""
    return PhraseSeq(parts, gaps=gaps, slop=slop)


@dataclass(frozen=True)
class Prefix(TSQuery):
    """ts_starts_with(p) (reference ts_prefix.cpp / prefix_filter.hpp)."""

    prefix: str


@dataclass(frozen=True)
class Wildcard(TSQuery):
    """ts_like(pattern) — %/_ wildcard over tokens (wildcard_filter.hpp)."""

    pattern: str


@dataclass(frozen=True)
class Regexp(TSQuery):
    """ts_regexp(re[, syntax]) — anchored regex over whole tokens
    (regexp_filter.hpp); syntax is 'perl' (default, RE2 feature set) or
    'posix' (ERE) per irs::RegexpSyntax (regexp_utils.hpp:42-50).

    Keep patterns in the RE2 ∩ Java-regex common dialect — the Spark side
    evaluates with Java regex, the oracle with RE2.
    """

    pattern: str
    syntax: str = "perl"


@dataclass(frozen=True)
class Fuzzy(TSQuery):
    """ts_levenshtein(w[, d[, transpositions[, prefix]]]) — edit distance
    ≤ d (levenshtein_filter.hpp, ts_levenshtein.cpp ParseLevenshteinArgs).
    `transpositions` switches to Damerau distance; `prefix` matches
    exactly with the distance measured on the remainder. max_terms caps
    term expansion like SET sdb_levenshtein_max_terms."""

    term: str
    distance: int = 1
    max_terms: int = 64   # SET sdb_levenshtein_max_terms default
    #                       (search_filter_builder.cpp:2033)
    #: Damerau (adjacent-transposition) distance is the reference's
    #: DEFAULT (ts_common.hpp:242 with_transpositions = true)
    transpositions: bool = True
    prefix: str = ""


@dataclass(frozen=True)
class Between(TSQuery):
    """ts_between(lo, hi) / ts_lt/le/gt/ge — term range, analyzer-aware
    (granular_range_filter.hpp). None = unbounded; inclusive flags per end."""

    lo: str | None = None
    hi: str | None = None
    lo_inclusive: bool = True
    hi_inclusive: bool = True
    #: True when spelled ts_between(...) — the two-bound RANGE form is
    #: keyword-column-only standalone (ts_between.cpp:258), while as a
    #: ## phrase part its bounds compare against analyzed terms
    strict: bool = False


@dataclass(frozen=True)
class NgramSim(TSQuery):
    """ts_ngram(s, threshold) — n-gram similarity match
    (ngram_similarity_filter.hpp). Semantics here (documented deviation):
    |distinct shared grams| / |distinct query grams| >= threshold, using the
    field's n-gram analyzer."""

    text: str
    threshold: float


@dataclass(frozen=True)
class And(TSQuery):
    parts: tuple[TSQuery, ...]

    def __init__(self, parts):
        object.__setattr__(self, "parts", tuple(parts))


@dataclass(frozen=True)
class Or(TSQuery):
    parts: tuple[TSQuery, ...]

    def __init__(self, parts):
        object.__setattr__(self, "parts", tuple(parts))


@dataclass(frozen=True)
class Not(TSQuery):
    part: TSQuery


@dataclass(frozen=True)
class Boost(TSQuery):
    """^ operator — multiplies the subtree's score contribution."""

    part: TSQuery
    factor: float


@dataclass(frozen=True)
class Compound(TSQuery):
    """ts_compound(must, must_not, should[, min_should_match]) — the ES bool
    query (reference ts_compound.cpp)."""

    must: tuple[TSQuery, ...] = ()
    must_not: tuple[TSQuery, ...] = ()
    should: tuple[TSQuery, ...] = ()
    min_should_match: int = 0

    def __init__(self, must=(), must_not=(), should=(), min_should_match=0):
        object.__setattr__(self, "must", tuple(must))
        object.__setattr__(self, "must_not", tuple(must_not))
        object.__setattr__(self, "should", tuple(should))
        object.__setattr__(self, "min_should_match", min_should_match)


def plainto_tsquery(s: str, analyzer_name: str = "simple") -> TSQuery:
    """PG plainto_tsquery: analyze the text, AND all tokens
    (reference ts_to_tsquery.cpp family, search.h:75-80)."""
    from serenedb_spark.analysis.analyzers import get_analyzer

    toks = get_analyzer(analyzer_name).tokens(s)
    if not toks:
        return AnyOf([])  # Empty filter (null_semantics.test:459-527)
    return AllOf(toks) if len(toks) > 1 else Term(toks[0])


def phraseto_tsquery(s: str, analyzer_name: str = "simple") -> TSQuery:
    """PG phraseto_tsquery: analyze the text, match as adjacent phrase."""
    from serenedb_spark.analysis.analyzers import get_analyzer

    toks = get_analyzer(analyzer_name).tokens(s)
    if not toks:
        return AnyOf([])  # Empty filter (null_semantics.test:459-527)
    return Phrase(toks) if len(toks) > 1 else Term(toks[0])


def websearch_to_tsquery(s: str, analyzer_name: str = "simple") -> TSQuery:
    """PG websearch_to_tsquery: bare words AND-ed, "quoted phrases",
    -exclusions, literal OR between groups."""
    import re as _re

    from serenedb_spark.analysis.analyzers import get_analyzer

    an = get_analyzer(analyzer_name)
    tokens = _re.findall(r'-?"[^"]*"|\S+', s)
    groups: list[list[TSQuery]] = [[]]
    for t in tokens:
        if t == "OR":
            groups.append([])
            continue
        neg = t.startswith("-")
        if neg:
            t = t[1:]
        if t.startswith('"') and t.endswith('"'):
            toks = an.tokens(t[1:-1])
            if not toks:
                continue
            node = Phrase(toks) if len(toks) > 1 else Term(toks[0])
        else:
            toks = an.tokens(t)
            if not toks:
                continue
            node = AllOf(toks) if len(toks) > 1 else Term(toks[0])
        groups[-1].append(~node if neg else node)

    parts = []
    for g in groups:
        if not g:
            continue
        parts.append(g[0] if len(g) == 1 else And(g))
    if not parts:
        return AnyOf([])  # Empty filter (null_semantics.test:509)
    return parts[0] if len(parts) == 1 else Or(parts)


def to_tsquery(s: str) -> TSQuery:
    """Query-string parser (reference to_tsquery family, ts_to_tsquery.cpp):
    `a & b | !c`, `'quoted phrase'` / `"quoted phrase"`, `pre:*`, parens —
    plus the word forms the reference accepts (full_text_search.test
    `to_tsquery('quick AND brown')`, demo3 §2b Lucene-style
    `'"plot twist" OR "happy ending" -boring'`): AND/OR/NOT keywords and a
    leading `-` as NOT. Whitespace-separated bare words default to AND,
    PG-style.
    """
    import re as _re

    tokens = _re.findall(
        r"\(|\)|&&|\|\||&|\||!|<->|[-+](?=[\"'\w])|'[^']*'|\"[^\"]*\""
        r"|[^\s()&|!\"']+", s)
    pos = 0

    def _is_or(t: str) -> bool:
        return t in ("|", "||") or t.upper() == "OR"

    def parse_or():
        nonlocal pos
        node = parse_and()
        while pos < len(tokens) and _is_or(tokens[pos]):
            pos += 1
            node = node | parse_and()
        return node

    def parse_and():
        nonlocal pos
        node = parse_not()
        while pos < len(tokens) and tokens[pos] != ")" and not _is_or(tokens[pos]):
            if tokens[pos] in ("&", "&&") or tokens[pos].upper() == "AND":
                pos += 1
            node = node & parse_not()
        return node

    def parse_not():
        nonlocal pos
        if pos >= len(tokens):
            raise ValueError(f"tsquery syntax error: unexpected end of input in {s!r}")
        if tokens[pos] in ("!", "-") or tokens[pos].upper() == "NOT":
            pos += 1
            return ~parse_not()
        if tokens[pos] == "+":
            pos += 1  # Lucene `+must`: bare words already AND by default
        return parse_atom()

    def parse_atom():
        nonlocal pos
        t = tokens[pos]
        if t == "(":
            pos += 1
            node = parse_or()
            if pos >= len(tokens) or tokens[pos] != ")":
                raise ValueError(f"unbalanced parens in tsquery: {s!r}")
            pos += 1
            return node
        pos += 1
        if len(t) >= 2 and t[0] == t[-1] and t[0] in ("'", '"'):
            words = t[1:-1].lower().split()
            if not words:
                raise ValueError(f"empty quoted phrase in tsquery: {s!r}")
            return Phrase(words) if len(words) > 1 else Term(words[0])
        if t.endswith(":*"):
            return Prefix(t[:-2])
        if t.endswith("*") and len(t) > 1:
            return Prefix(t[:-1].lower())  # Lucene `turt*`
        return Term(t.lower())

    node = parse_or()
    if pos != len(tokens):
        raise ValueError(f"trailing tokens in tsquery: {tokens[pos:]}")
    return node
