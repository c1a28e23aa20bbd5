"""Analyzer (tokenizer) registry.

Mirrors the reference's ``CREATE TEXT SEARCH DICTIONARY`` templates
(reference: server/pg/commands/create_tsdictionary.cpp:255-776 and
server/pg/tokenizer_options.h:63-200) as a Python registry. Each analyzer
carries THREE mutually consistent representations:

  * ``expr(col)``   -> pyspark Column producing ``array<string>`` tokens.
                       JVM-side (no Python UDF) so index builds stay inside
                       whole-stage codegen at 100 TB scale.
  * ``tokens(s)``   -> pure-Python tokenization, used at query time on the
                       (tiny) query string, and by differential tests.
  * ``duckdb(sql)`` -> a DuckDB SQL fragment computing the same tokens, used
                       to state oracle queries for the correctness gate.

Keeping the three in lock-step is THE invariant: the reference enforces the
same property via its index-scan ≡ full-scan fuzz oracle
(tests/fuzz/null_semantics_fuzz.py:4-8).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small, fixed english stopword list (subset; deterministic, replicable in
# DuckDB SQL literals). The reference's `text` template uses ICU + snowball
# stopword lists; we pin an explicit list so oracles are reproducible.
ENGLISH_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)

_NON_ALNUM = "[^a-z0-9]+"


def _seq(lo: int, hi: Column) -> Column:
    """1-based index range lo..hi as a Column, EMPTY when hi < lo.

    (Plain ``F.sequence(lit(lo), hi)`` is a trap: Spark generates a
    DESCENDING sequence when hi < lo — sequence(1, 0) == [1, 0] — which
    silently produces garbage tokens for short inputs.)"""
    return F.filter(
        F.sequence(F.lit(lo), F.greatest(hi, F.lit(lo))),
        lambda i: i <= hi,
    )


@dataclass(frozen=True)
class Analyzer:
    """One named tokenizer pipeline (reference: server/catalog/tokenizer.h:48)."""

    name: str
    _expr: Callable[[Column], Column]
    _py: Callable[[str], list[str]]
    _duckdb: Callable[[str], str]
    # feature flags mirroring tokenizer_options.h:63-77
    features: tuple[str, ...] = ("frequency", "position")

    def expr(self, col: Column) -> Column:
        """tokens as a JVM-side array<string> expression."""
        return self._expr(col)

    def tokens(self, s: str) -> list[str]:
        """Python tokenization of a query string."""
        if s is None:
            return []
        return self._py(s)

    def duckdb(self, sql_expr: str) -> str:
        """DuckDB SQL fragment producing the same token array."""
        return self._duckdb(sql_expr)


def _simple_expr(col: Column) -> Column:
    toks = F.split(F.lower(col), _NON_ALNUM)
    return F.filter(toks, lambda t: t != F.lit(""))


def _simple_py(s: str) -> list[str]:
    return [t for t in re.split(_NON_ALNUM, s.lower()) if t]


def _simple_duckdb(e: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({e}), '{_NON_ALNUM}'),"
        " t -> t <> '')"
    )


def _keyword_expr(col: Column) -> Column:
    return F.when(col.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.array(col.cast("string"))
    )


def _keyword_py(s: str) -> list[str]:
    return [str(s)]


def _keyword_duckdb(e: str) -> str:
    return f"CASE WHEN {e} IS NULL THEN NULL ELSE [CAST({e} AS VARCHAR)] END"


_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS) + "]"


def _text_expr(col: Column) -> Column:
    stop = F.array(*[F.lit(w) for w in ENGLISH_STOPWORDS])
    return F.filter(_simple_expr(col), lambda t: ~F.array_contains(stop, t))


def _text_py(s: str) -> list[str]:
    stop = set(ENGLISH_STOPWORDS)
    return [t for t in _simple_py(s) if t not in stop]


def _text_duckdb(e: str) -> str:
    return (
        f"list_filter({_simple_duckdb(e)},"
        f" t -> NOT list_contains({_STOP_SQL}, t))"
    )


def _ngram(n: int):
    """Character n-grams over the lowercased raw string (reference `ngram`
    template, create_tsdictionary.cpp:443; mingram=maxgram=n)."""

    def expr(col: Column) -> Column:
        s = F.lower(col)
        # start offsets 1..len-n+1 (1-based substr), JVM-side
        return F.transform(
            _seq(1, F.length(s) - F.lit(n - 1)), lambda i: s.substr(i, F.lit(n))
        )

    def py(s: str) -> list[str]:
        s = s.lower()
        return [s[i : i + n] for i in range(len(s) - n + 1)]

    def duck(e: str) -> str:
        return (
            f"list_transform(range(1, greatest(length(lower({e})) - {n - 1}, 0) + 1),"
            f" i -> substr(lower({e}), i, {n}))"
        )

    return expr, py, duck


def _shingle(k: int):
    """Word k-shingles over simple tokens — the MinHash/near-dup unit."""

    def expr(col: Column) -> Column:
        toks = _simple_expr(col)
        return F.transform(
            _seq(1, F.size(toks) - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        )

    def py(s: str) -> list[str]:
        toks = _simple_py(s)
        return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]

    def duck(e: str) -> str:
        t = _simple_duckdb(e)
        return (
            f"list_transform(range(1, greatest(len({t}) - {k - 1}, 0) + 1),"
            f" i -> array_to_string(list_slice({t}, i, i + {k - 1}), ' '))"
        )

    return expr, py, duck


_REGISTRY: dict[str, Analyzer] = {}


def register(a: Analyzer) -> Analyzer:
    _REGISTRY[a.name] = a
    return a


def get_analyzer(name: str) -> Analyzer:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown analyzer {name!r}; known: {sorted(_REGISTRY)}"
        ) from None


def analyzers() -> dict[str, Analyzer]:
    return dict(_REGISTRY)


def _delimiter(delim: str):
    """Split on a literal delimiter (reference `delimiter` template,
    create_tsdictionary.cpp:364). Empty tokens are kept out, case kept."""
    import re as _re

    def expr(col: Column) -> Column:
        return F.filter(
            F.split(col, _re.escape(delim)), lambda t: t != F.lit("")
        )

    def py(s: str) -> list[str]:
        return [t for t in s.split(delim) if t]

    def duck(e: str) -> str:
        d = delim.replace("'", "''")
        return f"list_filter(string_split({e}, '{d}'), t -> t <> '')"

    return expr, py, duck


def _pattern(pat: str):
    """Split on a regex (reference `pattern`/`multi_delimiter` templates,
    create_tsdictionary.cpp:381-401). Pattern must be in the
    Java-regex ∩ RE2 common dialect."""
    import re as _re

    rx = _re.compile(pat)

    def expr(col: Column) -> Column:
        return F.filter(F.split(col, pat), lambda t: t != F.lit(""))

    def py(s: str) -> list[str]:
        return [t for t in rx.split(s) if t]

    def duck(e: str) -> str:
        p = pat.replace("'", "''")
        return f"list_filter(regexp_split_to_array({e}, '{p}'), t -> t <> '')"

    return expr, py, duck


def _path_hierarchy(sep: str = "/"):
    """Prefix-path tokens: /a/b/c → [/a, /a/b, /a/b/c] (reference
    `path_hierarchy` template, create_tsdictionary.cpp:420)."""

    def py(s: str) -> list[str]:
        parts = [p for p in s.split(sep) if p]
        return [sep + sep.join(parts[: i + 1]) for i in range(len(parts))]

    def expr(col: Column) -> Column:
        parts = F.filter(F.split(col, sep), lambda t: t != F.lit(""))
        return F.transform(
            _seq(1, F.size(parts)),
            lambda i: F.concat(F.lit(sep), F.array_join(F.slice(parts, 1, i), sep)),
        )

    def duck(e: str) -> str:
        return (
            f"list_transform(range(1, greatest(len(list_filter(string_split({e}, '{sep}'), t -> t <> '')), 0) + 1),"
            f" i -> '{sep}' || array_to_string(list_filter(string_split({e}, '{sep}'), t -> t <> '')[1:i], '{sep}'))"
        )

    return expr, py, duck


def _edge_ngram(min_n: int, max_n: int):
    """Edge n-grams of the lowercased string: prefixes of length
    min_n..max_n (the reference ngram template's preserve-prefix mode,
    tokenizer_options.h mingram/maxgram)."""

    def expr(col: Column) -> Column:
        s = F.lower(col)
        out = F.transform(
            _seq(min_n, F.least(F.length(s), F.lit(max_n))),
            lambda n: s.substr(F.lit(1), n),
        )
        # least() skips NULLs, so guard explicitly: NULL in → NULL out
        return F.when(col.isNull(), F.lit(None).cast("array<string>")).otherwise(out)

    def py(s: str) -> list[str]:
        s = s.lower()
        return [s[:n] for n in range(min_n, min(len(s), max_n) + 1)]

    def duck(e: str) -> str:
        lo = f"lower({e})"
        return (
            f"list_filter(list_transform(range({min_n},"
            f" greatest(least(length({lo}), {max_n}), {min_n - 1}) + 1),"
            f" n -> substr({lo}, 1, n)), t -> length(t) >= {min_n})"
        )

    return expr, py, duck


register(Analyzer("keyword", _keyword_expr, _keyword_py, _keyword_duckdb,
                  features=("frequency",)))
register(Analyzer("simple", _simple_expr, _simple_py, _simple_duckdb))
register(Analyzer("text", _text_expr, _text_py, _text_duckdb))
for _n in (2, 3, 4):
    _e, _p, _d = _ngram(_n)
    register(Analyzer(f"ngram{_n}", _e, _p, _d, features=("frequency",)))
for _k in (2, 3, 5):
    _e, _p, _d = _shingle(_k)
    register(Analyzer(f"shingle{_k}", _e, _p, _d, features=("frequency",)))
_e, _p, _d = _delimiter(",")
register(Analyzer("delimiter_comma", _e, _p, _d, features=("frequency", "position")))
_e, _p, _d = _pattern("[,;|]+")
register(Analyzer("multi_delimiter", _e, _p, _d, features=("frequency", "position")))
_e, _p, _d = _path_hierarchy("/")
register(Analyzer("path_hierarchy", _e, _p, _d, features=("frequency",)))
_e, _p, _d = _edge_ngram(2, 6)
register(Analyzer("edge_ngram", _e, _p, _d, features=("frequency",)))


def make_synonyms(name: str, mapping: dict[str, tuple[str, ...]],
                  base: str = "simple") -> Analyzer:
    """Synonym expansion over a base tokenizer (reference solr_synonyms /
    wordnet_synonyms templates, create_tsdictionary.cpp:561-578): each
    token expands to itself + its synonyms, in mapping order."""
    b = get_analyzer(base)
    items = sorted(mapping.items())

    def expr(col: Column) -> Column:
        toks = b.expr(col)
        out = F.transform(toks, lambda t: F.array(t))
        for w, syns in items:
            add = F.array(*[F.lit(s) for s in syns])
            out = F.zip_with(
                out, toks,
                lambda acc, t: F.when(t == F.lit(w), F.concat(acc, add))
                .otherwise(acc),
            )
        return F.flatten(out)

    def py(s: str) -> list[str]:
        out = []
        for t in b.tokens(s):
            out.append(t)
            out.extend(mapping.get(t, ()))
        return out

    def duck(e: str) -> str:
        inner = b.duckdb(e)
        cell = "[t]"
        for w, syns in items:
            lits = ", ".join("'" + s.replace("'", "''") + "'" for s in syns)
            cell = f"CASE WHEN t = '{w}' THEN {cell} || [{lits}] ELSE {cell} END"
        return f"flatten(list_transform({inner}, t -> {cell}))"

    return register(Analyzer(name, expr, py, duck, features=("frequency",)))


def make_union(name: str, parts: tuple[str, ...]) -> Analyzer:
    """`union` template (create_tsdictionary.cpp:697): run several
    analyzers, concatenate their token streams."""
    ans = [get_analyzer(p) for p in parts]

    def expr(col: Column) -> Column:
        out = ans[0].expr(col)
        for a in ans[1:]:
            out = F.concat(out, a.expr(col))
        return out

    def py(s: str) -> list[str]:
        out = []
        for a in ans:
            out.extend(a.tokens(s))
        return out

    def duck(e: str) -> str:
        return " || ".join(a.duckdb(e) for a in ans)

    return register(Analyzer(name, expr, py, duck, features=("frequency",)))


# a worked example mirroring the reference's synonym demo shape
make_synonyms("synonyms_demo", {
    "fast": ("quick", "rapid"),
    "big": ("large",),
})
make_union("union_demo", ("simple", "ngram3"))
