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
        # sequence of start offsets 1..len-n+1 (1-based substr), JVM-side
        idx = F.sequence(F.lit(1), F.greatest(F.length(s) - F.lit(n - 1), F.lit(0)))
        return F.transform(idx, lambda i: s.substr(i, F.lit(n)))

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
        idx = F.sequence(
            F.lit(1), F.greatest(F.size(toks) - F.lit(k - 1), F.lit(0))
        )
        return F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
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
