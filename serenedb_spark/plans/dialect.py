"""Small SQL dialect shims — the "PG→Spark rewriter only where dialects
diverge" (SURVEY §3 lifecycle mapping).

Spark SQL lacks a QUALIFY clause (the reference inherits it from DuckDB,
site_docs/sql/query_syntax/qualify). ``rewrite_qualify`` lowers

    SELECT <cols> FROM ... QUALIFY <pred> [ORDER BY ...] [LIMIT n]

into the standard subquery form: project the window predicate as a hidden
column, filter, drop. The rewriter is a line-level transform, not a full
parser — it handles the single-statement, top-level-QUALIFY shape the
reference's tests exercise; anything else raises (fail loud, not wrong).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

def _find_top_level(s: str, words: tuple[str, ...]) -> int:
    """Index of the first top-level (paren-depth-0) occurrence of any of
    `words` (case-insensitive, word-boundary), or -1."""
    upper = s.upper()
    depth = 0
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            for w in words:
                end = i + len(w)
                if (
                    upper.startswith(w, i)
                    and (i == 0 or not upper[i - 1].isalnum())
                    and (end >= len(s) or not upper[end].isalnum())
                ):
                    return i
        i += 1
    return -1


def rewrite_qualify(sql: str) -> str:
    """Lower a top-level QUALIFY into a filtered subquery:

        SELECT <sel> FROM <rest> QUALIFY <pred> <tail>
        → SELECT * EXCEPT (__qualify__) FROM (
            SELECT <sel>, (<pred>) AS __qualify__ FROM <rest>
          ) WHERE __qualify__ <tail>

    Paren-depth-aware splitting, so ORDER BY inside an OVER (...) window
    spec is never mistaken for the trailing ORDER BY.
    """
    s = sql.strip().rstrip(";")
    qpos = _find_top_level(s, ("QUALIFY",))
    if qpos < 0:
        return sql
    head, after = s[:qpos], s[qpos + len("QUALIFY"):]
    if not re.match(r"^\s*SELECT\b", head, re.IGNORECASE):
        raise ValueError("QUALIFY shim handles a single top-level SELECT only")
    fpos = _find_top_level(head, ("FROM",))
    if fpos < 0:
        raise ValueError("QUALIFY without FROM")
    sel = head[len("SELECT"):fpos].strip()
    rest = head[fpos + len("FROM"):].strip()
    tpos = _find_top_level(after, ("ORDER", "LIMIT"))
    pred = (after if tpos < 0 else after[:tpos]).strip()
    tail = "" if tpos < 0 else after[tpos:]
    return (
        f"SELECT * EXCEPT (__qualify__) FROM ("
        f"SELECT {sel}, ({pred}) AS __qualify__ FROM {rest}"
        f") WHERE __qualify__ {tail}"
    )


def sql_compat(spark: SparkSession, sql: str) -> DataFrame:
    """Run SQL with the dialect shims applied."""
    lowered = rewrite_qualify(sql)
    return spark.sql(lowered)
