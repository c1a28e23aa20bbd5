"""Enum definition-order semantics over constrained-string columns.

Reference: PG/DuckDB enum types order values by DECLARATION position,
not lexicographically (tests/sqllogic/any/pg/ddl/enum.test: `illness >
'panicataka'`, `ORDER BY illness`, `MIN(illness)` all follow the CREATE
TYPE label order). The engine stores enum columns as plain strings (a
Spark-native layout: dictionary-encoded in parquet, whole-stage-codegen
comparable), so definition order is restored by a TOKEN-LEVEL REWRITE of
the SQL text before Catalyst sees it:

  * ``col <op> 'label'``    →  ``array_position(labels, col) <op> k``
  * ``col BETWEEN 'a' AND 'b'`` → positions on both sides
  * ``ORDER BY col``        →  ``ORDER BY array_position(labels, col)``
  * ``MIN(col)`` / ``MAX``  →  ``min_by(col, position)`` / ``max_by``
  * ``'x'::etype``          →  the label, remembering its enum for a
                                following comparison ('low'::priority <
                                'high'::priority compares positions)
  * ``'x'::ENUM (...)``     →  the label (inline anonymous enum cast)

Everything else (equality, IN, CASE WHEN, GROUP BY, joins) already has
the right semantics on the label strings and passes through untouched.
The rewrite emits pure built-in expressions — no UDF, the plan stays
inside whole-stage codegen and the filter remains pushdown-eligible.
"""

from __future__ import annotations

from serenedb_spark.plans.search_sql import Tok, _render, tokenize

_CMP = {"<", ">", "<=", ">="}


def _labels_sql(labels: list[str]) -> str:
    quoted = ", ".join("'" + x.replace("'", "''") + "'" for x in labels)
    return f"array({quoted})"


def _pos_expr(labels: list[str], operand: str) -> str:
    return f"array_position({_labels_sql(labels)}, {operand})"


def _ordinal(labels: list[str], label: str) -> int:
    if label not in labels:
        raise ValueError(
            f'invalid input value for enum: "{label}"')
    return labels.index(label) + 1


class _Item:
    """A token plus the enum labels it is bound to (enum column refs and
    enum-cast literals carry their label list through the passes)."""

    __slots__ = ("tok", "labels")

    def __init__(self, tok: Tok, labels: list[str] | None = None):
        self.tok = tok
        self.labels = labels


def rewrite_enums(q: str, enum_cols: dict[str, list[str]],
                  enum_types: dict[str, list[str]]) -> str:
    """`enum_cols` maps a bare column name → its labels; `enum_types`
    maps a type name → labels (for ::casts). Returns rewritten SQL."""
    if not enum_cols and not enum_types:
        return q
    low = q.lower()
    if not (any(c.lower() in low for c in enum_cols)
            or "::" in q):
        return q
    try:
        toks = tokenize(q.strip().rstrip(";"))
    except ValueError:
        return q

    def col_labels(tok: Tok) -> list[str] | None:
        if tok.kind != "IDENT":
            return None
        name = tok.text.split(".")[-1].lower()
        return enum_cols.get(name)

    # ---- pass A: casts --------------------------------------------------
    items: list[_Item] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if (t.kind == "STR" and i + 2 < len(toks)
                and toks[i + 1].text == "::"):
            nxt = toks[i + 2]
            if nxt.kind == "IDENT" and nxt.upper == "ENUM" \
                    and i + 3 < len(toks) and toks[i + 3].text == "(":
                # 'x'::ENUM ('a','b',...) → the label, bound to the
                # inline label list
                labs, j = [], i + 4
                while j < len(toks) and toks[j].text != ")":
                    if toks[j].kind == "STR":
                        labs.append(toks[j].text[1:-1].replace("''", "'"))
                    j += 1
                items.append(_Item(t, labs))
                i = j + 1
                continue
            tyname = nxt.text if nxt.text in enum_types \
                else nxt.text.lower()
            if tyname in enum_types:
                items.append(_Item(t, enum_types[tyname]))
                i += 3
                continue
        labels = col_labels(t)
        items.append(_Item(t, labels))
        i += 1

    # ---- pass B: MIN/MAX over enum columns ------------------------------
    out: list[_Item] = []
    i = 0
    while i < len(items):
        it = items[i]
        if (it.tok.kind == "IDENT" and it.tok.upper in ("MIN", "MAX")
                and i + 3 < len(items) and items[i + 1].tok.text == "("
                and items[i + 2].labels is not None
                and items[i + 2].tok.kind == "IDENT"
                and items[i + 3].tok.text == ")"):
            colsql = items[i + 2].tok.text
            fn = "min_by" if it.tok.upper == "MIN" else "max_by"
            repl = (f"{fn}({colsql}, "
                    f"{_pos_expr(items[i + 2].labels, colsql)})")
            nxt = items[i + 4].tok if i + 4 < len(items) else None
            if nxt is None or nxt.upper != "AS":
                # PG titles the unaliased aggregate by its function name
                repl += f" AS {it.tok.text.lower()}"
            out.append(_Item(Tok("IDENT", repl)))
            i += 4
            continue
        out.append(it)
        i += 1
    items = out

    # ---- pass C: comparisons and BETWEEN ---------------------------------
    out = []
    i = 0
    while i < len(items):
        it = items[i]
        nx = items[i + 1] if i + 1 < len(items) else None
        n2 = items[i + 2] if i + 2 < len(items) else None
        n3 = items[i + 3] if i + 3 < len(items) else None
        n4 = items[i + 4] if i + 4 < len(items) else None
        # col BETWEEN 'a' AND 'b'
        if (it.labels is not None and nx is not None
                and nx.tok.upper == "BETWEEN"
                and n2 is not None and n2.tok.kind == "STR"
                and n3 is not None and n3.tok.upper == "AND"
                and n4 is not None and n4.tok.kind == "STR"):
            labs = it.labels
            operand = (it.tok.text if it.tok.kind == "IDENT"
                       else it.tok.text)
            lo = _ordinal(labs, n2.tok.text[1:-1].replace("''", "'"))
            hi = _ordinal(labs, n4.tok.text[1:-1].replace("''", "'"))
            out.append(_Item(Tok(
                "IDENT",
                f"{_pos_expr(labs, operand)} BETWEEN {lo} AND {hi}")))
            i += 5
            continue
        # operand <op> operand with an enum on at least one side
        if (nx is not None and nx.tok.text in _CMP and n2 is not None
                and (it.labels is not None or n2.labels is not None)
                and it.tok.kind in ("IDENT", "STR")
                and n2.tok.kind in ("IDENT", "STR")):
            labs = it.labels or n2.labels
            sides = []
            for side in (it, n2):
                if side.tok.kind == "STR":
                    lab = side.tok.text[1:-1].replace("''", "'")
                    sides.append(str(_ordinal(labs, lab)))
                else:
                    sides.append(_pos_expr(labs, side.tok.text))
            out.append(_Item(Tok(
                "IDENT", f"{sides[0]} {nx.tok.text} {sides[1]}")))
            i += 3
            continue
        out.append(it)
        i += 1
    items = out

    # ---- pass D: ORDER BY items ------------------------------------------
    out = []
    i = 0
    while i < len(items):
        it = items[i]
        out.append(it)
        if (it.tok.kind == "IDENT" and it.tok.upper == "ORDER"
                and i + 1 < len(items)
                and items[i + 1].tok.upper == "BY"):
            out.append(items[i + 1])
            j = i + 2
            depth = 0
            while j < len(items):
                cur = items[j]
                txt = cur.tok.text
                up = cur.tok.upper if cur.tok.kind == "IDENT" else ""
                if txt == "(":
                    depth += 1
                elif txt == ")":
                    if depth == 0:
                        break
                    depth -= 1
                elif depth == 0 and up in ("LIMIT", "OFFSET", "FETCH",
                                           "UNION", "INTERSECT",
                                           "EXCEPT"):
                    break
                if (depth == 0 and cur.labels is not None
                        and cur.tok.kind == "IDENT"
                        and _is_bare_order_item(items, j)):
                    out.append(_Item(Tok(
                        "IDENT", _pos_expr(cur.labels, cur.tok.text))))
                else:
                    out.append(cur)
                j += 1
            i = j
            continue
        i += 1
    items = out

    return _render([it.tok for it in items])


def _is_bare_order_item(items: list[_Item], j: int) -> bool:
    """True when items[j] is a whole ORDER BY item by itself (previous
    token is BY or ',', next is ',' / ASC / DESC / NULLS / LIMIT / end) —
    an enum column inside a bigger expression is left alone."""
    prev = items[j - 1].tok if j > 0 else None
    if prev is not None and not (prev.text == ","
                                 or prev.upper in ("BY",)):
        return False
    nxt = items[j + 1].tok if j + 1 < len(items) else None
    if nxt is None:
        return True
    return (nxt.text in (",", ")", ";")
            or nxt.upper in ("ASC", "DESC", "NULLS", "LIMIT", "OFFSET",
                             "FETCH", "UNION", "INTERSECT", "EXCEPT"))
