"""Box-drawing EXPLAIN rendering — the reference's plan layout.

The reference renders EXPLAIN as rounded boxes (``╭─ NAME ─…─╮``) with
the claimed index filter as a tree of typed leaf boxes laid out side by
side under their parent, connected with ``┬``/``┴``/``├`` ticks
(tests/sqllogic/sdb/pg/index/filter_optimizer_*.test; the writer lives
in the reference's explain formatter, server/connector/explain). This
module re-creates that layout from this engine's parsed boolean tree
(plans/search_sql MatchLeaf/BoolNode) so the reference's EXPLAIN
expectations compare verbatim instead of being skipped.

Layout rules (derived from the reference's expected outputs):
- leaf box width  = max(len(title) + 7, widest content line + 4)
- a parent composite's box is title-only; its WIDTH equals its first
  child's width, with ``┬`` at the center column ``1 + (w - 2) // 2``
- every child gets ``┴`` at its own center column in its top border;
  since the parent is exactly as wide as the first child, the parent's
  ``┬`` lines up with the first child's ``┴``
- siblings sit side by side separated by two spaces; a connector row
  runs from the parent's ``┬`` (as ``├``) through each later child's
  center (``┬``, final ``╮``)
- single-child composites stack directly (no connector row)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from dataclasses import field as dc_field


@dataclass
class FBox:
    title: str
    lines: list = field(default_factory=list)
    children: list = field(default_factory=list)


def _center(w: int) -> int:
    return 1 + (w - 2) // 2


def _leaf_rows(b: FBox, tick: int | None) -> tuple[list[str], int]:
    # min width 10 with at least one trailing dash (All → 10, Empty → 11)
    w = max(10, len(b.title) + 6,
            max((len(ln) for ln in b.lines), default=0) + 4)
    top = list("╭─ " + b.title + " " + "─" * (w - len(b.title) - 5) + "╮")
    if tick is not None and tick < len(top) and top[tick] == "─":
        # the tick is skipped when it would land on the title text
        # (lowering.test:234 Starts With under And)
        top[tick] = "┴"
    rows = ["".join(top)]
    for ln in b.lines:
        rows.append("│ " + ln.ljust(w - 4) + " │")
    rows.append("╰" + "─" * (w - 2) + "╯")
    return rows, w


def render_filter(b: FBox, tick: int | None = None) -> list[str]:
    """Render one filter box (and its subtree); every row is padded to
    the subtree's full width."""
    if not b.children:
        rows, w = _leaf_rows(b, tick)
        return rows
    kid_rows: list[list[str]] = []
    kid_w: list[int] = []
    for ch in b.children:
        kr = render_filter(ch, tick=_center(_kid_width(ch)))
        kid_rows.append(kr)
        kid_w.append(len(kr[0]))
    # the parent's box is as wide as its first child's BOX (not the
    # child's whole rendered subtree — negation.test:204 Exclusion over
    # a nested And)
    pw = _kid_width(b.children[0])
    top = list("╭─ " + b.title + " "
               + "─" * (pw - len(b.title) - 5) + "╮")
    if tick is not None and tick < len(top) and top[tick] == "─":
        top[tick] = "┴"
    bottom = list("╰" + "─" * (pw - 2) + "╯")
    bottom[_center(pw)] = "┬"
    rows = ["".join(top), "".join(bottom)]
    total_w = sum(kid_w) + 2 * (len(kid_w) - 1)
    if len(kid_rows) > 1:
        conn = [" "] * total_w
        x = 0
        ticks = []
        for i, w in enumerate(kid_w):
            ticks.append(x + _center(_kid_width(b.children[i])))
            x += w + 2
        for c in range(ticks[0], ticks[-1] + 1):
            conn[c] = "─"
        conn[ticks[0]] = "├"
        for t in ticks[1:-1]:
            conn[t] = "┬"
        conn[ticks[-1]] = "╮"
        rows.append("".join(conn).rstrip())
    depth = max(len(kr) for kr in kid_rows)
    for r in range(depth):
        parts = []
        for i, kr in enumerate(kid_rows):
            parts.append(kr[r] if r < len(kr) else " " * kid_w[i])
        rows.append("  ".join(parts))
    w_all = max(len(r) for r in rows)
    return [r.ljust(w_all) for r in rows]


def _kid_width(b: FBox) -> int:
    if not b.children:
        _, w = _leaf_rows(b, None)
        return w
    return _kid_width(b.children[0])


# ---------------------------------------------------------------------------
# outer plan nodes
# ---------------------------------------------------------------------------

#: text lines longer than this wrap (Values / Projections lists —
#: 'afternoon','lunch','morning' fits at 39, the 4-value lists at 41
#: wrap)
_WRAP = 39


def wrap_kv(label: str, text: str, cont_indent: int | None = None
            ) -> list[str]:
    """``Label: a, b, c`` — on one line when it fits, else label-only
    line + the value (Values:) or continuation-indented items
    (Projections:)."""
    one = f"{label}: {text}"
    if len(one) <= _WRAP:
        return [one]
    if cont_indent is None:
        return [f"{label}:", text]
    # Projections style: break after each comma, continuation aligned
    # under the first value
    parts = [p.strip() for p in text.split(",")]
    lines = [f"{label}: {parts[0]},"]
    pad = " " * (len(label) + 2)
    for p in parts[1:-1]:
        lines.append(f"{pad}{p},")
    lines.append(f"{pad}{parts[-1]}")
    return lines


def render_node(title: str, lines: list[str],
                child: list[str] | None = None) -> list[str]:
    """One outer plan node box; `child` is a rendered node below it —
    connected with ┬/┴ at the center of the shared width."""
    w = max(len(title) + 7,
            max((len(ln) for ln in lines), default=0) + 4)
    if child:
        w = max(w, len(child[0]))
    out = ["╭─ " + title + " " + "─" * (w - len(title) - 5) + "╮"]
    for ln in lines:
        out.append("│ " + ln.ljust(w - 4) + " │")
    if child is None:
        out.append("╰" + "─" * (w - 2) + "╯")
        return out
    bottom = list("╰" + "─" * (w - 2) + "╯")
    c = _center(w)
    bottom[c] = "┬"
    out.append("".join(bottom))
    # widen the child to the same width and put ┴ in its top border
    cw = len(child[0])
    child2 = []
    for i, ln in enumerate(child):
        if i == 0:
            ln = ln[:-1] + "─" * (w - cw) + ln[-1]
            ln = list(ln)
            ln[c] = "┴"
            ln = "".join(ln)
        elif ln.endswith("│"):
            ln = ln[:-1] + " " * (w - cw) + ln[-1]
        elif ln.endswith("╯"):
            ln = ln[:-1] + "─" * (w - cw) + ln[-1]
        child2.append(ln)
    return out + child2


# ---------------------------------------------------------------------------
# parsed-tree → reference filter boxes
# ---------------------------------------------------------------------------

class _Bail(Exception):
    """Plan shape outside the renderable surface — caller falls back to
    the indented-text EXPLAIN."""


def _ftype(idx, col: str) -> str:
    an = idx.fields.get(col)
    if an is None:
        raise _Bail(col)
    return "numeric" if an in ("encoded_int", "encoded_ts") else "string"


def _decode_int(s) -> int:
    v = int(str(s), 16) ^ (1 << 63)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def _fmt_boost(b: float) -> str:
    return f"{b:g}"


@dataclass
class RF:
    """Reference-filter IR node."""
    kind: str                   # term terms all empty and or not phrase
    #                            range gran lev prefix automaton
    field: str | None = None
    boost: float = 1.0
    values: list = dc_field(default_factory=list)  # terms: [(value, boost)]
    mm: int = 0
    data: dict = dc_field(default_factory=dict)
    children: list = dc_field(default_factory=list)
    #: lowered (non-@@) claims sort after @@ claims inside And
    lowered: bool = False


def _demote(c: RF) -> RF:
    """A one-value min-match-1 Terms is displayed as a plain Term."""
    if (c.kind == "terms" and len(c.values) == 1 and c.mm == 1
            and c.values[0][1] is None and c.boost == 1.0):
        return RF("term", c.field, data={"value": c.values[0][0]},
                  lowered=c.lowered)
    return c


def _simplify_and(children: list[RF], scored: bool) -> RF:
    flat: list[RF] = []
    for c in children:
        if c.kind == "and":
            flat.extend(c.children)
        else:
            flat.append(c)
    children = flat
    if any(c.kind == "empty" for c in children):
        f = next(c.field for c in children if c.kind == "empty")
        return RF("empty", f)
    kept: list[RF] = []
    dropped_all = 0
    for c in children:
        if c.kind == "all" and not scored:
            dropped_all += 1
        else:
            kept.append(c)
    if not kept:
        return RF("all", children[0].field)
    if len(kept) == 1:
        one = kept[0]
        # the reference sums the boosts of merged AND branches
        # (filter_optimizer_boolean.test:242 Term+All → Boost: 2)
        one.boost += dropped_all
        return one
    # a Starts With whose prefix pins a sibling Levenshtein target
    # folds into the automaton and disappears
    # (lowering.test:261,286 — levenshtein_prefix_rules.cpp)
    lev_targets = [c.data["target"] for c in kept if c.kind == "lev"]
    if lev_targets:
        kept = [c for c in kept
                if not (c.kind == "prefix"
                        and c.data.get("keyword_field")
                        and any(t.startswith(c.data["prefix"])
                                for t in lev_targets))]
        if len(kept) == 1:
            one = kept[0]
            one.boost += dropped_all
            return one
    # merge same-field conjunctive term claims (unboosted Term / Terms
    # with full min-match) into one Terms with summed min-match
    merged: list[RF] = []
    by_field: dict[str, int] = {}
    range_merged = [False]
    for c in kept:
        conj_terms = (
            c.boost == 1.0 and (
                c.kind == "term"
                or (c.kind == "terms" and c.mm == len(c.values)
                    and all(b is None for _, b in c.values))))
        if conj_terms:
            vals = ([(v, b) for v, b in c.values] if c.kind == "terms"
                    else [(c.data["value"], None)])
            if c.field in by_field:
                tgt = merged[by_field[c.field]]
                tgt.values.extend(vals)
                tgt.mm += len(vals)
                tgt.values.sort(key=lambda x: x[0])
                continue
            node = RF("terms", c.field, values=sorted(vals),
                      mm=len(vals), lowered=c.lowered)
            by_field[c.field] = len(merged)
            merged.append(node)
            continue
        # merge same-field range claims (BETWEEN lowered to two
        # conjuncts re-merges, boosts summed — boolean.test:323 Boost: 2)
        if c.kind in ("range", "gran") and c.data.get("mergeable", True):
            prev = next((m for m in merged
                         if m.kind == c.kind and m.field == c.field
                         and m.data.get("mergeable", True)), None)
            if prev is not None:
                if c.data.get("lo") is not None:
                    prev.data["lo"] = c.data["lo"]
                    prev.data["lo_inc"] = c.data.get("lo_inc")
                if c.data.get("hi") is not None:
                    prev.data["hi"] = c.data["hi"]
                    prev.data["hi_inc"] = c.data.get("hi_inc")
                prev.boost += c.boost
                prev.data["merged"] = True
                range_merged[0] = True
                continue
        merged.append(c)
    if range_merged[0]:
        # once some range pair merged, leftover unmergeable same-field
        # range claims come out in reverse order
        # (range_terms.test:339 [<gamma, >alpha] after the k merge)
        out2: list[RF] = []
        i2 = 0
        while i2 < len(merged):
            c2 = merged[i2]
            if c2.kind in ("range", "gran") \
                    and not c2.data.get("mergeable", True):
                j2 = i2
                while (j2 < len(merged)
                       and merged[j2].kind == c2.kind
                       and merged[j2].field == c2.field
                       and not merged[j2].data.get("mergeable", True)):
                    j2 += 1
                out2.extend(reversed(merged[i2:j2]))
                i2 = j2
            else:
                out2.append(c2)
                i2 += 1
        merged = out2

    def _degenerate(c: RF) -> RF:
        # a range whose merged bounds collapse: =v inclusive → Term,
        # crossing/exclusive-equal → Empty (range_terms.test:176,193)
        if c.kind in ("range", "gran"):
            lo, hi = c.data.get("lo"), c.data.get("hi")
            if lo is not None and hi is not None and lo == hi:
                if c.data.get("lo_inc") and c.data.get("hi_inc"):
                    return RF("term", c.field, c.boost,
                              data={"value": lo}, lowered=c.lowered)
                return RF("empty", c.field)
        return c

    merged = [_degenerate(_demote(c)) for c in merged]
    if any(c.kind == "empty" for c in merged):
        return RF("empty",
                  next(c.field for c in merged if c.kind == "empty"))
    if len(merged) == 1:
        one = merged[0]
        one.boost += dropped_all
        return one
    # AND children render @@ claims in textual order, then lowered
    # (equality/range) claims in reverse textual order
    # (boolean.test:60 vs :156; negation.test:204 [n, s]); a claim
    # formed by MERGING several @@ members goes after the lowered ones
    # (scorer.test:420 [Gran n, Range s])
    atats = [c for c in merged if not c.lowered]
    lows = list(reversed([c for c in merged if c.lowered]))
    if not atats or not lows:
        merged = atats + lows
    elif atats[0].data.get("merged"):
        # a leading merged claim pushes the lowered ones in front
        # (scorer.test:420 [Gran n, Range s])
        merged = lows + atats
    else:
        # lowered claims slot in after the first @@ claim
        # (scorer.test:442 [t, n, s]; boolean.test:156 [t, s])
        merged = atats[:1] + lows + atats[1:]
    nots = [c for c in merged if c.kind == "not"]
    pos = [c for c in merged if c.kind != "not"]
    if nots and pos:
        # A AND NOT B → Exclusion(A, B…) (negation.test:125). The
        # excluded field keeps its null-marker branch only when no
        # positive branch constrains that field (negation.test:204 vs
        # :164).
        nf = {n.field for n in nots}
        covered = any(p.field in nf for p in pos)
        pos_node = pos[0] if len(pos) == 1 else RF("and", children=pos)
        if covered:
            # markers dropped; excluded branches in reverse textual
            # order (negation.test:164 [gamma, beta])
            excl = [n.children[0] for n in reversed(nots)]
        else:
            inners = [n.children[0] for n in nots]
            marker = next(
                (c for n in nots for c in n.children[1:]), None)
            excl = [inners[0]] + ([marker] if marker else []) \
                + inners[1:]
        return RF("exclusion", children=[pos_node] + excl)
    if nots and not pos and len(nots) > 1:
        # AND of NOTs merges into one Not: textual inner order with a
        # single null-marker after the first (negation.test:184)
        inners = [n.children[0] for n in nots]
        marker = next((c for n in nots for c in n.children[1:]), None)
        return RF("not", nots[0].field,
                  children=[inners[0]]
                  + ([marker] if marker else []) + inners[1:])
    return RF("and", children=merged)


def _simplify_or(children: list[RF], scored: bool) -> RF:
    flat: list[RF] = []
    for c in children:
        if c.kind == "or":
            flat.extend(c.children)
        else:
            flat.append(c)
    children = flat
    kept = [c for c in children if c.kind != "empty"]
    if not kept:
        return RF("empty", children[0].field)
    if not scored and any(c.kind == "all" for c in kept):
        return RF("all", next(c.field for c in kept if c.kind == "all"))
    if scored and all(c.kind == "all" for c in kept):
        return RF("all", kept[0].field)
    if len(kept) == 1:
        return kept[0]
    # duplicate OR branches over the same term sum their boosts
    # (filter_optimizer_boost.test:41 → one Term, Boost: 5)
    dedup: list[RF] = []
    for c in kept:
        if c.kind == "term":
            prev = next((d for d in dedup if d.kind == "term"
                         and d.field == c.field
                         and d.data.get("value") == c.data.get("value")),
                        None)
            if prev is not None:
                prev.boost += c.boost
                continue
        dedup.append(c)
    kept = dedup
    if len(kept) == 1:
        return kept[0]
    # merge same-field disjunctive claims (Term / Terms mm=1)
    merged: list[RF] = []
    by_field: dict[str, int] = {}
    for c in kept:
        disj = (c.boost == 1.0 and (
            c.kind == "term"
            or (c.kind == "terms" and c.mm == 1)))
        if disj:
            vals = ([(v, b) for v, b in c.values] if c.kind == "terms"
                    else [(c.data["value"], None)])
            if c.field in by_field:
                tgt = merged[by_field[c.field]]
                tgt.values.extend(vals)
                tgt.values.sort(key=lambda x: x[0])
                continue
            node = RF("terms", c.field, values=sorted(vals), mm=1,
                      lowered=c.lowered)
            by_field[c.field] = len(merged)
            merged.append(node)
            continue
        merged.append(c)
    merged = [_demote(c) for c in merged]
    if len(merged) == 1:
        return merged[0]
    return RF("or", children=merged)


def _conv_ts(node, col: str, idx, boost: float = 1.0,
             scored: bool = False) -> RF:
    """One field's TSQuery AST → reference-filter IR."""
    from serenedb_spark.plans import tsquery as q

    ft = _ftype(idx, col)

    def dec(v):
        # numeric claims carry memcmp-encoded bounds; the reference
        # displays the decoded value (range_terms.test Value: 2)
        if ft == "numeric" and v is not None:
            try:
                return _decode_int(v)
            except ValueError:
                return v
        return v

    if isinstance(node, q.Boost):
        return _conv_ts(node.part, col, idx, boost * node.factor,
                        scored)
    if isinstance(node, q.Term):
        return RF("term", col, boost, data={"value": node.term})
    if isinstance(node, q.Phrase):
        if len(node.words) == 1:
            return RF("term", col, boost, data={"value": node.words[0]})
        parts = []
        pos = 0
        for i, w in enumerate(node.words):
            if i > 0:
                lo, hi = node.gaps[i - 1]
                parts.append((w, pos + lo, pos + hi - 1 + lo - lo))
                pos += lo
            else:
                parts.append((w, 0, 0))
        # positions: exact phrase → (i, i); a gap (lo, hi) widens the
        # window (lowering.test Parts: Term:alpha(0, 0); Term:beta(1, 1))
        txt = []
        pmin = pmax = 0
        txt.append(f"Term:{node.words[0]}(0, 0);")
        for i, w in enumerate(node.words[1:]):
            lo, hi = node.gaps[i]
            pmin += lo
            pmax += hi
            txt.append(f"Term:{w}({pmin}, {pmax});")
        return RF("phrase", col, boost,
                  data={"parts": " ".join(txt) + " "})
    if isinstance(node, q.AnyOf):
        if not node.terms:
            return RF("empty", col)
        if len(node.terms) == 1 and node.min_match == 1:
            return RF("term", col, boost,
                      data={"value": dec(node.terms[0])})
        return RF("terms", col, boost,
                  values=sorted((str(dec(t)), None) for t in node.terms),
                  mm=node.min_match)
    if isinstance(node, q.AllOf):
        return RF("terms", col, boost,
                  values=sorted((str(dec(t)), None) for t in node.terms),
                  mm=len(node.terms))
    if isinstance(node, q.And):
        return _with_boost(_simplify_and(
            [_conv_ts(p, col, idx, scored=scored) for p in node.parts],
            scored), boost)
    if isinstance(node, q.Or):
        r = _simplify_or(
            [_conv_ts(p, col, idx, scored=scored) for p in node.parts],
            scored)
        return _with_boost(r, boost)
    if isinstance(node, q.Not):
        inner = _conv_ts(node.part, col, idx)
        return _make_not(inner, col)
    if isinstance(node, q.Between):
        lo, hi = node.lo, node.hi
        if lo is None and hi is None:
            return RF("all", col, boost)
        if (lo is not None and hi is not None and lo == hi):
            if node.lo_inclusive and node.hi_inclusive:
                return RF("term", col, boost, data={"value": dec(lo)})
            return RF("empty", col)
        kind = "gran" if ft == "numeric" else "range"
        return RF(kind, col, boost, data={
            "lo": dec(lo), "lo_inc": node.lo_inclusive,
            "hi": dec(hi), "hi_inc": node.hi_inclusive,
            # AND'd range claims re-merge on keyword/encoded fields
            # only; a tokenized field keeps separate Range clauses
            # (range_terms.test:142 vs :287)
            "mergeable": idx.fields.get(col) in (
                "keyword", "encoded_int", "encoded_ts")})
    if isinstance(node, q.Fuzzy):
        if node.distance == 0:
            # distance 0 is an exact term (lowering.test:104)
            return RF("term", col, boost,
                      data={"value": (node.prefix or "") + node.term})
        # an exact prefix folds into the displayed target
        # (lowering.test:261 ts_levenshtein('lpha',1,false,'a') →
        # Target: alpha)
        return RF("lev", col, boost, data={
            "target": (node.prefix or "") + node.term,
            "max_terms": node.max_terms})
    if isinstance(node, q.Prefix):
        # the prefix-into-fuzzy fold applies to keyword fields only —
        # a tokenized field keeps its Starts With clause
        # (lowering.test:209 name/keyword folds vs :429 t/text doesn't)
        return RF("prefix", col, boost, data={
            "prefix": node.prefix,
            "keyword_field": idx.fields.get(col) == "keyword"})
    if isinstance(node, q.Wildcard):
        pat = node.pattern
        if "%" not in pat and "_" not in pat:
            # no metacharacters: a plain term (lowering.test:23)
            return RF("term", col, boost, data={"value": pat})
        if pat.endswith("%") and "%" not in pat[:-1] \
                and "_" not in pat[:-1]:
            return RF("prefix", col, boost,
                      data={"prefix": pat[:-1]})
        return RF("automaton", col, boost,
                  data={"pattern": pat, "like": True})
    if isinstance(node, q.Regexp):
        if not re.search(r"[.*+?\[\](){}|^$\\]", node.pattern):
            # no metacharacters: a plain term (lowering.test:72)
            return RF("term", col, boost,
                      data={"value": node.pattern})
        return RF("automaton", col, boost,
                  data={"pattern": node.pattern})
    raise _Bail(type(node).__name__)


def _with_boost(r: RF, boost: float) -> RF:
    r.boost *= boost
    return r


def _make_not(inner: RF, col: str) -> RF:
    null_marker = RF("term", col, data={"value": ""},
                     lowered=False)
    null_marker.data["null_marker"] = True
    if inner.kind == "empty":
        # NOT over an empty claim = every doc with a non-null field
        # value (negation.test:112 Not(Term n(null)))
        return RF("not", col, children=[null_marker])
    if inner.kind == "all":
        return RF("empty", col)
    return RF("not", col, children=[inner, null_marker])


def rf_to_box(r: RF, idx) -> FBox:
    ft = "null" if r.data.get("null_marker") else _ftype(idx, r.field) \
        if r.field is not None else None

    def fieldline():
        # catalog-folded lowercase, like every reference plan
        return f"Field: {(r.field or '').lower()}({ft})"

    boostline = ([f"Boost: {_fmt_boost(r.boost)}"]
                 if r.boost != 1.0 else [])
    if r.kind == "term":
        v = r.data.get("value", "")
        return FBox("Term", [fieldline(), f"Value: {v}"] + boostline)
    if r.kind == "terms":
        vals = ", ".join(
            f"'{v}'" + (f"({_fmt_boost(b)})" if b is not None else "")
            for v, b in r.values)
        lines = [fieldline()] + wrap_kv("Values", vals) \
            + [f"Min Match: {r.mm}"] + boostline
        return FBox("Terms", lines)
    if r.kind == "all":
        return FBox("All", [])
    if r.kind == "empty":
        return FBox("Empty", [])
    if r.kind == "phrase":
        return FBox("Phrase", [fieldline(), "Parts:", r.data["parts"]]
                    + boostline)
    if r.kind in ("range", "gran"):
        lo, hi = r.data.get("lo"), r.data.get("hi")
        parts = []
        if lo is not None:
            parts.append(f"{'>=' if r.data.get('lo_inc') else '>'}{lo}")
        if hi is not None:
            parts.append(f"{'<=' if r.data.get('hi_inc') else '<'}{hi}")
        rng = ", ".join(parts) if parts else "*"
        title = "Granular Range" if r.kind == "gran" else "Range"
        return FBox(title, [fieldline()] + wrap_kv("Range", rng)
                    + boostline)
    if r.kind == "lev":
        lines = [fieldline(), f"Target: {r.data['target']}",
                 f"Max Terms: {r.data['max_terms']}"]
        return FBox("Levenshtein", lines + boostline)
    if r.kind == "prefix":
        return FBox("Starts With", [
            fieldline(), f"Prefix: {r.data['prefix']}", "Limit: 1024"]
            + boostline)
    if r.kind == "automaton":
        return FBox("Automaton", [fieldline(),
                                  f"Pattern: {r.data['pattern']}"]
                    + boostline)
    if r.kind in ("and", "or", "not", "exclusion"):
        title = {"and": "And", "or": "Or", "not": "Not",
                 "exclusion": "Exclusion"}[r.kind]
        return FBox(title, [],
                    children=[rf_to_box(c, idx) for c in r.children])
    raise _Bail(r.kind)


# ---------------------------------------------------------------------------
# statement → full plan text
# ---------------------------------------------------------------------------

_EQ_RE = re.compile(
    r"^\(*\s*([A-Za-z_]\w*)\s*=\s*(?:'((?:[^']|'')*)'|(-?\d+))\s*\)*$")
_TS_LIT_RE = re.compile(
    r"^\(*\s*([A-Za-z_]\w*)\s+BETWEEN\s+TIMESTAMP\s+'([^']+)'\s+AND\s+"
    r"TIMESTAMP\s+'([^']+)'\s*\)*$", re.IGNORECASE)
_NUM_CMP_RE = re.compile(
    r"^\(*\s*([A-Za-z_]\w*)\s*(<=|>=|<|>)\s*(-?\d+)\s*\)*$")


def _micros(ts_text: str) -> int:
    import datetime as dt

    t = dt.datetime.fromisoformat(ts_text)
    epoch = dt.datetime(1970, 1, 1)
    return int((t - epoch).total_seconds()) * 1_000_000 \
        + t.microsecond % 1_000_000


def _conv_residual(sql: str, idx) -> RF:
    """A lowered (non-@@) conjunct the optimizer claims: equality on an
    indexed column, numeric comparison, BETWEEN over timestamps."""
    m = _EQ_RE.match(sql.strip())
    if m:
        col = m.group(1)
        ft = _ftype(idx, col)
        val = m.group(2) if m.group(2) is not None else m.group(3)
        if m.group(2) is not None:
            val = val.replace("''", "'")
        r = RF("term", col, data={"value": val}, lowered=True)
        return r
    m = re.match(
        r"^\(*\s*([A-Za-z_]\w*)\s+IN\s*\(([^()]*)\)\s*\)*$",
        sql.strip(), re.IGNORECASE)
    if m:
        col = m.group(1)
        _ftype(idx, col)
        vals = []
        for part in m.group(2).split(","):
            part = part.strip()
            if re.fullmatch(r"'(?:[^']|'')*'", part):
                vals.append(part[1:-1].replace("''", "'"))
            elif re.fullmatch(r"-?\d+", part):
                vals.append(part)
            else:
                raise _Bail(sql)
        if len(vals) == 1:
            return RF("term", col, data={"value": vals[0]}, lowered=True)
        return RF("terms", col, values=sorted((v, None) for v in vals),
                  mm=1, lowered=True)
    m = _TS_LIT_RE.match(sql.strip())
    if m:
        col = m.group(1)
        if _ftype(idx, col) != "numeric":
            raise _Bail(sql)
        # BETWEEN lowers to two AND'd bounds that re-merge — the
        # reference sums their boosts (boolean.test:323 Boost: 2)
        r = RF("gran", col, boost=2.0, lowered=True, data={
            "lo": _micros(m.group(2)), "lo_inc": True,
            "hi": _micros(m.group(3)), "hi_inc": True})
        return r
    m = re.match(
        r"^\(*\s*([A-Za-z_]\w*)\s+BETWEEN\s+(-?\d+)\s+AND\s+"
        r"(-?\d+)\s*\)*$", sql.strip(), re.IGNORECASE)
    if m:
        col = m.group(1)
        if _ftype(idx, col) != "numeric":
            raise _Bail(sql)
        return RF("gran", col, boost=2.0, lowered=True, data={
            "lo": int(m.group(2)), "lo_inc": True,
            "hi": int(m.group(3)), "hi_inc": True})
    m = _NUM_CMP_RE.match(sql.strip())
    if m:
        col, op, v = m.group(1), m.group(2), int(m.group(3))
        if _ftype(idx, col) != "numeric":
            raise _Bail(sql)
        d = {"lo": None, "lo_inc": None, "hi": None, "hi_inc": None}
        if op in (">", ">="):
            d["lo"], d["lo_inc"] = v, op == ">="
        else:
            d["hi"], d["hi_inc"] = v, op == "<="
        return RF("gran", col, lowered=True, data=d)
    m = re.match(
        r"^\(*\s*([A-Za-z_]\w*)\s+LIKE\s+'((?:[^']|'')*)'\s*\)*$",
        sql.strip(), re.IGNORECASE)
    if m:
        col, pat = m.group(1), m.group(2).replace("''", "'")
        _ftype(idx, col)
        if "%" not in pat and "_" not in pat:
            return RF("term", col, data={"value": pat}, lowered=True)
        if pat.endswith("%") and "%" not in pat[:-1] \
                and "_" not in pat[:-1]:
            return RF("prefix", col, lowered=True,
                      data={"prefix": pat[:-1]})
        return RF("automaton", col, lowered=True,
                  data={"pattern": pat, "like": True})
    m = re.match(
        r"^\(*\s*regexp_matches\s*\(\s*([A-Za-z_]\w*)\s*,\s*"
        r"'((?:[^']|'')*)'\s*\)\s*\)*$", sql.strip(), re.IGNORECASE)
    if m:
        col, pat = m.group(1), m.group(2).replace("''", "'")
        _ftype(idx, col)
        return RF("automaton", col, lowered=True,
                  data={"pattern": pat})
    m = re.match(
        r"^\(*\s*([A-Za-z_]\w*)\s+BETWEEN\s+'((?:[^']|'')*)'\s+AND"
        r"\s+'((?:[^']|'')*)'\s*\)*$", sql.strip(), re.IGNORECASE)
    if m:
        col = m.group(1)
        _ftype(idx, col)
        lo = m.group(2).replace("''", "'")
        hi = m.group(3).replace("''", "'")
        try:
            tokenized = len(idx.analyzer(col).tokens("a b")) != 1
        except Exception:
            tokenized = False
        if tokenized:
            # a tokenized field lowers BETWEEN to the interval
            # automaton (ts_dict_aggs.test:411 `[c..]&[..g]`)
            return RF("automaton", col, lowered=True,
                      data={"pattern": f"[{lo}..]&[..{hi}]"})
        # keyword fields re-merge the two AND'd bounds — boosts
        # summed, same as the numeric/timestamp twins
        # (ts_dict_where_deletes.test:209 Boost: 2)
        return RF("range", col, boost=2.0, lowered=True, data={
            "lo": lo, "lo_inc": True, "hi": hi, "hi_inc": True})
    m = re.match(
        r"^\(*\s*([A-Za-z_]\w*)\s*(<=|>=|<|>)\s*'((?:[^']|'')*)'"
        r"\s*\)*$", sql.strip(), re.IGNORECASE)
    if m:
        col, op, v = m.group(1), m.group(2), \
            m.group(3).replace("''", "'")
        _ftype(idx, col)
        d = {"lo": None, "lo_inc": None, "hi": None, "hi_inc": None}
        if op in (">", ">="):
            d["lo"], d["lo_inc"] = v, op == ">="
        else:
            d["hi"], d["hi_inc"] = v, op == "<="
        return RF("range", col, lowered=True, data=d)
    raise _Bail(sql)


def _conv_tree(tree, idx, scored: bool) -> RF:
    from serenedb_spark.plans import search_sql as SS

    if isinstance(tree, SS.MatchLeaf):
        return _conv_ts(tree.node, tree.col, idx, scored=scored)
    if isinstance(tree, SS.ResidualLeaf):
        return _conv_residual(tree.sql, idx)
    if isinstance(tree, SS.BoolNode):
        kids = [_conv_tree(c, idx, scored) for c in tree.children]
        if tree.op == "and":
            return _simplify_and(kids, scored)
        return _simplify_or(kids, scored)
    raise _Bail(type(tree).__name__)


def try_explain_box(session, inner_sql: str):
    """Render `EXPLAIN SELECT ... FROM <idx> WHERE <claims>` in the
    reference's box layout; None when the statement is outside the
    renderable surface (the caller falls back to the indented text)."""
    from serenedb_spark.plans import search_sql as SS

    try:
        toks = SS.tokenize(inner_sql.strip().rstrip(";"))
        if not toks or toks[0].upper != "SELECT":
            return None
        if any(t.text.lower().startswith("ts_dict_") for t in toks):
            return None
        fpos = SS._find_clause(toks, ("FROM",))
        if fpos < 0:
            return None
        sel_toks = toks[1:fpos]
        wpos = SS._find_clause(toks, ("WHERE",), fpos)
        opos = SS._find_clause(toks, ("ORDER", "BY"), fpos)
        lpos = SS._find_clause(toks, ("LIMIT",), fpos)
        if lpos >= 0 or wpos < 0:
            return None
        from_end = min(x for x in (wpos, opos, lpos, len(toks))
                       if x >= 0)
        from_toks = toks[fpos + 1:from_end]
        if len(from_toks) != 1 or from_toks[0].kind != "IDENT":
            return None
        from_name = from_toks[0].text
        idx = session._indexes.get(from_name)
        if idx is None:
            return None
        if any(t.text in SS._VEC_OPS for t in toks):
            return None

        def an_of(tbl, col):
            return session._index_for(from_name, col).analyzer(col)

        # scorer in select list / order?
        sel2, scorer, params = SS._rewrite_scorers(sel_toks)
        scored = scorer is not None
        order_scored = False
        if opos >= 0:
            oend = len(toks)
            okeys, oscorer, _op = SS._rewrite_scorers(toks[opos + 2:oend])
            if oscorer is not None:
                scorer = scorer or oscorer
                scored = True
                order_scored = True
            elif opos >= 0:
                return None      # plain ORDER BY: not rendered yet
        wend = opos if opos >= 0 else len(toks)
        tree = SS._parse_bool_or(
            toks[wpos + 1:wend],
            lambda c: session._index_for(from_name, c).analyzer(c))
        rf = _conv_tree(tree, idx, scored)

        projections = []
        for it in SS._split_top(sel2, (",",)):
            if not it:
                continue
            if len(it) == 1 and it[0].kind == "IDENT" \
                    and it[0].text != "__score":
                projections.append(it[0].text.split(".")[-1])
            elif any(t.text == "__score" for t in it):
                continue
            else:
                return None
        if scored:
            projections.append("sdb_inverted_index_score")

        filter_rows = render_filter(rf_to_box(rf, idx))
        if rf.kind == "empty":
            est = "~0 rows"
        elif rf.kind == "all":
            n = session._relation_for(from_name).count()
            est = f"~{n} row" + ("s" if n != 1 else "")
        else:
            est = "~1 row"
        lines = [f"Index: {from_name}", "Lookup: table",
                 "Index Filter:"] + filter_rows
        if scored:
            nm, pnames = SS.SCORER_FUNCS.get(scorer, (scorer, ()))
            defaults = {"bm25": "bm25(k1=1.2, b=0.75)"}
            lines.append(f"Score: {defaults.get(scorer, scorer)}")
        # Projections wrap only when they exceed the width the other
        # content already establishes (boolean.test:366 single line in
        # a wide box vs scorer.test:138 wrapped in a narrow one)
        thresh = max((len(ln) for ln in lines), default=0)
        proj_line = "Projections: " + ", ".join(projections)
        if len(proj_line) <= thresh:
            lines.append(proj_line)
        else:
            wrapped = wrap_kv("Projections", ", ".join(projections),
                              cont_indent=True)
            # a wrapped projection list pads the box to the fixed wrap
            # width (scorer.test:72 — every wrapped box is 42 wide)
            lines += [wrapped[0]] + [w.ljust(38) for w in wrapped[1:]]
        lines.append(est)
        scan = render_node("IRESEARCH_SCAN", lines)
        if order_scored:
            return render_node("ORDER_BY", ["Order By: #1 ASC", est],
                               child=scan)
        return scan
    except _Bail:
        return None
    except (ValueError, KeyError):
        return None


# ---------------------------------------------------------------------------
# TsDict EXPLAIN — the claimed term-dictionary plan chains
# (ts_dict*.test: [ORDER_BY] [PROJECTION…] HASH_GROUP_BY IRESEARCH_SCAN)
# ---------------------------------------------------------------------------

def _tsd_scan_col(fn: str, field: str) -> str:
    base = {"agg": "term", "raw_agg": "term_raw", "count": "term_count",
            "freq": "term_freq", "score": "term_score",
            "min": "term", "max": "term"}[fn]
    # the reference's catalog folds unquoted identifiers to lowercase
    # (PG semantics) — plans never show mixed case
    # (ts_dict_view.test:412 Tags → tags)
    return f"sdb_inverted_index_{base}${field.lower()}"


def _proj_lines(items: list[str]) -> list[str]:
    """The reference's projection-list layout: single item inline; a
    multi-item list of long scan columns splits one per line with
    trailing commas; short alias lists stay inline."""
    if len(items) == 1:
        one = f"Projections: {items[0]}"
        # a single item stays inline up to 40 chars; longer splits to
        # label + item lines (ts_dict.test:177 term$body at 42 wraps,
        # ts_dict_array_agg.test:76 term$cat at 40 stays)
        if len(one) <= 40:
            return [one]
        # the wrapped item reserves the comma slot + space, like the
        # multi-item layout (ts_dict.test:177 box width 34 for a
        # 28-char item)
        return ["Projections:", items[0] + "  "]
    one = "Projections: " + ", ".join(items)
    if max(len(i) for i in items) <= 12 and len(one) <= 46:
        return [one]
    # the reference's layout reserves the comma slot on the last item
    # too (ts_dict_cartesian.test:61 box width)
    return ["Projections:"] + [i + "," for i in items[:-1]] \
        + [items[-1] + " "]


def _rows_line(n: int) -> str:
    return f"~{n} row" + ("s" if n != 1 else "")


def render_chain(nodes: list[tuple[str, list[str]]]) -> list[str]:
    """A vertical plan chain at ONE shared width (the reference's
    EXPLAIN dump gives every node in a chain the same box width)."""
    w = max(max((len(ln) for _t, lines in nodes for ln in lines),
                default=0) + 4,
            max(len(t) for t, _l in nodes) + 7)
    c = _center(w)
    out: list[str] = []
    for i, (title, lines) in enumerate(nodes):
        top = list("╭─ " + title + " " + "─" * (w - len(title) - 5)
                   + "╮")
        if i > 0 and top[c] == "─":
            top[c] = "┴"
        out.append("".join(top))
        for ln in lines:
            out.append("│ " + ln.ljust(w - 4) + " │")
        bottom = list("╰" + "─" * (w - 2) + "╯")
        if i < len(nodes) - 1:
            bottom[c] = "┬"
        out.append("".join(bottom))
    return out


def try_tsdict_explain(session, inner_sql: str):
    """Render EXPLAIN over a ts_dict statement in the reference's box
    layout (ts_dict_plan.cpp's claimed aggregate). None when the shape
    is outside the rendered set — the caller falls back."""
    from serenedb_spark.plans import search_sql as SS

    try:
        stmt = SS.parse_ts_dict(inner_sql)
    except Exception:
        return None
    if stmt is None:
        return None
    idx = session._indexes.get(stmt.from_name)
    if idx is None:
        return None
    segs = getattr(idx, "_segments", None)
    if not segs:
        return None
    try:
        return _render_tsdict(session, stmt, idx, segs)
    except _Bail:
        return None


class _Skip(Exception):
    """Internal control flow: residual already rendered."""


def _or_union_frag(r: RF) -> str | None:
    """The regex fragment one acceptor contributes to a TS_DICT OR
    union automaton (ts_dict_predicates.test:246 `(?:ax.*)|(?:ban.*)`,
    :431 LIKE/term mix) — None if the claim can't join a union."""
    if r.boost != 1.0:
        return None
    if r.kind == "prefix":
        return r.data["prefix"] + ".*"
    if r.kind == "term":
        return r.data["value"]
    if r.kind == "automaton":
        p = r.data["pattern"]
        if r.data.get("like"):
            p = p.replace("%", ".*").replace("_", ".")
        return p
    return None


def _fold_tsdict_or(r: RF) -> RF:
    """Under a TS_DICT scan a pure disjunction of term acceptors on one
    field compiles into a single union Automaton."""
    r.children = [_fold_tsdict_or(c) for c in r.children]
    if r.kind == "or" and r.children:
        frags = [_or_union_frag(c) for c in r.children]
        flds = {c.field for c in r.children}
        if len(flds) == 1 and all(f is not None for f in frags):
            return RF("automaton", next(iter(flds)), lowered=True,
                      data={"pattern": "|".join(
                          f"(?:{f})" for f in frags)})
    return r


def _and_intersect_frag(r: RF) -> str | None:
    """The fragment one claim contributes to a TS_DICT AND intersection
    automaton (ts_dict_predicates.test:104 `a%&[ap..az]`)."""
    if r.boost not in (1.0, 2.0):
        return None
    if r.kind == "automaton":
        return r.data["pattern"]        # LIKE pattern verbatim
    if (r.kind == "range" and r.data.get("lo") is not None
            and r.data.get("hi") is not None
            and r.data.get("lo_inc") and r.data.get("hi_inc")):
        return f"[{r.data['lo']}..{r.data['hi']}]"
    return None


def _tsdict_unlimit_lev(r: RF) -> None:
    """Under a TS_DICT enumeration the fuzzy claim runs uncapped —
    Max Terms: 0 (ts_dict_aggs.test:925), unlike the scored search
    default of 64 (filter_optimizer_lowering.test:147)."""
    if r.kind == "lev":
        r.data["max_terms"] = 0
    for c in r.children:
        _tsdict_unlimit_lev(c)


def _render_tsdict(session, stmt, idx, segs):
    import pyspark.sql.functions as F

    calls = stmt.calls
    if stmt.row_aggs or stmt.term_matcher:
        raise _Bail("restricted ts_dict explain not rendered")
    fields = {c.field for c in calls}
    if len(fields) != 1:
        raise _Bail("multi-field")
    f = calls[0].field

    # per-segment distinct terms — the scan's row estimate
    d = [int(p.where(F.col("field") == f).select("term").distinct()
             .count()) for _ids, p in segs]
    scan_raw = sum(d)

    # WHERE handling: a claimable term acceptor renders as the scan's
    # Index Filter and takes DuckDB's 20% selectivity guess
    # (ts_dict_cartesian.test:109 19 = 96·0.2); a scalar term predicate
    # becomes a FILTER plan node; a doc-level @@ claim renders as the
    # Index Filter with NO row reduction (the doc set narrows documents,
    # not the enumerated dictionary)
    filter_boxes: list[str] = []
    filter_node_pred = None
    scan_sum = scan_raw
    if stmt.term_residuals:
        if len(stmt.term_residuals) > 1:
            # AND'd acceptors fold into ONE intersection automaton —
            # LIKE pattern & interval (ts_dict_predicates.test:104
            # `a%&[ap..az]`); anything else stays out of surface
            frags = []
            for _rf_f, mp in stmt.term_residuals:
                o = re.sub(r"\bterm\b", f, mp)
                o = re.sub(r"\s+", " ", o).strip()
                frags.append(_and_intersect_frag(_conv_residual(o, idx)))
            if any(fr is None for fr in frags):
                raise _Bail("multi-residual")
            rf = RF("automaton", f, lowered=True,
                    data={"pattern": "&".join(frags)})
            filter_boxes = render_filter(rf_to_box(rf, idx))
            scan_sum = max(1, int(scan_raw * 0.2))
            stmt_residual_done = True
        else:
            stmt_residual_done = False
        _rf_field, mapped = stmt.term_residuals[0]
        orig = re.sub(r"\bterm\b", f, mapped)
        orig = re.sub(r"\s+", " ", orig).strip()
        try:
            if stmt_residual_done:
                raise _Skip()
            if re.fullmatch(
                    r"\(*\s*[A-Za-z_]\w*\s*(?:!=|<>)\s*'(?:[^']|'')*'"
                    r"\s*\)*", orig):
                # a negated term acceptor claims INVISIBLY: the scan
                # estimate drops but no Index Filter box appears
                # (ts_dict_doc_restricted.test:225)
                scan_sum = max(1, int(scan_raw * 0.2))
                raise _Skip()
            try:
                rf = _conv_residual(orig, idx)
            except _Bail:
                # a pure OR of acceptors folds into one union automaton
                # (ts_dict_predicates.test:431)
                parts2 = re.split(r"\s+OR\s+", orig, flags=re.IGNORECASE)
                if len(parts2) < 2:
                    raise
                kids = [_conv_residual(p2, idx) for p2 in parts2]
                fr2 = [_or_union_frag(k) for k in kids]
                if all(x is not None for x in fr2):
                    # all automaton-representable → one union automaton
                    rf = RF("automaton", f, lowered=True,
                            data={"pattern": "|".join(
                                f"(?:{x})" for x in fr2)})
                else:
                    # a range keeps the Or tree
                    # (ts_dict_predicates.test:462)
                    rf = RF("or", f, children=kids)
            filter_boxes = render_filter(rf_to_box(rf, idx))
            scan_sum = max(1, int(scan_raw * 0.2))
        except _Skip:
            pass
        except _Bail:
            # scalar post-filter (length(body) = 5): a FILTER node
            scan_col = _tsd_scan_col("agg", f)
            filter_node_pred = re.sub(
                rf"\b{re.escape(f)}\b", scan_col, orig)
            # token-stream spacing tightens to call syntax
            # (ts_dict_where_deletes.test:260 `length(...) = 4`)
            filter_node_pred = re.sub(r"\s*\(\s*", "(",
                                      filter_node_pred)
            filter_node_pred = re.sub(r"\s*\)", ")", filter_node_pred)
            # top-level OR operands print parenthesized
            # (where_deletes.test:363 `(a) OR (b)`)
            parts = []
            depth = 0
            start = 0
            i2 = 0
            up = filter_node_pred.upper()
            while i2 < len(filter_node_pred):
                c2 = filter_node_pred[i2]
                if c2 == "'":
                    i2 += 1
                    while (i2 < len(filter_node_pred)
                           and filter_node_pred[i2] != "'"):
                        i2 += 1
                elif c2 == "(":
                    depth += 1
                elif c2 == ")":
                    depth -= 1
                elif (depth == 0 and up.startswith(" OR ", i2)):
                    parts.append(filter_node_pred[start:i2])
                    start = i2 + 4
                    i2 += 3
                i2 += 1
            if parts:
                parts.append(filter_node_pred[start:])
                filter_node_pred = " OR ".join(
                    f"({p.strip()})" for p in parts)
    if stmt.doc_where is not None:
        from serenedb_spark.plans import search_sql as SS

        toks = SS.tokenize(stmt.doc_where)
        tree = SS._parse_bool_or(
            toks, lambda c: idx.analyzer(c))
        rf = _conv_tree(tree, idx, False)
        _tsdict_unlimit_lev(rf)
        rf = _fold_tsdict_or(rf)
        filter_boxes = render_filter(rf_to_box(rf, idx))
    group_est = scan_sum // 2
    if filter_node_pred is not None:
        # grouping runs on the FILTER's output, not the raw scan
        # (where_deletes.test:260 ~1 = (11·0.2)//2)
        group_est = max(1, int(scan_raw * 0.2)) // 2

    forms = {c.form for c in calls}
    fns = [c.fn for c in calls]

    # ---- pure min/max: UNGROUPED over the scan, first-term stops
    if forms == {"scalar"} and (filter_boxes or filter_node_pred):
        raise _Bail("filtered scalar explain")
    if forms == {"scalar"}:
        aggs = ", ".join(f"{fn}(#0)" for fn in fns)
        return render_chain([
            ("UNGROUPED_AGGREGATE",
             [f"Aggregates: {aggs}", _rows_line(1)]),
            ("IRESEARCH_SCAN",
             [f"Index: {stmt.from_name}", f"TsDict: {f.lower()}"]
             # one first/last-term read per scalar aggregate — min→1,
             # min+max→2 (ts_dict_minmax_count.test:96 vs
             # ts_dict_aggs.test:85), independent of segment count
             + _proj_lines([_tsd_scan_col("agg", f)])
             + [_rows_line(len(fns))]),
        ])

    if not forms <= {"unnest", "bare", "list"}:
        raise _Bail("mixed forms")

    scan_cols = [_tsd_scan_col(c.fn, f) for c in calls]
    metric_calls = [c for c in calls if c.fn in ("count", "freq",
                                                 "score")]
    key_calls = [c for c in calls if c.fn in ("agg", "raw_agg")]

    nodes: list = []
    if forms == {"unnest"}:
        if stmt.order:
            keys = ", ".join(
                f"{stmt.from_name}.{f})) {'DESC' if dsc else 'ASC'}"
                for _k, dsc in stmt.order)
            nodes.append(("ORDER_BY",
                          [f"Order By: {keys}", _rows_line(group_est)]))
        # alias projection when the raw ::VARCHAR cast is in play
        if any(c.fn == "raw_agg" and c.hexcast for c in calls):
            aliases = []
            for it in stmt.select_items:
                m = re.search(r"\bAS\s+(\w+)\s*$", it, re.IGNORECASE)
                aliases.append(m.group(1) if m else "?column?")
            nodes.append(("PROJECTION",
                          _proj_lines(aliases)
                          + [_rows_line(group_est)]))

    # cast projection only when a metric actually needs one
    # (count→INTEGER, freq→BIGINT; score doesn't — ts_dict.test:197
    # "no redundant projection")
    cast = {"count": "INTEGER", "freq": "BIGINT"}
    if any(c.fn in cast for c in metric_calls):
        items = []
        for c in calls:
            col = _tsd_scan_col(c.fn, f)
            if c.fn in cast:
                items.append(f"CAST({col} AS {cast[c.fn]})")
            else:
                items.append(col)
        nodes.append(("PROJECTION",
                      _proj_lines(items) + [_rows_line(group_est)]))

    group_keys = ", ".join(f"#{i}" for i in range(len(key_calls)))
    group_lines = [f"Groups: {group_keys or '#0'}"]
    if metric_calls:
        aggfn = {"count": "sum", "freq": "sum", "score": "max"}
        aggs = ", ".join(
            f"{aggfn[c.fn]}(#{len(key_calls) + i})"
            for i, c in enumerate(metric_calls))
        group_lines.append(f"Aggregates: {aggs}")
    group_lines.append(_rows_line(group_est))
    nodes.append(("HASH_GROUP_BY", group_lines))

    if filter_node_pred is not None:
        nodes.append(("FILTER",
                      ["Expression:", filter_node_pred,
                       _rows_line(max(1, int(scan_raw * 0.2)))]))
    scan_lines = [f"Index: {stmt.from_name}"]
    if filter_boxes:
        scan_lines += ["Index Filter:"] + filter_boxes
    scan_lines += [f"TsDict: {f.lower()}"] + _proj_lines(scan_cols) \
        + [_rows_line(scan_raw if filter_node_pred is not None
                      else scan_sum)]
    nodes.append(("IRESEARCH_SCAN", scan_lines))
    if forms == {"unnest"}:
        return render_chain(nodes)
    raise _Bail("aggregate-form explain not rendered yet")
