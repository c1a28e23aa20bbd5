"""Porter2 (Snowball English) stemmer in three lock-step representations.

The reference stems English through ICU's snowball
(server/pg/commands/create_tsdictionary.cpp:255-340); this module
re-implements the PUBLISHED Porter2 algorithm
(snowballstem.org/algorithms/english/stemmer.html) — exception lists,
y-marking, R1/R2 with the gener/commun/arsen overrides, steps 0-5 with
snowball's longest-suffix-wins (no fall-through) semantics — as:

  * a pure-Python function (the executable spec; query-time stemming),
  * a pyspark Column expression (JVM-side; the index-build hot path),
  * a DuckDB SQL fragment (the correctness-gate oracle).

The Column/SQL builds bind the word between steps as a HOF lambda
variable (analyzers._bind pattern): every step references its input
dozens of times, and neither Catalyst nor DuckDB shares subexpressions
across those references — without the binding the expression text grows
exponentially per step. tests/test_porter2.py fuzzes the three paths
against each other and pins published example vectors
(site_docs create_text_search_dictionary/{text,stem}.test:
'running'→run, 'quickly'→quick).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

V = "aeiouy"            # lowercase y is a vowel; marked Y is a consonant
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI = "cdeghkmnrt"

EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
EXC2 = ("inning", "outing", "canning", "herring", "earring",
        "proceed", "exceed", "succeed")

#: step tables: (suffix, replacement) — longest-suffix-wins; special
#: markers: repl "*li" = delete only after a valid li-ending, "og" with
#: suffix "ogi" applies only after 'l', "" = delete
STEP2 = sorted([
    ("ational", "ate"), ("fulness", "ful"), ("iveness", "ive"),
    ("ization", "ize"), ("ousness", "ous"), ("biliti", "ble"),
    ("lessli", "less"), ("tional", "tion"), ("alism", "al"),
    ("aliti", "al"), ("ation", "ate"), ("entli", "ent"),
    ("fulli", "ful"), ("ousli", "ous"), ("anci", "ance"),
    ("abli", "able"), ("alli", "al"), ("ator", "ate"), ("enci", "ence"),
    ("iviti", "ive"), ("izer", "ize"), ("bli", "ble"),
], key=lambda x: -len(x[0]))
STEP3 = sorted([
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
], key=lambda x: -len(x[0]))
STEP4 = sorted([
    ("ement", ""), ("ance", ""), ("ence", ""), ("able", ""),
    ("ible", ""), ("ment", ""), ("ant", ""), ("ent", ""), ("ism", ""),
    ("ate", ""), ("iti", ""), ("ous", ""), ("ive", ""), ("ize", ""),
    ("al", ""), ("er", ""), ("ic", ""),
], key=lambda x: -len(x[0]))


# --------------------------------------------------------------------------
# pure-Python reference
# --------------------------------------------------------------------------

def _regions(w: str) -> tuple[int, int]:
    for p in ("gener", "commun", "arsen"):
        if w.startswith(p):
            r1 = len(p)
            break
    else:
        m = re.search(f"[{V}][^{V}]", w)
        r1 = m.end() if m else len(w)
    m2 = re.search(f"[{V}][^{V}]", w[r1:])
    r2 = r1 + m2.end() if m2 else len(w)
    return r1, r2


def _short_syllable_end(w: str) -> bool:
    if len(w) >= 3:
        if (w[-2] in V and w[-1] not in V + "wxY" and w[-3] not in V):
            return True
    return len(w) == 2 and w[0] in V and w[1] not in V


def _is_short(w: str, r1: int) -> bool:
    return r1 >= len(w) and _short_syllable_end(w)


def stem_py(word: str) -> str:
    w = word.lower()
    if w.startswith("'"):
        w = w[1:]
    if len(w) <= 2:
        return w
    if w in EXC1:
        return EXC1[w]
    # y-marking: initial y, or y after a vowel, is a consonant. One
    # non-overlapping left-to-right pass gives snowball's semantics
    # ('ayy' → 'aYy': the second y follows a consonant Y) and avoids
    # lookbehind, which RE2 (DuckDB) lacks.
    if w.startswith("y"):
        w = "Y" + w[1:]
    w = re.sub(f"([{V}])y", r"\1Y", w)
    r1, r2 = _regions(w)
    # step 0
    for sfx in ("'s'", "'s", "'"):
        if w.endswith(sfx):
            w = w[: -len(sfx)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if re.search(f"[{V}]", w[:-2]):
            w = w[:-1]
    if w in EXC2:
        return w
    # step 1b
    if w.endswith(("eed", "eedly")):
        sfx = "eedly" if w.endswith("eedly") else "eed"
        if len(w) - len(sfx) >= r1:
            w = w[: -len(sfx)] + "ee"
    else:
        for sfx in ("ingly", "edly", "ing", "ed"):
            if w.endswith(sfx):
                stem = w[: -len(sfx)]
                if re.search(f"[{V}]", stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(DOUBLES):
                        w = w[:-1]
                    elif _is_short(w, r1):
                        w += "e"
                break
    # step 1c
    if (len(w) > 2 and w[-1] in "yY" and w[-2] not in V):
        w = w[:-1] + "i"
    # step 2 (in R1)
    for sfx, repl in STEP2:
        if w.endswith(sfx):
            if len(w) - len(sfx) >= r1:
                w = w[: -len(sfx)] + repl
            break
    else:
        if w.endswith("ogi"):
            if len(w) - 3 >= r1 and len(w) > 3 and w[-4] == "l":
                w = w[:-1]
        elif w.endswith("li"):
            if len(w) - 2 >= r1 and len(w) > 2 and w[-3] in LI:
                w = w[:-2]
    # step 3 (in R1; ative needs R2)
    for sfx, repl in STEP3:
        if w.endswith(sfx):
            if len(w) - len(sfx) >= r1:
                w = w[: -len(sfx)] + repl
            break
    else:
        if w.endswith("ative"):
            if len(w) - 5 >= r2:
                w = w[:-5]
    # step 4 (in R2; ion needs s/t before)
    for sfx, repl in STEP4:
        if w.endswith(sfx):
            if len(w) - len(sfx) >= r2:
                w = w[: -len(sfx)]
            break
    else:
        if w.endswith("ion"):
            if (len(w) - 3 >= r2 and len(w) > 3 and w[-4] in "st"):
                w = w[:-3]
    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
                len(w) - 1 >= r1 and not _short_syllable_end(w[:-1])):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) > 1 and w[-2] == "l":
            w = w[:-1]
    return w.replace("Y", "y")


# --------------------------------------------------------------------------
# pyspark Column (bind-per-step: each step references its input dozens
# of times and Catalyst has no cross-reference CSE — analyzers._bind)
# --------------------------------------------------------------------------

def _b(val: Column, fn) -> Column:
    return F.element_at(F.transform(F.array(val), fn), 1)


def _c_cut(w: Column, n: int, repl: str = "") -> Column:
    out = F.substring(w, F.lit(1), F.length(w) - F.lit(n))
    return F.concat(out, F.lit(repl)) if repl else out


def _c_char_at_end(w: Column, back: int) -> Column:
    """back=1 → last char, back=2 → second-to-last, ..."""
    return F.substring(w, F.length(w) - F.lit(back - 1), F.lit(1))


def _c_has_vowel(w: Column) -> Column:
    return w.rlike(f"[{V}]")


def _c_short_syllable_end(w: Column) -> Column:
    three = ((F.length(w) >= 3)
             & _c_char_at_end(w, 2).isin(*list(V))
             & ~_c_char_at_end(w, 1).isin(*list(V + "wxY"))
             & ~_c_char_at_end(w, 3).isin(*list(V)))
    two = ((F.length(w) == 2)
           & F.substring(w, 1, 1).isin(*list(V))
           & ~F.substring(w, 2, 1).isin(*list(V)))
    return three | two


def _c_table_step(s: Column, rules, region: str, tail=None) -> Column:
    """Longest-suffix-wins table step over the (w, r1, r2) struct; a
    matched suffix whose region condition fails changes nothing (no
    fall-through — snowball semantics)."""
    w = s["w"]

    def subst(sfx: str, repl: str) -> Column:
        return F.when((F.length(w) - F.lit(len(sfx))) >= s[region],
                      _c_cut(w, len(sfx), repl)).otherwise(w)

    out = None
    for sfx, repl in rules:
        branch = F.when(w.endswith(sfx), subst(sfx, repl))
        out = branch if out is None else out.when(w.endswith(sfx),
                                                  subst(sfx, repl))
    fallback = tail(w, s) if tail is not None else w
    w2 = out.otherwise(fallback) if out is not None else fallback
    return F.struct(w2.alias("w"), s["r1"].alias("r1"),
                    s["r2"].alias("r2"))


def stem_expr(tok: Column) -> Column:
    """Porter2 as one Column expression over a single (lowercase) token."""
    return _b(tok, _stem_col_one)


def _stem_col_one(w0: Column) -> Column:
    stripped = F.when(w0.startswith("'"),
                      F.substring(w0, 2, F.length(w0))).otherwise(w0)
    return _b(stripped, lambda w: F.when(
        F.length(w) <= 2, w).otherwise(_c_exceptions(w)))


def _c_exceptions(w: Column) -> Column:
    out = None
    for k, v in EXC1.items():
        out = (F.when(w == k, F.lit(v)) if out is None
               else out.when(w == k, F.lit(v)))
    return out.otherwise(_c_pipeline(w))


def _c_pipeline(w: Column) -> Column:
    marked = F.regexp_replace(
        F.when(w.startswith("y"),
               F.concat(F.lit("Y"), F.substring(w, 2, F.length(w))))
        .otherwise(w),
        f"([{V}])y", "$1Y")
    return _b(marked, _c_with_regions)


def _c_with_regions(m: Column) -> Column:
    pat = f"^(.*?[{V}][^{V}])"
    ext = F.regexp_extract(m, pat, 1)
    r1 = (F.when(m.startswith("gener"), F.lit(5))
          .when(m.startswith("commun"), F.lit(6))
          .when(m.startswith("arsen"), F.lit(5))
          .when(ext == "", F.length(m)).otherwise(F.length(ext)))
    s0 = F.struct(m.alias("w"), r1.alias("r1"), F.lit(0).alias("r2"))
    s0 = _b(s0, lambda s: F.struct(
        s["w"].alias("w"), s["r1"].alias("r1"),
        _b(F.regexp_extract(
            F.substring(s["w"], s["r1"] + 1, F.length(s["w"])), pat, 1),
           lambda e2: F.when(e2 == "", F.length(s["w"]))
           .otherwise(s["r1"] + F.length(e2))).alias("r2")))
    staged = _b(s0, _c_step0)
    staged = _b(staged, _c_step1a)
    # exceptions-2 stop after step 1a
    return _b(staged, lambda s: F.when(
        s["w"].isin(*EXC2), s["w"]).otherwise(
        F.regexp_replace(_c_tail_steps(s), "Y", "y")))


def _c_tail_steps(s: Column) -> Column:
    staged = _b(s, _c_step1b)
    staged = _b(staged, _c_step1c)
    staged = _b(staged, lambda t: _c_table_step(t, STEP2, "r1",
                                                tail=_c_step2_tail))
    staged = _b(staged, lambda t: _c_table_step(t, STEP3, "r1",
                                                tail=_c_step3_tail))
    staged = _b(staged, lambda t: _c_table_step(t, STEP4, "r2",
                                                tail=_c_step4_tail))
    return _b(staged, _c_step5)


def _c_step0(s: Column) -> Column:
    w = s["w"]
    w2 = (F.when(w.endswith("'s'"), _c_cut(w, 3))
          .when(w.endswith("'s"), _c_cut(w, 2))
          .when(w.endswith("'"), _c_cut(w, 1)).otherwise(w))
    return F.struct(w2.alias("w"), s["r1"].alias("r1"),
                    s["r2"].alias("r2"))


def _c_step1a(s: Column) -> Column:
    w = s["w"]
    w2 = (
        F.when(w.endswith("sses"), _c_cut(w, 2))
        .when(w.endswith("ied") | w.endswith("ies"),
              F.when(F.length(w) > 4, _c_cut(w, 2)).otherwise(_c_cut(w, 1)))
        .when(w.endswith("us") | w.endswith("ss"), w)
        .when(w.endswith("s"),
              F.when(_c_has_vowel(_c_cut(w, 2)), _c_cut(w, 1)).otherwise(w))
        .otherwise(w))
    return F.struct(w2.alias("w"), s["r1"].alias("r1"),
                    s["r2"].alias("r2"))


def _c_step1b(s: Column) -> Column:
    w, r1 = s["w"], s["r1"]

    def drop(n: int) -> Column:
        return _b(_c_cut(w, n), lambda st: F.when(
            _c_has_vowel(st), _c_post1b(st, r1)).otherwise(w))

    w2 = (
        F.when(w.endswith("eedly"),
               F.when((F.length(w) - 5) >= r1, _c_cut(w, 5, "ee"))
               .otherwise(w))
        .when(w.endswith("ingly"), drop(5))
        .when(w.endswith("edly"), drop(4))
        .when(w.endswith("eed"),
              F.when((F.length(w) - 3) >= r1, _c_cut(w, 3, "ee"))
              .otherwise(w))
        .when(w.endswith("ing"), drop(3))
        .when(w.endswith("ed"), drop(2))
        .otherwise(w))
    return F.struct(w2.alias("w"), s["r1"].alias("r1"),
                    s["r2"].alias("r2"))


def _c_post1b(st: Column, r1: Column) -> Column:
    ends_dbl = None
    for d in DOUBLES:
        c = st.endswith(d)
        ends_dbl = c if ends_dbl is None else (ends_dbl | c)
    short = (r1 >= F.length(st)) & _c_short_syllable_end(st)
    return (
        F.when(st.endswith("at") | st.endswith("bl") | st.endswith("iz"),
               F.concat(st, F.lit("e")))
        .when(ends_dbl, _c_cut(st, 1))
        .when(short, F.concat(st, F.lit("e")))
        .otherwise(st))


def _c_step1c(s: Column) -> Column:
    w = s["w"]
    cond = ((F.length(w) > 2)
            & (w.endswith("y") | w.endswith("Y"))
            & ~_c_char_at_end(w, 2).isin(*list(V)))
    w2 = F.when(cond, _c_cut(w, 1, "i")).otherwise(w)
    return F.struct(w2.alias("w"), s["r1"].alias("r1"),
                    s["r2"].alias("r2"))


def _c_step2_tail(w: Column, s: Column) -> Column:
    return (
        F.when(w.endswith("ogi"),
               F.when(((F.length(w) - 3) >= s["r1"])
                      & (F.length(w) > 3)
                      & (_c_char_at_end(w, 4) == "l"),
                      _c_cut(w, 1)).otherwise(w))
        .when(w.endswith("li"),
              F.when(((F.length(w) - 2) >= s["r1"])
                     & (F.length(w) > 2)
                     & _c_char_at_end(w, 3).isin(*list(LI)),
                     _c_cut(w, 2)).otherwise(w))
        .otherwise(w))


def _c_step3_tail(w: Column, s: Column) -> Column:
    return F.when(
        w.endswith("ative"),
        F.when((F.length(w) - 5) >= s["r2"], _c_cut(w, 5)).otherwise(w)
    ).otherwise(w)


def _c_step4_tail(w: Column, s: Column) -> Column:
    return F.when(
        w.endswith("ion"),
        F.when(((F.length(w) - 3) >= s["r2"])
               & (F.length(w) > 3)
               & _c_char_at_end(w, 4).isin("s", "t"),
               _c_cut(w, 3)).otherwise(w)
    ).otherwise(w)


def _c_step5(s: Column) -> Column:
    w, r1, r2 = s["w"], s["r1"], s["r2"]
    e_del = ((F.length(w) - 1) >= r2) | (
        ((F.length(w) - 1) >= r1)
        & _b(_c_cut(w, 1), lambda st: ~_c_short_syllable_end(st)))
    return (
        F.when(w.endswith("e"), F.when(e_del, _c_cut(w, 1)).otherwise(w))
        .when(w.endswith("l"),
              F.when(((F.length(w) - 1) >= r2) & (F.length(w) > 1)
                     & (_c_char_at_end(w, 2) == "l"),
                     _c_cut(w, 1)).otherwise(w))
        .otherwise(w))


def stem_expr_list(arr: Column) -> Column:
    return F.transform(arr, stem_expr)


# --------------------------------------------------------------------------
# DuckDB SQL (the oracle twin) — same bind-per-step shape via
# single-element list_transform; interpreted lambdas are slow, so
# oracles over porter2 stay on bounded corpora (duckdb-oracle-cost note)
# --------------------------------------------------------------------------

_CTR = [0]


def _sb(val_sql: str, fn) -> str:
    _CTR[0] += 1
    v = f"b{_CTR[0]}"
    return f"list_transform([{val_sql}], {v} -> {fn(v)})[1]"


def _q_in(var: str, chars: str) -> str:
    lits = ", ".join(f"'{c}'" for c in chars)
    return f"list_contains([{lits}], {var})"


def _s_cut(w: str, n: int, repl: str = "") -> str:
    out = f"substr({w}, 1, length({w}) - {n})"
    return f"({out} || '{repl}')" if repl else out


def _s_end(w: str, back: int) -> str:
    return f"substr({w}, length({w}) - {back - 1}, 1)"


def _s_has_vowel(w: str) -> str:
    return f"regexp_matches({w}, '[{V}]')"


def _s_short_syll(w: str) -> str:
    return (
        f"((length({w}) >= 3 AND {_q_in(_s_end(w, 2), V)}"
        f" AND NOT {_q_in(_s_end(w, 1), V + 'wxY')}"
        f" AND NOT {_q_in(_s_end(w, 3), V)})"
        f" OR (length({w}) = 2 AND {_q_in(f'substr({w}, 1, 1)', V)}"
        f" AND NOT {_q_in(f'substr({w}, 2, 1)', V)}))"
    )


def _s_struct(w: str, r1: str, r2: str) -> str:
    return f"{{'w': {w}, 'r1': {r1}, 'r2': {r2}}}"


def _sw(s: str) -> str:
    return f"struct_extract({s}, 'w')"


def _sr(s: str, r: str) -> str:
    return f"struct_extract({s}, '{r}')"


def _s_table_step(s: str, rules, region: str, tail=None) -> str:
    w = _sw(s)
    out = "CASE"
    for sfx, repl in rules:
        sub = (f"CASE WHEN length({w}) - {len(sfx)} >= {_sr(s, region)}"
               f" THEN {_s_cut(w, len(sfx), repl)} ELSE {w} END")
        out += f" WHEN ends_with({w}, '{sfx}') THEN {sub}"
    fallback = tail(w, s) if tail is not None else w
    out += f" ELSE {fallback} END"
    return _s_struct(out, _sr(s, "r1"), _sr(s, "r2"))


def stem_sql(tok_sql: str) -> str:
    """Porter2 of one (lowercase) token expression, as DuckDB SQL."""
    return _sb(tok_sql, _s_stem_one)


def _s_stem_one(w0: str) -> str:
    stripped = (f"CASE WHEN starts_with({w0}, '''')"
                f" THEN substr({w0}, 2) ELSE {w0} END")
    return _sb(stripped, lambda w: (
        f"CASE WHEN length({w}) <= 2 THEN {w} ELSE {_s_exceptions(w)} END"))


def _s_exceptions(w: str) -> str:
    out = "CASE"
    for k, v in EXC1.items():
        out += f" WHEN {w} = '{k}' THEN '{v}'"
    out += f" ELSE {_s_pipeline(w)} END"
    return out


def _s_pipeline(w: str) -> str:
    init = (f"CASE WHEN starts_with({w}, 'y')"
            f" THEN 'Y' || substr({w}, 2) ELSE {w} END")
    marked = f"regexp_replace({init}, '([{V}])y', '\\1Y', 'g')"
    return _sb(marked, _s_with_regions)


def _s_with_regions(m: str) -> str:
    pat = f"^(.*?[{V}][^{V}])"
    ext = f"regexp_extract({m}, '{pat}', 1)"
    r1 = (f"CASE WHEN starts_with({m}, 'gener') THEN 5"
          f" WHEN starts_with({m}, 'commun') THEN 6"
          f" WHEN starts_with({m}, 'arsen') THEN 5"
          f" WHEN {ext} = '' THEN length({m})"
          f" ELSE length({ext}) END")
    s0 = _s_struct(m, r1, "0")
    s0 = _sb(s0, lambda s: _s_struct(
        _sw(s), _sr(s, "r1"),
        _sb(f"regexp_extract(substr({_sw(s)}, {_sr(s, 'r1')} + 1),"
            f" '{pat}', 1)",
            lambda e2: (f"CASE WHEN {e2} = '' THEN length({_sw(s)})"
                        f" ELSE {_sr(s, 'r1')} + length({e2}) END"))))
    staged = _sb(s0, _s_step0)
    staged = _sb(staged, _s_step1a)
    exc2 = ", ".join(f"'{w_}'" for w_ in EXC2)
    return _sb(staged, lambda s: (
        f"CASE WHEN list_contains([{exc2}], {_sw(s)}) THEN {_sw(s)}"
        f" ELSE replace({_s_tail_steps(s)}, 'Y', 'y') END"))


def _s_tail_steps(s: str) -> str:
    staged = _sb(s, _s_step1b)
    staged = _sb(staged, _s_step1c)
    staged = _sb(staged,
                 lambda t: _s_table_step(t, STEP2, "r1",
                                         tail=_s_step2_tail))
    staged = _sb(staged,
                 lambda t: _s_table_step(t, STEP3, "r1",
                                         tail=_s_step3_tail))
    staged = _sb(staged,
                 lambda t: _s_table_step(t, STEP4, "r2",
                                         tail=_s_step4_tail))
    return _sb(staged, _s_step5)


def _s_step0(s: str) -> str:
    w = _sw(s)
    w2 = (f"CASE WHEN ends_with({w}, '''s''') THEN {_s_cut(w, 3)}"
          f" WHEN ends_with({w}, '''s') THEN {_s_cut(w, 2)}"
          f" WHEN ends_with({w}, '''') THEN {_s_cut(w, 1)}"
          f" ELSE {w} END")
    return _s_struct(w2, _sr(s, "r1"), _sr(s, "r2"))


def _s_step1a(s: str) -> str:
    w = _sw(s)
    w2 = (
        f"CASE WHEN ends_with({w}, 'sses') THEN {_s_cut(w, 2)}"
        f" WHEN ends_with({w}, 'ied') OR ends_with({w}, 'ies') THEN"
        f" CASE WHEN length({w}) > 4 THEN {_s_cut(w, 2)}"
        f" ELSE {_s_cut(w, 1)} END"
        f" WHEN ends_with({w}, 'us') OR ends_with({w}, 'ss') THEN {w}"
        f" WHEN ends_with({w}, 's') THEN"
        f" CASE WHEN {_s_has_vowel(_s_cut(w, 2))} THEN {_s_cut(w, 1)}"
        f" ELSE {w} END"
        f" ELSE {w} END")
    return _s_struct(w2, _sr(s, "r1"), _sr(s, "r2"))


def _s_step1b(s: str) -> str:
    w, r1 = _sw(s), _sr(s, "r1")

    def drop(n: int) -> str:
        return _sb(_s_cut(w, n), lambda st: (
            f"CASE WHEN {_s_has_vowel(st)} THEN {_s_post1b(st, r1)}"
            f" ELSE {w} END"))

    w2 = (
        f"CASE WHEN ends_with({w}, 'eedly') THEN"
        f" CASE WHEN length({w}) - 5 >= {r1}"
        f" THEN {_s_cut(w, 5, 'ee')} ELSE {w} END"
        f" WHEN ends_with({w}, 'ingly') THEN {drop(5)}"
        f" WHEN ends_with({w}, 'edly') THEN {drop(4)}"
        f" WHEN ends_with({w}, 'eed') THEN"
        f" CASE WHEN length({w}) - 3 >= {r1}"
        f" THEN {_s_cut(w, 3, 'ee')} ELSE {w} END"
        f" WHEN ends_with({w}, 'ing') THEN {drop(3)}"
        f" WHEN ends_with({w}, 'ed') THEN {drop(2)}"
        f" ELSE {w} END")
    return _s_struct(w2, r1, _sr(s, "r2"))


def _s_post1b(st: str, r1: str) -> str:
    dbl = " OR ".join(f"ends_with({st}, '{d}')" for d in DOUBLES)
    short = f"({r1} >= length({st}) AND {_s_short_syll(st)})"
    return (
        f"CASE WHEN ends_with({st}, 'at') OR ends_with({st}, 'bl')"
        f" OR ends_with({st}, 'iz') THEN ({st} || 'e')"
        f" WHEN ({dbl}) THEN {_s_cut(st, 1)}"
        f" WHEN {short} THEN ({st} || 'e')"
        f" ELSE {st} END")


def _s_step1c(s: str) -> str:
    w = _sw(s)
    w2 = (f"CASE WHEN length({w}) > 2"
          f" AND (ends_with({w}, 'y') OR ends_with({w}, 'Y'))"
          f" AND NOT {_q_in(_s_end(w, 2), V)}"
          f" THEN {_s_cut(w, 1, 'i')} ELSE {w} END")
    return _s_struct(w2, _sr(s, "r1"), _sr(s, "r2"))


def _s_step2_tail(w: str, s: str) -> str:
    r1 = _sr(s, "r1")
    return (
        f"CASE WHEN ends_with({w}, 'ogi') THEN"
        f" CASE WHEN length({w}) - 3 >= {r1} AND length({w}) > 3"
        f" AND {_s_end(w, 4)} = 'l' THEN {_s_cut(w, 1)} ELSE {w} END"
        f" WHEN ends_with({w}, 'li') THEN"
        f" CASE WHEN length({w}) - 2 >= {r1} AND length({w}) > 2"
        f" AND {_q_in(_s_end(w, 3), LI)} THEN {_s_cut(w, 2)}"
        f" ELSE {w} END"
        f" ELSE {w} END")


def _s_step3_tail(w: str, s: str) -> str:
    return (f"CASE WHEN ends_with({w}, 'ative') THEN"
            f" CASE WHEN length({w}) - 5 >= {_sr(s, 'r2')}"
            f" THEN {_s_cut(w, 5)} ELSE {w} END ELSE {w} END")


def _s_step4_tail(w: str, s: str) -> str:
    return (f"CASE WHEN ends_with({w}, 'ion') THEN"
            f" CASE WHEN length({w}) - 3 >= {_sr(s, 'r2')}"
            f" AND length({w}) > 3 AND {_q_in(_s_end(w, 4), 'st')}"
            f" THEN {_s_cut(w, 3)} ELSE {w} END ELSE {w} END")


def _s_step5(s: str) -> str:
    w, r1, r2 = _sw(s), _sr(s, "r1"), _sr(s, "r2")
    e_del = (f"(length({w}) - 1 >= {r2} OR (length({w}) - 1 >= {r1}"
             f" AND NOT "
             + _sb(_s_cut(w, 1), lambda st: _s_short_syll(st)) + "))")
    return (
        f"CASE WHEN ends_with({w}, 'e') THEN"
        f" CASE WHEN {e_del} THEN {_s_cut(w, 1)} ELSE {w} END"
        f" WHEN ends_with({w}, 'l') THEN"
        f" CASE WHEN length({w}) - 1 >= {r2} AND length({w}) > 1"
        f" AND {_s_end(w, 2)} = 'l' THEN {_s_cut(w, 1)} ELSE {w} END"
        f" ELSE {w} END")


def stem_sql_list(arr_sql: str) -> str:
    return f"list_transform({arr_sql}, __p2t -> {stem_sql('__p2t')})"

