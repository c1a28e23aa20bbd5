"""Per-locale suffix-stripping stemmers (Snowball family), generated in
three lock-step representations from ONE rule table per locale.

The reference's ``text`` template applies per-locale snowball stemming
through ICU (server/pg/commands/create_tsdictionary.cpp:255-340, locale
option server/pg/tokenizer_options.h:88-106). This module re-expresses the
published Snowball algorithms (snowballstem.org) as declarative rule
tables — (suffix, region, replacement, conditions) per step — and GENERATES
the three representations every analyzer must keep consistent:

  * a pyspark Column expression (JVM-side, whole-stage codegen — the
    index-build hot path never leaves the executor),
  * a pure-Python function (query-time stemming of the tiny query string),
  * a DuckDB SQL fragment (states the correctness-gate oracle).

Because all three interpret the SAME rule table with the SAME semantics,
the three-way consistency invariant is exact by construction; the
differential harness (tests/test_snowball.py) fuzzes it anyway.

Documented deviations from full Snowball (a portable subset, mirroring the
repo's other locale stand-ins):
  * Rule selection is "first APPLICABLE rule wins" (longest suffix first):
    a rule whose suffix matches but whose side-condition fails falls
    through to the next rule. Snowball instead blocks a whole step when
    the longest matching suffix fails its condition, but then falls back
    to its NEXT step ("do step2 only if step1 changed nothing") — the
    within-step fallthrough here reproduces that cross-step fallback
    (e.g. es 'naciones': 'aciones'+R2 fails → residual 'es' strips) at
    the cost of occasionally stripping a shorter suffix where Snowball
    would stop.
  * Within-word capitalization passes (French/German U/Y marking) and
    rare exception lists are omitted.
  * Diacritics are folded at the END of the pipeline (ä→a, é→e, …) so
    index terms are accent-insensitive — the reference reaches the same
    user-visible behavior through ICU collation.
  * Prefix languages are in-family since Locale.prefixes landed (Irish
    initial mutations, Indonesian meN-/peN-/ber-). Czech, Polish and
    Japanese remain OUT of this framework's family: cs/pl need palatal
    alternation rewrites mid-word and ja needs dictionary segmentation
    (MeCab-class), neither expressible as anchored affix tables —
    documented deviation, matching the reference's ICU dependency.

Region definitions (Snowball's standard):
  R1 = region after the first non-vowel following a vowel; R2 = R1 of R1;
  German adjusts R1 to start at least 3 chars in. RV is per-locale
  (French: after 3rd letter when the word starts with two vowels, else
  after the first vowel not at the beginning; Spanish: the three-case
  definition; Russian: after the first vowel).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One suffix rule: strip ``suffix`` (append ``repl``) when every
    stated condition holds; if ``suffix`` matches but a condition fails,
    evaluation falls through to the next rule (first-applicable-wins —
    see the module docstring for how this maps onto Snowball's step
    sequencing)."""

    suffix: str
    region: str | None = None   # 'r1' | 'r2' | 'rv' — suffix must lie inside
    repl: str = ""
    prec: str | None = None     # preceding char exists AND is in this set
    prec_not: str | None = None  # preceding char exists AND is NOT in set
    not_prec: str | None = None  # NOT (preceding char exists and in set)
    prev2: str | None = None    # char BEFORE the preceding char exists AND
    #                             is in this set (Snowball's two-char
    #                             lookbehind, e.g. Finnish partitive 'cv')
    min_stem: int = 0           # at least this many chars must remain
    min_vowels: int = 0         # at least this many VOWELS must remain
    #                             (Indonesian's syllable-count condition:
    #                             each removal requires the residue to
    #                             keep >= 2 syllables = vowels)


@dataclass(frozen=True)
class Locale:
    name: str
    vowels: str
    steps: tuple[tuple[Rule, ...], ...]
    #: anchored PREFIX rounds, applied once each after the prelude and
    #: BEFORE region computation (initial-mutation / derivational-prefix
    #: languages: Irish eclipsis+lenition, Indonesian meN-/peN-/ber-).
    #: Rule reuse for prefixes: ``suffix`` is the prefix text, ``repl``
    #: is PREPENDED to the remainder (letter restoration: meny→s),
    #: ``prec`` constrains the char immediately AFTER the prefix,
    #: ``min_stem``/``min_vowels`` constrain the remainder. Longest
    #: prefix first, first-applicable-wins within a round.
    prefixes: tuple[tuple[Rule, ...], ...] = ()
    rv_kind: str | None = None      # 'fr' | 'es' | 'ru' (None: unused)
    r1_min3: bool = False           # German's 3-char floor before R1
    r1_kind: str | None = None      # 'hu': consonant-start words take R1
    #                                 after the FIRST VOWEL (vowel-start
    #                                 words keep the standard definition)
    prelude: tuple[tuple[str, str], ...] = ()   # literal replace pairs
    final_from: str = ""            # translate() source chars
    final_to: str = ""              # translate() target chars

    def r1_pattern(self) -> str:
        v = self.vowels
        return f"^[^{v}]*[{v}]+[^{v}](.*)$"


def _sorted(rules: tuple[Rule, ...]) -> list[Rule]:
    # longest suffix first; stable for equal lengths (table order = priority)
    return sorted(rules, key=lambda r: -len(r.suffix))


# ---------------------------------------------------------------------------
# interpreters
#
# Regions are FIXED POSITIONS computed once per word (Snowball semantics:
# R1/R2/RV are positions in the original word; stripping from the end only
# shrinks them). Each representation stages (word, r1start, r2start,
# rvstart) once, so a rule's region condition is a single integer compare
# — this keeps the generated Spark/DuckDB expression trees linear in the
# rule count instead of nesting two regexp_extracts per rule.
# ---------------------------------------------------------------------------


def _py_region_starts(loc: Locale, w: str) -> tuple[int, int, int]:
    pat = loc.r1_pattern()

    def r1(s: str) -> str:
        m = re.match(pat, s)
        return m.group(1) if m else ""

    n = len(w)
    v = loc.vowels
    r1_ = r1(w)
    r1s = n - len(r1_)
    if loc.r1_min3:
        r1s = max(r1s, 3)
    if loc.r1_kind == "hu" and w and w[0] not in v:
        # Hungarian: consonant-start word → R1 after the first vowel
        m = re.match(f"^[^{v}]+[{v}](.*)$", w)
        r1s = n - len(m.group(1)) if m else n
    r2s = n - len(r1(r1_))
    rvs = n
    v = loc.vowels
    if loc.rv_kind == "ru":
        m = re.match(f"^[^{v}]*[{v}](.*)$", w)
        rvs = n - len(m.group(1)) if m else n
    elif loc.rv_kind == "fr":
        if re.match(f"^[{v}][{v}]", w):
            rvs = min(3, n)
        else:
            m = re.match(f"^.[^{v}]*[{v}](.*)$", w)
            rvs = n - len(m.group(1)) if m else n
    elif loc.rv_kind == "es":
        if re.match(f"^.[^{v}]", w):
            m = re.match(f"^.[^{v}][^{v}]*[{v}](.*)$", w)
            rvs = n - len(m.group(1)) if m else n
        elif re.match(f"^[{v}][{v}]", w):
            m = re.match(f"^[{v}][{v}][{v}]*[^{v}](.*)$", w)
            rvs = n - len(m.group(1)) if m else n
        else:
            rvs = min(3, n)
    return r1s, r2s, rvs


def _py_step(loc: Locale, w: str, starts: tuple[int, int, int],
             rules: tuple[Rule, ...]) -> str:
    region_start = dict(zip(("r1", "r2", "rv"), starts))
    for r in _sorted(rules):
        if not w.endswith(r.suffix):
            continue
        L = len(r.suffix)
        ok = len(w) - L >= r.min_stem
        if ok and r.region:
            ok = len(w) - L >= region_start[r.region]
        pc = w[-L - 1] if len(w) > L else None
        if ok and r.prec is not None:
            ok = pc is not None and pc in r.prec
        if ok and r.prec_not is not None:
            ok = pc is not None and pc not in r.prec_not
        if ok and r.not_prec is not None:
            ok = not (pc is not None and pc in r.not_prec)
        if ok and r.prev2 is not None:
            p2 = w[-L - 2] if len(w) > L + 1 else None
            ok = p2 is not None and p2 in r.prev2
        if ok and r.min_vowels:
            ok = sum(c in loc.vowels for c in w[: len(w) - L]) >= r.min_vowels
        if ok:
            return w[: len(w) - L] + r.repl
    return w


def _py_prefix(loc: Locale, w: str, rules: tuple[Rule, ...]) -> str:
    for r in _sorted(rules):
        if not w.startswith(r.suffix):
            continue
        rest = w[len(r.suffix):]
        if len(rest) < r.min_stem:
            continue
        if r.prec is not None and not (rest and rest[0] in r.prec):
            continue
        if r.min_vowels and sum(c in loc.vowels for c in rest) < r.min_vowels:
            continue
        return r.repl + rest
    return w


def stem_py(loc: Locale, w: str) -> str:
    for a, b in loc.prelude:
        w = w.replace(a, b)
    for rnd in loc.prefixes:
        w = _py_prefix(loc, w, rnd)
    starts = _py_region_starts(loc, w)
    for step in loc.steps:
        w = _py_step(loc, w, starts, step)
    if loc.final_from:
        w = w.translate(str.maketrans(loc.final_from, loc.final_to))
    return w


# ---------------------------------------------------------------------------
# pyspark Column generator (token-level; compose with F.transform)
# ---------------------------------------------------------------------------


def _col_region_starts(loc: Locale, t: Column) -> tuple[Column, Column, Column]:
    pat = loc.r1_pattern()

    def r1len(c: Column) -> Column:
        return F.length(F.regexp_extract(c, pat, 1))

    n = F.length(t)
    v = loc.vowels
    r1_ = F.regexp_extract(t, pat, 1)
    r1s = n - F.length(r1_)
    if loc.r1_min3:
        r1s = F.greatest(r1s, F.lit(3))
    if loc.r1_kind == "hu":
        r1s = F.when(
            t.rlike(f"^[^{v}]"),
            n - F.length(F.regexp_extract(t, f"^[^{v}]+[{v}](.*)$", 1)),
        ).otherwise(r1s)
    r2s = n - r1len(r1_)
    if loc.rv_kind == "ru":
        rvs = n - F.length(F.regexp_extract(t, f"^[^{v}]*[{v}](.*)$", 1))
    elif loc.rv_kind == "fr":
        rvs = (
            F.when(t.rlike(f"^[{v}][{v}]"), F.least(F.lit(3), n))
            .otherwise(n - F.length(
                F.regexp_extract(t, f"^.[^{v}]*[{v}](.*)$", 1)))
        )
    elif loc.rv_kind == "es":
        rvs = (
            F.when(t.rlike(f"^.[^{v}]"),
                   n - F.length(F.regexp_extract(
                       t, f"^.[^{v}][^{v}]*[{v}](.*)$", 1)))
            .when(t.rlike(f"^[{v}][{v}]"),
                  n - F.length(F.regexp_extract(
                      t, f"^[{v}][{v}][{v}]*[^{v}](.*)$", 1)))
            .otherwise(F.least(F.lit(3), n))
        )
    else:
        rvs = n
    return r1s, r2s, rvs


def _col_step(loc: Locale, s: Column, rules: tuple[Rule, ...]) -> Column:
    """One step over the staged struct (w, r1s, r2s, rvs) -> new struct."""
    t = s["w"]
    start = {"r1": s["r1s"], "r2": s["r2s"], "rv": s["rvs"]}
    out = None
    for r in _sorted(rules):
        L = len(r.suffix)
        cond = t.endswith(r.suffix)
        if r.min_stem:
            cond = cond & (F.length(t) - F.lit(L) >= F.lit(r.min_stem))
        if r.region:
            cond = cond & (F.length(t) - F.lit(L) >= start[r.region])
        pc = F.substring(t, F.length(t) - F.lit(L), F.lit(1))
        has_pc = F.length(t) > F.lit(L)
        if r.prec is not None:
            cond = cond & has_pc & pc.isin(*list(r.prec))
        if r.prec_not is not None:
            cond = cond & has_pc & ~pc.isin(*list(r.prec_not))
        if r.not_prec is not None:
            cond = cond & ~(has_pc & pc.isin(*list(r.not_prec)))
        if r.prev2 is not None:
            p2 = F.substring(t, F.length(t) - F.lit(L + 1), F.lit(1))
            cond = cond & (F.length(t) > F.lit(L + 1)) \
                & p2.isin(*list(r.prev2))
        if r.min_vowels:
            stem_part = F.substring(t, F.lit(1), F.length(t) - F.lit(L))
            nv = F.length(F.regexp_replace(
                stem_part, f"[^{loc.vowels}]", ""))
            cond = cond & (nv >= F.lit(r.min_vowels))
        stripped = F.concat(
            F.substring(t, F.lit(1), F.length(t) - F.lit(L)), F.lit(r.repl))
        out = (F.when(cond, stripped) if out is None
               else out.when(cond, stripped))
    w2 = out.otherwise(t) if out is not None else t
    return F.struct(w2.alias("w"), s["r1s"].alias("r1s"),
                    s["r2s"].alias("r2s"), s["rvs"].alias("rvs"))


def _col_prefix(loc: Locale, t: Column, rules: tuple[Rule, ...]) -> Column:
    out = None
    for r in _sorted(rules):
        L = len(r.suffix)
        rest = F.substring(t, F.lit(L + 1), F.length(t))
        cond = t.startswith(r.suffix)
        if r.min_stem:
            cond = cond & (F.length(t) - F.lit(L) >= F.lit(r.min_stem))
        if r.prec is not None:
            nxt = F.substring(t, F.lit(L + 1), F.lit(1))
            cond = cond & (F.length(t) > F.lit(L)) & nxt.isin(*list(r.prec))
        if r.min_vowels:
            nv = F.length(F.regexp_replace(rest, f"[^{loc.vowels}]", ""))
            cond = cond & (nv >= F.lit(r.min_vowels))
        stripped = F.concat(F.lit(r.repl), rest)
        out = (F.when(cond, stripped) if out is None
               else out.when(cond, stripped))
    return out.otherwise(t) if out is not None else t


def stem_expr_list(loc: Locale, arr: Column) -> Column:
    """Stem every token of an array<string> Column. One F.transform per
    step: each lambda's body references only ONE step's rules, keeping
    the column-node tree linear — chaining every step into a single
    scalar expression would embed each step's full tree at every
    reference the next step makes, and the converter's recursion blows
    the JVM stack at ~100 rules."""
    for a, b in loc.prelude:
        arr = F.transform(arr, lambda t: F.replace(t, F.lit(a), F.lit(b)))

    def prefix_fn(rnd):
        return lambda t: _col_prefix(loc, t, rnd)

    for rnd in loc.prefixes:
        arr = F.transform(arr, prefix_fn(rnd))

    def stage(t: Column) -> Column:
        r1s, r2s, rvs = _col_region_starts(loc, t)
        return F.struct(t.alias("w"), r1s.alias("r1s"),
                        r2s.alias("r2s"), rvs.alias("rvs"))

    arr = F.transform(arr, stage)

    def step_fn(step):
        # NB: a 2-arg lambda in F.transform would be read as
        # (element, index) — bind the step via closure instead
        return lambda s: _col_step(loc, s, step)

    for step in loc.steps:
        arr = F.transform(arr, step_fn(step))
    arr = F.transform(arr, lambda s: s["w"])
    if loc.final_from:
        arr = F.transform(
            arr, lambda t: F.translate(t, loc.final_from, loc.final_to))
    return arr


def stem_expr(loc: Locale, t: Column) -> Column:
    """Single-token Column stemmer (rides the array path so the
    expression stays step-linear)."""
    return F.element_at(stem_expr_list(loc, F.array(t)), 1)


# ---------------------------------------------------------------------------
# DuckDB SQL generator (token-level; compose with list_transform)
# ---------------------------------------------------------------------------


def _sql_region_starts(loc: Locale, t: str) -> tuple[str, str, str]:
    pat = loc.r1_pattern()
    r1frag = f"regexp_extract({t}, '{pat}', 1)"
    r1s = f"(length({t}) - length({r1frag}))"
    if loc.r1_min3:
        r1s = f"greatest({r1s}, 3)"
    if loc.r1_kind == "hu":
        v0 = loc.vowels
        r1s = (
            f"CASE WHEN regexp_matches({t}, '^[^{v0}]')"
            f" THEN length({t}) - length(regexp_extract({t},"
            f" '^[^{v0}]+[{v0}](.*)$', 1)) ELSE {r1s} END"
        )
    r2s = (f"(length({t}) - length(regexp_extract({r1frag}, '{pat}', 1)))")
    v = loc.vowels
    if loc.rv_kind == "ru":
        rvs = (f"(length({t}) - length(regexp_extract({t},"
               f" '^[^{v}]*[{v}](.*)$', 1)))")
    elif loc.rv_kind == "fr":
        rvs = (
            f"CASE WHEN regexp_matches({t}, '^[{v}][{v}]')"
            f" THEN least(3, length({t}))"
            f" ELSE length({t}) - length(regexp_extract({t},"
            f" '^.[^{v}]*[{v}](.*)$', 1)) END"
        )
    elif loc.rv_kind == "es":
        rvs = (
            f"CASE WHEN regexp_matches({t}, '^.[^{v}]')"
            f" THEN length({t}) - length(regexp_extract({t},"
            f" '^.[^{v}][^{v}]*[{v}](.*)$', 1))"
            f" WHEN regexp_matches({t}, '^[{v}][{v}]')"
            f" THEN length({t}) - length(regexp_extract({t},"
            f" '^[{v}][{v}][{v}]*[^{v}](.*)$', 1))"
            f" ELSE least(3, length({t})) END"
        )
    else:
        rvs = f"length({t})"
    return r1s, r2s, rvs


def _sql_in_set(ch_expr: str, chars: str) -> str:
    lst = ", ".join(f"'{c}'" for c in chars)
    return f"{ch_expr} IN ({lst})"


def _sql_step(loc: Locale, s: str, rules: tuple[Rule, ...]) -> str:
    """One step over the staged struct var `s` with fields w/r1s/r2s/rvs;
    returns the SQL for the new struct."""
    t = f"{s}.w"
    start = {"r1": f"{s}.r1s", "r2": f"{s}.r2s", "rv": f"{s}.rvs"}
    whens = []
    for r in _sorted(rules):
        L = len(r.suffix)
        conds = [f"{t} LIKE '%{r.suffix}'"]
        if r.min_stem:
            conds.append(f"length({t}) - {L} >= {r.min_stem}")
        if r.region:
            conds.append(f"length({t}) - {L} >= {start[r.region]}")
        pc = f"substr({t}, length({t}) - {L}, 1)"
        has = f"length({t}) > {L}"
        if r.prec is not None:
            conds.append(f"({has} AND {_sql_in_set(pc, r.prec)})")
        if r.prec_not is not None:
            conds.append(f"({has} AND NOT {_sql_in_set(pc, r.prec_not)})")
        if r.not_prec is not None:
            conds.append(f"NOT ({has} AND {_sql_in_set(pc, r.not_prec)})")
        if r.prev2 is not None:
            p2 = f"substr({t}, length({t}) - {L + 1}, 1)"
            conds.append(
                f"(length({t}) > {L + 1} AND {_sql_in_set(p2, r.prev2)})")
        if r.min_vowels:
            stem_part = f"substr({t}, 1, length({t}) - {L})"
            conds.append(
                f"length(regexp_replace({stem_part}, '[^{loc.vowels}]',"
                f" '', 'g')) >= {r.min_vowels}")
        strip = f"substr({t}, 1, length({t}) - {L}) || '{r.repl}'"
        whens.append(f"WHEN {' AND '.join(conds)} THEN {strip}")
    w2 = t if not whens else "CASE " + " ".join(whens) + f" ELSE {t} END"
    return (f"{{'w': {w2}, 'r1s': {s}.r1s, 'r2s': {s}.r2s,"
            f" 'rvs': {s}.rvs}}")


def stem_sql_list(loc: Locale, list_expr: str) -> str:
    """Stem every token of a DuckDB list expression. One list_transform
    per step keeps each lambda's references to its argument LINEAR in the
    rule count (nesting the full cascade into one expression would copy
    the inner expression once per outer reference — exponential)."""
    out = list_expr
    for a, b in loc.prelude:
        out = f"list_transform({out}, t -> replace(t, '{a}', '{b}'))"
    for rnd in loc.prefixes:
        whens = []
        for r in _sorted(rnd):
            L = len(r.suffix)
            rest = f"substr(t, {L + 1})"
            conds = [f"t LIKE '{r.suffix}%'"]
            if r.min_stem:
                conds.append(f"length(t) - {L} >= {r.min_stem}")
            if r.prec is not None:
                conds.append(
                    f"(length(t) > {L} AND "
                    f"{_sql_in_set(f'substr(t, {L + 1}, 1)', r.prec)})")
            if r.min_vowels:
                conds.append(
                    f"length(regexp_replace({rest}, '[^{loc.vowels}]',"
                    f" '', 'g')) >= {r.min_vowels}")
            whens.append(f"WHEN {' AND '.join(conds)}"
                         f" THEN '{r.repl}' || {rest}")
        case = "CASE " + " ".join(whens) + " ELSE t END"
        out = f"list_transform({out}, t -> {case})"
    r1s, r2s, rvs = _sql_region_starts(loc, "t")
    out = (f"list_transform({out}, t -> {{'w': t, 'r1s': {r1s},"
           f" 'r2s': {r2s}, 'rvs': {rvs}}})")
    for step in loc.steps:
        out = f"list_transform({out}, s -> {_sql_step(loc, 's', step)})"
    out = f"list_transform({out}, s -> s.w)"
    if loc.final_from:
        out = (f"list_transform({out}, t -> translate(t,"
               f" '{loc.final_from}', '{loc.final_to}'))")
    return out


# ---------------------------------------------------------------------------
# locale rule tables (published Snowball algorithms, portable subset)
# ---------------------------------------------------------------------------

_DE_V = "aeiouyäöü"
GERMAN = Locale(
    name="de",
    vowels=_DE_V,
    r1_min3=True,
    prelude=(("ß", "ss"),),
    steps=(
        # step 1: plural/case endings
        (
            Rule("ern", "r1"), Rule("em", "r1"), Rule("er", "r1"),
            Rule("en", "r1"), Rule("es", "r1"), Rule("e", "r1"),
            Rule("s", "r1", prec="bdfghklmnrt"),
        ),
        # step 2: comparative/superlative + verbal st
        (
            Rule("est", "r1"), Rule("en", "r1"), Rule("er", "r1"),
            Rule("st", "r1", prec="bdfghklmnt", min_stem=3),
        ),
        # step 3: derivational suffixes (d-suffixes, R2)
        (
            Rule("isch", "r2", not_prec="e"), Rule("lich", "r2"),
            Rule("heit", "r2"), Rule("keit", "r2"),
            Rule("end", "r2"), Rule("ung", "r2"),
            Rule("ig", "r2", not_prec="e"), Rule("ik", "r2", not_prec="e"),
        ),
    ),
    final_from="äöü",
    final_to="aou",
)

_FR_V = "aeiouyâàëéêèïîôûù"
FRENCH = Locale(
    name="fr",
    vowels=_FR_V,
    rv_kind="fr",
    steps=(
        # single removal pass: standard suffixes ∪ verb suffixes,
        # longest-match-first (Snowball tries these as alternative steps;
        # union keeps exactly one removal)
        (
            # standard (mostly R2)
            Rule("issements", "r1", prec_not=_FR_V),
            Rule("issement", "r1", prec_not=_FR_V),
            Rule("atrices", "r2"), Rule("atrice", "r2"),
            Rule("ateurs", "r2"), Rule("ateur", "r2"),
            Rule("ations", "r2"), Rule("ation", "r2"),
            Rule("logies", "r2", repl="log"),
            Rule("logie", "r2", repl="log"),
            Rule("ismes", "r2"), Rule("isme", "r2"),
            Rule("ances", "r2"), Rule("ance", "r2"),
            Rule("iques", "r2"), Rule("ique", "r2"),
            Rule("istes", "r2"), Rule("iste", "r2"),
            Rule("ables", "r2"), Rule("able", "r2"),
            Rule("ences", "r2", repl="ent"), Rule("ence", "r2", repl="ent"),
            Rule("ements", "rv"), Rule("ement", "rv"),
            Rule("euses", "r2"), Rule("euse", "r2"),
            Rule("ités", "r2"), Rule("ité", "r2"),
            Rule("ives", "r2"), Rule("ive", "r2"),
            Rule("ifs", "r2"), Rule("if", "r2"),
            Rule("eaux", repl="eau"), Rule("aux", "r1", repl="al"),
            Rule("eux", "r2"),
            Rule("amment", "rv", repl="ant"),
            Rule("emment", "rv", repl="ent"),
            Rule("ments", "rv", prec=_FR_V), Rule("ment", "rv", prec=_FR_V),
            # i-verbs (RV, preceded by a non-vowel)
            Rule("issaient", "rv", prec_not=_FR_V),
            Rule("issantes", "rv", prec_not=_FR_V),
            Rule("issante", "rv", prec_not=_FR_V),
            Rule("issants", "rv", prec_not=_FR_V),
            Rule("issant", "rv", prec_not=_FR_V),
            Rule("issions", "rv", prec_not=_FR_V),
            Rule("issiez", "rv", prec_not=_FR_V),
            Rule("issais", "rv", prec_not=_FR_V),
            Rule("issait", "rv", prec_not=_FR_V),
            Rule("issons", "rv", prec_not=_FR_V),
            Rule("issez", "rv", prec_not=_FR_V),
            Rule("isses", "rv", prec_not=_FR_V),
            Rule("isse", "rv", prec_not=_FR_V),
            Rule("irent", "rv", prec_not=_FR_V),
            Rule("irais", "rv", prec_not=_FR_V),
            Rule("irait", "rv", prec_not=_FR_V),
            Rule("irions", "rv", prec_not=_FR_V),
            Rule("iraient", "rv", prec_not=_FR_V),
            Rule("iriez", "rv", prec_not=_FR_V),
            Rule("irons", "rv", prec_not=_FR_V),
            Rule("iront", "rv", prec_not=_FR_V),
            Rule("irez", "rv", prec_not=_FR_V),
            Rule("irai", "rv", prec_not=_FR_V),
            Rule("iras", "rv", prec_not=_FR_V),
            Rule("ira", "rv", prec_not=_FR_V),
            Rule("îmes", "rv", prec_not=_FR_V),
            Rule("îtes", "rv", prec_not=_FR_V),
            Rule("ît", "rv", prec_not=_FR_V),
            Rule("ies", "rv", prec_not=_FR_V),
            Rule("ie", "rv", prec_not=_FR_V),
            Rule("ir", "rv", prec_not=_FR_V),
            Rule("is", "rv", prec_not=_FR_V),
            Rule("it", "rv", prec_not=_FR_V),
            Rule("i", "rv", prec_not=_FR_V),
            # e/a-verbs (RV)
            Rule("eraient", "rv"), Rule("erions", "rv"),
            Rule("èrent", "rv"), Rule("erais", "rv"), Rule("erait", "rv"),
            Rule("eriez", "rv"), Rule("erons", "rv"), Rule("eront", "rv"),
            Rule("erai", "rv"), Rule("eras", "rv"), Rule("era", "rv"),
            Rule("ées", "rv"), Rule("ée", "rv"), Rule("és", "rv"),
            Rule("ez", "rv"), Rule("er", "rv"), Rule("é", "rv"),
            Rule("assions", "rv"), Rule("assiez", "rv"),
            Rule("assent", "rv"), Rule("asses", "rv"), Rule("asse", "rv"),
            Rule("antes", "rv"), Rule("ante", "rv"), Rule("ants", "rv"),
            Rule("ant", "rv"),
            Rule("âmes", "rv"), Rule("âtes", "rv"), Rule("ât", "rv"),
            Rule("aient", "rv"), Rule("ais", "rv"), Rule("ait", "rv"),
            Rule("ai", "rv"), Rule("as", "rv"), Rule("a", "rv"),
        ),
        # residual
        (
            Rule("ière", repl="i"), Rule("ier", repl="i"),
            Rule("e", "rv"),
            Rule("s", not_prec="aiouès", min_stem=1),
        ),
    ),
    final_from="âàëéêèïîôûùç",
    final_to="aaeeeeiiouuc",
)

_ES_V = "aeiouáéíóúü"
SPANISH = Locale(
    name="es",
    vowels=_ES_V,
    rv_kind="es",
    steps=(
        # single removal pass: standard (R2) ∪ verb (RV) suffixes
        (
            Rule("amientos", "r2"), Rule("imientos", "r2"),
            Rule("amiento", "r2"), Rule("imiento", "r2"),
            Rule("aciones", "r2"), Rule("ación", "r2"),
            Rule("acion", "r2"),
            Rule("uciones", "r2", repl="u"), Rule("ución", "r2", repl="u"),
            Rule("ucion", "r2", repl="u"),
            Rule("logías", "r2", repl="log"),
            Rule("logía", "r2", repl="log"),
            Rule("logias", "r2", repl="log"),
            Rule("logia", "r2", repl="log"),
            Rule("encias", "r2", repl="ente"),
            Rule("encia", "r2", repl="ente"),
            Rule("idades", "r2"), Rule("idad", "r2"),
            Rule("anzas", "r2"), Rule("anza", "r2"),
            Rule("ismos", "r2"), Rule("ismo", "r2"),
            Rule("ables", "r2"), Rule("able", "r2"),
            Rule("ibles", "r2"), Rule("ible", "r2"),
            Rule("istas", "r2"), Rule("ista", "r2"),
            Rule("osos", "r2"), Rule("osas", "r2"),
            Rule("oso", "r2"), Rule("osa", "r2"),
            Rule("icos", "r2"), Rule("icas", "r2"),
            Rule("ico", "r2"), Rule("ica", "r2"),
            Rule("adoras", "r2"), Rule("adores", "r2"),
            Rule("adora", "r2"), Rule("ador", "r2"),
            Rule("antes", "r2"), Rule("ante", "r2"),
            Rule("ancias", "r2"), Rule("ancia", "r2"),
            Rule("ivas", "r2"), Rule("ivos", "r2"),
            Rule("iva", "r2"), Rule("ivo", "r2"),
            Rule("ezas", "r2"), Rule("eza", "r2"),
            Rule("amente", "r1"), Rule("mente", "r2"),
            # verb suffixes (RV)
            Rule("aríamos", "rv"), Rule("eríamos", "rv"),
            Rule("iríamos", "rv"), Rule("iéramos", "rv"),
            Rule("iésemos", "rv"),
            Rule("aríais", "rv"), Rule("eríais", "rv"),
            Rule("iríais", "rv"), Rule("ierais", "rv"),
            Rule("ieseis", "rv"), Rule("asteis", "rv"),
            Rule("isteis", "rv"),
            Rule("aremos", "rv"), Rule("eremos", "rv"),
            Rule("iremos", "rv"), Rule("áramos", "rv"),
            Rule("ásemos", "rv"), Rule("ábamos", "rv"),
            Rule("arían", "rv"), Rule("arías", "rv"), Rule("aréis", "rv"),
            Rule("erían", "rv"), Rule("erías", "rv"), Rule("eréis", "rv"),
            Rule("irían", "rv"), Rule("irías", "rv"), Rule("iréis", "rv"),
            Rule("ieran", "rv"), Rule("iesen", "rv"), Rule("ieron", "rv"),
            Rule("iendo", "rv"), Rule("ieras", "rv"), Rule("ieses", "rv"),
            Rule("abais", "rv"), Rule("arais", "rv"), Rule("aseis", "rv"),
            Rule("íamos", "rv"),
            Rule("aría", "rv"), Rule("arás", "rv"), Rule("ará", "rv"),
            Rule("aré", "rv"),
            Rule("ería", "rv"), Rule("erás", "rv"), Rule("erá", "rv"),
            Rule("eré", "rv"),
            Rule("iría", "rv"), Rule("irás", "rv"), Rule("irá", "rv"),
            Rule("iré", "rv"),
            Rule("aban", "rv"), Rule("aran", "rv"), Rule("asen", "rv"),
            Rule("aron", "rv"), Rule("ando", "rv"),
            Rule("abas", "rv"), Rule("adas", "rv"), Rule("idas", "rv"),
            Rule("aras", "rv"), Rule("ases", "rv"), Rule("íais", "rv"),
            Rule("ados", "rv"), Rule("idos", "rv"), Rule("amos", "rv"),
            Rule("emos", "rv"), Rule("imos", "rv"),
            Rule("iera", "rv"), Rule("iese", "rv"), Rule("aste", "rv"),
            Rule("iste", "rv"), Rule("aba", "rv"), Rule("ada", "rv"),
            Rule("ida", "rv"), Rule("ara", "rv"), Rule("ase", "rv"),
            Rule("ían", "rv"), Rule("ado", "rv"), Rule("ido", "rv"),
            Rule("ías", "rv"), Rule("áis", "rv"), Rule("éis", "rv"),
            Rule("ía", "rv"), Rule("ad", "rv"), Rule("ed", "rv"),
            Rule("id", "rv"), Rule("an", "rv"), Rule("ió", "rv"),
            Rule("ar", "rv"), Rule("er", "rv"), Rule("ir", "rv"),
            Rule("as", "rv"), Rule("ís", "rv"), Rule("en", "rv"),
            Rule("es", "rv"),
        ),
        # residual vowels (RV)
        (
            Rule("os", "rv"), Rule("a", "rv"), Rule("o", "rv"),
            Rule("á", "rv"), Rule("í", "rv"), Rule("ó", "rv"),
            Rule("e", "rv"), Rule("é", "rv"),
        ),
    ),
    final_from="áéíóúü",
    final_to="aeiouu",
)

_RU_V = "аеиоуыэюя"
RUSSIAN = Locale(
    name="ru",
    vowels=_RU_V,
    rv_kind="ru",
    steps=(
        # perfective gerund
        (
            Rule("ившись", "rv"), Rule("ывшись", "rv"),
            Rule("вшись", "rv", prec="ая"),
            Rule("ивши", "rv"), Rule("ывши", "rv"),
            Rule("вши", "rv", prec="ая"),
            Rule("ив", "rv"), Rule("ыв", "rv"),
            Rule("в", "rv", prec="ая"),
        ),
        # reflexive
        (Rule("ся", "rv"), Rule("сь", "rv")),
        # adjectival ∪ participle ∪ verb ∪ noun — one removal,
        # longest-match-first
        (
            # adjective endings
            Rule("ими", "rv"), Rule("ыми", "rv"),
            Rule("его", "rv"), Rule("ого", "rv"),
            Rule("ему", "rv"), Rule("ому", "rv"),
            Rule("ее", "rv"), Rule("ие", "rv"), Rule("ые", "rv"),
            Rule("ое", "rv"), Rule("ей", "rv"), Rule("ий", "rv"),
            Rule("ый", "rv"), Rule("ой", "rv"), Rule("ем", "rv"),
            Rule("им", "rv"), Rule("ым", "rv"), Rule("ом", "rv"),
            Rule("их", "rv"), Rule("ых", "rv"), Rule("ую", "rv"),
            Rule("юю", "rv"), Rule("ая", "rv"), Rule("яя", "rv"),
            Rule("ою", "rv"), Rule("ею", "rv"),
            # participle
            Rule("ивш", "rv"), Rule("ывш", "rv"), Rule("ующ", "rv"),
            Rule("вш", "rv", prec="ая"), Rule("ющ", "rv", prec="ая"),
            Rule("щ", "rv", prec="ая"),
            # verb endings
            Rule("ейте", "rv"), Rule("уйте", "rv"),
            Rule("ила", "rv"), Rule("ыла", "rv"), Rule("ена", "rv"),
            Rule("ите", "rv"), Rule("или", "rv"), Rule("ыли", "rv"),
            Rule("ило", "rv"), Rule("ыло", "rv"), Rule("ено", "rv"),
            Rule("ует", "rv"), Rule("уют", "rv"), Rule("ены", "rv"),
            Rule("ить", "rv"), Rule("ыть", "rv"), Rule("ишь", "rv"),
            Rule("ил", "rv"), Rule("ыл", "rv"), Rule("ей", "rv"),
            Rule("уй", "rv"), Rule("ен", "rv"), Rule("ят", "rv"),
            Rule("ит", "rv"), Rule("ыт", "rv"), Rule("ую", "rv"),
            Rule("ю", "rv", prec="ая"),
            Rule("ете", "rv", prec="ая"), Rule("йте", "rv", prec="ая"),
            Rule("ла", "rv", prec="ая"), Rule("на", "rv", prec="ая"),
            Rule("ли", "rv", prec="ая"), Rule("ло", "rv", prec="ая"),
            Rule("но", "rv", prec="ая"), Rule("ет", "rv", prec="ая"),
            Rule("ют", "rv", prec="ая"), Rule("ны", "rv", prec="ая"),
            Rule("ть", "rv", prec="ая"), Rule("ешь", "rv", prec="ая"),
            Rule("нно", "rv", prec="ая"),
            Rule("й", "rv", prec="ая"), Rule("л", "rv", prec="ая"),
            Rule("н", "rv", prec="ая"),
            # noun endings
            Rule("иями", "rv"), Rule("ями", "rv"), Rule("ами", "rv"),
            Rule("ией", "rv"), Rule("иям", "rv"), Rule("ием", "rv"),
            Rule("иях", "rv"), Rule("ию", "rv"), Rule("ья", "rv"),
            Rule("ье", "rv"), Rule("ьи", "rv"), Rule("ью", "rv"),
            Rule("еи", "rv"), Rule("ии", "rv"), Rule("ев", "rv"),
            Rule("ов", "rv"), Rule("ам", "rv"), Rule("ах", "rv"),
            Rule("ях", "rv"), Rule("ям", "rv"), Rule("ия", "rv"),
            Rule("а", "rv"), Rule("е", "rv"), Rule("и", "rv"),
            Rule("й", "rv"), Rule("о", "rv"), Rule("у", "rv"),
            Rule("ы", "rv"), Rule("ь", "rv"), Rule("ю", "rv"),
            Rule("я", "rv"),
        ),
        # tidy-up: trailing и, derivational ост/ость (R2), superlative,
        # undouble н, soft sign
        (Rule("и", "rv"),),
        (Rule("ость", "r2"), Rule("ост", "r2")),
        (Rule("ейше", "rv"), Rule("ейш", "rv")),
        (Rule("нн", "rv", repl="н"),),
        (Rule("ь", "rv"),),
    ),
)

_IT_V = "aeiouàèìòù"
ITALIAN = Locale(
    name="it",
    vowels=_IT_V,
    rv_kind="es",   # Snowball defines it/pt RV identically to Spanish
    steps=(
        # single removal pass: standard (R2/R1) ∪ verb (RV) suffixes
        # (attached-pronoun step 0 omitted — portable subset)
        (
            Rule("amente", "r1"), Rule("mente", "r2"),
            Rule("atrice", "r2"), Rule("atrici", "r2"),
            Rule("azione", "r2"), Rule("azioni", "r2"),
            Rule("atore", "r2"), Rule("atori", "r2"),
            Rule("uzione", "r2"), Rule("uzioni", "r2"),
            Rule("usione", "r2"), Rule("usioni", "r2"),
            Rule("logia", "r2", repl="log"),
            Rule("logie", "r2", repl="log"),
            Rule("enza", "r2", repl="ente"),
            Rule("enze", "r2", repl="ente"),
            Rule("amento", "rv"), Rule("amenti", "rv"),
            Rule("imento", "rv"), Rule("imenti", "rv"),
            Rule("abile", "r2"), Rule("abili", "r2"),
            Rule("ibile", "r2"), Rule("ibili", "r2"),
            Rule("ista", "r2"), Rule("iste", "r2"), Rule("isti", "r2"),
            Rule("ismo", "r2"), Rule("ismi", "r2"),
            Rule("oso", "r2"), Rule("osi", "r2"),
            Rule("osa", "r2"), Rule("ose", "r2"),
            Rule("iche", "r2"), Rule("ichi", "r2"),
            Rule("ico", "r2"), Rule("ici", "r2"),
            Rule("ica", "r2"), Rule("ice", "r2"),
            Rule("ità", "r2"),
            Rule("ivo", "r2"), Rule("ivi", "r2"),
            Rule("iva", "r2"), Rule("ive", "r2"),
            Rule("ante", "r2"), Rule("anti", "r2"),
            # verb suffixes (RV)
            Rule("erebbero", "rv"), Rule("irebbero", "rv"),
            Rule("assero", "rv"), Rule("assimo", "rv"),
            Rule("eranno", "rv"), Rule("erebbe", "rv"),
            Rule("eremmo", "rv"), Rule("ereste", "rv"),
            Rule("eresti", "rv"), Rule("essero", "rv"),
            Rule("iranno", "rv"), Rule("irebbe", "rv"),
            Rule("iremmo", "rv"), Rule("ireste", "rv"),
            Rule("iresti", "rv"), Rule("iscano", "rv"),
            Rule("iscono", "rv"), Rule("issero", "rv"),
            Rule("arono", "rv"), Rule("avamo", "rv"), Rule("avano", "rv"),
            Rule("avate", "rv"), Rule("eremo", "rv"), Rule("erete", "rv"),
            Rule("erono", "rv"), Rule("evamo", "rv"), Rule("evano", "rv"),
            Rule("evate", "rv"), Rule("iremo", "rv"), Rule("irete", "rv"),
            Rule("irono", "rv"), Rule("ivamo", "rv"), Rule("ivano", "rv"),
            Rule("ivate", "rv"),
            Rule("ammo", "rv"), Rule("ando", "rv"), Rule("asse", "rv"),
            Rule("assi", "rv"), Rule("emmo", "rv"), Rule("enda", "rv"),
            Rule("ende", "rv"), Rule("endi", "rv"), Rule("endo", "rv"),
            Rule("erai", "rv"), Rule("erei", "rv"), Rule("iamo", "rv"),
            Rule("immo", "rv"), Rule("irai", "rv"), Rule("irei", "rv"),
            Rule("isca", "rv"), Rule("isce", "rv"), Rule("isci", "rv"),
            Rule("isco", "rv"),
            Rule("ano", "rv"), Rule("are", "rv"), Rule("ata", "rv"),
            Rule("ate", "rv"), Rule("ati", "rv"), Rule("ato", "rv"),
            Rule("ava", "rv"), Rule("avi", "rv"), Rule("avo", "rv"),
            Rule("erà", "rv"), Rule("erò", "rv"), Rule("ere", "rv"),
            Rule("ete", "rv"), Rule("eva", "rv"), Rule("evi", "rv"),
            Rule("evo", "rv"), Rule("irà", "rv"), Rule("irò", "rv"),
            Rule("ire", "rv"), Rule("ita", "rv"), Rule("ite", "rv"),
            Rule("iti", "rv"), Rule("ito", "rv"), Rule("iva", "rv"),
            Rule("ivi", "rv"), Rule("ivo", "rv"), Rule("ono", "rv"),
            Rule("uta", "rv"), Rule("ute", "rv"), Rule("uti", "rv"),
            Rule("uto", "rv"),
            Rule("ar", "rv"), Rule("ir", "rv"),
        ),
        # residual vowel (3a), then a second trailing i exposed by it
        (
            Rule("a", "rv"), Rule("e", "rv"), Rule("i", "rv"),
            Rule("o", "rv"), Rule("à", "rv"), Rule("è", "rv"),
            Rule("ì", "rv"), Rule("ò", "rv"),
        ),
        (Rule("i", "rv"),),
        # 3b: ch/gh -> c/g
        (Rule("ch", "rv", repl="c"), Rule("gh", "rv", repl="g")),
    ),
    final_from="àèìòùáéíóú",
    final_to="aeiouaeiou",
)

_PT_V = "aeiouáéíóúâêôãõ"
PORTUGUESE = Locale(
    name="pt",
    vowels=_PT_V,
    rv_kind="es",
    steps=(
        # single removal pass: standard (R2/R1) ∪ verb (RV) suffixes
        (
            Rule("amente", "r1"), Rule("mente", "r2"),
            Rule("ezas", "r2"), Rule("eza", "r2"),
            Rule("icos", "r2"), Rule("icas", "r2"),
            Rule("ico", "r2"), Rule("ica", "r2"),
            Rule("ismos", "r2"), Rule("ismo", "r2"),
            Rule("áveis", "r2"), Rule("ável", "r2"),
            Rule("íveis", "r2"), Rule("ível", "r2"),
            Rule("istas", "r2"), Rule("ista", "r2"),
            Rule("osos", "r2"), Rule("osas", "r2"),
            Rule("oso", "r2"), Rule("osa", "r2"),
            Rule("amentos", "r2"), Rule("imentos", "r2"),
            Rule("amento", "r2"), Rule("imento", "r2"),
            Rule("adoras", "r2"), Rule("adores", "r2"),
            Rule("adora", "r2"), Rule("ador", "r2"),
            Rule("ações", "r2"), Rule("ação", "r2"),
            Rule("uções", "r2", repl="u"), Rule("ução", "r2", repl="u"),
            Rule("logias", "r2", repl="log"),
            Rule("logia", "r2", repl="log"),
            Rule("ências", "r2", repl="ente"),
            Rule("ência", "r2", repl="ente"),
            Rule("antes", "r2"), Rule("ante", "r2"),
            Rule("âncias", "r2"), Rule("ância", "r2"),
            Rule("idades", "r2"), Rule("idade", "r2"),
            Rule("ivas", "r2"), Rule("ivos", "r2"),
            Rule("iva", "r2"), Rule("ivo", "r2"),
            Rule("iras", "rv", prec="e", repl="ir"),
            Rule("ira", "rv", prec="e", repl="ir"),
            # verb suffixes (RV)
            Rule("aríamos", "rv"), Rule("eríamos", "rv"),
            Rule("iríamos", "rv"), Rule("ássemos", "rv"),
            Rule("êssemos", "rv"), Rule("íssemos", "rv"),
            Rule("aríeis", "rv"), Rule("eríeis", "rv"),
            Rule("iríeis", "rv"), Rule("ásseis", "rv"),
            Rule("ésseis", "rv"), Rule("ísseis", "rv"),
            Rule("áramos", "rv"), Rule("éramos", "rv"),
            Rule("íramos", "rv"), Rule("ávamos", "rv"),
            Rule("aremos", "rv"), Rule("eremos", "rv"),
            Rule("iremos", "rv"),
            Rule("ariam", "rv"), Rule("eriam", "rv"), Rule("iriam", "rv"),
            Rule("assem", "rv"), Rule("essem", "rv"), Rule("issem", "rv"),
            Rule("arão", "rv"), Rule("erão", "rv"), Rule("irão", "rv"),
            Rule("arias", "rv"), Rule("erias", "rv"), Rule("irias", "rv"),
            Rule("ardes", "rv"), Rule("erdes", "rv"), Rule("irdes", "rv"),
            Rule("asses", "rv"), Rule("esses", "rv"), Rule("isses", "rv"),
            Rule("astes", "rv"), Rule("estes", "rv"), Rule("istes", "rv"),
            Rule("áreis", "rv"), Rule("éreis", "rv"), Rule("íreis", "rv"),
            Rule("áveis", "rv"), Rule("íeis", "rv"),
            Rule("aria", "rv"), Rule("eria", "rv"), Rule("iria", "rv"),
            Rule("asse", "rv"), Rule("esse", "rv"), Rule("isse", "rv"),
            Rule("aste", "rv"), Rule("este", "rv"), Rule("iste", "rv"),
            Rule("arei", "rv"), Rule("erei", "rv"), Rule("irei", "rv"),
            Rule("aram", "rv"), Rule("eram", "rv"), Rule("iram", "rv"),
            Rule("avam", "rv"), Rule("arem", "rv"), Rule("erem", "rv"),
            Rule("irem", "rv"),
            Rule("ando", "rv"), Rule("endo", "rv"), Rule("indo", "rv"),
            Rule("adas", "rv"), Rule("idas", "rv"),
            Rule("arás", "rv"), Rule("aras", "rv"), Rule("erás", "rv"),
            Rule("eras", "rv"), Rule("irás", "rv"),
            Rule("avas", "rv"), Rule("ares", "rv"), Rule("eres", "rv"),
            Rule("ires", "rv"),
            Rule("ados", "rv"), Rule("idos", "rv"),
            Rule("ámos", "rv"), Rule("amos", "rv"), Rule("emos", "rv"),
            Rule("imos", "rv"), Rule("iras", "rv"),
            Rule("ada", "rv"), Rule("ida", "rv"),
            Rule("ará", "rv"), Rule("ara", "rv"), Rule("erá", "rv"),
            Rule("era", "rv"), Rule("irá", "rv"),
            Rule("ava", "rv"), Rule("iam", "rv"),
            Rule("ado", "rv"), Rule("ido", "rv"),
            Rule("ias", "rv"), Rule("ais", "rv"), Rule("eis", "rv"),
            Rule("ira", "rv"), Rule("ia", "rv"), Rule("ei", "rv"),
            Rule("am", "rv"), Rule("em", "rv"),
            Rule("ar", "rv"), Rule("er", "rv"), Rule("ir", "rv"),
            Rule("as", "rv"), Rule("es", "rv"), Rule("is", "rv"),
            Rule("eu", "rv"), Rule("iu", "rv"), Rule("ou", "rv"),
        ),
        # step 3: i preceded by c (RV)
        (Rule("i", "rv", prec="c"),),
        # residual suffix (step 4) + final e/é/ê (step 5), one pass each
        (
            Rule("os", "rv"), Rule("a", "rv"), Rule("i", "rv"),
            Rule("o", "rv"), Rule("á", "rv"), Rule("í", "rv"),
            Rule("ó", "rv"),
        ),
        (Rule("e", "rv"), Rule("é", "rv"), Rule("ê", "rv")),
    ),
    final_from="áéíóúâêôãõàèç",
    final_to="aeiouaeoaoaec",
)

_NL_V = "aeiouyè"
DUTCH = Locale(
    name="nl",
    vowels=_NL_V,
    r1_min3=True,
    prelude=(("ä", "a"), ("ë", "e"), ("ï", "i"), ("ö", "o"), ("ü", "u"),
             ("á", "a"), ("é", "e"), ("í", "i"), ("ó", "o"), ("ú", "u")),
    steps=(
        # step 1: heden -> heid; en-endings; s-endings
        (
            Rule("heden", "r1", repl="heid"),
            Rule("ene", "r1", prec_not=_NL_V),
            Rule("en", "r1", prec_not=_NL_V),
            Rule("se", "r1", prec_not=_NL_V + "j"),
            Rule("s", "r1", prec_not=_NL_V + "j"),
        ),
        # step 3a: heid (not preceded by c)
        (Rule("heid", "r2", not_prec="c"),),
        # step 3b: d-suffixes
        (
            Rule("baar", "r2"), Rule("lijk", "r2"),
            Rule("end", "r2"), Rule("ing", "r2"),
            Rule("bar", "r2"),
        ),
        (Rule("ig", "r2", not_prec="e"),),
        # step 2: final e after a consonant
        (Rule("e", "r1", prec_not=_NL_V),),
        # undouble kk/dd/tt exposed by a removal (portable subset: global —
        # native Dutch words do not end in these clusters un-suffixed)
        (Rule("kk", repl="k"), Rule("dd", repl="d"), Rule("tt", repl="t")),
    ),
)

_SV_V = "aeiouyäåö"
SWEDISH = Locale(
    name="sv",
    vowels=_SV_V,
    r1_min3=True,
    steps=(
        # step 1: a-suffixes (R1) + s preceded by a valid s-ending
        (
            Rule("heterna", "r1"), Rule("hetens", "r1"),
            Rule("anden", "r1"), Rule("arnas", "r1"), Rule("ernas", "r1"),
            Rule("ornas", "r1"), Rule("arens", "r1"), Rule("heten", "r1"),
            Rule("heter", "r1"), Rule("andet", "r1"), Rule("andes", "r1"),
            Rule("arna", "r1"), Rule("erna", "r1"), Rule("orna", "r1"),
            Rule("ande", "r1"), Rule("arne", "r1"), Rule("aste", "r1"),
            Rule("aren", "r1"), Rule("ades", "r1"),
            Rule("ade", "r1"), Rule("are", "r1"), Rule("ern", "r1"),
            Rule("ens", "r1"), Rule("het", "r1"), Rule("ast", "r1"),
            Rule("ad", "r1"), Rule("en", "r1"), Rule("ar", "r1"),
            Rule("er", "r1"), Rule("or", "r1"), Rule("as", "r1"),
            Rule("es", "r1"), Rule("at", "r1"),
            Rule("a", "r1"), Rule("e", "r1"),
            Rule("s", "r1", prec="bcdfghjklmnoprtvy"),
        ),
        # step 2: shorten dd/gd/nn/dt/gt/kt/tt
        (
            Rule("dd", "r1", repl="d"), Rule("gd", "r1", repl="g"),
            Rule("nn", "r1", repl="n"), Rule("dt", "r1", repl="d"),
            Rule("gt", "r1", repl="g"), Rule("kt", "r1", repl="k"),
            Rule("tt", "r1", repl="t"),
        ),
        # step 3: d-suffixes
        (
            Rule("löst", "r1", repl="lös"), Rule("fullt", "r1", repl="full"),
            Rule("lig", "r1"), Rule("els", "r1"), Rule("ig", "r1"),
        ),
    ),
    final_from="äåö",
    final_to="aao",
)

_DA_V = "aeiouyæåø"
DANISH = Locale(
    name="da",
    vowels=_DA_V,
    r1_min3=True,
    steps=(
        # step 1: a-suffixes (R1) + s after a valid s-ending
        (
            Rule("erendes", "r1"), Rule("erende", "r1"),
            Rule("hedens", "r1"), Rule("erede", "r1"), Rule("heden", "r1"),
            Rule("heder", "r1"), Rule("endes", "r1"), Rule("ernes", "r1"),
            Rule("erens", "r1"), Rule("erets", "r1"), Rule("ethed", "r1"),
            Rule("erer", "r1"), Rule("heds", "r1"), Rule("enes", "r1"),
            Rule("eres", "r1"), Rule("ered", "r1"), Rule("ende", "r1"),
            Rule("erne", "r1"), Rule("eren", "r1"), Rule("eret", "r1"),
            Rule("ens", "r1"), Rule("ers", "r1"), Rule("ets", "r1"),
            Rule("ene", "r1"), Rule("ere", "r1"), Rule("hed", "r1"),
            Rule("es", "r1"), Rule("et", "r1"), Rule("er", "r1"),
            Rule("en", "r1"), Rule("e", "r1"),
            Rule("s", "r1", prec="abcdfghjklmnoprtvyzå"),
        ),
        # step 2: shorten gd/dt/gt/kt
        (
            Rule("gd", "r1", repl="g"), Rule("dt", "r1", repl="d"),
            Rule("gt", "r1", repl="g"), Rule("kt", "r1", repl="k"),
        ),
        # step 3: d-suffixes
        (
            Rule("elig", "r1"), Rule("løst", repl="løs"),
            Rule("lig", "r1"), Rule("els", "r1"), Rule("ig", "r1"),
        ),
    ),
    final_from="æåø",
    final_to="aao",
)

_NO_V = "aeiouyæåø"
NORWEGIAN = Locale(
    name="no",
    vowels=_NO_V,
    r1_min3=True,
    steps=(
        # step 1: a-suffixes (R1) + erte/ert -> er + s after s-ending
        (
            Rule("hetenes", "r1"), Rule("hetene", "r1"),
            Rule("hetens", "r1"), Rule("heten", "r1"), Rule("heter", "r1"),
            Rule("endes", "r1"), Rule("edes", "r1"), Rule("enes", "r1"),
            Rule("erte", "r1", repl="er"),
            Rule("ande", "r1"), Rule("ende", "r1"), Rule("ane", "r1"),
            Rule("ene", "r1"), Rule("ede", "r1"), Rule("ens", "r1"),
            Rule("ers", "r1"), Rule("ets", "r1"), Rule("het", "r1"),
            Rule("ast", "r1"), Rule("ert", "r1", repl="er"),
            Rule("en", "r1"), Rule("ar", "r1"), Rule("er", "r1"),
            Rule("as", "r1"), Rule("es", "r1"), Rule("et", "r1"),
            Rule("a", "r1"), Rule("e", "r1"),
            Rule("s", "r1", prec="bcdfghjlmnoptvyz"),
        ),
        # step 2: dt/vt -> delete last
        (Rule("dt", "r1", repl="d"), Rule("vt", "r1", repl="v")),
        # step 3: d-suffixes
        (
            Rule("hetslov", "r1"), Rule("eleg", "r1"), Rule("elov", "r1"),
            Rule("slov", "r1"), Rule("elig", "r1"), Rule("eig", "r1"),
            Rule("lig", "r1"), Rule("els", "r1"), Rule("lov", "r1"),
            Rule("leg", "r1"), Rule("ig", "r1"),
        ),
    ),
    final_from="æåø",
    final_to="aao",
)

_FI_V = "aeiouyäö"
_FI_C = "bcdfghjklmnpqrstvwxz"
FINNISH = Locale(
    name="fi",
    vowels=_FI_V,
    steps=(
        # step 1: enclitic particles (preceded by n, t or a vowel) + sti
        (
            Rule("kaan", "r1", prec="nt" + _FI_V),
            Rule("kään", "r1", prec="nt" + _FI_V),
            Rule("kin", "r1", prec="nt" + _FI_V),
            Rule("han", "r1", prec="nt" + _FI_V),
            Rule("hän", "r1", prec="nt" + _FI_V),
            Rule("sti", "r2"),
            Rule("ko", "r1", prec="nt" + _FI_V),
            Rule("kö", "r1", prec="nt" + _FI_V),
            Rule("pa", "r1", prec="nt" + _FI_V),
            Rule("pä", "r1", prec="nt" + _FI_V),
        ),
        # step 2: possessives
        (
            Rule("nsa", "r1"), Rule("nsä", "r1"),
            Rule("mme", "r1"), Rule("nne", "r1"),
            Rule("si", "r1", not_prec="k"), Rule("ni", "r1"),
        ),
        # step 3: case endings. The partitive/essive a/ä takes Snowball's
        # two-char 'cv' lookbehind (consonant preceded by a vowel), which
        # keeps lexical final a ('kirja') while stripping 'taloja'
        (
            Rule("seen", "r1", prec=_FI_V),
            Rule("siin", "r1", prec=_FI_V),
            Rule("tta", "r1", prec="e"), Rule("ttä", "r1", prec="e"),
            Rule("ssa", "r1"), Rule("ssä", "r1"),
            Rule("sta", "r1"), Rule("stä", "r1"),
            Rule("lla", "r1"), Rule("llä", "r1"),
            Rule("lta", "r1"), Rule("ltä", "r1"),
            Rule("lle", "r1"), Rule("ksi", "r1"), Rule("ine", "r1"),
            Rule("na", "r1"), Rule("nä", "r1"),
            Rule("ta", "r1"), Rule("tä", "r1"),
            Rule("hon", "r1", prec="o"), Rule("hin", "r1", prec="i"),
            Rule("hun", "r1", prec="u"), Rule("hyn", "r1", prec="y"),
            Rule("hen", "r1", prec="e"), Rule("hön", "r1", prec="ö"),
            Rule("hän", "r1", prec="ä"), Rule("han", "r1", prec="a"),
            Rule("a", "r1", prec=_FI_C, prev2=_FI_V),
            Rule("ä", "r1", prec=_FI_C, prev2=_FI_V),
            Rule("n", "r1", prec=_FI_V),
        ),
        # step 4: other endings (R2 comparatives/superlatives)
        (
            Rule("impi", "r2"), Rule("impa", "r2"), Rule("impä", "r2"),
            Rule("immi", "r2"), Rule("imma", "r2"), Rule("immä", "r2"),
            Rule("mpi", "r2"), Rule("mpa", "r2"), Rule("mpä", "r2"),
            Rule("mmi", "r2"), Rule("mma", "r2"), Rule("mmä", "r2"),
            Rule("eja", "r2"), Rule("ejä", "r2"),
        ),
        # step 5: plural markers exposed by case removal
        (
            Rule("i", "r1", min_stem=3),
            Rule("j", "r1", min_stem=3),
            Rule("t", "r1", prec=_FI_V),
        ),
        # step 6a: shorten a final long vowel inside R1
        (
            Rule("aa", "r1", repl="a"), Rule("ee", "r1", repl="e"),
            Rule("ii", "r1", repl="i"), Rule("oo", "r1", repl="o"),
            Rule("uu", "r1", repl="u"), Rule("ää", "r1", repl="ä"),
            Rule("öö", "r1", repl="ö"),
        ),
        # step 6b: undouble a final consonant pair
        (
            Rule("kk", repl="k"), Rule("pp", repl="p"),
            Rule("tt", repl="t"),
        ),
    ),
    final_from="äö",
    final_to="ao",
)

_HU_V = "aeiouöüáéíóőúű"
HUNGARIAN = Locale(
    name="hu",
    vowels=_HU_V,
    r1_kind="hu",
    steps=(
        # step 1: instrumental val/vel
        (Rule("val", "r1"), Rule("vel", "r1")),
        # step 2: case endings (deleted; á/é exposed finals fold in the
        # final translate, matching Snowball's á→a / é→e rewrite)
        (
            Rule("képpen", "r1"), Rule("képp", "r1"), Rule("ként", "r1"),
            Rule("ban", "r1"), Rule("ben", "r1"), Rule("nak", "r1"),
            Rule("nek", "r1"), Rule("ról", "r1"), Rule("ről", "r1"),
            Rule("tól", "r1"), Rule("től", "r1"), Rule("ból", "r1"),
            Rule("ből", "r1"), Rule("hoz", "r1"), Rule("hez", "r1"),
            Rule("höz", "r1"), Rule("nál", "r1"), Rule("nél", "r1"),
            Rule("ért", "r1"), Rule("kor", "r1"),
            Rule("ba", "r1"), Rule("be", "r1"), Rule("ra", "r1"),
            Rule("re", "r1"), Rule("ig", "r1"), Rule("ul", "r1"),
            Rule("ül", "r1"),
            Rule("át", "r1", repl="a"), Rule("ét", "r1", repl="e"),
            Rule("at", "r1"), Rule("et", "r1"), Rule("ot", "r1"),
            Rule("öt", "r1"),
            Rule("on", "r1"), Rule("en", "r1"), Rule("ön", "r1"),
            Rule("án", "r1", repl="a"), Rule("én", "r1", repl="e"),
            Rule("t", "r1", prec=_HU_V + "lnrzs"),
            Rule("n", "r1", prec=_HU_V),
        ),
        # step 3: possessives
        (
            Rule("jaink", "r1"), Rule("jeink", "r1"),
            Rule("aink", "r1"), Rule("eink", "r1"),
            Rule("unk", "r1"), Rule("ünk", "r1"),
            Rule("juk", "r1"), Rule("jük", "r1"),
            Rule("ja", "r1"), Rule("je", "r1"),
            Rule("ái", "r1", repl="a"), Rule("éi", "r1", repl="e"),
            Rule("ai", "r1"), Rule("ei", "r1"),
        ),
        # step 4: plural
        (
            Rule("ák", "r1", repl="a"), Rule("ék", "r1", repl="e"),
            Rule("ók", "r1", repl="o"), Rule("ők", "r1", repl="ö"),
            Rule("ak", "r1"), Rule("ek", "r1"), Rule("ok", "r1"),
            Rule("ök", "r1"),
            Rule("k", "r1", prec=_HU_V),
        ),
    ),
    final_from="áéíóőúűöü",
    final_to="aeioouuou",
)

_TR_V = "aeıioöuü"
#: Turkish has no Snowball regions — the published stemmer tracks suffix
#: chains (root+plural+possessive+case, stripped outermost-first) with
#: vowel-harmony checks. Portable subset: every harmony variant is
#: enumerated literally (so no harmony predicate is needed) and min_stem
#: guards protect short roots; consonant mutation (kitabı→kitab vs kitap)
#: is left unrestored — a documented deviation.
TURKISH = Locale(
    name="tr",
    vowels=_TR_V,
    steps=(
        # step 1: case endings (outermost)
        (
            Rule("ndan", min_stem=2), Rule("nden", min_stem=2),
            Rule("dan", min_stem=2), Rule("den", min_stem=2),
            Rule("tan", min_stem=2), Rule("ten", min_stem=2),
            Rule("nda", min_stem=2), Rule("nde", min_stem=2),
            Rule("nın", min_stem=2), Rule("nin", min_stem=2),
            Rule("nun", min_stem=2), Rule("nün", min_stem=2),
            Rule("yla", min_stem=2), Rule("yle", min_stem=2),
            Rule("da", min_stem=2), Rule("de", min_stem=2),
            Rule("ta", min_stem=2), Rule("te", min_stem=2),
            Rule("yı", min_stem=2), Rule("yi", min_stem=2),
            Rule("yu", min_stem=2), Rule("yü", min_stem=2),
            Rule("nı", min_stem=2), Rule("ni", min_stem=2),
            Rule("nu", min_stem=2), Rule("nü", min_stem=2),
            Rule("ın", min_stem=2, prec_not=_TR_V),
            Rule("in", min_stem=2, prec_not=_TR_V),
            Rule("un", min_stem=2, prec_not=_TR_V),
            Rule("ün", min_stem=2, prec_not=_TR_V),
            Rule("ı", min_stem=2, prec_not=_TR_V),
            Rule("i", min_stem=2, prec_not=_TR_V),
            Rule("u", min_stem=2, prec_not=_TR_V),
            Rule("ü", min_stem=2, prec_not=_TR_V),
        ),
        # step 2: possessives
        (
            Rule("ımız", min_stem=2), Rule("imiz", min_stem=2),
            Rule("umuz", min_stem=2), Rule("ümüz", min_stem=2),
            Rule("ınız", min_stem=2), Rule("iniz", min_stem=2),
            Rule("unuz", min_stem=2), Rule("ünüz", min_stem=2),
            Rule("ları", min_stem=2), Rule("leri", min_stem=2),
            Rule("sı", min_stem=2, prec=_TR_V),
            Rule("si", min_stem=2, prec=_TR_V),
            Rule("su", min_stem=2, prec=_TR_V),
            Rule("sü", min_stem=2, prec=_TR_V),
            Rule("ım", min_stem=2), Rule("im", min_stem=2),
            Rule("um", min_stem=2), Rule("üm", min_stem=2),
            Rule("ın", min_stem=2, prec_not=_TR_V),
            Rule("in", min_stem=2, prec_not=_TR_V),
            Rule("un", min_stem=2, prec_not=_TR_V),
            Rule("ün", min_stem=2, prec_not=_TR_V),
            Rule("ı", min_stem=2, prec_not=_TR_V),
            Rule("i", min_stem=2, prec_not=_TR_V),
            Rule("u", min_stem=2, prec_not=_TR_V),
            Rule("ü", min_stem=2, prec_not=_TR_V),
        ),
        # step 3: plural
        (Rule("lar", min_stem=2), Rule("ler", min_stem=2)),
        # step 4: derivational + copula
        (
            Rule("lık", min_stem=2), Rule("lik", min_stem=2),
            Rule("luk", min_stem=2), Rule("lük", min_stem=2),
            Rule("sız", min_stem=2), Rule("siz", min_stem=2),
            Rule("suz", min_stem=2), Rule("süz", min_stem=2),
            Rule("dır", min_stem=2), Rule("dir", min_stem=2),
            Rule("dur", min_stem=2), Rule("dür", min_stem=2),
            Rule("tır", min_stem=2), Rule("tir", min_stem=2),
            Rule("tur", min_stem=2), Rule("tür", min_stem=2),
            Rule("mış", min_stem=2), Rule("miş", min_stem=2),
            Rule("muş", min_stem=2), Rule("müş", min_stem=2),
            Rule("lı", min_stem=2), Rule("li", min_stem=2),
            Rule("lu", min_stem=2), Rule("lü", min_stem=2),
            Rule("cı", min_stem=2), Rule("ci", min_stem=2),
            Rule("cu", min_stem=2), Rule("cü", min_stem=2),
            Rule("çı", min_stem=2), Rule("çi", min_stem=2),
            Rule("çu", min_stem=2), Rule("çü", min_stem=2),
        ),
    ),
    final_from="çğıöşü",
    final_to="cgiosu",
)

_RO_V = "aeiouăâî"
ROMANIAN = Locale(
    name="ro",
    vowels=_RO_V,
    rv_kind="es",
    prelude=(("ş", "ș"), ("ţ", "ț")),  # unify cedilla/comma codepoints
    steps=(
        # step 0: plural / definite-article endings
        (
            Rule("urile", "r1", repl="u"), Rule("uri", "r1", repl="u"),
            Rule("iilor", "r1", repl="i"), Rule("ului", "r1"),
            Rule("iile", "r1", repl="i"), Rule("aua", "r1", repl="a"),
            Rule("elor", "r1", repl="e"), Rule("ilor", "r1", repl="i"),
            Rule("iua", "r1", repl="i"), Rule("iei", "r1", repl="i"),
            Rule("atei", "r1", repl="at"),
            Rule("ile", "r1", repl="i", not_prec="b"),
            Rule("ele", "r1", repl="e"), Rule("ii", "r1", repl="i"),
            Rule("ul", "r1"), Rule("ea", "r1", repl="e"),
        ),
        # step 1: combining suffixes (rewrite, keeps derivation family)
        (
            Rule("abilitate", "r1", repl="abil"),
            Rule("abilitati", "r1", repl="abil"),
            Rule("abilități", "r1", repl="abil"),
            Rule("ibilitate", "r1", repl="ibil"),
            Rule("ivitate", "r1", repl="iv"),
            Rule("ivitati", "r1", repl="iv"),
            Rule("icitate", "r1", repl="ic"),
            Rule("icitati", "r1", repl="ic"),
            Rule("icator", "r1", repl="ic"),
            Rule("icatori", "r1", repl="ic"),
            Rule("ătoare", "r1", repl="ător"),
            Rule("itoare", "r1", repl="itor"),
        ),
        # step 2: standard suffixes (R2). Every family member DELETES (the
        # inflected forms must not rewrite onto the bare form, which this
        # same step would then strip — the family has to land on one stem)
        (
            Rule("abilă", "r2"), Rule("abile", "r2"), Rule("abili", "r2"),
            Rule("itate", "r2"), Rule("itati", "r2"), Rule("ități", "r2"),
            Rule("atori", "r2"), Rule("ători", "r2"), Rule("itori", "r2"),
            Rule("ator", "r2"), Rule("ător", "r2"), Rule("itor", "r2"),
            Rule("abil", "r2"), Rule("ibil", "r2"),
            Rule("oasă", "r2"), Rule("oase", "r2"), Rule("oși", "r2"),
            Rule("işti", "r2"), Rule("iști", "r2"),
            Rule("anti", "r2"), Rule("antă", "r2"), Rule("ante", "r2"),
            Rule("anți", "r2"),
            Rule("istă", "r2"), Rule("iste", "r2"),
            Rule("ică", "r2"), Rule("ice", "r2"), Rule("ici", "r2"),
            Rule("ivă", "r2"), Rule("ive", "r2"), Rule("ivi", "r2"),
            Rule("ant", "r2"), Rule("ist", "r2"),
            Rule("os", "r2"), Rule("ic", "r2"), Rule("iv", "r2"),
        ),
        # step 3: verb endings (RV)
        (
            Rule("aseră", "rv"), Rule("iseră", "rv"), Rule("useră", "rv"),
            Rule("ează", "rv"), Rule("ându", "rv"), Rule("indu", "rv"),
            Rule("este", "rv"), Rule("ește", "rv"), Rule("esc", "rv"),
            Rule("ăsc", "rv"),
            Rule("are", "rv"), Rule("ere", "rv"), Rule("ire", "rv"),
            Rule("ând", "rv"), Rule("ind", "rv"),
            Rule("ată", "rv", repl="at"), Rule("ate", "rv", repl="at"),
            Rule("ați", "rv", repl="at"),
            Rule("ită", "rv", repl="it"), Rule("ite", "rv", repl="it"),
            Rule("iți", "rv", repl="it"),
            Rule("ută", "rv", repl="ut"), Rule("ute", "rv", repl="ut"),
            Rule("uți", "rv", repl="ut"),
            Rule("eze", "rv"), Rule("ez", "rv"),
            Rule("ăm", "rv"), Rule("em", "rv"), Rule("im", "rv"),
            Rule("âm", "rv"),
        ),
        # step 4: residual final vowel (RV)
        (
            Rule("ie", "rv", repl="i"),
            Rule("a", "rv"), Rule("e", "rv"), Rule("i", "rv"),
            Rule("ă", "rv"),
        ),
    ),
    final_from="ăâîșț",
    final_to="aaist",
)

#: Greek (contributed Snowball family; Ntais' stemmer is the published
#: base). Portable subset over σ-NORMALIZED lowercase (the prelude folds
#: final sigma ς→σ so Python/JVM/DuckDB lowercasing — which disagree on
#: contextual final-sigma — can never diverge), covering the regular
#: noun/adjective inflection classes; min_stem floors replace the
#: original's syllable counting.
_EL_V = "αεηιουω"
GREEK = Locale(
    name="el",
    vowels=_EL_V,
    prelude=(("ς", "σ"),),
    steps=(
        # step 1: -μα nominalizations
        (
            Rule("ματων", repl="μα", min_stem=2),
            Rule("ματοσ", repl="μα", min_stem=2),
            Rule("ματα", repl="μα", min_stem=2),
        ),
        # step 2: verb/participle endings
        (
            Rule("οντασ", min_stem=3), Rule("ωντασ", min_stem=3),
            Rule("ουσεσ", min_stem=3), Rule("ουσα", min_stem=3),
            Rule("ουμε", min_stem=3), Rule("ουνε", min_stem=3),
            Rule("ετε", min_stem=3), Rule("ουν", min_stem=3),
            Rule("ειτε", min_stem=3),
        ),
        # step 3: noun/adjective inflection
        (
            Rule("ουσ", min_stem=3), Rule("εων", min_stem=3),
            Rule("ων", min_stem=3), Rule("εσ", min_stem=3),
            Rule("ου", min_stem=3), Rule("ασ", min_stem=3),
            Rule("ησ", min_stem=3), Rule("οσ", min_stem=3),
            Rule("οι", min_stem=3), Rule("αι", min_stem=3),
            Rule("α", min_stem=3), Rule("η", min_stem=3),
            Rule("ο", min_stem=3), Rule("ι", min_stem=3),
            Rule("ε", min_stem=3), Rule("σ", min_stem=3),
        ),
    ),
)

# Lithuanian (published Snowball lithuanian.sbl, portable subset: the
# common declension/conjugation ending tables in R1; the č/dž fix-up
# steps and the rarest endings are omitted — documented deviation).
_LT_V = "aąeęėiįyouųū"
LITHUANIAN = Locale(
    name="lt",
    vowels=_LT_V,
    steps=(
        # step 1: nominal declension endings (R1)
        (
            Rule("iuose", "r1", min_stem=2), Rule("uose", "r1", min_stem=2),
            Rule("iams", "r1", min_stem=2), Rule("iais", "r1", min_stem=2),
            Rule("iose", "r1", min_stem=2), Rule("iems", "r1", min_stem=2),
            Rule("omis", "r1", min_stem=2), Rule("ėmis", "r1", min_stem=2),
            Rule("imis", "r1", min_stem=2), Rule("umis", "r1", min_stem=2),
            Rule("iai", "r1", min_stem=2), Rule("ams", "r1", min_stem=2),
            Rule("ais", "r1", min_stem=2), Rule("oms", "r1", min_stem=2),
            Rule("ėms", "r1", min_stem=2), Rule("ims", "r1", min_stem=2),
            Rule("ums", "r1", min_stem=2), Rule("ose", "r1", min_stem=2),
            Rule("ėse", "r1", min_stem=2), Rule("yse", "r1", min_stem=2),
            Rule("yje", "r1", min_stem=2), Rule("oje", "r1", min_stem=2),
            Rule("ėje", "r1", min_stem=2), Rule("ije", "r1", min_stem=2),
            Rule("iui", "r1", min_stem=2), Rule("ias", "r1", min_stem=2),
            Rule("ius", "r1", min_stem=2), Rule("ių", "r1", min_stem=2),
            Rule("ui", "r1", min_stem=2), Rule("as", "r1", min_stem=2),
            Rule("is", "r1", min_stem=2), Rule("ys", "r1", min_stem=2),
            Rule("us", "r1", min_stem=2), Rule("ai", "r1", min_stem=2),
            Rule("os", "r1", min_stem=2), Rule("ės", "r1", min_stem=2),
            Rule("ia", "r1", min_stem=2), Rule("io", "r1", min_stem=2),
            Rule("iu", "r1", min_stem=2), Rule("ią", "r1", min_stem=2),
            Rule("a", "r1", min_stem=2), Rule("ą", "r1", min_stem=2),
            Rule("ė", "r1", min_stem=2), Rule("ę", "r1", min_stem=2),
            Rule("į", "r1", min_stem=2), Rule("ų", "r1", min_stem=2),
            Rule("o", "r1", min_stem=2), Rule("u", "r1", min_stem=2),
            Rule("e", "r1", min_stem=2), Rule("i", "r1", min_stem=2),
            Rule("y", "r1", min_stem=2),
        ),
        # step 2: verb endings left after step 1 (R1)
        (
            Rule("iame", "r1", min_stem=2), Rule("iate", "r1", min_stem=2),
            Rule("ame", "r1", min_stem=2), Rule("ate", "r1", min_stem=2),
            Rule("ome", "r1", min_stem=2), Rule("ėme", "r1", min_stem=2),
            Rule("ėte", "r1", min_stem=2), Rule("ote", "r1", min_stem=2),
            Rule("iau", "r1", min_stem=2), Rule("au", "r1", min_stem=2),
            Rule("si", "r1", min_stem=3), Rule("ti", "r1", min_stem=3),
        ),
    ),
)

# Indonesian (published Snowball indonesian.sbl after Tala 2003):
# particle and possessive suffixes, meN-/peN- first-order and ber-/per-
# second-order prefixes with letter restoration (meny→s, mem+V→p,
# men+V→t), derivational -kan/-an/-i. The syllable-count condition
# (every removal must leave >= 2 syllables) is expressed as
# min_vowels=2. Documented deviation: the dictionary-free mem+V→p
# recoding is applied unconditionally (the reference ambiguity
# mem+makan vs mem+pakai is unresolvable without a lexicon).
_ID_V = "aeiou"
INDONESIAN = Locale(
    name="id",
    vowels=_ID_V,
    prefixes=(
        # first-order: meN- / peN- / di- / ter- / ke-
        (
            Rule("meng", prec=_ID_V, min_vowels=2), Rule("meng", min_vowels=2),
            Rule("meny", repl="s", prec=_ID_V, min_vowels=2),
            Rule("peng", prec=_ID_V, min_vowels=2), Rule("peng", min_vowels=2),
            Rule("peny", repl="s", prec=_ID_V, min_vowels=2),
            Rule("mem", repl="p", prec=_ID_V, min_vowels=2),
            Rule("mem", min_vowels=2),
            Rule("men", repl="t", prec=_ID_V, min_vowels=2),
            Rule("men", min_vowels=2),
            Rule("pem", repl="p", prec=_ID_V, min_vowels=2),
            Rule("pem", min_vowels=2),
            Rule("pen", repl="t", prec=_ID_V, min_vowels=2),
            Rule("pen", min_vowels=2),
            Rule("ter", min_vowels=2), Rule("di", min_vowels=2),
            Rule("ke", min_vowels=2), Rule("me", min_vowels=2),
        ),
        # second-order: ber- / per-
        (
            Rule("bel", min_vowels=2), Rule("ber", min_vowels=2),
            Rule("pel", min_vowels=2), Rule("per", min_vowels=2),
            Rule("be", prec="k", min_vowels=2), Rule("pe", min_vowels=2),
        ),
    ),
    steps=(
        # particles
        (Rule("kah", min_vowels=2), Rule("lah", min_vowels=2),
         Rule("tah", min_vowels=2), Rule("pun", min_vowels=2)),
        # possessive pronouns
        (Rule("nya", min_vowels=2), Rule("ku", min_vowels=2),
         Rule("mu", min_vowels=2)),
        # derivational suffixes (-i never strips after a vowel: sungai)
        (Rule("kan", min_vowels=2), Rule("an", min_vowels=2),
         Rule("i", min_vowels=2, prec_not=_ID_V)),
    ),
)

# Irish (published Snowball irish.sbl, portable subset): initial-mutation
# removal — eclipsis (mb→b, gc→c, nd→d, ng→g, bp→p, dt→t, bhf→f, ts→s)
# and lenition (Xh→X for b c d f g m p s t) — then the common noun
# (-(e)acht(a), -(e)anna, -(e)acha, -í) and verb (-(f)aidh/-fidh, -ann,
# -(e)adh, -t(e)ar, -(e)amar, -áil) endings in R1. The hyphenated h-/n-/
# t- prothesis forms are handled upstream by tokenization (the hyphen
# splits them off); bare-h prothesis is not removed (hata vs héadaí is
# unresolvable without a lexicon) — documented deviation.
_GA_V = "aeiouáéíóú"
IRISH = Locale(
    name="ga",
    vowels=_GA_V,
    prefixes=(
        (
            Rule("bhf", repl="f", min_stem=2),
            Rule("mb", repl="b", min_stem=2),
            Rule("gc", repl="c", min_stem=2),
            Rule("nd", repl="d", min_stem=2),
            Rule("ng", repl="g", min_stem=2),
            Rule("bp", repl="p", min_stem=2),
            Rule("dt", repl="t", min_stem=2),
            Rule("ts", repl="s", min_stem=2),
            Rule("bh", repl="b", min_stem=2),
            Rule("ch", repl="c", min_stem=2),
            Rule("dh", repl="d", min_stem=2),
            Rule("fh", repl="f", min_stem=2),
            Rule("gh", repl="g", min_stem=2),
            Rule("mh", repl="m", min_stem=2),
            Rule("ph", repl="p", min_stem=2),
            Rule("sh", repl="s", min_stem=2),
            Rule("th", repl="t", min_stem=2),
        ),
    ),
    steps=(
        # step 1: noun endings (R1)
        (
            Rule("eachta", "r1", min_stem=2), Rule("achta", "r1", min_stem=2),
            Rule("eanna", "r1", min_stem=2), Rule("anna", "r1", min_stem=2),
            Rule("eacha", "r1", min_stem=2), Rule("acha", "r1", min_stem=2),
            Rule("eacht", "r1", min_stem=2), Rule("acht", "r1", min_stem=2),
            Rule("aí", "r1", min_stem=2), Rule("í", "r1", min_stem=2),
        ),
        # step 2: verb endings (R1)
        (
            Rule("eamar", "r1", min_stem=2), Rule("faidh", "r1", min_stem=2),
            Rule("amar", "r1", min_stem=2), Rule("fidh", "r1", min_stem=2),
            Rule("eadh", "r1", min_stem=2), Rule("tear", "r1", min_stem=2),
            Rule("fimid", "r1", min_stem=2), Rule("faimid", "r1", min_stem=2),
            Rule("ann", "r1", min_stem=2), Rule("adh", "r1", min_stem=2),
            Rule("tar", "r1", min_stem=2), Rule("áil", "r1", min_stem=2),
        ),
    ),
)

LOCALES: dict[str, Locale] = {
    "de": GERMAN, "fr": FRENCH, "es": SPANISH, "ru": RUSSIAN,
    "it": ITALIAN, "pt": PORTUGUESE, "nl": DUTCH, "sv": SWEDISH,
    "da": DANISH, "no": NORWEGIAN, "fi": FINNISH, "hu": HUNGARIAN,
    "tr": TURKISH, "ro": ROMANIAN, "el": GREEK,
    "lt": LITHUANIAN, "id": INDONESIAN, "ga": IRISH,
}
