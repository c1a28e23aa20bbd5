"""Match offsets + highlighting — the OFFSETS / ts_highlight surface.

Reference: ``ts_offsets(col[, limit])`` emits byte ranges of every match
in the indexed column (server/connector/functions/ts_offsets.cpp:403,
demo3/demo.sql:150-156); ``ts_highlight`` assembles snippets from those
offsets (ts_highlight.cpp:734).

Spark-first: offsets are recomputed on the MATCHED docs only (late
materialization — the candidate set comes from the postings plan, so this
scan-side work touches k docs, not the corpus) with pure JVM expressions:
a character-index sequence filtered by a boundary-checked substring
match. No Python per row, and the identical construction exists in DuckDB
SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: ICU/CLDR en sentence-break suppressions (portable subset): a '.' is not
#: a sentence end when the word before it is one of these abbreviations.
#: ts_highlight.cpp inherits the full list from ICU's en tailoring; this
#: covers the CLDR entries likely in technical/business prose.
SENTENCE_ABBREVIATIONS: tuple[str, ...] = (
    "Dr", "Mr", "Mrs", "Ms", "Prof", "St", "Jr", "Sr", "Rev", "Gen",
    "Sen", "Gov", "Capt", "Sgt", "Col", "Lt", "Maj", "Hon", "Messrs",
    "Inc", "Ltd", "Co", "Corp", "No", "Fig", "Dept", "Univ", "Ave",
    "Blvd", "Rd", "Mt", "Ft",
    "etc", "vs", "cf", "al", "e.g", "i.e", "est", "approx",
    "Jan", "Feb", "Mar", "Apr", "Jun", "Jul", "Aug", "Sep", "Sept",
    "Oct", "Nov", "Dec", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun",
)

#: per-locale suppression tailorings (portable subsets of the public
#: CLDR segments/<locale>/suppressions data — the reference reaches the
#: same behavior through ICU's per-locale break data,
#: ts_highlight.cpp). 'en' is the original list above.
SENTENCE_ABBREVIATIONS_BY_LOCALE: dict[str, tuple[str, ...]] = {
    "en": SENTENCE_ABBREVIATIONS,
    "de": ("Dr", "Prof", "Nr", "Hr", "Fr", "Frl", "Abb", "Abs", "Art",
           "Bd", "bzw", "ca", "d.h", "etc", "evtl", "geb", "gem", "ggf",
           "inkl", "Mio", "Mrd", "s.o", "s.u", "Str", "Tel", "u.a",
           "usw", "vgl", "z.B", "z.T"),
    "fr": ("M", "MM", "Mme", "Mmes", "Mlle", "Mlles", "Dr", "Prof",
           "av", "bd", "boul", "etc", "ex", "p.ex", "St", "Ste", "tél"),
    "es": ("Sr", "Sra", "Srta", "Dr", "Dra", "D", "Dña", "Av", "Avda",
           "núm", "pág", "tel", "Ud", "Uds", "etc", "p.ej"),
    "it": ("Sig", "Sigg", "Dott", "Prof", "Ing", "Avv", "ecc", "p.es",
           "tel", "art"),
    "pt": ("Sr", "Sra", "Srs", "Dr", "Dra", "Av", "Eng", "etc", "ex",
           "pág", "tel", "p.ex"),
}

#: longest suppression entry — sizes the O(1) lookback window; a word
#: longer than this ending at '.' can never match the list, and the
#: +1-char window guarantees a word that DOES fit arrives whole (with its
#: leading whitespace separator when one exists)
_ABBR_MAX = max(len(a) for a in SENTENCE_ABBREVIATIONS)


def _abbr_list(locale: str) -> tuple[tuple[str, ...], int]:
    abbr = SENTENCE_ABBREVIATIONS_BY_LOCALE[locale]
    return abbr, max(len(a) for a in abbr)


def py_match_offsets(text: str, groups: list) -> list[int]:
    """Flat [start, end) offsets of every occurrence of each word-group
    in `text`, sorted ascending by start.  A group is a list of slots;
    a slot is either a bare word (adjacent to the previous slot) or a
    ``(words, lo, hi)`` tuple — any of `words` at token-distance
    lo..hi from the previous slot (## gap phrases, headline.test:982).
    Each group occurrence emits ONE span covering the whole run."""
    import re as _re

    toks = [(m.start(), m.end(), m.group(0).lower())
            for m in _re.finditer(r"\w+", text)]
    spans: set[tuple[int, int]] = set()
    for grp in groups:
        slots = [(_slot_matcher({it} if isinstance(it, str) else it),
                  1, 1) if isinstance(it, (str, dict))
                 else (_slot_matcher(it[0]), int(it[1]), int(it[2]))
                 for it in grp]
        m0 = slots[0][0]
        for i in range(len(toks)):
            if not m0(toks[i][2]):
                continue
            frontier = [i]
            for match, lo, hi in slots[1:]:
                frontier = [p + d for p in frontier
                            for d in range(lo, hi + 1)
                            if p + d < len(toks)
                            and match(toks[p + d][2])]
            if frontier:
                spans.add((toks[i][0], toks[min(frontier)][1]))
    out: list[int] = []
    for a, b in sorted(spans):
        out += [a, b]
    return out


def _slot_matcher(spec):
    """Token predicate from a slot spec: a word collection, or a dict
    describing a term-expansion leaf (the no-index mini-segment path —
    headline.test ts_like over literal text)."""
    import re as _re

    if isinstance(spec, dict):
        kind = spec["kind"]
        if kind == "prefix":
            p = spec["p"]
            return lambda t: t.startswith(p)
        if kind == "like":
            pat = _re.escape(spec["p"]).replace("%", ".*").replace(
                "_", ".").replace("\\%", "%").replace("\\_", "_")
            rx = _re.compile(f"^(?:{pat})$")
            return lambda t: rx.match(t) is not None
        if kind == "regexp":
            rx = _re.compile(f"^(?:{spec['p']})$")
            return lambda t: rx.match(t) is not None
        if kind == "fuzzy":
            w, d = spec["w"], int(spec["d"])
            pre = spec.get("prefix", "")

            def _fz(t: str) -> bool:
                if pre:
                    if not t.startswith(pre):
                        return False
                    t = t[len(pre):]
                if abs(len(t) - len(w)) > d:
                    return False
                from serenedb_spark.plans.statements import (
                    _osa_distance,
                )
                return _osa_distance(t, w) <= d
            return _fz
        if kind == "between":
            lo, hi = spec.get("lo"), spec.get("hi")
            li, hc = spec.get("li", True), spec.get("hi_inc", True)

            def _bt(t: str) -> bool:
                if lo is not None and (t < lo or (t == lo and not li)):
                    return False
                if hi is not None and (t > hi or (t == hi and not hc)):
                    return False
                return True
            return _bt
        raise ValueError(f"unknown slot matcher {kind!r}")
    words = set(spec)
    return lambda t: t in words


def term_offsets_col(text: Column, term: str) -> Column:
    """1-based char offsets of whole-token occurrences of `term`:
    positions i where lower(substr(text,i,len)) = term and both neighbours
    are non-alphanumeric (token boundaries)."""
    n = len(term)
    lo = F.lower(text)
    alnum = "abcdefghijklmnopqrstuvwxyz0123456789"

    def _is_alnum(ch: Column) -> Column:
        return F.instr(F.lit(alnum), ch) > 0

    # guarded 1..len-n+1 range (sequence(1, 0) would be DESCENDING [1, 0])
    hi = F.length(lo) - F.lit(n - 1)
    idx = F.filter(F.sequence(F.lit(1), F.greatest(hi, F.lit(1))), lambda i: i <= hi)
    return F.filter(
        idx,
        lambda i: (lo.substr(i, F.lit(n)) == F.lit(term))
        & (~_is_alnum(lo.substr(i - 1, F.lit(1))) | (i == 1))
        & (~_is_alnum(lo.substr(i + F.lit(n), F.lit(1)))
           | (i + F.lit(n) > F.length(lo))),
    )


def ts_offsets(
    matched_docs: DataFrame, text_col: str, term: str, id_col: str = "doc_id"
) -> DataFrame:
    """One row per match: (doc_id, start, len). Flat schema so results are
    engine-portable; docs with zero occurrences emit nothing (can happen
    when the match came from another clause of a boolean query)."""
    offs = term_offsets_col(F.col(text_col), term)
    return (
        matched_docs.select(F.col(id_col), F.explode(offs).alias("start"))
        .withColumn("len", F.lit(len(term)))
    )


def ts_offsets_multi(
    matched_docs: DataFrame, text_col: str, terms: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """OFFSETS for every query term at once: (doc_id, term, start, len) —
    the reference's ts_offsets emits per-term ranges for the whole match
    set (ts_offsets.cpp:403). One pass per term over the k matched docs,
    unioned; still late-materialized (never the corpus)."""
    parts = []
    for t in terms:
        offs = term_offsets_col(F.col(text_col), t)
        parts.append(
            matched_docs.select(
                F.col(id_col), F.lit(t).alias("term"),
                F.explode(offs).alias("start"),
            ).withColumn("len", F.lit(len(t)))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def duckdb_ts_offsets_multi_sql(
    table_expr: str, text_col: str, terms: list[str], id_col: str = "doc_id",
) -> str:
    """Oracle mirroring ts_offsets_multi (UNION ALL of per-term offset
    queries)."""
    parts = [
        "SELECT {id}, '{t}' AS term, start, len FROM ({q}) q{i}".format(
            id=id_col, t=t.replace("'", "''"),
            q=duckdb_ts_offsets_sql(table_expr, text_col, t, id_col), i=i,
        )
        for i, t in enumerate(terms)
    ]
    return "\nUNION ALL\n".join(parts)


def duckdb_ts_offsets_sql(
    table_expr: str, text_col: str, term: str, id_col: str = "doc_id"
) -> str:
    """Oracle mirroring term_offsets_col: same index-filter construction."""
    t = term.replace("'", "''")
    n = len(term)
    lo = f"lower({text_col})"
    alnum = "abcdefghijklmnopqrstuvwxyz0123456789"
    return f"""
SELECT {id_col}, unnest(list_filter(
  range(1, greatest(length({lo}) - {n - 1}, 0) + 1),
  i -> substr({lo}, i, {n}) = '{t}'
    AND (strpos('{alnum}', substr({lo}, i - 1, 1)) = 0 OR i = 1)
    AND (strpos('{alnum}', substr({lo}, i + {n}, 1)) = 0
         OR i + {n} > length({lo}))
)) AS start, {n} AS len
FROM {table_expr}
"""


def ts_highlight(
    matched_docs: DataFrame,
    text_col: str,
    term: str,
    id_col: str = "doc_id",
    tag_open: str = "<b>",
    tag_close: str = "</b>",
    window: int = 40,
    boundary: str = "word",
    locale: str = "en",
) -> DataFrame:
    """Snippet around the FIRST whole-token match: ±window chars with the
    match wrapped in tags. ``locale`` selects the sentence-break
    suppression tailoring (SENTENCE_ABBREVIATIONS_BY_LOCALE).

    ``boundary='word'`` (default) snaps the window edges to whitespace so
    the snippet never cuts mid-word — the portable core of the reference's
    ICU break-iterator snippeting (ts_highlight.cpp uses ICU word/sentence
    breaks). ``boundary='sentence'`` returns the full sentence containing
    the match, using the portable UAX#29 core: a sentence ends at [.!?]
    whose successor is whitespace or end-of-text, EXCEPT a '.' whose
    preceding word is a known abbreviation (the ICU/CLDR en suppression
    tailoring, ``SENTENCE_ABBREVIATIONS`` — ts_highlight.cpp reaches the
    same behavior through ICU's en break data; non-en suppression lists
    remain the documented deviation). ``boundary='char'`` keeps the raw
    fixed window."""
    first, snippet = highlight_parts(
        F.col(text_col), term, tag_open=tag_open, tag_close=tag_close,
        window=window, boundary=boundary, locale=locale)
    return (
        matched_docs.select(F.col(id_col), first.alias("first"),
                            snippet.alias("snippet"))
        .where(F.col("first").isNotNull())
        .select(id_col, "snippet")
    )


def highlight_parts(
    text: Column,
    term: str,
    tag_open: str = "<b>",
    tag_close: str = "</b>",
    window: int = 40,
    boundary: str = "word",
    locale: str = "en",
) -> tuple[Column, Column]:
    """Column-level core of ts_highlight: (first_match_offset, snippet).
    `first` is NULL when the term does not occur — callers decide whether
    to drop or NULL out (the SQL front door projects NULL)."""
    offs = term_offsets_col(text, term)
    first = F.get(offs, 0)  # NULL (not an error) when there is no match
    n = len(term)
    if boundary == "sentence":
        abbrs, abbr_max = _abbr_list(locale)
        ln = F.length(text)
        idx = F.filter(F.sequence(F.lit(1), F.greatest(ln, F.lit(1))),
                       lambda i: i <= ln)
        # fixed-width lookback: the longest abbreviation is _ABBR_MAX
        # chars, so an (_ABBR_MAX+1)-char window always contains either
        # the full preceding word (plus its leading separator) or a
        # fragment strictly longer than any abbreviation — O(1) per
        # position instead of splitting the whole prefix (O(n²) docs)
        def _is_break(i: Column) -> Column:
            ch = text.substr(i, F.lit(1))
            basic = (F.instr(F.lit(".!?"), ch) > 0) & (
                (text.substr(i + F.lit(1), F.lit(1)) == F.lit(" "))
                | (i == ln)
            )
            w = F.lit(abbr_max + 1)
            start = F.greatest(i - w, F.lit(1))
            lookback = text.substr(start, i - start)
            prev_word = F.element_at(
                F.split(lookback, r"[ \t\n\r]"), -1)
            suppressed = (ch == F.lit(".")) & prev_word.isin(*abbrs)
            return basic & ~suppressed

        breaks = F.filter(idx, _is_break)
        s0 = F.coalesce(
            F.array_max(F.filter(breaks, lambda p: p < first)), F.lit(0)
        ) + F.lit(1)
        e0 = F.coalesce(
            F.array_min(F.filter(breaks, lambda p: p >= first + F.lit(n))), ln
        )
        pre = F.ltrim(text.substr(s0, first - s0))
        hit = text.substr(first, F.lit(n))
        post = text.substr(first + F.lit(n), e0 - first - F.lit(n) + F.lit(1))
        snippet = F.concat(pre, F.lit(tag_open), hit, F.lit(tag_close), post)
        return first, snippet
    start = F.greatest(first - F.lit(window), F.lit(1))
    pre_raw = text.substr(start, first - start)
    end_at_len = (first + F.lit(n - 1 + window)) >= F.length(text)
    post_raw = text.substr(first + F.lit(n), F.lit(window))
    if boundary == "word":
        # drop the leading partial word unless the window starts at char 1,
        # and the trailing partial word unless it ends at the text's end
        r = F.instr(pre_raw, " ")
        pre = (
            F.when(start == 1, pre_raw)
            .when(r > 0, pre_raw.substr(r + 1, F.length(pre_raw)))
            .otherwise(F.lit(""))
        )
        k = F.instr(F.reverse(post_raw), " ")
        post = (
            F.when(end_at_len, post_raw)
            .when(k > 0, post_raw.substr(F.lit(1), F.length(post_raw) - k))
            .otherwise(F.lit(""))
        )
    else:
        pre, post = pre_raw, post_raw
    hit = text.substr(first, F.lit(n))
    snippet = F.concat(pre, F.lit(tag_open), hit, F.lit(tag_close), post)
    return first, snippet


def duckdb_ts_highlight_sql(
    table_expr: str, text_col: str, term: str, id_col: str = "doc_id",
    tag_open: str = "<b>", tag_close: str = "</b>", window: int = 40,
    boundary: str = "word", locale: str = "en",
) -> str:
    """Oracle mirroring ts_highlight (same word-boundary snapping)."""
    t = term.replace("'", "''")
    n = len(term)
    lo = f"lower({text_col})"
    alnum = "abcdefghijklmnopqrstuvwxyz0123456789"
    offs = f"""list_filter(
  range(1, greatest(length({lo}) - {n - 1}, 0) + 1),
  i -> substr({lo}, i, {n}) = '{t}'
    AND (strpos('{alnum}', substr({lo}, i - 1, 1)) = 0 OR i = 1)
    AND (strpos('{alnum}', substr({lo}, i + {n}, 1)) = 0
         OR i + {n} > length({lo})))"""
    if boundary == "sentence":
        abbrs, abbr_max = _abbr_list(locale)
        tc = text_col
        ab = ", ".join(f"'{a}'" for a in abbrs)
        w = abbr_max + 1
        st = f"greatest(i - {w}, 1)"
        prev_word = (
            f"regexp_split_to_array(substr({tc}, {st}, i - {st}),"
            f" '[ \\t\\n\\r]')[-1]"
        )
        breaks = (
            f"list_filter(range(1, length({tc}) + 1),"
            f" i -> strpos('.!?', substr({tc}, i, 1)) > 0"
            f" AND (substr({tc}, i + 1, 1) = ' ' OR i = length({tc}))"
            f" AND NOT (substr({tc}, i, 1) = '.'"
            f" AND {prev_word} IN ({ab})))"
        )
        return f"""
SELECT {id_col},
  concat(
    ltrim(substr({tc}, s0, f - s0)),
    '{tag_open}', substr({tc}, f, {n}), '{tag_close}',
    substr({tc}, f + {n}, e0 - f - {n} + 1)
  ) AS snippet
FROM (
  SELECT {id_col}, {tc}, f,
    coalesce(list_max(list_filter(bk, p -> p < f)), 0) + 1 AS s0,
    coalesce(list_min(list_filter(bk, p -> p >= f + {n})), length({tc})) AS e0
  FROM (SELECT {id_col}, {tc}, {offs}[1] AS f, {breaks} AS bk
        FROM {table_expr})
)
WHERE f IS NOT NULL
"""
    pre_raw = f"substr({text_col}, greatest(f - {window}, 1), f - greatest(f - {window}, 1))"
    post_raw = f"substr({text_col}, f + {n}, {window})"
    if boundary == "word":
        pre = (
            f"CASE WHEN greatest(f - {window}, 1) = 1 THEN pre_raw"
            f" WHEN strpos(pre_raw, ' ') > 0"
            f" THEN substr(pre_raw, strpos(pre_raw, ' ') + 1, length(pre_raw))"
            f" ELSE '' END"
        )
        post = (
            f"CASE WHEN f + {n - 1 + window} >= length({text_col}) THEN post_raw"
            f" WHEN strpos(reverse(post_raw), ' ') > 0"
            f" THEN substr(post_raw, 1,"
            f" length(post_raw) - strpos(reverse(post_raw), ' '))"
            f" ELSE '' END"
        )
    else:
        pre, post = "pre_raw", "post_raw"
    return f"""
SELECT {id_col},
  concat({pre}, '{tag_open}', substr({text_col}, f, {n}), '{tag_close}', {post})
    AS snippet
FROM (
  SELECT {id_col}, {text_col}, f, {pre_raw} AS pre_raw, {post_raw} AS post_raw
  FROM (SELECT {id_col}, {text_col}, {offs}[1] AS f FROM {table_expr})
)
WHERE f IS NOT NULL
"""
