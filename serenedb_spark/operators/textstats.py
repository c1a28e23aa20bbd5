"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

Engine-portable by construction: every formula uses only functions with
exact DuckDB equivalents, so each operator is checkable by the t2 oracle
gate. All JVM-side expressions (no Python UDFs in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from serenedb_spark.analysis.analyzers import ENGLISH_STOPWORDS, get_analyzer

# tiny per-language function-word lists (deterministic langid heuristic)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "y", "es", "no", "una", "por", "con", "para"),
}


def token_count(df: DataFrame, text_col: str = "text", analyzer: str = "simple",
                id_col: str = "doc_id") -> DataFrame:
    an = get_analyzer(analyzer)
    return df.select(
        F.col(id_col),
        F.size(an.expr(F.col(text_col))).alias("n_tokens"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:

      n_tokens        simple-analyzer token count
      avg_token_len   mean characters per token
      stopword_ratio  fraction of tokens in ENGLISH_STOPWORDS
      alpha_ratio     fraction of characters that are a-z/space
      score = 0.4*min(n_tokens/100, 1) + 0.3*stopword-band + 0.3*alpha_ratio

    (Gopher/C4-style filters reduced to deterministic SQL-expressible form.)

    Column tree memoized per (text_col, id_col) — expressions only, the
    plan is still built and executed fresh per call (expr_memo docs).
    """
    from serenedb_spark.functions.expr_memo import memo_exprs

    return df.select(*memo_exprs(
        ("quality_score", text_col, id_col),
        lambda: _quality_cols(text_col, id_col)))


def _quality_cols(text_col: str, id_col: str) -> list:
    an = get_analyzer("simple")
    toks = an.expr(F.col(text_col))
    stop = F.array(*[F.lit(w) for w in ENGLISH_STOPWORDS])
    n = F.size(toks)
    nz = F.when(n > 0, n.cast("double"))
    avg_len = (
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double")
        / nz
    )
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("double")
        / nz
    )
    alpha_ratio = (
        F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", "")).cast(
            "double"
        )
        / F.when(F.length(text_col) > 0, F.length(text_col).cast("double"))
    )
    stop_band = F.when(
        (stop_ratio >= 0.05) & (stop_ratio <= 0.6), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * F.least(n.cast("double") / 100.0, F.lit(1.0))
        + F.lit(0.3) * stop_band
        + F.lit(0.3) * F.coalesce(alpha_ratio, F.lit(0.0))
    )
    return [
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(score, 4).alias("quality"),
    ]


def duckdb_quality_sql(table: str, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    an = get_analyzer("simple")
    toks = an.duckdb(text_col)
    stop = "[" + ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS) + "]"
    return f"""
WITH base AS (SELECT {id_col} AS doc_id, {text_col} AS text, {toks} AS toks FROM {table})
SELECT doc_id,
  len(toks) AS n_tokens,
  round(list_reduce(list_prepend(0, list_transform(toks, t -> length(t))), (a, b) -> a + b)::DOUBLE
        / nullif(len(toks), 0), 4) AS avg_token_len,
  round(len(list_filter(toks, t -> list_contains({stop}, t)))::DOUBLE
        / nullif(len(toks), 0), 4) AS stopword_ratio,
  round(length(regexp_replace(lower(text), '[^a-z ]', '', 'g'))::DOUBLE
        / nullif(length(text), 0), 4) AS alpha_ratio,
  round(0.4 * least(len(toks)::DOUBLE / 100.0, 1.0)
      + 0.3 * (CASE WHEN len(list_filter(toks, t -> list_contains({stop}, t)))::DOUBLE
                         / nullif(len(toks), 0) BETWEEN 0.05 AND 0.6
               THEN 1.0 ELSE 0.0 END)
      + 0.3 * coalesce(length(regexp_replace(lower(text), '[^a-z ]', '', 'g'))::DOUBLE
                       / nullif(length(text), 0), 0.0), 4) AS quality
FROM base
"""


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Marker-word language ID: score(lang) = |tokens ∩ markers(lang)| /
    n_tokens; argmax with (score desc, lang asc) tie-break; 'und' if all 0.

    Column tree memoized per (text_col, id_col) — expressions only, the
    plan is still built and executed fresh per call (expr_memo docs)."""
    from serenedb_spark.functions.expr_memo import memo_exprs

    return df.select(*memo_exprs(
        ("lang_id", text_col, id_col),
        lambda: _lang_id_cols(text_col, id_col)))


def _lang_id_cols(text_col: str, id_col: str) -> list:
    an = get_analyzer("simple")
    toks = an.expr(F.col(text_col))
    n = F.size(toks)
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        m = F.array(*[F.lit(w) for w in markers])
        s = F.size(F.filter(toks, lambda t: F.array_contains(m, t))).cast(
            "double"
        ) / F.when(n > 0, n.cast("double"))
        scores.append((lang, F.coalesce(s, F.lit(0.0))))
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    for lang, s in reversed(scores):  # earlier langs win ties → apply last
        pred = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return [
        F.col(id_col),
        pred.alias("pred_lang"),
        F.round(best, 4).alias("lang_score"),
    ]


def duckdb_lang_id_sql(table: str, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    an = get_analyzer("simple")
    toks = an.duckdb(text_col)
    score_exprs = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        m = "[" + ", ".join(f"'{w}'" for w in markers) + "]"
        score_exprs.append(
            f"coalesce(len(list_filter(toks, t -> list_contains({m}, t)))::DOUBLE"
            f" / nullif(len(toks), 0), 0.0) AS s_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    best = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    pred = "CASE "
    for l in langs:
        pred += f"WHEN s_{l} = best AND best > 0 THEN '{l}' "
    pred += "ELSE 'und' END"
    return f"""
WITH base AS (SELECT {id_col} AS doc_id, {toks} AS toks FROM {table}),
scored AS (SELECT doc_id, {', '.join(score_exprs)} FROM base),
b AS (SELECT *, {best} AS best FROM scored)
SELECT doc_id, {pred} AS pred_lang, round(best, 4) AS lang_score FROM b
"""


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle: str = "shingle3",
) -> DataFrame:
    """Deterministic document fingerprint: min md5 over distinct shingles
    (winnowing reduced to global-min for portability); falls back to md5 of
    the whole text when the doc is shorter than one shingle."""
    an = get_analyzer(shingle)
    toks = F.array_distinct(an.expr(F.col(text_col)))
    fp = F.coalesce(
        F.array_min(F.transform(toks, lambda t: F.md5(t))),
        F.md5(F.col(text_col)),
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


def duckdb_fingerprint_sql(table: str, text_col: str = "text",
                           id_col: str = "doc_id", shingle: str = "shingle3") -> str:
    an = get_analyzer(shingle)
    toks = f"list_distinct({an.duckdb(text_col)})"
    return f"""
SELECT {id_col} AS doc_id,
  coalesce(list_min(list_transform({toks}, t -> md5(t))), md5({text_col})) AS fingerprint
FROM {table}
"""


# ---- PII redaction (corpus-cleaning stage) --------------------------------
# Regex rewriting of the classic identifier shapes before training-data
# release: emails, international-ish phone numbers, IPv4 literals. Pure
# regexp_replace (JVM-side, codegen); the same RE2/Java-compatible
# patterns state the DuckDB oracle. The pattern set is deliberately
# conservative/documented — a production pipeline extends the table, the
# operator shape (ordered rewrite cascade + per-category hit counts) is
# what the engine provides.

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    # ipv4 MUST precede phone: the phone pattern fully matches dotted
    # IPv4s whose middle octets have 3 digits (192.168.100.1), which
    # would misattribute them to n_phone; dotted phone numbers are safe
    # the other way (a 4-digit final group never parses as an octet)
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}",
     "<PHONE>"),
)


def redact_pii(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(id, redacted_text, n_<category>... , n_redacted): the rewrite
    cascade applies in PII_PATTERNS order (earlier categories win
    overlapping spans); hit counts are computed per category BEFORE its
    rewrite so they report true occurrence counts."""
    out_cols = [F.col(id_col)]
    cur = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        # idx=0: whole-match extraction (the default idx=1 needs a group)
        n = F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))) \
            .alias(f"n_{name}")
        counts.append(n)
        cur = F.regexp_replace(cur, pat, repl)
    total = None
    for c in counts:
        total = c if total is None else total + c
    return df.select(
        *out_cols, cur.alias("redacted"), *counts,
        total.alias("n_redacted"),
    )


def duckdb_redact_sql(table: str, text_col: str = "text",
                      id_col: str = "doc_id") -> str:
    cur = text_col
    counts, names = [], []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            f"len(regexp_extract_all({cur}, '{pat}')) AS n_{name}")
        names.append(f"n_{name}")
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    total = " + ".join(names)
    return (
        f"SELECT {id_col}, {cur} AS redacted, {', '.join(counts)},"
        f" {total} AS n_redacted FROM {table}"
    )


# ---- chunking (LLM training-data prep) ------------------------------------

def chunk_documents(df: DataFrame, chunk_tokens: int, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id",
                    analyzer: str = "simple") -> DataFrame:
    """Split each document into ~chunk_tokens-token windows with
    ``overlap`` tokens of context carried between consecutive chunks —
    the standard pretraining-corpus shaping step. One explode, no
    shuffle: (doc_id, chunk_no, chunk_text, n_tokens). Chunk boundaries
    are token-aligned (whitespace-joined analyzer tokens); stride =
    chunk_tokens - overlap."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    an = get_analyzer(analyzer)
    toks = an.expr(F.col(text_col))
    n = F.size(toks)
    # clamp to ≥1 chunk for any non-empty doc: for 1 ≤ n ≤ overlap the
    # bare formula evaluates to 0 and the document would vanish from the
    # corpus entirely (every short doc is still one undersized chunk)
    n_chunks = F.when(
        n <= 0, F.lit(0)
    ).otherwise(F.greatest(
        F.lit(1),
        F.floor((n - F.lit(overlap) - 1) / F.lit(stride)).cast("int") + 1))
    # NB: bare sequence(0, n_chunks-1) is the descending-sequence trap —
    # sequence(0, -1) == [0, -1] — so empty docs must short-circuit
    starts = F.when(n_chunks <= 0, F.array().cast("array<int>")) \
        .otherwise(F.transform(
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
            lambda i: i * stride))
    chunks = F.transform(
        starts,
        lambda s: F.slice(toks, s + 1, F.lit(chunk_tokens)))
    return (
        df.select(F.col(id_col), F.posexplode(chunks)
                  .alias("chunk_no", "__toks"))
        .select(
            id_col, "chunk_no",
            F.array_join("__toks", " ").alias("chunk_text"),
            F.size("__toks").alias("n_tokens"),
        )
    )


def duckdb_chunk_sql(table: str, chunk_tokens: int, overlap: int = 0,
                     text_col: str = "text", id_col: str = "doc_id") -> str:
    """Oracle for chunk_documents with the `simple` analyzer."""
    stride = chunk_tokens - overlap
    toks = (f"list_filter(regexp_split_to_array(lower({text_col}),"
            f" '[^a-z0-9]+'), t -> t <> '')")
    return f"""
WITH base AS (SELECT {id_col}, {toks} AS toks FROM {table}),
shaped AS (
  SELECT {id_col}, toks,
    CASE WHEN len(toks) <= 0 THEN 0
         ELSE greatest(1,
           CAST(floor((len(toks) - {overlap} - 1) / {stride}) AS INT) + 1)
    END AS n_chunks
  FROM base),
ex AS (
  SELECT {id_col}, CAST(u.i AS INT) AS chunk_no,
    toks[u.i * {stride} + 1 : u.i * {stride} + {chunk_tokens}] AS ctoks
  FROM shaped, LATERAL unnest(range(0, n_chunks)) AS u(i))
SELECT {id_col}, chunk_no,
  list_aggregate(ctoks, 'string_agg', ' ') AS chunk_text,
  len(ctoks) AS n_tokens
FROM ex
"""


# ---- Gopher corpus-filter rules ------------------------------------------

#: the minimal stop list Gopher's "contains ≥2 stop words" rule uses
#: (Rae et al. 2021, appendix A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
) -> DataFrame:
    """The published Gopher document-quality rules (Rae et al. 2021,
    appendix A1.1) as per-doc boolean flags plus a combined keep flag:

      r_word_count     min_words ≤ |words| ≤ max_words
      r_mean_len       3 ≤ mean word length ≤ 10
      r_symbol_ratio   (# of '#' + '...') / |words| ≤ 0.1
      r_bullet_lines   < 90% of lines start with a bullet ('-' or '*')
      r_ellipsis_lines < 30% of lines end with '...'
      r_alpha_words    > 80% of words contain an alphabetic char
      r_stop_words     ≥ 2 distinct words from the 8-word stop list
      r_dup_lines      ≤ 30% of lines are duplicates of an earlier line
      r_dup_line_chars ≤ 20% of characters sit in duplicated lines
      r_top_2gram      chars covered by the most frequent word 2-gram
                       ≤ 20% of the text

    (min_words defaults to 20, not the paper's 50 — the synthetic docs
    are short; the threshold is a parameter.) All flags are pure column
    expressions over one whitespace split — no shuffle, no Python.

    The ~60-node flag tree is memoized per (params) — building it cost
    ~0.4 s of py4j round-trips per call (guide §1.3 decomposition), ~half
    this query's bench latency; the memo caches the unresolved
    EXPRESSIONS only, every call still plans and executes fresh."""
    from serenedb_spark.functions.expr_memo import memo_exprs

    return df.select(*memo_exprs(
        ("gopher_rules", text_col, id_col, min_words, max_words),
        lambda: _gopher_cols(text_col, id_col, min_words, max_words)))


def _gopher_cols(text_col: str, id_col: str,
                 min_words: int, max_words: int) -> list:
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda l: l != "")
    n = F.size(words)
    nz = F.when(n > 0, n.cast("double"))
    nl = F.size(lines)
    nlz = F.when(nl > 0, nl.cast("double"))
    mean_len = (
        F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
        .cast("double") / nz
    )
    n_hash = F.size(F.filter(words, lambda w: w.contains("#")))
    n_ell = F.size(F.filter(words, lambda w: w.contains("...")))
    symbol_ratio = (n_hash + n_ell).cast("double") / nz
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.startswith("-") | l.startswith("*")))
        .cast("double") / nlz
    )
    ell_frac = (
        F.size(F.filter(lines, lambda l: l.endswith("...")))
        .cast("double") / nlz
    )
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
        .cast("double") / nz
    )
    stop = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.array_intersect(F.transform(words, F.lower), stop))
    # repetition rules: per-distinct-element occurrence counts as ONE
    # linear run-length fold over the SORTED array (equal elements are
    # adjacent after array_sort, so a (prev, run_count, acc) struct state
    # flushes each run once) — O(n log n) per row. The r6 shape re-filtered
    # the whole array per distinct element: O(n²), ~10^10 comparisons on a
    # real 100k-word web document.
    dlines = F.array_distinct(lines)
    dup_line_frac = (nl - F.size(dlines)).cast("double") / nlz

    def _dup_flush(s):
        # chars sitting in duplicated lines: runs of length > 1 contribute
        # run_count × line_length
        return F.when(s["cnt"] > 1,
                      s["cnt"] * F.length(s["prev"])).otherwise(F.lit(0))

    dup_line_chars = (
        F.aggregate(
            F.array_sort(lines),
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).cast("long").alias("cnt"),
                F.lit(0).cast("long").alias("acc"),
            ),
            lambda s, x: F.when(
                x == s["prev"],  # NULL prev (first element) starts a run
                F.struct(x.alias("prev"), (s["cnt"] + 1).alias("cnt"),
                         s["acc"].alias("acc")),
            ).otherwise(
                F.struct(x.alias("prev"),
                         F.lit(1).cast("long").alias("cnt"),
                         (s["acc"] + _dup_flush(s)).alias("acc"))),
            lambda s: s["acc"] + _dup_flush(s),
        ).cast("double")
        / F.when(F.length(text_col) > 0, F.length(text_col).cast("double"))
    )
    grams = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )

    def _top_flush(s):
        # coverage of one distinct 2-gram: count × chars (count ≥ 1 runs
        # all contribute — the max is over EVERY distinct gram)
        return F.when(s["cnt"] > 0, s["cnt"] * F.length(s["prev"]))

    top2 = F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("cnt"),
            F.lit(None).cast("long").alias("best"),
        ),
        lambda s, x: F.when(
            x == s["prev"],
            F.struct(x.alias("prev"), (s["cnt"] + 1).alias("cnt"),
                     s["best"].alias("best")),
        ).otherwise(
            F.struct(x.alias("prev"), F.lit(1).cast("long").alias("cnt"),
                     # greatest skips NULLs: first flush (cnt=0 → NULL)
                     # leaves best untouched
                     F.greatest(s["best"], _top_flush(s)).alias("best"))),
        lambda s: F.greatest(s["best"], _top_flush(s)),
    )
    top2_frac = (
        top2.cast("double")
        / F.when(F.length(text_col) > 0, F.length(text_col).cast("double"))
    )
    flags = {
        "r_word_count": (n >= min_words) & (n <= max_words),
        "r_mean_len": (mean_len >= 3.0) & (mean_len <= 10.0),
        "r_symbol_ratio": F.coalesce(symbol_ratio <= 0.1, F.lit(False)),
        "r_bullet_lines": F.coalesce(bullet_frac < 0.9, F.lit(False)),
        "r_ellipsis_lines": F.coalesce(ell_frac < 0.3, F.lit(False)),
        "r_alpha_words": F.coalesce(alpha_frac > 0.8, F.lit(False)),
        "r_stop_words": stop_hits >= 2,
        "r_dup_lines": F.coalesce(dup_line_frac <= 0.3, F.lit(False)),
        "r_dup_line_chars": F.coalesce(dup_line_chars <= 0.2,
                                       F.lit(False)),
        "r_top_2gram": F.coalesce(top2_frac <= 0.2, F.lit(False)),
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    cols = [F.col(id_col)]
    cols += [v.cast("int").alias(k) for k, v in flags.items()]
    cols.append(keep.cast("int").alias("keep"))
    return cols


def duckdb_gopher_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 100_000,
) -> str:
    """Oracle mirroring gopher_rules symbol-for-symbol."""
    stop = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
    list_filter(regexp_split_to_array({text_col}, '\\s+'), w -> w <> '')
      AS words,
    list_filter(string_split({text_col}, chr(10)), l -> l <> '') AS lines,
    length({text_col}) AS tlen
  FROM {table}
), m AS (
  SELECT doc_id, words, lines, tlen,
    len(words) AS n,
    nullif(len(words), 0)::DOUBLE AS nz,
    nullif(len(lines), 0)::DOUBLE AS nlz
  FROM base
), lc AS (
  -- chars in duplicated lines, linear: unnest → per-(doc, line) counts
  SELECT doc_id, sum(CASE WHEN c > 1 THEN c * length(l) ELSE 0 END)
           AS dup_chars
  FROM (SELECT doc_id, l, count(*) AS c
        FROM (SELECT doc_id, unnest(lines) AS l FROM m)
        GROUP BY doc_id, l)
  GROUP BY doc_id
), g2 AS (
  -- top word-2-gram coverage, linear: unnest → per-(doc, gram) counts
  SELECT doc_id, max(c * length(g)) AS top2
  FROM (SELECT doc_id, g, count(*) AS c
        FROM (SELECT doc_id,
                unnest(list_transform(range(1, greatest(n, 1)),
                                      i -> words[i] || ' ' || words[i + 1]))
                  AS g
              FROM m)
        GROUP BY doc_id, g)
  GROUP BY doc_id
), f AS (
  SELECT doc_id,
    (n >= {min_words} AND n <= {max_words}) AS r_word_count,
    (list_reduce(list_prepend(0, list_transform(words, w -> length(w))),
                 (a, b) -> a + b)::DOUBLE / nz BETWEEN 3.0 AND 10.0)
      AS r_mean_len,
    coalesce((len(list_filter(words, w -> contains(w, '#')))
            + len(list_filter(words, w -> contains(w, '...'))))::DOUBLE
           / nz <= 0.1, FALSE) AS r_symbol_ratio,
    coalesce(len(list_filter(lines, l -> starts_with(l, '-')
                                      OR starts_with(l, '*')))::DOUBLE
           / nlz < 0.9, FALSE) AS r_bullet_lines,
    coalesce(len(list_filter(lines, l -> suffix(l, '...')))::DOUBLE
           / nlz < 0.3, FALSE) AS r_ellipsis_lines,
    coalesce(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
           / nz > 0.8, FALSE) AS r_alpha_words,
    (len(list_intersect(list_transform(words, w -> lower(w)), {stop})) >= 2)
      AS r_stop_words,
    coalesce((len(lines) - len(list_distinct(lines)))::DOUBLE / nlz <= 0.3,
             FALSE) AS r_dup_lines,
    coalesce(coalesce(lc.dup_chars, 0)::DOUBLE
           / nullif(tlen, 0) <= 0.2, FALSE)
      AS r_dup_line_chars,
    coalesce(g2.top2::DOUBLE
           / nullif(tlen, 0) <= 0.2, FALSE) AS r_top_2gram
  FROM m LEFT JOIN lc USING (doc_id) LEFT JOIN g2 USING (doc_id)
)
SELECT doc_id,
  r_word_count::INT AS r_word_count,
  r_mean_len::INT AS r_mean_len,
  r_symbol_ratio::INT AS r_symbol_ratio,
  r_bullet_lines::INT AS r_bullet_lines,
  r_ellipsis_lines::INT AS r_ellipsis_lines,
  r_alpha_words::INT AS r_alpha_words,
  r_stop_words::INT AS r_stop_words,
  r_dup_lines::INT AS r_dup_lines,
  r_dup_line_chars::INT AS r_dup_line_chars,
  r_top_2gram::INT AS r_top_2gram,
  (r_word_count AND r_mean_len AND r_symbol_ratio AND r_bullet_lines
   AND r_ellipsis_lines AND r_alpha_words AND r_stop_words
   AND r_dup_lines AND r_dup_line_chars AND r_top_2gram)::INT AS keep
FROM f
"""
