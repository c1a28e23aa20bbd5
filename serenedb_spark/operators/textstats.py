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
    """
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
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.round(avg_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(score, 4).alias("quality"),
    )


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
    n_tokens; argmax with (score desc, lang asc) tie-break; 'und' if all 0."""
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
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        F.round(best, 4).alias("lang_score"),
    )


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
