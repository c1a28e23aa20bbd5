"""The end-to-end training-data cleaning pipeline — compose the engine's
operators into the corpus → clean-corpus job a 100 TB pretraining set
needs (BASELINE.json north star; each stage is itself oracle-gated).

Stages (all pure DataFrame transforms, one pipeline = one Spark job DAG):
  1. exact dedup        — md5 groupBy, keep min id
  2. near-dup removal   — MinHash-LSH candidates → Jaccard confirm → drop
                          the higher id of each confirmed pair
  3. quality filter     — composite score ≥ threshold
  4. language filter    — keep target languages
  5. token-count bounds — drop too-short/too-long docs

Everything shuffles on content hashes / band keys / doc ids — no stage is
corpus × corpus. The pipeline report (rows in/out per stage) is computed
from the same lazily-built DAG.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from serenedb_spark.operators import dedup as DD
from serenedb_spark.operators import textstats as TS


@dataclass
class CleanConfig:
    text_col: str = "text"
    id_col: str = "doc_id"
    jaccard_threshold: float = 0.85
    min_quality: float = 0.3
    languages: tuple[str, ...] = ()          # empty = keep all
    min_tokens: int = 5
    max_tokens: int = 100_000
    shingle: str = "shingle3"


def clean_corpus(docs: DataFrame, cfg: CleanConfig = CleanConfig()) -> DataFrame:
    """The cleaned corpus: survivors of all five stages, original columns."""
    id_c, txt = cfg.id_col, cfg.text_col

    # 1. exact dedup
    out = DD.exact_dedup_keep(docs, txt, id_c)

    # 2. near-dup: confirmed Jaccard pairs → drop the larger id
    pairs = DD.jaccard_pairs(
        out, txt, id_c, analyzer=cfg.shingle,
        threshold=cfg.jaccard_threshold,
    )
    losers = pairs.select(F.col("id_b").alias(id_c)).distinct()
    out = out.join(losers, id_c, "left_anti")

    # 3+5. quality + token bounds (one pass over the quality features)
    qual = TS.quality_score(out, txt, id_c)
    keep_q = qual.where(
        (F.col("quality") >= cfg.min_quality)
        & (F.col("n_tokens") >= cfg.min_tokens)
        & (F.col("n_tokens") <= cfg.max_tokens)
    ).select(id_c)
    out = out.join(keep_q, id_c, "left_semi")

    # 4. language filter
    if cfg.languages:
        lang = TS.lang_id(out, txt, id_c)
        keep_l = lang.where(
            F.col("pred_lang").isin(list(cfg.languages))
        ).select(id_c)
        out = out.join(keep_l, id_c, "left_semi")

    return out


def duckdb_clean_corpus_sql(table: str, cfg: CleanConfig = CleanConfig()) -> str:
    """Oracle: the same five stages as chained CTEs over naive scans."""
    id_c, txt = cfg.id_col, cfg.text_col
    pairs_sql = f"""
WITH kept0 AS (
  SELECT * FROM {table}
  WHERE {id_c} IN (SELECT min({id_c}) FROM {table} GROUP BY md5({txt}))
),
pairs AS ({DD.duckdb_minhash_pairs_sql('kept0', txt, id_c, shingle=cfg.shingle)}),
toks AS (SELECT {id_c} AS id,
    list_distinct(list_transform(
      range(1, greatest(len(list_filter(regexp_split_to_array(lower({txt}), '[^a-z0-9]+'), t -> t <> '')) - 2, 0) + 1),
      i -> array_to_string(list_slice(list_filter(regexp_split_to_array(lower({txt}), '[^a-z0-9]+'), t -> t <> ''), i, i + 2), ' ')
    )) AS toks
  FROM kept0),
confirmed AS (
  SELECT id_a, id_b FROM pairs
  JOIN toks a ON a.id = id_a JOIN toks b ON b.id = id_b
  WHERE round(len(list_intersect(a.toks, b.toks))::DOUBLE
        / len(list_distinct(a.toks || b.toks)), 6) >= {cfg.jaccard_threshold}
),
kept1 AS (
  SELECT * FROM kept0 WHERE {id_c} NOT IN (SELECT id_b FROM confirmed)
),
q AS ({TS.duckdb_quality_sql('kept1', txt, id_c)}),
kept2 AS (
  SELECT k.* FROM kept1 k JOIN q ON q.doc_id = k.{id_c}
  WHERE q.quality >= {cfg.min_quality}
    AND q.n_tokens BETWEEN {cfg.min_tokens} AND {cfg.max_tokens}
)"""
    if cfg.languages:
        langs = ", ".join(f"'{l}'" for l in cfg.languages)
        return f"""{pairs_sql},
l AS ({TS.duckdb_lang_id_sql('kept2', txt, id_c)})
SELECT k.{id_c} FROM kept2 k JOIN l ON l.doc_id = k.{id_c}
WHERE l.pred_lang IN ({langs})
ORDER BY k.{id_c}
"""
    return f"{pairs_sql}\nSELECT {id_c} FROM kept2 ORDER BY {id_c}\n"
