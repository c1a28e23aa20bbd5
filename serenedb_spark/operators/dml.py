"""Relational DML as DataFrame transforms — INSERT ON CONFLICT / MERGE
INTO / UPDATE FROM / DELETE on managed tables.

Reference: DuckDB-inherited DML surface proven by serenedb's tests
(any/pg/simple/{basic_dml,insert_conflict,update_pk}.test,
site_docs/sql/statements/merge_into/). Spark has no in-place update for
plain parquet tables; the engine's shape is the Delta-style REWRITE: each
DML op is a pure function old_state → new_state, committed by writing the
result (partition-scoped at scale — only partitions containing touched
keys rewrite).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    when_matched_update: dict[str, Column] | None = None,
    when_not_matched_insert: bool = True,
    when_matched_delete: Column | None = None,
) -> DataFrame:
    """MERGE INTO target USING source ON target.key = source.key.

    * matched + delete-condition → row dropped
    * matched → columns replaced per `when_matched_update` (default: all
      source columns win)
    * not matched → source row inserted (if enabled)

    Returns the new table state (same schema as target).
    """
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")

    has_t = F.col(f"t.{key}").isNotNull()
    has_s = F.col(f"s.{key}").isNotNull()

    out_cols = []
    for c in target.columns:
        src = F.col(f"s.{c}") if c in source.columns else F.lit(None)
        if when_matched_update is not None and c in when_matched_update:
            upd = when_matched_update[c]
        elif when_matched_update is None:
            upd = src
        else:
            upd = F.col(f"t.{c}")
        val = (
            F.when(has_t & has_s, upd)
            .when(has_t, F.col(f"t.{c}"))
            .otherwise(src if when_not_matched_insert else F.lit(None))
        )
        out_cols.append(val.alias(c))

    keep = F.lit(True)
    if when_matched_delete is not None:
        keep = ~(has_t & has_s & when_matched_delete)
    if not when_not_matched_insert:
        keep = keep & (has_t | ~has_s)

    return joined.where(keep).select(*out_cols)


def upsert(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """INSERT ... ON CONFLICT DO UPDATE (insert_conflict.test): source rows
    replace same-key target rows, new keys append."""
    return merge_into(target, source, key)


def insert_rows(
    target: DataFrame,
    rows: DataFrame,
    key: str,
    on_conflict: str = "error",
) -> DataFrame:
    """INSERT with PK-conflict handling (insert_conflict.test semantics):

      * ``"error"``   — plain INSERT: raises on any duplicate key, either
        against the target or WITHIN the inserted batch (the reference
        rejects both), and nothing is applied (all-or-nothing).
      * ``"nothing"`` — ON CONFLICT DO NOTHING: conflicting rows skipped.
      * ``"replace"`` — INSERT OR REPLACE: upsert.
    """
    if on_conflict == "replace":
        return upsert(target, rows, key)
    if on_conflict == "nothing":
        fresh = rows.join(target.select(key), key, "left_anti") \
            .dropDuplicates([key])
        return target.unionByName(fresh)
    if on_conflict != "error":
        raise ValueError(f"unknown on_conflict mode {on_conflict!r}")
    dup_batch = (
        rows.groupBy(key).count().where(F.col("count") > 1)
        .select(key).limit(1).collect()
    )
    if dup_batch:
        raise ValueError(
            f"duplicate key {key}={dup_batch[0][0]!r} within the inserted "
            "batch violates the primary key constraint"
        )
    clash = (
        rows.join(target.select(key), key, "left_semi")
        .select(key).limit(1).collect()
    )
    if clash:
        raise ValueError(
            f"duplicate key {key}={clash[0][0]!r} violates the primary "
            "key constraint"
        )
    return target.unionByName(rows)


def update_where(
    target: DataFrame, cond: Column, assignments: dict[str, Column]
) -> DataFrame:
    """UPDATE target SET col=expr WHERE cond."""
    cols = [
        F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
        if c in assignments else F.col(c)
        for c in target.columns
    ]
    return target.select(*cols)


def delete_where(target: DataFrame, cond: Column) -> DataFrame:
    """DELETE FROM target WHERE cond (NULL-safe: NULL cond keeps the row,
    matching SQL DELETE's 3VL)."""
    return target.where(~F.coalesce(cond, F.lit(False)))


def update_matching(
    target: DataFrame, keys: DataFrame, key: str,
    assignments: dict[str, Column],
) -> DataFrame:
    """UPDATE rows whose `key` appears in `keys` (the claimed match set
    of a search predicate, resolved through the inverted index). One
    equi-join on the key — distributed at any size, and broadcast by AQE
    when the match set is small."""
    marked = target.join(
        keys.select(F.col(key)).distinct().withColumn("__hit", F.lit(True)),
        key, "left")
    hit = F.col("__hit").isNotNull()
    cols = [
        F.when(hit, assignments[c]).otherwise(F.col(c)).alias(c)
        if c in assignments else F.col(c)
        for c in target.columns
    ]
    return marked.select(*cols)


def delete_matching(target: DataFrame, keys: DataFrame,
                    key: str) -> DataFrame:
    """DELETE rows whose `key` appears in `keys`: one anti-join."""
    return target.join(keys.select(key).distinct(), key, "left_anti")
