"""VARIANT and UNION type surface.

Reference: site_docs/sql/data_types/variant.test (VARIANT literals,
variant_typeof, field access, variant_extract, shredded parquet COPY) and
union.test (UNION(num INTEGER, str VARCHAR), union_value / union_extract /
union_tag, member sugar `u.str`).

Spark-first mapping (SURVEY §1.2):
  * VARIANT → Spark 4 VariantType: `parse_json` builds it,
    `variant_get`/`try_variant_get` are variant_extract + path access,
    `schema_of_variant` is variant_typeof, `to_json` renders. Parquet
    writes carry the binary (metadata, value) encoding natively, and
    SHREDDING is a plain projection of typed paths into struct columns
    (shred_variant below).
  * UNION(tag: type, ...) → a tagged struct: one `tag` string field plus
    one NULLABLE field per member, with exactly the tagged member
    non-NULL. union_value/union_extract/union_tag reproduce the
    reference functions; the correctness gate runs the ORACLE on
    DuckDB's native UNION type, so the mapping is checked against the
    reference's own semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Members = dict[str, str]   # member name -> spark type name, declaration order


def union_value(tag: str, value: Column, members: Members) -> Column:
    """union_value(tag := value) for a UNION with the given members."""
    if tag not in members:
        raise KeyError(f"union member {tag!r} not in {list(members)}")
    fields = [F.lit(tag).alias("tag")]
    for m, dtype in members.items():
        v = value.cast(dtype) if m == tag else F.lit(None).cast(dtype)
        fields.append(v.alias(m))
    return F.struct(*fields)


def union_tag(u: Column) -> Column:
    """union_tag(u) — the active member's name."""
    return u["tag"]


def union_extract(u: Column, member: str) -> Column:
    """union_extract(u, 'member') — the member value, NULL when another
    member is active (the reference's `u.str` sugar is the same call)."""
    return u[member]


def union_render(u: Column, members: Members) -> Column:
    """`SELECT u` display semantics: the active member rendered as text
    (DuckDB's CAST(u AS VARCHAR))."""
    out = None
    for m in members:
        c, v = u["tag"] == m, u[m].cast("string")
        out = F.when(c, v) if out is None else out.when(c, v)
    return out


def variant_kind(v: Column) -> Column:
    """variant_typeof collapsed to the engine-portable label set
    (number/string/array/object) — Spark spells types as BIGINT/STRING/
    ARRAY<...>/OBJECT<...>, DuckDB's JSON layer as UBIGINT/VARCHAR/
    ARRAY/OBJECT; the gate compares the collapsed labels."""
    s = F.schema_of_variant(v)
    return (
        F.when(s.startswith("ARRAY"), F.lit("array"))
        .when(s.startswith("OBJECT") | s.startswith("STRUCT"),
              F.lit("object"))
        .when(s == "STRING", F.lit("string"))
        .otherwise(F.lit("number"))
    )


def duckdb_variant_kind(j: str) -> str:
    return (
        f"CASE json_type(json({j})) WHEN 'ARRAY' THEN 'array'"
        f" WHEN 'OBJECT' THEN 'object'"
        f" WHEN 'VARCHAR' THEN 'string' ELSE 'number' END"
    )


def shred_variant(df: DataFrame, col: str, paths: dict[str, str],
                  keep: list[str] | None = None) -> DataFrame:
    """SHREDDING {'col': 'STRUCT(name VARCHAR, age INTEGER)'}
    (variant.test example_005) as a projection: each declared path is
    pulled out as a TYPED top-level column (parquet then stores it
    shredded — min/max prunable, column-prunable), alongside the full
    variant for untyped leftovers."""
    cols = [F.col(c) for c in (keep or [])] + [F.col(col)]
    for name, dtype in paths.items():
        cols.append(
            F.try_variant_get(F.col(col), f"$.{name}", dtype).alias(name))
    return df.select(*cols)
