"""pgvector-compatible vector function surface, JVM-side.

Reference: server/connector/functions/vector.h:57-71 / vector.cpp —
``l2_distance <->, l2_sqr_distance, l1_distance <+>, cosine_distance <=>,
cosine_similarity, inner_product, negative_inner_product <#>, l1/l2_norm,
l1/l2_normalize``.

All implemented as higher-order-function column expressions
(zip_with + aggregate) over ``array<float|double>`` — they run inside
whole-stage codegen, no Python per row, and compose with any DataFrame plan.
Inputs are cast to double first so results are engine-portable (the DuckDB
oracle computes in double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def inner_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def negative_inner_product(a: Column, b: Column) -> Column:
    return -inner_product(a, b)


def l2_sqr_distance(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(l2_sqr_distance(a, b))


def l1_distance(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l1_norm(a: Column) -> Column:
    return F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + F.abs(x))


def l2_normalize(a: Column) -> Column:
    n = l2_norm(a)
    return F.transform(_d(a), lambda x: x / n)


def l1_normalize(a: Column) -> Column:
    n = l1_norm(a)
    return F.transform(_d(a), lambda x: x / n)


def cosine_similarity(a: Column, b: Column) -> Column:
    return inner_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


DISTANCES = {
    "l2": l2_distance,
    "l2_sqr": l2_sqr_distance,
    "l1": l1_distance,
    "cosine": cosine_distance,
    "ip": negative_inner_product,  # pgvector: smaller = closer
}


def lit_vector(v) -> Column:
    """A literal query vector as an array<double> column."""
    return F.array(*[F.lit(float(x)) for x in v])


# ---- DuckDB oracle fragments (mirror the fold order exactly) --------------

def duckdb_inner_product(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1),"
        f" i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
    )


def duckdb_l2_sqr(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1),"
        f" i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE)"
        f" * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)), (x, y) -> x + y)"
    )


def duckdb_l2(a: str, b: str) -> str:
    return f"sqrt({duckdb_l2_sqr(a, b)})"


def duckdb_l1(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1),"
        f" i -> abs({a}[i]::DOUBLE - {b}[i]::DOUBLE)), (x, y) -> x + y)"
    )


def duckdb_l2_norm(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, x -> x::DOUBLE * x::DOUBLE),"
        " (x, y) -> x + y))"
    )


def duckdb_cosine_distance(a: str, b: str) -> str:
    return (
        f"1.0 - {duckdb_inner_product(a, b)}"
        f" / ({duckdb_l2_norm(a)} * {duckdb_l2_norm(b)})"
    )


DUCKDB_DISTANCES = {
    "l2": duckdb_l2,
    "l2_sqr": duckdb_l2_sqr,
    "l1": duckdb_l1,
    "cosine": duckdb_cosine_distance,
    "ip": lambda a, b: f"-({duckdb_inner_product(a, b)})",
}


def duckdb_lit_vector(v) -> str:
    return "[" + ", ".join(repr(float(x)) for x in v) + "]"
