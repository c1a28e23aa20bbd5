"""INET IPv6 subset — pure column expressions.

Reference: the inet extension surface (tests/sqllogic/sdb/pg/simple/
inet.test) is dual-family; functions/inet.py covers IPv4, this module adds
IPv6: host, masklen, network, broadcast, netmask, containment, plus the
canonical-key form.

Representation: neither engine has portable 128-bit integers, so the
canonical value is the 32-char zero-padded lowercase HEX string of the
address — memcmp order equals numeric order (the same contract as
functions/key_encoding.py), and every mask operation is nibble
arithmetic: a /m prefix keeps m//4 whole hex chars plus one partially
masked boundary nibble (mask 8/12/14 for m%4 = 1/2/3), implemented as
(digit div s)*s with s = 2^(4-m%4) — identical fragments for Spark and
DuckDB, so the battery is gate-checkable without the inet extension.

'::' zero-run compression is EXPANDED on parse; rendering emits the full
8-group form with per-group leading zeros stripped (no re-compression —
documented deviation from PG's shortest-form canonical output).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


# ---------------------------------------------------------------------------
# pyspark columns
# ---------------------------------------------------------------------------

def _addr_mask(col: Column) -> tuple[Column, Column]:
    parts = F.split(col, "/")
    addr = parts[0]
    # F.get (not []) — mask-less addresses have no element 1
    m = F.coalesce(F.get(parts, 1).try_cast("int"), F.lit(128))
    return addr, m


def ip6_canon(col: Column) -> Column:
    """address (with or without '::' compression, ignoring any /mask) →
    32-char lowercase hex key."""
    s = F.lower(_addr_mask(col)[0])
    s = F.when(s.startswith("::"), F.concat(F.lit("0"), s)).otherwise(s)
    s = F.when(s.endswith("::"), F.concat(s, F.lit("0"))).otherwise(s)
    halves = F.split(s, "::")
    left = F.split(halves[0], ":")
    # F.get tolerates the missing element when there is no '::'
    right = F.when(F.size(halves) > 1, F.split(F.get(halves, 1), ":")) \
        .otherwise(F.array().cast("array<string>"))
    zeros = F.array_repeat(
        F.lit("0"), (F.lit(8) - F.size(left) - F.size(right)).cast("int"))
    groups = F.when(F.size(halves) > 1,
                    F.concat(left, zeros, right)).otherwise(left)
    return F.array_join(
        F.transform(groups, lambda g: F.lpad(g, 4, "0")), "")


def ip6_masklen(col: Column) -> Column:
    return _addr_mask(col)[1]


def _boundary(canon: Column, m: Column, fill_low: bool) -> Column:
    """The partially-masked nibble at bit boundary m (empty string when m
    is nibble-aligned)."""
    keep = F.floor(m / 4).cast("int")
    bits = m % 4
    d = F.conv(F.substring(canon, keep + 1, 1), 16, 10).cast("int")
    s = F.pow(F.lit(2.0), (F.lit(4) - bits).cast("double")).cast("int")
    masked = F.floor(d / s).cast("int") * s
    v = (masked + s - 1) if fill_low else masked
    return F.when(bits == 0, F.lit("")) \
        .otherwise(F.substring(F.lit(_HEX), v + 1, 1))


def _prefix_fill(canon: Column, m: Column, fill: str) -> Column:
    keep = F.floor(m / 4).cast("int")
    used = keep + (m % 4 > 0).cast("int")
    return F.concat(
        F.substring(canon, 1, keep),
        _boundary(canon, m, fill == "f"),
        F.repeat(F.lit(fill), F.lit(32) - used),
    )


def ip6_render(canon: Column, m: Column | None = None) -> Column:
    """hex key → full 8-group form, leading zeros stripped per group,
    optional /mask suffix."""
    groups = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: F.regexp_replace(
            F.substring(canon, i * 4 + 1, 4), "^0{1,3}", ""),
    )
    out = F.array_join(groups, ":")
    if m is None:
        return out
    return F.concat(out, F.lit("/"), m.cast("string"))


def ip6_host(col: Column) -> Column:
    return ip6_render(ip6_canon(col))


def ip6_network(col: Column) -> Column:
    canon, m = ip6_canon(col), ip6_masklen(col)
    return ip6_render(_prefix_fill(canon, m, "0"), m)


def ip6_broadcast(col: Column) -> Column:
    canon, m = ip6_canon(col), ip6_masklen(col)
    return ip6_render(_prefix_fill(canon, m, "f"), m)


def ip6_netmask(col: Column) -> Column:
    m = ip6_masklen(col)
    keep = F.floor(m / 4).cast("int")
    bits = m % 4
    bchar = (F.when(bits == 0, F.lit(""))
             .when(bits == 1, F.lit("8"))
             .when(bits == 2, F.lit("c"))
             .otherwise(F.lit("e")))
    used = keep + (bits > 0).cast("int")
    canon = F.concat(F.repeat(F.lit("f"), keep), bchar,
                     F.repeat(F.lit("0"), F.lit(32) - used))
    return ip6_render(canon, m)


def ip6_contains(net_col: Column, addr_col: Column) -> Column:
    """`network >> address`: the first masklen(net) bits agree."""
    canon_n, m = ip6_canon(net_col), ip6_masklen(net_col)
    canon_a = ip6_canon(addr_col)
    return (_prefix_fill(canon_n, m, "0")
            == _prefix_fill(canon_a, m, "0"))


# ---------------------------------------------------------------------------
# DuckDB fragments (same arithmetic)
# ---------------------------------------------------------------------------

def _d_addr(e: str) -> str:
    return f"string_split({e}, '/')[1]"


def d_masklen(e: str) -> str:
    return f"coalesce(TRY_CAST(string_split({e}, '/')[2] AS INT), 128)"


def d_canon(e: str) -> str:
    s = f"lower({_d_addr(e)})"
    s = f"(CASE WHEN starts_with({s}, '::') THEN '0' || {s} ELSE {s} END)"
    s = f"(CASE WHEN ends_with({s}, '::') THEN {s} || '0' ELSE {s} END)"
    halves = f"string_split({s}, '::')"
    left = f"string_split({halves}[1], ':')"
    right = (f"(CASE WHEN len({halves}) > 1"
             f" THEN string_split({halves}[2], ':')"
             f" ELSE []::VARCHAR[] END)")
    zeros = (f"list_transform(range(8 - len({left}) - len({right})),"
             f" x -> '0')")
    groups = (f"(CASE WHEN len({halves}) > 1"
              f" THEN flatten([{left}, {zeros}, {right}])"
              f" ELSE {left} END)")
    return (f"list_aggregate(list_transform({groups},"
            f" g -> lpad(g, 4, '0')), 'string_agg', '')")


def _d_boundary(canon: str, m: str, fill_low: bool) -> str:
    keep = f"CAST(floor({m} / 4) AS INT)"
    bits = f"({m} % 4)"
    # nibble value via position in the hex alphabet (value = pos - 1)
    d = f"(strpos('{_HEX}', substr({canon}, {keep} + 1, 1)) - 1)"
    s = f"CAST(power(2, 4 - {bits}) AS INT)"
    masked = f"(CAST(floor({d} / {s}) AS INT) * {s})"
    v = f"({masked} + {s} - 1)" if fill_low else masked
    return (f"(CASE WHEN {bits} = 0 THEN ''"
            f" ELSE substr('{_HEX}', {v} + 1, 1) END)")


def _d_prefix_fill(canon: str, m: str, fill: str) -> str:
    keep = f"CAST(floor({m} / 4) AS INT)"
    used = f"({keep} + CASE WHEN {m} % 4 > 0 THEN 1 ELSE 0 END)"
    return (f"(substr({canon}, 1, {keep})"
            f" || {_d_boundary(canon, m, fill == 'f')}"
            f" || repeat('{fill}', 32 - {used}))")


def d_render(canon: str, m: str | None = None) -> str:
    groups = (f"list_transform(range(0, 8), i ->"
              f" regexp_replace(substr({canon}, i * 4 + 1, 4),"
              f" '^0{{1,3}}', ''))")
    out = f"list_aggregate({groups}, 'string_agg', ':')"
    if m is None:
        return out
    return f"({out} || '/' || {m})"


def d_host(e: str) -> str:
    return d_render(d_canon(e))


def d_network(e: str) -> str:
    return d_render(_d_prefix_fill(d_canon(e), d_masklen(e), "0"),
                    d_masklen(e))


def d_broadcast(e: str) -> str:
    return d_render(_d_prefix_fill(d_canon(e), d_masklen(e), "f"),
                    d_masklen(e))


def d_netmask(e: str) -> str:
    m = d_masklen(e)
    keep = f"CAST(floor({m} / 4) AS INT)"
    bchar = (f"(CASE {m} % 4 WHEN 0 THEN '' WHEN 1 THEN '8'"
             f" WHEN 2 THEN 'c' ELSE 'e' END)")
    used = f"({keep} + CASE WHEN {m} % 4 > 0 THEN 1 ELSE 0 END)"
    canon = (f"(repeat('f', {keep}) || {bchar}"
             f" || repeat('0', 32 - {used}))")
    return d_render(canon, m)


def d_contains(net: str, addr: str) -> str:
    m = d_masklen(net)
    return (f"({_d_prefix_fill(d_canon(net), m, '0')}"
            f" = {_d_prefix_fill(d_canon(addr), m, '0')})")


# -- canon-staged variants: compute ip6_canon/ip6_masklen ONCE in a prior
# projection and derive everything from them. In a single fused Project,
# each operator re-derives the canonical key — Catalyst happily inlines
# ~6 copies of the parse into one stage and the generated code blows past
# the JIT's happy zone (profiled: 7 s for 300 rows fused vs 0.3 s staged).

def ip6_network_c(canon: Column, m: Column) -> Column:
    return ip6_render(_prefix_fill(canon, m, "0"), m)


def ip6_broadcast_c(canon: Column, m: Column) -> Column:
    return ip6_render(_prefix_fill(canon, m, "f"), m)


def ip6_contains_c(net_lit: str, canon: Column) -> Column:
    """Containment of a pre-canonicalized address in a LITERAL network
    (prefix comparison computed at plan time)."""
    naddr, _, nmask = net_lit.partition("/")
    m = int(nmask) if nmask else 128
    keep, bits = divmod(m, 4)
    # driver-side canonicalization of the literal network
    import re as _re

    s = naddr.lower()
    if s.startswith("::"):
        s = "0" + s
    if s.endswith("::"):
        s = s + "0"
    if "::" in s:
        left, right = s.split("::")
        lg = left.split(":")
        rg = right.split(":") if right else []
        groups = lg + ["0"] * (8 - len(lg) - len(rg)) + rg
    else:
        groups = s.split(":")
    ncanon = "".join(g.zfill(4) for g in groups)
    cond = F.substring(canon, 1, keep) == F.lit(ncanon[:keep])
    if bits:
        step = 1 << (4 - bits)
        want = (int(ncanon[keep], 16) // step) * step
        d = F.conv(F.substring(canon, keep + 1, 1), 16, 10).cast("int")
        cond = cond & ((F.floor(d / step) * step).cast("int")
                       == F.lit(want))
    return cond


# ---------------------------------------------------------------------------
# Spark SQL-text fragments (same arithmetic as the Column builders above).
#
# Why text: the Column builders compose thousands of py4j calls; profiled
# at 1.05 s of driver-side Python per inet6_battery build vs 0.14 s of
# actual execution. A SQL string is one JVM parse. The fragments mirror
# the d_* DuckDB generators symbol-for-symbol (get() is Spark's 0-based
# null-safe element access, array_join/array_repeat replace the list_*
# forms).
# ---------------------------------------------------------------------------

def _s_addr(e: str) -> str:
    return f"get(split({e}, '/'), 0)"


def s_masklen(e: str) -> str:
    return f"coalesce(try_cast(get(split({e}, '/'), 1) AS INT), 128)"


def s_canon(e: str) -> str:
    s = f"lower({_s_addr(e)})"
    s = f"(CASE WHEN left({s}, 2) = '::' THEN '0' || {s} ELSE {s} END)"
    s = f"(CASE WHEN right({s}, 2) = '::' THEN {s} || '0' ELSE {s} END)"
    halves = f"split({s}, '::')"
    left = f"split(get({halves}, 0), ':')"
    right = (f"(CASE WHEN size({halves}) > 1"
             f" THEN split(get({halves}, 1), ':')"
             f" ELSE CAST(array() AS ARRAY<STRING>) END)")
    zeros = (f"array_repeat('0',"
             f" CAST(8 - size({left}) - size({right}) AS INT))")
    groups = (f"(CASE WHEN size({halves}) > 1"
              f" THEN concat({left}, {zeros}, {right})"
              f" ELSE {left} END)")
    return (f"array_join(transform({groups},"
            f" g -> lpad(g, 4, '0')), '')")


def _s_boundary(canon: str, m: str, fill_low: bool) -> str:
    keep = f"CAST(floor({m} / 4) AS INT)"
    bits = f"({m} % 4)"
    d = f"CAST(conv(substring({canon}, {keep} + 1, 1), 16, 10) AS INT)"
    s = f"CAST(power(2, 4 - {bits}) AS INT)"
    masked = f"(CAST(floor({d} / {s}) AS INT) * {s})"
    v = f"({masked} + {s} - 1)" if fill_low else masked
    return (f"(CASE WHEN {bits} = 0 THEN ''"
            f" ELSE substring('{_HEX}', {v} + 1, 1) END)")


def _s_prefix_fill(canon: str, m: str, fill: str) -> str:
    keep = f"CAST(floor({m} / 4) AS INT)"
    used = f"({keep} + CASE WHEN {m} % 4 > 0 THEN 1 ELSE 0 END)"
    return (f"(substring({canon}, 1, {keep})"
            f" || {_s_boundary(canon, m, fill == 'f')}"
            f" || repeat('{fill}', 32 - {used}))")


def s_render(canon: str, m: str | None = None) -> str:
    groups = (f"transform(sequence(0, 7), i ->"
              f" regexp_replace(substring({canon}, i * 4 + 1, 4),"
              f" '^0{{1,3}}', ''))")
    out = f"array_join({groups}, ':')"
    if m is None:
        return out
    return f"({out} || '/' || CAST({m} AS STRING))"


def s_network_c(canon: str, m: str) -> str:
    return s_render(_s_prefix_fill(canon, m, "0"), m)


def s_broadcast_c(canon: str, m: str) -> str:
    return s_render(_s_prefix_fill(canon, m, "f"), m)


def s_netmask_m(m: str) -> str:
    keep = f"CAST(floor({m} / 4) AS INT)"
    bchar = (f"(CASE {m} % 4 WHEN 0 THEN '' WHEN 1 THEN '8'"
             f" WHEN 2 THEN 'c' ELSE 'e' END)")
    used = f"({keep} + CASE WHEN {m} % 4 > 0 THEN 1 ELSE 0 END)"
    canon = (f"(repeat('f', {keep}) || {bchar}"
             f" || repeat('0', 32 - {used}))")
    return s_render(canon, m)


def py_canon(addr: str) -> tuple[str, int]:
    """Driver-side canonicalization of a LITERAL 'addr/mask' → (32-hex
    key, masklen) — shared by ip6_contains_c and the SQL-text fragment."""
    naddr, _, nmask = addr.partition("/")
    m = int(nmask) if nmask else 128
    s = naddr.lower()
    if s.startswith("::"):
        s = "0" + s
    if s.endswith("::"):
        s = s + "0"
    if "::" in s:
        left, right = s.split("::")
        lg = left.split(":")
        rg = right.split(":") if right else []
        groups = lg + ["0"] * (8 - len(lg) - len(rg)) + rg
    else:
        groups = s.split(":")
    return "".join(g.zfill(4) for g in groups), m


def s_contains_lit(net_lit: str, canon: str) -> str:
    """`<literal network> >> canon` as a SQL-text prefix comparison, the
    literal side canonicalized at plan-build time."""
    ncanon, m = py_canon(net_lit)
    keep, bits = divmod(m, 4)
    cond = f"(substring({canon}, 1, {keep}) = '{ncanon[:keep]}')"
    if bits:
        step = 1 << (4 - bits)
        want = (int(ncanon[keep], 16) // step) * step
        d = (f"CAST(conv(substring({canon}, {keep} + 1, 1), 16, 10)"
             f" AS INT)")
        cond = (f"({cond} AND CAST(floor({d} / {step}) * {step} AS INT)"
                f" = {want})")
    return cond
