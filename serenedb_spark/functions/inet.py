"""INET (IPv4 CIDR) subset — pure column expressions.

Reference: the duckdb-inet extension surface exercised in
tests/sqllogic/sdb/pg/simple/inet.test: ``netmask`` (SereneDB keeps the
/masklen suffix, diverging from PG), ``host``, ``masklen``, ``network``,
``broadcast``, containment. IPv6 is a documented deviation (no 128-bit
integer arithmetic portable across both engines).

Representation: an inet value is a STRING 'a.b.c.d/m' (mask defaults to
32). All functions are integer arithmetic over the dotted quads —
identical fragments exist for the DuckDB oracle, so every operator here
is gate-checkable without the inet extension being installed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _parts(col: Column) -> tuple[Column, Column]:
    """(ip_without_mask, masklen)."""
    ip = F.split(col, "/")[0]
    m = F.coalesce(F.split(col, "/")[1].try_cast("int"), F.lit(32))
    return ip, m


def _ip_int(ip: Column) -> Column:
    o = F.split(ip, r"\.")
    return (
        o[0].cast("long") * 16777216 + o[1].cast("long") * 65536
        + o[2].cast("long") * 256 + o[3].cast("long")
    )


def _int_ip(v: Column) -> Column:
    return F.concat_ws(
        ".",
        F.floor(v / 16777216).cast("long") % 256,
        F.floor(v / 65536).cast("long") % 256,
        F.floor(v / 256).cast("long") % 256,
        v.cast("long") % 256,
    )


def _mask_int(m: Column) -> Column:
    """Netmask as a long: high m bits set (4294967296 - 2^(32-m))."""
    # variable-width shift: F.shiftleft needs a literal bit count, so the
    # power comes from pow() (exact for powers of two within a double)
    return F.when(m <= 0, F.lit(0)).otherwise(
        F.lit(4294967295)
        - (F.pow(F.lit(2.0), (F.lit(32) - m).cast("double"))
           .cast("long") - 1)
    ).cast("long")


def host(col: Column) -> Column:
    """host(inet): the bare address, no mask suffix."""
    return _parts(col)[0]


def masklen(col: Column) -> Column:
    return _parts(col)[1]


def netmask(col: Column) -> Column:
    """netmask(inet), SereneDB flavor: keeps the /masklen suffix
    (inet.test documents the divergence from PG)."""
    ip, m = _parts(col)
    return F.concat(_int_ip(_mask_int(m)), F.lit("/"), m.cast("string"))


def network(col: Column) -> Column:
    """network(inet): address AND netmask, with the mask suffix."""
    ip, m = _parts(col)
    net = _ip_int(ip).bitwiseAND(_mask_int(m))
    return F.concat(_int_ip(net), F.lit("/"), m.cast("string"))


def broadcast_addr(col: Column) -> Column:
    ip, m = _parts(col)
    b = _ip_int(ip).bitwiseOR(F.lit(4294967295) - _mask_int(m))
    return F.concat(_int_ip(b), F.lit("/"), m.cast("string"))


def inet_contains(net_col: Column, addr_col: Column) -> Column:
    """`network >> address` containment."""
    nip, nm = _parts(net_col)
    aip, _am = _parts(addr_col)
    mask = _mask_int(nm)
    return _ip_int(nip).bitwiseAND(mask) == _ip_int(aip).bitwiseAND(mask)


# ---- DuckDB fragments (same arithmetic, no inet extension needed) ---------

def _d_ip(e: str) -> str:
    return f"string_split({e}, '/')[1]"


def _d_m(e: str) -> str:
    return f"coalesce(TRY_CAST(string_split({e}, '/')[2] AS INT), 32)"


def _d_ip_int(ip: str) -> str:
    o = f"string_split({ip}, '.')"
    return (f"(CAST({o}[1] AS BIGINT) * 16777216"
            f" + CAST({o}[2] AS BIGINT) * 65536"
            f" + CAST({o}[3] AS BIGINT) * 256 + CAST({o}[4] AS BIGINT))")


def _d_int_ip(v: str) -> str:
    return (f"concat_ws('.', CAST(floor({v} / 16777216) AS BIGINT) % 256,"
            f" CAST(floor({v} / 65536) AS BIGINT) % 256,"
            f" CAST(floor({v} / 256) AS BIGINT) % 256,"
            f" CAST({v} AS BIGINT) % 256)")


def _d_mask_int(m: str) -> str:
    return (f"(CASE WHEN {m} <= 0 THEN 0"
            f" ELSE 4294967295 - ((1::BIGINT << (32 - {m})) - 1) END)")


def duckdb_host(e: str) -> str:
    return _d_ip(e)


def duckdb_masklen(e: str) -> str:
    return _d_m(e)


def duckdb_netmask(e: str) -> str:
    m = _d_m(e)
    return f"concat({_d_int_ip(_d_mask_int(m))}, '/', {m})"


def duckdb_network(e: str) -> str:
    m = _d_m(e)
    net = f"({_d_ip_int(_d_ip(e))} & {_d_mask_int(m)})"
    return f"concat({_d_int_ip(net)}, '/', {m})"


def duckdb_broadcast(e: str) -> str:
    m = _d_m(e)
    b = f"({_d_ip_int(_d_ip(e))} | (4294967295 - {_d_mask_int(m)}))"
    return f"concat({_d_int_ip(b)}, '/', {m})"
