"""IPv6 INET (functions/inet6.py) vs Python's ipaddress module — the
authoritative reference for mask arithmetic — and Spark↔DuckDB fragment
equality, fuzzed across prefix lengths and '::' compression positions."""

from __future__ import annotations

import ipaddress
import random

import duckdb
from pyspark.sql import functions as F

from serenedb_spark.functions import inet6 as I6

CASES = [
    "2001:db8::1/48", "::1", "fe80::/10",
    "2001:db8:85a3::8a2e:370:7334/64", "::/0",
    "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff/128",
    "1:2:3:4:5:6:7:8/77", "abcd::", "::abcd/13",
]


def _full(a: str) -> str:
    return ":".join(g.lstrip("0") or "0"
                    for g in ipaddress.IPv6Address(a).exploded.split(":"))


def _fuzz_cases(n: int) -> list[str]:
    rng = random.Random(99)
    out = []
    for _ in range(n):
        groups = [f"{rng.randrange(65536):x}" for _ in range(8)]
        if rng.random() < 0.5:
            i = rng.randrange(1, 7)
            j = rng.randrange(i + 1, 8)
            addr = ":".join(groups[:i]) + "::" + ":".join(groups[j:])
            # '::' replaces groups i..j-1 with zeros
            groups[i:j] = ["0"] * (j - i)
        else:
            addr = ":".join(groups)
        out.append(addr + f"/{rng.randrange(129)}")
    return out


def test_against_ipaddress_and_duckdb(spark):
    cases = CASES + _fuzz_cases(60)
    df = spark.createDataFrame([(c,) for c in cases], "ip string")
    sp = df.select(
        "ip",
        I6.ip6_host(F.col("ip")).alias("host"),
        I6.ip6_masklen(F.col("ip")).alias("mlen"),
        I6.ip6_network(F.col("ip")).alias("net"),
        I6.ip6_broadcast(F.col("ip")).alias("bcast"),
        I6.ip6_netmask(F.col("ip")).alias("mask"),
    ).collect()
    con = duckdb.connect()
    for r in sp:
        iface = ipaddress.IPv6Interface(
            r.ip if "/" in r.ip else r.ip + "/128")
        p = iface.network.prefixlen
        assert r.host == _full(str(iface.ip)), r.ip
        assert r.mlen == p
        assert r.net == _full(str(iface.network.network_address)) + f"/{p}"
        assert r.bcast == \
            _full(str(iface.network.broadcast_address)) + f"/{p}"
        assert r.mask == _full(str(iface.network.netmask)) + f"/{p}"
        lit = "'" + r.ip + "'"
        got = con.sql(
            "SELECT " + ", ".join([
                I6.d_host(lit), I6.d_masklen(lit), I6.d_network(lit),
                I6.d_broadcast(lit), I6.d_netmask(lit)])).fetchone()
        assert got == (r.host, r.mlen, r.net, r.bcast, r.mask), r.ip


def test_containment(spark):
    con = duckdb.connect()
    nets = ["2001:db8::/32", "fe80::/10", "::/0", "2001:db8:85a3::/48",
            "1234:5678::/77"]
    addrs = ["2001:db8::5", "2001:db9::5", "fe80::1", "fec0::1",
             "2001:db8:85a3:0:1::", "1234:5678::7ff", "1234:5678::800"]
    rows = [(n, a) for n in nets for a in addrs]
    df = spark.createDataFrame(rows, "n string, a string")
    sp = {(r.n, r.a): r.c for r in df.select(
        "n", "a",
        I6.ip6_contains(F.col("n"), F.col("a")).alias("c")).collect()}
    for n, a in rows:
        want = ipaddress.IPv6Address(a) in ipaddress.IPv6Network(n)
        assert sp[(n, a)] == want, (n, a)
        got = con.sql("SELECT " + I6.d_contains(
            "'" + n + "'", "'" + a + "'")).fetchone()[0]
        assert got == want, (n, a)
