"""DuckDB baseline for the headline queries — runs each bench.py query's
ORACLE SQL in DuckDB on the same parquet, so the Spark-vs-single-node
comparison in BENCH_r{N}.json is reproducible:

    python bench_baseline.py            # same env vars as bench.py

Prints one JSON line in the same shape as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import duckdb

    from bench import HEADLINE
    from serenedb_spark import queries as Q

    con = duckdb.connect()
    con.sql(f"SET threads={CPUS}")
    for t in Q.TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        sql = Q.REGISTRY[name].oracle
        if sql is None:
            continue
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            rows = con.sql(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        total += best
        print(f"# {name}: {best:.3f}s ({len(rows)} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "duckdb_baseline_total",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
