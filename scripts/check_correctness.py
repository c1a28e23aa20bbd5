"""Local replica of the driver's correctness gate over the FULL registry.

The driver samples the first 50 registered queries; this script runs every
registered (spark, oracle) pair at a given sf_dir and reports rows/schema/
value agreement, so registry reordering decisions are made on evidence,
not hope.

Usage:
    python scripts/check_correctness.py [sf_dir] [name_prefix ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serenedb_spark.queries import REGISTRY, TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            out[c] = s.round(6).map(lambda v: "null" if pd.isna(v) else f"{v:.6f}")
        elif pd.api.types.is_datetime64_any_dtype(s):
            # DuckDB DATE → datetime64; Spark DATE → object(date). Render
            # midnight-only datetime columns as bare dates so both agree.
            if (s.dropna().dt.normalize() == s.dropna()).all():
                out[c] = s.map(lambda v: "null" if pd.isna(v) else str(v.date()))
            else:
                out[c] = s.map(lambda v: "null" if pd.isna(v) else str(v))
        else:
            out[c] = s.map(lambda v: "null" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    df = pd.DataFrame(out)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .appName("check-correctness")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    results: dict[str, dict] = {}
    names = [n for n in REGISTRY if not prefixes or n.startswith(prefixes)]
    for i, name in enumerate(names):
        d = REGISTRY[name]
        t0 = time.time()
        row: dict = {}
        try:
            sp = normalize(d.fn(spark, sf_dir).toPandas())
            if d.oracle is None:
                row = {"rows": len(sp), "oracle": "none", "ok": len(sp) >= 0}
            else:
                du = normalize(con.sql(d.oracle).df())
                cols_ok = list(sp.columns) == list(du.columns)
                rows_ok = len(sp) == len(du)
                vals_ok = cols_ok and rows_ok and sp.equals(du)
                row = {"rows": len(sp), "oracle_rows": len(du),
                       "schema": cols_ok, "rows_match": rows_ok,
                       "values": vals_ok, "ok": vals_ok}
                if not vals_ok and cols_ok and rows_ok:
                    diff = (sp != du).any(axis=0)
                    row["bad_cols"] = [c for c in sp.columns if diff[c]]
                elif not cols_ok:
                    row["spark_cols"] = list(sp.columns)
                    row["duck_cols"] = list(du.columns)
        except Exception as e:  # noqa: BLE001
            row = {"ok": False, "err": f"{type(e).__name__}: {e}"[:300]}
            if os.environ.get("CHECK_VERBOSE"):
                traceback.print_exc()
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        flag = "OK " if row.get("ok") else "FAIL"
        print(f"[{i + 1}/{len(names)}] {flag} {name} ({row['sec']}s)"
              + ("" if row.get("ok") else f" {row}"), flush=True)

    n_ok = sum(1 for r in results.values() if r.get("ok"))
    print(f"\n{n_ok}/{len(results)} ok")
    with open("/tmp/check_correctness.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    spark.stop()


if __name__ == "__main__":
    main()
