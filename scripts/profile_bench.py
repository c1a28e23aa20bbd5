"""Per-query profiling harness for the optimization rounds.

For each named headline query, splits wall-clock into:
  build  — Python-side DataFrame graph construction (fn call)
  plan   — JVM analysis/optimization (queryExecution.executedPlan force)
  exec   — action (collect), steady-state best of N
and writes the formatted plan to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python scripts/profile_bench.py [query ...] [--plans-dir plans/r13]
        [--suffix before] [--runs 3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_dir = None
    suffix = "before"
    runs = 3
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--plans-dir":
            plans_dir = args[i + 1]; i += 2
        elif args[i] == "--suffix":
            suffix = args[i + 1]; i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1

    from pyspark.sql import SparkSession

    from serenedb_spark import queries as Q

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("serenedb-spark-profile")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tabs = Q.load_tables(spark, SF_DIR)
    tabs["lineitem"].groupBy("l_returnflag").count().collect()
    tabs["events"].groupBy("event_type").count().collect()

    needs_idx = any(n.startswith(("fts", "es", "vec_hybrid", "cookbook"))
                    or n in ("index_build",) for n in names)
    if needs_idx:
        from serenedb_spark.operators.indexing import build_index as _bi
        _w = _bi(tabs["documents"].limit(64), {"text": "simple"}, key="doc_id")
        _w.postings.count(); _w.term_stats.count(); _w.doc_stats.count()
        t0 = time.perf_counter()
        idx = Q.doc_index(spark, SF_DIR)
        idx.postings.count(); idx.term_stats.count(); idx.doc_stats.count()
        print(f"index_build: {time.perf_counter()-t0:.3f}s")
        if any("substring" in n for n in names):
            sidx = Q.doc_index(spark, SF_DIR, analyzer="sparse_ngram3")
            sidx.postings.count()

    for name in names:
        if name == "index_build":
            continue
        fn = Q.REGISTRY[name].fn
        # warm-up run (codegen/JIT + cache fill)
        fn(spark, SF_DIR).collect()
        spark._jvm.System.gc()

        tb = time.perf_counter()
        df = fn(spark, SF_DIR)
        t_build = time.perf_counter() - tb

        tp = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t_plan = time.perf_counter() - tp

        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            rows = fn(spark, SF_DIR).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: build={t_build:.3f}s plan={t_plan:.3f}s "
              f"exec(best of {runs})={best:.3f}s rows={len(rows)}")

        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            plan_txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"),
                      "w") as fh:
                fh.write(plan_txt)


if __name__ == "__main__":
    main()
