"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Methodology mirrors the reference's harnesses (BASELINE.md): the inverted
index is built once up front (the reference's CREATE INDEX precedes its
query timings too) and reported as the separate "index_build" entry, not
folded into per-query latencies.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: headline queries: one per operator family (SURVEY §2 coverage), weighted
#: toward the scans/joins/aggs that dominate at scale.
HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5_region_revenue",
    "tpch_q6",
    "top_customers",
    "window_rank",
    "rollup_agg",
    "events_daily",
    "events_sessionize",
    "events_json_extract",
    "fts_term",
    "fts_phrase",
    "fts_bool",
    "fts_bm25_topk",
    "fts_dict_facets",
    "dedup_exact_keep",
    "dedup_minhash_pairs",
    "text_quality",
    "text_lang_id",
    "vec_knn_cosine",
    "vec_sq8_knn",
    "vec_hybrid_search",
    "geo_radius_search",
    "qualify_topn",
    "dml_merge_into",
    "mm_decode_meta",
    "fts_substring_search",
    # round-5 operator families
    "pg_math_battery",
    "embedding_dup_pairs_lsh",
    "es_multi_match",
    "geo_indexed_radius",
    "events_asof_join",
    "orders_range_join",
    "cookbook_percolate",
    # round-6 operator families
    "fts_stemmed_term_de",
    "geo_polygon_intersects",
    "variant_battery",
    "text_redact_pii",
    "text_chunk",
    "recursive_cte_hierarchy",
    "lateral_topn_per_key",
    # NB: vec_rabitq_* stay OFF the headline list — their parity oracle
    # re-derives the rotation in SQL (64 list_reduce folds per row),
    # ~90 s in DuckDB at sf0.1, which would pad bench_baseline's total
    # in our favor for no information; the sf0.01 gate row covers them
    "bitstring_battery",
    "inet6_battery",
    # round-6 second-half additions
    # NB: dedup_clusters stays OFF the headline list for the same reason
    # as vec_rabitq_*: its oracle re-derives the minhash band relation
    # TWICE inside a recursive CTE (~63 s in DuckDB at sf0.1 vs 1.9 s
    # Spark-side) — padding bench_baseline in our favor for little extra
    # information; the sf0.01 gate row covers its correctness
    "text_gopher_rules",
]


#: the scale-crossover section: queries whose sf0.1 latency is dominated
#: by Spark's fixed per-query overhead get re-measured on a corpus blown
#: up SPARK_GRAFT_SCALE_COPIES× (documents/embeddings; ids offset, one
#: embedding dim perturbed per copy so near-dup structure stays linear),
#: next to DuckDB running the same oracle SQL — the point where the
#: distributed plan's constants amortize.
SCALE_COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
#: the four queries flagged perf-weak at sf0.1 (fixed-overhead bound);
#: the other headline queries already beat the baseline at sf0.1, so
#: re-running their (much slower) oracles at 10× would only pad the
#: bench's wall-clock
SCALE_QUERIES = [
    "fts_bool", "fts_bm25_topk", "es_multi_match",
    "embedding_dup_pairs_lsh",
]
_COPY_OFF = 10_000_000


def _build_scale_dir(spark) -> str:
    """Materialize the blown-up corpus once per (sf, copies); unchanged
    tables are symlinked, documents/embeddings rewritten with offset ids."""
    from pyspark.sql import functions as F

    from serenedb_spark import queries as Q

    sf_tag = SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    out = f"/tmp/serene_scale_{sf_tag}_x{SCALE_COPIES}"
    marker = os.path.join(out, "_READY")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    copies = F.explode(F.array(*[F.lit(i) for i in range(SCALE_COPIES)]))
    for t in Q.TABLES:
        src = f"{SF_DIR}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(src) or os.path.exists(dst):
            continue
        if t == "documents":
            df = (spark.read.parquet(src)
                  .withColumn("__c", copies)
                  .withColumn("doc_id",
                              F.col("doc_id") + F.col("__c") * _COPY_OFF)
                  .drop("__c"))
            df.write.mode("overwrite").parquet(dst)
        elif t == "embeddings":
            # rotate each copy's vector by the copy index: norm-preserving
            # and decorrelating (copies of one vector land near-orthogonal),
            # so the near-dup structure scales LINEARLY with the corpus —
            # an additive perturbation would either collapse every copy
            # toward one axis (quadratic pair blow-up) or leave exact dups
            df = (spark.read.parquet(src)
                  .withColumn("__c", copies)
                  .withColumn("vec_id",
                              F.col("vec_id") + F.col("__c") * _COPY_OFF)
                  .withColumn("embedding", F.concat(
                      F.slice("embedding", F.col("__c") + 1,
                              F.size("embedding") - F.col("__c")),
                      F.slice("embedding", F.lit(1), F.col("__c"))))
                  .drop("__c"))
            df.write.mode("overwrite").parquet(dst)
        else:
            os.symlink(src, dst)
    open(marker, "w").write("ok")
    return out


def _scale_section(spark) -> dict:
    """Spark vs DuckDB on the blown-up corpus; 1 warm-up + best of 2."""
    import duckdb

    from serenedb_spark import queries as Q

    sdir = _build_scale_dir(spark)
    out: dict = {"copies": SCALE_COPIES, "spark": {}, "duckdb": {}}

    # the sf0.1 sections persisted three indexes this JVM no longer
    # needs; dropping them keeps their memory pressure (GC, eviction)
    # out of the scale timings — profiled: es_multi_match reads 5.3s
    # inside the loaded JVM vs 1.6s steady-state in a clean one
    spark.catalog.clearCache()
    spark._jvm.System.gc()

    t0 = time.perf_counter()
    idx = Q.doc_index(spark, sdir)
    idx.postings.count(); idx.term_stats.count(); idx.doc_stats.count()
    out["spark"]["index_build"] = round(time.perf_counter() - t0, 4)

    for name in SCALE_QUERIES:
        fn = Q.REGISTRY[name].fn
        fn(spark, sdir).collect()
        spark._jvm.System.gc()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sdir).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out["spark"][name] = round(best, 4)
        print(f"# scale{SCALE_COPIES}x spark {name}: {best:.3f}s",
              file=sys.stderr)

    con = duckdb.connect()
    con.sql(f"SET threads={CPUS}")
    for t in Q.TABLES:
        p = f"{sdir}/{t}.parquet"
        if os.path.isdir(p):      # spark writes a part-file directory
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for name in SCALE_QUERIES:
        sql = Q.REGISTRY[name].oracle
        con.sql(sql).fetchall()
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            con.sql(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out["duckdb"][name] = round(best, 4)
        print(f"# scale{SCALE_COPIES}x duckdb {name}: {best:.3f}s",
              file=sys.stderr)
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    from serenedb_spark import queries as Q

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("serenedb-spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM (codegen/JIT) + parquet footers once, outside per-query
    # timings — the Spark analogue of connection/catalog setup
    tabs = Q.load_tables(spark, SF_DIR)
    tabs["lineitem"].groupBy("l_returnflag").count().collect()
    tabs["events"].groupBy("event_type").count().collect()

    timings: dict[str, float] = {}

    # tiny warm-up build (64 docs): compiles the identical codegen stages so
    # index_build measures the build, not one-time JVM JIT. Profiled r5: the
    # cold first build pays ~3× steady-state purely on codegen/JIT.
    from serenedb_spark.operators.indexing import build_index as _bi
    _w = _bi(tabs["documents"].limit(64), {"text": "simple"}, key="doc_id")
    _w.postings.count(); _w.term_stats.count(); _w.doc_stats.count()

    t0 = time.perf_counter()
    idx = Q.doc_index(spark, SF_DIR)
    idx.postings.count()  # materialize the persisted postings
    idx.term_stats.count()
    idx.doc_stats.count()
    timings["index_build"] = round(time.perf_counter() - t0, 4)

    # the substring query runs over the sparse-ngram index — build it up
    # front too (CREATE INDEX precedes query timings, same methodology)
    t0 = time.perf_counter()
    sidx = Q.doc_index(spark, SF_DIR, analyzer="sparse_ngram3")
    sidx.postings.count()
    timings["index_build_sparse"] = round(time.perf_counter() - t0, 4)

    # settle after the garbage-heavy index builds so the first headline
    # query doesn't absorb their GC pause
    tabs["lineitem"].groupBy("l_linestatus").count().collect()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    total = 0.0
    spread: dict[str, float] = {}
    for name in HEADLINE:
        fn = Q.REGISTRY[name].fn
        # one untimed warm-up: whole-stage-codegen compile + JVM JIT +
        # Python-worker spin-up (mapInPandas) land here, not in the spread.
        # Profiled r5: the first minhash run pays ~60× its steady-state
        # latency purely on JIT of the generated code.
        fn(spark, SF_DIR).collect()
        # drain accumulated garbage from the warm-up + prior queries so a
        # stop-the-world pause doesn't land inside a timed run — profiled
        # r5: embedding_dup_pairs_lsh is 1.9 s ± 0.2 in isolation but
        # showed a 12 s one-off worst inside the shared bench JVM (GC, not
        # plan variance)
        spark._jvm.System.gc()
        best, worst, nrows = None, 0.0, 0
        for _ in range(runs):
            t0 = time.perf_counter()
            rows = fn(spark, SF_DIR).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            worst = max(worst, dt)
            nrows = len(rows)
        timings[name] = round(best, 4)
        spread[name] = round(worst - best, 4)
        total += best
        print(f"# {name}: {best:.3f}s (+{worst - best:.3f}s spread,"
              f" {nrows} rows)", file=sys.stderr)

    scale = _scale_section(spark) if SCALE_COPIES > 0 else None

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    payload = {
        "metric": "headline_queries_total",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "runs": runs,
        "sf": sf_val,
    }
    if scale is not None:
        payload["scale"] = scale
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
