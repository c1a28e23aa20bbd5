"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE final JSON line (size-guarded to stay well under the driver's
2,000-byte stdout tail — BENCH_r06 was lost to an oversized line):
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "runs": N, "sf": <sf>, "scale": {...}}

Everything else (per-query spread, scale-crossover detail) goes to
stderr `# ` lines and to the committed sidecar ``BENCH_DETAIL.json``.

Methodology mirrors the reference's harnesses (BASELINE.md): the inverted
index is built once up front (the reference's CREATE INDEX precedes its
query timings too) and reported as the separate "index_build" entry, not
folded into per-query latencies.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DETAIL_PATH = os.environ.get(
    "SPARK_GRAFT_BENCH_DETAIL",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "BENCH_DETAIL.json"))

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
    # round-9: multi-relation search SQL (claimed view ⋈ dimension)
    "fts_sql_join",
]


#: the scale-crossover section: queries whose sf0.1 latency is dominated
#: by Spark's fixed per-query overhead get re-measured on a corpus blown
#: up SPARK_GRAFT_SCALE_COPIES× (documents/embeddings rewritten with
#: offset ids — each copy's embedding is ROTATED by the copy index, which
#: is norm-preserving and decorrelating so near-dup structure stays
#: linear; events rewritten with offset event/user ids for the asof row),
#: next to DuckDB running the same oracle SQL — the point where the
#: distributed plan's constants amortize.
SCALE_COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
#: events_asof_AGG, not _join: at 10×/100× the row-returning variant
#: spends its wall-clock serializing the 2M-row result through the
#: driver (35s of a 36s run at 100×) — the aggregate shape measures the
#: join itself, identically on both engines.
SCALE_QUERIES = [
    "fts_bool", "fts_bm25_topk", "es_multi_match",
    "embedding_dup_pairs_lsh", "events_asof_agg",
    # single-shuffle asof (tie-break dedup) vs the two-shuffle original
    "events_asof_agg_preagg",
    # the two remaining >2×-at-sf0.1 watch queries (r8 verdict): measure
    # their 10× crossover instead of arguing it — customer/orders/lineitem
    # are rewritten with offset keys for these
    "top_customers", "inet6_battery",
]
#: the 100× section: the index-served queries whose 10× row already
#: crossed DuckDB — SCALE.md claimed "at 100× every row is a Spark win";
#: this measures it instead of claiming it — plus events_asof_join, the
#: one remaining >2×-at-10× row (10M events here), so its crossover
#: point is measured rather than argued.
SCALE2_COPIES = int(os.environ.get("SPARK_GRAFT_SCALE2_COPIES", "100"))
SCALE2_QUERIES = ["fts_bool", "fts_bm25_topk", "events_asof_agg",
                  "events_asof_agg_preagg"]
_COPY_OFF = 10_000_000


def _build_scale_dir(spark, copies: int,
                     tables: tuple[str, ...] = ("documents", "embeddings",
                                                "events", "customer",
                                                "orders", "lineitem")) -> str:
    """Materialize the blown-up corpus once per (sf, copies); unchanged
    tables are symlinked, `tables` rewritten with offset ids. Built into
    a temp dir + atomic rename so a crash mid-write can never bless a
    partial corpus (a bare _READY check could)."""
    from pyspark.sql import functions as F

    from serenedb_spark import queries as Q

    sf_tag = SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    # v3: customer/orders/lineitem rewritable too (top_customers +
    # inet6_battery crossover rows). The dir name encodes WHICH tables
    # are rewritten — different scale sections pass different sets, and
    # a _READY marker from one set must never satisfy another
    ttag = "".join(sorted(t[0] for t in tables))
    out = f"/tmp/serene_scale_{sf_tag}_x{copies}_v3{ttag}"
    marker = os.path.join(out, "_READY")
    if os.path.exists(marker):
        return out
    # no marker → whatever is there is stale/partial; rebuild from scratch
    tmp = out + ".building"
    for d in (out, tmp):
        if os.path.exists(d):
            shutil.rmtree(d)
    os.makedirs(tmp)
    copy_col = F.explode(F.array(*[F.lit(i) for i in range(copies)]))
    for t in Q.TABLES:
        src = f"{SF_DIR}/{t}.parquet"
        dst = f"{tmp}/{t}.parquet"
        if not os.path.exists(src):
            continue
        if t in tables:
            df = spark.read.parquet(src).withColumn("__c", copy_col)
            if t == "documents":
                df = df.withColumn(
                    "doc_id", F.col("doc_id") + F.col("__c") * _COPY_OFF)
            elif t == "embeddings":
                # rotate each copy's vector by the copy index:
                # norm-preserving and decorrelating (copies of one vector
                # land near-orthogonal), so the near-dup structure scales
                # LINEARLY with the corpus — an additive perturbation
                # would either collapse every copy toward one axis
                # (quadratic pair blow-up) or leave exact dups
                # rotation offset is __c mod dim — copies beyond the
                # vector dimension wrap instead of slicing past the end
                rot = F.pmod(F.col("__c"), F.size("embedding"))
                df = (df.withColumn(
                          "vec_id",
                          F.col("vec_id") + F.col("__c") * _COPY_OFF)
                      .withColumn("embedding", F.when(rot == 0, F.col(
                          "embedding")).otherwise(F.concat(
                          F.slice("embedding", rot + 1,
                                  F.size("embedding") - rot),
                          F.slice("embedding", F.lit(1), rot)))))
            elif t == "events":
                # offset event AND user ids: each copy is a fresh user
                # population, so per-user asof chains scale linearly
                df = (df.withColumn(
                          "event_id",
                          F.col("event_id") + F.col("__c") * _COPY_OFF)
                      .withColumn(
                          "user_id",
                          F.col("user_id") + F.col("__c") * _COPY_OFF))
            elif t == "customer":
                df = df.withColumn(
                    "c_custkey", F.col("c_custkey") + F.col("__c") * _COPY_OFF)
            elif t == "orders":
                # each copy is a fresh customer+order population — the
                # customer⨝orders⨝lineitem join tree scales linearly
                df = (df.withColumn(
                          "o_orderkey",
                          F.col("o_orderkey") + F.col("__c") * _COPY_OFF)
                      .withColumn(
                          "o_custkey",
                          F.col("o_custkey") + F.col("__c") * _COPY_OFF))
            elif t == "lineitem":
                df = df.withColumn(
                    "l_orderkey",
                    F.col("l_orderkey") + F.col("__c") * _COPY_OFF)
            df.drop("__c").write.mode("overwrite").parquet(dst)
        else:
            os.symlink(src, dst)
    open(os.path.join(tmp, "_READY"), "w").write("ok")
    os.rename(tmp, out)
    return out


def _time_spark(spark, fn, sdir: str) -> float:
    """1 warm-up + best of 2 (GC drained between)."""
    fn(spark, sdir).collect()
    spark._jvm.System.gc()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sdir).collect()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _time_duckdb(con, sql: str) -> float:
    con.sql(sql).fetchall()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _duckdb_con(sdir: str):
    import duckdb

    from serenedb_spark import queries as Q

    con = duckdb.connect()
    con.sql(f"SET threads={CPUS}")
    for t in Q.TABLES:
        p = f"{sdir}/{t}.parquet"
        if os.path.isdir(p):      # spark writes a part-file directory
            p = f"{p}/*.parquet"
        elif not os.path.exists(p):
            continue
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _scale_run(spark, copies: int, names: list[str],
               with_index: bool,
               tables: tuple[str, ...] | None = None) -> dict:
    """Spark vs DuckDB on the blown-up corpus; 1 warm-up + best of 2."""
    from serenedb_spark import queries as Q

    sdir = (_build_scale_dir(spark, copies, tables) if tables is not None
            else _build_scale_dir(spark, copies))
    out: dict = {"copies": copies, "spark": {}, "duckdb": {}}

    # the sf0.1 sections persisted indexes this JVM no longer needs;
    # dropping them keeps their memory pressure (GC, eviction) out of
    # the scale timings — profiled: es_multi_match reads 5.3s inside the
    # loaded JVM vs 1.6s steady-state in a clean one
    spark.catalog.clearCache()
    spark._jvm.System.gc()

    if with_index:
        t0 = time.perf_counter()
        idx = Q.doc_index(spark, sdir)
        idx.postings.count(); idx.term_stats.count(); idx.doc_stats.count()
        out["spark"]["index_build"] = round(time.perf_counter() - t0, 3)

    for name in names:
        best = _time_spark(spark, Q.REGISTRY[name].fn, sdir)
        out["spark"][name] = round(best, 3)
        print(f"# scale{copies}x spark {name}: {best:.3f}s",
              file=sys.stderr)

    con = _duckdb_con(sdir)
    for name in names:
        best = _time_duckdb(con, Q.REGISTRY[name].oracle)
        out["duckdb"][name] = round(best, 3)
        print(f"# scale{copies}x duckdb {name}: {best:.3f}s",
              file=sys.stderr)
    con.close()
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
    timings["index_build"] = round(time.perf_counter() - t0, 3)

    # the substring query runs over the sparse-ngram index — build it up
    # front too (CREATE INDEX precedes query timings, same methodology)
    t0 = time.perf_counter()
    sidx = Q.doc_index(spark, SF_DIR, analyzer="sparse_ngram3")
    sidx.postings.count()
    timings["index_build_sparse"] = round(time.perf_counter() - t0, 3)

    # NEW in r14 (additions-only): the embedding LSH signature layout —
    # previously built inside embedding_dup_pairs_lsh's untimed warm-up
    # run, now surfaced as its own CREATE-INDEX-style entry so the
    # "index half" of the pair query is visible in the bench (r13
    # verdict item 7). Not part of the headline total, like index_build.
    t0 = time.perf_counter()
    Q.lsh_layout(spark, SF_DIR)
    timings["lsh_build"] = round(time.perf_counter() - t0, 3)

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
        timings[name] = round(best, 3)
        spread[name] = round(worst - best, 3)
        total += best
        print(f"# {name}: {best:.3f}s (+{worst - best:.3f}s spread,"
              f" {nrows} rows)", file=sys.stderr)

    scale = (_scale_run(spark, SCALE_COPIES, SCALE_QUERIES, with_index=True)
             if SCALE_COPIES > 0 else None)
    # 100× touches only documents/events queries — skip the (large,
    # unused) customer/orders/lineitem rewrite there
    scale2 = (_scale_run(spark, SCALE2_COPIES, SCALE2_QUERIES,
                         with_index=True,
                         tables=("documents", "embeddings", "events"))
              if SCALE2_COPIES > 0 else None)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    payload = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "sf": sf_val,
    }
    if scale is not None:
        payload["scale"] = scale
    if scale2 is not None:
        payload["scale100"] = scale2

    # full detail (incl. per-query spread) goes to the committed sidecar;
    # the driver's stdout record keeps only a 2,000-byte tail, which an
    # oversized line overflows (BENCH_r06 lost its round to exactly that)
    detail = dict(payload)
    detail["spread"] = spread
    try:
        with open(DETAIL_PATH, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError as e:
        print(f"# sidecar write failed: {e}", file=sys.stderr)

    line = json.dumps(payload, separators=(",", ":"))
    # size guard: the final line must survive the driver's 2,000-byte
    # stdout tail with headroom; shed the scale sections first (they
    # live in the sidecar + stderr lines regardless)
    for drop in ("scale100", "scale"):
        if len(line) <= 1800:
            break
        if drop in payload:
            print(f"# {drop}: "
                  + json.dumps(payload.pop(drop), separators=(",", ":")),
                  file=sys.stderr)
            line = json.dumps(payload, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
