"""Regenerate QUERIES.md from the query registry: python scripts/gen_queries_md.py"""
from serenedb_spark import queries as Q

FAMILIES = [
    ("TPC-H-shaped relational", lambda n: n.startswith("tpch_")),
    ("Joins / subqueries / set ops", lambda n: n in (
        "exists_semi_join", "anti_join", "full_outer_join", "correlated_subquery",
        "setop_intersect", "setop_except", "scalar_subquery_cte", "top_customers",
        "orders_range_join", "recursive_cte_series",
        "recursive_cte_hierarchy", "lateral_topn_per_key")),
    ("Windows / grouping / QUALIFY / PIVOT", lambda n: n in (
        "window_rank", "window_running_sum", "window_battery",
        "ordered_set_aggs", "rollup_agg", "grouping_sets",
        "cube_agg", "qualify_topn", "pivot_statement", "unpivot_part_measures",
        "lateral_explode_tokens", "deterministic_sample", "case_agg_join",
        "string_funcs", "scalar_battery", "pg_string_battery",
        "pg_string_battery2", "pg_math_battery", "temporal_battery",
        "inet_html_battery", "complex_types_battery",
        "inet6_battery", "variant_battery", "union_battery",
        "float_special_battery", "interval_battery", "timezone_battery",
        "bitstring_battery", "time_battery", "blob_battery",
        "trycast_battery", "enum_battery")),
    ("Events (time series / JSON / sessionization)",
     lambda n: n.startswith("events_") or n.startswith("approx_")),
    ("DML", lambda n: n.startswith("dml_")),
    ("Full-text search predicates", lambda n: n.startswith("fts_") and not any(
        k in n for k in ("bm25", "tfidf", "lm_", "dfi", "indri", "raw_",
                          "dict", "offsets", "highlight", "substring", "synonyms",
                          "collation", "classification", "nn_", "minhash"))),
    ("Relevance scoring", lambda n: any(k in n for k in (
        "bm25", "tfidf", "lm_", "dfi", "indri", "raw_"))),
    ("Facets / offsets / highlight / analyzers", lambda n: any(
        k in n for k in ("dict", "offsets", "highlight", "substring",
                         "synonyms", "collation", "classification", "nn_",
                         "minhash"))),
    ("ES DSL", lambda n: n.startswith("es_")),
    ("Dedup / text analysis / pipeline", lambda n: n.startswith(("dedup_", "text_", "pipeline_"))),
    ("Vector / hybrid", lambda n: n.startswith(("vec_", "embedding_"))),
    ("Multimodal", lambda n: n.startswith("mm_")),
    ("Geo", lambda n: n.startswith("geo_")),
    ("Physical-rewrite equivalence (skew, ordered scan)",
     lambda n: n.startswith(("skew_", "ordered_"))),
    ("Cookbook recipes (site_docs/cookbook/search parity)",
     lambda n: n.startswith("cookbook_")),
    ("Dynamic SQL + catalog introspection",
     lambda n: n.startswith("query_table_") or n == "pg_catalog_introspection"),
    ("Statement-level SQL door (DML / txn / search DML as SQL text)",
     lambda n: n.startswith("sql_")),
]


def main() -> None:
    names = sorted(Q.REGISTRY)
    n_oracle = sum(1 for n in names if Q.REGISTRY[n].oracle is not None)
    no_oracle = [n for n in names if Q.REGISTRY[n].oracle is None]
    extra = (f"; {len(no_oracle)} rows-only (no SQL-expressible oracle): "
             + ", ".join(f"`{n}`" for n in no_oracle)) if no_oracle else ""
    out = ["# QUERIES — the correctness-gate inventory\n",
           f"\n{n_oracle} oracle-gated queries (auto-generated from"
           " `serenedb_spark.queries.REGISTRY`; every entry has both a"
           " `queries()` callable and an `oracle_sql()` DuckDB string —"
           " regenerate with `python scripts/gen_queries_md.py`"
           f"{extra}).\n"]
    seen = set()
    for title, pred in FAMILIES:
        group = [n for n in names if n not in seen and pred(n)]
        if not group:
            continue
        seen.update(group)
        out.append(f"\n## {title} ({len(group)})\n\n")
        out.append(", ".join(f"`{n}`" for n in group) + "\n")
    rest = [n for n in names if n not in seen]
    if rest:
        out.append(f"\n## Other ({len(rest)})\n\n"
                   + ", ".join(f"`{n}`" for n in rest) + "\n")
    open("QUERIES.md", "w").write("".join(out))
    print(f"{len(names)} queries documented; ungrouped: {rest}")


if __name__ == "__main__":
    main()
