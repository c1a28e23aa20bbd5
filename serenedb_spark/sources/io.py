"""Source/sink surface — the reference's file readers + COPY family.

Reference: Parquet/CSV/JSON/Avro/Iceberg readers via DuckDB extensions
(.gitmodules duckdb_httpfs/avro/iceberg/azure; tests copy_parquet/
copy_csv_nested/copy_json), COPY TO/FROM (duckdb_pg_text_copy.cpp), CTAS
(duckdb_physical_ctas.cpp:301).

Spark mapping is direct: `spark.read.<fmt>` / `df.write.<fmt>` — this
module just fixes the engine's conventions (schema-preserving JSON via
explicit schema, deterministic single-file output for COPY TO parity,
format registry with availability gating for formats whose jars may be
absent, e.g. Avro).

Jar gating (exact coordinates for this distribution — Spark 4.1.2 /
Scala 2.13; this container has no network or local copies, so the gate
stays closed here):
  * Avro:    org.apache.spark:spark-avro_2.13:4.1.2
             (`--packages` or drop into $SPARK_HOME/jars; the bundled
             avro-1.12.1 core jars are Spark internals, NOT the source)
  * Iceberg: org.apache.iceberg:iceberg-spark-runtime-4.0_2.13 (latest
             release for the Spark 4 line) plus
             spark.sql.extensions=org.apache.iceberg.spark.extensions
             .IcebergSparkSessionExtensions and a catalog conf
             (spark.sql.catalog.<name>=org.apache.iceberg.spark
             .SparkCatalog).
With either jar present, format_available() opens the gate and
read_table/write_table work unchanged — no code path is stubbed."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: formats always present in a stock PySpark distribution
CORE_FORMATS = ("parquet", "csv", "json", "orc")


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet",
    schema: str | None = None, **options,
) -> DataFrame:
    """COPY FROM analogue. CSV defaults: header, type inference unless an
    explicit schema is given (the reference's read_csv auto-detect)."""
    reader = spark.read
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame, path: str, fmt: str = "parquet",
    mode: str = "overwrite", single_file: bool = False, **options,
) -> None:
    """COPY TO analogue; ``single_file`` coalesces to one output file
    (wire-COPY parity — only for small exports, never at scale)."""
    if fmt == "csv":
        options.setdefault("header", "true")
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).options(**options).format(fmt).save(path)


def ctas(
    spark: SparkSession, name: str, query_or_df, path: str | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """CREATE TABLE AS — materialize a query and register it. With `path`,
    it's an external table (write then re-read: atomic via Spark's job
    commit protocol, the reference's tombstone/rollback analogue
    duckdb_physical_ctas.cpp); without, an in-session temp view."""
    df = (
        spark.sql(query_or_df) if isinstance(query_or_df, str) else query_or_df
    )
    if path is not None:
        write_table(df, path, fmt)
        df = read_table(spark, path, fmt)
    df.createOrReplaceTempView(name)
    return df


def format_available(spark: SparkSession, fmt: str) -> bool:
    """True when the DataSource can be instantiated (Avro/Iceberg need
    extra jars; gate features instead of failing at plan time)."""
    if fmt in CORE_FORMATS:
        return True
    try:
        spark.read.format(fmt).load("/nonexistent-probe-path")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        return "Failed to find" not in msg and "ClassNotFound" not in msg
