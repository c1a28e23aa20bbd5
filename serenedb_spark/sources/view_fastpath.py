"""View fast-path: index parquet/csv/json files that have NO primary key by
synthesizing one from file identity + row position — "zero-ETL" indexing.

Reference: recognized `SELECT * FROM read_parquet(...)` views get a
synthesized `(file_index, file_row_number)` PK so an inverted index can be
built over remote files without rewriting them
(server/connector/view_fast_path.h:59-110, examples/demo0/demo.sql:36-43).

Spark-first: the `_metadata` hidden struct gives `file_path` and
`row_index` AT SCAN TIME — no window function, no shuffle, stable across
re-reads of the same files (row groups read in file order). The composite
is packed into one BIGINT key (file_index << 40 | row_index) so postings/
docstore keep a simple scalar doc_id; 2^40 rows/file and 2^23 files per
view is comfortably beyond a single index's reach."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: bits reserved for the in-file row number
_ROW_BITS = 40


def file_pk_view(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    key_col: str = "doc_id",
    **options,
) -> DataFrame:
    """Read files with a synthesized stable scalar PK column `key_col`.

    file_index is the dense rank of the file path — computed driver-side
    from the file listing (tiny), broadcast into the scan via a join on
    `_metadata.file_path`."""
    reader = spark.read.options(**options).format(fmt)
    df = reader.load(path)
    base = df.select("*", F.col("_metadata.file_path").alias("__fp"),
                     F.col("_metadata.row_index").alias("__ri"))
    files = sorted(
        r[0] for r in base.select("__fp").distinct().collect()
    )
    mapping = spark.createDataFrame(
        [(f, i) for i, f in enumerate(files)], "__fp string, __fi long"
    )
    out = (
        base.join(F.broadcast(mapping), "__fp")
        .withColumn(
            key_col,
            (F.col("__fi") * F.lit(1 << _ROW_BITS) + F.col("__ri")).cast("long"),
        )
        .drop("__fp", "__ri", "__fi")
    )
    return out


def decode_file_pk(key_col: str = "doc_id"):
    """(file_index, row_number) back out of the packed key — the reverse
    mapping used when materializing matches back to source files."""
    k = F.col(key_col)
    # pure integer ops: float division would round-trip through DOUBLE and
    # lose exactness for keys >= 2^53 (file_index >= 2^13)
    return (
        F.shiftrightunsigned(k, _ROW_BITS).alias("file_index"),
        k.bitwiseAND(F.lit((1 << _ROW_BITS) - 1)).alias("file_row_number"),
    )
