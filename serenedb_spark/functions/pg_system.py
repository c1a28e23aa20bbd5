"""PG system/introspection surface — the library-engine subset.

Reference: server/connector/functions/system.cpp (2,109 LoC) registers
version, current_setting/set_config, pg_typeof, format_type, privilege
checks, size functions, backend control. A library engine has no
backends or wire sessions; what IS meaningful here:

  * ``version()``          — engine identification string
  * ``pg_typeof``          — Spark's typeof() with PG type-name spelling
  * ``format_type``        — Spark DDL type → PG type name
  * ``current_setting`` /
    ``set_config``         — Spark session conf get/set
  * ``pg_table_size``      — bytes of the table's source files
  * privilege checks       — ``has_table_privilege`` over the session's
                             GRANT state (session.py)

pg_backend_pid / pg_cancel_backend / wire-session state are documented
out of scope (no server process).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

ENGINE_VERSION = "serene-spark 0.5 (PySpark)"


def version() -> str:
    return ENGINE_VERSION


#: Spark SQL type name → PG type name (format_type / pg_typeof spelling)
_PG_TYPE = {
    "string": "text", "bigint": "bigint", "int": "integer",
    "integer": "integer", "smallint": "smallint", "tinyint": "smallint",
    "double": "double precision", "float": "real", "boolean": "boolean",
    "date": "date", "timestamp": "timestamp without time zone",
    "binary": "bytea",
}


def format_type(spark_type: str) -> str:
    """Spark DDL type name → PG name; decimals/arrays mapped structurally,
    anything else passes through (PG prints unknown types verbatim too)."""
    t = spark_type.lower()
    if t in _PG_TYPE:
        return _PG_TYPE[t]
    if t.startswith("decimal"):
        return t.replace("decimal", "numeric")
    if t.startswith("array<") and t.endswith(">"):
        return format_type(t[6:-1]) + "[]"
    return t


def pg_typeof(col: Column) -> Column:
    """Column expression: the VALUE's type in PG spelling (Spark typeof()
    with the name mapping applied)."""
    t = F.typeof(col)
    out = t
    for spark_t, pg_t in _PG_TYPE.items():
        out = F.when(t == spark_t, F.lit(pg_t)).otherwise(out)
    return out


def current_setting(spark: SparkSession, name: str,
                    missing_ok: bool = False) -> str | None:
    try:
        return spark.conf.get(name)
    except Exception:
        if missing_ok:
            return None
        raise


def set_config(spark: SparkSession, name: str, value: str) -> str:
    spark.conf.set(name, value)
    return value


def current_user(session) -> str:
    """PG current_user: the session principal; 'postgres' (the superuser
    spelling) when no user is set — matches the reference default."""
    return session.current_user or "postgres"


def current_role(session) -> str:
    """PG current_role == current_user (no SET ROLE distinction here)."""
    return current_user(session)


def pg_total_relation_size(spark: SparkSession, *dfs) -> int:
    """pg_total_relation_size analogue: the relation plus its derived
    segments (pass the index relations alongside the table — the library
    engine's equivalent of heap + indexes)."""
    return sum(pg_table_size(spark, d) for d in dfs)


def pg_table_size(spark: SparkSession, df) -> int:
    """Bytes of the relation's source files (pg_table_size analogue —
    on-disk size, not in-memory)."""
    import os

    return sum(
        os.path.getsize(f.removeprefix("file:"))
        for f in df.inputFiles()
        if os.path.exists(f.removeprefix("file:"))
    )
