"""Foreign scans — the reference's postgres_fdw / clickhouse_fdw surface
as Spark JDBC sources.

Reference: `CREATE SERVER ... (postgres_fdw | clickhouse_fdw)` attaches
remote PG/ClickHouse tables scanned through DuckDB extensions
(server/pg/commands/create_server.cpp:65, server/catalog/foreign_server.h;
tests tests/sqllogic/sdb/clickhouse/*_chscan.test_slow).

Spark mapping: `spark.read.format("jdbc")`. The part that matters at
100 TB is PARTITIONED reads — a single-connection JDBC scan serializes the
whole remote table through one executor; `partition_column/num_partitions`
splits it into range-bounded queries that run in parallel, and Catalyst
pushes filters/projections into the remote SQL (PushedFilters show up in
the JDBC relation's plan).

Driver jars are not bundled; `ForeignServer.available()` gates every call
so environments without a driver degrade to a clear error, not a plan-time
crash."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: JDBC driver classes per flavor (the reference's two FDWs + sqlite for
#: self-contained tests when a driver jar is on the classpath)
DRIVERS = {
    "postgres": "org.postgresql.Driver",
    "clickhouse": "com.clickhouse.jdbc.ClickHouseDriver",
    "sqlite": "org.sqlite.JDBC",
}


@dataclass
class ForeignServer:
    """CREATE SERVER analogue: connection info + per-scan defaults."""

    url: str                      # jdbc:postgresql://host:5432/db
    flavor: str = "postgres"
    user: str | None = None
    password: str | None = None
    options: dict = field(default_factory=dict)

    def _base_options(self) -> dict:
        opts = {"url": self.url, **self.options}
        if self.flavor in DRIVERS:
            opts.setdefault("driver", DRIVERS[self.flavor])
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        return opts

    def available(self, spark: SparkSession) -> bool:
        """True when the driver class is loadable in the JVM."""
        driver = self._base_options().get("driver")
        if driver is None:
            return True  # rely on DriverManager URL resolution
        try:
            spark._jvm.java.lang.Class.forName(driver)  # noqa: SLF001
            return True
        except Exception:  # noqa: BLE001
            return False

    def table(
        self,
        spark: SparkSession,
        table: str,
        partition_column: str | None = None,
        lower_bound=None,
        upper_bound=None,
        num_partitions: int = 8,
        fetchsize: int = 10_000,
    ) -> DataFrame:
        """Foreign table scan. With `partition_column` (+ bounds), the read
        fans out over `num_partitions` range-bounded remote queries — the
        only shape that survives a large remote table."""
        opts = self._base_options()
        opts["dbtable"] = table
        opts["fetchsize"] = str(fetchsize)
        if partition_column is not None:
            if lower_bound is None or upper_bound is None:
                raise ValueError(
                    "partitioned JDBC scan needs lower_bound/upper_bound"
                )
            opts.update(
                partitionColumn=partition_column,
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
                numPartitions=str(num_partitions),
            )
        return spark.read.format("jdbc").options(**opts).load()

    def query(self, spark: SparkSession, sql: str, **kw) -> DataFrame:
        """Pushdown-an-arbitrary-query scan (the FDW remote-SQL path)."""
        return self.table(spark, f"({sql}) AS sq", **kw)
