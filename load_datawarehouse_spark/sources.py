"""File-format and JDBC sources/sinks (SURVEY.md §2.1 S14, EXT).

The reference moves data exclusively as JSON rows over BigQuery's
streaming-insert HTTP API (`src/load_datawarehouse/bigquery/
__init__.py:438`; JSON sizing `src/load_datawarehouse/data.py:146-177`).
The Spark-native equivalent is the DataFrameReader/Writer surface;
this module wraps it with the engine's schema handling and
scale-relevant defaults, and gates JDBC behind a driver probe in the
reference's optional-dependency style (`src/load_datawarehouse/api/
google_bigquery.py:21-47`).

Scale notes:

- Parquet is the only self-describing format here; CSV and JSON are
  schema-lossy, so round-trips go through an explicit schema (reader
  inference at 100 TB would scan the data twice — never rely on it).
- Writers accept ``partition_by`` (hive-style layout → partition
  pruning on read) and ``max_records_per_file`` (the Spark analog of
  the reference's 20 MiB chunk cap — bounds file size without a
  repartition).
- JDBC reads must be split: ``partition_column`` + bounds +
  ``num_partitions`` turn one giant serial query into N range-bounded
  parallel queries; without them the whole table flows through a
  single task.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from load_datawarehouse_spark.errors import (
    WarehouseAPINotInstalled,
    WarehouseInvalidInput,
)

#: orc is the second columnar format Spark ships natively (predicate
#: pushdown + column pruning like parquet); text reads/writes a single
#: string column per line (the raw-corpus interchange format); avro
#: needs the external spark-avro package and is gated at call time.
FORMATS = ("parquet", "json", "csv", "orc", "text", "avro")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: Any,
) -> DataFrame:
    """Read a table from a file path.

    CSV/JSON require (or strongly prefer) an explicit ``schema``; when
    omitted, inference is enabled but costs an extra pass over the
    data — acceptable in tests, not at scale.
    """
    if fmt not in FORMATS:
        raise WarehouseInvalidInput(f"unsupported format {fmt!r}; use one of {FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
        if schema is None:
            options.setdefault("inferSchema", "true")
    if fmt == "json" and schema is None:
        # Spark samples for inference; make it explicit that the full
        # pass is intended when no schema is given.
        options.setdefault("samplingRatio", "1.0")
    if fmt == "avro" and not _format_available(spark, "avro"):
        raise WarehouseAPINotInstalled(
            "spark-avro is not on the session classpath; add "
            "org.apache.spark:spark-avro via spark.jars.packages"
        )
    return reader.options(**options).format(fmt).load(path)


def _format_available(spark: SparkSession, fmt: str) -> bool:
    """Probe the JVM for an external DataSource implementation
    (availability-shim pattern, cf. ``_jdbc_available``).

    Only a JVM "class/source not found" answer reports the format as
    absent. If the probe itself breaks (the private
    ``DataSource.lookupDataSource`` signature moving between Spark
    versions surfaces as Py4J/TypeError, not a JVM lookup failure),
    assume available and let the real read/write raise — an installed
    format must never be misreported as missing by a broken probe.
    """
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            fmt, spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception as exc:  # noqa: BLE001 — classify, don't swallow
        msg = f"{type(exc).__name__}: {exc}"
        absent_markers = (
            "ClassNotFoundException",
            "DATA_SOURCE_NOT_FOUND",
            "Failed to find data source",
            "Failed to find the data source",
        )
        if any(m in msg for m in absent_markers):
            return False
        return True  # probe broke, not the format — attempt the real op


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    **options: Any,
) -> None:
    """Write a DataFrame to a file path.

    ``partition_by`` produces hive-style directories (enables partition
    pruning downstream); ``max_records_per_file`` bounds output file
    size — the declarative analog of the reference's size-bounded
    chunking (`src/load_datawarehouse/data.py:227-317`).
    """
    if fmt not in FORMATS:
        raise WarehouseInvalidInput(f"unsupported format {fmt!r}; use one of {FORMATS}")
    if fmt == "text" and (len(df.columns) != 1):
        raise WarehouseInvalidInput(
            "text format writes exactly one string column per line; "
            f"got {len(df.columns)} columns"
        )
    if fmt == "avro" and not _format_available(df.sparkSession, "avro"):
        raise WarehouseAPINotInstalled(
            "spark-avro is not on the session classpath; add "
            "org.apache.spark:spark-avro via spark.jars.packages"
        )
    writer = df.write.mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if max_records_per_file is not None:
        options["maxRecordsPerFile"] = str(max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**options).format(fmt).save(path)


def _jdbc_available(spark: SparkSession, url: str) -> bool:
    """Probe for a JDBC driver able to serve ``url`` on the session's
    JVM classpath (reference pattern: availability shim instead of an
    import-time crash)."""
    try:
        jvm = spark._jvm
        jvm.java.sql.DriverManager.getDriver(url)
        return True
    except Exception:
        return False


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: Any,
) -> DataFrame:
    """Parallel JDBC read.

    Always pass the partitioning quadruple for non-trivial tables:
    each of the ``num_partitions`` tasks issues a range-bounded query,
    so the database streams N connections in parallel instead of one.
    """
    if not _jdbc_available(spark, url):
        raise WarehouseAPINotInstalled(
            f"no JDBC driver on the session classpath serves {url!r}; "
            "add the driver jar via spark.jars"
        )
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise WarehouseInvalidInput(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.options(**options).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    **options: Any,
) -> None:
    """JDBC sink; ``batchsize`` amortizes per-row round-trips (the
    analog of the reference's chunked streaming inserts)."""
    if not _jdbc_available(df.sparkSession, url):
        raise WarehouseAPINotInstalled(
            f"no JDBC driver on the session classpath serves {url!r}; "
            "add the driver jar via spark.jars"
        )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**options)
        .mode(mode)
        .save()
    )
