"""Shared helpers for the operator library.

Exact-aggregation discipline
----------------------------

Sums of doubles are not associative, so a distributed Spark sum and a
single-threaded DuckDB sum can differ in the last ulps. Every operator
that aggregates a double therefore routes it through an exact decimal
accumulator and casts the final value back to double:

    Spark :  F.sum(col.cast("decimal(38,6)")).cast("double")
    DuckDB:  CAST(SUM(CAST(expr AS DECIMAL(38,6))) AS DOUBLE)

The per-row double->decimal rounding is deterministic and identical in
both engines, decimal addition is exact integer arithmetic, and the
final decimal->double conversion is round-to-nearest in both — so the
results are bitwise identical regardless of partitioning, which is
what makes the oracle hash-comparison meaningful at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec_sum(col: Column | str, alias: str) -> Column:
    """Exact sum of a double column, returned as double."""
    return F.sum(_c(col).cast(DEC)).cast("double").alias(alias)


def dec_avg(col: Column | str, alias: str) -> Column:
    """Exact-sum average of a double column (double / bigint)."""
    return (F.sum(_c(col).cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def sql_dec_sum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) AS {alias}"


def sql_dec_avg(expr: str, alias: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)) AS {alias}"
