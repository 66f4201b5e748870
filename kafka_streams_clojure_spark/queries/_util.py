"""Shared helpers for query definitions.

Oracle-comparison discipline (the driver hashes values
order-insensitively but exactly):

- **Double aggregations are decimal-cast on BOTH sides.** Summing
  doubles is order-dependent; Spark's partial/final aggregation order
  is nondeterministic across partitions. ``dsum`` casts the input to
  DECIMAL(18,4) (exact), sums, and casts the result back to DOUBLE —
  the identical expression in the DuckDB oracle yields bit-identical
  values. Same for ``davg``.
- **Per-row arithmetic stays in doubles** — identical IEEE expression
  trees on identical inputs are deterministic.
- Every computed column is aliased identically in the Spark plan and
  the oracle SQL (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.session import load_table, load_tables  # noqa: F401

DEC = "decimal(18,4)"


def dsum(col: Column | str) -> Column:
    """Order-independent (exact) sum of a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent average of a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"CAST(CAST(sum(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / count({expr}) AS DOUBLE)"
