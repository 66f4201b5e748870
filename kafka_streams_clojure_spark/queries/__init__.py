"""Query registry — the driver-facing catalog of every implemented
operator (SURVEY.md §2 query keys).

Each query is registered with :func:`query` and provides:
- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the engine path),
- optionally a DuckDB-runnable ANSI-SQL oracle string (the t2
  correctness gate); streaming / approximate / side-effecting ops omit
  the oracle and get the driver's weaker rows-only check.

Import side effects register everything; ``__spark_entry__.py`` just
re-exports :func:`queries` / :func:`oracle_sql`.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, SparkQuery] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a query key (and its DuckDB oracle) under ``name``."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _QUERIES:
            raise ValueError(f"duplicate query key {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    from kafka_streams_clojure_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
        extras,
        joins,
        llm,
        relational,
        reshape,
        scalar_functions,
        sorts,
        sql_keys,
        streaming_keys,
        window_functions,
    )

    _LOADED = True


def run(spark: SparkSession, name: str, sf_dir: str) -> Any:
    """Convenience: run one registered query."""
    return queries()[name](spark, sf_dir)
