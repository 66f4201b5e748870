"""SQL entry point: register the fixture tables as temp views and run
analytics with ``spark.sql`` — the declarative twin of the combinator
API (same Catalyst plans either way).

This is the surface a reference user gets "for free" by moving to the
engine: full ANSI SQL over the same tables the operator API sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_clojure_spark.session import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Create/replace one temp view per fixture table (idempotent)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run SQL against the fixture views (registering them first)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
