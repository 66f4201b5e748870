"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``kafka_streams_clojure_spark`` package;
this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_clojure_spark import queries as _registry
from kafka_streams_clojure_spark import xform as X
from kafka_streams_clojure_spark.queries._util import dsum
from kafka_streams_clojure_spark.session import load_table


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (driver checks rows>0).

    The reference's flagship pipeline shape — filter ∘ map ∘ filter
    composed as transducers (reference README.md:80-82) — feeding a
    keyed windowed-style aggregation (its declared parity target,
    README.md:28-34): per (event_type, day) revenue and counts over
    the events stream table.
    """
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    pipe = X.compose(
        X.filter_(F.col("value") > 5.0),
        X.map_values(day=F.date_trunc("day", F.col("ts"))),
        X.filter_(F.col("event_type") != "view"),
    )
    return (
        pipe(ev)
        .groupBy("event_type", "day")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .orderBy("event_type", "day")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each SQL-expressible key in ``queries()``."""
    return _registry.oracle_sql()
