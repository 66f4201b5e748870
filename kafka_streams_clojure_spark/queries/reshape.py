"""Reshape + custom-aggregate keys: pivot, unpivot, grouped-agg pandas
UDAF (SURVEY §2.4/§2.10 completions)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.queries import query
from kafka_streams_clojure_spark.queries._util import DEC, load_table


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4)))
                FILTER (l_linestatus = 'O') AS DOUBLE) AS qty_open,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4)))
                FILTER (l_linestatus = 'F') AS DOUBLE) AS qty_filled
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: rows → columns per status (explicit value list, so no
    extra distinct-discovery job — the scalable form)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_open"),
            F.col("F").alias("qty_filled"),
        )
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS val FROM part
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: columns → rows (built-in `unpivot`, no shuffle)."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return p.unpivot("p_partkey", ["size", "retailprice"], "metric", "val")


@query(
    "q_udaf_grouped_agg",
    oracle="""
    SELECT event_type,
           max(value) - min(value) AS value_range,
           count(*)               AS n
    FROM events GROUP BY event_type
    """,
)
def q_udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via a grouped-agg pandas UDAF (KS `aggregate`
    initializer+adder parity, §2.10): per-group value range. max-min is
    order-independent, so the Arrow-side float math is oracle-exact."""

    @F.pandas_udf("double")
    def value_range(s: pd.Series) -> float:
        return float(s.max() - s.min())

    @F.pandas_udf("long")
    def n_rows(s: pd.Series) -> int:
        # Spark disallows mixing pandas and JVM aggregates in one agg,
        # so the count is a pandas UDAF too.
        return len(s)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        value_range("value").alias("value_range"), n_rows("value").alias("n")
    )


@query(
    "q_partition_all",
    oracle="""
    SELECT batch_id, count(*) AS n, min(event_id) AS first_id, max(event_id) AS last_id
    FROM (
      SELECT event_id,
             CAST(floor((row_number() OVER (ORDER BY ts, event_id) - 1) / 100)
                  AS BIGINT) AS batch_id
      FROM events
    ) GROUP BY batch_id
    """,
)
def q_partition_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(partition-all n)` transducer: fixed-size batches of 100 in
    (ts, event_id) order, summarized per batch."""
    from kafka_streams_clojure_spark import xform as X

    ev = load_table(spark, sf_dir, "events")
    batched = X.partition_all(100, order_by=[F.col("ts"), F.col("event_id")])(ev)
    return batched.groupBy("batch_id").agg(
        F.count("*").alias("n"),
        F.min("event_id").alias("first_id"),
        F.max("event_id").alias("last_id"),
    )
