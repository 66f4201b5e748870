"""Analytic window-function keys (SURVEY.md §2.5, `[ext]`).

Not in the reference's row-at-a-time model — its nearest analogs are
the ordered state-store range scans (api.clj:108-111) and the
order-sensitive transducers. All Catalyst built-ins; every ordering is
made total with a unique tiebreaker so results are deterministic and
oracle-comparable (SURVEY §7 watch-list item 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.queries import query
from kafka_streams_clojure_spark.queries._util import load_table, sql_dsum

DEC = "decimal(18,4)"


@query(
    "q_win_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey) AS rn
    FROM orders
    """,
)
def q_win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), "o_orderkey")
    return o.select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))


@query(
    "q_win_rank",
    oracle="""
    SELECT p_brand, p_partkey,
           rank()       OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
           dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
    FROM part
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank — ties produce equal ranks, so no tiebreaker is
    needed for determinism."""
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(value, 2, -1.0) OVER w AS prev2_or_default
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"),
    )


@query(
    "q_win_running_sum",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS n_so_far
    FROM events
    """,
)
def q_win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running/frame aggregate. Decimal-cast inside the frame: Spark
    accumulates sequentially while DuckDB uses segment trees — double
    association order differs, decimal arithmetic doesn't."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
        F.count("*").over(w).alias("n_so_far"),
    )


@query(
    "q_win_ntile",
    oracle="""
    SELECT o_orderkey,
           ntile(4)       OVER w AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cdist
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions over a total order (unique tiebreaker
    makes ntile deterministic). Single-partition window — fine for a
    ranking report; at scale you'd bucket first (see q_topk_per_group
    for the partitioned pattern)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "q_win_range_frame",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY user_id ORDER BY epoch_s
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS hour_value
    FROM (SELECT event_id, user_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s FROM events)
    """,
)
def q_win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range frame: per user, the rolling 1-hour sum of `value` —
    value-based frames (all rows within 3600s), not row counts."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "epoch_s", F.unix_timestamp("ts")
    )
    w = W.partitionBy("user_id").orderBy("epoch_s").rangeBetween(-3600, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("hour_value"),
    )
