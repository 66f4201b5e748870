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
    "q_win_locf",
    oracle="""
    WITH gappy AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, user_id, v,
           last_value(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS v_filled
    FROM gappy
    """,
)
def q_win_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF forward-fill (last observation carried forward) — the
    time-series gap-filling idiom: null measurements (here: error
    events' values, nulled deterministically so both engines see the
    same gaps) take the most recent non-null value of the same key;
    a key's leading nulls stay null. `last(..., ignorenulls=True)`
    over a running frame — one shuffle on the key, same partitioning
    as every other per-key window."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        v.alias("v"),
        F.last(v, ignorenulls=True).over(w).alias("v_filled"),
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
    makes every rank dense and deterministic) — WITHOUT the
    single-task global-window sort. ``operators/order.global_index``
    gives a parallel 0-based global sequence (range partition + local
    index + broadcast prefix counts); with a unique ordering the SQL
    distribution functions are closed-form in (idx, n):

    - ``ntile(k)``: first ``n % k`` buckets get ``n div k + 1`` rows;
    - ``percent_rank`` = idx / (n-1);
    - ``cume_dist``   = (idx+1) / n.

    n is folded in-plan as a broadcast 1-row aggregate (no driver
    action), so the whole query is one lazy distributed plan that
    survives 100 TB — the shape the plan lint enforces with an empty
    global-window allowlist."""
    from kafka_streams_clojure_spark.operators.order import global_index

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    d = global_index(o, ["o_totalprice", "o_orderkey"], idx_col="__idx")
    n = d.agg(F.count("*").alias("__n"))
    big = "(__n div 4 + 1)"  # size of the first (__n % 4) buckets
    return (
        d.join(F.broadcast(n))
        .select(
            "o_orderkey",
            F.expr(
                f"CAST(CASE WHEN __n div 4 = 0 THEN __idx + 1 "
                f"WHEN __idx < (__n % 4) * {big} THEN __idx div {big} + 1 "
                f"ELSE (__n % 4) + (__idx - (__n % 4) * {big}) div (__n div 4) + 1 "
                f"END AS INT)"
            ).alias("quartile"),
            F.expr(
                "CASE WHEN __n = 1 THEN CAST(0.0 AS DOUBLE) "
                "ELSE __idx / CAST(__n - 1 AS DOUBLE) END"
            ).alias("pct_rank"),
            F.expr("(__idx + 1) / CAST(__n AS DOUBLE)").alias("cdist"),
        )
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


@query(
    "q_win_rolling_median",
    oracle="""
    SELECT event_id, user_id,
           quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 10 PRECEDING AND CURRENT ROW
           ) AS roll_median
    FROM events
    """,
)
def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over an 11-row trailing frame per user — the
    robust-smoothing twin of the running mean (one extreme value can't
    move a median). Exercises percentile-as-WINDOW-aggregate: both
    engines interpolate the same linear definition (the
    q_agg_percentile contract) and the frame is a ROWS frame on the
    standard (ts, event_id) total order, so values are bit-identical.
    Cost is the one per-user sort every windowed key already pays;
    the frame re-sorts 11 values per row (no incremental median in
    either engine) — at 100 TB prefer the GK-sketch bucketed variant
    for wide frames."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.percentile("value", 0.5).over(w).alias("roll_median"),
    )
