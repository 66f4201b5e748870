"""Aggregation query keys (SURVEY.md §2.4).

KS parity surface: groupByKey → count/reduce/aggregate and the
tumbling/hopping/session windowed variants (reference README.md:30-32,
68-70; re-key adapter api.clj:96-100). ``distinct``/``dedupe``/
``partition-by`` are the reference's order-sensitive transducers
(api.clj:39) mapped through explicit orderings (SURVEY §7 watch-list).

Spark executes every groupBy here as partial (map-side) + final
aggregation automatically — the two-phase shape that keeps shuffle
volume proportional to group count, not row count, at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_clojure_spark import xform as X
from kafka_streams_clojure_spark.queries import query
from kafka_streams_clojure_spark.queries._util import (
    davg,
    dsum,
    load_table,
    sql_davg,
    sql_dsum,
)


@query(
    "q_agg_count",
    oracle="SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
)
def q_agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KGroupedStream.count parity."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("n"))


@query(
    "q_agg_reduce_sum",
    oracle=f"""
    SELECT l_returnflag, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_reduce_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KGroupedStream.reduce parity (binary combine = sum)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(dsum("l_quantity").alias("sum_qty"))


@query(
    "q_agg_min_max",
    oracle="""
    SELECT o_orderpriority,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price,
           min(o_orderdate)  AS first_order,
           max(o_orderdate)  AS last_order
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_agg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@query(
    "q_agg_multi",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')}                          AS sum_qty,
           {sql_dsum('l_extendedprice')}                     AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')}  AS sum_disc_price,
           {sql_davg('l_quantity')}                          AS avg_qty,
           count(*)                                          AS count_order,
           count(DISTINCT l_orderkey)                        AS n_orders
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS `aggregate` (initializer+adder to a composite type) parity —
    the TPC-H Q1 shape: one pass, many simultaneous folds."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            F.count("*").alias("count_order"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


@query(
    "q_agg_tumbling_window",
    oracle=f"""
    SELECT date_trunc('day', ts)                    AS window_start,
           date_trunc('day', ts) + INTERVAL 1 DAY   AS window_end,
           event_type,
           count(*)                                 AS n,
           {sql_dsum('value')}                      AS total
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_agg_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed aggregate parity (README.md:30-32): 1-day tumbling
    windows via `window()` — identical code works on readStream with a
    watermark (see streaming_keys)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )


@query(
    "q_agg_sliding_window",
    oracle=f"""
    WITH offs AS (SELECT unnest([0, 1]) AS i)
    -- make_timestamp(us) yields a naive TIMESTAMP matching Spark's
    -- window().start; to_timestamp() would yield TIMESTAMPTZ (schema
    -- mismatch vs Spark, value shift on non-UTC sessions).
    SELECT make_timestamp(
             ((CAST(floor(epoch(ts) / 43200) AS BIGINT) - i) * 43200) * 1000000)
             AS window_start,
           count(*)            AS n,
           {sql_dsum('value')} AS total
    FROM events CROSS JOIN offs
    GROUP BY 1
    """,
)
def q_agg_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window aggregate (KS TimeWindows.advanceBy): 1-day
    windows sliding every 12h — each event lands in 2 windows. Oracle
    reconstructs Spark's epoch-aligned window starts arithmetically."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value").alias("total"))
        .select(F.col("w.start").alias("window_start"), "n", "total")
    )


@query(
    "q_agg_session_window",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, value, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN prev_ts IS NULL
                       OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      FROM ordered
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           min(ts)                         AS session_start,
           max(ts) + INTERVAL 30 MINUTE    AS session_end,
           count(*)                        AS n,
           {sql_dsum('value')}             AS total
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_agg_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window aggregate (KS SessionWindows, README.md:30-32):
    30-minute gap sessions per user via `session_window()` — Spark's
    native operator; the oracle rebuilds identical sessions with the
    gaps-and-islands idiom. Spark defines session end = last event +
    gap, which the oracle mirrors."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"), dsum("value").alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "total",
        )
    )


@query(
    "q_agg_session_dynamic",
    oracle=f"""
    WITH ends AS (
      SELECT user_id, ts, value, event_id,
             ts + CASE WHEN event_type = 'purchase' THEN INTERVAL 45 MINUTE
                       ELSE INTERVAL 15 MINUTE END AS ev_end
      FROM events
    ),
    marked AS (
      -- >= not >: Spark merges an event whose ts lands EXACTLY on the
      -- running-max window end into that session (same convention as
      -- the fixed-gap oracle's strict 'ts > prev_ts + gap' new-session
      -- test; verified by live repro — two events 30 min apart with a
      -- 30-min gap form ONE session)
      SELECT user_id, ts, value, event_id, ev_end,
             CASE WHEN max(ev_end) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= ts
                  THEN 0 ELSE 1 END AS is_new
      FROM ends
    ),
    sessions AS (
      SELECT user_id, ts, value, ev_end,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           min(ts)             AS session_start,
           max(ev_end)         AS session_end,
           count(*)            AS n,
           {sql_dsum('value')} AS total
    FROM sessions GROUP BY user_id, sid
    """,
)
def q_agg_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows (KS SessionWindows with per-record
    gap): each event extends its session by an amount depending on the
    event itself — purchases keep a session alive 45 min, everything
    else 15 min. Spark's `session_window(ts, gap_expr)` merges events
    whose [ts, ts+gap) windows chain-overlap; because a variable gap
    makes per-event window ends non-monotone, the oracle's
    gaps-and-islands must compare against the RUNNING MAX of prior
    window ends (a fixed-gap `lag(ts)` test would split sessions a
    long-gap event actually bridges). Session end = max event end, as
    Spark defines it."""
    gap = F.when(F.col("event_type") == "purchase", F.lit("45 minutes")).otherwise(
        F.lit("15 minutes")
    )
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"), dsum("value").alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "total",
        )
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(distinct)` transducer — global dedup, shuffle on the projected
    columns only."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    return X.distinct()(ev)


@query(
    "q_dedupe_consecutive",
    oracle="""
    SELECT event_id, user_id, event_type, ts FROM (
      SELECT event_id, user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events
    ) WHERE prev_type IS NULL OR event_type <> prev_type
    """,
)
def q_dedupe_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(dedupe)` transducer: drop *adjacent* duplicates per user in
    (ts, event_id) order — order pinned explicitly (SURVEY §7 item 2)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    return X.dedupe(
        value_cols=["event_type"],
        order_by=[F.col("ts"), F.col("event_id")],
        partition_by_cols=["user_id"],
    )(ev)


@query(
    "q_partition_by_runs",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, event_type, ts, value, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                       OR event_type <> lag(event_type) OVER w
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, event_type, ts, value,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
      FROM marked
    )
    SELECT user_id, run_id, event_type,
           count(*) AS run_len, min(ts) AS run_start,
           {sql_dsum('value')} AS run_value
    FROM runs GROUP BY user_id, run_id, event_type
    """,
)
def q_partition_by_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(partition-by f)` transducer: segment each user's stream into
    runs of equal event_type (gaps-and-islands), then fold each run."""
    ev = load_table(spark, sf_dir, "events")
    runs = X.partition_by(
        F.col("event_type"),
        order_by=[F.col("ts"), F.col("event_id")],
        partition_cols=["user_id"],
    )(ev)
    return runs.groupBy("user_id", "run_id", "event_type").agg(
        F.count("*").alias("run_len"),
        F.min("ts").alias("run_start"),
        dsum("value").alias("run_value"),
    )


@query(
    "q_agg_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity aggregation — subtotals + grand total in one
    shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    )


@query(
    "q_agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, {sql_dsum('o_totalprice')} AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    )


@query(
    "q_agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count-distinct (expand + two-phase agg in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query("q_agg_approx_distinct")  # approximate — rows-only check by design
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ count-distinct — the 100 TB-scale variant: constant
    memory per group vs the exact expand. No oracle (approximate);
    tests assert the relative-error contract instead."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_mode",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           first(user_id ORDER BY n DESC, user_id) AS mode_user,
           max(n) AS n_max
    FROM c GROUP BY event_type
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MODE with a pinned tie order (most active user per
    event type, smallest id on count ties). Spark's builtin `mode()`
    is non-deterministic on ties, so the key uses the deterministic
    argmax idiom instead — `min_by` over a packed (−count, id) struct,
    a two-phase aggregation with no window sort; the oracle's ordered
    `first()` pins the identical tie order."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(F.count("*").alias("__n"))
    return counts.groupBy("event_type").agg(
        F.min_by(
            "user_id",
            F.struct((-F.col("__n")).alias("neg_n"), F.col("user_id").alias("uid")),
        ).alias("mode_user"),
        F.max("__n").alias("n_max"),
    )
