"""Round-1 completions: remaining transducer analogs and analytic
surface (map-indexed, grouping sets, first/last values, streaming
session windows, sampling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.queries import query
from kafka_streams_clojure_spark.queries._util import dsum, load_table, sql_dsum
from kafka_streams_clojure_spark.sql import sql as run_sql
from kafka_streams_clojure_spark.streaming import run_available_now, stream_table


@query(
    "q_map_indexed",
    oracle="""
    SELECT event_id,
           CAST(row_number() OVER (ORDER BY ts, event_id) - 1 AS BIGINT) AS idx
    FROM events
    """,
)
def q_map_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`(map-indexed f)` transducer: 0-based global sequence numbers in
    a pinned total order — via the parallel zipWithIndex idiom
    (range partition + local index + broadcast prefix counts), never a
    single-task global window sort."""
    from kafka_streams_clojure_spark.operators.order import global_index

    ev = load_table(spark, sf_dir, "events")
    return global_index(ev, ["ts", "event_id"], idx_col="idx").select("event_id", "idx")


_GROUPING_SETS = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n, {sql_dsum('o_totalprice')} AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@query("q_agg_grouping_sets", oracle=_GROUPING_SETS)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): same SQL text in
    both engines."""
    return run_sql(spark, sf_dir, _GROUPING_SETS)


@query(
    "q_win_first_last",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_val,
           last_value(value)  OVER w AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over full-partition frames."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@query(
    "q_stream_session_window",
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
    SELECT user_id, min(ts) AS session_start, count(*) AS n,
           {sql_dsum('value')} AS total
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows on the REAL streaming engine (KS SessionWindows
    parity end-to-end): watermarked `session_window` aggregation, complete-mode
    parquet store → final sessions equal the batch gaps-and-islands
    oracle (update mode is unsupported for streaming session windows)."""
    ev = stream_table(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"), dsum("value").alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n",
            "total",
        )
    )
    return run_available_now(agg, output_mode="complete")


@query(
    "q_agg_salted",
    oracle=f"""
    SELECT user_id, count(*) AS n, {sql_dsum('value')} AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase salted aggregation
    (operators.skew.salted_agg): splits each hot key across 16 salted
    reducers, then merges partials — results identical to the plain
    GROUP BY (which IS the oracle)."""
    from kafka_streams_clojure_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    return salted_agg(
        ev, ["user_id"], {"total_value": F.col("value")}, n_salts=16
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.95) AS p95
    FROM events GROUP BY event_type
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines use the same
    linear-interpolation definition; `percentile_approx` is the
    scale-path variant and stays rows-only territory)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.95).alias("p95"),
    )


@query("q_agg_percentile_approx")  # GK sketch — rows-only by design
def q_agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (`percentile_approx`, Greenwald-Khanna
    sketch): the 100 TB scale path — the exact variant needs the full
    value multiset per group, the sketch is a bounded-size mergeable
    summary combined map-side, so per-group memory is O(accuracy), not
    O(rows). Rows-only by design (sketch internals are engine-
    specific); the invariant test bounds its rank error against the
    exact percentiles."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
    )


@query(
    "q_ktable_latest",
    oracle="""
    SELECT user_id, event_type, value,
           ts AS latest_ts, event_id AS latest_event_id
    FROM (
      SELECT user_id, event_type, value, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_ktable_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable materialization (reference roadmap README.md:33-34): the
    events changelog compacted to each user's latest record via
    `max_by` over a packed order struct — a two-phase agg (shuffle ∝
    #keys), no per-group sort. The oracle uses the row_number idiom;
    results must be identical."""
    from kafka_streams_clojure_spark.operators.ktable import latest_by_key

    ev = load_table(spark, sf_dir, "events")
    return latest_by_key(
        ev,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_cols=["event_type", "value"],
    )


@query(
    "q_ktable_history",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) IS NULL
                       OR event_type <> lag(event_type)
                            OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, ts, event_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked
    ),
    hist AS (
      SELECT user_id, run_id, event_type AS state,
             min(ts) AS valid_from, count(*) AS n_events
      FROM runs GROUP BY user_id, run_id, event_type
    )
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
             AS valid_to,
           n_events
    FROM hist
    """,
)
def q_ktable_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable CHANGELOG → SCD2 history: where q_ktable_latest compacts
    to each key's current state, this keeps every state TRANSITION as
    a validity interval — consecutive same-state events collapse into
    one run (the dedupe/partition-by-runs idiom, null-safe change
    detection), each run becomes (state, valid_from, valid_to) with
    valid_to = next run's start and NULL marking the open current
    state. That's the slowly-changing-dimension table a warehouse
    derives from a compacted topic. Runs can share a timestamp at
    run boundaries (same ts, different event_id), so the interval
    lead orders by run_id — already consistent with (ts, event_id) —
    not by valid_from."""
    from kafka_streams_clojure_spark import xform as X

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    # run detection reuses the partition-by transducer — ONE home for
    # the null-safe change-detection idiom (CLAUDE.md hard rule), with
    # its synthetic-null regressions covering this key too
    runs = X.partition_by(
        F.col("event_type"),
        order_by=[F.col("ts"), F.col("event_id")],
        partition_cols=["user_id"],
    )(ev)
    hist = runs.groupBy("user_id", "run_id", F.col("event_type").alias("state")).agg(
        F.min("ts").alias("valid_from"), F.count("*").alias("n_events")
    )
    wl = W.partitionBy("user_id").orderBy("run_id")
    return hist.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(wl).alias("valid_to"),
        "n_events",
    )


_SCALAR_SUBQ = """
SELECT o_orderkey, o_totalprice,
       (SELECT max(l_quantity) FROM lineitem WHERE l_orderkey = o_orderkey)
         AS max_line_qty
FROM orders
WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
"""


@query("q_scalar_subquery", oracle=_SCALAR_SUBQ)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst rewrites it to a left
    outer aggregate join; same SQL text in both engines."""
    return run_sql(spark, sf_dir, _SCALAR_SUBQ)


@query(
    "q_agg_collect_set",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
    FROM events GROUP BY user_id
    """,
)
def q_agg_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-valued aggregation made deterministic: collect_set is
    unordered, so the comparison surface is the sorted, joined string."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types")
    )


@query("q_sample")  # RNG differs across engines — rows-only by design
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling with a fixed seed (reproducible within Spark;
    cross-engine RNG parity is impossible, hence rows-only). The
    invariant test bounds the sample fraction."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "q_data_quality",
    oracle="""
    WITH m AS (
      SELECT count(*)                                        AS n_rows,
             count(value)                                    AS n_value,
             count(DISTINCT event_id)                        AS n_ids,
             count(CASE WHEN value >= 0 AND value <= 1000
                        THEN 1 END)                          AS n_in_range,
             count(CASE WHEN event_type IN
                   ('view','click','purchase','signup','error')
                        THEN 1 END)                          AS n_known_type,
             count(CASE WHEN ts IS NOT NULL THEN 1 END)      AS n_ts
      FROM events
    )
    SELECT metric, CAST(ratio AS DOUBLE) AS value FROM (
      SELECT 'completeness_value' AS metric,
             CAST(n_value AS DOUBLE) / n_rows AS ratio FROM m
      UNION ALL SELECT 'uniqueness_event_id',
             CAST(n_ids AS DOUBLE) / n_rows FROM m
      UNION ALL SELECT 'compliance_value_range',
             CAST(n_in_range AS DOUBLE) / n_rows FROM m
      UNION ALL SELECT 'compliance_event_type',
             CAST(n_known_type AS DOUBLE) / n_rows FROM m
      UNION ALL SELECT 'completeness_ts',
             CAST(n_ts AS DOUBLE) / n_rows FROM m
    )
    """,
)
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality metric suite over the ingest table —
    the validation gate a production pipeline runs BEFORE anything
    downstream trusts a batch: completeness (non-null fractions),
    uniqueness (distinct-key ratio), compliance (range / domain
    membership). ONE scan, one aggregate row, unpivoted to (metric,
    value) rows — the whole suite costs one pass at any scale, and
    every ratio is integer/integer → exact double parity. Alert
    thresholds are the consumer's concern; this key is the
    measurement."""
    ev = load_table(spark, sf_dir, "events")
    known = ["view", "click", "purchase", "signup", "error"]
    m = ev.agg(
        F.count("*").alias("n_rows"),
        F.count("value").alias("n_value"),
        F.countDistinct("event_id").alias("n_ids"),
        F.count(
            F.when((F.col("value") >= 0) & (F.col("value") <= 1000), 1)
        ).alias("n_in_range"),
        F.count(F.when(F.col("event_type").isin(known), 1)).alias("n_known_type"),
        F.count(F.when(F.col("ts").isNotNull(), 1)).alias("n_ts"),
    )
    rows = [
        ("completeness_value", "n_value"),
        ("uniqueness_event_id", "n_ids"),
        ("compliance_value_range", "n_in_range"),
        ("compliance_event_type", "n_known_type"),
        ("completeness_ts", "n_ts"),
    ]
    # stack() unpivots the single aggregate row in-place — ONE scan of
    # events total (a union of per-metric selects would re-aggregate
    # the scan once per metric)
    pairs = ", ".join(
        f"'{name}', CAST(CAST({col} AS DOUBLE) / n_rows AS DOUBLE)"
        for name, col in rows
    )
    return m.selectExpr(f"stack({len(rows)}, {pairs}) AS (metric, value)")


@query(
    "q_incremental_agg",
    oracle=f"""
    SELECT user_id, count(*) AS n, {sql_dsum('value')} AS total
    FROM events GROUP BY user_id
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation maintenance — the mergeable-partial-state
    idiom every incremental ETL / materialized-view refresh relies on:
    two disjoint slices of the input (standing store + today's delta)
    are aggregated INDEPENDENTLY into partial states (count, DECIMAL
    sum), then merged by summing states — never re-scanning the
    standing slice's raw rows. The oracle is the plain one-shot
    aggregate: merged partials must equal it exactly, which is exactly
    why the partial sum stays DECIMAL until the final cast (a partial
    DOUBLE sum would make the merge order-dependent — the dsum rule
    applied across batches instead of across partitions)."""
    ev = load_table(spark, sf_dir, "events")
    DEC = "decimal(18,4)"

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count("*").alias("__n"),
            F.sum(F.col("value").cast(DEC)).alias("__s"),
        )

    standing = partial(ev.filter(F.col("event_id") % 2 == 0))
    delta = partial(ev.filter(F.col("event_id") % 2 == 1))
    return (
        standing.unionByName(delta)
        .groupBy("user_id")
        .agg(
            F.sum("__n").cast("bigint").alias("n"),
            F.sum("__s").cast("double").alias("total"),
        )
    )


@query(
    "q_cdc_merge",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer WHERE c_custkey % 3 <> 0
    ),
    chg AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 9 = 0 THEN 'D' ELSE 'U' END AS op,
             c_nationkey,
             c_acctbal + 100.0e0 AS new_bal
      FROM customer WHERE c_custkey % 2 = 0
    ),
    j AS (
      SELECT coalesce(b.c_custkey, c.c_custkey) AS c_custkey,
             b.c_custkey IS NOT NULL AS in_base,
             c.op,
             b.c_nationkey AS b_nat, c.c_nationkey AS c_nat,
             b.c_acctbal, c.new_bal
      FROM base b FULL JOIN chg c ON b.c_custkey = c.c_custkey
    )
    SELECT c_custkey,
           CASE WHEN op IS NULL THEN b_nat ELSE c_nat END AS c_nationkey,
           CASE WHEN op IS NULL THEN c_acctbal ELSE new_bal END AS acctbal,
           CASE WHEN op IS NULL THEN 'kept'
                WHEN in_base THEN 'updated'
                ELSE 'inserted' END AS action
    FROM j
    WHERE op IS NULL OR op = 'U'
    """,
)
def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE INTO (the Delta/Iceberg upsert statement Spark
    users run to apply a CDC batch to a dimension): base = the standing
    table, changes = a keyed batch with op codes — WHEN MATCHED AND
    op='U' THEN UPDATE, WHEN MATCHED AND op='D' THEN DELETE, WHEN NOT
    MATCHED AND op='U' THEN INSERT, delete-of-absent is a no-op, and
    untouched base rows pass through tagged 'kept'. Completes the CDC
    triad: q_ktable_latest (compaction) and q_ktable_history /
    q_stream_scd2 (history) show the changelog views; this key applies
    one.

    Expressed as ONE full-outer equi-join + null-safe routing (an
    explicit in-base flag, not a value-column null test — the CLAUDE.md
    first-match-routing rule), so Catalyst plans it like any keyed
    join: one shuffle on the merge key, broadcast if the CDC batch is
    dimension-sized, AQE skew-split if a hot key dominates. The fixture
    derives both sides deterministically from `customer` (every-2nd key
    changes, every-9th-of-those deletes), so the merged table is
    exact-oracle-checkable including the double balance update
    (identical scalar addition, never aggregated)."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.filter(F.col("c_custkey") % 3 != 0).select(
        "c_custkey",
        F.col("c_nationkey").alias("b_nat"),
        "c_acctbal",
        F.lit(True).alias("in_base"),
    )
    chg = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 9 == 0, "D").otherwise("U").alias("op"),
        F.col("c_nationkey").alias("c_nat"),
        (F.col("c_acctbal") + F.lit(100.0)).alias("new_bal"),
    )
    j = base.join(chg, "c_custkey", "full")
    return (
        j.filter(F.col("op").isNull() | (F.col("op") == "U"))
        .select(
            "c_custkey",
            F.when(F.col("op").isNull(), F.col("b_nat"))
            .otherwise(F.col("c_nat"))
            .alias("c_nationkey"),
            F.when(F.col("op").isNull(), F.col("c_acctbal"))
            .otherwise(F.col("new_bal"))
            .alias("acctbal"),
            F.when(F.col("op").isNull(), "kept")
            .when(F.col("in_base").eqNullSafe(F.lit(True)), "updated")
            .otherwise("inserted")
            .alias("action"),
        )
    )


@query(
    "q_incremental_join",
    oracle=f"""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance — the delta-join identity that
    completes `q_incremental_agg`'s mergeable-state story for the other
    stateful operator a materialized view needs:

        (A ∪ ΔA) ⋈ (B ∪ ΔB) = A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB

    The standing view A⋈B (orders with orderkey%7≠0 × customers with
    custkey%5≠0) is materialized ONCE (persisted — the stored view a
    refresh job reads, not recomputes), the three Δ-terms each touch a
    delta on at least one side, and the maintained view = the 4-way
    union. The key aggregates the maintained view per market segment
    with the decimal-sum discipline; the oracle aggregates the PLAIN
    full join — equality proves the identity end-to-end.

    Scale: the whole point — refresh cost is |ΔA|·|B|-join work (with
    B's join side pruned by the delta's key set at a real deployment)
    plus two delta-sized terms, never a recompute of A⋈B; all four
    terms are plain equi-joins, so broadcast/AQE handling is
    inherited. Partial-agg order independence comes free because the
    final aggregate uses dsum."""
    from kafka_streams_clojure_spark.operators._cache import persist_if_uncached

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    a = orders.filter(F.col("o_orderkey") % 7 != 0)
    da = orders.filter(F.col("o_orderkey") % 7 == 0)
    b = cust.filter(F.col("c_custkey") % 5 != 0)
    db = cust.filter(F.col("c_custkey") % 5 == 0)

    on = F.col("o_custkey") == F.col("c_custkey")
    view = persist_if_uncached(a.join(b, on))  # the STORED view
    increment = (
        da.join(b, on)
        .unionByName(a.join(db, on))
        .unionByName(da.join(db, on))
    )
    maintained = view.unionByName(increment)
    return maintained.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
