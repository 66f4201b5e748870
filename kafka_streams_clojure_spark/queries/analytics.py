"""Event-analytics query keys: funnel conversion and cohort retention
over the ``events`` fixture — the classic product-analytics shapes a
streaming-events engine (reference: kafka-streams topology consumers,
api.clj:96-140) is used for downstream of ingestion.

Both keys are pure multi-stage aggregations over ``user_id`` — every
shuffle is keyed by the user, so at 100 TB they scale with the user
cardinality, not the event count, after the first map-side-combined
aggregate. No driver actions, no windows without partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.queries import query
from kafka_streams_clojure_spark.queries._util import davg, dsum, load_table, sql_davg, sql_dsum

# Funnel stages: first 'view', then first 'click' AFTER that view,
# then first 'purchase' AFTER that click — strict event-order funnel,
# not a bag-of-events intersection. ONE builder serves the unbounded
# and the conversion-window variants on BOTH engines (the
# _JACCARD_CTES pattern: shared text so the twins' oracles can't
# drift); ``bound`` is a SQL interval literal like '1 DAY' or None.


def _funnel_sql(bound: "str | None", labels: "tuple[str, str, str]") -> str:
    b1 = f" AND e.ts <= s1.t1 + INTERVAL {bound}" if bound else ""
    b2 = f" AND e.ts <= s2.t2 + INTERVAL {bound}" if bound else ""
    return f"""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1{b1}
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2{b2}
      GROUP BY e.user_id
    )
    SELECT CAST(stage AS VARCHAR) AS stage, CAST(users AS BIGINT) AS users
    FROM (
      SELECT '{labels[0]}' AS stage, count(*) AS users FROM s1
      UNION ALL SELECT '{labels[1]}', count(*) FROM s2
      UNION ALL SELECT '{labels[2]}', count(*) FROM s3
    )
    """


def _funnel(
    spark: SparkSession,
    sf_dir: str,
    bound: "str | None",
    labels: "tuple[str, str, str]",
) -> DataFrame:
    """Spark twin of :func:`_funnel_sql` (see q_events_funnel for the
    plan-shape notes: chained per-user mins, s1/s2 persisted because
    each is read by its stage count AND the next stage's join)."""
    from kafka_streams_clojure_spark.operators._cache import persist_if_uncached

    ev = load_table(spark, sf_dir, "events")

    def within(prev_t: str):
        cond = F.col("ts") > F.col(prev_t)
        if bound:
            cond = cond & (
                F.col("ts") <= F.col(prev_t) + F.expr(f"INTERVAL {bound}")
            )
        return cond

    s1 = persist_if_uncached(
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = persist_if_uncached(
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(within("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(within("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count("*").cast("bigint").alias("users")
        )

    return (
        stage(s1, labels[0])
        .unionAll(stage(s2, labels[1]))
        .unionAll(stage(s3, labels[2]))
    )


_FUNNEL_LABELS = ("view", "view>click", "view>click>purchase")
_FUNNEL_ORACLE = _funnel_sql(None, _FUNNEL_LABELS)


@query("q_events_funnel", oracle=_FUNNEL_ORACLE)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel (view → click → purchase): each stage keeps
    users whose first stage-N event happens AFTER their first
    stage-(N-1) event.

    Plan shape: three per-user min aggregates chained by user_id
    equi-joins. Every exchange is hash(user_id) — AQE reuses the
    partitioning across stages, and each stage's input shrinks
    monotonically (funnel property), so the joins get cheaper as the
    chain deepens. ``s1``/``s2`` are each read twice (their stage
    count + the next stage's join), so both are persisted — exchange
    reuse across the union branches is plan-shape sensitive and must
    not be relied on to avoid a 3× events scan."""
    return _funnel(spark, sf_dir, None, _FUNNEL_LABELS)


_RETENTION_ORACLE = """
WITH first_day AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
)
SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day,
       CAST(date_diff('day', f.cohort_day, a.active_day) AS INT) AS day_offset,
       CAST(count(*) AS BIGINT) AS active_users
FROM activity a JOIN first_day f ON a.user_id = f.user_id
GROUP BY f.cohort_day, day_offset
"""


@query("q_events_retention", oracle=_RETENTION_ORACLE)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by their first active
    day; for each (cohort_day, day_offset) the count of users from
    that cohort active offset days later.

    Plan shape: distinct (user, day) pairs and the per-user min-day
    both shuffle on user_id; the final matrix aggregate shuffles on
    (cohort, offset) — tiny (days²) output. ``activity`` is already
    one row per (user, day), so the final count(*) needs no
    count-distinct. cohort_day is emitted as a naive TIMESTAMP (not
    DATE): the two engines' pandas bridges render DATE differently
    (datetime64 vs datetime.date), which the value-hash comparison
    would flag even though the dates are identical."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("active_day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("active_day").alias("cohort_day"))
    activity = ev.distinct()
    return (
        activity.join(first_day, "user_id")
        .select(
            F.col("cohort_day").cast("timestamp").alias("cohort_day"),
            F.datediff(F.col("active_day"), F.col("cohort_day"))
            .cast("int")
            .alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("bigint").alias("active_users"))
    )


@query(
    "q_events_outliers",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             {sql_davg('value')} AS mean_v,
             {sql_davg('value * value')} AS meansq
      FROM events GROUP BY event_type
    ),
    s2 AS (
      SELECT event_type, mean_v,
             sqrt(meansq - mean_v * mean_v) AS std_v
      FROM stats
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s.mean_v) / s.std_v AS z
    FROM events e JOIN s2 s USING (event_type)
    WHERE abs(e.value - s.mean_v) > 3 * s.std_v
    """,
)
def q_events_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 3-sigma outlier detection: flag events whose value
    deviates more than 3 standard deviations from their event_type's
    mean — the monitoring/anomaly shape run over metric streams.

    Numeric discipline: mean and mean-of-squares use the shared
    ``davg``/``sql_davg`` decimal-cast helpers (partial-agg order
    independent, one definition on both engines); variance,
    sqrt, and the z-score itself are per-row IEEE double ops that both
    engines compute identically (sqrt is correctly-rounded — never
    libm-divergent pow/ln/exp).

    Scale shape: the per-type stats table is tiny (#event_types rows)
    and BROADCAST back onto the stream — the fact table is scanned
    twice (once for stats, once for scoring) but never shuffled for
    the join; at 100 TB the second scan reuses parquet column pruning
    (event_id, event_type, value only)."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        davg(F.col("value")).alias("mean_v"),
        davg(F.col("value") * F.col("value")).alias("meansq"),
    )
    s2 = stats.select(
        "event_type",
        "mean_v",
        F.sqrt(F.col("meansq") - F.col("mean_v") * F.col("mean_v")).alias("std_v"),
    )
    return (
        ev.join(F.broadcast(s2), "event_type")
        .filter(
            F.abs(F.col("value") - F.col("mean_v")) > F.lit(3) * F.col("std_v")
        )
        .select(
            "event_id",
            "event_type",
            "value",
            ((F.col("value") - F.col("mean_v")) / F.col("std_v")).alias("z"),
        )
    )


@query(
    "q_events_trending",
    oracle=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, event_type,
             count(*)            AS n,
             {sql_dsum('value')} AS total
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, n, total
    FROM daily
    QUALIFY row_number() OVER (
      PARTITION BY day ORDER BY total DESC, event_type) <= 3
    """,
)
def q_events_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending report: top-3 event types per DAY by (decimal-exact)
    total value, deterministic event_type tiebreak. The window
    partitions by day, so Catalyst plans it as WindowGroupLimit — each
    day's rank truncates during the shuffle, no global sort. The
    time-bucketed twin of q_topk_per_group."""
    from kafka_streams_clojure_spark.queries._util import dsum

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"), dsum("value").alias("total"))
    from pyspark.sql import Window

    w = Window.partitionBy("day").orderBy(F.col("total").desc(), F.col("event_type"))
    return (
        daily.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= 3)
        .select("day", "event_type", "n", "total")
    )


@query(
    "q_events_heavy_hitters",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY user_id
    HAVING count(*) > 80
    """,
)
def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters: power users above an absolute activity
    threshold (> 80 events). The fixture's per-user event count does
    NOT scale with sf (user cardinality scales instead), so a relative
    share threshold would be vacuously empty — the absolute cut keeps
    the key naturally non-empty AND selective (~6% of users) at every
    sf, per the SCALE.md geometry-vs-threshold lesson. Pure integer
    comparison, engine-portable. Plan: one map-side-combined count per
    user; shuffle ∝ distinct users. When the distinct set itself is
    cluster-sized, the bounded-memory twin is
    :func:`operators.sketch.heavy_hitters_sketch`
    (`q_events_heavy_hitters_sketch`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 80)
        .select("user_id", "cnt")
    )


@query("q_events_heavy_hitters_sketch")
def q_events_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-memory heavy hitters over user_id (Misra–Gries
    mergeable summaries, `operators/sketch.py`): per-partition state
    and exchange capped at `capacity` counters regardless of distinct-
    user cardinality. Rows-only BY DESIGN: which counters survive the
    MG decrements depends on partition layout, so estimates are not
    engine-portable — the deterministic contracts
    (`est <= true <= est + err`; every item with `true > err`
    survives; output ⊇ the exact > 80 heavy hitters, since
    `est + err >= true` always) are invariant-tested in
    tests/test_sketch.py, and the oracle-gated exact twin is
    `q_events_heavy_hitters`."""
    from kafka_streams_clojure_spark.operators.sketch import heavy_hitters_sketch

    ev = load_table(spark, sf_dir, "events")
    # capacity sized to the threshold: err <= n/(capacity+1) must stay
    # BELOW min_count or the sketch filter is vacuous (sf0.1: n=100k →
    # c >= 1250 for err <= 80; 1408 also stays below the 1500 distinct
    # users so the MG compression genuinely fires there)
    return heavy_hitters_sketch(ev, "user_id", capacity=1408, min_count=80)


@query(
    "q_events_outliers_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS absdev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS mad FROM dev GROUP BY 1)
    SELECT d.event_id, d.event_type, d.value, d.med, m.mad
    FROM dev d JOIN mad m USING (event_type)
    WHERE d.absdev > 5.0 * m.mad
    """,
)
def q_events_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST outlier detection: |x − median| > 5·MAD per event type
    (median absolute deviation) — unlike the 3σ z-score twin
    (q_events_outliers), a few extreme values cannot inflate the
    spread estimate and mask each other. Exact interpolated medians on
    both engines (the q_agg_percentile parity precedent); the two
    per-type stat tables broadcast back onto the scan, so the fact
    table shuffles only for the percentile aggregations."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("absdev", 0.5).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("absdev") > 5.0 * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )


@query(
    "q_events_corr",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             {sql_davg('value')} AS mx,
             {sql_davg('CAST(hour(ts) AS DOUBLE)')} AS my,
             {sql_davg('value * CAST(hour(ts) AS DOUBLE)')} AS mxy,
             {sql_davg('value * value')} AS mxx,
             {sql_davg('CAST(hour(ts) AS DOUBLE) * CAST(hour(ts) AS DOUBLE)')} AS myy
      FROM events GROUP BY event_type
    )
    -- greatest(var, 0): decimal quantization can push a degenerate
    -- (single-row / constant) group's variance a hair negative, which
    -- hard-errors DuckDB's sqrt while Spark returns NaN; the CASE
    -- nulls corr when either variance is zero (Spark's non-ANSI /0
    -- would yield NULL, DuckDB inf — make both NULL explicitly)
    SELECT event_type,
           (mxy - mx * my) AS covar_value_hour,
           CASE WHEN sqrt(greatest(mxx - mx * mx, 0))
                     * sqrt(greatest(myy - my * my, 0)) > 0
                THEN (mxy - mx * my)
                     / (sqrt(greatest(mxx - mx * mx, 0))
                        * sqrt(greatest(myy - my * my, 0)))
           END AS corr_value_hour
    FROM s
    """,
)
def q_events_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Pearson correlation (and covariance) between event
    value and hour-of-day — the does-this-metric-follow-a-daily-cycle
    probe. Spark's builtin `corr()` sums doubles in partial-agg order
    (nondeterministic across partitions), so the key computes the five
    moments through the shared decimal-cast `davg` twins and assembles
    corr per-row (products, differences, correctly-rounded sqrt —
    never libm pow). hour() is integer field extraction on both
    engines, no epoch rounding."""
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value")
    y = F.hour("ts").cast("double")
    s = ev.groupBy("event_type").agg(
        davg(x).alias("mx"),
        davg(y).alias("my"),
        davg(x * y).alias("mxy"),
        davg(x * x).alias("mxx"),
        davg(y * y).alias("myy"),
    )
    cov = F.col("mxy") - F.col("mx") * F.col("my")
    # clip-to-zero + null-on-zero-denominator mirrors the oracle's
    # CASE/greatest guard for degenerate (constant or single-row) groups
    denom = F.sqrt(
        F.greatest(F.col("mxx") - F.col("mx") * F.col("mx"), F.lit(0.0))
    ) * F.sqrt(F.greatest(F.col("myy") - F.col("my") * F.col("my"), F.lit(0.0)))
    return s.select(
        "event_type",
        cov.alias("covar_value_hour"),
        F.when(denom > 0, cov / denom).alias("corr_value_hour"),
    )


@query(
    "q_events_ohlc",
    oracle="""
    SELECT date_trunc('hour', ts) AS bar, event_type,
           first(value ORDER BY ts, event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY ts, event_id) AS close,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type (the candlestick resample every
    metrics/market pipeline runs): open/close are the first/last value
    in (ts, event_id) order via `min_by`/`max_by` over a packed order
    struct — a pure two-phase aggregation, no per-bar sort, no window;
    high/low are plain min/max. All four picks are existing doubles
    (no arithmetic), so parity needs no decimal discipline — only the
    pinned tie order."""
    ev = load_table(spark, sf_dir, "events")
    order = F.struct("ts", "event_id")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("bar"), "event_type"
    ).agg(
        F.min_by("value", order).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", order).alias("close"),
        F.count("*").alias("n"),
    )


@query(
    "q_events_twap",
    oracle=f"""
    WITH d AS (
      SELECT user_id, value,
             CAST(CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))) AS BIGINT)
                  - CAST(floor(epoch(ts)) AS BIGINT) AS DOUBLE) AS dt
      FROM events
    )
    SELECT user_id,
           CASE WHEN {sql_dsum('dt')} > 0
                THEN CAST({sql_dsum('value * dt')} / {sql_dsum('dt')} AS DOUBLE)
           END AS twap,
           count(*) AS n_intervals
    FROM d WHERE dt IS NOT NULL GROUP BY user_id
    """,
)
def q_events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each observation
    holds until the next one, so it is weighted by its holding
    interval — sum(value·dt)/sum(dt) over lead-diffed timestamps, the
    last (open-ended) observation excluded. dt is WHOLE SECONDS on
    both engines (Spark unix_timestamp = DuckDB floor(epoch) — the
    CLAUDE.md rounding rule): second-granular weights keep the
    decimal-cast products small and far from rounding-tie territory
    (µs-scale products put the tie digit inside the double's noise
    floor — measured last-ulp divergence). A user whose surviving
    intervals sum to zero seconds gets NULL, identically in both
    engines (the q_events_corr degenerate-group lesson)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn(
            "dt",
            (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")).cast(
                "double"
            ),
        )
        .filter(F.col("dt").isNotNull())
    )
    num = dsum(F.col("value") * F.col("dt"))
    den = dsum(F.col("dt"))
    return d.groupBy("user_id").agg(
        F.when(den > 0, (num / den).cast("double")).alias("twap"),
        F.count("*").alias("n_intervals"),
    )


@query(
    "q_events_funnel_windowed",
    oracle=_funnel_sql("1 DAY", ("view", "view>click_1d", "view>click>purchase_1d")),
)
def q_events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUNDED funnel: each stage must fire within 1 day of the
    previous stage's first event — the conversion-window constraint
    that distinguishes a real attribution funnel from the unbounded
    event-order funnel (q_events_funnel, the SAME shared builder with
    ``bound=None``). The window bound is one extra pushdown predicate
    per stage, so cost is unchanged."""
    return _funnel(
        spark, sf_dir, "1 DAY", ("view", "view>click_1d", "view>click>purchase_1d")
    )


@query(
    "q_events_transitions",
    oracle="""
    WITH tr AS (
      SELECT user_id, event_type AS curr,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM events
    ),
    c AS (SELECT prev, curr, count(*) AS n FROM tr WHERE prev IS NOT NULL
          GROUP BY 1, 2),
    t AS (SELECT prev, sum(n) AS n_prev FROM c GROUP BY prev)
    SELECT c.prev, c.curr, c.n,
           CAST(c.n AS DOUBLE) / CAST(t.n_prev AS DOUBLE) AS p
    FROM c JOIN t USING (prev)
    """,
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: what does each event type lead to, and with what
    probability (count / row total — an exact integer ratio, no
    decimal discipline needed). The behavioral-model shape behind
    next-action prediction and anomaly scoring on event streams; one
    per-user lag window + two small aggregations."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
    )
    counts = tr.groupBy("prev", F.col("event_type").alias("curr")).agg(
        F.count("*").alias("n")
    )
    tot = counts.groupBy("prev").agg(F.sum("n").alias("n_prev"))
    return counts.join(tot, "prev").select(
        "prev",
        "curr",
        "n",
        (F.col("n").cast("double") / F.col("n_prev").cast("double")).alias("p"),
    )


# ── PageRank (integer-exact, fixed-iteration — oracle-able) ─────────

_PR_ITERS = 5
_PR_UNIT = 10**12
_PR_DN, _PR_DD = 85, 100  # damping 0.85 as an integer fraction


def _pagerank_sql(iters: int, unit: int, dn: int, dd: int) -> str:
    """Unrolled power iteration as plain CTE levels (recursive CTEs
    can't aggregate over the recursive relation in standard SQL), over
    the customer↔supplier co-purchase graph. Integer arithmetic only
    (`//` = Spark `DIV` for the all-positive values here), so every
    level is bit-identical to the Spark loop in operators.graph.pagerank."""
    base = f"({(dd - dn) * unit} // ({dd} * (SELECT n FROM params)))"
    sep = ",\n    "
    levels = []
    for i in range(1, iters + 1):
        levels.append(
            f"""r{i} AS (
      SELECT und.b AS id,
             CAST({base} + sum(({dn} * r{i - 1}.r) // ({dd} * deg.d)) AS BIGINT) AS r
      FROM und JOIN r{i - 1} ON und.a = r{i - 1}.id JOIN deg ON deg.a = und.a
      GROUP BY und.b
    )"""
        )
    return f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    und AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    deg AS (SELECT a, count(*) AS d FROM und GROUP BY a),
    params AS (SELECT count(DISTINCT a) AS n FROM und),
    r0 AS (SELECT DISTINCT a AS id, {unit} // (SELECT n FROM params) AS r FROM und),
    {sep.join(levels)}
    SELECT id, r AS rank FROM r{iters}
    """


@query("q_graph_pagerank", oracle=_pagerank_sql(_PR_ITERS, _PR_UNIT, _PR_DN, _PR_DD))
def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the customer↔supplier co-purchase
    graph (an entity-importance score for recommendation/risk ranking
    downstream of an event pipeline). INTEGER-EXACT fixed-iteration
    power method — see operators.graph.pagerank — which is what makes
    an iterative algorithm exactly DuckDB-oracle-able: the oracle
    unrolls the same 5 integer iterations as CTE levels. Supplier ids
    are offset by 1e6 into a disjoint id space before the graphs are
    symmetrized."""
    from kafka_streams_clojure_spark.operators.graph import pagerank

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("id_a"),
            (F.col("l_suppkey") + 1000000).alias("id_b"),
        )
        # no .distinct() here: pagerank symmetrizes + distincts anyway,
        # so a pre-distinct is a pure extra 600k-row shuffle
    )
    return pagerank(edges, iters=_PR_ITERS, unit=_PR_UNIT, damp_num=_PR_DN, damp_den=_PR_DD)


@query(
    "q_events_resample",
    oracle="""
    WITH obs AS (
      SELECT user_id, sec, arg_max(value, event_id) AS v
      FROM (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                   event_id, value
            FROM events
            WHERE ts IS NOT NULL AND value IS NOT NULL AND user_id IS NOT NULL)
      GROUP BY user_id, sec
    ),
    b AS (
      SELECT user_id,
             ((min(sec) + 21599) // 21600) * 21600 AS lo,
             (max(sec) // 21600) * 21600            AS hi
      FROM obs GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, 21600)) AS gsec
      FROM b WHERE hi >= lo
    ),
    un AS (
      SELECT user_id, sec, 0 AS is_grid, v FROM obs
      UNION ALL
      SELECT user_id, gsec AS sec, 1 AS is_grid, NULL AS v FROM grid
    ),
    f AS (
      SELECT user_id, sec, is_grid,
        last_value(CASE WHEN is_grid = 0 THEN sec END IGNORE NULLS) OVER w_p AS t1,
        last_value(CASE WHEN is_grid = 0 THEN v   END IGNORE NULLS) OVER w_p AS v1,
        first_value(CASE WHEN is_grid = 0 THEN sec END IGNORE NULLS) OVER w_n AS t2,
        first_value(CASE WHEN is_grid = 0 THEN v   END IGNORE NULLS) OVER w_n AS v2
      FROM un
      WINDOW
        w_p AS (PARTITION BY user_id ORDER BY sec, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_n AS (PARTITION BY user_id ORDER BY sec, is_grid
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, sec AS gsec,
           CASE WHEN t2 IS NULL OR t2 = t1 THEN v1
                ELSE v1 + (v2 - v1)
                     * (CAST(sec - t1 AS DOUBLE) / CAST(t2 - t1 AS DOUBLE))
           END AS v_interp
    FROM f WHERE is_grid = 1
    """,
)
def q_events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-grid resampling with LINEAR interpolation (the financial /
    sensor `resample().interpolate()` shape): per user, value sampled
    onto epoch-aligned 6-hour marks between that user's first and last
    observation, each mark interpolated between its bracketing
    observations. Implementation is the classic union-and-fill: grid
    rows (null value) merged with observations, per-user forward fill
    of (t1, v1) and backward fill of (t2, v2) via ignore-nulls window
    frames — two sorts on one user-keyed shuffle, no join explosion;
    at 100 TB both windows ride the same user_id partitioning.
    Determinism discipline: observations are deduped per whole SECOND
    (arg_max on event_id), seconds via the unix_timestamp =
    floor(epoch) rule, the obs-before-grid tie order makes a mark that
    coincides with an observation return that observation exactly, and
    the interpolation arithmetic is the same per-row IEEE expression
    tree in both engines."""
    from pyspark.sql import Window as W

    step = 21600
    ev = load_table(spark, sf_dir, "events")
    # mirrored null guards (the as-of null-key rule, defensively): a
    # null ts/value/user would order and fill differently per engine
    obs = (
        ev.filter(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(
            "user_id",
            F.unix_timestamp("ts").alias("sec"),
            "event_id",
            "value",
        )
        .groupBy("user_id", "sec")
        .agg(F.max_by("value", "event_id").alias("v"))
    )
    bounds = obs.groupBy("user_id").agg(
        (((F.min("sec") + (step - 1)) / step).cast("long") * step).alias("lo"),
        ((F.max("sec") / step).cast("long") * step).alias("hi"),
    )
    grid = bounds.filter(F.col("hi") >= F.col("lo")).select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.lit(step).cast("long"))).alias("gsec"),
    )
    un = obs.select(
        "user_id", "sec", F.lit(0).alias("is_grid"), "v"
    ).unionByName(
        grid.select(
            "user_id",
            F.col("gsec").alias("sec"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("double").alias("v"),
        )
    )
    w_p = (
        W.partitionBy("user_id")
        .orderBy("sec", "is_grid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_n = (
        W.partitionBy("user_id")
        .orderBy("sec", "is_grid")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    o_sec = F.when(F.col("is_grid") == 0, F.col("sec"))
    o_v = F.when(F.col("is_grid") == 0, F.col("v"))
    f = un.select(
        "user_id",
        "sec",
        "is_grid",
        F.last(o_sec, ignorenulls=True).over(w_p).alias("t1"),
        F.last(o_v, ignorenulls=True).over(w_p).alias("v1"),
        F.first(o_sec, ignorenulls=True).over(w_n).alias("t2"),
        F.first(o_v, ignorenulls=True).over(w_n).alias("v2"),
    )
    interp = F.col("v1") + (F.col("v2") - F.col("v1")) * (
        (F.col("sec") - F.col("t1")).cast("double")
        / (F.col("t2") - F.col("t1")).cast("double")
    )
    return f.filter(F.col("is_grid") == 1).select(
        "user_id",
        F.col("sec").alias("gsec"),
        F.when(F.col("t2").isNull() | (F.col("t2") == F.col("t1")), F.col("v1"))
        .otherwise(interp)
        .alias("v_interp"),
    )


def _bfs_sql(source: int, hops: int) -> str:
    """Unrolled BFS rounds as CTE levels over the same co-purchase
    graph CTEs as :func:`_pagerank_sql` — integer distances, min-merge
    per round, bit-identical to operators.graph.bfs_layers."""
    levels = []
    for i in range(1, hops + 1):
        levels.append(
            f"""d{i} AS (
      SELECT id, min(dist) AS dist FROM (
        SELECT id, dist FROM d{i - 1}
        UNION ALL
        SELECT und.b AS id, d.dist + 1 AS dist
        FROM und JOIN d{i - 1} d ON und.a = d.id
      ) GROUP BY id
    )"""
        )
    sep = ",\n    "
    return f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    und AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    d0 AS (SELECT DISTINCT a AS id, 0 AS dist FROM und WHERE a = {source}),
    {sep.join(levels)}
    SELECT id, CAST(dist AS INT) AS dist FROM d{hops}
    """


_BFS_SOURCE, _BFS_HOPS = 1, 3


_KCORE_K, _KCORE_ROUNDS = 8, 4


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled k-core peeling oracle (the _pagerank_sql trick): level
    i+1 keeps level i's edges whose BOTH endpoints have level-i degree
    >= k. Fixture-verified: 4 rounds reach the true fixpoint at all
    three SFs for k=8."""
    ctes = [
        """e0 AS (
      SELECT DISTINCT a, b FROM (
        SELECT o_custkey AS a, l_suppkey + 1000000 AS b
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        UNION
        SELECT l_suppkey + 1000000 AS a, o_custkey AS b
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      )
    )"""
    ]
    for i in range(rounds):
        ctes.append(
            f"""k{i} AS (
      SELECT a FROM e{i} GROUP BY a HAVING count(*) >= {k}
    ),
    e{i + 1} AS (
      SELECT e.a, e.b FROM e{i} e
      JOIN k{i} ka ON ka.a = e.a
      JOIN k{i} kb ON kb.a = e.b
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
    FROM e{rounds} GROUP BY a"""
    )


@query("q_graph_kcore", oracle=_kcore_sql(_KCORE_K, _KCORE_ROUNDS))
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-CORE decomposition (k=8) of the customer↔supplier co-purchase
    graph — the dense-subgraph peel that separates structurally
    embedded entities from peripheral ones (fraud rings, supply-chain
    backbones, community cores; Seidman 1983). Each round drops every
    vertex whose CURRENT degree is below k, cascading; 4 rounds reach
    the exact fixpoint on the fixtures (verified at all three SFs), and
    a fixed round budget is what makes the iterative algorithm
    DuckDB-oracle-able — the oracle unrolls the same 4 integer peeling
    levels as CTE layers (the q_graph_pagerank trick). Per round: one
    map-side-combined degree aggregate + two semi-joins keyed like the
    edge list, state shrinking monotonically; lineage truncated per
    round (operators/graph.kcore)."""
    from kafka_streams_clojure_spark.operators.graph import kcore

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("id_a"),
            (F.col("l_suppkey") + 1000000).alias("id_b"),
        )
    )
    return kcore(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


@query("q_graph_bfs", oracle=_bfs_sql(_BFS_SOURCE, _BFS_HOPS))
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-hop BFS neighborhood (blast radius) from customer 1 over the
    co-purchase graph — hop distances are integers, so the bounded
    expansion is exactly oracle-able with unrolled CTE rounds (the
    q_graph_pagerank trick). See operators.graph.bfs_layers for the
    per-round shuffle shape."""
    from kafka_streams_clojure_spark.operators.graph import bfs_layers

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("id_a"),
            (F.col("l_suppkey") + 1000000).alias("id_b"),
        )
        # pre-distinct omitted: bfs_layers' symmetrize step distincts
    )
    return bfs_layers(edges, source=_BFS_SOURCE, max_hops=_BFS_HOPS)


@query("q_events_cms")
def q_events_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-query estimates for every distinct event_type —
    the 'how frequent is THIS item' twin of the Misra-Gries 'which
    items are frequent' sketch. Sketch = depth×width counters (bounded
    by CELLS, not item cardinality); estimates are hash-collision
    overestimates → rows-only, invariants in tests/test_sketch.py
    (est ≥ true, per-row mass conservation, bounded overestimate)."""
    from kafka_streams_clojure_spark.operators.sketch import cms_query, cms_table

    ev = load_table(spark, sf_dir, "events")
    table = cms_table(ev, "event_type")
    probes = ev.select("event_type").distinct()
    return cms_query(table, probes, "event_type")


@query(
    "q_events_recency_weighted",
    oracle="""
    WITH anchor AS (
      SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS t_max FROM events
    ),
    w AS (
      SELECT event_type,
             greatest(0, 30 - CAST((t_max - CAST(floor(epoch(ts)) AS BIGINT))
                                   // 86400 AS BIGINT)) AS wt
      FROM events CROSS JOIN anchor
    )
    SELECT event_type,
           CAST(sum(wt) AS BIGINT)            AS weight,
           count(CASE WHEN wt > 0 THEN 1 END) AS n_recent
    FROM w GROUP BY event_type
    """,
)
def q_events_recency_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly recency-decayed activity score per event type: each
    event contributes max(0, 30 − age_days) INTEGER weight units
    relative to the newest event — trending-with-decay without exp()
    (libm-divergent) and without float sums (integer weights sum
    exactly in any aggregation order). The anchor max-ts is folded
    in-plan as a broadcast 1-row side; whole-second epochs via the
    unix_timestamp = floor(epoch) rule."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.unix_timestamp("ts")).alias("t_max"))
    wt = F.greatest(
        F.lit(0).cast("long"),
        F.lit(30)
        - F.expr("(t_max - unix_timestamp(ts)) DIV 86400"),
    )
    return (
        ev.crossJoin(F.broadcast(anchor))
        .select("event_type", wt.alias("wt"))
        .groupBy("event_type")
        .agg(
            F.sum("wt").cast("bigint").alias("weight"),
            F.count(F.when(F.col("wt") > 0, 1)).alias("n_recent"),
        )
    )


@query(
    "q_events_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
      FROM seq WHERE e3 IS NOT NULL GROUP BY 1
    )
    SELECT path, n FROM paths
    ORDER BY n DESC, path LIMIT 10
    """,
)
def q_events_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common 3-step behavior paths (event-type trigrams
    per user in time order) — the path-mining extension of the
    first-order q_events_transitions matrix. One per-user lead window
    (same partitioning as every other per-user key) + a tiny path
    aggregate; top-k with the full (n, path) tie order."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


@query(
    "q_events_changepoint",
    oracle="""
    WITH ordered AS (
      SELECT event_type, value, ts, event_id,
             CAST(row_number() OVER w AS BIGINT)                  AS i,
             sum(CAST(value AS DECIMAL(14,4))) OVER w             AS cum,
             sum(CAST(value AS DECIMAL(14,4)))
               OVER (PARTITION BY event_type)                     AS s,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    scored AS (
      SELECT event_type, ts, i, n,
             (CAST(CAST(cum AS DECIMAL(18,4)) AS DOUBLE) / i)
               - (CAST(CAST(s - cum AS DECIMAL(18,4)) AS DOUBLE) / (n - i))
               AS d
      FROM ordered WHERE i < n
    ),
    ranked AS (
      SELECT event_type, ts, i,
             (d * d) * ((CAST(i AS DOUBLE) * CAST(n - i AS DOUBLE))
                        / CAST(n AS DOUBLE)) AS score,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY (d * d) * ((CAST(i AS DOUBLE) * CAST(n - i AS DOUBLE))
                                   / CAST(n AS DOUBLE)) DESC, i
             ) AS rk
      FROM scored
    )
    SELECT event_type, i AS change_idx, ts AS change_ts, score
    FROM ranked WHERE rk = 1
    """,
)
def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline changepoint detection (binary segmentation, first
    split): per event type, the time index maximizing the weighted
    between-segment mean gap (meanL − meanR)² · i(n−i)/n — the CUSUM
    split statistic. One ordered window pass: running DECIMAL sums
    make every prefix mean exact, the downcast to DECIMAL(18,4) keeps
    the decimal→double conversion out of the >18-precision
    double-rounding trap (CLAUDE.md), and the argmax is a row_number
    with an index tiebreak (arg_max tie behavior is engine-specific).
    At 100 TB the scan is one shuffle on the partition key and the
    candidate scoring rides the same sort as any per-key window."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wp = W.partitionBy("event_type")
    dec = F.col("value").cast("decimal(14,4)")
    ordered = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("ts", "event_id"))
        .cast("bigint")
        .alias("i"),
        F.sum(dec).over(w).alias("cum"),
        F.sum(dec).over(wp).alias("s"),
        F.count("*").over(wp).cast("bigint").alias("n"),
    )
    d = (
        F.col("cum").cast("decimal(18,4)").cast("double") / F.col("i")
    ) - (
        (F.col("s") - F.col("cum")).cast("decimal(18,4)").cast("double")
        / (F.col("n") - F.col("i"))
    )
    scored = ordered.filter(F.col("i") < F.col("n")).select(
        "event_type", "ts", "i", "n", d.alias("d")
    )
    score = (F.col("d") * F.col("d")) * (
        (F.col("i").cast("double") * (F.col("n") - F.col("i")).cast("double"))
        / F.col("n").cast("double")
    )
    ranked = scored.select(
        "event_type", "ts", "i", score.alias("score")
    ).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.col("score").desc(), "i")
        ),
    )
    return ranked.filter(F.col("rk") == 1).select(
        "event_type",
        F.col("i").alias("change_idx"),
        F.col("ts").alias("change_ts"),
        "score",
    )


@query(
    "q_events_gini",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, value,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS BIGINT) AS i,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)      AS n
      FROM events
    )
    SELECT event_type,
           CAST({sql_dsum('(2 * i - n - 1) * value')}
                / (CAST(n AS DOUBLE) * {sql_dsum('value')}) AS DOUBLE) AS gini
    FROM ranked GROUP BY event_type, n
    """,
)
def q_events_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration index of value per event type — the
    inequality metric for spotting skewed mixtures (one whale user /
    one dominant source): G = Σ(2i−n−1)·xᵢ / (n·Σx) over
    ascending-sorted values. Rank weights are integers, products stay
    per-row doubles, and BOTH sums go through the decimal cast (the
    dsum rule) so the ratio is aggregation-order independent; the sort
    rides the standard per-type partition with event_id tiebreak."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("value", "event_id"))
        .cast("bigint")
        .alias("i"),
        F.count("*").over(W.partitionBy("event_type")).cast("bigint").alias("n"),
    )
    num = dsum((2 * F.col("i") - F.col("n") - 1) * F.col("value"))
    den = F.col("n").cast("double") * dsum("value")
    return (
        ranked.groupBy("event_type", "n")
        .agg((num / den).cast("double").alias("gini"))
        .select("event_type", "gini")
    )


@query(
    "q_basket_affinity",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    norders AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM items),
    freq AS (SELECT p, CAST(count(*) AS BIGINT) AS n_p FROM items GROUP BY p),
    pairs AS (
      SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS n_pair
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
    )
    SELECT p1, p2, n_pair,
           CAST(CAST(n_pair AS DOUBLE) * n_orders
                / (CAST(f1.n_p AS DOUBLE) * f2.n_p) AS DOUBLE) AS lift
    FROM pairs
    JOIN freq f1 ON p1 = f1.p
    JOIN freq f2 ON p2 = f2.p
    CROSS JOIN norders
    WHERE n_pair >= 3
    ORDER BY lift DESC, n_pair DESC, p1, p2 LIMIT 20
    """,
)
def q_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: top-20 co-ordered part pairs by lift
    (P(a,b)/(P(a)P(b))) with a support floor — the transactional twin
    of the text bigram collocations key. Candidate pairs come from the
    within-order self-join (never parts²: shuffle ∝ Σ basket², and
    baskets are small — a pathological mega-basket trips
    operators/skew.hot_key_guard in-plan at 10k items); counts are
    integers, lift is one per-row double expression, n_orders rides
    as a broadcast 1-row side, and the top-k carries the full
    (lift, n_pair, p1, p2) tie order."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    norders = items.agg(F.countDistinct("o").cast("bigint").alias("n_orders"))
    freq = items.groupBy("p").agg(F.count("*").cast("bigint").alias("n_p"))
    from kafka_streams_clojure_spark.operators.skew import hot_key_guard

    # basket self-join is ∝ Σ basket² — guard a pathological mega-order
    # in-plan. ONE side suffices (the degree table scans every basket;
    # the trip fires whichever side carries the hot row) and keeps the
    # guard's broadcast join out of the b-side subplan entirely.
    a_g = hot_key_guard(
        items, ["o"], max_count=10_000, op_name="q_basket_affinity basket"
    )
    a = a_g.select(F.col("o"), F.col("p").alias("p1"))
    b = items.select(F.col("o"), F.col("p").alias("p2"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("bigint").alias("n_pair"))
        .filter(F.col("n_pair") >= 3)
    )
    lift = (
        F.col("n_pair").cast("double")
        * F.col("n_orders")
        / (F.col("f1_np").cast("double") * F.col("f2_np"))
    ).cast("double")
    return (
        pairs.join(freq.select(F.col("p").alias("p1"), F.col("n_p").alias("f1_np")), "p1")
        .join(freq.select(F.col("p").alias("p2"), F.col("n_p").alias("f2_np")), "p2")
        .crossJoin(F.broadcast(norders))
        .select("p1", "p2", "n_pair", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), F.col("n_pair").desc(), "p1", "p2")
        .limit(20)
    )


@query(
    "q_orders_pareto",
    oracle="""
    WITH t AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS s
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(sum(s) AS DECIMAL(18,4)) AS st FROM t),
    r AS (
      SELECT o_custkey, s,
             CAST(row_number() OVER w AS BIGINT) AS rnk,
             CAST(sum(s) OVER (w ROWS UNBOUNDED PRECEDING)
                  AS DECIMAL(18,4))              AS cum
      FROM t
      WINDOW w AS (ORDER BY s DESC, o_custkey)
    )
    SELECT o_custkey, rnk,
           CAST(CAST(cum AS DOUBLE) / CAST(st AS DOUBLE) AS DOUBLE) AS cum_share
    FROM r CROSS JOIN tot
    """,
)
def q_orders_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (cumulative-share) curve over customer revenue — the
    80/20 concentration diagnostic: customers ranked by total spend,
    each with the cumulative fraction of all revenue above them. The
    global running sum is inherently a total-order scan, so it runs as
    operators/order.ranked_prefix_sum (range-partitioned local cumsums
    + one broadcast per-partition prefix — NO single-task window);
    every sum is DECIMAL(18,4) end-to-end (totals stay ≤18 digits at
    sf0.1 — above that, raise the scale ceiling BEFORE the double
    conversion, never past 18: the DuckDB hugeint double-rounding
    rule), and the share division happens once per row in doubles."""
    from kafka_streams_clojure_spark.operators.order import ranked_prefix_sum

    o = load_table(spark, sf_dir, "orders")
    t = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("s")
    )
    tot = t.agg(F.sum("s").cast("decimal(18,4)").alias("st"))
    ranked = ranked_prefix_sum(
        t,
        order_by=[F.col("s").desc(), F.col("o_custkey")],
        value_col="s",
        idx_col="rnk",
        cum_col="cum",
    )
    share = (
        F.col("cum").cast("decimal(18,4)").cast("double")
        / F.col("st").cast("double")
    ).cast("double")
    return ranked.crossJoin(F.broadcast(tot)).select(
        "o_custkey", "rnk", share.alias("cum_share")
    )


@query(
    "q_events_burst",
    oracle="""
    WITH sec AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events
    ),
    win AS (
      SELECT user_id,
             CAST(count(*) OVER (PARTITION BY user_id ORDER BY s
                                 RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS in_window
      FROM sec
    )
    SELECT user_id, max(in_window) AS burst_10m
    FROM win GROUP BY user_id
    """,
)
def q_events_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: each user's maximum event count inside any
    trailing 10-minute window — the rate-spike feature behind abuse /
    bot flagging and autoscaling triggers. RANGE frame over INTEGER
    epoch seconds (the unix_timestamp = floor(epoch) rule), so frame
    membership is exact on both engines and peers at the same second
    are handled identically (RANGE includes all peers — a ROWS frame
    here would be tiebreak-dependent). One per-user sort + one
    per-user max."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    sec = ev.select("user_id", F.unix_timestamp("ts").alias("s"))
    w = W.partitionBy("user_id").orderBy("s").rangeBetween(-600, 0)
    return (
        sec.select("user_id", F.count("*").over(w).cast("bigint").alias("in_window"))
        .groupBy("user_id")
        .agg(F.max("in_window").alias("burst_10m"))
    )


@query(
    "q_events_pop_growth",
    oracle=f"""
    WITH d AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             count(*) AS n, {sql_dsum('value')} AS total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n, total,
           CASE WHEN lag(total) OVER w IS NOT NULL
                 AND lag(total) OVER w <> 0
                THEN CAST((total - lag(total) OVER w)
                          / lag(total) OVER w AS DOUBLE)
           END AS growth
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def q_events_pop_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth — daily totals per event type with
    (today − yesterday)/yesterday: the BI trendline primitive. Totals
    are dsum-exact so the lag-ratio operands are bit-identical; the
    denominator is guarded against NULL (first day) AND zero (the
    /0-is-inf-in-DuckDB rule) on both engines."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"), dsum("value").alias("total"))
    w = W.partitionBy("event_type").orderBy("day")
    prev = F.lag("total").over(w)
    growth = F.when(
        prev.isNotNull() & (prev != 0),
        ((F.col("total") - prev) / prev).cast("double"),
    )
    return d.select("event_type", "day", "n", "total", growth.alias("growth"))


@query(
    "q_events_interarrival",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id))) AS BIGINT)
               - CAST(floor(epoch(ts)) AS BIGINT) AS gap_s
      FROM events
    )
    SELECT event_type,
           quantile_cont(gap_s, 0.5)  AS p50_s,
           quantile_cont(gap_s, 0.95) AS p95_s,
           CAST(count(gap_s) AS BIGINT) AS n_gaps
    FROM gaps WHERE gap_s IS NOT NULL GROUP BY event_type
    """,
)
def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type (median / p95
    whole-second gaps to each user's NEXT event) — the latency/
    engagement-cadence profile. Gaps are integers via the
    unix_timestamp = floor(epoch) rule; exact interpolated percentiles
    (the q_agg_percentile contract) over them are engine-identical."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")).alias(
            "gap_s"
        ),
    ).filter(F.col("gap_s").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.percentile("gap_s", 0.5).alias("p50_s"),
        F.percentile("gap_s", 0.95).alias("p95_s"),
        F.count("gap_s").cast("bigint").alias("n_gaps"),
    )


@query(
    "q_events_seasonality",
    oracle=f"""
    SELECT event_type,
           -- DuckDB dayofweek is 0=Sunday, Spark's is 1=Sunday
           CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(hour(ts) AS INT)      AS hod,
           count(*)                   AS n,
           {sql_dsum('value')}        AS total
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality heatmap: activity by (day-of-week × hour-of-day)
    per event type — the load-forecasting / staffing matrix. One
    two-phase aggregate; extraction functions agree because the
    session is forced UTC; DuckDB's dayofweek is 0=Sunday vs
    Spark's 1=Sunday — the oracle shifts by one (an engine-dialect
    trap worth the comment)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.dayofweek("ts").cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count("*").alias("n"), dsum("value").alias("total"))


@query(
    "q_orders_bookings",
    oracle="""
    WITH d AS (
      SELECT o_orderdate AS day,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                  AS DECIMAL(18,4)) AS s
      FROM orders GROUP BY 1
    )
    SELECT day,
           CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS day_idx,
           n_orders,
           CAST(s AS DOUBLE) AS day_total,
           CAST(CAST(sum(s) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                     AS DECIMAL(18,4)) AS DOUBLE) AS cum_total
    FROM d
    """,
)
def q_orders_bookings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bookings-to-date: daily order counts/revenue with the running
    cumulative total — the finance dashboard's headline series. The
    global running sum reuses operators/order.ranked_prefix_sum
    (range-partitioned cumsums + broadcast prefix, no single-task
    window — same primitive as q_orders_pareto, different monoid
    consumer); revenue stays DECIMAL(18,4) until the final double
    cast."""
    from kafka_streams_clojure_spark.operators.order import ranked_prefix_sum

    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("s"),
    )
    ranked = ranked_prefix_sum(
        d, order_by=["day"], value_col="s", idx_col="day_idx", cum_col="cum"
    )
    return ranked.select(
        "day",
        "day_idx",
        "n_orders",
        F.col("s").cast("double").alias("day_total"),
        F.col("cum").cast("decimal(18,4)").cast("double").alias("cum_total"),
    )


@query(
    "q_orders_ship_lag",
    oracle="""
    WITH lag AS (
      SELECT o.o_orderpriority,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag_days
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority,
           quantile_cont(lag_days, 0.5)  AS p50_days,
           quantile_cont(lag_days, 0.95) AS p95_days,
           CAST(count(*) AS BIGINT)      AS n_lines
    FROM lag GROUP BY o_orderpriority
    """,
)
def q_orders_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lag distribution per priority class (p50/p95
    whole days) — the fulfillment-SLA view; the TPC-H twin of
    q_events_interarrival. Integer day gaps via DATE datediff (no
    epoch arithmetic at all), exact interpolated percentiles, one
    fact⋈fact equi-join on the order key."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lag = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).cast("bigint").alias("lag_days"),
    )
    return lag.groupBy("o_orderpriority").agg(
        F.percentile("lag_days", 0.5).alias("p50_days"),
        F.percentile("lag_days", 0.95).alias("p95_days"),
        F.count("*").cast("bigint").alias("n_lines"),
    )


@query(
    "q_events_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ),
    dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
    cover AS (
      SELECT user_id, day + to_days(CAST(i AS INT)) AS cover_day
      FROM ud CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6]) AS i)
    ),
    wau AS (
      SELECT cover_day AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM cover GROUP BY cover_day
    )
    SELECT d.day, d.dau, w.wau,
           CAST(CAST(d.dau AS DOUBLE) / w.wau AS DOUBLE) AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day
    """,
)
def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the growth-analytics engagement
    ratio. Rolling DISTINCT counts aren't windowable (count(DISTINCT)
    over a frame is unsupported in both engines), so the trailing-7-day
    uniques come from the cover-set trick: each (user, active-day)
    pair is exploded onto the 7 days it covers, then one
    count-distinct per cover day — shuffle ∝ 7 × user-day pairs,
    never days × users. Only days that appear as cover days of actual
    activity are emitted (inner join vs DAU prunes the 6-day tail
    after the last activity)."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    cover = ud.select(
        "user_id",
        F.explode(
            F.array(*[F.col("day") + F.expr(f"INTERVAL {i} DAYS") for i in range(7)])
        ).alias("day"),
    )
    wau = cover.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau")).cast("double").alias("stickiness"),
    )


@query(
    "q_events_session_conversion",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_type, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    s AS (
      SELECT user_id, ts, event_type,
             sum(CASE WHEN prev_ts IS NULL
                       OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    ),
    f AS (
      SELECT user_id, sid,
             min(ts) AS s_start,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM s GROUP BY user_id, sid
    ),
    conv AS (
      SELECT f.user_id, f.sid, f.s_start,
             CASE WHEN f.t_view IS NOT NULL AND EXISTS (
               SELECT 1 FROM s e
               WHERE e.user_id = f.user_id AND e.sid = f.sid
                 AND e.event_type = 'purchase' AND e.ts > f.t_view
             ) THEN 1 ELSE 0 END AS converted
      FROM f
    )
    SELECT date_trunc('day', s_start) AS day,
           CAST(count(*) AS BIGINT)       AS n_sessions,
           CAST(sum(converted) AS BIGINT) AS n_converted,
           CAST(CAST(sum(converted) AS DOUBLE) / count(*) AS DOUBLE) AS conv_rate
    FROM conv GROUP BY 1
    """,
)
def q_events_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-SESSION conversion rate per day: 30-minute-gap sessions
    (the gaps-and-islands idiom shared with q_agg_session_window)
    scored by whether a view is followed by a purchase INSIDE the same
    session — the composition of sessionization and funnel logic the
    global q_events_funnel can't express (a purchase in next week's
    session shouldn't convert today's view). All shuffles stay on
    user_id until the tiny per-day rollup; the purchase probe is a
    per-session semi-join, not a correlated re-scan."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    s = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.sum(
            F.when(
                F.lag("ts").over(w).isNull()
                | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTES")),
                1,
            ).otherwise(0)
        )
        .over(wc)
        .alias("sid"),
    )
    from kafka_streams_clojure_spark.operators._cache import persist_if_uncached

    s = persist_if_uncached(s)
    f = s.groupBy("user_id", "sid").agg(
        F.min("ts").alias("s_start"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
    )
    purchases = s.filter(F.col("event_type") == "purchase").select(
        "user_id", "sid", F.col("ts").alias("p_ts")
    )
    hit = (
        f.filter(F.col("t_view").isNotNull())
        .join(purchases, ["user_id", "sid"])
        .filter(F.col("p_ts") > F.col("t_view"))
        .select("user_id", "sid")
        .distinct()
        .withColumn("__c", F.lit(1))
    )
    conv = f.join(hit, ["user_id", "sid"], "left").select(
        "s_start", F.coalesce(F.col("__c"), F.lit(0)).alias("converted")
    )
    return conv.groupBy(F.date_trunc("day", "s_start").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        (F.sum("converted").cast("double") / F.count("*"))
        .cast("double")
        .alias("conv_rate"),
    )


@query(
    "q_events_conversion_latency",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT CAST(floor(epoch(t3)) AS BIGINT)
               - CAST(floor(epoch(t1)) AS BIGINT) AS lat_s
      FROM s1 JOIN s3 USING (user_id)
    )
    SELECT CAST(count(*) AS BIGINT)     AS n_converted,
           quantile_cont(lat_s, 0.5)    AS p50_s,
           quantile_cont(lat_s, 0.95)   AS p95_s
    FROM lat
    """,
)
def q_events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: seconds from first view to first
    subsequent purchase, p50/p95 over converted users — the latency
    companion to the funnel's conversion COUNTS (how fast, not just
    how many). Two chained per-user mins (the funnel skeleton), whole-
    second gaps, exact percentiles."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    lat = s1.join(s3, "user_id").select(
        (F.unix_timestamp("t3") - F.unix_timestamp("t1")).alias("lat_s")
    )
    return lat.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.percentile("lat_s", 0.5).alias("p50_s"),
        F.percentile("lat_s", 0.95).alias("p95_s"),
    )


@query(
    "q_orders_cohort_ltv",
    oracle="""
    WITH first_m AS (
      SELECT o_custkey, min(date_trunc('month', o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ),
    rev AS (
      SELECT f.cohort,
             CAST(date_diff('month', CAST(f.cohort AS DATE),
                            CAST(date_trunc('month', o.o_orderdate) AS DATE))
                  AS INT) AS m_offset,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4)))
                  AS DECIMAL(18,4)) AS rev
      FROM orders o JOIN first_m f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    )
    SELECT cohort, m_offset,
           CAST(rev AS DOUBLE) AS month_rev,
           CAST(CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY m_offset
                                    ROWS UNBOUNDED PRECEDING)
                     AS DECIMAL(18,4)) AS DOUBLE) AS cum_rev
    FROM rev
    """,
)
def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value table: customers grouped by first-order
    month; revenue per (cohort, month offset) with the running
    cumulative — the LTV curve finance reads off cohort rows. The
    cumulative window is PARTITIONED by cohort (lint-safe), revenue
    stays DECIMAL(18,4) until the final double casts."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    first_m = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort")
    )
    rev = (
        o.join(first_m, "o_custkey")
        .groupBy(
            "cohort",
            (
                (F.year("o_orderdate") - F.year("cohort")) * 12
                + (F.month("o_orderdate") - F.month("cohort"))
            )
            .cast("int")
            .alias("m_offset"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .alias("rev")
        )
    )
    w = (
        W.partitionBy("cohort")
        .orderBy("m_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return rev.select(
        "cohort",
        "m_offset",
        F.col("rev").cast("double").alias("month_rev"),
        F.sum("rev").over(w).cast("decimal(18,4)").cast("double").alias("cum_rev"),
    )


@query(
    "q_market_hhi",
    oracle="""
    WITH q AS (
      SELECT p.p_brand, l.l_suppkey,
             CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    m AS (
      SELECT p_brand,
             CAST(sum(qty * qty) AS BIGINT) AS sum_sq,
             CAST(sum(qty) AS BIGINT)       AS total,
             CAST(count(*) AS BIGINT)       AS n_suppliers
      FROM q GROUP BY p_brand
    )
    SELECT p_brand, n_suppliers,
           CAST(CAST(sum_sq AS DOUBLE)
                / (CAST(total AS DOUBLE) * total) AS DOUBLE) AS hhi
    FROM m
    """,
)
def q_market_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per brand market: HHI
    = Σ shareᵢ² over supplier quantity shares — the antitrust /
    supply-risk concentration metric. Float-sum-order is dodged
    ALGEBRAICALLY: Σ(qᵢ/T)² = Σqᵢ²/T², so both sums are exact BIGINT
    (l_quantity is integral — cast asserted by values) and the single
    division happens once per market in doubles. Two two-phase
    aggregates, dimension join broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"))
    )
    m = q.groupBy("p_brand").agg(
        F.sum(F.col("qty") * F.col("qty")).cast("bigint").alias("sum_sq"),
        F.sum("qty").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_suppliers"),
    )
    return m.select(
        "p_brand",
        "n_suppliers",
        (
            F.col("sum_sq").cast("double")
            / (F.col("total").cast("double") * F.col("total"))
        )
        .cast("double")
        .alias("hhi"),
    )


@query(
    "q_events_streaks",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    marked AS (
      SELECT user_id, d,
             CASE WHEN lag(d) OVER w IS NULL
                   OR date_diff('day', lag(d) OVER w, d) > 1
                  THEN 1 ELSE 0 END AS brk
      FROM ud WINDOW w AS (PARTITION BY user_id ORDER BY d)
    ),
    isl AS (
      SELECT user_id, d,
             sum(brk) OVER (PARTITION BY user_id ORDER BY d
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ),
    streaks AS (
      SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
      FROM isl GROUP BY user_id, island
    )
    SELECT user_id,
           max(len)                    AS longest_streak,
           CAST(count(*) AS BIGINT)    AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def q_events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (plus streak
    count) — the engagement-streak feature, i.e. gaps-and-islands on
    DATES: a break starts wherever the day gap exceeds 1, islands are
    the running break count, streak length is the island size. Every
    window shares the per-user partitioning; integer day arithmetic
    end-to-end."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    marked = ud.withColumn(
        "brk",
        F.when(
            F.lag("d").over(w).isNull()
            | (F.datediff(F.col("d"), F.lag("d").over(w)) > 1),
            1,
        ).otherwise(0),
    )
    isl = marked.withColumn("island", F.sum("brk").over(wc))
    streaks = isl.groupBy("user_id", "island").agg(
        F.count("*").cast("bigint").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count("*").cast("bigint").alias("n_streaks"),
    )


@query(
    "q_events_attribution",
    oracle="""
    WITH first_touch AS (
      SELECT user_id, event_type AS channel FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn = 1
    ),
    buyers AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    SELECT f.channel,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(b.user_id) AS BIGINT) AS n_buyers,
           CAST(CAST(count(b.user_id) AS DOUBLE) / count(*) AS DOUBLE)
             AS buy_rate
    FROM first_touch f LEFT JOIN buyers b ON f.user_id = b.user_id
    GROUP BY f.channel
    """,
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: users bucketed by the very first event
    type they ever produced (deterministic min_by over (ts, event_id))
    with each channel's eventual-buyer rate — the marketing-mix
    baseline. One min_by aggregate + one semi-ish left join; exact
    integer ratios."""
    ev = load_table(spark, sf_dir, "events")
    first_touch = ev.groupBy("user_id").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias("channel")
    )
    buyers = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
        .withColumn("__b", F.lit(1))
    )
    return (
        first_touch.join(buyers, "user_id", "left")
        .groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.count("__b").cast("bigint").alias("n_buyers"),
            (F.count("__b").cast("double") / F.count("*"))
            .cast("double")
            .alias("buy_rate"),
        )
    )


@query(
    "q_events_value_hist",
    oracle="""
    WITH b AS (
      SELECT min(value) AS vmin, max(value) AS vmax FROM events
    )
    SELECT event_type,
           CAST(floor(((value - vmin) * 10.0e0) / (vmax - vmin + 1.0e-9))
                AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM events CROSS JOIN b
    GROUP BY 1, 2
    """,
)
def q_events_value_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 10-bin value histogram per event type — the
    distribution sketch every dashboard draws first. Bin edges come
    from a broadcast 1-row (min, max) side; the bin expression is one
    per-row double tree written identically in both engines (with
    e-notation literals — the DECIMAL-literal trap), epsilon keeps the
    max value inside bin 9."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    bin_ = F.floor(
        ((F.col("value") - F.col("vmin")) * 10.0)
        / (F.col("vmax") - F.col("vmin") + 1.0e-9)
    ).cast("int")
    return (
        ev.crossJoin(F.broadcast(b))
        .groupBy("event_type", bin_.alias("bin"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )


@query(
    "q_events_type_corr",
    oracle="""
    WITH d AS (
      SELECT date_trunc('day', ts) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type AS t1, b.event_type AS t2,
             CAST(count(*) AS BIGINT)     AS nd,
             CAST(sum(a.n) AS BIGINT)     AS sx,
             CAST(sum(b.n) AS BIGINT)     AS sy,
             CAST(sum(a.n * b.n) AS BIGINT) AS sxy,
             CAST(sum(a.n * a.n) AS BIGINT) AS sxx,
             CAST(sum(b.n * b.n) AS BIGINT) AS syy
      FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT t1, t2, nd,
           CASE WHEN (nd * sxx - sx * sx) > 0 AND (nd * syy - sy * sy) > 0
                THEN CAST(CAST(nd * sxy - sx * sy AS DOUBLE)
                          / (sqrt(CAST(nd * sxx - sx * sx AS DOUBLE))
                             * sqrt(CAST(nd * syy - sy * sy AS DOUBLE)))
                     AS DOUBLE)
           END AS corr
    FROM p
    """,
)
def q_events_type_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-type correlation matrix over DAILY COUNTS (do clicks and
    purchases move together day-to-day?) — Pearson from five moments
    that are all INTEGER sums (counts are integers), so every operand
    of the one double expression is exact on both engines; sqrt is the
    only libm call (the safe one), and zero-variance pairs are CASE'd
    to NULL identically (the q_events_corr degenerate-group rule).
    Days joined per type-pair — the matrix is types², days fold into
    moments first."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("n"))
    a = d.select(F.col("day"), F.col("event_type").alias("t1"), F.col("n").alias("x"))
    b = d.select(F.col("day"), F.col("event_type").alias("t2"), F.col("n").alias("y"))
    p = (
        a.join(b, "day")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(
            F.count("*").cast("bigint").alias("nd"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        )
    )
    vx = F.col("nd") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("nd") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("nd") * F.col("sxy") - F.col("sx") * F.col("sy")
    corr = F.when(
        (vx > 0) & (vy > 0),
        (num.cast("double") / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))))
        .cast("double"),
    )
    return p.select("t1", "t2", "nd", corr.alias("corr"))


@query(
    "q_orders_abc",
    oracle="""
    WITH t AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS s
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT CAST(sum(s) AS DECIMAL(18,4)) AS st FROM t),
    r AS (
      SELECT o_custkey, s,
             CAST(CAST(sum(s) OVER (ORDER BY s DESC, o_custkey
                                    ROWS UNBOUNDED PRECEDING)
                       AS DECIMAL(18,4)) AS DOUBLE)
               / CAST(st AS DOUBLE) AS cshare
      FROM t CROSS JOIN tot
    ),
    cls AS (
      SELECT CASE WHEN cshare <= 0.8e0 THEN 'A'
                  WHEN cshare <= 0.95e0 THEN 'B'
                  ELSE 'C' END AS abc,
             s
      FROM r
    )
    SELECT abc,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(CAST(CAST(sum(s) AS DECIMAL(18,4)) AS DOUBLE)
                / (SELECT CAST(st AS DOUBLE) FROM tot) AS DOUBLE)
             AS revenue_share
    FROM cls GROUP BY abc
    """,
)
def q_orders_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory-style customer classification: A = customers
    inside the first 80% of cumulative revenue, B = to 95%, C = tail —
    the operational cut of the q_orders_pareto curve. Same
    ranked_prefix_sum machinery (no single-task window), class
    boundaries compared against the exact cumulative share, class
    revenue re-aggregated decimal-exactly."""
    from kafka_streams_clojure_spark.operators.order import ranked_prefix_sum

    o = load_table(spark, sf_dir, "orders")
    t = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("s")
    )
    tot = t.agg(F.sum("s").cast("decimal(18,4)").alias("st"))
    ranked = ranked_prefix_sum(
        t, order_by=[F.col("s").desc(), F.col("o_custkey")], value_col="s",
        idx_col="__rnk", cum_col="cum",
    ).crossJoin(F.broadcast(tot))
    cshare = F.col("cum").cast("decimal(18,4)").cast("double") / F.col("st").cast(
        "double"
    )
    cls = ranked.select(
        F.when(cshare <= 0.8, "A").when(cshare <= 0.95, "B").otherwise("C").alias(
            "abc"
        ),
        "s",
        "st",
    )
    return cls.groupBy("abc", "st").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        (
            F.sum("s").cast("decimal(18,4)").cast("double") / F.col("st").cast("double")
        ).cast("double").alias("revenue_share"),
    ).select("abc", "n_customers", "revenue_share")


@query(
    "q_events_retention_rate",
    oracle="""
    WITH first_day AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
      FROM first_day GROUP BY cohort_day
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
    ),
    m AS (
      SELECT f.cohort_day,
             CAST(date_diff('day', f.cohort_day, a.active_day) AS INT)
               AS day_offset,
             CAST(count(*) AS BIGINT) AS active_users
      FROM activity a JOIN first_day f ON a.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT CAST(m.cohort_day AS TIMESTAMP) AS cohort_day,
           m.day_offset, m.active_users, s.cohort_size,
           CAST(CAST(m.active_users AS DOUBLE) / s.cohort_size AS DOUBLE)
             AS retention_rate
    FROM m JOIN sizes s ON m.cohort_day = s.cohort_day
    """,
)
def q_events_retention_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention RATE curve: the q_events_retention matrix normalized
    by cohort size — the comparable-across-cohorts number product
    teams actually chart (day-0 row = 1.0 by construction). One extra
    tiny join against per-cohort sizes; exact integer ratios."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("active_day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("active_day").alias("cohort_day"))
    sizes = first_day.groupBy("cohort_day").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    m = (
        ev.distinct()
        .join(first_day, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("active_day"), F.col("cohort_day"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("active_users"))
    )
    return m.join(sizes, "cohort_day").select(
        F.col("cohort_day").cast("timestamp").alias("cohort_day"),
        "day_offset",
        "active_users",
        "cohort_size",
        (F.col("active_users").cast("double") / F.col("cohort_size"))
        .cast("double")
        .alias("retention_rate"),
    )


@query(
    "q_orders_repeat_rate",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT CASE WHEN n_orders >= 5 THEN 5 ELSE CAST(n_orders AS INT) END
             AS orders_bucket,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(n_orders) AS BIGINT) AS n_orders_total
    FROM per_cust GROUP BY 1
    """,
)
def q_orders_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-frequency distribution (1, 2, 3, 4, 5+ orders per
    customer) — the repeat-purchase table behind retention economics;
    the 1-bucket row over the total IS the one-and-done rate. Two tiny
    aggregates, integer everything."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_orders")
    )
    bucket = (
        F.when(F.col("n_orders") >= 5, F.lit(5))
        .otherwise(F.col("n_orders").cast("int"))
        .alias("orders_bucket")
    )
    return per_cust.groupBy(bucket).agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("n_orders").cast("bigint").alias("n_orders_total"),
    )


@query(
    "q_events_lifespan",
    oracle="""
    WITH span AS (
      SELECT user_id,
             CAST(date_diff('day', min(CAST(ts AS DATE)),
                            max(CAST(ts AS DATE))) AS BIGINT) AS days
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           quantile_cont(days, 0.5)  AS p50_days,
           quantile_cont(days, 0.95) AS p95_days,
           CAST(max(days) AS BIGINT) AS max_days
    FROM span
    """,
)
def q_events_lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User lifespan distribution: whole days between each user's first
    and last activity, p50/p95/max — the churn-horizon number retention
    models calibrate against. One per-user min/max aggregate, integer
    day gaps, exact percentiles."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
        .cast("bigint")
        .alias("days")
    )
    return span.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.percentile("days", 0.5).alias("p50_days"),
        F.percentile("days", 0.95).alias("p95_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )


# --- trend / experimentation / concentration wave -------------------------

@query(
    "q_events_trend_slope",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    m AS (SELECT event_type, min(day) AS day0 FROM d GROUP BY 1),
    xy AS (
      SELECT d.event_type,
             CAST(date_diff('day', m.day0, d.day) AS BIGINT) AS x, d.y
      FROM d JOIN m ON d.event_type = m.event_type
    ),
    mo AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT)    AS n,
             CAST(sum(x) AS BIGINT)      AS sx,
             CAST(sum(y) AS BIGINT)      AS sy,
             CAST(sum(x * y) AS BIGINT)  AS sxy,
             CAST(sum(x * x) AS BIGINT)  AS sxx
      FROM xy GROUP BY 1
    )
    SELECT event_type, n AS n_days,
           CASE WHEN n * sxx - sx * sx > 0 THEN
             CAST(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE)
           END AS slope,
           CASE WHEN n * sxx - sx * sx > 0 THEN
             CAST(CAST(sy * sxx - sx * sxy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE) AS DOUBLE)
           END AS intercept
    FROM mo
    """,
)
def q_events_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend line over DAILY COUNTS — is each event type
    growing or shrinking, and from what base? The q_events_pop_growth
    ratio says 'vs yesterday'; this fits the whole series. Both OLS
    closed forms are ratios of INTEGER moments (x = day index from the
    type's first active day, y = count), so the only floating step is
    one final division per coefficient — exact on both engines; the
    zero-variance (single-day) case is CASE'd to NULL identically.
    Scale: days fold into five integer moments per type map-side, the
    per-type min-day table is broadcast — shuffle ∝ types × days."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("y"))
    m = d.groupBy("event_type").agg(F.min("day").alias("day0"))
    xy = d.join(F.broadcast(m), "event_type").select(
        "event_type",
        F.datediff("day", "day0").cast("bigint").alias("x"),
        "y",
    )
    mo = xy.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        den > 0,
        ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
         / den.cast("double")).cast("double"),
    )
    intercept = F.when(
        den > 0,
        ((F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast("double")
         / den.cast("double")).cast("double"),
    )
    return mo.select(
        "event_type",
        F.col("n").alias("n_days"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


#: one shared final-expression text for the A/B z-score — the Spark
#: side runs the SAME string through selectExpr, so the two engines'
#: double trees cannot drift (the sql_keys.py discipline).
_AB_FINAL = """
    CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS cr_a,
    CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS cr_b,
    CASE WHEN na > 0 AND nb > 0
              AND (ca + cb) > 0 AND (ca + cb) < (na + nb) THEN
      CAST(
        (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
         - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
        / sqrt(
            (CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
            * (1e0 - CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
            * (1e0 / CAST(na AS DOUBLE) + 1e0 / CAST(nb AS DOUBLE))
          )
        AS DOUBLE)
    END AS z_score
"""


@query(
    "q_events_ab_test",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 2 AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT
        CAST(count(*) FILTER (WHERE variant = 0) AS BIGINT) AS na,
        CAST(sum(conv) FILTER (WHERE variant = 0) AS BIGINT) AS ca,
        CAST(count(*) FILTER (WHERE variant = 1) AS BIGINT) AS nb,
        CAST(sum(conv) FILTER (WHERE variant = 1) AS BIGINT) AS cb
      FROM u
    )
    SELECT na, ca, nb, cb, {_AB_FINAL}
    FROM s
    """,
)
def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment readout: users deterministically
    split A/B on an md5 bucket (the q_llm_hash_sample idiom — RNG-free,
    so assignment is reproducible and oracle-able), conversion = any
    purchase, and the pooled two-proportion z-score computed from four
    INTEGER counts. The z expression is ONE shared SQL string run
    through both engines (selectExpr here, oracle text there), sqrt is
    the safe libm call, and degenerate pools (0% or 100% conversion)
    are CASE'd to NULL identically. Scale: one user-keyed aggregate
    then a single 4-counter fold — the readout is map-side after the
    per-user shuffle."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    ).select(
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 2
        ).alias("variant"),
        "conv",
    )
    s = u.agg(
        F.count(F.when(F.col("variant") == 0, 1)).cast("bigint").alias("na"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv"))).cast("bigint").alias("ca"),
        F.count(F.when(F.col("variant") == 1, 1)).cast("bigint").alias("nb"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv"))).cast("bigint").alias("cb"),
    )
    return s.selectExpr("na", "ca", "nb", "cb", *_AB_FINAL.split(",\n"))


@query(
    "q_events_user_concentration",
    oracle="""
    WITH pu AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS nu
      FROM events GROUP BY 1, 2
    ),
    mo AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT)      AS n_users,
             CAST(sum(nu) AS BIGINT)       AS n_events,
             CAST(sum(nu * nu) AS BIGINT)  AS s2
      FROM pu GROUP BY 1
    )
    SELECT event_type, n_events, n_users,
           CAST(CAST(s2 AS DOUBLE) / CAST(n_events * n_events AS DOUBLE)
                AS DOUBLE) AS simpson,
           CAST(CAST(n_events * n_events AS DOUBLE) / CAST(s2 AS DOUBLE)
                AS DOUBLE) AS effective_users
    FROM mo
    """,
)
def q_events_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration of each event type over its users: the
    probability two random events of the type come from the SAME user,
    plus its inverse (the 'effective user count' — bot/whale detector:
    effective_users ≪ n_users means a few accounts drive the stream).
    The entropy-free diversity metric: Σnᵤ² and N are INTEGER sums, so
    unlike Shannon entropy (ln = banned libm) the index is exact on
    both engines with two final divisions. Scale: (type, user) fold
    map-side, then types×users rows collapse to three integer moments
    per type."""
    ev = load_table(spark, sf_dir, "events")
    pu = ev.groupBy("event_type", "user_id").agg(
        F.count("*").cast("bigint").alias("nu")
    )
    mo = pu.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("nu").cast("bigint").alias("n_events"),
        F.sum(F.col("nu") * F.col("nu")).cast("bigint").alias("s2"),
    )
    ne2 = (F.col("n_events") * F.col("n_events")).cast("double")
    return mo.select(
        "event_type",
        "n_events",
        "n_users",
        (F.col("s2").cast("double") / ne2).cast("double").alias("simpson"),
        (ne2 / F.col("s2").cast("double")).cast("double").alias("effective_users"),
    )


@query(
    "q_orders_open_interval",
    oracle="""
    WITH span AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS d0,
             CAST(max(l.l_shipdate) AS DATE) AS d1
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    )
    SELECT CAST(day AS TIMESTAMP) AS day, CAST(count(*) AS BIGINT) AS open_orders
    FROM (
      SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM span WHERE d1 >= d0
    )
    GROUP BY 1
    """,
)
def q_orders_open_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog curve: for every calendar day, how many
    orders were placed but not yet fully shipped — the interval-
    stabbing count, materialized by exploding each order's
    [orderdate, last-shipdate] span into day rows (the cover-set
    idiom from q_events_stickiness). Spark `sequence` and DuckDB
    `generate_series` are both inclusive; the d1 >= d0 filter guards
    the lo>hi error case on both engines. Scale: shuffle ∝ orders ×
    mean fulfillment lag (a small bounded multiplier — ship lags are
    weeks, not years), output bounded by the calendar span."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    span = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("d0"))
        .agg(F.max(F.to_date("l_shipdate")).alias("d1"))
        .filter(F.col("d1") >= F.col("d0"))
    )
    days = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
    ).select(F.col("d").cast("timestamp").alias("day"))
    return days.groupBy("day").agg(
        F.count("*").cast("bigint").alias("open_orders")
    )


def _ntile4(idx: str) -> str:
    """Closed-form ``ntile(4)`` over a unique global order, from a
    0-based global index and an in-plan total-count column ``__n`` —
    the q_win_ntile idiom (first ``n % 4`` buckets get one extra row),
    avoiding the single-task global-window sort the plan lint bans."""
    big = "(__n div 4 + 1)"
    return (
        f"CAST(CASE WHEN __n div 4 = 0 THEN {idx} + 1 "
        f"WHEN {idx} < (__n % 4) * {big} THEN {idx} div {big} + 1 "
        f"ELSE (__n % 4) + ({idx} - (__n % 4) * {big}) div (__n div 4) + 1 "
        f"END AS INT)"
    )


@query(
    "q_orders_rfm",
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                  AS DECIMAL(18,4)) AS mon,
             max(o_orderdate) AS lastd
      FROM orders GROUP BY 1
    ),
    mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
    r AS (
      SELECT o_custkey, freq, mon,
             CAST(date_diff('day', CAST(lastd AS DATE), CAST(maxd AS DATE))
                  AS BIGINT) AS rec_days
      FROM c CROSS JOIN mx
    ),
    s AS (
      SELECT CAST(ntile(4) OVER (ORDER BY rec_days, o_custkey)  AS INT) AS r_score,
             CAST(ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS INT) AS f_score,
             CAST(ntile(4) OVER (ORDER BY mon DESC, o_custkey)  AS INT) AS m_score,
             mon
      FROM r
    )
    SELECT r_score, f_score, m_score,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(CAST(sum(mon) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
    FROM s GROUP BY 1, 2, 3
    """,
)
def q_orders_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored 1-4 on Recency (days
    since last order, vs the corpus max date), Frequency (order count)
    and Monetary (decimal-exact revenue), then the 64-cell segment
    grid with sizes and revenue. Score 1 = best on every axis. Each
    quartile is the CLOSED-FORM ntile over a unique total order
    (value + o_custkey tiebreaker), computed with three
    `operators/order.global_index` passes — range partition + local
    index + broadcast prefix counts — so no axis ever sorts in a
    single task; the corpus max date and the customer count are
    broadcast 1-row folds. Scale: three range-shuffles of the
    CUSTOMER table (already aggregated — orders fold map-side), output
    bounded at 64 rows."""
    from kafka_streams_clojure_spark.operators.order import global_index

    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(18,4)")
        .alias("mon"),
        F.max("o_orderdate").alias("lastd"),
    )
    mx = o.agg(F.max("o_orderdate").alias("maxd"))
    r = c.crossJoin(F.broadcast(mx)).select(
        "o_custkey",
        "freq",
        "mon",
        F.datediff(F.to_date("maxd"), F.to_date("lastd"))
        .cast("bigint")
        .alias("rec_days"),
    )
    # project each consumed axis out after its ranking (§2.3): the
    # later range exchanges carry only the surviving columns
    d = global_index(
        r, [F.col("rec_days"), F.col("o_custkey")], idx_col="__ri"
    ).drop("rec_days")
    d = global_index(
        d, [F.col("freq").desc(), F.col("o_custkey")], idx_col="__fi"
    ).drop("freq")
    d = global_index(d, [F.col("mon").desc(), F.col("o_custkey")], idx_col="__mi")
    n = d.agg(F.count("*").alias("__n"))
    s = d.join(F.broadcast(n)).select(
        F.expr(_ntile4("__ri")).alias("r_score"),
        F.expr(_ntile4("__fi")).alias("f_score"),
        F.expr(_ntile4("__mi")).alias("m_score"),
        "mon",
    )
    return s.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("mon").cast("decimal(18,4)").cast("double").alias("revenue"),
    )


@query("q_events_stickiness_hll")
def q_events_stickiness_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness from MERGEABLE HLL SKETCHES — the 100 TB
    path for q_events_stickiness. The exact key's cover-set explodes
    every (user, day) pair onto 7 cover days (shuffle ∝ 7 × user-days);
    here each day folds its users into ONE fixed-size HLL sketch first
    (map-side partials merge, one user-day-keyed shuffle), and only the
    per-day sketches — KB each, days × 7 rows total — are exploded and
    union-merged for the trailing week. Sketch unions are exactly the
    'mergeable summaries' property that makes windowed COUNT DISTINCT
    feasible at scale; lgConfigK=14 holds the relative error near
    0.4% (1σ). Rows-only by design: HLL estimates are engine-specific
    (DuckDB's approx_count_distinct uses a different sketch) — the
    accuracy contract vs the exact key is pinned in
    tests/test_approx_aggregates.py::test_stickiness_hll_tracks_exact."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
    daily = ud.groupBy("day").agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("sk")
    )
    dau = daily.select(
        "day", F.hll_sketch_estimate("sk").cast("bigint").alias("dau")
    )
    cover = daily.select(
        F.explode(
            F.array(*[F.col("day") + F.expr(f"INTERVAL {i} DAYS") for i in range(7)])
        ).alias("day"),
        "sk",
    )
    wau = cover.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias("wau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau")).cast("double").alias("stickiness"),
    )


@query(
    "q_events_session_stats",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             sum(CASE WHEN prev_ts IS NULL
                       OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    ),
    sess AS (
      SELECT user_id, sid,
             CAST(count(*) AS BIGINT) AS n_events,
             (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS dur_s
      FROM s GROUP BY user_id, sid
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           quantile_cont(dur_s, 0.5)  AS p50_dur_s,
           quantile_cont(dur_s, 0.95) AS p95_dur_s,
           CAST(CAST(sum(n_events) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS avg_events
    FROM sess
    """,
)
def q_events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution: 30-minute-gap sessionization (the
    q_events_session_conversion idiom — lag + running sum of
    session-start markers, (ts, event_id) total order), then the
    engagement summary every product dashboard opens with: session
    count, p50/p95 session duration, mean events per session.
    Durations are exact INTEGER seconds (epoch-µs difference, integer
    division — never the rounding CAST(epoch(..)) trap), percentiles
    exact-interpolated over them, and the events-per-session mean is a
    ratio of two integers. Scale: everything up to the final fold is
    keyed by user_id — one shuffle, sessions collapse map-side into
    four moments."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.withColumn("prev_ts", F.lag("ts").over(wo)).withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | (F.col("ts") > F.col("prev_ts") + F.expr("INTERVAL 30 MINUTES")),
            1,
        ).otherwise(0),
    )
    s = marked.withColumn(
        "sid", F.sum("is_new").over(wo.rowsBetween(W.unboundedPreceding, 0))
    )
    sess = s.groupBy("user_id", "sid").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000").alias(
            "dur_s"
        ),
    )
    return sess.agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.percentile("dur_s", 0.5).alias("p50_dur_s"),
        F.percentile("dur_s", 0.95).alias("p95_dur_s"),
        (
            F.sum("n_events").cast("bigint").cast("double")
            / F.count("*").cast("double")
        ).alias("avg_events"),
    )


@query(
    "q_events_rolling_zscore",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id, ts, value,
             count(value) OVER w AS cnt,
             CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
               / count(value) OVER w AS mean_v,
             CAST(sum(CAST(value * value AS DECIMAL(18,4))) OVER w AS DOUBLE)
               / count(value) OVER w AS meansq
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
    ),
    s AS (
      SELECT event_id, user_id, ts, value, cnt,
             mean_v,
             sqrt(greatest(meansq - mean_v * mean_v, 0e0)) AS std_v
      FROM f WHERE cnt >= 10
    )
    SELECT event_id, user_id, value, mean_v,
           (value - mean_v) / std_v AS z
    FROM s
    WHERE std_v > 0 AND abs(value - mean_v) > 3 * std_v
    """,
)
def q_events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE anomaly detection: each event scored against its user's
    TRAILING 50-event baseline (frame excludes the current row — the
    'would we have flagged it as it arrived' semantics the global
    q_events_outliers can't give). Numeric discipline inside the
    frame: Σx and Σx² are decimal-cast window sums (the CLAUDE.md
    frame rule; x² is first computed as an identical per-row double
    product), variance is clipped at zero before sqrt and the
    degenerate-window /0 is filtered on BOTH engines (the
    q_events_corr guard), a 10-event warmup gate keeps early noise
    out. Scale: ONE user-keyed shuffle, balanced windows (users, not
    the 5-value event_type), no broadcast needed."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-50, -1)
    )
    cnt = F.count("value").over(w)
    mean_v = F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast(
        "double"
    ) / cnt
    meansq = F.sum(
        (F.col("value") * F.col("value")).cast("decimal(18,4)")
    ).over(w).cast("double") / cnt
    f = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        cnt.alias("cnt"),
        mean_v.alias("mean_v"),
        meansq.alias("meansq"),
    ).filter(F.col("cnt") >= 10)
    s = f.select(
        "event_id",
        "user_id",
        "value",
        "mean_v",
        F.sqrt(
            F.greatest(
                F.col("meansq") - F.col("mean_v") * F.col("mean_v"), F.lit(0.0)
            )
        ).alias("std_v"),
    )
    return (
        s.filter(
            (F.col("std_v") > 0)
            & (F.abs(F.col("value") - F.col("mean_v")) > F.lit(3) * F.col("std_v"))
        )
        .select(
            "event_id",
            "user_id",
            "value",
            "mean_v",
            ((F.col("value") - F.col("mean_v")) / F.col("std_v")).alias("z"),
        )
    )


@query(
    "q_graph_degree_dist",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    und AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY a)
    SELECT CASE WHEN a < 1000000 THEN 'customer' ELSE 'supplier' END AS side,
           d AS degree,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY 1, 2
    """,
)
def q_graph_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer↔supplier co-purchase graph
    (SAME edge definition as q_graph_pagerank/q_graph_bfs, so the
    graph family can't drift): count-of-counts per bipartite side —
    the first thing to look at before running anything iterative on a
    graph (hub detection, Pregel superstep cost estimation, skew-join
    planning). Two integer aggregations after the distinct edge
    shuffle; output bounded by the distinct degree values."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (F.col("l_suppkey") + 1000000).alias("b"),
        )
        .distinct()
    )
    und = e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy("a").agg(F.count("*").cast("bigint").alias("d"))
    return deg.groupBy(
        F.when(F.col("a") < 1000000, "customer")
        .otherwise("supplier")
        .alias("side"),
        F.col("d").alias("degree"),
    ).agg(F.count("*").cast("bigint").alias("n_nodes"))


@query(
    "q_orders_revenue_yoy",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY 1
    ),
    g AS (
      SELECT mon, revenue,
             lag(revenue) OVER (PARTITION BY month(mon) ORDER BY year(mon))
               AS prev_year
      FROM m
    )
    SELECT mon, revenue, prev_year,
           CASE WHEN prev_year > 0 THEN CAST(revenue / prev_year AS DOUBLE)
           END AS yoy_ratio
    FROM g
    """,
)
def q_orders_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with YEAR-OVER-YEAR ratio — the finance
    trendline that strips seasonality by comparing each month to the
    same month last year. The lag window is PARTITIONED BY
    calendar-month-of-year and ordered by year, so 'lag 12 over a
    global order' (an unpartitioned single-task window — lint-banned)
    becomes lag(1) inside 12 partitions, each holding one row per
    year of history. Revenue is decimal-exact before the one double
    ratio; zero/missing prior years are CASE'd to NULL identically."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue")
    )
    w = W.partitionBy(F.month("mon")).orderBy(F.year("mon"))
    g = m.withColumn("prev_year", F.lag("revenue").over(w))
    return g.select(
        "mon",
        "revenue",
        "prev_year",
        F.when(
            F.col("prev_year") > 0,
            (F.col("revenue") / F.col("prev_year")).cast("double"),
        ).alias("yoy_ratio"),
    )


@query(
    "q_events_bot_flags",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ),
    u AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             min(epoch_us(ts) - epoch_us(prev_ts)) AS min_gap_us
      FROM g GROUP BY user_id
    ),
    thr AS (SELECT quantile_cont(n_events, 0.95) AS p95_n FROM u)
    SELECT u.user_id, u.n_events, u.min_gap_us,
           u.n_events > thr.p95_n          AS high_volume,
           u.min_gap_us < 1000000          AS rapid_fire
    FROM u, thr
    WHERE u.n_events > thr.p95_n OR u.min_gap_us < 1000000
    """,
)
def q_events_bot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite bot/abuse detection: flag users that are HIGH-VOLUME
    (event count above the in-plan p95 of per-user counts) or
    RAPID-FIRE (any two consecutive events under 1 second apart) —
    the two cheapest behavioral tells, composed the way a trust &
    safety pipeline stacks them. Gaps are exact epoch-µs integers
    (lag per user), the p95 threshold is an exact interpolated
    percentile over integer counts broadcast as a 1-row side, and
    both flag booleans + the disjunctive filter are identical
    expressions on both engines. One user-keyed shuffle, then a
    user-count-sized aggregate."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select("user_id", "ts", "event_id").withColumn(
        "prev_ts", F.lag("ts").over(w)
    )
    u = g.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min(
            F.unix_micros("ts") - F.unix_micros("prev_ts")
        ).alias("min_gap_us"),
    )
    thr = u.agg(F.percentile("n_events", 0.95).alias("p95_n"))
    j = u.crossJoin(F.broadcast(thr))
    return j.filter(
        (F.col("n_events") > F.col("p95_n")) | (F.col("min_gap_us") < 1000000)
    ).select(
        "user_id",
        "n_events",
        "min_gap_us",
        (F.col("n_events") > F.col("p95_n")).alias("high_volume"),
        (F.col("min_gap_us") < 1000000).alias("rapid_fire"),
    )


@query(
    "q_events_new_vs_returning",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ),
    f AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id)
    SELECT ud.day,
           CAST(count(*) FILTER (WHERE ud.day = f.first_day) AS BIGINT)
             AS new_users,
           CAST(count(*) FILTER (WHERE ud.day > f.first_day) AS BIGINT)
             AS returning_users
    FROM ud JOIN f ON ud.user_id = f.user_id
    GROUP BY ud.day
    """,
)
def q_events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split NEW vs RETURNING (first-ever active
    day vs any later day) — the growth-accounting counterpart of the
    retention matrix: is today's DAU acquisition or habit? Two
    user-keyed aggregates and one self-join on user_id (the first-day
    table is users-sized); everything integer."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    f = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        ud.join(f, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.when(F.col("day") == F.col("first_day"), 1))
            .cast("bigint")
            .alias("new_users"),
            F.count(F.when(F.col("day") > F.col("first_day"), 1))
            .cast("bigint")
            .alias("returning_users"),
        )
    )


@query(
    "q_events_user_activity_dist",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    )
    SELECT CASE WHEN n < 2 THEN '001'       WHEN n < 4 THEN '002-3'
                WHEN n < 8 THEN '004-7'     WHEN n < 16 THEN '008-15'
                WHEN n < 32 THEN '016-31'   WHEN n < 64 THEN '032-63'
                WHEN n < 128 THEN '064-127' ELSE '128+' END AS band,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n) AS BIGINT)   AS n_events
    FROM u GROUP BY 1
    """,
)
def q_events_user_activity_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events-per-user distribution in power-of-two bands (the '1%
    rule' / whale-curve audit): how many users sit in each activity
    octave and how much of the event mass they carry — the
    count-of-counts view that sizes per-key state stores and predicts
    shuffle skew before any per-user operator runs. Pure integer CASE
    banding (log2 would be libm — the bands are explicit thresholds);
    one user-keyed fold, 8-row output."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(F.count("*").cast("bigint").alias("n"))
    band = (
        F.when(F.col("n") < 2, "001")
        .when(F.col("n") < 4, "002-3")
        .when(F.col("n") < 8, "004-7")
        .when(F.col("n") < 16, "008-15")
        .when(F.col("n") < 32, "016-31")
        .when(F.col("n") < 64, "032-63")
        .when(F.col("n") < 128, "064-127")
        .otherwise("128+")
    )
    return u.groupBy(band.alias("band")).agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("n_events"),
    )


@query(
    "q_graph_link_prediction",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    deg AS (SELECT s, CAST(count(*) AS BIGINT) AS d FROM e0 GROUP BY s),
    wedge AS (
      SELECT a.s AS s_a, b.s AS s_b, CAST(count(*) AS BIGINT) AS common
      FROM e0 a JOIN e0 b ON a.c = b.c AND a.s < b.s
      GROUP BY 1, 2 HAVING count(*) >= 5
    ),
    scored AS (
      SELECT w.s_a, w.s_b, w.common,
             CAST(w.common AS DOUBLE)
               / CAST(da.d + db.d - w.common AS DOUBLE) AS jaccard
      FROM wedge w JOIN deg da ON da.s = w.s_a JOIN deg db ON db.s = w.s_b
    )
    SELECT s_a, s_b, common, jaccard FROM scored
    ORDER BY jaccard DESC, s_a, s_b LIMIT 20
    """,
)
def q_graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite link prediction / co-supply similarity: the top-20
    supplier pairs by JACCARD over their shared-customer sets — the
    common-neighbor feature a recommender or substitution model
    ranks candidate links with (the graph-family sibling of
    q_basket_affinity's within-order lift). Jaccard is an exact
    integer ratio (common / (d_a + d_b − common)); a common ≥ 5
    support floor cuts coincidence pairs before scoring. Scale:
    the wedge join is ∝ Σ_customer d², bounded here because CUSTOMER
    degrees are small (suppliers-per-customer) — the mirror
    supplier-side wedge would be 13× larger (measured at sf0.1), the
    standard reason link prediction always wedges through the
    low-degree side; degree table broadcast, TakeOrderedAndProject
    for the top-20. A pathological hot hub (one customer touching a
    constant fraction of suppliers) would still be quadratic with no
    warning — operators/skew.hot_key_guard raises IN-PLAN if any
    customer degree exceeds 10k (r5 verdict #2)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    from kafka_streams_clojure_spark.operators._cache import persist_if_uncached
    from kafka_streams_clojure_spark.operators.skew import hot_key_guard

    e0 = persist_if_uncached(e0)
    deg = e0.groupBy("s").agg(F.count("*").cast("bigint").alias("d"))
    # r5 verdict #2: the wedge is ∝ Σ_c d² with NO natural bound on a
    # single hot customer — guard the hub degree in-plan (raise_error
    # at execution). One side only: the degree table scans every hub
    # regardless, so the b-side stays the bare persisted edge set.
    a_g = hot_key_guard(
        e0, ["c"], max_count=10_000, op_name="q_graph_link_prediction wedge"
    )
    a = a_g.select("c", F.col("s").alias("s_a"))
    b = e0.select("c", F.col("s").alias("s_b"))
    wedge = (
        a.join(b, "c")
        .filter(F.col("s_a") < F.col("s_b"))
        .groupBy("s_a", "s_b")
        .agg(F.count("*").cast("bigint").alias("common"))
        .filter(F.col("common") >= 5)
    )
    da = deg.select(F.col("s").alias("s_a"), F.col("d").alias("d_a"))
    db = deg.select(F.col("s").alias("s_b"), F.col("d").alias("d_b"))
    scored = (
        wedge.join(F.broadcast(da), "s_a")
        .join(F.broadcast(db), "s_b")
        .select(
            "s_a",
            "s_b",
            "common",
            (
                F.col("common").cast("double")
                / (F.col("d_a") + F.col("d_b") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
    )
    return scored.orderBy(
        F.col("jaccard").desc(), "s_a", "s_b"
    ).limit(20)


@query(
    "q_orders_segment_migration",
    oracle="""
    WITH b AS (
      SELECT (min(epoch_us(o_orderdate)) + max(epoch_us(o_orderdate))) // 2
               AS mid_us
      FROM orders
    ),
    c AS (
      SELECT o_custkey,
             CAST(count(*) FILTER (WHERE epoch_us(o_orderdate) <= b.mid_us)
                  AS BIGINT) AS n1,
             CAST(count(*) FILTER (WHERE epoch_us(o_orderdate) > b.mid_us)
                  AS BIGINT) AS n2
      FROM orders, b GROUP BY o_custkey, b.mid_us
    )
    SELECT CASE WHEN n1 = 0 THEN '0' WHEN n1 = 1 THEN '1'
                WHEN n1 < 4 THEN '2-3' ELSE '4+' END AS band_h1,
           CASE WHEN n2 = 0 THEN '0' WHEN n2 = 1 THEN '1'
                WHEN n2 < 4 THEN '2-3' ELSE '4+' END AS band_h2,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM c GROUP BY 1, 2
    """,
)
def q_orders_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment MIGRATION matrix: each customer's order-count
    band ('0'/'1'/'2-3'/'4+') in the first vs second half of the
    corpus timeline — who upgraded, who churned, who was acquired
    (the CRM flow the static RFM grid can't show). The period split
    is the exact integer epoch-µs midpoint folded in-plan as a 1-row
    broadcast; both halves count in ONE conditional customer-keyed
    aggregate (no per-period join), bands are explicit CASE
    thresholds, output ≤ 16 cells."""
    o = load_table(spark, sf_dir, "orders")
    b = o.agg(
        F.expr(
            "(min(unix_micros(CAST(o_orderdate AS TIMESTAMP))) + max(unix_micros(CAST(o_orderdate AS TIMESTAMP)))) div 2"
        ).alias("mid_us")
    )
    c = (
        o.crossJoin(F.broadcast(b))
        .groupBy("o_custkey", "mid_us")
        .agg(
            F.count(
                F.when(F.unix_micros(F.col("o_orderdate").cast("timestamp")) <= F.col("mid_us"), 1)
            )
            .cast("bigint")
            .alias("n1"),
            F.count(
                F.when(F.unix_micros(F.col("o_orderdate").cast("timestamp")) > F.col("mid_us"), 1)
            )
            .cast("bigint")
            .alias("n2"),
        )
    )

    def band(col: str) -> "F.Column":
        return (
            F.when(F.col(col) == 0, "0")
            .when(F.col(col) == 1, "1")
            .when(F.col(col) < 4, "2-3")
            .otherwise("4+")
        )

    return c.groupBy(
        band("n1").alias("band_h1"), band("n2").alias("band_h2")
    ).agg(F.count("*").cast("bigint").alias("n_customers"))


@query(
    "q_lineitem_return_rate",
    oracle="""
    SELECT date_trunc('month', l_shipdate) AS mon,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
             AS n_returned,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(coalesce(sum(CAST(l_extendedprice * (1 - l_discount)
                                  AS DECIMAL(18,4)))
                           FILTER (WHERE l_returnflag = 'R'),
                         0) AS DOUBLE) AS returned_revenue,
           CAST(CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
                AS DOUBLE) / count(*) AS return_line_rate
    FROM lineitem GROUP BY 1
    """,
)
def q_lineitem_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly RETURNS analysis: returned line share and returned
    revenue vs total (the commerce quality/fraud trendline built on
    l_returnflag — the column TPC-H Q1 aggregates but no dashboard
    key had surfaced over time). Discounted revenue is the identical
    per-row double product decimal-cast on both engines (the Q1
    discipline); the rate is an integer ratio. One month-keyed
    map-side-combined aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    is_r = F.col("l_returnflag") == "R"
    return li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("mon")
    ).agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.count(F.when(is_r, 1)).cast("bigint").alias("n_returned"),
        F.sum(rev).cast("double").alias("revenue"),
        F.coalesce(F.sum(F.when(is_r, rev)), F.lit(0))
        .cast("double")
        .alias("returned_revenue"),
        (
            F.count(F.when(is_r, 1)).cast("bigint").cast("double") / F.count("*")
        ).alias("return_line_rate"),
    )


@query(
    "q_util_date_spine",
    oracle="""
    WITH b AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS d0,
             CAST(max(o_orderdate) AS DATE) AS d1
      FROM orders
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(year(day) AS INT)       AS y,
           CAST(month(day) AS INT)      AS m,
           CAST(dayofweek(day) + 1 AS INT) AS dow,
           day = date_trunc('month', day)  AS is_month_start,
           dayofweek(day) IN (0, 6)        AS is_weekend
    FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM b)
    """,
)
def q_util_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar date-spine dimension spanning the fact timeline —
    the utility table every warehouse joins against to make
    zero-activity days visible (the q_sql_recursive_cte date spine,
    generated with sequence/generate_series instead of recursion).
    Carries the classic calendar attributes; note the DIALECT TRAP:
    DuckDB ``dayofweek`` is 0=Sunday vs Spark's 1=Sunday (shifted in
    the oracle — the q_events_seasonality rule), while
    weekend-ness is expressed per-dialect against the same days.
    Bounded by the calendar span; generated in-plan from a broadcast
    1-row min/max fold."""
    o = load_table(spark, sf_dir, "orders")
    b = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    days = (
        b.select(F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d"))
        .select(F.col("d").cast("timestamp").alias("day"), F.col("d"))
    )
    return days.select(
        "day",
        F.year("d").cast("int").alias("y"),
        F.month("d").cast("int").alias("m"),
        F.dayofweek("d").cast("int").alias("dow"),
        (F.col("day") == F.date_trunc("month", "day")).alias("is_month_start"),
        F.dayofweek("d").isin(1, 7).alias("is_weekend"),
    ).drop("d")


@query(
    "q_events_drift_chi2",
    oracle="""
    WITH b AS (
      SELECT min(value) AS mn, max(value) AS mx,
             (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid_us
      FROM events
    ),
    binned AS (
      SELECT event_type,
             least(CAST(floor((value - b.mn) * 10e0 / (b.mx - b.mn))
                        AS BIGINT), 9) AS bin,
             CASE WHEN epoch_us(ts) <= b.mid_us THEN 1 ELSE 0 END AS h1
      FROM events, b WHERE b.mx > b.mn
    ),
    c AS (
      SELECT event_type, bin,
             CAST(sum(h1) AS BIGINT)     AS n1,
             CAST(sum(1 - h1) AS BIGINT) AS n2
      FROM binned GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type,
             CAST(sum(n1) AS BIGINT) AS t1,
             CAST(sum(n2) AS BIGINT) AS t2
      FROM c GROUP BY 1
    ),
    terms AS (
      SELECT c.event_type,
             (CAST(c.n1 AS DOUBLE) / CAST(t.t1 AS DOUBLE)
              - CAST(c.n2 AS DOUBLE) / CAST(t.t2 AS DOUBLE))
             * (CAST(c.n1 AS DOUBLE) / CAST(t.t1 AS DOUBLE)
                - CAST(c.n2 AS DOUBLE) / CAST(t.t2 AS DOUBLE))
             / (CAST(c.n1 AS DOUBLE) / CAST(t.t1 AS DOUBLE)
                + CAST(c.n2 AS DOUBLE) / CAST(t.t2 AS DOUBLE)) AS term,
             t.t1, t.t2
      FROM c JOIN t USING (event_type)
      WHERE t.t1 > 0 AND t.t2 > 0 AND c.n1 + c.n2 > 0
    )
    SELECT event_type, t1, t2,
           CAST(sum(CAST(term AS DECIMAL(18,12))) AS DOUBLE) AS drift
    FROM terms GROUP BY event_type, t1, t2
    """,
)
def q_events_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution DRIFT test per event type: triangular
    discrimination Σ(p−q)²/(p+q) between the value histograms of the
    first and second half of the timeline — the PSI-style feature
    drift monitor, made libm-free (PSI's ln is banned on oracle
    paths; the triangular statistic is the standard χ²-family
    substitute and shares its 0 = identical / larger = drifted
    reading). Bin edges and the epoch-µs midpoint fold in-plan as a
    1-row broadcast; each term is a per-row double tree over integer
    ratios; the 10-term per-type sum is decimal-cast so partial-agg
    order can't reorder the doubles (terms ∈ [0,2] — DECIMAL(18,12)
    holds them exactly enough to be tie-free at measured data).
    One scan, one (type, bin) aggregate, 5-row output."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.expr(
            "(min(unix_micros(ts)) + max(unix_micros(ts))) div 2"
        ).alias("mid_us"),
    )
    binned = (
        ev.crossJoin(F.broadcast(b))
        .filter(F.col("mx") > F.col("mn"))
        .select(
            "event_type",
            F.least(
                F.floor(
                    (F.col("value") - F.col("mn"))
                    * F.lit(10.0)
                    / (F.col("mx") - F.col("mn"))
                ).cast("bigint"),
                F.lit(9).cast("bigint"),
            ).alias("bin"),
            F.when(
                F.unix_micros("ts") <= F.col("mid_us"), 1
            ).otherwise(0).alias("h1"),
        )
    )
    c = binned.groupBy("event_type", "bin").agg(
        F.sum("h1").cast("bigint").alias("n1"),
        F.sum(F.lit(1) - F.col("h1")).cast("bigint").alias("n2"),
    )
    t = c.groupBy("event_type").agg(
        F.sum("n1").cast("bigint").alias("t1"),
        F.sum("n2").cast("bigint").alias("t2"),
    )
    p = F.col("n1").cast("double") / F.col("t1").cast("double")
    q = F.col("n2").cast("double") / F.col("t2").cast("double")
    terms = (
        c.join(t, "event_type")
        .filter((F.col("t1") > 0) & (F.col("t2") > 0) & (F.col("n1") + F.col("n2") > 0))
        .select(
            "event_type",
            "t1",
            "t2",
            ((p - q) * (p - q) / (p + q)).alias("term"),
        )
    )
    return terms.groupBy("event_type", "t1", "t2").agg(
        F.sum(F.col("term").cast("decimal(18,12)")).cast("double").alias("drift")
    )


@query(
    "q_events_daily_dense",
    oracle="""
    WITH b AS (
      SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
      FROM events
    ),
    spine AS (
      SELECT CAST(day AS TIMESTAMP) AS day
      FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM b)
    ),
    c AS (
      SELECT date_trunc('day', ts) AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT spine.day,
           coalesce(c.n, 0)   AS n,
           coalesce(c.dau, 0) AS dau
    FROM spine LEFT JOIN c ON spine.day = c.day
    """,
)
def q_events_daily_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DENSE daily purchase series: the calendar spine LEFT JOINed to
    per-day aggregates with zero-fill — the difference between a
    trendline with holes (sparse GROUP BY output silently skips
    zero-activity days, breaking charts, window frames and
    day-over-day ratios) and one that is actually daily. Spine
    generated in-plan from the fact min/max (the q_util_date_spine
    machinery); the aggregate side is day-keyed and tiny, so the
    join broadcasts it back onto the bounded spine."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = b.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d")
    ).select(F.col("d").cast("timestamp").alias("day"))
    c = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("user_id").cast("bigint").alias("dau"),
        )
    )
    return spine.join(c, "day", "left").select(
        "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        F.coalesce(F.col("dau"), F.lit(0)).cast("bigint").alias("dau"),
    )


@query(
    "q_graph_assortativity",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    und AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY a),
    ed AS (
      SELECT da.d AS x, db.d AS y
      FROM und JOIN deg da ON da.a = und.a JOIN deg db ON db.a = und.b
    ),
    mo AS (
      SELECT CAST(count(*) AS BIGINT)    AS n,
             CAST(sum(x) AS BIGINT)      AS sx,
             CAST(sum(y) AS BIGINT)      AS sy,
             CAST(sum(x * y) AS BIGINT)  AS sxy,
             CAST(sum(x * x) AS BIGINT)  AS sxx,
             CAST(sum(y * y) AS BIGINT)  AS syy
      FROM ed
    )
    SELECT n AS n_directed_edges,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             CAST(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS DOUBLE)
           END AS assortativity
    FROM mo
    """,
)
def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree ASSORTATIVITY of the co-purchase graph (Newman 2002):
    Pearson correlation of endpoint degrees over every directed edge
    — do hubs attach to hubs (assortative, >0) or to leaves
    (disassortative, <0)? Negative values are the classic bipartite/
    hub-and-spoke signature, and the number feeds the same pre-flight
    audit as q_graph_degree_dist: it predicts whether hub-keyed
    skew compounds (hub↔hub edges concentrate shuffle mass) or
    spreads. Same shared edge definition as pagerank/bfs/degree_dist;
    all five moments are INTEGER sums (degrees are integers), one
    guarded double expression, 1-row output — the q_events_type_corr
    discipline on a graph."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (F.col("l_suppkey") + 1000000).alias("b"),
        )
        .distinct()
    )
    from kafka_streams_clojure_spark.operators._cache import persist_if_uncached

    und = persist_if_uncached(
        e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
    )
    deg = und.groupBy("a").agg(F.count("*").cast("bigint").alias("d"))
    da = deg.select(F.col("a").alias("_a"), F.col("d").alias("x"))
    db = deg.select(F.col("a").alias("_b"), F.col("d").alias("y"))
    ed = und.join(da, und.a == da._a).join(db, und.b == db._b).select("x", "y")
    mo = ed.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return mo.select(
        F.col("n").alias("n_directed_edges"),
        F.when(
            (vx > 0) & (vy > 0),
            (
                num.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
            ).cast("double"),
        ).alias("assortativity"),
    )


@query(
    "q_events_burstiness",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id))
               AS gap_us
      FROM events
    ),
    s AS (
      SELECT event_type, gap_us // 1000000 AS gap_s
      FROM g WHERE gap_us IS NOT NULL
    ),
    mo AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT)              AS n,
             CAST(sum(gap_s) AS BIGINT)            AS sg,
             CAST(sum(gap_s * gap_s) AS BIGINT)    AS sgg
      FROM s GROUP BY 1
    )
    SELECT event_type, n AS n_gaps,
           CAST(CAST(sg AS DOUBLE) / n AS DOUBLE) AS mean_gap_s,
           CASE WHEN n > 1
                 AND CAST(n AS HUGEINT) * sgg - CAST(sg AS HUGEINT) * sg >= 0
                 AND sg > 0 THEN
             CAST((sqrt(CAST(CAST(n AS HUGEINT) * sgg
                             - CAST(sg AS HUGEINT) * sg AS DOUBLE)) / n
                   - CAST(sg AS DOUBLE) / n)
                  / (sqrt(CAST(CAST(n AS HUGEINT) * sgg
                               - CAST(sg AS HUGEINT) * sg AS DOUBLE)) / n
                     + CAST(sg AS DOUBLE) / n) AS DOUBLE)
           END AS burstiness
    FROM mo
    """,
)
def q_events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BURSTINESS index B = (σ−μ)/(σ+μ) over per-user inter-event
    gaps, per event type (Goh & Barabási 2008): −1 = metronome, 0 =
    Poisson, →1 = heavy-tailed bursts — the temporal-pattern
    fingerprint that separates machine heartbeats from human
    activity, complementing q_events_burst's rate-spike view. Gaps
    are exact integer SECONDS (µs differences integer-divided — the
    squared sums stay far inside int64, which raw µs gaps would not),
    all three moments integer, σ via the safe sqrt of an integer
    expression, degenerate types CASE'd identically. One user-keyed
    lag window folding straight into per-type moments."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    s = g.select("event_type", F.expr("gap_us div 1000000").alias("gap_s"))
    mo = s.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("gap_s").cast("bigint").alias("sg"),
        F.sum(F.col("gap_s") * F.col("gap_s")).cast("bigint").alias("sgg"),
    )
    # n*sgg reaches ~4e20 at sf0.1 — int64 overflows (ANSI error), so
    # the moment products widen to DECIMAL(38,0) (DuckDB side: HUGEINT);
    # both are exact integers, so the one double conversion still matches
    n_d = F.col("n").cast("decimal(20,0)")
    var_n2 = (
        n_d * F.col("sgg").cast("decimal(20,0)")
        - F.col("sg").cast("decimal(20,0)") * F.col("sg").cast("decimal(20,0)")
    )
    sigma = F.sqrt(var_n2.cast("double")) / F.col("n")
    mu = F.col("sg").cast("double") / F.col("n")
    return mo.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        mu.cast("double").alias("mean_gap_s"),
        F.when(
            (F.col("n") > 1) & (var_n2 >= 0) & (F.col("sg") > 0),
            ((sigma - mu) / (sigma + mu)).cast("double"),
        ).alias("burstiness"),
    )


@query(
    "q_events_autocorr",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type, a.y AS x, b.y AS y
      FROM d a JOIN d b
        ON a.event_type = b.event_type AND b.day = a.day + INTERVAL 1 DAY
    ),
    mo AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT)   AS n,
             CAST(sum(x) AS BIGINT)     AS sx,
             CAST(sum(y) AS BIGINT)     AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM p GROUP BY 1
    )
    SELECT event_type, n AS n_pairs,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
             CAST(CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS DOUBLE)
           END AS r1
    FROM mo
    """,
)
def q_events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 AUTOCORRELATION of each type's daily count series — the
    momentum/mean-reversion diagnostic that completes the time-series
    family (trend = level drift, changepoint = structural break,
    burstiness = micro-gaps; this is day-to-day persistence, and the
    thing to check before trusting any day-over-day alert: high r1
    means yesterday already predicts today). Consecutive days pair by
    a +1-day self-join (missing days simply form no pair — identical
    semantics both engines), then the q_events_type_corr integer-
    moment Pearson. Counts stay far inside int64 (daily counts, not
    second-gaps — the burstiness overflow lesson doesn't bite)."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("bigint").alias("y"))
    a = d.select("event_type", "day", F.col("y").alias("x"))
    b = d.select(
        "event_type",
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("y"),
    )
    p = a.join(b, ["event_type", "day"])
    mo = p.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return mo.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        F.when(
            (vx > 0) & (vy > 0),
            (
                num.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
            ).cast("double"),
        ).alias("r1"),
    )


_PPR_ITERS = 4
_PPR_SEED = 1  # customer 1 — present in the graph at every fixture SF


def _ppr_sql(iters: int, unit: int, dn: int, dd: int, seed: int) -> str:
    """Unrolled PERSONALIZED power iteration (the _pagerank_sql idiom,
    sparse): level k holds only vertices reached within k hops of the
    seed (absent = zero mass), restart mass re-enters at the seed each
    level."""
    restart = ((dd - dn) * unit) // dd
    sep = ",\n    "
    levels = []
    for i in range(1, iters + 1):
        levels.append(
            f"""r{i} AS (
      SELECT id, CAST(sum(v) AS BIGINT) AS r FROM (
        SELECT und.b AS id, ({dn} * r{i - 1}.r) // ({dd} * deg.d) AS v
        FROM und JOIN r{i - 1} ON und.a = r{i - 1}.id JOIN deg ON deg.a = und.a
        UNION ALL SELECT CAST({seed} AS BIGINT), CAST({restart} AS BIGINT)
      ) GROUP BY id
    )"""
        )
    return f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey AS a, l_suppkey + 1000000 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    und AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
    deg AS (SELECT a, count(*) AS d FROM und GROUP BY a),
    r0 AS (SELECT CAST({seed} AS BIGINT) AS id, CAST({unit} AS BIGINT) AS r),
    {sep.join(levels)}
    SELECT id, r AS rank FROM r{iters}
    """


@query(
    "q_graph_ppr",
    oracle=_ppr_sql(_PPR_ITERS, 10**12, 85, 100, _PPR_SEED),
)
def q_graph_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank from customer 1 over the co-purchase
    graph (operators/graph.personalized_pagerank): proximity-to-seed
    ranking — the 'related to THIS node' query behind recommenders
    and fraud blast-radius scoring, vs the global q_graph_pagerank.
    Integer micro-unit masses and DIV-only updates keep every level
    bit-identical across engines; the rank vector is SPARSE (absent
    vertex = 0), so each round's join touches only the seed's k-hop
    frontier — on a 100 TB graph the computation stays local to the
    seed's neighborhood instead of materializing a global vector."""
    from kafka_streams_clojure_spark.operators.graph import personalized_pagerank

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (F.col("l_suppkey") + 1000000).alias("b"),
        )
        .distinct()
    )
    return personalized_pagerank(
        e0, seed=_PPR_SEED, src="a", dst="b", iters=_PPR_ITERS
    )


@query(
    "q_orders_card",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                       AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT)      AS n_customers,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                AS DOUBLE)                                AS revenue,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                / count(*) AS DOUBLE)                     AS aov,
           min(o_orderdate)                               AS first_order,
           max(o_orderdate)                               AS last_order
    FROM orders
    """,
)
def q_orders_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The commerce-side one-row summary card (the q_llm_dataset_card
    twin for the fact side): order and customer counts, decimal-exact
    revenue, average order value, and the covered date span — the
    header block of every revenue dashboard, in ONE scan."""
    o = load_table(spark, sf_dir, "orders")
    rev = F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
    return o.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        rev.cast("double").alias("revenue"),
        (rev.cast("double") / F.count("*")).cast("double").alias("aov"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@query(
    "q_events_card",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                  AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT)   AS n_users,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                / count(value) AS DOUBLE)            AS mean_value,
           min(ts)                                   AS first_event,
           max(ts)                                   AS last_event
    FROM events
    """,
)
def q_events_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events-side one-row summary card (third of the card family
    with q_llm_dataset_card and q_orders_card): event/user/type
    counts, the decimal-exact mean value, and the covered time span —
    one scan, the header every product dashboard opens with."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        (
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double")
            / F.count("value")
        ).cast("double").alias("mean_value"),
        F.min("ts").alias("first_event"),
        F.max("ts").alias("last_event"),
    )


@query(
    "q_events_trimmed_stats",
    oracle="""
    WITH q AS (
      SELECT event_type,
             quantile_cont(value, 0.05e0) AS p05,
             quantile_cont(value, 0.95e0) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, q.p05, q.p95,
           CAST(count(*) FILTER (WHERE e.value < q.p05) AS BIGINT) AS n_below,
           CAST(count(*) FILTER (WHERE e.value > q.p95) AS BIGINT) AS n_above,
           CAST(CAST(sum(CAST(e.value AS DECIMAL(18,4)))
                     FILTER (WHERE e.value >= q.p05 AND e.value <= q.p95)
                AS DOUBLE)
              / count(*) FILTER (WHERE e.value >= q.p05 AND e.value <= q.p95)
              AS DOUBLE) AS trimmed_mean
    FROM events e JOIN q USING (event_type)
    GROUP BY e.event_type, q.p05, q.p95
    """,
)
def q_events_trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust per-type value stats: exact interpolated
    p05/p95 fences (the q_agg_percentile parity contract) and the
    TRIMMED mean of the in-band values — the robust-location number a
    metrics pipeline alerts on when heavy tails make the plain mean
    useless. Cross-engine discipline: the fences stay DOUBLE end to
    end (comparisons against them are exact either way); only the
    ORIGINAL values — fixture-bounded decimals — take the one
    decimal(18,4) cast for the order-independent sum (never the
    derived fence doubles, whose 4-decimal rounding could tie). Two
    aggregates keyed by event_type (≤ handfuls of groups): the fence
    table rides back as a broadcast join, the trim is a conditional
    aggregate, no second scan shape beyond it."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
    )
    j = ev.join(F.broadcast(q), "event_type")
    inb = (F.col("value") >= F.col("p05")) & (F.col("value") <= F.col("p95"))
    return j.groupBy("event_type", "p05", "p95").agg(
        F.count(F.when(F.col("value") < F.col("p05"), 1))
        .cast("bigint")
        .alias("n_below"),
        F.count(F.when(F.col("value") > F.col("p95"), 1))
        .cast("bigint")
        .alias("n_above"),
        (
            F.sum(F.when(inb, F.col("value").cast("decimal(18,4)"))).cast("double")
            / F.count(F.when(inb, 1))
        )
        .cast("double")
        .alias("trimmed_mean"),
    )


@query(
    "q_orders_priority_transitions",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority AS prio,
             lag(o_orderpriority) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS prev_prio
      FROM orders
    )
    SELECT prev_prio, prio, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_prio IS NOT NULL
    GROUP BY prev_prio, prio
    """,
)
def q_orders_priority_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov TRANSITION counts over each customer's
    order-priority sequence — the behavioral-drift matrix (who moves
    from low- to high-priority ordering and back) that feeds churn
    and upgrade models; the orders-side sibling of
    q_events_transitions. One customer-keyed window (unique
    (o_orderdate, o_orderkey) tiebreak — the CLAUDE.md ordered-lag
    rule), then a ≤25-cell rollup; at 100 TB the shuffle is customer-
    keyed and the matrix is a constant-size reduce."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.lag("o_orderpriority").over(w).alias("prev_prio"),
    )
    return (
        seq.filter(F.col("prev_prio").isNotNull())
        .groupBy("prev_prio", "prio")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


@query(
    "q_orders_supplier_hhi",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) * 10000 AS BIGINT) AS r4
      FROM lineitem GROUP BY l_suppkey
    ),
    byn AS (
      SELECT n.n_name,
             CAST(count(*) AS BIGINT) AS n_suppliers,
             sum(CAST(r4 AS HUGEINT)) AS tot,
             sum(CAST(r4 AS HUGEINT) * r4) AS sumsq
      FROM rev
      JOIN supplier s ON s.s_suppkey = rev.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, n_suppliers,
           CAST(CAST(sumsq AS DOUBLE) / CAST(tot * tot AS DOUBLE)
                AS DOUBLE) AS hhi,
           CAST(CAST(tot * tot AS DOUBLE) / CAST(sumsq AS DOUBLE)
                AS DOUBLE) AS eff_suppliers
    FROM byn
    """,
)
def q_orders_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-market CONCENTRATION per nation: the Herfindahl-
    Hirschman index Σ share² over each supplier's revenue share, plus
    its reciprocal (effective number of equal-size suppliers) — the
    supply-chain-risk metric a buyer runs before a nation's market
    consolidates under one vendor; the REVENUE-weighted, per-NATION
    sibling of `q_market_hhi` (per-brand QUANTITY shares — integer
    quantities let that key stay in plain BIGINT; money here forces
    the decimal machinery below). HHI is the one concentration
    measure that needs NO libm (squares and one division, vs entropy's
    banned ln). Exactness discipline (the q_events_burstiness
    DECIMAL(38,0)/HUGEINT precedent): per-supplier revenue takes the
    standing one decimal(18,4) cast, is scaled to integer
    ten-thousandths, and both Σr² (≈3e22-digit products — int64
    overflows, so the products widen to decimal/HUGEINT) and (Σr)²
    stay exact integers until ONE double conversion each side of a
    single division. Plan: one lineitem shuffle keyed by supplier,
    dimension joins broadcast, ≤|nation| output rows."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("rev")
        )
        .select(
            "l_suppkey", (F.col("rev") * 10000).cast("bigint").alias("r4")
        )
    )
    j = rev.join(
        F.broadcast(sup.select("s_suppkey", "s_nationkey")),
        rev.l_suppkey == F.col("s_suppkey"),
    ).join(
        F.broadcast(nat.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    r4d = F.col("r4").cast("decimal(20,0)")
    byn = j.groupBy("n_name").agg(
        F.count("*").cast("bigint").alias("n_suppliers"),
        # widen BEFORE summing (mirrors the oracle's sum(CAST(r4 AS
        # HUGEINT))): a BIGINT accumulation of ×10^4-scaled revenue
        # overflows int64 near the 100 TB design point
        F.sum(F.col("r4").cast("decimal(38,0)")).alias("tot"),
        F.sum(r4d * r4d).alias("sumsq"),
    )
    tot2 = (F.col("tot") * F.col("tot")).cast("double")
    return byn.select(
        "n_name",
        "n_suppliers",
        (F.col("sumsq").cast("double") / tot2).cast("double").alias("hhi"),
        (tot2 / F.col("sumsq").cast("double")).cast("double").alias("eff_suppliers"),
    )


@query(
    "q_orders_gini",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 10000
                  AS BIGINT) AS r4
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT n.n_name, r4,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY r4, rev.o_custkey) AS i
      FROM rev
      JOIN customer c ON c.c_custkey = rev.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    m AS (
      SELECT n_name,
             CAST(count(*) AS BIGINT) AS n_customers,
             sum(CAST(r4 AS HUGEINT)) AS tot,
             sum(CAST(i AS HUGEINT) * r4) AS wsum
      FROM ranked GROUP BY n_name
    )
    SELECT n_name, n_customers,
           CASE WHEN tot > 0 THEN
             CAST(CAST(2 * wsum - (n_customers + 1) * tot AS DOUBLE)
                  / CAST(n_customers * tot AS DOUBLE) AS DOUBLE)
           END AS gini
    FROM m
    """,
)
def q_orders_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue INEQUALITY per nation: the Gini coefficient of customer
    order totals (0 = every customer equal, →1 = one whale) — the
    whale-dependence metric that complements q_orders_supplier_hhi's
    squared-share view with the rank-weighted one: G = (2·Σ i·x₍ᵢ₎ −
    (n+1)·Σx) / (n·Σx) over ascending-rank revenues. Exactness:
    revenue takes the standing decimal(18,4) cast and scales to
    integer ten-thousandths; ranks are (r4, custkey)-tiebroken (the
    ordered-rank rule); every moment (rank-weighted sum included)
    stays an exact integer in DECIMAL(38,0)/HUGEINT until the single
    double division; zero-revenue nations CASE to NULL identically.
    Plan: one customer-keyed revenue shuffle, broadcast dimension
    joins, nation-PARTITIONED rank windows (never a single-task global
    sort), ≤|nation| output rows."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev")
        )
        .select("o_custkey", (F.col("rev") * 10000).cast("bigint").alias("r4"))
    )
    j = rev.join(
        F.broadcast(cust.select("c_custkey", "c_nationkey")),
        rev.o_custkey == F.col("c_custkey"),
    ).join(
        F.broadcast(nat.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    w = Window.partitionBy("n_name").orderBy("r4", "o_custkey")
    ranked = j.select(
        "n_name", "r4", F.row_number().over(w).cast("bigint").alias("i")
    )
    m = ranked.groupBy("n_name").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        # widen BEFORE summing (= oracle's sum(CAST(r4 AS HUGEINT)));
        # BIGINT accumulation overflows int64 at the 100 TB posture
        F.sum(F.col("r4").cast("decimal(38,0)")).alias("tot"),
        F.sum(F.col("i").cast("decimal(20,0)") * F.col("r4").cast("decimal(20,0)")).alias(
            "wsum"
        ),
    )
    num = (
        F.lit(2).cast("decimal(20,0)") * F.col("wsum")
        - (F.col("n_customers") + 1).cast("decimal(20,0)") * F.col("tot")
    )
    den = F.col("n_customers").cast("decimal(20,0)") * F.col("tot")
    return m.select(
        "n_name",
        "n_customers",
        F.when(F.col("tot") > 0, (num.cast("double") / den.cast("double")))
        .cast("double")
        .alias("gini"),
    )


@query(
    "q_events_rolling_dau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    cover AS (
      SELECT ud.user_id, days.d AS wday
      FROM ud
      JOIN days ON days.d BETWEEN ud.d AND ud.d + INTERVAL 6 DAY
    ),
    wau AS (
      SELECT wday, CAST(count(DISTINCT user_id) AS BIGINT) AS wau_7
      FROM cover GROUP BY wday
    ),
    dau AS (
      SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau FROM ud GROUP BY d
    )
    SELECT CAST(dau.d AS TIMESTAMP) AS day, dau.dau, wau.wau_7,
           CAST(CAST(dau.dau AS DOUBLE) / wau.wau_7 AS DOUBLE) AS stickiness
    FROM dau JOIN wau ON wau.wday = dau.d
    """,
)
def q_events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day active users per day (DAU, WAU-7, and the
    DAU/WAU stickiness ratio) — the exact twin of
    q_events_stickiness_hll's mergeable-sketch estimate, kept so the
    sketch's error is auditable against ground truth at any fixture
    scale. The sliding distinct is made exact WITHOUT a 7-day window
    re-scan: each (user, active-day) pair is exploded onto the ≤7
    observed window-end days it covers (bounded ×7 fan-out, an
    equi-join against the observed-day spine — no cross join, no range
    re-scan), then one exact count-distinct per window day. Integer
    counts, one exact int/int division; days CAST to TIMESTAMP on both
    engines (the DATE-dtype harness trap). Shuffles are keyed by day —
    ≤ a few thousand groups at any corpus size — and the explode bound
    (×7) is constant, so the plan is linear in activity rows."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    days = ud.select(F.col("d").alias("wday")).distinct()
    cover = ud.select(
        "user_id", F.explode(F.expr("sequence(d, d + interval 6 day)")).alias("wday")
    ).join(days, "wday")
    wau = cover.groupBy("wday").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau_7")
    )
    dau = ud.groupBy("d").agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    return (
        dau.join(wau, dau.d == F.col("wday"))
        .select(
            F.col("d").cast("timestamp").alias("day"),
            "dau",
            "wau_7",
            (F.col("dau").cast("double") / F.col("wau_7"))
            .cast("double")
            .alias("stickiness"),
        )
    )


@query(
    "q_orders_basket_jaccard",
    oracle="""
    WITH ip AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    sz AS (SELECT o, CAST(count(*) AS BIGINT) AS s FROM ip GROUP BY o),
    inter AS (
      SELECT a.o AS o_a, b.o AS o_b, CAST(count(*) AS BIGINT) AS n_inter
      FROM ip a JOIN ip b ON a.p = b.p AND a.o < b.o
      GROUP BY 1, 2
    )
    SELECT o_a, o_b, n_inter,
           CAST(CAST(n_inter AS DOUBLE) / (sa.s + sb.s - n_inter)
                AS DOUBLE) AS jaccard
    FROM inter
    JOIN sz sa ON sa.o = o_a
    JOIN sz sb ON sb.o = o_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.s + sb.s - n_inter) >= 0.5
    """,
)
def q_orders_basket_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-SIMILARITY self-join between ORDERS (baskets as part sets,
    Jaccard ≥ 0.5) — the transactional face of the text near-dup
    machinery: near-identical baskets flag reorder automation, split
    shipments, and fraud rings the per-pair lift view
    (q_basket_affinity) can't see. Candidates come ONLY from the
    shared-part equi-join — cost ∝ Σ_part freq², never orders² (the
    shingle-join argument verbatim; measured Σfreq² ≈ 18.6M at sf0.1
    with max part-freq 53) — and the part key is exactly the hot-key
    risk the in-plan guard exists for: a promo part in every basket
    would go quadratic, so operators/skew.hot_key_guard trips at 10k.
    Jaccard is the one exact integer division both engines share;
    counts integer end to end."""
    from kafka_streams_clojure_spark.operators.skew import hot_key_guard

    li = load_table(spark, sf_dir, "lineitem")
    ip = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    from kafka_streams_clojure_spark.operators._cache import persist_if_uncached

    ip = persist_if_uncached(ip)
    sz = ip.groupBy("o").agg(F.count("*").cast("bigint").alias("s"))
    # broadcast=False: the degree table has one row per distinct PART —
    # cardinality grows with SF, so at the 100 TB posture it is not
    # broadcast-small; the shuffled join-back lands on the same part
    # partitioning the candidate self-join needs anyway
    a_g = hot_key_guard(
        ip,
        ["p"],
        max_count=10_000,
        op_name="q_orders_basket_jaccard part",
        broadcast=False,
    )
    a = a_g.select(F.col("o").alias("o_a"), "p")
    b = ip.select(F.col("o").alias("o_b"), "p")
    inter = (
        a.join(b, "p")
        .filter(F.col("o_a") < F.col("o_b"))
        .groupBy("o_a", "o_b")
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    sa = sz.select(F.col("o").alias("o_a"), F.col("s").alias("s_a"))
    sb = sz.select(F.col("o").alias("o_b"), F.col("s").alias("s_b"))
    j = F.col("n_inter").cast("double") / (
        F.col("s_a") + F.col("s_b") - F.col("n_inter")
    )
    return (
        inter.join(sa, "o_a")
        .join(sb, "o_b")
        .filter(j >= 0.5)
        .select("o_a", "o_b", "n_inter", j.cast("double").alias("jaccard"))
    )


@query(
    "q_events_naive_forecast_mae",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT cur.event_type, cur.n AS actual, prev.n AS forecast
      FROM d cur JOIN d prev
        ON prev.event_type = cur.event_type
       AND prev.day = cur.day - INTERVAL 7 DAY
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs(actual - forecast)) AS BIGINT) AS abs_err_sum,
           CAST(CAST(sum(abs(actual - forecast)) AS DOUBLE) / count(*)
                AS DOUBLE) AS mae,
           CAST(CAST(sum(abs(actual - forecast)) AS DOUBLE) / sum(actual)
                AS DOUBLE) AS wape
    FROM j GROUP BY event_type
    """,
)
def q_events_naive_forecast_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST-BASELINE backtest: the seasonal-naive forecast (each
    day's event count predicted by the same weekday one week earlier)
    scored per event type with MAE and WAPE — the floor every real
    forecasting model must beat, and the number that tells a capacity
    planner how regular each stream's weekly cycle actually is
    (complements q_events_seasonality's profile with an error metric).
    Counts and absolute errors are integers end to end (sum |a−f| is
    an exact BIGINT), so both scores are single exact-integer
    divisions. Plan: one (type, day) rollup — dimension-sized — then a
    self-join on a 7-day key shift; shuffles keyed by (type, day) at
    any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    cur = d.select("event_type", "day", F.col("n").alias("actual"))
    prev = d.select(
        "event_type",
        F.expr("day + interval 7 day").alias("day"),
        F.col("n").alias("forecast"),
    )
    j = cur.join(prev, ["event_type", "day"])
    abs_err = F.abs(F.col("actual") - F.col("forecast"))
    return j.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum(abs_err).cast("bigint").alias("abs_err_sum"),
        (F.sum(abs_err).cast("double") / F.count("*")).cast("double").alias("mae"),
        (F.sum(abs_err).cast("double") / F.sum("actual"))
        .cast("double")
        .alias("wape"),
    )


@query(
    "q_events_audience_overlap",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS s FROM ut GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both, sa.s AS n_a, sb.s AS n_b,
           CAST(CAST(n_both AS DOUBLE) / (sa.s + sb.s - n_both)
                AS DOUBLE) AS jaccard,
           CAST(CAST(n_both AS DOUBLE) / least(sa.s, sb.s)
                AS DOUBLE) AS containment
    FROM inter
    JOIN sz sa ON sa.event_type = type_a
    JOIN sz sb ON sb.event_type = type_b
    """,
)
def q_events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIENCE-OVERLAP matrix between event types: for every type
    pair, the users doing both, the Jaccard of the two audiences, and
    the containment (overlap ÷ smaller audience — the "is B's audience
    a subset of A's" number product analytics actually asks). The
    within-user self-join is bounded by types-per-user² (≤ |types|²,
    a constant), so cost is linear in users — the basket-Jaccard
    argument with a constant-size basket. Integer counts, two exact
    single divisions; output ≤ C(|types|,2) rows at any scale."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sz = ut.groupBy("event_type").agg(F.count("*").cast("bigint").alias("s"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("s").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("s").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            )
            .cast("double")
            .alias("jaccard"),
            (F.col("n_both").cast("double") / F.least("n_a", "n_b"))
            .cast("double")
            .alias("containment"),
        )
    )


@query(
    "q_orders_discount_profile",
    oracle=f"""
    SELECT CAST(round(l_discount * 100) AS BIGINT) AS discount_pct,
           CAST(count(*) AS BIGINT) AS n_lines,
           {sql_dsum('l_quantity')} AS total_qty,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           {sql_dsum('l_extendedprice * l_discount')} AS discount_cost
    FROM lineitem GROUP BY 1
    """,
)
def q_orders_discount_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCOUNT-band demand profile: per discount percentage, line
    volume, average quantity, realized revenue, and the money the
    discount gave away — the table a pricing analyst reads to see
    whether deeper discounts actually move more units (TPC-H Q6's
    what-if extended into the full elasticity view). Discount bands
    are integers (discounts are exact hundredths, so ×100 never lands
    near a rounding tie); every money/quantity aggregate rides the
    standing decimal-cast helpers on both engines. One map-side-
    combined rollup over ≤ ~11 bands at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem")
    band = F.round(F.col("l_discount") * 100).cast("bigint").alias("discount_pct")
    return li.groupBy(band).agg(
        F.count("*").cast("bigint").alias("n_lines"),
        dsum("l_quantity").alias("total_qty"),
        davg("l_quantity").alias("avg_qty"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("discount_cost"),
    )


#: CUPED readout expressions — ONE shared SQL text through both engines
#: (the q_events_ab_test discipline): theta and every adjusted mean are
#: pure double trees over exact int64 moments, so the readout is
#: bit-identical. Degenerate var(x)=0 CASE'd to NULL on both sides.
_CUPED_THETA = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
# kept as an explicit EXPRESSION LIST (r9 advice): the engine passes the
# elements straight to selectExpr and the oracle joins them with ",\n" —
# never parse the joined text back apart (a reflow of a multi-line CASE
# would silently change a split-derived list).
_CUPED_FINAL_EXPRS = [
    "CAST(sya AS DOUBLE) / na AS mean_y_a",
    "CAST(syb AS DOUBLE) / nb AS mean_y_b",
    "CAST(syb AS DOUBLE) / nb - CAST(sya AS DOUBLE) / na AS diff_raw",
    f"CASE WHEN n * sxx - sx * sx > 0 THEN {_CUPED_THETA} END AS theta",
    f"""CASE WHEN n * sxx - sx * sx > 0 THEN
  (CAST(syb AS DOUBLE) / nb
     - {_CUPED_THETA}
       * (CAST(sxb AS DOUBLE) / nb - CAST(sx AS DOUBLE) / n))
  - (CAST(sya AS DOUBLE) / na
     - {_CUPED_THETA}
       * (CAST(sxa AS DOUBLE) / na - CAST(sx AS DOUBLE) / n))
END AS diff_cuped""",
]
_CUPED_FINAL = ",\n".join(_CUPED_FINAL_EXPRS)

#: epoch-µs midpoint of the 30-day fixture window (2024-01-16 UTC) —
#: an integer literal on both engines, immune to session timezones.
_CUPED_CUT_US = 1_705_363_200_000_000


@query(
    "q_events_ab_cuped",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 2 AS variant,
             CAST(count(*) FILTER (WHERE epoch_us(ts) < {_CUPED_CUT_US})
                  AS BIGINT) AS x,
             CAST(count(*) FILTER (WHERE epoch_us(ts) >= {_CUPED_CUT_US}
                                     AND event_type = 'purchase')
                  AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT
        CAST(count(*) AS BIGINT)      AS n,
        CAST(sum(x) AS BIGINT)        AS sx,
        CAST(sum(x * x) AS BIGINT)    AS sxx,
        CAST(sum(x * y) AS BIGINT)    AS sxy,
        CAST(sum(y) AS BIGINT)        AS sy,
        CAST(count(*) FILTER (WHERE variant = 0) AS BIGINT) AS na,
        CAST(count(*) FILTER (WHERE variant = 1) AS BIGINT) AS nb,
        CAST(sum(x) FILTER (WHERE variant = 0) AS BIGINT)   AS sxa,
        CAST(sum(x) FILTER (WHERE variant = 1) AS BIGINT)   AS sxb,
        CAST(sum(y) FILTER (WHERE variant = 0) AS BIGINT)   AS sya,
        CAST(sum(y) FILTER (WHERE variant = 1) AS BIGINT)   AS syb
      FROM u
    )
    SELECT na, nb, {_CUPED_FINAL}
    FROM s
    """,
)
def q_events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013,
    the industry-standard A/B sensitivity boost): the treatment effect
    on post-period purchases is adjusted by each user's PRE-period
    activity — adjusted metric y − θ(x − x̄) with θ = cov(x,y)/var(x) —
    removing the between-user variance the pre-period already
    explains. Pre/post split at the fixture window's midpoint as an
    integer epoch-µs literal (timezone-immune), variant = the md5
    split shared with q_events_ab_test.

    Exactness: x and y are per-user integer COUNTS, so every moment
    (Σx, Σx², Σxy, per-variant sums) is an exact int64; θ and the
    adjusted means are ONE shared double-expression string evaluated
    by both engines over those exact integers (the q_events_ab_test
    discipline), with the var(x)=0 degenerate CASE'd identically.
    Scale: one user-keyed aggregate then a 1-row eleven-counter fold —
    map-side after the per-user shuffle."""
    ev = load_table(spark, sf_dir, "events")
    pre = F.unix_micros("ts") < F.lit(_CUPED_CUT_US)
    post_purchase = (F.unix_micros("ts") >= F.lit(_CUPED_CUT_US)) & (
        F.col("event_type") == "purchase"
    )
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(pre, 1).otherwise(0)).cast("bigint").alias("x"),
        F.sum(F.when(post_purchase, 1).otherwise(0)).cast("bigint").alias("y"),
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("variant"),
        "x",
        "y",
    )
    s = u.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum("y").cast("bigint").alias("sy"),
        F.count(F.when(F.col("variant") == 0, 1)).cast("bigint").alias("na"),
        F.count(F.when(F.col("variant") == 1, 1)).cast("bigint").alias("nb"),
        F.sum(F.when(F.col("variant") == 0, F.col("x")))
        .cast("bigint")
        .alias("sxa"),
        F.sum(F.when(F.col("variant") == 1, F.col("x")))
        .cast("bigint")
        .alias("sxb"),
        F.sum(F.when(F.col("variant") == 0, F.col("y")))
        .cast("bigint")
        .alias("sya"),
        F.sum(F.when(F.col("variant") == 1, F.col("y")))
        .cast("bigint")
        .alias("syb"),
    )
    return s.selectExpr("na", "nb", *_CUPED_FINAL_EXPRS)


@query(
    "q_events_did",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 2 AS variant,
             CAST(count(*) FILTER (WHERE epoch_us(ts) < {_CUPED_CUT_US}
                                     AND event_type = 'purchase')
                  AS BIGINT) AS y_pre,
             CAST(count(*) FILTER (WHERE epoch_us(ts) >= {_CUPED_CUT_US}
                                     AND event_type = 'purchase')
                  AS BIGINT) AS y_post
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT
        CAST(count(*) FILTER (WHERE variant = 0) AS BIGINT) AS na,
        CAST(count(*) FILTER (WHERE variant = 1) AS BIGINT) AS nb,
        CAST(sum(y_pre)  FILTER (WHERE variant = 0) AS BIGINT) AS pre_a,
        CAST(sum(y_post) FILTER (WHERE variant = 0) AS BIGINT) AS post_a,
        CAST(sum(y_pre)  FILTER (WHERE variant = 1) AS BIGINT) AS pre_b,
        CAST(sum(y_post) FILTER (WHERE variant = 1) AS BIGINT) AS post_b
      FROM u
    )
    SELECT na, nb,
           CAST(pre_a  AS DOUBLE) / na AS mean_pre_a,
           CAST(post_a AS DOUBLE) / na AS mean_post_a,
           CAST(pre_b  AS DOUBLE) / nb AS mean_pre_b,
           CAST(post_b AS DOUBLE) / nb AS mean_post_b,
           (CAST(post_b AS DOUBLE) / nb - CAST(pre_b AS DOUBLE) / nb)
         - (CAST(post_a AS DOUBLE) / na - CAST(pre_a AS DOUBLE) / na)
             AS did
    FROM s
    """,
)
def q_events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES estimator — the quasi-experimental
    readout for when assignment isn't randomized (feature rollouts,
    market launches): the treated group's pre→post change minus the
    control group's, which cancels any level difference between groups
    and any common time trend. Shares the md5 group split and the
    integer epoch-µs period cut with q_events_ab_test / q_events_ab_cuped
    (one deterministic experiment-analysis family, three estimators).

    Exactness: the four cells are exact int64 per-user purchase-count
    sums; the estimator is a double tree over those integers, written
    identically on both engines. Scale: one user-keyed aggregate, then
    a 1-row six-counter fold."""
    ev = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    pre = is_p & (F.unix_micros("ts") < F.lit(_CUPED_CUT_US))
    post = is_p & (F.unix_micros("ts") >= F.lit(_CUPED_CUT_US))
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(pre, 1).otherwise(0)).cast("bigint").alias("y_pre"),
        F.sum(F.when(post, 1).otherwise(0)).cast("bigint").alias("y_post"),
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("variant"),
        "y_pre",
        "y_post",
    )
    s = u.agg(
        F.count(F.when(F.col("variant") == 0, 1)).cast("bigint").alias("na"),
        F.count(F.when(F.col("variant") == 1, 1)).cast("bigint").alias("nb"),
        F.sum(F.when(F.col("variant") == 0, F.col("y_pre")))
        .cast("bigint")
        .alias("pre_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("y_post")))
        .cast("bigint")
        .alias("post_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("y_pre")))
        .cast("bigint")
        .alias("pre_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("y_post")))
        .cast("bigint")
        .alias("post_b"),
    )
    mean = lambda c, n: F.col(c).cast("double") / F.col(n)  # noqa: E731
    return s.select(
        "na",
        "nb",
        mean("pre_a", "na").alias("mean_pre_a"),
        mean("post_a", "na").alias("mean_post_a"),
        mean("pre_b", "nb").alias("mean_pre_b"),
        mean("post_b", "nb").alias("mean_post_b"),
        (
            (mean("post_b", "nb") - mean("pre_b", "nb"))
            - (mean("post_a", "na") - mean("pre_a", "na"))
        ).alias("did"),
    )
