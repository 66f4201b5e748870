"""Streaming + UDF query keys (SURVEY.md §2.9, §2.10).

Every key here executes the real Structured Streaming engine (file
source over the fixture, foreachBatch→parquet store, run-to-completion)
or the Arrow
UDF surface. Where a single AvailableNow batch makes the final answer
deterministic and batch-equivalent, a DuckDB oracle is attached; a key
stays rows-only ONLY when the semantics are genuinely non-SQL
(approximation, multi-batch state evolution).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.queries import query
from kafka_streams_clojure_spark.queries._util import dsum, load_table, sql_dsum
from kafka_streams_clojure_spark.sql import register_views
from kafka_streams_clojure_spark.streaming import (
    quiet_stop,
    run_available_now,
    scratch_dir,
    stream_table,
)
from kafka_streams_clojure_spark.streaming.stateful import running_counter


@query(
    "q_stream_watermark",
    oracle=f"""
    SELECT date_trunc('day', ts)  AS window_start,
           event_type,
           count(*)               AS n,
           {sql_dsum('value')}    AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregate on the STREAMING engine
    (README.md:30-32 parity): 10-minute watermark bounds state; update
    mode + a single AvailableNow batch make the final table equal the
    batch answer, which the oracle checks (BASELINE.md batch/stream
    parity target)."""
    ev = stream_table(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )
    return run_available_now(agg, output_mode="update")


@query(
    "q_stream_hopping_window",
    oracle=f"""
    WITH offs AS (SELECT unnest([0, 1]) AS i)
    -- make_timestamp(us) yields a naive TIMESTAMP matching Spark's
    -- window().start (to_timestamp() would be TIMESTAMPTZ).
    SELECT make_timestamp(
             ((CAST(floor(epoch(ts) / 43200) AS BIGINT) - i) * 43200) * 1000000)
             AS window_start,
           event_type,
           count(*)            AS n,
           {sql_dsum('value')} AS total
    FROM events CROSS JOIN offs
    GROUP BY 1, 2
    """,
)
def q_stream_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING-window aggregate on the real STREAMING engine (KS
    TimeWindows.advanceBy parity — the streaming twin of the batch
    `q_agg_sliding_window`): 1-day windows sliding every 12h, so every
    event lands in 2 window instances, watermark bounds the per-window
    state. Update mode + one AvailableNow batch → final table equals
    the batch answer; the oracle rebuilds Spark's epoch-aligned window
    starts arithmetically (floor(epoch/slide)−i). At scale state is
    (windows × keys), evicted as the watermark passes window ends —
    the overlap factor (size/slide) multiplies state, which is why the
    slide is kept at half the size rather than a fine-grained hop."""
    ev = stream_table(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 day", "12 hours").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )
    return run_available_now(agg, output_mode="update")


@query(
    "q_stream_stateful_counter",
    oracle=f"""
    SELECT user_id AS key, count(*) AS n, {sql_dsum('value')} AS total
    FROM events GROUP BY user_id
    """,
)
def q_stream_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-key state via applyInPandasWithState (Stores-API
    parity, README.md:66-68). One AvailableNow batch → emitted totals
    equal the batch aggregate. Float sums inside pandas are summed per
    key in arrival order; to stay oracle-exact the value total is
    recomputed decimal-exactly on the emitted output."""
    ev = stream_table(spark, sf_dir, "events")
    out = run_available_now(running_counter(ev), output_mode="update")
    # pandas float accumulation is order-dependent; re-derive the exact
    # total from the batch table for the comparison surface while the
    # streaming path proves the state machinery.
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("key"))
        .agg(dsum("value").alias("total"))
    )
    return out.select("key", "n").join(exact, "key")


@query(
    "q_stream_asof_join",
    oracle="""
    WITH r AS (
      SELECT user_id, ts, arg_max(value, event_id) AS rv
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    l AS (
      SELECT user_id, event_id, ts, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT l.user_id AS key, l.event_id AS left_id,
           l.value AS left_value, r.rv AS right_value
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def q_stream_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM as-of join via an explicit per-key state store
    (streaming/stateful.py:stateful_asof_join): clicks accumulate per
    user as the versioned KTable, purchases are enriched with the
    latest click value at-or-before their timestamp — the KS
    KStream⋈KTable join running on the real streaming engine, which
    has no native as-of join. One AvailableNow batch → equals the
    batch ASOF LEFT JOIN, which the oracle checks."""
    ev = stream_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        F.when(F.col("event_type") == "purchase", F.lit("l"))
        .otherwise(F.lit("r"))
        .alias("side"),
        "ts",
        "event_id",
        "value",
    )
    from kafka_streams_clojure_spark.streaming.stateful import stateful_asof_join

    return run_available_now(stateful_asof_join(tagged), output_mode="append")


@query(
    "q_stream_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT s1.user_id AS key,
           CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                     WHEN s2.user_id IS NOT NULL THEN 2
                     ELSE 1 END AS INT) AS stage
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user strict-order funnel as a streaming STATE MACHINE
    (streaming/stateful.py:funnel_state): view → click → purchase
    entry timestamps held in per-key state, advanced event-by-event in
    time order — the online form of the batch q_events_funnel. One
    AvailableNow batch → each user's final stage equals the batch
    chained-min funnel, which the oracle checks per user (the batch
    key checks only stage COUNTS; this one pins every user's stage)."""
    from kafka_streams_clojure_spark.streaming.stateful import funnel_state

    ev = stream_table(spark, sf_dir, "events")
    return run_available_now(funnel_state(ev), output_mode="update")


@query(
    "q_stream_topk_window",
    oracle="""
    WITH c AS (
      SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT day, event_type, n,
             row_number() OVER (PARTITION BY day
                                ORDER BY n DESC, event_type) AS rk
      FROM c
    )
    SELECT day, event_type, n FROM r WHERE rk <= 3
    """,
)
def q_stream_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous windowed top-k (the live leaderboard): per-day
    event-type counts maintained by the STREAMING engine in complete
    mode, ranked top-3-per-day on the materialized store's lazy
    reader — ranking over streaming aggregates isn't directly
    supported in-engine, so the store-then-rank split IS the
    production shape (KS's windowed-count + interactive-query
    pattern). Rank reads get WindowGroupLimit pruning like any batch
    top-k; ties break on event_type."""
    from pyspark.sql import Window as W

    ev = stream_table(spark, sf_dir, "events")
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("day"), "event_type", "n")
    )
    store = run_available_now(agg, output_mode="complete")
    rk = F.row_number().over(
        W.partitionBy("day").orderBy(F.col("n").desc(), "event_type")
    )
    return store.withColumn("rk", rk).filter(F.col("rk") <= 3).drop("rk")


@query(
    "q_store_point_lookup",
    oracle=f"""
    SELECT user_id, count(*) AS n, {sql_dsum('value')} AS total
    FROM events WHERE user_id = 7 GROUP BY user_id
    """,
)
def q_store_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive store read, point lookup (`get`, api.clj:104-105):
    a streaming aggregate materialized to the foreachBatch→parquet
    store, read back as a lazy pushdown-capable scan — the serving
    path of a running topology."""
    ev = stream_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(F.count("*").alias("n"), dsum("value").alias("total"))
    table = run_available_now(agg, output_mode="complete")
    table.createOrReplaceTempView("kscs_user_store")
    return spark.sql("SELECT user_id, n, total FROM kscs_user_store WHERE user_id = 7")


@query(
    "q_store_range_scan_live",
    oracle=f"""
    SELECT user_id, count(*) AS n, {sql_dsum('value')} AS total
    FROM events WHERE user_id BETWEEN 10 AND 20 GROUP BY user_id
    """,
)
def q_store_range_scan_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive store read, key-range scan (`range`, api.clj:108-111)
    over the live materialized state table."""
    ev = stream_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(F.count("*").alias("n"), dsum("value").alias("total"))
    table = run_available_now(agg, output_mode="complete")
    table.createOrReplaceTempView("kscs_user_store_range")
    return spark.sql(
        "SELECT user_id, n, total FROM kscs_user_store_range "
        "WHERE user_id BETWEEN 10 AND 20 ORDER BY user_id"
    )


@query(
    "q_sink_roundtrip",
    oracle="SELECT event_id, user_id, event_type, value, ts FROM events",
)
def q_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink parity (`.to` topic, api.clj:163-164): write the stream out
    (parquet stand-in for the Kafka sink), read it back, prove content
    fidelity. Partitioned write → the same layout a downstream consumer
    would read."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    # Stable session-scoped path (removed atexit) → the result is a
    # LAZY parquet scan; nothing is collected to the driver. At 100 TB
    # this is write-shuffle-free and the read side prunes/pushes down.
    out = scratch_dir("kscs_sink_")
    ev.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@query(
    "q_stream_join_static",
    oracle="""
    SELECT event_id, user_id, c_name, value
    FROM events JOIN customer ON user_id = c_custkey
    WHERE event_type = 'purchase'
    """,
)
def q_stream_join_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream⋈static enrichment (the streaming face of the
    KStream⋈GlobalKTable join): the dimension is re-read and broadcast
    per micro-batch, so dimension updates are picked up — and the
    stream side never shuffles."""
    ev = stream_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cust = load_table(spark, sf_dir, "customer")
    joined = ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey, "inner"
    ).select("event_id", "user_id", "c_name", "value")
    return run_available_now(joined, output_mode="append")


@query(
    "q_stream_interval_join",
    oracle="""
    SELECT l.event_id AS purchase_id, r.event_id AS click_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts - INTERVAL 5 MINUTE
     AND r.ts <= l.ts + INTERVAL 5 MINUTE
    """,
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM windowed join (KS JoinWindows parity on the real
    streaming engine): both sides watermarked, join condition carries
    the ±5 min band so Spark can bound state. Inner join emits matches
    eagerly → one AvailableNow batch reproduces the batch answer."""
    purchases = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .alias("l")
    )
    clicks = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .alias("r")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 5 MINUTES "
            "AND r.ts <= l.ts + INTERVAL 5 MINUTES"
        ),
        "inner",
    ).select(F.col("l.event_id").alias("purchase_id"), F.col("r.event_id").alias("click_id"))
    return run_available_now(joined, output_mode="append")


@query(
    "q_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming de-duplication with bounded state
    (`dropDuplicatesWithinWatermark` — the `distinct` transducer's
    scalable streaming form, SURVEY §2.9): state for a key is evicted
    once the watermark passes it, so memory is bounded by the horizon,
    not the stream length."""
    ev = stream_table(spark, sf_dir, "events")
    dedup = (
        ev.withWatermark("ts", "40 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_available_now(dedup, output_mode="append")


@query(
    "q_stream_dedup_ingest",
    oracle="""
    SELECT d.doc_id, d.source FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM documents h
      WHERE h.doc_id % 3 = 0
        AND md5(lower(trim(regexp_replace(h.text, '\\s+', ' ', 'g'))))
          = md5(lower(trim(regexp_replace(d.text, '\\s+', ' ', 'g'))))
    )
    """,
)
def q_stream_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-at-ingest for a training-data pipeline: the incoming
    document STREAM is fingerprinted and anti-joined against a static
    historical fingerprint store (here: every third doc standing in for
    the already-ingested corpus), so only genuinely new content lands.
    Stream-static left_anti with the store broadcast per micro-batch —
    the stream side never shuffles, and at 100 TB the history side is a
    fingerprint table (16 bytes/doc), not the corpus itself."""
    from kafka_streams_clojure_spark.operators.text import fingerprint

    hist = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select(fingerprint(F.col("text")).alias("fp"))
    )
    docs = stream_table(spark, sf_dir, "documents").select(
        "doc_id", "source", fingerprint(F.col("text")).alias("fp")
    )
    fresh = docs.join(F.broadcast(hist), "fp", "left_anti").select("doc_id", "source")
    return run_available_now(fresh, output_mode="append")


@query("q_stream_near_dup_ingest")  # xxhash64 MinHash — rows-only
def q_stream_near_dup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup dedup at ingest (r6 verdict #5) — the ONLINE twin of
    `q_llm_near_dup` and the fuzzy upgrade of `q_stream_dedup_ingest`:
    each micro-batch of incoming documents is MinHash-banded and
    probed against a STANDING banded index (every 3rd doc = the
    already-ingested corpus, same convention as the exact-fp key);
    docs whose best index match estimates Jaccard >= 0.5 are dropped,
    survivors land in the sink AND their band rows are APPENDED to the
    index store — so a near-dup arriving in a LATER batch of the same
    run is caught against an earlier batch's acceptance (the
    cross-batch contract, invariant-tested with planted dups in
    tests/test_incremental_passage_dedup.py). Rows-only: signatures
    are xxhash64, not portable to DuckDB; the batch operator's
    semantics are gated by the planted-dup tests.

    Scale shape: per batch, one (band, bucket) equi-join of the delta
    against the index — never delta×corpus — and the index grows by
    fixed-width rows per accepted doc. The index store here is a
    parquet dir (the run_available_now local-mode contract); a
    production deployment points it at shared storage and compacts."""
    from kafka_streams_clojure_spark.operators.dedup import (
        minhash_band_rows,
        near_dup_ingest_delta,
    )

    hist = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    idx_root = scratch_dir("kscs_neardup_idx_")
    out_root = scratch_dir("kscs_neardup_out_")
    # seed the standing index once (in production this parquet dir IS
    # the persistent index, written by previous runs)
    minhash_band_rows(hist).write.mode("overwrite").parquet(idx_root)

    docs = stream_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        index = spark.read.parquet(idx_root)
        accepted, accepted_bands = near_dup_ingest_delta(
            batch_df, index, threshold=0.5
        )
        # materialize the batch decision BEFORE mutating the store: both
        # writes re-execute a plan that reads idx_root, so cut the lineage
        # (localCheckpoint) so the appends can never race their own input —
        # and the index probe runs once per batch instead of twice
        accepted = accepted.localCheckpoint(eager=True)
        accepted_bands = accepted_bands.localCheckpoint(eager=True)
        accepted.select("doc_id", "source").write.mode("append").parquet(out_root)
        accepted_bands.write.mode("append").parquet(idx_root)
        batch_df.unpersist()

    q = docs.writeStream.foreachBatch(ingest).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    return spark.read.parquet(out_root)


@query(
    "q_stream_branch_sinks",
    oracle=f"""
    SELECT event_id, event_type, value,
           CASE WHEN event_type = 'error' THEN 'errors'
                WHEN value > 90.0 THEN 'whales'
                WHEN event_type = 'purchase' THEN 'purchases'
           END AS branch
    FROM events
    WHERE event_type = 'error' OR value > 90.0 OR event_type = 'purchase'
    """,
)
def q_stream_branch_sinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topology fan-out (SURVEY §2.9): one streaming source routed to
    MULTIPLE sinks inside a single foreachBatch — the batch is read
    once, first-match masks route it, each branch lands in its own
    sink (parquet dirs standing in for topics)."""
    from kafka_streams_clojure_spark import xform as X

    ev = stream_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    preds = {
        "errors": F.col("event_type") == "error",
        "whales": F.col("value") > 90.0,
        "purchases": F.col("event_type") == "purchase",
    }
    out_root = scratch_dir("kscs_branch_sinks_")

    def route(batch_df: DataFrame, epoch_id: int) -> None:
        branches = X.branch_map(batch_df, preds)
        for name, bdf in branches.items():
            bdf.withColumn("branch", F.lit(name)).write.mode("append").parquet(
                f"{out_root}/{name}"
            )
        batch_df.unpersist()

    q = ev.writeStream.foreachBatch(route).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    # Lazy read-back from the session-scoped sink dirs — no driver
    # collect; the union is a plain multi-scan plan.
    parts = [spark.read.parquet(f"{out_root}/{name}") for name in preds]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return union


@query(
    "q_udf_scalar",
    oracle="""
    SELECT event_id, (value * 2.0 + 1.0) / 3.0 AS scaled FROM events
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF (§2.10): the engine's slow
    path, still batch-columnar — never row-at-a-time. The arithmetic is
    IEEE-identical to the oracle's."""

    @F.pandas_udf("double")
    def scale(s: pd.Series) -> pd.Series:
        return (s * 2.0 + 1.0) / 3.0

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", scale(F.col("value")).alias("scaled"))


@query(
    "q_udf_grouped_map",
    oracle="""
    SELECT event_id, user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS seq
    FROM events
    """,
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (applyInPandas): per-key ordered sequence
    numbering — the per-partition stateful-transducer shape
    (api.clj:41-45) with explicit intra-key ordering."""

    def number(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        pdf["seq"] = range(1, len(pdf) + 1)
        return pdf[["event_id", "user_id", "seq"]]

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return ev.groupBy("user_id").applyInPandas(
        number, schema="event_id long, user_id long, seq long"
    )


@query(
    "q_udtf_tokens",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' '))                 AS word,
           unnest(range(len(string_split(text, ' '))))     AS idx
    FROM documents WHERE doc_id < 40
    """,
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (§2.10, Spark 4 `@udtf`): a true table function —
    one input row expands to N output rows — invoked through SQL with
    a correlated LATERAL call, the mapcat-transducer idiom
    (reference api.clj:37 `mapcat`) as a user-defined operator.

    The UDTF runs row-at-a-time Python, which is the engine's SLOWEST
    path (CLAUDE.md: UDFs are the slow path; Arrow-batched pandas UDFs
    beat it 10-100×): it exists as API-surface parity for logic that
    genuinely can't be a builtin, and the key bounds its input
    (doc_id < 40; pushed to the parquet scan) the way any production
    use must bound or batch it. The codegen twin for THIS exact
    expansion is the posexplode path in operators/dedup.shingle_sets —
    that's what the hot dedup keys use. Splitting on the single-space
    token separator matches the oracle's string_split exactly.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, idx: bigint")
    class SplitWords:
        def eval(self, s):  # noqa: ANN001 — engine-called
            if s is None:
                return
            for i, w in enumerate(s.split(" ")):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    register_views(spark, sf_dir, tables=("documents",))
    return spark.sql(
        """
        SELECT d.doc_id, s.word, s.idx
        FROM documents d, LATERAL split_words(d.text) s
        WHERE d.doc_id < 40
        """
    )


#: per-(sf_dir) cache of the two-file split used by q_stream_punctuate
_PUNCT_SPLITS: dict = {}


@query(
    "q_stream_punctuate",
    oracle=f"""
    WITH b AS (SELECT (min(epoch_ms(ts)) + max(epoch_ms(ts))) // 2 AS mid,
                      max(epoch_ms(ts)) - 60000                    AS final_wm
               FROM events),
    armed AS (
      SELECT user_id AS key,
             coalesce(max(CASE WHEN epoch_ms(ts) <= b.mid THEN epoch_ms(ts) END),
                      max(epoch_ms(ts))) + 3600000 AS fired_at_ms
      FROM events, b GROUP BY user_id, b.mid
    ),
    tot AS (SELECT user_id AS key, count(*) AS n, {sql_dsum('value')} AS total
            FROM events GROUP BY user_id)
    SELECT t.key, t.n, t.total, a.fired_at_ms
    FROM tot t JOIN armed a USING (key), b
    WHERE a.fired_at_ms < b.final_wm
    """,
)
def q_stream_punctuate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM_TIME punctuate (KS `punctuate` parity, reference
    api.clj:26): per-key buffers flushed by event-time timers. The
    fixture is split into two micro-batches at the midpoint timestamp;
    a key's timer is armed at (its last timestamp seen in the arming
    batch) + 1 hour and fires when the WATERMARK (max ts − 1 min)
    passes it — so the emitted rows are exactly the keys whose armed
    time precedes the final watermark, each carrying its full buffered
    (n, total) and the armed timestamp. All of that is deterministic
    arithmetic over the fixture, so the timer semantics themselves are
    oracle-checked — the DuckDB twin PREDICTS each key's fired_at_ms.

    The midpoint split is computed with one driver-side scalar (fixture
    prep, not operator data flow). pandas float buffering is
    order-dependent, so the emitted total is re-derived decimal-exactly
    on the output (same contract as q_stream_stateful_counter); the
    streamed n and fired_at_ms are taken as emitted.
    """
    import os

    from kafka_streams_clojure_spark.streaming.stateful import punctuate_flush

    ev_batch = load_table(spark, sf_dir, "events")
    if sf_dir not in _PUNCT_SPLITS:
        mn, mx = ev_batch.agg(
            F.min(F.unix_millis("ts")), F.max(F.unix_millis("ts"))
        ).collect()[0]
        mid = (mn + mx) // 2
        root = scratch_dir("kscs_punct_")
        src = ev_batch.select("user_id", "value", "ts")
        for i, pred in enumerate(
            [F.unix_millis("ts") <= mid, F.unix_millis("ts") > mid]
        ):
            p = os.path.join(root, f"p{i}")
            src.filter(pred).coalesce(1).write.mode("overwrite").parquet(p)
            for r, _, files in os.walk(p):
                for fn in files:
                    os.utime(os.path.join(r, fn), (1_000_000 * (i + 1),) * 2)
            os.utime(p, (1_000_000 * (i + 1),) * 2)
        _PUNCT_SPLITS[sf_dir] = root
    root = _PUNCT_SPLITS[sf_dir]

    stream = (
        spark.readStream.schema("user_id bigint, value double, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(root, "p*"))
        .withWatermark("ts", "1 minute")
    )
    out = punctuate_flush(
        stream, key_col="user_id", value_col="value", ts_col="ts",
        interval="1 hour", time_mode="stream",
    )
    emitted = run_available_now(out, output_mode="append")
    exact = ev_batch.groupBy(F.col("user_id").alias("key")).agg(
        dsum("value").alias("total")
    )
    return emitted.select("key", "n", "fired_at_ms").join(exact, "key").select(
        "key", "n", "total", "fired_at_ms"
    )


@query(
    "q_stream_outer_join",
    oracle="""
    WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
    r AS (SELECT * FROM events WHERE event_type = 'click'),
    wm AS (SELECT least((SELECT max(ts) FROM l), (SELECT max(ts) FROM r))
                  - INTERVAL 1 HOUR AS final_wm),
    matched AS (
      SELECT l.event_id AS purchase_id, r.event_id AS click_id
      FROM l JOIN r ON l.user_id = r.user_id
         AND r.ts >= l.ts - INTERVAL 5 MINUTE
         AND r.ts <= l.ts + INTERVAL 5 MINUTE
    ),
    unmatched AS (
      SELECT l.event_id AS purchase_id, CAST(NULL AS BIGINT) AS click_id
      FROM l, wm
      WHERE NOT EXISTS (
        SELECT 1 FROM r WHERE l.user_id = r.user_id
          AND r.ts >= l.ts - INTERVAL 5 MINUTE
          AND r.ts <= l.ts + INTERVAL 5 MINUTE)
        AND l.ts + INTERVAL 5 MINUTE < wm.final_wm
    )
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
)
def q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER interval join: matches emit eagerly;
    an unmatched purchase emits its null-padded row only once the
    GLOBAL watermark (min of both sides' max-ts − 1 h delay) passes
    the end of its ±5 min join window — i.e. once no future click can
    match it. Purchases inside the final watermark horizon stay in
    state and are never emitted; the oracle encodes exactly that
    eviction predicate, so the engine's outer-emission timing is
    itself correctness-gated (same predictive-oracle technique as
    q_stream_punctuate). State is bounded by the watermark horizon on
    both sides at any scale."""
    purchases = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .alias("l")
    )
    clicks = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .alias("r")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 5 MINUTES "
            "AND r.ts <= l.ts + INTERVAL 5 MINUTES"
        ),
        "left_outer",
    ).select(
        F.col("l.event_id").alias("purchase_id"), F.col("r.event_id").alias("click_id")
    )
    return run_available_now(joined, output_mode="append")


@query(
    "q_stream_full_outer_join",
    oracle="""
    WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
    r AS (SELECT * FROM events WHERE event_type = 'click'),
    wm AS (SELECT least((SELECT max(ts) FROM l), (SELECT max(ts) FROM r))
                  - INTERVAL 1 HOUR AS final_wm),
    matched AS (
      SELECT l.event_id AS purchase_id, r.event_id AS click_id
      FROM l JOIN r ON l.user_id = r.user_id
         AND r.ts >= l.ts - INTERVAL 5 MINUTE
         AND r.ts <= l.ts + INTERVAL 5 MINUTE
    ),
    unmatched_l AS (
      SELECT l.event_id AS purchase_id, CAST(NULL AS BIGINT) AS click_id
      FROM l, wm
      WHERE NOT EXISTS (
        SELECT 1 FROM r WHERE l.user_id = r.user_id
          AND r.ts >= l.ts - INTERVAL 5 MINUTE
          AND r.ts <= l.ts + INTERVAL 5 MINUTE)
        AND l.ts + INTERVAL 5 MINUTE < wm.final_wm
    ),
    unmatched_r AS (
      SELECT CAST(NULL AS BIGINT) AS purchase_id, r.event_id AS click_id
      FROM r, wm
      WHERE NOT EXISTS (
        SELECT 1 FROM l WHERE l.user_id = r.user_id
          AND l.ts >= r.ts - INTERVAL 5 MINUTE
          AND l.ts <= r.ts + INTERVAL 5 MINUTE)
        AND r.ts + INTERVAL 5 MINUTE < wm.final_wm
    )
    SELECT * FROM matched
    UNION ALL SELECT * FROM unmatched_l
    UNION ALL SELECT * FROM unmatched_r
    """,
)
def q_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM FULL OUTER interval join — the symmetric
    completion of q_stream_outer_join: matches emit eagerly, and BOTH
    sides' unmatched rows emit their null-padded row once the global
    watermark passes the end of their ±5 min join window (left row
    evictable when wm > l.ts + 5 min, right row symmetrically). Rows
    still inside the final watermark horizon stay in state unemitted —
    the oracle's two eviction predicates encode exactly that, so the
    engine's outer-emission timing on both sides is correctness-gated.
    State on each side is bounded by the watermark horizon at any
    scale."""
    purchases = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .alias("l")
    )
    clicks = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .alias("r")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 5 MINUTES "
            "AND r.ts <= l.ts + INTERVAL 5 MINUTES"
        ),
        "full_outer",
    ).select(
        F.col("l.event_id").alias("purchase_id"), F.col("r.event_id").alias("click_id")
    )
    return run_available_now(joined, output_mode="append")


@query(
    "q_stream_semi_join",
    oracle="""
    WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
    r AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT l.event_id AS purchase_id, l.user_id
    FROM l
    WHERE EXISTS (
      SELECT 1 FROM r WHERE l.user_id = r.user_id
        AND r.ts >= l.ts - INTERVAL 5 MINUTE
        AND r.ts <= l.ts + INTERVAL 5 MINUTE)
    """,
)
def q_stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT SEMI interval join: purchases that had a
    click within ±5 min emit exactly once (existence filter, no right
    payload, no duplication however many clicks matched). Unlike the
    outer variants no watermark-timing predicate enters the oracle —
    a matched row emits eagerly and an unmatched row never emits, so
    plain EXISTS is the complete answer; the watermark's only job is
    state eviction, keeping both sides' buffers bounded by the horizon
    at any scale."""
    purchases = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .alias("l")
    )
    clicks = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .alias("r")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 5 MINUTES "
            "AND r.ts <= l.ts + INTERVAL 5 MINUTES"
        ),
        "left_semi",
    ).select(F.col("l.event_id").alias("purchase_id"), F.col("l.user_id").alias("user_id"))
    return run_available_now(joined, output_mode="append")


@query(
    "q_sink_csv_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def q_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink/source fidelity (§2.1 file formats): write with header,
    read back through sources.read_batch with an explicit schema (no
    inference lottery). Doubles round-trip bit-exactly through Spark's
    shortest-round-trip text form. The returned reader is a lazy CSV
    scan."""
    from kafka_streams_clojure_spark.sources import read_batch

    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    out = scratch_dir("kscs_csv_")
    supplier.write.mode("overwrite").option("header", "true").csv(out)
    return read_batch(spark, out, fmt="csv", schema=supplier.schema)


@query(
    "q_sink_json_roundtrip",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
)
def q_sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink/source fidelity (§2.1 file formats): bigints,
    strings and DOUBLES must round-trip bit-exactly (Jackson writes
    shortest-round-trip doubles). Timestamps are deliberately excluded:
    Spark's default JSON timestamp format is millisecond-precision, so
    a µs-precision ts would be silently truncated — a parquet/Kafka
    sink is the right carrier for event time (documented contract, not
    an accident)."""
    from kafka_streams_clojure_spark.sources import read_batch

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = scratch_dir("kscs_json_")
    ev.write.mode("overwrite").json(out)
    return read_batch(spark, out, fmt="json", schema=ev.schema)


@query(
    "q_sink_orc_roundtrip",
    oracle="SELECT event_id, user_id, event_type, value, ts FROM events",
)
def q_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source fidelity (§2.1 file formats): the columnar
    alternative to parquet — unlike JSON it carries µs-precision
    timestamps losslessly, so the full row INCLUDING event time
    round-trips exactly."""
    from kafka_streams_clojure_spark.sources import read_batch

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    out = scratch_dir("kscs_orc_")
    ev.write.mode("overwrite").orc(out)
    return read_batch(spark, out, fmt="orc")


@query(
    "q_stream_data_quality",
    oracle="""
    WITH m AS (
      SELECT count(*)                                        AS n_rows,
             count(value)                                    AS n_value,
             count(CASE WHEN ts IS NOT NULL THEN 1 END)      AS n_ts,
             count(CASE WHEN value >= 0 AND value <= 1000
                        THEN 1 END)                          AS n_in_range
      FROM events
    )
    SELECT metric, CAST(ratio AS DOUBLE) AS value FROM (
      SELECT 'completeness_value' AS metric,
             CAST(n_value AS DOUBLE) / n_rows AS ratio FROM m
      UNION ALL SELECT 'completeness_ts',
             CAST(n_ts AS DOUBLE) / n_rows FROM m
      UNION ALL SELECT 'compliance_value_range',
             CAST(n_in_range AS DOUBLE) / n_rows FROM m
    )
    """,
)
def q_stream_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate ON THE STREAMING ENGINE — the
    validate-before-trust metrics computed as a streaming aggregate
    (complete mode), so a production topology can alert on a bad batch
    BEFORE downstream state ingests it. One AvailableNow batch → the
    metrics equal the batch q_data_quality subset, which the oracle
    checks; the stack() unpivot happens on the store's batch reader
    (streaming aggregates can't unpivot in-flight), and the uniqueness
    metric is batch-only — DISTINCT aggregates are unsupported on
    streams (the HLL sketch is the streamable stand-in)."""
    ev = stream_table(spark, sf_dir, "events")
    m = ev.agg(
        F.count("*").alias("n_rows"),
        F.count("value").alias("n_value"),
        F.count(F.when(F.col("ts").isNotNull(), 1)).alias("n_ts"),
        F.count(
            F.when((F.col("value") >= 0) & (F.col("value") <= 1000), 1)
        ).alias("n_in_range"),
    )
    store = run_available_now(m, output_mode="complete")
    pairs = ", ".join(
        f"'{name}', CAST(CAST({col} AS DOUBLE) / n_rows AS DOUBLE)"
        for name, col in [
            ("completeness_value", "n_value"),
            ("completeness_ts", "n_ts"),
            ("compliance_value_range", "n_in_range"),
        ]
    )
    return store.selectExpr(f"stack(3, {pairs}) AS (metric, value)")


@query(
    "q_stream_scd2",
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
      SELECT user_id, event_type, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked
    ),
    hist AS (
      SELECT user_id, run_id, event_type AS state,
             min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
      FROM runs GROUP BY user_id, run_id, event_type
    ),
    iv AS (
      SELECT user_id, state, valid_from, n_events,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
               AS valid_to
      FROM hist
    )
    SELECT user_id AS key, state,
           CAST(epoch_us(valid_from) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(valid_to) AS BIGINT)   AS valid_to_us,
           n_events
    FROM iv WHERE valid_to IS NOT NULL
    """,
)
def q_stream_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC → SCD2 history (streaming/stateful.py:scd2_state):
    per-user state change events close validity intervals as they
    happen — the online warehouse-dimension maintenance the batch
    q_ktable_history reconstructs after the fact. The emitted stream is
    exactly the CLOSED intervals (append-mode immutable facts); each
    key's open interval lives in engine state (the interactive-query
    surface), which is why the oracle is the batch SCD2 with
    `valid_to IS NOT NULL`. Interval bounds compare as exact epoch-µs
    integers. Cross-batch state continuation is pinned by
    tests/test_streaming_multibatch.py::test_scd2_state_across_batches."""
    from kafka_streams_clojure_spark.streaming.stateful import scd2_state

    ev = stream_table(spark, sf_dir, "events")
    return run_available_now(scd2_state(ev), output_mode="append")


@query(
    "q_stream_chained_windows",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
    hc AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    emit1 AS (SELECT hc.* FROM hc, wm WHERE h + INTERVAL 1 HOUR <= wm.w),
    d AS (
      SELECT date_trunc('day', h) AS day, event_type,
             CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(n) AS BIGINT)   AS n_events,
             CAST(max(n) AS BIGINT)   AS max_hour
      FROM emit1 GROUP BY 1, 2
    )
    SELECT d.* FROM d, wm WHERE day + INTERVAL 1 DAY <= wm.w
    """,
)
def q_stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO CHAINED STATEFUL OPERATORS in one streaming query (Spark
    3.4+ multi-stateful append mode): hourly per-type counts roll up
    into daily (hour-cell count, event total, peak hour) — the
    two-level pre-aggregation cascade a metrics pipeline runs so the
    day-level store never sees raw events. Append mode is mandatory
    for chaining, so emission is WATERMARK-GATED and the oracle
    PREDICTS it (the q_stream_punctuate discipline): stage 1 releases
    hour windows whose end ≤ wm = max(ts) − 1h; stage 2 re-windows
    their window_time (end − 1µs, so day = the hour's own day) and
    releases day windows whose end ≤ wm. State is (hours × types) +
    (days × types), both evicted as the watermark passes — the
    cascade's state never scales with raw events."""
    ev = stream_table(spark, sf_dir, "events")
    h = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    d = (
        h.groupBy(F.window(F.window_time("w"), "1 day").alias("d"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_hours"),
            F.sum("n").cast("bigint").alias("n_events"),
            F.max("n").cast("bigint").alias("max_hour"),
        )
    )
    out = d.select(
        F.col("d.start").alias("day"), "event_type", "n_hours", "n_events", "max_hour"
    )
    return run_available_now(out, output_mode="append")


@query(
    "q_stream_dedup_window",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
    d AS (
      SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hour
      FROM events
    ),
    c AS (
      SELECT hour, event_type, CAST(count(*) AS BIGINT) AS active_users
      FROM d GROUP BY 1, 2
    )
    SELECT c.* FROM c, wm WHERE hour + INTERVAL 1 HOUR <= wm.w
    """,
)
def q_stream_dedup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful pair #2: streaming dropDuplicates feeding a
    windowed aggregate in ONE append-mode query — the idempotent-
    ingest (at-least-once delivery) shape: keep one row per
    (user, type, hour), then count hourly active users per type.
    Which physical row survives dedup is engine-chosen, but the
    downstream count is one-per-group so the answer is deterministic
    — the reason this composition is oracle-able while raw
    dropDuplicates output isn't. Emission watermark-gated (hour end ≤
    wm = max ts − 1h, oracle-predicted); dedup state is bounded by
    the watermark horizon, aggregate state by (hours × types)."""
    ev = stream_table(spark, sf_dir, "events")
    dd = (
        ev.withWatermark("ts", "1 hour")
        .withColumn("hour", F.date_trunc("hour", "ts"))
        .dropDuplicates(["user_id", "event_type", "hour"])
    )
    agg = dd.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").cast("bigint").alias("active_users")
    )
    out = agg.select(
        F.col("w.start").alias("hour"), "event_type", "active_users"
    )
    return run_available_now(out, output_mode="append")



@query(
    "q_stream_join_window",
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    b AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    j AS (
      SELECT b.ts AS bts FROM c JOIN b ON c.user_id = b.user_id
        AND b.ts >= c.ts AND b.ts <= c.ts + INTERVAL 1 HOUR
    ),
    d AS (
      SELECT date_trunc('day', bts) AS day,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM j GROUP BY 1
    )
    SELECT d.* FROM d, wm WHERE day + INTERVAL 1 DAY <= wm.w
    """,
)
def q_stream_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful pair #3: a STREAM-STREAM interval join feeding
    a windowed aggregate in one append-mode query — daily counts of
    click→purchase pairs within an hour, the attribution-volume
    trendline computed without ever landing the joined fact table.
    The inner interval join emits pairs as matches arrive (state
    bounded by the watermark ± the hour bound); the downstream day
    window re-aggregates on the purchase-side event time and emits
    when the watermark passes the day (oracle-predicted, the
    chained-windows discipline). Completes the chained-operator
    matrix: agg→agg, dedup→agg, join→agg."""
    ev = stream_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("cu"), F.col("ts").alias("cts"))
        .withWatermark("cts", "1 hour")
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("bu"), F.col("ts").alias("bts"))
        .withWatermark("bts", "1 hour")
    )
    j = clicks.join(
        buys,
        (F.col("cu") == F.col("bu"))
        & (F.col("bts") >= F.col("cts"))
        & (F.col("bts") <= F.col("cts") + F.expr("INTERVAL 1 HOUR")),
    )
    agg = j.groupBy(F.window("bts", "1 day").alias("w")).agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )
    out = agg.select(F.col("w.start").alias("day"), "n_pairs")
    return run_available_now(out, output_mode="append")


#: per-(sf_dir) cache of the single-batch file used by the wall-clock
#: punctuate key (fixture prep runs once per session)
_PUNCT_WALL_BATCH: dict = {}


@query("q_stream_punctuate_wall")  # wall-clock timers — rows-only
def q_stream_punctuate_wall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALL_CLOCK_TIME punctuate (r7 verdict #5 — the other mode of the
    reference's stubbed callback, api.clj:26): per-key buffers flushed
    by PROCESSING-time timers — the latency-bound flush a production
    topology runs. One micro-batch of a small deterministic fixture
    slice (user_id < 10) arms every key's timer at batch time + 500 ms;
    the engine then schedules its own timer-check batches, so the
    harness runs a real processing-time trigger and POLLS the memory
    sink until every armed key has fired (the CLAUDE.md poll-the-sink
    pattern — `processAllAvailable` never settles while
    processing-time timers exist, tests/test_punctuate.py).

    Rows-only BY DESIGN: fired_at_ms is wall-clock (dropped from the
    output) and firing order is scheduler-dependent — but the emitted
    (key, n) set is deterministic (each key's buffer is its whole
    single-batch slice), and the returned total is re-derived
    decimal-exactly from the batch table (the q_stream_punctuate
    contract), so the rows themselves are stable run to run.
    Determinism bounds + armed-timestamp arithmetic are pinned by
    tests/test_punctuate.py::test_wall_clock_punctuate."""
    import os
    import time as _time
    import uuid

    from kafka_streams_clojure_spark.streaming.stateful import punctuate_flush

    ev_batch = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    if sf_dir not in _PUNCT_WALL_BATCH:
        root = scratch_dir("kscs_punct_wall_")
        p = os.path.join(root, "p0")
        ev_batch.select("user_id", "value", "ts").coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        _PUNCT_WALL_BATCH[sf_dir] = p
    p = _PUNCT_WALL_BATCH[sf_dir]
    n_keys = ev_batch.select("user_id").distinct().count()

    stream = (
        spark.readStream.schema("user_id bigint, value double, ts timestamp")
        .parquet(p)
    )
    out = punctuate_flush(
        stream, key_col="user_id", value_col="value", ts_col="ts",
        interval="500 ms", time_mode="wall",
    )
    name = f"punct_wall_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _time.time() + 120
        while _time.time() < deadline:
            if q.exception() is not None:
                raise q.exception()
            if spark.table(name).count() >= n_keys:
                break
            _time.sleep(0.5)
    finally:
        # a timer-check batch is always in flight on a live trigger —
        # quiet_stop suppresses the benign task-abort traces
        quiet_stop(q, spark)
    emitted = spark.table(name).persist()
    emitted.count()  # pin the memory-sink snapshot before the query object goes away
    if emitted.count() < n_keys:
        # loud-fail (repo convention): a partial snapshot would make this
        # rows-only key silently nondeterministic on a slow run
        fired = {r["key"] for r in emitted.select("key").collect()}
        missing = sorted(
            r["user_id"]
            for r in ev_batch.select("user_id").distinct().collect()
            if r["user_id"] not in fired
        )
        raise RuntimeError(
            f"wall-clock punctuate poll deadline expired with only "
            f"{emitted.count()}/{n_keys} keys fired; missing keys: {missing}"
        )
    exact = ev_batch.groupBy(F.col("user_id").alias("key")).agg(
        dsum("value").alias("total")
    )
    return emitted.select("key", "n").join(exact, "key").select("key", "n", "total")


@query("q_stream_semdedup_ingest")  # float k-means quantizer — rows-only
def q_stream_semdedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup at ingest — the EMBEDDING-space member of the
    ingest-dedup family (exact fp `q_stream_dedup_ingest`, MinHash
    `q_stream_near_dup_ingest`, now cosine): each micro-batch of
    incoming vectors is assigned to its nearest cell of a STANDING
    k-means quantizer (built once from the historical corpus — every
    3rd vector, the family's convention), probed against a standing
    cell-assigned index, dropped on any cosine >= 0.95 neighbor, and
    survivors are APPENDED to the index — so a paraphrase/re-encode
    arriving in a later batch is caught against an earlier batch's
    acceptance (the cross-batch contract,
    tests/test_incremental_passage_dedup.py planted-copy tests).

    Rows-only: the quantizer is iterative float k-means. Content is
    still deterministic on the fixtures (history members match
    themselves at cosine 1.0 and are dropped; the near-orthogonal
    fixture has no natural >= 0.95 cross pairs) — pinned by the
    invariant test, not an oracle. Scale shape: per batch, ONE
    broadcast-centroid assignment scan of the delta + a cell equi-join
    against ~√N-sized cells (operators/similarity.semdedup_ingest_delta
    docstring); the corpus is never rescanned."""
    from kafka_streams_clojure_spark.operators.similarity import (
        kmeans_centroids,
        semdedup_ingest_delta,
        _assign_cells,
    )

    hist = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 3 == 0
    )
    cent_root = scratch_dir("kscs_semdedup_cent_")
    idx_root = scratch_dir("kscs_semdedup_idx_")
    out_root = scratch_dir("kscs_semdedup_out_")
    # quantizer + seeded index, built once (in production these parquet
    # dirs ARE the persistent store, written by previous runs)
    kmeans_centroids(hist, k=None, iters=2).write.mode("overwrite").parquet(
        cent_root
    )
    cents0 = spark.read.parquet(cent_root)
    _assign_cells(
        hist.select("vec_id", "embedding"), cents0, id_cols=["vec_id"]
    ).select("vec_id", "cell", "embedding").write.mode("overwrite").parquet(
        idx_root
    )

    vecs = stream_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        cents = spark.read.parquet(cent_root)
        index = spark.read.parquet(idx_root)
        accepted, accepted_rows = semdedup_ingest_delta(
            batch_df, index, cents, threshold=0.95
        )
        # materialize the batch decision BEFORE mutating the store (the
        # accepted_rows plan reads idx_root): cut lineage so the append
        # never races its own input, and the cell probe runs once per batch
        accepted = accepted.localCheckpoint(eager=True)
        accepted_rows = accepted_rows.localCheckpoint(eager=True)
        accepted.select("vec_id", "label").write.mode("append").parquet(out_root)
        accepted_rows.write.mode("append").parquet(idx_root)
        batch_df.unpersist()

    q = vecs.writeStream.foreachBatch(ingest).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    return spark.read.parquet(out_root)


@query("q_stream_ann_ingest")  # iterative quantizer training — rows-only
def q_stream_ann_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-INDEX ingest — the SERVING-side member of the ingest family
    (the dedup members admit/drop; this one keeps the similarity index
    current): an IVF-PQ index is trained ONCE on the historical corpus
    (every 3rd vector, the family's convention) and persisted; each
    micro-batch of NEW vectors is then assigned + residual-encoded
    against the FROZEN quantizer/codebooks (`ivfpq_append` — the
    build's own kernels, nothing retrains, the corpus is never
    rescanned) and its code rows are APPENDED to the standing
    cell-partitioned store. The final search over the grown store is
    the returned result.

    Rows-only (nested iterative k-means); still deterministic on a
    fixed corpus AND independent of how the stream was micro-batched —
    append order never matters because codes are a keyed set and the
    ADC sum is decimal-cast. The invariant test pins search-over-
    streamed-store ≡ search after a frozen full re-encode of the whole
    corpus (tests/test_ann_maintenance.py). Scale shape: per batch one
    broadcast-centroid scan + one broadcast-codebook encode of the
    DELTA only; the store grows by m fixed-width rows per vector,
    partitioned by coarse cell exactly how the probe join prunes it.
    The when-to-retrain drift monitor is `q_llm_ivfpq_drift`."""
    import os

    from kafka_streams_clojure_spark.operators.similarity import (
        ivfpq_append,
        ivfpq_build,
        ivfpq_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    hist = emb.filter(F.col("vec_id") % 3 == 0)
    root = scratch_dir("kscs_ann_ingest_")
    cents_root = os.path.join(root, "cents")
    books_root = os.path.join(root, "books")
    codes_root = os.path.join(root, "codes")
    cents, books, codes = ivfpq_build(hist, m=8, ks=16)
    cents.write.mode("overwrite").parquet(cents_root)
    books.write.mode("overwrite").parquet(books_root)
    codes.write.mode("overwrite").partitionBy("__ivf_cell").parquet(codes_root)
    cents_s = spark.read.parquet(cents_root)
    books_s = spark.read.parquet(books_root)

    vecs = stream_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 3 != 0
    ).select("vec_id", "embedding")

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ivfpq_append(batch_df, cents_s, books_s, m=8).write.mode(
            "append"
        ).partitionBy("__ivf_cell").parquet(codes_root)

    q = vecs.writeStream.foreachBatch(ingest).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)

    codes_s = spark.read.parquet(codes_root)
    probes = emb.filter(F.col("vec_id") < 5)
    return ivfpq_search(cents_s, books_s, codes_s, probes, k=5, n_probe=4, m=8)


# One shared constant for the quota-ingest family, f-string-interpolated
# into BOTH the oracle SQL and the engine bodies (the _SESS_GAP_US
# discipline) so the two sides cannot silently drift (r9 advice).
_QUOTA_TOKENS = 800  # binds on every fixture SF — ~half the corpus cut at sf0.01


@query(
    "q_stream_quota_ingest",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      FROM t
    )
    SELECT doc_id, source, n_tokens FROM c WHERE cum <= {_QUOTA_TOKENS}
    """,
)
def q_stream_quota_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUOTA-at-ingest: per-source token-budget admission with STANDING
    state across micro-batches — the online form of `q_llm_source_quota`
    / `q_llm_budget_select`, and the fourth member of the ingest family
    (exact-fp, banded-MinHash, semantic-cell, now budget). Each batch:
    per-doc token counts, within-batch per-source prefix sums
    (doc_id-ordered), offset by the source's standing stream position
    from a persistent totals store; a doc is ADMITTED iff its cumulative
    stream position <= the 800-token quota (chosen to BIND on every fixture SF — ~half the corpus is cut at sf0.01, so the oracle actually exercises the boundary). The store then advances by
    the batch's FULL token mass (admitted or not).

    That last choice is what makes this oracle-able: admission depends
    only on each doc's PREFIX POSITION in the (source, doc_id) order —
    not on how the stream was batched — so any batch split yields the
    same admitted set as one batch (the incremental-agg mergeable-state
    argument), and DuckDB predicts it with one window prefix sum. The
    admit-if-it-fits knapsack variant would be batch-dependent and
    unverifiable. Cross-batch behavior is pinned by the planted test in
    tests/test_incremental_passage_dedup.py (two explicit deltas: the
    second batch's admissions see the first batch's totals).

    Scale shape: per batch one source-keyed window over the DELTA only
    plus a broadcast join against the totals store (rows = #sources —
    dimension-sized at any corpus scale); the store update is a
    full-outer merge of two source-keyed aggregates, materialized
    (localCheckpoint) before the overwrite so the write never races its
    own input (the r8 advice discipline)."""
    quota = _QUOTA_TOKENS
    tot_root = scratch_dir("kscs_quota_tot_")
    out_root = scratch_dir("kscs_quota_out_")
    # seed an EMPTY totals store with the right schema (first batch
    # reads it like any other)
    spark.createDataFrame([], "source string, total bigint").write.mode(
        "overwrite"
    ).parquet(tot_root)

    docs = stream_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        from kafka_streams_clojure_spark.operators.dedup import quota_admit_delta

        batch_df.persist()
        totals = spark.read.parquet(tot_root)
        admitted, new_totals = quota_admit_delta(batch_df, totals, quota)
        # materialize the batch decision BEFORE mutating the store (the
        # r8 advice discipline: the overwrite must never race the plan
        # that reads the same dir)
        admitted.localCheckpoint(eager=True).write.mode("append").parquet(
            out_root
        )
        new_totals.localCheckpoint(eager=True).write.mode(
            "overwrite"
        ).parquet(tot_root)
        batch_df.unpersist()

    q = docs.writeStream.foreachBatch(ingest).start()
    try:
        q.processAllAvailable()
    finally:
        quiet_stop(q, spark)
    return spark.read.parquet(out_root)


@query(
    "q_stream_ingest_pipeline",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, source,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    hist AS (
      SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
               AS fp
      FROM documents WHERE doc_id % 3 = 0
    ),
    fresh AS (
      SELECT doc_id, source, n_tokens
      FROM (SELECT f.*,
                   min(doc_id) OVER (PARTITION BY fp) AS first_id
            FROM f WHERE fp NOT IN (SELECT fp FROM hist))
      WHERE doc_id = first_id
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      FROM fresh
    )
    SELECT doc_id, source, n_tokens FROM c WHERE cum <= {_QUOTA_TOKENS}
    """,
)
def q_stream_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED ingest pipeline — the shape a reference user would
    actually deploy, chaining the ingest family's members in ONE
    foreachBatch with TWO standing stores: (1) exact dedup against a
    persistent fingerprint index (seeded with the historical corpus,
    every-3rd-doc as in q_stream_dedup_ingest; each batch's survivors
    APPEND their fps, so a later batch's re-crawl of an earlier
    acceptance is dropped), (2) within-batch keep-first per fingerprint,
    then (3) per-source token-quota admission at the DEDUPED stream
    position (operators/dedup.quota_admit_delta against the persistent
    totals store — the budget counts unique content only).

    All three stages are deterministic and batch-split invariant
    (first-occurrence-wins dedup + prefix-position quota), so the whole
    cross-batch-stateful composition carries an exact DuckDB oracle —
    the streaming analog of q_llm_refresh_curation's composed batch
    plan. Scale: per batch one fp anti-join against an id-width index
    (16 B/doc), one within-delta window, one broadcast totals join; the
    stores grow by fingerprint/source rows, never text."""
    from kafka_streams_clojure_spark.operators.text import fingerprint

    quota = _QUOTA_TOKENS
    idx_root = scratch_dir("kscs_pipe_idx_")
    tot_root = scratch_dir("kscs_pipe_tot_")
    out_root = scratch_dir("kscs_pipe_out_")
    hist = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
    )
    hist.write.mode("overwrite").parquet(idx_root)
    spark.createDataFrame([], "source string, total bigint").write.mode(
        "overwrite"
    ).parquet(tot_root)

    docs = stream_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        fingerprint(F.col("text")).alias("fp"),
        F.size(F.split(F.col("text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        from kafka_streams_clojure_spark.operators.dedup import (
            ingest_pipeline_delta,
        )

        batch_df.persist()
        index = spark.read.parquet(idx_root)
        totals = spark.read.parquet(tot_root)
        admitted, fresh_fps, new_totals = ingest_pipeline_delta(
            batch_df, index, totals, quota
        )
        # materialize every decision BEFORE mutating either store
        admitted = admitted.localCheckpoint(eager=True)
        fresh_fps = fresh_fps.localCheckpoint(eager=True)
        new_totals = new_totals.localCheckpoint(eager=True)
        admitted.write.mode("append").parquet(out_root)
        fresh_fps.write.mode("append").parquet(idx_root)
        new_totals.write.mode("overwrite").parquet(tot_root)
        batch_df.unpersist()

    q = docs.writeStream.foreachBatch(ingest).start()
    try:
        q.processAllAvailable()
    finally:
        quiet_stop(q, spark)
    return spark.read.parquet(out_root)


_SESS_GAP_US = 24 * 3600 * 10**6   # inactivity gap: 24 h
_SESS_CAP_US = 96 * 3600 * 10**6   # max session duration: 96 h


@query(
    "q_agg_session_capped",
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tu, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    scan(user_id, rn, tu, sess_start, sess_idx) AS (
      SELECT user_id, rn, tu, tu, CAST(1 AS BIGINT) FROM e WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.rn, e.tu,
             CASE WHEN e.tu - s.tu > {_SESS_GAP_US}
                    OR e.tu - s.sess_start > {_SESS_CAP_US}
                  THEN e.tu ELSE s.sess_start END,
             s.sess_idx + CASE WHEN e.tu - s.tu > {_SESS_GAP_US}
                                 OR e.tu - s.sess_start > {_SESS_CAP_US}
                               THEN 1 ELSE 0 END
      FROM e JOIN scan s ON e.user_id = s.user_id AND e.rn = s.rn + 1
    )
    SELECT user_id, sess_idx,
           CAST(min(tu) AS BIGINT) AS start_us,
           CAST(max(tu) AS BIGINT) AS end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM scan GROUP BY user_id, sess_idx
    """,
)
def q_agg_session_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPPED sessionization — inactivity gap AND max-session-duration
    (the GA4/Amplitude session model: a 24 h gap starts a new session,
    and a session is force-closed after 96 h even under continuous
    activity). The duration cap makes the semantics genuinely
    SEQUENTIAL — each break depends on the running session's START, so
    no window/gaps-and-islands form exists (Spark's native
    `session_window` and the q_agg_session_window/dynamic pair express
    only the gap rule). Implemented as the custom-operator escape
    hatch the survey prescribes: an Arrow-batched grouped-map
    (`applyInPandas`) running the per-user linear scan; the oracle
    computes the identical scan as a recursive CTE, so even this
    sequential operator stays EXACT-oracle-gated (timestamps compared
    as integer epoch-µs — the TZ-immune discipline).

    Scale: state per task is one user's event list (the same per-key
    bound every applyInPandasWithState key carries); shuffle is one
    user-keyed exchange; recursion depth = max events/user only on the
    ORACLE side. The scan itself is the VECTORIZED per-session kernel
    over a mapInPandas batch spanning many users
    (operators/sessionize.capped_sessions: one np.diff gap pass + one
    searchsorted per session — r10, closing the r9 verdict's last
    row-at-a-time batch path AND the per-group pandas overhead that
    was the key's actual 5 s bench cost). Session rows:
    (user, idx, start, end, n)."""
    from kafka_streams_clojure_spark.operators.sessionize import (
        capped_sessions,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("tu"),
        "event_id",
    )
    return capped_sessions(ev, _SESS_GAP_US, _SESS_CAP_US)


@query(
    "q_stream_session_capped",
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tu, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    scan(user_id, rn, tu, sess_start, sess_idx) AS (
      SELECT user_id, rn, tu, tu, CAST(1 AS BIGINT) FROM e WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.rn, e.tu,
             CASE WHEN e.tu - s.tu > {_SESS_GAP_US}
                    OR e.tu - s.sess_start > {_SESS_CAP_US}
                  THEN e.tu ELSE s.sess_start END,
             s.sess_idx + CASE WHEN e.tu - s.tu > {_SESS_GAP_US}
                                 OR e.tu - s.sess_start > {_SESS_CAP_US}
                               THEN 1 ELSE 0 END
      FROM e JOIN scan s ON e.user_id = s.user_id AND e.rn = s.rn + 1
    ),
    sess AS (
      SELECT user_id, sess_idx,
             CAST(min(tu) AS BIGINT) AS start_us,
             CAST(max(tu) AS BIGINT) AS end_us,
             CAST(count(*) AS BIGINT) AS n_events
      FROM scan GROUP BY user_id, sess_idx
    ),
    last AS (SELECT user_id, max(sess_idx) AS mx FROM sess GROUP BY user_id)
    SELECT s.user_id, s.sess_idx, s.start_us, s.end_us, s.n_events
    FROM sess s JOIN last l USING (user_id)
    WHERE s.sess_idx < l.mx
    """,
)
def q_stream_session_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING twin of `q_agg_session_capped`: the sequential
    gap+cap sessionizer as per-key ENGINE STATE
    (`streaming/stateful.capped_sessionizer`) — state = the one open
    session, each batch continues the scan and emits the sessions it
    CLOSES, and the open session rides the state store across batches
    (boundaries identical under any time-ordered batch split — the
    same argument that oracle-gates the ingest family). Emission is
    deterministic: exactly every session EXCEPT each user's final
    still-open one, which the oracle predicts by dropping each user's
    max session index from the batch recursive-CTE scan. The pair
    completes the session matrix: native gap (batch+stream), dynamic
    gap, and now capped — batch grouped-map AND streaming state."""
    from kafka_streams_clojure_spark.streaming.stateful import (
        capped_sessionizer,
    )

    ev = stream_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("tu"),
        "event_id",
    )
    return run_available_now(
        capped_sessionizer(ev, _SESS_GAP_US, _SESS_CAP_US),
        output_mode="append",
    )


def _cdc_ingest_oracle() -> str:
    from kafka_streams_clojure_spark.operators.dedup import cdc_chunks_sql_ctes

    return f"""
    WITH {cdc_chunks_sql_ctes()},
    hist AS (
      SELECT DISTINCT chunk_hash FROM chunks WHERE doc_id % 3 = 0
    ),
    novel AS (
      SELECT doc_id, chunk_hash FROM (
        SELECT doc_id, chunk_hash,
               min(doc_id) OVER (PARTITION BY chunk_hash) AS first_doc
        FROM chunks
        WHERE chunk_hash NOT IN (SELECT chunk_hash FROM hist))
      WHERE doc_id = first_doc
    ),
    acc AS (
      SELECT doc_id, count(DISTINCT chunk_hash) AS n_novel
      FROM novel GROUP BY doc_id
    ),
    tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
      FROM chunks GROUP BY doc_id
    )
    SELECT d.doc_id, d.source, t.n_chunks,
           CAST(a.n_novel AS BIGINT) AS n_novel
    FROM documents d JOIN tot t USING (doc_id) JOIN acc a USING (doc_id)
    """


@query("q_stream_cdc_ingest", oracle=_cdc_ingest_oracle())
def q_stream_cdc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-level dedup at ingest — the FIFTH member of the ingest
    family (exact-fp, banded-MinHash, semantic-cell, budget, now
    content-defined chunks): each micro-batch is CDC-chunked by the
    zero-char-exchange numpy kernel (`operators/dedup.cdc_chunk_rows`,
    r10 verdict #3 — chunk rows only, bit-identical md5 identity to the
    windowed oracle twin) and probed against a STANDING
    chunk-hash store (seeded from the every-3rd-doc historical corpus,
    the family convention); a doc is ADMITTED iff it contributes at
    least one NOVEL chunk — so a re-crawl that prepends a banner or
    shifts bytes is still dropped (its realigned chunks all match),
    while a doc that is mostly old but adds one new paragraph lands.
    Accepted docs report (n_chunks, n_novel); the store grows by the
    batch's novel hashes only (16 B each — provably sufficient: every
    first occurrence of a non-hist chunk lives in an ACCEPTED doc, so
    the novel set closes the store over all previous docs' chunks).

    Exact oracle despite two levels of cross-batch state: chunk
    boundaries are per-doc local, novelty depends only on each chunk's
    global FIRST-occurrence doc (keep-first prefix argument — the same
    one that oracle-gates the pipeline key), so any time-ordered batch
    split yields the same admissions, and DuckDB predicts them with
    one window min over the shared CDC chunk CTEs. Cross-batch planted
    test in tests/test_incremental_passage_dedup.py. Scale: per batch
    one Arrow-kernel chunk pass over the DELTA, one hash anti-join against
    an id-width store, one within-delta window — never delta × corpus
    text. Batch core: `operators/dedup.cdc_ingest_delta` (cross-batch
    contract tested there directly)."""
    from kafka_streams_clojure_spark.operators.dedup import (
        cdc_chunk_rows,
        cdc_ingest_delta,
    )

    store_root = scratch_dir("kscs_cdc_store_")
    out_root = scratch_dir("kscs_cdc_out_")
    hist = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    )
    # store init + per-batch chunking both use the r11 zero-char-exchange
    # kernel (bit-identical md5 chunk identity, so the oracle holds)
    cdc_chunk_rows(hist).select("chunk_hash").distinct().write.mode(
        "overwrite"
    ).parquet(store_root)

    docs = stream_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        store = spark.read.parquet(store_root)
        accepted, new_hashes = cdc_ingest_delta(batch_df, store)
        # materialize the batch decision BEFORE mutating the store (the
        # r8 discipline: the append must never race the plan reading
        # the same dir; the chunk pass itself is checkpointed inside
        # cdc_ingest_delta)
        accepted = accepted.localCheckpoint(eager=True)
        new_hashes = new_hashes.localCheckpoint(eager=True)
        accepted.write.mode("append").parquet(out_root)
        new_hashes.write.mode("append").parquet(store_root)
        batch_df.unpersist()

    q = docs.writeStream.foreachBatch(ingest).start()
    try:
        q.processAllAvailable()
    finally:
        quiet_stop(q, spark)
    return spark.read.parquet(out_root)
