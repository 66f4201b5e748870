"""Incremental stream-stream join correctness: the oracle keys run the
interval joins over ONE micro-batch; here the same full-outer join is
driven across THREE time-ordered micro-batches (watermark stepping up
between them, evicting and emitting state at each step) and the
accumulated output must STILL equal the batch-predicted result — i.e.
the engine's incremental emission decomposes correctly.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.queries._util import load_table
from kafka_streams_clojure_spark.streaming import scratch_dir

_JOIN_COND = (
    "l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 5 MINUTES "
    "AND r.ts <= l.ts + INTERVAL 5 MINUTES"
)


@pytest.fixture(scope="module")
def time_split_dir(spark, sf_dir):
    """events split into 3 parquet files by TIME TERCILES with forced
    modification times, so maxFilesPerTrigger=1 feeds them oldest-first
    and the watermark steps up between micro-batches."""
    ev = load_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3
    bounds = [lo + span, lo + 2 * span]
    d = scratch_dir("kscs_tsplit_")
    preds = [
        F.col("ts") < bounds[0],
        (F.col("ts") >= bounds[0]) & (F.col("ts") < bounds[1]),
        F.col("ts") >= bounds[1],
    ]
    for i, pred in enumerate(preds):
        p = os.path.join(d, f"p{i}")
        ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(p)
        for root, _, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(root, fn), (1_000_000 * (i + 1),) * 2)
        os.utime(p, (1_000_000 * (i + 1),) * 2)
    return d


def _split_stream(spark, d, schema, event_type):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(d, "p*"))
        .filter(F.col("event_type") == event_type)
        .withWatermark("ts", "1 hour")
    )


def test_full_outer_join_across_micro_batches(spark, sf_dir, time_split_dir):
    ev = load_table(spark, sf_dir, "events")
    purchases = _split_stream(spark, time_split_dir, ev.schema, "purchase").alias("l")
    clicks = _split_stream(spark, time_split_dir, ev.schema, "click").alias("r")
    joined = purchases.join(clicks, F.expr(_JOIN_COND), "full_outer").select(
        F.col("l.event_id").alias("purchase_id"),
        F.col("r.event_id").alias("click_id"),
    )
    name = f"sj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = sum(
            1 for p in q.recentProgress if p["numInputRows"] > 0
        )
    finally:
        q.stop()
    assert n_batches >= 3, f"expected >= 3 data micro-batches, got {n_batches}"
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }

    # batch-predicted expectation: matches + both sides' unmatched rows
    # whose join window closed before the FINAL watermark
    l = ev.filter(F.col("event_type") == "purchase").alias("l")
    r = ev.filter(F.col("event_type") == "click").alias("r")
    wm_row = (
        l.agg(F.max("ts").alias("ml"))
        .crossJoin(r.agg(F.max("ts").alias("mr")))
        .select(
            (F.least("ml", "mr") - F.expr("INTERVAL 1 HOUR")).alias("wm")
        )
        .collect()[0]
    )
    matched = {
        (a, b)
        for a, b in l.join(r, F.expr(_JOIN_COND))
        .select(F.col("l.event_id"), F.col("r.event_id"))
        .collect()
    }
    lone_l = {
        (a, None)
        for (a,) in l.join(r, F.expr(_JOIN_COND), "left_anti")
        .filter(F.col("ts") + F.expr("INTERVAL 5 MINUTES") < F.lit(wm_row.wm))
        .select("event_id")
        .collect()
    }
    lone_r = {
        (None, b)
        for (b,) in r.join(l, F.expr(
            "r.user_id = l.user_id AND l.ts >= r.ts - INTERVAL 5 MINUTES "
            "AND l.ts <= r.ts + INTERVAL 5 MINUTES"
        ), "left_anti")
        .filter(F.col("ts") + F.expr("INTERVAL 5 MINUTES") < F.lit(wm_row.wm))
        .select("event_id")
        .collect()
    }
    expected = matched | lone_l | lone_r
    assert got == expected, (
        f"incremental output diverged: missing={sorted(expected - got)[:5]} "
        f"extra={sorted(got - expected)[:5]} "
        f"(|got|={len(got)}, |expected|={len(expected)})"
    )
