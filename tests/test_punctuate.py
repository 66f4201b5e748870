"""punctuate_flush: Kafka-Streams punctuate parity (stream-time and
wall-clock timers) driven through real multi-batch Structured
Streaming runs. Emissions happen ONLY in the timeout branch — the
assertions pin the armed-timestamp arithmetic, the flush-and-clear
contract, and the not-yet-due key staying silent.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import functions as F

from kafka_streams_clojure_spark.streaming.stateful import punctuate_flush

_TS0 = "2024-01-01 00:00:00"


def _write_batch(spark, d, name, rows, mtime):
    path = os.path.join(d, name)
    spark.createDataFrame(rows, "user_id string, value double, ts timestamp").coalesce(
        1
    ).write.mode("overwrite").parquet(path)
    for root, _, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))
    os.utime(path, (mtime, mtime))
    return path


def _run_to_memory(stream_df, out_df_builder):
    name = f"punct_{uuid.uuid4().hex[:8]}"
    q = out_df_builder.writeStream.outputMode("append").format("memory").queryName(
        name
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    return name


def test_stream_time_punctuate_fires_on_watermark(spark, tmp_path):
    """Key 'a' (January data) is armed at max(a.ts)+1h; key 'b'
    (February data) pushes the watermark past that -> 'a' flushes with
    its full buffer; 'b' (armed in the future) stays silent."""
    import datetime as dt

    d = str(tmp_path)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    _write_batch(
        spark,
        d,
        "p0",
        [("a", 1.0, t0), ("a", 2.0, t0 + dt.timedelta(minutes=1)), ("a", 3.0, t0 + dt.timedelta(minutes=2))],
        mtime=1_000_000,
    )
    _write_batch(
        spark,
        d,
        "p1",
        [("b", 5.0, dt.datetime(2024, 2, 1, 0, 0, 0))],
        mtime=2_000_000,
    )
    stream = (
        spark.readStream.schema("user_id string, value double, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(d, "p*"))
        .withWatermark("ts", "1 minute")
    )
    out = punctuate_flush(stream, interval="1 hour", time_mode="stream")
    name = _run_to_memory(stream, out)
    rows = spark.table(name).collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert r.key == "a" and r.n == 3 and r.total == 6.0
    # armed at a's max ts (00:02) + 1 hour, in epoch ms (UTC session)
    armed = int((t0 + dt.timedelta(minutes=62)).replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert r.fired_at_ms == armed, (r.fired_at_ms, armed)


def test_stream_time_punctuate_accumulates_across_batches(spark, tmp_path):
    """A key with data in BOTH batches re-arms past the watermark and
    flushes once, with the COMBINED buffer, when a third batch's
    watermark passes its armed time."""
    import datetime as dt

    d = str(tmp_path)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    _write_batch(spark, d, "p0", [("a", 1.0, t0)], mtime=1_000_000)
    _write_batch(
        spark, d, "p1", [("a", 2.0, t0 + dt.timedelta(minutes=5))], mtime=2_000_000
    )
    _write_batch(
        spark, d, "p2", [("z", 9.0, dt.datetime(2024, 3, 1, 0, 0, 0))], mtime=3_000_000
    )
    stream = (
        spark.readStream.schema("user_id string, value double, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(d, "p*"))
        .withWatermark("ts", "1 minute")
    )
    out = punctuate_flush(stream, interval="1 hour", time_mode="stream")
    name = _run_to_memory(stream, out)
    got = {r.key: r for r in spark.table(name).collect()}
    assert set(got) == {"a"}
    assert got["a"].n == 2 and got["a"].total == 3.0
    # armed in batch 1 at t0+1h; batch 2's data does NOT slide the timer
    armed = int((t0 + dt.timedelta(hours=1)).replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert got["a"].fired_at_ms == armed


def test_wall_clock_punctuate(spark, tmp_path):
    """WALL_CLOCK_TIME flavor: the timer fires interval-of-real-time
    after the key's batch. The engine keeps scheduling timer-check
    batches on its own, so the harness POLLS the sink rather than
    calling processAllAvailable (which never settles while
    processing-time timers exist — see the punctuate_flush docstring).
    """
    import datetime as dt

    d = str(tmp_path)
    t0 = dt.datetime(2024, 1, 1)
    _write_batch(spark, d, "p0", [("a", 1.0, t0), ("a", 1.5, t0)], mtime=1_000_000)
    stream = (
        spark.readStream.schema("user_id string, value double, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(d, "p*"))
    )
    out = punctuate_flush(stream, interval="500 ms", time_mode="wall")
    name = f"punct_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        deadline = time.time() + 120
        rows = []
        while time.time() < deadline and not rows:
            assert q.exception() is None, q.exception()
            rows = spark.table(name).collect()
            time.sleep(0.5)
    finally:
        from kafka_streams_clojure_spark.streaming import quiet_stop

        quiet_stop(q, spark)
    got = {r.key: r for r in rows}
    assert "a" in got and got["a"].n == 2 and got["a"].total == 2.5


def test_punctuate_rejects_bad_args(spark, sf_dir):
    import pytest

    from kafka_streams_clojure_spark.streaming import stream_table

    ev = stream_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="time_mode"):
        punctuate_flush(ev, interval="1 hour", time_mode="nope")
    with pytest.raises(ValueError, match="interval"):
        punctuate_flush(ev, interval="soon", time_mode="stream")


def test_wall_clock_punctuate_registered_key_content(spark, sf_dir):
    """The registered rows-only key q_stream_punctuate_wall must emit
    exactly one row per fixture key (user_id < 10), each carrying its
    FULL single-batch buffer — (key, n, total) equal to the batch
    aggregation, with total decimal-exact. Only firing time is
    nondeterministic; content is pinned here."""
    import __spark_entry__ as entrymod

    from kafka_streams_clojure_spark.queries._util import dsum, load_table

    got = {
        (int(r.key), int(r.n), float(r.total))
        for r in entrymod.queries()["q_stream_punctuate_wall"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    want = {
        (int(r.key), int(r.n), float(r.total))
        for r in ev.groupBy(F.col("user_id").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total"))
        .collect()
    }
    assert got == want
