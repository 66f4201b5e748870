"""Checkpoint recovery: a streaming query killed mid-stream and
restarted from its checkpoint must deliver every record EXACTLY once
(the engine's replacement for the reference's per-record commit,
api.clj:33 — micro-batch offsets in the checkpoint WAL + an idempotent
epoch-keyed sink)."""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

from kafka_streams_clojure_spark.queries._util import load_table


def _split_events(spark, sf_dir, d, n_files=6):
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    step = n // n_files + 1
    for i in range(n_files):
        (
            ev.filter(
                (F.col("event_id") >= i * step) & (F.col("event_id") < (i + 1) * step)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(d, f"part_{i}"))
        )
    return ev


def test_exactly_once_across_restart(spark, sf_dir):
    src = tempfile.mkdtemp(prefix="kscs_ckpt_src_")
    ckpt = tempfile.mkdtemp(prefix="kscs_ckpt_wal_")
    out = tempfile.mkdtemp(prefix="kscs_ckpt_out_")
    batch_ev = _split_events(spark, sf_dir, src)
    schema = batch_ev.schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "part_*"))
        )

        def sink(bdf, epoch_id):
            # idempotent epoch-keyed sink: a replayed epoch overwrites
            # its own directory instead of duplicating records
            bdf.select("event_id", "user_id", "value").write.mode("overwrite").parquet(
                os.path.join(out, f"epoch={epoch_id}")
            )

        return (
            stream.writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .start()
        )

    # phase 1: process a couple of batches, then kill the query
    q = start()
    deadline = time.time() + 60
    while time.time() < deadline and len(q.recentProgress) < 2:
        time.sleep(0.3)
    assert len(q.recentProgress) >= 1, "no batch completed before kill"
    q.stop()
    q.awaitTermination(30)

    # phase 2: restart from the same checkpoint, drain the rest
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
        q2.awaitTermination(30)

    got = spark.read.parquet(out).select("event_id")
    total = batch_ev.count()
    assert got.count() == total, "record count diverged after restart"
    assert got.distinct().count() == total, "duplicate records after recovery"
