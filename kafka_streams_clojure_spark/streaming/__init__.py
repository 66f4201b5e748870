"""Structured Streaming surface (SURVEY.md §2.9).

The reference's streaming model: unbounded partitioned logs (Kafka
topics) as sources/sinks (api.clj:57-60), per-record transducer
execution (api.clj:20-33), stateful transducers over ordered KV stores
as the parity roadmap (README.md:66-68), and an interactive read API
over those stores (api.clj:102-152).

Spark-first mapping:
- sources: ``readStream`` (file source over the fixtures in tests —
  the same code takes ``format("kafka")`` in production; see
  :mod:`kafka_streams_clojure_spark.sources`);
- the combinator layer (:mod:`..xform`) applies unchanged to streaming
  DataFrames — an xform is just ``DataFrame -> DataFrame``;
- per-record commit (api.clj:33) is deliberately NOT mirrored: Spark
  checkpoints per micro-batch (BASELINE.md engineering targets);
- interactive reads: a ``memory``-sink table queried with SQL —
  point lookup / range / full scan parity with get/range/all.

Everything runs through ``Trigger.AvailableNow`` in tests so a bounded
fixture drives the streaming engine to a deterministic final answer
(batch/stream parity, BASELINE.md).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.session import _ensure_session_confs, load_table


_SCRATCH_ROOT: list[str] = []  # lazily created, removed at interpreter exit


def scratch_dir(prefix: str = "kscs_") -> str:
    """A temp dir under a single session-scoped root that is removed
    atexit — sink/roundtrip keys can write here and hand back *lazy*
    readers without racing a per-call rmtree."""
    if not _SCRATCH_ROOT:
        root = tempfile.mkdtemp(prefix="kscs_scratch_")
        _SCRATCH_ROOT.append(root)
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT[0])


_STREAM_DIRS: dict[tuple[str, str], str] = {}


def _as_stream_dir(sf_dir: str, name: str) -> str:
    """Spark's file streaming source requires a *directory*; the
    fixtures are single files. Expose each as a one-file directory via
    a symlink in a cached temp dir (read-only on the fixture; removed
    atexit via the shared scratch root)."""
    key = (sf_dir, name)
    if key not in _STREAM_DIRS:
        d = scratch_dir(f"kscs_stream_{name}_")
        os.symlink(os.path.join(sf_dir, f"{name}.parquet"), os.path.join(d, f"{name}.parquet"))
        _STREAM_DIRS[key] = d
    return _STREAM_DIRS[key]


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Open a fixture table as an unbounded streaming DataFrame (file
    source). Schema comes from the batch reader (streaming sources
    can't infer), including the nanos→timestamp fixups for events."""
    _ensure_session_confs(spark)
    from kafka_streams_clojure_spark.session import _NANOS_TS_COLS

    batch = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(_as_stream_dir(sf_dir, name))
    # shared nanos→µs fixups (same mapping as session.load_table)
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(stream.dtypes).get(col) == "bigint":
            stream = stream.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return stream


def run_available_now(
    df: DataFrame,
    output_mode: str = "update",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Execute a streaming DataFrame to completion over the currently
    available data (Trigger.AvailableNow semantics via
    processAllAvailable) into a ``foreachBatch`` → parquet store;
    return a LAZY reader over that store.

    Scale shape: results never touch the driver — each micro-batch is
    written executor-side to a session-scoped parquet store
    (``complete`` mode overwrites the store each epoch, the
    materialized-view shape; ``append``/``update`` append). The
    returned DataFrame is a plain parquet scan, so interactive reads
    over the store get predicate pushdown and column pruning like any
    batch table. A production deployment swaps the store path for a
    durable location (and an upsert/Delta MERGE for multi-epoch
    ``update`` streams) and keeps the query running; the single
    AvailableNow pass used in tests makes append ≡ update ≡ the batch
    answer, which the oracles check.

    ``state_partitions`` caps ``spark.sql.shuffle.partitions`` for this
    query only (restored after): a streaming aggregate creates one
    state store per shuffle partition, and over a small bounded fixture
    the store setup dominates runtime (measured ~2× at 32 vs 8 over
    10k rows). Results are partition-count-independent. Pass ``None``
    in production and size the session conf to the cluster instead —
    the cap exists so a 100-key correctness sweep stays cheap.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None and int(prev) > state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    store = scratch_dir("kscs_store_")
    schema = df.schema
    write_mode = "overwrite" if output_mode == "complete" else "append"

    def _to_store(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode(write_mode).parquet(store)

    try:
        q = df.writeStream.outputMode(output_mode).foreachBatch(_to_store).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # Explicit schema: a zero-row stream leaves an empty store dir, and
    # the batch reader must still return the declared shape.
    return spark.read.schema(schema).parquet(store)
