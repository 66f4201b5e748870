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
- interactive reads: a ``foreachBatch``→parquet store (written
  executor-side, read back as a lazy parquet scan with pushdown) —
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

#: parquet stores created by run_available_now, removable via clear_stores
_STORE_DIRS: list[str] = []


def clear_stores() -> None:
    """Delete every parquet store created by :func:`run_available_now`
    in this session. Call between pipelines in long-lived sessions (the
    stores otherwise accumulate until interpreter exit). Any DataFrame
    previously returned by ``run_available_now`` becomes invalid —
    materialize what you need first."""
    while _STORE_DIRS:
        shutil.rmtree(_STORE_DIRS.pop(), ignore_errors=True)


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
    from kafka_streams_clojure_spark.session import _EVENT_TIME_COLS, normalize_event_time

    batch = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    stream = spark.readStream.schema(batch.schema).parquet(_as_stream_dir(sf_dir, name))
    # shared event-time fixups (same mapping as session.load_table):
    # bigint nanos OR naive timestamp_ntz -> TimestampType
    return normalize_event_time(stream, _EVENT_TIME_COLS.get(name, ()))


#: JVM loggers that print benign-but-alarming stack traces when a LIVE
#: trigger query is stopped mid-batch (the in-flight timer-check batch
#: of a processing-time punctuate has its tasks interrupted: state-store
#: commit aborts, memory-sink write aborts, task failures — all expected
#: consequences of stop(), all rethrown as real exceptions if anything
#: is actually wrong). Silenced ONLY inside quiet_stop's window.
_NOISY_SHUTDOWN_LOGGERS = (
    "org.apache.spark.sql.execution.datasources.v2.WriteToDataSourceV2Exec",
    "org.apache.spark.util.Utils",
    "org.apache.spark.executor.Executor",
    "org.apache.spark.scheduler.TaskSetManager",
    "org.apache.spark.sql.execution.streaming.checkpointing.ChecksumCheckpointFileManager",
    "org.apache.spark.sql.execution.streaming.MicroBatchExecution",
    "org.apache.spark.sql.execution.datasources.v2.DataWritingSparkTask",
    "org.apache.spark.TaskContextImpl",
)


def quiet_stop(query, spark: SparkSession, timeout: int = 30) -> None:
    """Stop a streaming query whose trigger may have a batch IN FLIGHT
    (processing-time timers never settle — CLAUDE.md) without the
    benign task-abort stack traces drowning the driver/sweep stderr
    (r8 verdict hygiene item): the known shutdown-noise loggers are
    set OFF for the stop window and restored to ERROR after the
    interrupted tasks have died. Correctness signals are unaffected —
    real failures surface as exceptions from ``stop``/
    ``awaitTermination``/``query.exception()``, which this does not
    touch (loud-fail convention)."""
    import time as _time

    jvm = spark.sparkContext._jvm
    configurator = jvm.org.apache.logging.log4j.core.config.Configurator
    level = jvm.org.apache.logging.log4j.Level
    for name in _NOISY_SHUTDOWN_LOGGERS:
        configurator.setLevel(name, level.OFF)
    try:
        query.stop()
        query.awaitTermination(timeout)
        _time.sleep(0.5)  # let the interrupted tasks finish dying
    finally:
        for name in _NOISY_SHUTDOWN_LOGGERS:
            configurator.setLevel(name, level.ERROR)


def run_available_now(
    df: DataFrame,
    output_mode: str = "update",
    state_partitions: int | None = 8,
    upsert_keys: "list[str] | None" = None,
) -> DataFrame:
    """Execute a streaming DataFrame to completion over the currently
    available data (Trigger.AvailableNow semantics via
    processAllAvailable) into a ``foreachBatch`` → parquet store;
    return a LAZY reader over that store.

    Scale shape: result rows never pass through the driver as data —
    each micro-batch is written by executor tasks to a parquet store
    (``complete`` mode overwrites the store each epoch, the
    materialized-view shape; ``append``/``update`` append). The
    returned DataFrame is a plain parquet scan, so interactive reads
    over the store get predicate pushdown and column pruning like any
    batch table.

    Deployment notes (local-mode assumptions made explicit):

    - the store lives under a driver-created tempdir on the LOCAL
      filesystem — correct in local mode where driver and executors
      share a disk. A multi-node deployment must pass a store path on
      a filesystem shared by driver and executors (HDFS/S3/NFS);
      executor-side writes to ``file:`` paths would land on each
      executor's own disk and the driver-side read-back would miss
      them.
    - plain ``update`` mode is append-implemented, which is only
      correct when the whole input arrives in ONE micro-batch (true
      here: ``_as_stream_dir`` exposes a single file and no
      ``maxFilesPerTrigger`` is set, so AvailableNow yields one
      batch). The ``_to_store`` sink ENFORCES this — a second
      data-carrying micro-batch in ``update`` mode raises instead of
      silently leaving stale per-key rows in the store.
    - pass ``upsert_keys`` to make multi-epoch ``update`` streams
      CORRECT: each epoch appends rows stamped with ``__epoch``, and
      the returned reader compacts latest-row-per-key lazily
      (``max_by`` over the epoch — the KTable changelog-compaction
      shape, an executor-side MERGE emulation on plain parquet). The
      compaction is one shuffle on the upsert key at read time; a
      production deployment with Delta/Iceberg available swaps the
      append+compact pair for a real MERGE and keeps the same reader
      contract. CONTRACT (ENFORCED): the streamed query must emit at
      most one row per key per micro-batch — true for streaming
      AGGREGATES (what update mode exists for). A custom stateful query
      emitting several rows for one key in one epoch would hit a
      ``max_by`` tie on ``__epoch`` and keep an arbitrary one, so the
      sink checks per-epoch key uniqueness on each batch (one count
      over the persisted batch — batch-sized, not stream-sized) and
      raises naming the duplicated keys instead of compacting silently.
      ``upsert_keys`` is only meaningful with ``output_mode='update'``
      — any other mode raises.
    - each call leaves its store directory on disk until interpreter
      exit (the reader stays lazy, so eager cleanup would race it).
      Long-lived sessions sweeping many streaming keys can call
      :func:`clear_stores` between pipelines — the streaming analogue
      of ``session.clear_caches``.

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
    _STORE_DIRS.append(store)
    schema = df.schema
    write_mode = "overwrite" if output_mode == "complete" else "append"
    if upsert_keys and output_mode != "update":
        raise ValueError(
            f"upsert_keys is only meaningful with output_mode='update' "
            f"(got {output_mode!r}): append would duplicate keys across "
            "epochs and complete already overwrites — a silent plain "
            f"{output_mode} store with no compaction is never what the "
            "caller wanted"
        )
    upserting = bool(upsert_keys)

    def _to_store(batch_df: DataFrame, epoch_id: int) -> None:
        if upserting:
            # Loud per-epoch key-uniqueness guard: the reader's max_by
            # compaction is only well-defined when each epoch carries at
            # most one row per key (true for streaming aggregates). A
            # violating query must fail HERE, not silently keep an
            # arbitrary row at read time. Persist so the guard count and
            # the write share one computation of the batch.
            batch_df.persist()
            try:
                dup = (
                    batch_df.groupBy(*upsert_keys)
                    .agg(F.count("*").alias("__n"))
                    .filter(F.col("__n") > 1)
                    .limit(5)
                    .collect()
                )
                if dup:
                    raise RuntimeError(
                        f"run_available_now(upsert_keys={upsert_keys}): epoch "
                        f"{epoch_id} emitted multiple rows for key(s) "
                        f"{[tuple(r[k] for k in upsert_keys) for r in dup]} — "
                        "the latest-per-key compaction would keep an arbitrary "
                        "one. Upsert stores require at-most-one row per key "
                        "per micro-batch (streaming aggregates); use plain "
                        "append mode for multi-row emitters."
                    )
                batch_df.withColumn("__epoch", F.lit(int(epoch_id))).write.mode(
                    "append"
                ).parquet(store)
            finally:
                batch_df.unpersist()
            return
        if output_mode == "update" and epoch_id > 0:
            # Watermarked queries legitimately run a trailing NO-DATA
            # batch (watermark advance/state eviction) — nothing to
            # write, nothing stale. A later batch WITH rows would leave
            # stale per-key rows next to their epoch-0 versions: refuse.
            if batch_df.isEmpty():
                return
            raise RuntimeError(
                "run_available_now: plain 'update' mode is append-implemented "
                "and correct only for a single data-carrying micro-batch; "
                f"this source produced rows in epoch {epoch_id}. Pass "
                "upsert_keys=[...] for a compacted multi-epoch update store "
                "(or use a Delta/Iceberg MERGE sink in production)."
            )
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
    if upserting:
        from pyspark.sql import types as T

        stamped = T.StructType(
            list(schema.fields) + [T.StructField("__epoch", T.IntegerType())]
        )
        raw = spark.read.schema(stamped).parquet(store)
        val_cols = [c for c in schema.names if c not in upsert_keys]
        # latest-per-key compaction (KTable log compaction): the newest
        # epoch's row wins; within an epoch update mode emits one row
        # per key, so max_by is unambiguous.
        return (
            raw.groupBy(*upsert_keys)
            .agg(F.max_by(F.struct(*val_cols), F.col("__epoch")).alias("__v"))
            .select(*upsert_keys, "__v.*")
        )
    return spark.read.schema(schema).parquet(store)
