"""Sources & sinks (SURVEY.md §2.1).

Reference surface: ``stream`` (topics → KStream, api.clj:57-60), sink
``.to`` (api.clj:163-164), ``through`` repartition points (api.clj:55).
Spark-first mapping: batch readers for the file formats, Structured
Streaming's Kafka source/sink for topics. The Kafka connector needs the
spark-sql-kafka package on the classpath — absent in this container, so
those builders are constructed lazily and validated at call time, with
the wiring (options, schema shape) real and unit-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streams_clojure_spark.session import load_table

#: Schema every Kafka source row carries (the [key value] record model
#: of the reference plus stream metadata — SURVEY §1.1).
KAFKA_SOURCE_COLUMNS = (
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
)


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Batch scan of parquet/csv/json/orc with pushdown + pruning.
    Pass ``schema`` (DDL string or StructType) for text formats — inference is a
    second data pass AND a correctness lottery on empty/typed columns.
    """
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).load(path)


def stream_topics(spark: SparkSession, brokers: str, *topics: str, starting: str = "earliest") -> DataFrame:
    """`stream` parity (api.clj:57-60): subscribe to one or more topics
    as an unbounded [key value] DataFrame. Multiple names join into one
    subscription exactly like the reference's varargs Collection."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting)
        .load()
    )


def to_topic(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    """Sink `.to` parity (api.clj:163-164): write a streaming frame to a
    topic. Expects `key`/`value` (binary or string) columns — the
    2-tuple record contract. Returns the StreamingQuery."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def through(df: DataFrame, n_partitions: int, *cols: str) -> DataFrame:
    """`through` parity (api.clj:55): an explicit repartition point —
    the intermediate-topic idiom without materializing a topic."""
    return df.repartition(n_partitions, *cols) if cols else df.repartition(n_partitions)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] | list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned sink: one directory per partition-column
    value. The 100 TB reason: readers filtering on the partition column
    prune entire directories at PLANNING time (PartitionFilters in the
    scan node) — a date- or source-partitioned corpus makes
    "yesterday's crawl only" read 1/N of the data instead of scanning
    and discarding. Dynamic overwrite replaces only touched partitions
    (incremental daily loads don't clobber history)."""
    (
        df.write.format(fmt)
        .mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .save(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: tuple[str, ...] | list[str],
    n_buckets: int,
    sort_by: tuple[str, ...] | list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (`through` taken to storage): rows are
    hash-clustered into ``n_buckets`` files per partition by
    ``bucket_by``, so two tables bucketed the same way equi-join with
    ZERO shuffles — the join reads co-located buckets directly. This is
    the batch analog of the reference's co-partitioned topics
    (repartition through an intermediate topic, api.clj:55): pay the
    clustering once at write time, reuse it across every downstream
    join/agg on the key. ``sort_by`` additionally orders within
    buckets (sort-merge join without the sort step)."""
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    shuffle: bool = False,
) -> int:
    """Small-file compaction — the table-maintenance pass every
    streaming/incremental sink eventually needs: micro-batch and
    per-task writes accumulate thousands of KB-sized files, and at
    100 TB the NameNode/listing pressure plus per-file open cost
    dominate scan time long before the bytes do. Rewrites ``src_path``
    into ``ceil(total_bytes / target_file_bytes)`` files at
    ``dst_path`` and returns that file count.

    Input size comes from the filesystem metadata of the scan's own
    file list (``df.inputFiles()`` + Hadoop ``FileStatus`` — works on
    any Hadoop-visible FS, not just local), so the sizing needs no
    data pass. ``shuffle=False`` (default) uses ``coalesce`` — merges
    partitions with NO exchange, the right tool when output files may
    inherit input clustering; ``shuffle=True`` re-balances skewed
    inputs through one round-robin ``repartition`` exchange at the
    cost of destroying any existing sort order. Compaction is a
    REWRITE, not in-place: swap directories atomically at the catalog/
    manifest layer (or use Delta/Iceberg OPTIMIZE where available —
    this helper is the plain-parquet form of it)."""
    import math

    df = spark.read.format(fmt).load(src_path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        total += p.getFileSystem(conf).getFileStatus(p).getLen()
    n_out = max(1, math.ceil(total / target_file_bytes))
    sized = df.repartition(n_out) if shuffle else df.coalesce(n_out)
    sized.write.format(fmt).mode("overwrite").save(dst_path)
    return n_out
