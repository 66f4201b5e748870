"""SparkSession bootstrap + fixture table loading.

Single place where the engine's scale-oriented defaults live. The
settings mirror what we would deploy on a large cluster (AQE on, skew
join handling on, Arrow transfers on, UTC session timezone for
oracle-comparable timestamps); only ``master`` and the partition count
are local-mode artifacts, overridable via env.

Env knobs (driver contract):
- ``SPARK_GRAFT_CPUS``   — local core count (default: all).
- ``SPARK_GRAFT_SF_DIR`` — default fixture dir for ad-hoc runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: All driver-generated fixture tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always be broadcast in joins.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "kafka_streams_clojure_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    At cluster scale ``master`` comes from spark-submit; in this repo we
    run ``local[N]``. ``spark.sql.shuffle.partitions`` defaults to the
    local core count — at 100 TB you would size it to ~2-3x total cores
    (or let AQE coalesce, which stays enabled here).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)
    # One BLAS thread per Python worker: Spark's task threads are the
    # parallelism; per-worker multi-threaded GEMMs oversubscribe (r12,
    # measured 1.4x on q_llm_ann_probe_curve). Set in the driver env
    # BEFORE the JVM launches (local workers inherit it) and as
    # executorEnv for cluster mode; the kernels also self-pin via
    # operators.similarity._limit_blas_threads for externally-built
    # sessions whose JVM predates this import.
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Split files finer than the 128 MB default so a 32-core local
        # run (and a wide cluster) gets real scan parallelism; AQE
        # coalesces back if partitions end up tiny.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffledHashJoinFactor", "3")
        # The events fixture stores ts as parquet TIMESTAMP(NANOS), which
        # vanilla Spark rejects; read as long and convert in load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs every engine query depends on — applied defensively
    because the driver hands us an externally-built SparkSession:
    nanos timestamps must read as long (events.ts), and the session
    timezone must be UTC so timestamp values compare equal to the
    (UTC-naive) DuckDB oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


#: Declared event-time columns per fixture table. The physical parquet
#: encoding of these has CHANGED between driver rounds (TIMESTAMP(NANOS)
#: through round 2, naive timestamp[us] from round 3), so the engine
#: normalizes to TimestampType whatever encoding it finds — see
#: :func:`normalize_event_time`.
_EVENT_TIME_COLS = {"events": ("ts",)}

# Back-compat alias (streaming/__init__ and older tests import this name).
_NANOS_TS_COLS = _EVENT_TIME_COLS


def normalize_event_time(df: DataFrame, cols) -> DataFrame:
    """Coerce declared event-time columns to ``TimestampType`` regardless
    of the physical parquet encoding:

    - ``bigint`` — parquet TIMESTAMP(NANOS) read via ``nanosAsLong``;
      all fixture values are µs-aligned so ``div 1000`` is lossless;
    - ``timestamp_ntz`` — naive µs timestamps (Spark 4 reads those as
      NTZ, which ``withWatermark`` rejects). The session is forced UTC,
      so an NTZ→timestamp cast is a pure type relabel: the stored
      values are identical and stay equal to DuckDB's naive reading;
    - ``timestamp`` — already correct, no-op.

    Every fixture read path (batch ``load_table``, streaming
    ``stream_table``, ``api.KStream.from_parquet``) funnels through
    this so downstream ``withWatermark`` / window operators always see
    an event-time-capable column.
    """
    dtypes = dict(df.dtypes)
    for col in cols:
        dt = dtypes.get(col)
        if dt == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        elif dt == "string":
            # defensive: an ISO-string re-encoding of the fixture would
            # otherwise silently break every event-time operator; the
            # forced-UTC session makes the parse unambiguous.
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        elif dt is not None and dt != "timestamp":
            raise TypeError(
                f"event-time column {col!r} has unhandled physical type "
                f"{dt!r} — extend session.normalize_event_time (the fixture "
                "encoding has flipped before; failing loudly beats a broken "
                "withWatermark)"
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (columnar parquet scan; Catalyst pushes
    filters/projections down into the scan automatically)."""
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return normalize_event_time(df, _EVENT_TIME_COLS.get(name, ()))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Read several fixture tables at once."""
    return tuple(load_table(spark, sf_dir, n) for n in names)


def clear_caches(spark: SparkSession) -> None:
    """Release every cached DataFrame in the session.

    Operators that read an expensive intermediate from multiple plan
    branches (`branch`, `ngram_jaccard_pairs`, `minhash_lsh_pairs`,
    `simhash_near_dups`, `lsh_cosine_pairs`, `winnow_shared_chunks`)
    persist it for the duration of their computation; the blocks stay
    referenced until the session drops them. Long-lived sessions
    running many such operators should call this between pipelines
    (the bench does)."""
    spark.catalog.clearCache()
