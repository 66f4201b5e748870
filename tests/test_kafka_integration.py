"""Optional end-to-end Kafka integration — the analog of the
reference's embedded-broker golden test (embedded_kafka.clj:70-88,
api_test.clj:44-69): produce records to a topic, run the golden
transducer pipeline over the Kafka source, read the sink topic back,
assert the transformed records.

Gated on a live broker: set ``KAFKA_BOOTSTRAP=host:port`` (and have
the spark-sql-kafka package on the Spark classpath) to run; skipped
cleanly otherwise — this container ships neither a broker nor the
connector jar.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")


def _kafka_env_probe() -> tuple[bool, str]:
    """Probe the environment each run (mirrors embedded_kafka.clj:70-88's
    'bring your own broker' setup): is the spark-sql-kafka connector jar
    on the classpath, is a broker binary on PATH, is KAFKA_BOOTSTRAP
    set? Returns (runnable, report) — the report lands in the pytest
    skip line so the moment the environment ships the jar + broker the
    e2e runs (or its blocker is named) without a code change."""
    jar_dirs = []
    if os.environ.get("SPARK_HOME"):
        jar_dirs.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    try:
        import pyspark

        jar_dirs.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:
        pass
    jars = sorted(
        j
        for d in jar_dirs
        for j in glob.glob(os.path.join(d, "*spark-sql-kafka*.jar"))
    )
    broker = next(
        (
            b
            for b in ("kafka-server-start.sh", "kafka-server-start", "redpanda")
            if shutil.which(b)
        ),
        None,
    )
    report = (
        f"KAFKA_BOOTSTRAP={BOOTSTRAP or 'unset'}; "
        f"connector jar={'found: ' + os.path.basename(jars[0]) if jars else 'ABSENT from ' + (':'.join(jar_dirs) or '<no jar dirs>')}; "
        f"broker binary={'found: ' + broker if broker else 'ABSENT from PATH'}"
    )
    return bool(BOOTSTRAP and jars), report


_RUNNABLE, _REPORT = _kafka_env_probe()

pytestmark = pytest.mark.skipif(
    not _RUNNABLE, reason=f"Kafka e2e blocked — {_REPORT}"
)


def test_golden_pipeline_over_kafka(spark, tmp_path):
    """Reference golden test shape: input topic → filter/map/filter →
    output topic (api_test.clj:44-69). Uses AvailableNow so the
    streaming query drains and stops deterministically."""
    from kafka_streams_clojure_spark import xform as X
    from kafka_streams_clojure_spark.sources import stream_topics, to_topic

    run = uuid.uuid4().hex[:8]
    in_topic, out_topic = f"kscs-in-{run}", f"kscs-out-{run}"

    # Produce the golden input batch with Spark's batch Kafka sink.
    seed = spark.createDataFrame(
        [("k1", "foo"), ("k2", "bar"), ("k3", "foo")], "key string, value string"
    )
    (
        seed.selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", in_topic)
        .save()
    )

    # The golden pipeline (test_golden_reference.py runs the same xform
    # chain on an in-memory frame): keep non-null, swap k/v, keep "foo".
    src = stream_topics(spark, BOOTSTRAP, in_topic).select(
        F.col("key").cast("string"), F.col("value").cast("string")
    )
    piped = X.transduce(
        src,
        lambda df: df.filter(F.col("value").isNotNull()),
        X.map_(key=F.col("value"), value=F.col("key")),
        lambda df: df.filter(F.col("key") == "foo"),
    ).selectExpr("CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value")

    q = to_topic(piped, BOOTSTRAP, out_topic, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)

    out = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", out_topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(F.col("key").cast("string"), F.col("value").cast("string"))
        .collect()
    )
    got = sorted((r.key, r.value) for r in out)
    assert got == [("foo", "k1"), ("foo", "k3")]
