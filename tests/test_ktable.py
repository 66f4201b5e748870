"""KTable semantics: tombstone handling + observe (peek) metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_clojure_spark.api import KStream
from kafka_streams_clojure_spark.operators.ktable import latest_by_key


def test_tombstone_deletes_only_when_newest(spark):
    """Kafka tombstone contract: a null-value record deletes the key
    only if it is the LATEST record for that key."""
    rows = [
        # key 1: value then tombstone (tombstone newest) -> deleted
        (1, "a", 10, 1),
        (1, None, 20, 2),
        # key 2: tombstone then value (value newest) -> survives
        (2, None, 10, 3),
        (2, "b", 20, 4),
        # key 3: plain updates -> latest wins
        (3, "x", 10, 5),
        (3, "y", 20, 6),
    ]
    df = spark.createDataFrame(rows, "k int, v string, ts int, seq int")
    out = {
        r.k: r.v
        for r in latest_by_key(
            df, ["k"], ["ts", "seq"], ["v"], drop_tombstones="v"
        ).collect()
    }
    assert out == {2: "b", 3: "y"}


def test_peek_observe_metrics(spark):
    """`peek` parity via df.observe: metrics are collected without
    touching the data path."""
    from pyspark.sql import Observation

    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id int, v double")
    obs = Observation("peek")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    result = observed.filter(F.col("id") >= 0)
    assert result.count() == 100
    assert obs.get["n"] == 100
    assert obs.get["total"] == float(sum(range(100)))


def test_kstream_peek_passthrough(spark):
    ks = KStream(spark.createDataFrame([(1,)], "id int"))
    assert ks.peek("noop").to_df().count() == 1
