"""Fluent KStream facade: the reference's golden pipeline and API
shapes through the fluent surface (mirrors test_golden_reference but
exercises api.KStream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_clojure_spark.api import KStream


def test_golden_pipeline_fluent(spark):
    kv = spark.createDataFrame([("foo", "bar"), ("baz", "quux")], "key string, value string")
    out = (
        KStream(kv)
        .filter(F.col("value").isNotNull())
        .map(key=F.col("value"), value=F.col("key"))
        .filter(F.col("value") == "foo")
        .to_df()
        .collect()
    )
    assert [(r.key, r.value) for r in out] == [("bar", "foo")]


def test_branch_shapes_fluent(spark):
    """Mirrors the reference's topology-shape tests (api_test.clj:71-89):
    branch returns a list, branch_map a name-keyed dict."""
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, s string")
    ks = KStream(df)
    branches = ks.branch(F.col("s") == "a", F.col("s") == "b")
    assert isinstance(branches, list) and len(branches) == 2
    assert all(isinstance(b, KStream) for b in branches)
    named = ks.branch_map({"as": F.col("s") == "a", "rest": F.lit(True)})
    assert set(named) == {"as", "rest"}
    assert named["as"].to_df().count() == 1
    assert named["rest"].to_df().count() == 2


def test_transduce_and_join_fluent(spark, sf_dir):
    ev = KStream.from_table(spark, sf_dir, "events")
    cust = KStream.from_table(spark, sf_dir, "customer")
    from kafka_streams_clojure_spark import xform as X

    purchases = ev.transduce(
        X.filter_(F.col("event_type") == "purchase"),
        X.map_("event_id", "user_id", "value"),
    )
    enriched = purchases.join(
        cust, purchases.to_df().user_id == cust.to_df().c_custkey, broadcast_other=True
    )
    n = enriched.to_df().count()
    assert n > 0
    assert "c_name" in enriched.to_df().columns


def test_merge_and_through(spark, sf_dir):
    ev = KStream.from_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click")
    b = ev.filter(F.col("event_type") == "view")
    merged = a.merge(b).through(8, "user_id")
    assert merged.to_df().count() == a.to_df().count() + b.to_df().count()
    assert merged.to_df().rdd.getNumPartitions() == 8


def test_value_joiner_combine_step(spark, sf_dir):
    """value-joiner parity (api.clj:90-94): an explicit combine step
    installed on KStream.join appends the combined column."""
    from pyspark.sql import functions as F

    from kafka_streams_clojure_spark.api import KStream, value_joiner

    ev = KStream.from_table(spark, sf_dir, "events")
    cust = KStream.from_table(spark, sf_dir, "customer")
    vj = value_joiner(
        lambda name, val: F.concat_ws("=", name, val.cast("string")),
        "joined_value",
        "c_name",
        "value",
    )
    out = ev.join(
        cust, ev.df.user_id == cust.df.c_custkey, broadcast_other=True, joiner=vj
    ).to_df()
    row = out.filter(out.joined_value.isNotNull()).head()
    assert row is not None
    assert row["joined_value"] == f"{row['c_name']}={row['value']}"


def test_take_per_partition_semantics(spark, sf_dir):
    """Reference per-partition take (api.clj:41-45): exactly min(n,
    group size) rows per key, and they are the earliest by the pinned
    order."""
    from pyspark.sql import functions as F

    from kafka_streams_clojure_spark import xform as X
    from kafka_streams_clojure_spark.queries._util import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    took = X.take(2, order_by=["ts", "event_id"], per_partition_key=["user_id"])(ev)
    counts = took.groupBy("user_id").count().collect()
    assert counts and all(r["count"] <= 2 for r in counts)
    # the kept rows per key are exactly the 2 earliest
    first = (
        ev.groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("m"))
        .select("user_id", F.col("m.event_id").alias("event_id"))
    )
    missing = first.join(took, ["user_id", "event_id"], "left_anti")
    assert missing.count() == 0
