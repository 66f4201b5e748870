"""Bucketed (pre-partitioned) co-located join — the 100 TB technique
for REPEATED fact⋈fact joins: write both sides bucketed by the join
key once, and every subsequent join on that key needs NO shuffle
exchange at read time (each bucket pair joins locally; at cluster
scale each executor reads matching bucket files).

This is a plan-shape demonstration rather than a driver query key:
the driver contract reads the immutable sf-dir parquet (unbucketed),
so co-location is exercised here on bucketed copies written to
scratch. SCALE.md documents when to reach for it (orders⋈lineitem
run nightly; amortize ONE bucketed write against N shuffle-free
joins).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafka_streams_clojure_spark.plans import physical_plan
from kafka_streams_clojure_spark.queries._util import load_table
from kafka_streams_clojure_spark.streaming import scratch_dir

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    """orders + lineitem written bucketed by order key (external tables
    in scratch — no spark-warehouse litter)."""
    for name, key in [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]:
        tbl = f"bkt_{name}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", scratch_dir(f"kscs_bkt_{name}_"))
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    yield "bkt_orders", "bkt_lineitem"
    for tbl in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Both sides bucketed on the join key into the same bucket count →
    the sort-merge join runs with ZERO shuffle exchanges (the whole
    point: at 100 TB the exchange IS the cost).

    At the test SF orders fits a broadcast, and Spark rightly prefers
    BHJ + disables bucketing — so the fact⋈fact regime (neither side
    broadcastable, exactly where bucketing matters) is simulated by
    turning broadcast off for the assertion."""
    bo, bl = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(bo).join(
            spark.table(bl), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = physical_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    """Co-location changes the plan, never the answer."""
    bo, bl = bucketed_tables
    bucketed_n = (
        spark.table(bo)
        .join(spark.table(bl), F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    plain_n = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert bucketed_n == plain_n


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Bucketing feeds AGGREGATION too: a groupBy on the bucket key
    reuses the on-disk partitioning — no exchange before the final
    aggregate."""
    _, bl = bucketed_tables
    agg = spark.table(bl).groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = physical_plan(agg)
    assert "Exchange" not in plan, f"bucketed groupBy still shuffles:\n{plan}"
