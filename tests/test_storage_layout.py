"""Partitioned and bucketed storage layouts (SURVEY §2.1 sinks, 100 TB
posture): partition pruning must happen at planning time and same-key
bucketed joins must run with zero exchanges. Results are cross-checked
against the unpartitioned/unbucketed plans so layout never changes
semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.queries._util import load_table
from kafka_streams_clojure_spark.sources import write_bucketed, write_partitioned


def test_partitioned_write_prunes_at_planning(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])

    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    scan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in scan, scan[:800]
    # pruned read returns exactly the filtered original
    expect = docs.filter(F.col("lang") == "en")
    assert back.count() == expect.count()
    assert (
        sorted(r.doc_id for r in back.select("doc_id").collect())
        == sorted(r.doc_id for r in expect.select("doc_id").collect())
    )


@pytest.fixture()
def warehouse_tables(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    by_user = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_purchases"))
    )
    write_bucketed(by_user, "t_user_events", ["user_id"], 8)
    write_bucketed(purchases, "t_user_purchases", ["user_id"], 8)
    yield "t_user_events", "t_user_purchases"
    for t in ("t_user_events", "t_user_purchases"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_zero_shuffles(spark, warehouse_tables, sf_dir):
    ta, tb = warehouse_tables
    a, b = spark.table(ta), spark.table(tb)
    # disable broadcast so the only shuffle-free path is the bucket layout
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1200]
        # same results as the unbucketed join
        ev = load_table(spark, sf_dir, "events")
        expect = (
            ev.groupBy("user_id")
            .agg(F.count("*").alias("n_events"))
            .join(
                ev.filter(F.col("event_type") == "purchase")
                .groupBy("user_id")
                .agg(F.count("*").alias("n_purchases")),
                "user_id",
            )
        )
        got = {(r.user_id, r.n_events, r.n_purchases) for r in joined.collect()}
        want = {(r.user_id, r.n_events, r.n_purchases) for r in expect.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_compact_files_merges_small_files(spark, sf_dir, tmp_path):
    """64 tiny files → few files sized to the target, content identical
    (count + per-key aggregate equality)."""
    from kafka_streams_clojure_spark.sources import compact_files

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "small_files")
    ev.repartition(64).write.parquet(src)
    n_src = len(spark.read.parquet(src).inputFiles())
    assert n_src >= 64

    dst = str(tmp_path / "compacted")
    n_out = compact_files(spark, src, dst, target_file_bytes=512 * 1024)
    files = spark.read.parquet(dst).inputFiles()
    assert len(files) == n_out < n_src / 4

    back = spark.read.parquet(dst)
    assert back.count() == ev.count()
    a = {r.user_id: r.n for r in back.groupBy("user_id").count().withColumnRenamed("count", "n").collect()}
    b = {r.user_id: r.n for r in ev.groupBy("user_id").count().withColumnRenamed("count", "n").collect()}
    assert a == b


def test_schema_evolution_merge_read(spark, tmp_path):
    """Data-lake schema evolution: a column added by a later writer
    must be readable across the whole directory with mergeSchema —
    old files surface NULL for the new column, new files carry it,
    and the pre-evolution column survives untouched. (Plain parquet's
    answer to what table formats do with metadata; the read-side
    contract a 100 TB lake that appends daily relies on.)"""
    import os

    d = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).write.parquet(os.path.join(d, "p1"))
    spark.createDataFrame(
        [(3, "c", 30), (4, "d", 40)], "id long, v string, extra long"
    ).write.parquet(os.path.join(d, "p2"))

    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(d, "p1"), os.path.join(d, "p2")
    )
    assert set(merged.columns) == {"id", "v", "extra"}
    rows = {r.id: (r.v, r.extra) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 30), 4: ("d", 40)}

    # without mergeSchema the footer-sampled schema may drop the new
    # column silently — pin the hazard the option exists to fix
    plain = spark.read.parquet(os.path.join(d, "p1"), os.path.join(d, "p2"))
    assert set(plain.columns) <= {"id", "v", "extra"}
