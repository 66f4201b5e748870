"""Misra–Gries heavy-hitter sketch (`operators/sketch.py`).

Deterministic contracts (hold for ANY partition layout, so they are
testable even though the estimates themselves are layout-dependent):

- ``est(x) <= true(x) <= est(x) + err`` for every emitted item,
- ``err <= n / (capacity + 1)``,
- every item with ``true(x) > err`` appears in the merged summary,
- ``heavy_hitters_sketch`` output is a SUPERSET of the exact
  ``> phi·n`` heavy hitters when ``capacity + 1 >= 1/phi``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.operators.sketch import (
    heavy_hitters_sketch,
    mg_summary,
)
from kafka_streams_clojure_spark.session import load_table


def _exact_counts(df, col):
    return {
        r["item"]: r["cnt"]
        for r in df.select(F.col(col).cast("string").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }


def _check_mg_contract(df, col, capacity):
    true = _exact_counts(df, col)
    n = sum(true.values())
    rows = mg_summary(df, col, capacity).collect()
    assert rows, "summary must not be empty on non-empty input"
    err = rows[0]["err"]
    assert all(r["err"] == err for r in rows), "err is a global constant column"
    assert err <= n // (capacity + 1) + 1, (err, n, capacity)
    for r in rows:
        t = true.get(r["item"], 0)
        assert r["est"] <= t <= r["est"] + err, (r["item"], r["est"], t, err)
    emitted = {r["item"] for r in rows}
    for item, t in true.items():
        if t > err:
            assert item in emitted, (item, t, err)


def test_mg_contract_on_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    _check_mg_contract(ev, "user_id", capacity=64)


def test_mg_contract_tight_capacity(spark, sf_dir):
    """Capacity far below distinct-item count: decrements MUST fire and
    the bounds must still hold."""
    ev = load_table(spark, sf_dir, "events")
    _check_mg_contract(ev, "user_id", capacity=8)


def test_mg_skewed_synthetic(spark):
    """One planted 40% item among uniform noise, many partitions."""
    df = (
        spark.range(0, 5000, 1, 16)
        .select(
            F.when(F.col("id") % 5 < 2, F.lit("HOT"))
            .otherwise(F.concat(F.lit("u"), (F.col("id") % 997).cast("string")))
            .alias("item")
        )
    )
    _check_mg_contract(df, "item", capacity=32)
    hh = heavy_hitters_sketch(df, "item", phi=0.1, capacity=32).collect()
    assert "HOT" in {r["item"] for r in hh}


def test_sketch_superset_of_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        str(r["user_id"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 80)
        .collect()
    }
    sk = {
        r["item"]
        for r in heavy_hitters_sketch(ev, "user_id", capacity=256, min_count=80).collect()
    }
    assert exact and exact <= sk, exact - sk


def test_exchange_is_capacity_bounded(spark):
    """The rows leaving mapInPandas are <= (capacity + 1) per partition."""
    df = spark.range(0, 10000, 1, 4).select((F.col("id") % 2000).cast("string").alias("item"))
    cap = 16
    from kafka_streams_clojure_spark.operators.sketch import _SUMMARY_SCHEMA, _mg_partition

    parts = df.select(F.col("item")).mapInPandas(_mg_partition(cap), _SUMMARY_SCHEMA)
    per_part = parts.groupBy(F.spark_partition_id().alias("p")).count().collect()
    assert all(r["count"] <= cap + 1 for r in per_part), per_part


def test_validation():
    with pytest.raises(ValueError, match="capacity"):
        mg_summary(None, "x", capacity=0)
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters_sketch(None, "x", phi=1.5)
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters_sketch(None, "x", phi=None, min_count=None)


# ── Count-Min sketch contracts ──────────────────────────────────────


def test_cms_never_underestimates(spark, sf_dir):
    """est(x) >= true(x) for every probed item — counters only add."""
    from kafka_streams_clojure_spark.operators.sketch import cms_query, cms_table

    ev = load_table(spark, sf_dir, "events")
    true = _exact_counts(ev, "event_type")
    table = cms_table(ev, "event_type")
    est = {
        r.item: r.est
        for r in cms_query(
            table, ev.select("event_type").distinct(), "event_type"
        ).collect()
    }
    assert set(est) == set(true)
    for k in true:
        assert est[k] >= true[k], (k, est[k], true[k])


def test_cms_mass_conservation(spark, sf_dir):
    """Every depth row holds exactly n counts in total."""
    from kafka_streams_clojure_spark.operators.sketch import cms_table

    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    per_d = {
        r.d: r.total
        for r in cms_table(ev, "user_id")
        .groupBy("d")
        .agg(F.sum("cnt").alias("total"))
        .collect()
    }
    assert set(per_d) == {0, 1, 2, 3}
    assert all(v == n for v in per_d.values()), per_d


def test_cms_overestimate_bounded(spark, sf_dir):
    """With depth 4 the min-of-rows estimate stays within the classic
    e·n/width collision band on the fixture (deterministic seeds)."""
    import math

    from kafka_streams_clojure_spark.operators.sketch import cms_query, cms_table

    ev = load_table(spark, sf_dir, "events")
    width = 512
    n = ev.count()
    true = _exact_counts(ev, "user_id")
    table = cms_table(ev, "user_id", width=width)
    est = {
        r.item: r.est
        for r in cms_query(
            table, ev.select("user_id").distinct(), "user_id", width=width
        ).collect()
    }
    bound = math.e * n / width
    bad = {k: (est[k], true[k]) for k in true if est[k] - true[k] > bound}
    assert not bad, f"overestimates beyond e*n/width: {bad}"


def test_cms_absent_item_zero_or_collision(spark, sf_dir):
    """An item never inserted estimates 0 unless every one of its cells
    collides — on the fixture with width 512 it must be small."""
    from kafka_streams_clojure_spark.operators.sketch import cms_query, cms_table

    ev = load_table(spark, sf_dir, "events")
    table = cms_table(ev, "event_type")
    ghost = spark.createDataFrame([("never-seen-type",)], "event_type string")
    est = cms_query(table, ghost, "event_type").collect()[0].est
    assert est <= ev.count() // 100
