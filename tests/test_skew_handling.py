"""Skew handling at runtime: AQE's skew-join split must actually
activate on a planted hot key (SCALE.md "Global posture" relies on it
for joins we don't pre-salt). A test that only sets the conf proves
nothing — this one asserts the executed plan shows the skew markers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # tuned down so a ~MB-scale hot partition trips the detector
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_planted_skew_join(spark, skew_confs):
    """One key holds ~99% of the left side. After execution, the final
    adaptive plan must mark the sort-merge join partitions skew=true
    (AQE split the hot partition across tasks) and the result must
    still be exact."""
    n_hot, n_cold = 200_000, 2_000
    left = spark.range(n_hot).select(
        F.lit(0).alias("k"), F.col("id").alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    ).union(
        spark.range(n_cold).select(
            (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
    )
    right = spark.range(51).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    # keep v in the output: pruning it would shrink the hot partition's
    # shuffle bytes below any realistic skew threshold (constant k
    # compresses to nothing); drop only the fat pad column
    joined = left.join(right, "k").select("k", "v", "w")
    rows = [(int(r.k), int(r.v), int(r.w)) for r in joined.collect()]
    # correctness: every left row found its right match exactly once
    from collections import Counter

    by_key = Counter(k for k, _, _ in rows)
    assert by_key[0] == n_hot
    assert sum(by_key.values()) == n_hot + n_cold
    assert all(w == k * 10 for k, _, w in rows)

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan[:500]
    assert "skew=true" in plan, f"AQE did not split the hot partition:\n{plan[:2000]}"


def test_salted_join_equals_plain_join(spark):
    from kafka_streams_clojure_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, f"l{i}") for i in range(500)] + [(2, "x"), (3, "y")],
        "k bigint, lv string",
    )
    right = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (4, "unmatched")], "k bigint, rv string"
    )
    got = sorted(
        (r.k, r.lv, r.rv) for r in salted_join(left, right, ["k"], n_salts=4).collect()
    )
    exp = sorted((r.k, r.lv, r.rv) for r in left.join(right, "k").collect())
    assert got == exp  # 500 hot-key rows all matched exactly once


def test_salted_join_left_outer_and_validation(spark):
    import pytest

    from kafka_streams_clojure_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, "a"), (9, "m")], "k bigint, lv string")
    right = spark.createDataFrame([(1, "r")], "k bigint, rv string")
    rows = {r.k: r.rv for r in salted_join(left, right, ["k"], how="left").collect()}
    assert rows == {1: "r", 9: None}
    with pytest.raises(ValueError, match="salted_join"):
        salted_join(left, right, ["k"], how="full")


def test_salted_join_key_includes_salt(spark, sf_dir):
    """The physical join key must carry __salt — that's the whole
    mechanism (each hot key spread over n reducers)."""
    import __spark_entry__ as entrymod
    from kafka_streams_clojure_spark.plans import physical_plan

    plan = physical_plan(entrymod.queries()["q_join_salted"](spark, sf_dir))
    assert "__salt" in plan, plan


def test_hot_key_guard_passes_bounded_keys(spark):
    """Within-bound keys flow through unchanged (rows and values)."""
    from kafka_streams_clojure_spark.operators.skew import hot_key_guard

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k bigint, v string"
    )
    got = sorted((r.k, r.v) for r in hot_key_guard(df, ["k"], 5).collect())
    assert got == [(1, "a"), (1, "b"), (2, "c")]


def test_hot_key_guard_trips_on_synthetic_hot_key(spark):
    """r5 verdict #2's 'done' condition: a pathological hub must fail
    LOUDLY at execution time, naming the key and its count."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from kafka_streams_clojure_spark.operators.skew import hot_key_guard

    hot = [(7, f"s{i}") for i in range(50)] + [(8, "x")]
    df = spark.createDataFrame(hot, "k bigint, v string")
    with pytest.raises(Exception) as ei:
        hot_key_guard(df, ["k"], max_count=10, op_name="wedge-test").collect()
    msg = str(ei.value)
    assert "wedge-test" in msg and "key=(7)" in msg and "count=50" in msg


def test_hot_key_guard_null_keys_guarded_not_dropped(spark):
    """CLAUDE.md null-safe rule: null IS a key (a groupBy group). The
    guard must (a) pass null-keyed rows through when within bound —
    a plain equi-join-back would silently DROP them — and (b) trip on
    a hot null key like any other."""
    import pytest

    from kafka_streams_clojure_spark.operators.skew import hot_key_guard

    df = spark.createDataFrame(
        [(None, "n1"), (None, "n2"), (1, "a")], "k bigint, v string"
    )
    got = sorted(
        ((r.k, r.v) for r in hot_key_guard(df, ["k"], 5).collect()),
        key=lambda t: (t[0] is None, t),
    )
    assert got == [(1, "a"), (None, "n1"), (None, "n2")]

    hot_null = [(None, f"s{i}") for i in range(20)] + [(3, "x")]
    dfh = spark.createDataFrame(hot_null, "k bigint, v string")
    with pytest.raises(Exception) as ei:
        hot_key_guard(dfh, ["k"], max_count=10, op_name="null-test").collect()
    assert "null-test" in str(ei.value) and "count=20" in str(ei.value)


def test_cap_per_key_truncates_deterministically(spark):
    from kafka_streams_clojure_spark.operators.skew import cap_per_key

    df = spark.createDataFrame(
        [(1, i) for i in range(10)] + [(2, 0)], "k bigint, o bigint"
    )
    got = sorted(
        (r.k, r.o) for r in cap_per_key(df, ["k"], 3, ["o"]).collect()
    )
    assert got == [(1, 0), (1, 1), (1, 2), (2, 0)]


def test_wedge_queries_carry_hot_key_guard(spark, sf_dir):
    """The two quadratic wedge keys plan with the guard's degree join
    (the __kn raise_error path) — asserted in the OPTIMIZED plan (the
    analyzed plan would still show a guard a later optimizer rule or
    refactor had elided) — and still compute over the fixture (no
    trip: fixture hubs are far below the 10k bound)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    for key in ("q_graph_link_prediction", "q_basket_affinity"):
        df = q[key](spark, sf_dir)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "raise_error" in opt, key
        assert df.count() > 0, key
