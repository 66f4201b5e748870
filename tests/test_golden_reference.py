"""Phase-0 golden test: reproduce the reference's end-to-end integration
test exactly (reference api_test.clj:44-69, FIXTURES.md §B).

Input records {"foo"->"bar", "baz"->"quux"}; pipeline
filter(value is string) ∘ map(swap k/v) ∘ filter(value == "foo");
golden output: exactly [("bar", "foo")].
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import xform as X


def test_reference_golden_pipeline(spark):
    kv = spark.createDataFrame([("foo", "bar"), ("baz", "quux")], "key string, value string")
    pipe = X.compose(
        # (filter (fn [[k v]] (string? v))) — value is a string column here;
        # the dynamic type test maps to a null/type guard.
        X.filter_(F.col("value").isNotNull() & (F.col("value").cast("string") == F.col("value"))),
        # (map (fn [[k v]] [v k])) — swap key and value
        X.map_(key=F.col("value"), value=F.col("key")),
        # (filter (fn [[k v]] (= "foo" v)))
        X.filter_(F.col("value") == "foo"),
    )
    out = pipe(kv).collect()
    assert [(r.key, r.value) for r in out] == [("bar", "foo")]


def test_branch_first_match_disjoint_and_complete(spark):
    """Property check for the branch watch-list item (SURVEY §7):
    overlapping predicates must not double-route records."""
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "id int, v double")
    b = X.branch(df, F.col("v") < 50, F.col("v") < 80, F.col("id") % 2 == 0)
    counts = [x.count() for x in b]
    assert counts[0] == 50  # 0..49
    assert counts[1] == 30  # 50..79
    assert counts[2] == 10  # evens in 80..99
    ids = sorted(r.id for x in b for r in x.select("id").collect())
    assert len(ids) == len(set(ids)), "a record was routed to two branches"


def test_branch_map_names(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    named = X.branch_map(df, {"as": F.col("s") == "a", "rest": F.lit(True)})
    assert set(named) == {"as", "rest"}
    assert named["as"].count() == 1
    assert named["rest"].count() == 1
