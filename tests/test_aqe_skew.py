"""AQE automatic skew-join splitting — the runtime half of the skew
story (SCALE.md): `operators/skew.salted_join` is the MANUAL tool for
known-skewed keys; for skew you didn't predict, AQE must detect the
oversized shuffle partition at runtime and split it across tasks with
no code change. This test proves the engine's session actually has
that safety net working — a hot key carrying 90% of the rows plans as
a SortMergeJoin whose final adaptive plan carries the `skew=true`
reader marker, and the join result is unchanged."""

from __future__ import annotations

import pytest

_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # shrink the detection thresholds so the fixture-sized hot key
    # (90% of 60k padded rows in one hash partition) trips the same
    # code path a multi-GB partition would at cluster scale
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    # force SMJ — a broadcast join would hide the skew machinery
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_confs(spark):
    prev = {c: spark.conf.get(c, None) for c in _CONFS}
    for c, v in _CONFS.items():
        spark.conf.set(c, v)
    try:
        yield
    finally:
        for c, v in prev.items():
            if v is None:
                spark.conf.unset(c)
            else:
                spark.conf.set(c, v)


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    left = spark.createDataFrame(
        [
            (0, "x" * 100) if i < 54_000 else (i % 97 + 1, "x" * 100)
            for i in range(60_000)
        ],
        "k int, pad string",
    )
    right = spark.createDataFrame(
        [(i, "y" * 50) for i in range(100)], "k int, v string"
    )
    j = left.join(right, "k")
    rows = j.collect()
    # correctness first: every left row matches exactly one right row
    assert len(rows) == 60_000
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, "adaptive plan never finalized"
    assert "skew=true" in plan, (
        "AQE did not mark the hot partition as skewed — the runtime "
        "skew-split safety net is not engaging:\n" + plan[:2000]
    )
