"""Invariant tests for the approximate aggregate keys (rows-only by
design — sketch internals are engine-specific, so no DuckDB oracle):
each approximation is bounded against its exact twin."""

from __future__ import annotations

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.queries._util import load_table

_Q = entrymod.queries()


def test_approx_distinct_error_bound(spark, sf_dir):
    """HLL++ estimates within 5% relative error of the exact distinct
    count per group (rsd default 0.05)."""
    approx = {
        r.l_returnflag: r.approx_parts
        for r in _Q["q_agg_approx_distinct"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r[0]: r[1]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        # the key requests rsd=0.02; allow 3 sigma
        assert abs(approx[k] - n) <= max(1, 0.02 * n * 3), (
            f"{k}: approx {approx[k]} vs exact {n} outside 3x rsd bound"
        )


def test_approx_percentile_rank_error(spark, sf_dir):
    """GK-sketch percentiles at accuracy=10000: the reported value's
    RANK within the group's value multiset must be within 1/accuracy
    (plus slack for ties/small groups) of the target quantile."""
    rows = {r.event_type: r for r in _Q["q_agg_percentile_approx"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    vals = {
        r.event_type: sorted(r.vs)
        for r in ev.groupBy("event_type").agg(F.collect_list("value").alias("vs")).collect()
    }
    assert set(rows) == set(vals)
    for et, r in rows.items():
        vs = vals[et]
        n = len(vs)
        for q, got in ((0.5, r.p50_approx), (0.95, r.p95_approx)):
            assert vs[0] <= got <= vs[-1]
            rank = sum(1 for v in vs if v <= got) / n
            assert abs(rank - q) <= 1.0 / 10000 + 2.0 / n, (
                f"{et} q={q}: rank {rank:.4f} for value {got}"
            )


def test_stickiness_hll_tracks_exact(spark, sf_dir):
    """The HLL-sketch stickiness (mergeable per-day sketches, cover-set
    of sketches not user-days) tracks the exact DAU/WAU key within the
    lgConfigK=14 error budget (~0.4% rse, 3 sigma + integer slack) on
    every day."""
    approx = {
        r.day: (r.dau, r.wau)
        for r in _Q["q_events_stickiness_hll"](spark, sf_dir).collect()
    }
    exact = {
        r.day: (r.dau, r.wau)
        for r in _Q["q_events_stickiness"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for day, (dau_e, wau_e) in exact.items():
        dau_a, wau_a = approx[day]
        assert abs(dau_a - dau_e) <= max(2, 0.012 * dau_e), (
            f"{day}: HLL dau {dau_a} vs exact {dau_e}"
        )
        assert abs(wau_a - wau_e) <= max(2, 0.012 * wau_e), (
            f"{day}: HLL wau {wau_a} vs exact {wau_e}"
        )
