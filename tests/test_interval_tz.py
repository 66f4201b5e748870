"""Regression: interval-length arithmetic must be timezone-independent.

The r7 ADVICE found that ``bucket_us`` was derived as
``unix_micros(lit('1970-01-01 00:00:00').cast('timestamp') + INTERVAL)``,
which parses the epoch STRING in the session timezone — so in a session
east of UTC with a bucket shorter than the offset (e.g. '6 hours' at
UTC+8) the modulus went zero/negative, ``floor(ts/bucket_us)`` became
non-monotonic, and asof_join_bucketed's seed-carry window silently
pulled FUTURE right-state into earlier buckets. The registered key uses
'1 day' so neither the oracle gate nor the America/New_York driver_sim
session could catch it. These tests pin the fix
(operators/joins._interval_micros: timestamp_micros(0) is epoch UTC in
every session) at UTC+8 with sub-offset buckets.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F


@contextlib.contextmanager
def _session_tz(spark, tz: str):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def _asof_frames(spark):
    # right state changes every ~4h; left probes land between changes.
    # With bucket='6 hours' at UTC+8 the OLD idiom gave
    # bucket_us = 6h - 8h = -2h: floor(ts/negative) decreases in ts and
    # the seed carry ran backwards.
    right = spark.createDataFrame(
        [(1, h * 4 * 3_600_000_000, h) for h in range(6)],
        "k long, us long, payload long",
    ).selectExpr("k", "timestamp_micros(us) AS ts", "payload")
    left = spark.createDataFrame(
        [(i, 1, i * 3_600_000_000 + 1_800_000_000) for i in range(24)],
        "lid long, k long, us long",
    ).selectExpr("lid", "k", "timestamp_micros(us) AS ts")
    return left, right


@pytest.mark.parametrize("bucket", ["6 hours", "90 minutes", "1 day"])
def test_asof_bucketed_matches_plain_east_of_utc(spark, bucket):
    from kafka_streams_clojure_spark.operators.joins import (
        asof_join,
        asof_join_bucketed,
    )

    left, right = _asof_frames(spark)
    kw = dict(on="k", left_ts="ts", right_ts="ts", right_cols=["payload"])
    with _session_tz(spark, "Asia/Shanghai"):  # UTC+8 > both sub-day buckets
        plain = {(r.lid, r.payload) for r in asof_join(left, right, **kw).collect()}
        got = {
            (r.lid, r.payload)
            for r in asof_join_bucketed(left, right, bucket=bucket, **kw).collect()
        }
    # every probe at hour h+0.5 must see the payload active at that time
    expect = {(i, i * 3600 // (4 * 3600)) for i in range(24)}
    assert plain == expect
    assert got == expect, (bucket, sorted(got - expect), sorted(expect - got))


def test_range_join_band_east_of_utc(spark):
    from kafka_streams_clojure_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [(i, i * 600_000_000) for i in range(20)], "lid long, us long"
    ).selectExpr("lid", "timestamp_micros(us) AS lts")
    right = spark.createDataFrame(
        [(j, j * 600_000_000 + 300_000_000) for j in range(20)],
        "rid long, us long",
    ).selectExpr("rid", "timestamp_micros(us) AS rts")
    with _session_tz(spark, "Asia/Shanghai"):
        got = {
            (r.lid, r.rid)
            for r in range_join(left, right, "lts", "rts", "10 minutes").collect()
        }
    # |rts - lts| <= 10 min: right j at l*10+5 min matches left i=j and i=j+1
    expect = {(j, j) for j in range(20)} | {(j + 1, j) for j in range(19)}
    assert got == expect


def test_interval_micros_rejects_non_positive(spark):
    from kafka_streams_clojure_spark.operators.joins import _interval_micros

    df = spark.range(1).select(
        _interval_micros(F.expr("INTERVAL '-1' HOUR")).alias("us")
    )
    with pytest.raises(Exception, match="positive day-time interval"):
        df.collect()
