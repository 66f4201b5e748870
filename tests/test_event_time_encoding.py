"""Event-time physical-encoding regression tests.

The driver fixtures have changed the physical parquet encoding of
``events.ts`` between rounds: TIMESTAMP(NANOS) (read as ``bigint`` via
``nanosAsLong``) through round 2, then naive ``timestamp[us]`` (read by
Spark 4 as ``timestamp_ntz``) from round 3. Round 3's engine only fixed
up ``bigint``, so every ``withWatermark`` path broke with
``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE``.

These tests write tiny parquet files in each physical encoding and
assert every fixture read path (batch ``load_table``, streaming
``stream_table``, ``api.KStream.from_parquet``) yields a plain
``timestamp`` column with identical values — and that the streaming
path can actually be watermarked and aggregated.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kafka_streams_clojure_spark import streaming
from kafka_streams_clojure_spark.api import KStream
from kafka_streams_clojure_spark.session import load_table, normalize_event_time

UTC = datetime.timezone.utc
TS_VALUES = [
    datetime.datetime(2024, 1, 1, 0, 0, 0),
    datetime.datetime(2024, 1, 1, 0, 0, 30),
    datetime.datetime(2024, 1, 1, 0, 10, 0),
]


def _write_events(dirpath: str, ts_type: pa.DataType) -> str:
    """Write a minimal events.parquet with ts in the given arrow type."""
    os.makedirs(dirpath, exist_ok=True)
    ts = pa.array(TS_VALUES, type=pa.timestamp("us")).cast(ts_type)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "user_id": pa.array([10, 10, 11], type=pa.int64()),
            "ts": ts,
            "amount": pa.array([1.0, 2.0, 3.0], type=pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(dirpath, "events.parquet"))
    return dirpath


ENCODINGS = {
    "naive_us": pa.timestamp("us"),  # round-3+ fixtures -> Spark TIMESTAMP_NTZ
    "nanos": pa.timestamp("ns"),  # round-1/2 fixtures -> bigint via nanosAsLong
    "utc_us": pa.timestamp("us", tz="UTC"),  # plain TimestampType, no-op path
}


@pytest.fixture(scope="module", params=sorted(ENCODINGS))
def encoded_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"evt_{request.param}")
    return _write_events(str(d), ENCODINGS[request.param])


def test_load_table_normalizes_to_timestamp(spark, encoded_dir):
    df = load_table(spark, encoded_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts.replace(tzinfo=None) for r in df.select("ts").collect())
    assert got == TS_VALUES


def test_from_parquet_normalizes_to_timestamp(spark, encoded_dir):
    ks = KStream.from_parquet(spark, os.path.join(encoded_dir, "events.parquet"))
    assert dict(ks.df.dtypes)["ts"] == "timestamp"
    # and the column is watermarkable (the round-3 break)
    ks.df.withWatermark("ts", "1 minute")


def test_stream_table_watermark_agg(spark, encoded_dir):
    """The exact round-3 failure shape: stream the fixture, watermark on
    ts, run a windowed count to completion."""
    stream = streaming.stream_table(spark, encoded_dir, "events")
    assert dict(stream.dtypes)["ts"] == "timestamp"
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count("*").alias("n"))
        .select("window.start", "n")
    )
    out = streaming.run_available_now(agg, output_mode="update")
    rows = {r.start.replace(tzinfo=None): r.n for r in out.collect()}
    assert rows == {
        datetime.datetime(2024, 1, 1, 0, 0): 2,
        datetime.datetime(2024, 1, 1, 0, 10): 1,
    }


def test_normalize_event_time_noop_on_missing_col(spark):
    df = spark.range(3)
    assert normalize_event_time(df, ("ts",)) is df or dict(
        normalize_event_time(df, ("ts",)).dtypes
    ) == dict(df.dtypes)


def test_string_ts_encoding_coerced(spark):
    """Defensive branch: an ISO-string ts column parses to TimestampType
    under the forced-UTC session."""
    import datetime as dt

    from kafka_streams_clojure_spark.session import normalize_event_time

    df = spark.createDataFrame(
        [("2024-01-02 03:04:05.123456",)], "ts string"
    )
    out = normalize_event_time(df, ("ts",))
    assert dict(out.dtypes)["ts"] == "timestamp"
    v = out.collect()[0].ts
    assert (v.hour, v.minute, v.second, v.microsecond) == (3, 4, 5, 123456)


def test_unhandled_ts_encoding_fails_loudly(spark):
    """A brand-new physical encoding must raise, not limp into a broken
    withWatermark."""
    import pytest

    from kafka_streams_clojure_spark.session import normalize_event_time

    df = spark.createDataFrame([(1.5,)], "ts double")
    with pytest.raises(TypeError, match="normalize_event_time"):
        normalize_event_time(df, ("ts",))
