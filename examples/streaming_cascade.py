"""End-to-end example: chained stateful streaming + CDC + error
channels (round-5 session-6 ops) — every section runs the REAL
Structured Streaming engine (or the Arrow error router) through
oracle-gated keys.

Run:  python examples/streaming_cascade.py [sf_dir]

  agg → agg cascade     -> q_stream_chained_windows
                           (hourly cells roll into daily summaries in
                            ONE append-mode query — day state never
                            sees raw events)
  dedup → agg           -> q_stream_dedup_window
                           (idempotent ingest: one row per
                            (user, type, hour), then hourly actives)
  join → agg            -> q_stream_join_window
                           (interval click→purchase join feeding a
                            daily pair count)
  streaming CDC → SCD2  -> q_stream_scd2
                           (state changes close validity intervals
                            online; open intervals live in state)
  main + dead letter    -> q_error_swallow / q_error_dead_letter
                           (one Arrow pass routes each record to
                            exactly one channel)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.queries import run


def main(sf_dir: str) -> None:
    spark = get_spark("kscs-streaming-cascade-example")

    print("1. Two chained windows (hourly cells -> daily summary):")
    run(spark, "q_stream_chained_windows", sf_dir).orderBy(
        "day", "event_type"
    ).show(5)

    print("2. Dedup feeding a window (hourly active users):")
    run(spark, "q_stream_dedup_window", sf_dir).orderBy(
        "hour", "event_type"
    ).show(5)

    print("3. Stream-stream join feeding a window (daily pair volume):")
    run(spark, "q_stream_join_window", sf_dir).orderBy("day").show(5)

    print("4. Streaming SCD2 (closed validity intervals, newest first):")
    run(spark, "q_stream_scd2", sf_dir).orderBy(
        F.desc("valid_to_us")
    ).show(5)

    print("5. Error channels from one pass (main survivors + DLQ):")
    run(spark, "q_error_swallow", sf_dir).orderBy("event_id").show(3)
    run(spark, "q_error_dead_letter", sf_dir).orderBy("event_id").show(3)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
