"""End-to-end example: the SERVING path of a running topology — a
streaming aggregation materialized into the compacted upsert store,
then queried interactively (the reference's get/range/all store reads,
api.clj:102-152, over Structured Streaming state).

Run:  python examples/serving.py [sf_dir]

Shapes covered:
  streaming aggregate  -> readStream + groupBy/agg (update mode)
  multi-epoch upsert   -> run_available_now(upsert_keys=...) — epoch-
                          stamped appends, latest-per-key compaction
                          (KTable log compaction on plain parquet)
  interactive reads    -> point lookup / range scan on the lazy store
                          reader (predicate pushdown, no driver state)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.queries._util import dsum
from kafka_streams_clojure_spark.streaming import run_available_now, stream_table


def main(sf_dir: str) -> None:
    spark = get_spark("kscs-serving")

    # A per-user running aggregate over the events stream (update mode:
    # each epoch re-emits only the keys it changed).
    ev = stream_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), dsum("value").alias("total_value")
    )

    # Run to completion into the compacted upsert store. With
    # upsert_keys the store stays correct across ANY number of
    # micro-batches — the reader compacts latest-row-per-key.
    store = run_available_now(agg, output_mode="update", upsert_keys=["user_id"])
    store.createOrReplaceTempView("user_totals")

    # Interactive reads — the reference's get / range / all:
    point = spark.sql("SELECT * FROM user_totals WHERE user_id = 42")
    rng = spark.sql(
        "SELECT * FROM user_totals WHERE user_id BETWEEN 10 AND 20 ORDER BY user_id"
    )
    top = spark.sql(
        "SELECT user_id, total_value FROM user_totals "
        "ORDER BY total_value DESC, user_id LIMIT 5"
    )

    print("point lookup user 42:", point.collect())
    print("range 10..20:", rng.count(), "users")
    print("top-5 by value:")
    for r in top.collect():
        print("  ", r.user_id, round(r.total_value, 2))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
