"""End-to-end example: what a reference (kafka-streams-clojure) user's
code looks like on this engine.

Run:  python examples/pipeline.py [sf_dir]

Covers the reference's core shapes 1:1 —
  transducer pipeline  (comp filter map filter)   -> xform.compose
  first-match branch   (api/branch-map)           -> KStream.branch_map
  windowed aggregate   (roadmap README.md:30-32)  -> window() groupBy
  KTable latest state  (roadmap README.md:33-34)  -> latest_by_key
  interactive reads    (api/get / api/range)      -> spark.sql point/range
plus the LLM-pipeline extensions (dedup -> quality -> stats).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import get_spark, xform as X
from kafka_streams_clojure_spark.api import KStream
from kafka_streams_clojure_spark.functions import dsum, fingerprint, quality_score
from kafka_streams_clojure_spark.operators.ktable import latest_by_key


def main(sf_dir: str) -> None:
    spark = get_spark("kscs-example")

    # 1. The reference's flagship transducer pipeline (README.md:80-82):
    #    filter ∘ map ∘ filter, composed, then a windowed aggregate.
    events = KStream.from_table(spark, sf_dir, "events")
    daily = (
        events.transduce(
            X.filter_(F.col("value") > 5.0),
            X.map_values(day=F.date_trunc("day", F.col("ts"))),
            X.filter_(F.col("event_type") != "view"),
        )
        .group_by("event_type", "day")
        .agg(F.count("*").alias("n"), dsum("value").alias("total"))
    )
    print("daily windowed aggregate:")
    daily.orderBy("event_type", "day").show(5)

    # 2. First-match branching (api.clj:62-88) — one scan, three sinks.
    routed = events.branch_map(
        {
            "errors": F.col("event_type") == "error",
            "whales": F.col("value") > 90.0,
            "rest": F.lit(True),
        }
    )
    for name, stream in routed.items():
        print(f"branch {name}: {stream.to_df().count()} records")

    # 3. KTable latest-state + interactive reads (api.clj:102-152).
    state = latest_by_key(
        events.to_df(),
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_cols=["event_type", "value"],
    )
    state.createOrReplaceTempView("user_state")
    print("point lookup (get):")
    spark.sql("SELECT * FROM user_state WHERE user_id = 7").show()
    print("range scan (range 10..15):")
    spark.sql(
        "SELECT * FROM user_state WHERE user_id BETWEEN 10 AND 15 ORDER BY user_id"
    ).show()

    # 4. LLM training-data pipeline: dedup -> quality gate -> stats.
    docs = KStream.from_table(spark, sf_dir, "documents").to_df()
    kept = (
        docs.withColumn("fp", fingerprint(F.col("text")))
        .dropDuplicates(["fp"])
        .withColumn("quality", quality_score(F.col("text")))
        .filter(F.col("quality") > 0.6)
    )
    print("corpus after dedup + quality gate:")
    kept.groupBy("lang").agg(F.count("*").alias("n_docs")).orderBy("lang").show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
