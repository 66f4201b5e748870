"""End-to-end example: the declarative SQL/analytics surface added in
round 5 — everything a warehouse user expects, one engine.

Run:  python examples/analytics.py [sf_dir]

Covers (each an oracle-checked query key, COVERAGE.md):

  recursive CTE date spine      -> q_sql_recursive_cte
  correlated LATERAL top-k      -> q_sql_lateral
  Python UDTF via LATERAL       -> q_udtf_tokens
  changelog -> SCD2 history     -> q_ktable_history
  LOCF gap filling              -> q_win_locf
  dynamic-gap session windows   -> q_agg_session_dynamic
  nearest-centroid classifier   -> q_llm_nearest_centroid
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.queries import run


def main(sf_dir: str) -> None:
    spark = get_spark("kscs-analytics-example")

    print("1. Every day including zero-order days (WITH RECURSIVE spine):")
    run(spark, "q_sql_recursive_cte", sf_dir).orderBy("day").show(5)

    print("2. Top-2 customers per nation (correlated LATERAL ... LIMIT):")
    run(spark, "q_sql_lateral", sf_dir).orderBy("n_name", "c_acctbal").show(6)

    print("3. Tokens with positions via a Python UDTF in a lateral call:")
    run(spark, "q_udtf_tokens", sf_dir).show(5)

    print("4. User-state history as SCD2 validity intervals:")
    run(spark, "q_ktable_history", sf_dir).orderBy(
        "user_id", "valid_from"
    ).show(6)

    print("5. Forward-filled measurements (LOCF over nulled error events):")
    run(spark, "q_win_locf", sf_dir).filter("v IS NULL").show(5)

    print("6. Sessions where purchases keep the session alive longer:")
    run(spark, "q_agg_session_dynamic", sf_dir).orderBy(
        "user_id", "session_start"
    ).show(5)

    print("7. Does the embedding space separate its labels? (confusion):")
    run(spark, "q_llm_nearest_centroid", sf_dir).orderBy(
        "label", "assigned"
    ).show(12)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
