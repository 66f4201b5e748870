"""End-to-end example: the BI / growth-analytics surface — the tables
behind a product+finance dashboard, all exact-oracle-gated keys.

Run:  python examples/dashboards.py [sf_dir]

Covers (COVERAGE.md):

  Pareto curve + ABC classes      -> q_orders_pareto, q_orders_abc
  cohort LTV                      -> q_orders_cohort_ltv
  retention rate curve            -> q_events_retention_rate
  DAU/WAU stickiness + streaks    -> q_events_stickiness, q_events_streaks
  seasonality heatmap             -> q_events_seasonality
  burst + changepoint             -> q_events_burst, q_events_changepoint
  first-touch attribution         -> q_events_attribution
  OLS trend line                  -> q_events_trend_slope
  new vs returning DAU            -> q_events_new_vs_returning
  RFM segmentation                -> q_orders_rfm
  A/B experiment readout          -> q_events_ab_test
  bot/abuse flags                 -> q_events_bot_flags
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.queries import run


def main(sf_dir: str) -> None:
    spark = get_spark("kscs-dashboards-example")

    print("1. Who is the revenue? (Pareto ABC classes):")
    run(spark, "q_orders_abc", sf_dir).orderBy("abc").show()

    print("2. Cohort lifetime value (first rows of the LTV curve):")
    run(spark, "q_orders_cohort_ltv", sf_dir).orderBy(
        "cohort", "m_offset"
    ).show(5)

    print("3. Do cohorts come back? (retention rate, day offsets):")
    run(spark, "q_events_retention_rate", sf_dir).orderBy(
        "cohort_day", "day_offset"
    ).show(5)

    print("4. Engagement: stickiness (DAU/WAU) and longest streaks:")
    run(spark, "q_events_stickiness", sf_dir).orderBy("day").show(3)
    run(spark, "q_events_streaks", sf_dir).orderBy(
        F.desc("longest_streak"), "user_id"
    ).show(3)

    print("5. When does traffic happen? (dow × hod heatmap cells):")
    run(spark, "q_events_seasonality", sf_dir).orderBy(
        "event_type", "dow", "hod"
    ).show(5)

    print("6. Anything bursting or shifting? (burst + changepoint):")
    run(spark, "q_events_burst", sf_dir).orderBy(F.desc("burst_10m")).show(3)
    run(spark, "q_events_changepoint", sf_dir).orderBy("event_type").show(3)

    print("7. Which first touch converts? (attribution):")
    run(spark, "q_events_attribution", sf_dir).orderBy("channel").show()

    print("8. Is each event type growing? (OLS trend over daily counts):")
    run(spark, "q_events_trend_slope", sf_dir).orderBy("event_type").show()

    print("9. Growth accounting: new vs returning DAU:")
    run(spark, "q_events_new_vs_returning", sf_dir).orderBy("day").show(5)

    print("10. Customer segments (RFM grid, best cells first):")
    run(spark, "q_orders_rfm", sf_dir).orderBy(
        "r_score", "f_score", "m_score"
    ).show(5)

    print("11. Did the experiment move conversion? (A/B z-score):")
    run(spark, "q_events_ab_test", sf_dir).show()

    print("12. Anyone behaving like a bot? (volume + rapid-fire flags):")
    run(spark, "q_events_bot_flags", sf_dir).orderBy(
        F.desc("n_events")
    ).show(3)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
