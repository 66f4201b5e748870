"""End-to-end example: the 100 TB layout-and-graph toolkit added in
the round-5 continuation.

Run:  python examples/scale_toolkit.py [sf_dir]

Covers (each an oracle-checked query key, COVERAGE.md):

  Z-order (Morton) layout key       -> q_zorder_curve
  Z-order data-skipping audit       -> q_zorder_skipping
  integer-exact PageRank            -> q_graph_pagerank
  fixed-grid linear interpolation   -> q_events_resample
  stream-stream AS-OF w/ state      -> q_stream_asof_join
  edit-distance near-dup            -> q_llm_edit_distance
  sorted-neighborhood blocking      -> q_llm_sorted_neighborhood
  CUSUM changepoint detection       -> q_events_changepoint
  data-quality metric suite         -> q_data_quality
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.queries import run


def main(sf_dir: str) -> None:
    spark = get_spark("kscs-scale-toolkit-example")

    print("1. Z-order key — files sorted by it bound BOTH dims' min/max:")
    run(spark, "q_zorder_curve", sf_dir).orderBy("zkey").show(5)

    # Should you actually re-cluster? The decision table: per-file
    # min/max spans + files scanned by a second-dimension probe,
    # Morton layout vs single-column sort.
    run(spark, "q_zorder_skipping", sf_dir).orderBy("scheme").show(
        truncate=False
    )

    print("2. Who matters in the co-purchase graph? (integer PageRank):")
    run(spark, "q_graph_pagerank", sf_dir).orderBy(F.desc("rank")).show(
        5
    )

    print("3. Per-user values resampled to a 6h grid (linear interp):")
    run(spark, "q_events_resample", sf_dir).orderBy("user_id", "gsec").show(5)

    print("4. Purchases enriched with the latest prior click — AS-OF on")
    print("   the STREAMING engine via a per-key version store:")
    run(spark, "q_stream_asof_join", sf_dir).orderBy("left_id").show(5)

    print("5. Character-level near-dups (Levenshtein, blocked):")
    run(spark, "q_llm_edit_distance", sf_dir).orderBy("edit_dist", "id_a").show(5)

    print("6. Sorted-neighborhood candidates (4·n pairs, no equi key):")
    run(spark, "q_llm_sorted_neighborhood", sf_dir).orderBy(
        "edit_dist", "id_a", "id_b"
    ).show(5)

    print("7. Where does each event type's value regime shift? (CUSUM):")
    run(spark, "q_events_changepoint", sf_dir).orderBy("event_type").show(5)

    print("8. Is this batch trustworthy? (one-scan quality suite):")
    run(spark, "q_data_quality", sf_dir).orderBy("metric").show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
