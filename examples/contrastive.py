"""End-to-end example: CONTRASTIVE training-data construction — the
(anchor, positive, negative) machinery for embedding-model training,
every step RNG-free and oracle-gated.

Run:  python examples/contrastive.py [sf_dir]

  positives       -> q_llm_positive_pairs  (top near-dup partners from
                     the shared Jaccard chain)
  easy negatives  -> q_llm_negative_pairs  (hash-ranked, shingle-clean
                     vs the whole eval slice)
  triplets        -> q_llm_triplets        (a / a+ / per-anchor clean a-)
  hard negatives  -> q_llm_hard_negatives  (closest clean candidates in
                     embedding space — boundary-adjacent, provably
                     not textual dups)
  sanity loop     -> q_llm_triplet_eval    (does the embedding agree
                     with textual near-dup structure?)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.queries import run


def main(sf_dir: str) -> None:
    spark = get_spark("kscs-contrastive-example")

    print("1. Positives (each doc's top near-dup partners):")
    run(spark, "q_llm_positive_pairs", sf_dir).orderBy(
        "anchor_id", "rnk"
    ).show(5)

    print("2. Easy negatives (hash-ranked, zero shingle overlap):")
    run(spark, "q_llm_negative_pairs", sf_dir).orderBy(
        "anchor_id", "rnk"
    ).show(5)

    print("3. Assembled triplets (a, a+, a-):")
    run(spark, "q_llm_triplets", sf_dir).orderBy(
        "anchor_id", "neg_rnk"
    ).show(5)

    print("4. Hard negatives (closest clean candidates in vector space):")
    run(spark, "q_llm_hard_negatives", sf_dir).orderBy(
        "anchor_id", "rnk"
    ).show(5)

    print("5. Triplet accuracy (embedding vs textual structure):")
    ev = run(spark, "q_llm_triplet_eval", sf_dir)
    ev.orderBy("anchor_id", "neg_rnk").show(5)
    ev.agg(
        F.count("*").alias("n_triplets"),
        F.avg(F.col("correct").cast("int")).alias("accuracy"),
        F.avg("margin").alias("mean_margin"),
    ).show()

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
