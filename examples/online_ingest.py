"""End-to-end example: the ONLINE half of a crawl pipeline — near-dup
dedup at ingest plus skew-proof state enrichment.

Run:  python examples/online_ingest.py [sf_dir]

Batch curation (examples/curation.py) cleans what you already have;
this surface is what runs CONTINUOUSLY as new crawls arrive:

  exact dedup at ingest    -> q_stream_dedup_ingest (fp anti-join)
  NEAR-dup at ingest       -> q_stream_near_dup_ingest (banded MinHash
                              vs a standing index that grows with each
                              accepted batch)
  QUOTA at ingest          -> q_stream_quota_ingest (per-source token
                              budget at the stream position; standing
                              totals store; oracle-gated)
  SEMANTIC dedup at ingest -> q_stream_semdedup_ingest (embedding
                              cosine vs a standing k-means cell index
                              — catches paraphrases/re-encodes the
                              text side can't see)
  latest-state enrichment  -> q_join_asof (KStream⋈KTable shape)
  ...at production skew    -> q_join_asof_bucketed (one hot user no
                              longer lands in one task; measured 1.42×
                              at 10M rows, SCALE.md "Joins")

The delta-vs-index near-dup core is also usable as a plain function
(operators/dedup.near_dup_ingest_delta) for batch-driven loops — shown
last with two explicit micro-batches to make the cross-batch contract
visible: batch 2's near-copy of a batch-1 acceptance is dropped.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.queries import queries


def main(sf_dir: str, stop: bool = True) -> None:
    spark = get_spark("kscs-online-ingest-example")
    qs = queries()

    # 1. Exact dedup at ingest: only fingerprints never seen before.
    n_exact = qs["q_stream_dedup_ingest"](spark, sf_dir).count()
    print(f"exact-dedup ingest accepted: {n_exact} docs")

    # 2. Near-dup at ingest: the fuzzy upgrade — an identical OR
    #    near-identical re-crawl of indexed content is dropped.
    n_near = qs["q_stream_near_dup_ingest"](spark, sf_dir).count()
    print(f"near-dup ingest accepted:    {n_near} docs (<= exact: "
          "near-dup also catches mutated re-crawls)")

    #    ...and the embedding-space member: the same delta-vs-index
    #    loop with cosine >= 0.95 inside fixed k-means cells (the IVF
    #    probe shape) — the pass that catches paraphrases.
    n_sem = qs["q_stream_semdedup_ingest"](spark, sf_dir).count()
    print(f"semantic ingest accepted:    {n_sem} vectors")

    #    ...and the BUDGET member: per-source token quotas enforced at
    #    the stream position (prefix semantics — batch-split invariant,
    #    hence fully oracle-gated), standing totals in a persistent
    #    store exactly like the dedup indexes above.
    n_quota = qs["q_stream_quota_ingest"](spark, sf_dir).count()
    print(f"quota ingest admitted:       {n_quota} docs")

    #    ...and the COMPOSED pipeline: dedup-vs-index -> keep-first ->
    #    quota, chained in ONE foreachBatch with two standing stores —
    #    still fully oracle-gated (every stage batch-split invariant).
    n_pipe = qs["q_stream_ingest_pipeline"](spark, sf_dir).count()
    print(f"composed ingest pipeline:    {n_pipe} docs admitted")

    # 3. Enrichment: each purchase sees the user's latest click state.
    #    The bucketed form computes the IDENTICAL rows with the window
    #    split by (user, day) — the shape that survives one user being
    #    10% of the stream.
    plain = qs["q_join_asof"](spark, sf_dir)
    bucketed = qs["q_join_asof_bucketed"](spark, sf_dir)
    n_plain, n_bucketed = plain.count(), bucketed.count()
    assert n_plain == n_bucketed, (n_plain, n_bucketed)
    print(f"as-of enrichment: {n_plain} purchases enriched "
          "(plain == bucketed row counts)")

    # 4. The cross-batch contract, spelled out with the batch core.
    from kafka_streams_clojure_spark.operators.dedup import (
        minhash_band_rows,
        near_dup_ingest_delta,
    )

    text_a = " ".join(f"a{i}" for i in range(30))
    text_b = " ".join(f"b{i}" for i in range(30))
    corpus = spark.createDataFrame([(0, text_a)], "doc_id bigint, text string")
    index = minhash_band_rows(corpus)

    batch1 = spark.createDataFrame(
        [(10, text_a.replace("a15", "X")), (11, text_b)],
        "doc_id bigint, text string",
    )
    acc1, bands1 = near_dup_ingest_delta(batch1, index)
    print("batch 1 accepted:", sorted(r.doc_id for r in acc1.collect()))

    index = index.unionByName(bands1)  # the append a real loop persists
    batch2 = spark.createDataFrame(
        [(20, text_b.replace("b7", "Y"))], "doc_id bigint, text string"
    )
    acc2, _ = near_dup_ingest_delta(batch2, index)
    print("batch 2 accepted:", sorted(r.doc_id for r in acc2.collect()),
          "(near-copy of batch 1's acceptance dropped)")

    if stop:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
