"""End-to-end example: the recurring CRAWL-REFRESH run (round-5 ops).

Run:  python examples/refresh.py [sf_dir]

A corpus that is re-crawled periodically needs a different curation
shape than a one-shot build — each refresh must clean WITHIN documents,
strip cross-document boilerplate, and dedup the delta against what the
corpus already holds, without reprocessing the standing corpus:

  intra-doc repetition  -> operators/dedup.intra_doc_dedup
  boilerplate passages  -> operators/dedup.passage_dedup
  ingest-delta dedup    -> operators/dedup.incremental_dedup
  composed + gated      -> the oracle-checked q_llm_refresh_curation
  punctuate flush       -> streaming/stateful.punctuate_flush
                           (STREAM_TIME timers over the events stream)

Everything batch-side is lazy DataFrame composition; the punctuate
section runs the real Structured Streaming engine.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.operators.dedup import (
    incremental_dedup,
    intra_doc_dedup,
    passage_dedup,
)
from kafka_streams_clojure_spark.queries import queries


def main(sf_dir: str, stop: bool = True) -> None:
    spark = get_spark("kscs-refresh-example")
    qs = queries()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. Clean WITHIN each document: collapse copy-paste repetition.
    intra = intra_doc_dedup(docs)
    pruned = intra.filter(F.col("n_dropped") > 0).count()
    print(f"intra-doc dedup: {pruned} docs had repeated passages collapsed")

    # 2. Strip cross-document boilerplate (passages in >1 doc).
    boiler = passage_dedup(docs, max_doc_freq=1)
    hit = boiler.filter(F.col("n_dropped") > 0).count()
    print(f"passage dedup: {hit} docs contained shared boilerplate")

    # 3. Delta-vs-corpus dedup: odd ids play the fresh snapshot, even
    #    ids the standing corpus; prefix fingerprint as the content key.
    prefix_fp = F.md5(F.array_join(F.slice(F.split(F.col("text"), r"\s+"), 1, 20), " "))
    fresh = incremental_dedup(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        fp=prefix_fp,
    )
    print(f"ingest-delta dedup: {fresh.count()} genuinely-new docs accepted")

    # 4. The full composed pipeline (intra-dedup -> quality gate ->
    #    delta dedup -> per-source report), one lazy plan + oracle key.
    print("refresh-curation report (per source):")
    qs["q_llm_refresh_curation"](sf_dir=sf_dir, spark=spark).orderBy("source").show()

    # 5. Punctuate-style stream-time flush over the events stream —
    #    per-key buffers emitted by watermark-driven timers.
    flushed = qs["q_stream_punctuate"](spark, sf_dir)
    print(f"punctuate: {flushed.count()} keys flushed by stream-time timers")

    if stop:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
