"""End-to-end example: the round-10 chunk-level dedup family — what
content-defined chunking adds over every other dedup the engine ships.

Run:  python examples/dedup_cdc.py [sf_dir]

Covers (each a registered query key, COVERAGE.md):

  CDC chunk dedup report            -> q_llm_cdc_chunks   (oracle-exact)
  production 8-byte wire twin       -> q_llm_cdc_chunks_hashed
  chunk-novelty streaming admission -> q_stream_cdc_ingest (oracle-exact)
  zlib quality screen alongside     -> q_llm_compress_ratio
  export shard manifest at the end  -> q_llm_shard_export  (oracle-exact)

The demo also shows the family's defining property directly: a shifted
re-crawl (banner prepended to a stored doc) realigns to the SAME chunks
after one hash window, so chunk dedup flags it while whole-doc
fingerprints and position-fixed shingles see an unrelated document.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.queries import run


def main(sf_dir: str) -> None:
    spark = get_spark("kscs-cdc-example")

    print("1. Per-doc CDC duplication report (top duplicated docs):")
    run(spark, "q_llm_cdc_chunks", sf_dir).orderBy(
        F.desc("dup_char_frac"), "doc_id"
    ).show(5)

    print("2. The 8-byte-key wire twin returns the identical report:")
    run(spark, "q_llm_cdc_chunks_hashed", sf_dir).orderBy(
        F.desc("dup_char_frac"), "doc_id"
    ).show(3)

    print("3. Shifted re-crawl caught (chunks realign after one window):")
    from kafka_streams_clojure_spark.operators.dedup import cdc_dedup_report

    base = " ".join(f"tok{i * 7 % 97}word{i * 13 % 89}" for i in range(60))
    demo = spark.createDataFrame(
        [(1, base), (2, "BREAKING-NEWS-BANNER " + base)],
        "doc_id bigint, text string",
    )
    cdc_dedup_report(demo).orderBy("doc_id").show()

    print("4. Streaming admission: docs contributing >= 1 novel chunk:")
    run(spark, "q_stream_cdc_ingest", sf_dir).orderBy(
        F.desc("n_novel")
    ).show(5)

    print("5. Compression-ratio screen beside it (low = boilerplate):")
    run(spark, "q_llm_compress_ratio", sf_dir).orderBy(
        "compress_ratio"
    ).show(5)

    print("6. Export shard manifest for the curated corpus:")
    run(spark, "q_llm_shard_export", sf_dir).orderBy("shard").show(16)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
