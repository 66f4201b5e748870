"""End-to-end example: TOKENIZER TRAINING + SPAN-LEVEL DEDUP + MEDIA
near-dup + ANN index serving — the round-9 additions as one user
workflow.

Run:  python examples/tokenizer_media.py [sf_dir]

A training-data team preparing a mixed text+media corpus runs exactly
this sequence:

  span-level dedup       -> q_llm_substring_dedup (Lee et al. 2022
                            ExactSubstr: remove repeated >=8-token runs,
                            keep the corpus-first copy; NO pair join)
  BPE merge training     -> q_llm_bpe_merges (6 integer merge rounds on
                            the vocabulary — corpus-size-independent)
  token accounting       -> q_llm_bpe_encode (per-doc counts under the
                            TRAINED tokenizer, not a whitespace proxy)
  audio near-dup         -> q_multimodal_audio_near_dup (eHash over
                            decoded samples; decimated transcodes)
  media near-dup         -> q_multimodal_near_dup (dHash + exact
                            Hamming-band blocking: catches resized
                            re-encodes whose md5 differs)
  ANN index serving      -> ivfpq_build ONCE -> persist -> ivfpq_search
                            per probe batch (the q_llm_ivfpq_serve
                            shape: raw vectors never move at query time)

Every batch step is a registered oracle-gated key (COVERAGE.md); the
serving step reuses the exact operators the rows-only key gates.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.queries import queries


def main(sf_dir: str, stop: bool = True) -> None:
    spark = get_spark("kscs-tokenizer-media-example")
    qs = queries()

    # 1. Remove duplicated spans BEFORE tokenizer training — repeated
    #    boilerplate otherwise dominates the pair counts (the Lee et
    #    al. 2022 motivation: span dedup beats doc dedup for LM loss).
    print("— exact-substring removal (docs with removed spans) —")
    cleaned = qs["q_llm_substring_dedup"](spark, sf_dir)
    cleaned.filter(F.col("n_removed") > 0).orderBy(
        F.desc("n_removed")
    ).select("doc_id", "n_removed", "n_total").show(5)

    # 2. Train the tokenizer: 6 BPE merge rounds, integer-exact.
    print("— trained BPE merge table —")
    qs["q_llm_bpe_merges"](spark, sf_dir).orderBy("round").show(truncate=False)

    # 3. Bill by REAL tokens: per-doc counts under the trained merges.
    print("— token accounting under the trained tokenizer —")
    qs["q_llm_bpe_encode"](spark, sf_dir).orderBy(
        F.desc("n_bpe_tokens")
    ).show(5)

    # 4. Media near-dup: resized/re-encoded images whose bytes (and
    #    md5) differ but whose perceptual hash collides.
    print("— perceptual-hash media near-dups (hamming <= 2) —")
    pairs = qs["q_multimodal_near_dup"](spark, sf_dir)
    print(f"  pairs found: {pairs.count()} (includes every planted resize twin)")
    pairs.orderBy("id_a", "id_b").show(5)

    #    ...and the AUDIO member: 2x-decimated WAV transcodes caught by
    #    the eHash through the SAME Hamming-band blocking operator.
    apairs = qs["q_multimodal_audio_near_dup"](spark, sf_dir)
    print(f"  audio pairs found: {apairs.count()} "
          "(includes every planted transcode twin)")

    # 5. ANN serving: train the IVF-PQ index ONCE, persist it, then
    #    answer probe batches against the standing store.
    from kafka_streams_clojure_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_search,
    )
    from kafka_streams_clojure_spark.queries._util import load_table
    from kafka_streams_clojure_spark.streaming import scratch_dir

    emb = load_table(spark, sf_dir, "embeddings")
    root = scratch_dir("kscs_example_ivfpq_")
    cents, books, codes = ivfpq_build(emb, m=8, ks=16)
    cents.write.mode("overwrite").parquet(os.path.join(root, "cents"))
    books.write.mode("overwrite").parquet(os.path.join(root, "books"))
    codes.write.mode("overwrite").partitionBy("__ivf_cell").parquet(
        os.path.join(root, "codes")
    )
    cents_s = spark.read.parquet(os.path.join(root, "cents"))
    books_s = spark.read.parquet(os.path.join(root, "books"))
    codes_s = spark.read.parquet(os.path.join(root, "codes"))
    print("— IVF-PQ serving: two probe batches against the standing index —")
    for lo, hi in [(0, 3), (3, 6)]:
        probes = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        hits = ivfpq_search(cents_s, books_s, codes_s, probes, k=3, n_probe=4, m=8)
        hits.orderBy("probe_id", "adc_d2").show(9)

    if stop:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
