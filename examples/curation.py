"""End-to-end example: curating a training corpus with this engine.

Run:  python examples/curation.py [sf_dir]

The standard large-corpus curation sequence, each step a first-class
operator (COVERAGE.md "LLM training-data ops"):

  exact dedup          -> operators/dedup.exact_dedup
  repetition filter    -> operators/text.repetition_stats (Gopher rules)
  decontamination      -> operators/dedup.decontaminate
  stratified sampling  -> the deterministic md5 bucket
  domain mixture       -> per-source token shares (q_llm_domain_mix)
  sequence packing     -> fixed-token-budget packing per source shard
  chunking             -> overlapping fixed windows

Everything is lazy DataFrame composition — one Catalyst plan per
output, no driver-side loops; the composed dedup->decontaminate->
sample path is the oracle-checked q_llm_curation key.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.operators._cache import persist_if_uncached
from kafka_streams_clojure_spark.operators.dedup import decontaminate, exact_dedup
from kafka_streams_clojure_spark.operators.text import repetition_stats
from kafka_streams_clojure_spark.queries import queries


def main(sf_dir: str, stop: bool = True) -> None:
    spark = get_spark("kscs-curation-example")
    qs = queries()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. Exact dedup (keep-first) + repetition gate. `clean` feeds
    #    several downstream actions — persist it (the repo's rule for
    #    multi-consumed subplans; without it this prefix re-executes
    #    for every count/join below).
    deduped = exact_dedup(docs)
    rep = repetition_stats(deduped, bigrams=False)
    clean = persist_if_uncached(
        deduped.join(rep, "doc_id", "left").filter(
            F.col("dup_token_ratio").isNull() | (F.col("dup_token_ratio") <= 0.3)
        )
    )
    print(f"after dedup + repetition gate: {clean.count()} docs")

    # 2. Decontaminate against a held-out eval slice.
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint") % 100
    with_b = clean.withColumn("bucket", bucket)
    bench = with_b.filter(F.col("bucket") < 5)
    train = persist_if_uncached(with_b.filter(F.col("bucket") >= 5))
    dirty = persist_if_uncached(decontaminate(train, bench))
    kept = train.join(dirty.select("doc_id"), "doc_id", "left_anti")
    print(f"after decontamination: {kept.count()} training docs "
          f"({dirty.count()} dropped as contaminated)")

    # 3. Mixture stats, packing, chunking via the registered keys.
    print("domain mixture (token shares + sqrt-temperature rates):")
    qs["q_llm_domain_mix"](spark, sf_dir).orderBy("source").show()
    print("packed sequences (first 5):")
    qs["q_llm_pack_sequences"](spark, sf_dir).orderBy(
        "source", "doc_id"
    ).show(5)
    print("chunks (first 5):")
    qs["q_llm_chunks"](spark, sf_dir).orderBy("doc_id", "chunk_start").show(5)

    # 4. Target-domain selection (DSIR shape): the raw-pool docs whose
    #    token distribution most resembles the held-out target slice —
    #    integer-exact importance ranking, no model needed.
    print("DSIR top target-affine docs:")
    qs["q_llm_dsir_select"](spark, sf_dir).show(5)

    if stop:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
