"""End-to-end example: AUDITING a training corpus before it ships.

Run:  python examples/audit.py [sf_dir]

Curation (examples/curation.py) decides what goes in; this is the
sibling surface that tells you what you actually HAVE — every step a
first-class oracle-gated key (COVERAGE.md):

  referential integrity  -> q_llm_corpus_integrity (docs↔vectors)
  curation-loss funnel   -> q_llm_filter_funnel (which filter eats what)
  duplication provenance -> q_llm_dup_provenance (intra- vs cross-source)
  winnowing candidates   -> q_llm_winnowing (MOSS fingerprints)
  rare-token screening   -> q_llm_commonness (perplexity stand-in)
  token-budget forecast  -> q_llm_bpe_pretokens (BPE-ish vs whitespace)
  split census           -> q_llm_eval_split (90/5/5 leakage view)
  privacy posture        -> q_llm_k_anonymity + q_llm_l_diversity
  quality-rule tuning    -> q_llm_gopher_rules (per-rule pass/fail)
  perplexity terciles    -> q_llm_ccnet_buckets (head/middle/tail)
  dedup knob setting     -> q_llm_dedup_threshold_curve (cut sweep)
  embedding collapse     -> q_llm_isotropy (Gram-sum, no pair join)

Everything is lazy DataFrame composition; each report is one Catalyst
plan. The audit reads the corpus a handful of times and shuffles only
key-width columns — at 100 TB this whole surface is cheaper than one
near-dup pass.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_streams_clojure_spark import get_spark
from kafka_streams_clojure_spark.queries import queries


def main(sf_dir: str, stop: bool = True) -> None:
    spark = get_spark("kscs-audit-example")
    qs = queries()

    # 1. Does every doc the pipeline assumes has an embedding actually
    #    have one? (At sf0.1 the fixture itself says no for 3000/5000.)
    integrity = qs["q_llm_corpus_integrity"](spark, sf_dir)
    print("— corpus integrity (per source + orphan sentinel) —")
    integrity.orderBy("source").show(25, truncate=False)

    # 2. Which filter stage eats the corpus? (counts AND char mass)
    print("— curation-loss funnel —")
    qs["q_llm_filter_funnel"](spark, sf_dir).orderBy("stage_idx").show(
        truncate=False
    )

    # 3. Where does duplication come from — crawler artifacts
    #    (same-source) or syndication (cross-source)?
    print("— near-dup provenance —")
    qs["q_llm_dup_provenance"](spark, sf_dir).show(truncate=False)

    # 4. The sparse fingerprint view of the same question (MOSS
    #    winnowing: ~2/(w+1) of the shingle exchange).
    n_winnow = qs["q_llm_winnowing"](spark, sf_dir).count()
    print(f"winnowing candidate pairs (>=2 shared fingerprints): {n_winnow}")

    # 5. Rare-token screening: the lowest-commonness docs are the
    #    OCR-garbage / wrong-language candidates a perplexity filter
    #    would flag — here with zero model dependencies.
    print("— 5 least-common documents —")
    qs["q_llm_commonness"](spark, sf_dir).orderBy(
        "commonness", "doc_id"
    ).show(5, truncate=False)

    # 6. Token-budget forecast: where the whitespace count understates
    #    real tokenizer cost (symbol-heavy / CJK docs).
    print("— highest BPE-pretoken inflation —")
    qs["q_llm_bpe_pretokens"](spark, sf_dir).orderBy(
        F.desc("pretokens_per_word"), "doc_id"
    ).show(5, truncate=False)

    # 7. Split census + privacy posture.
    print("— train/val/test census —")
    qs["q_llm_eval_split"](spark, sf_dir).orderBy("split", "source").show(
        8, truncate=False
    )
    under_k = qs["q_llm_k_anonymity"](spark, sf_dir).count()
    under_l = (
        qs["q_llm_l_diversity"](spark, sf_dir).filter(F.col("under_l3")).count()
    )
    print(f"k-anonymity groups under k=5: {under_k}; "
          f"l-diversity groups under l=3: {under_l}")

    # 8. Quality-rule tuning table: which Gopher rule would eat how
    #    much of THIS corpus (read before committing thresholds).
    print("— Gopher rule report —")
    qs["q_llm_gopher_rules"](spark, sf_dir).orderBy("rule").show(
        truncate=False
    )

    # 9. CCNet head/middle/tail terciles of the perplexity stand-in —
    #    the keep-head+middle decision table.
    print("— CCNet quality buckets —")
    qs["q_llm_ccnet_buckets"](spark, sf_dir).orderBy("bucket").show(
        truncate=False
    )

    # 10. Dedup threshold sweep: one pair-table build, every cut — a
    #     cliff between adjacent cuts marks the corpus's near-dup band.
    print("— Jaccard threshold-sensitivity curve —")
    qs["q_llm_dedup_threshold_curve"](spark, sf_dir).orderBy("t10").show(
        truncate=False
    )

    # 11. Embedding-space collapse check: mean pairwise similarity in
    #     ONE corpus pass via the Gram-sum identity (never N² pairs) —
    #     and the DIRECTION side: how much energy the single top
    #     direction carries (integer power iteration).
    print("— embedding isotropy —")
    qs["q_llm_isotropy"](spark, sf_dir).show(truncate=False)
    print("— dominant-direction share —")
    qs["q_llm_top_direction"](spark, sf_dir).show(truncate=False)

    if stop:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
