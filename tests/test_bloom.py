"""Bloom-prefiltered ingest dedup (`operators/bloom.py`).

Contracts under test:
- NO FALSE NEGATIVES: every key present in the build set is flagged
  ``__maybe`` (this is what makes the composed dedup exact).
- composed output == the plain ``incremental_dedup`` exact result.
- FPR stays within the geometry's theoretical bound (loose 5× margin).
- plan shape: the confirm path uses only broadcast joins — no
  SortMergeJoin anywhere in the composed physical plan.
- geometry validation errors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.operators.bloom import (
    bloom_build,
    bloom_incremental_dedup,
    bloom_prefilter,
)
from kafka_streams_clojure_spark.operators.dedup import incremental_dedup
from kafka_streams_clojure_spark.operators.text import fingerprint
from kafka_streams_clojure_spark.session import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_no_false_negatives(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    keys = docs.select(fingerprint(F.col("text")).alias("__fp"))
    bloom = bloom_build(keys, "__fp", m_bits=1 << 14, k=5)
    flagged = bloom_prefilter(keys, "__fp", bloom, m_bits=1 << 14, k=5)
    n = flagged.count()
    assert n > 0
    assert flagged.filter(F.col("__maybe")).count() == n


def test_fpr_within_bound(spark, sf_dir):
    """Keys disjoint from the build set: observed FPR must stay within
    5× the theoretical (1 - e^{-kn/m})^k for the geometry."""
    import math

    docs = _docs(spark, sf_dir)
    corpus = docs.select(fingerprint(F.col("text")).alias("__fp")).distinct()
    # disjoint probe keys: fingerprints of salted text never collide
    # with real ones
    probes = docs.select(
        fingerprint(F.concat(F.lit("__bloomprobe__"), F.col("text"))).alias("__fp")
    )
    m_bits, k = 1 << 14, 5
    n = corpus.count()
    bloom = bloom_build(corpus, "__fp", m_bits, k)
    flagged = bloom_prefilter(probes, "__fp", bloom, m_bits, k)
    total = flagged.count()
    fps = flagged.filter(F.col("__maybe")).count()
    theo = (1.0 - math.exp(-k * n / m_bits)) ** k
    assert fps / total <= max(5 * theo, 0.02), (fps, total, theo)


def test_composed_equals_exact(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    delta = docs.filter(F.col("doc_id") % 3 != 0)
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    got = sorted(
        r.doc_id for r in bloom_incremental_dedup(delta, corpus).select("doc_id").collect()
    )
    want = sorted(
        r.doc_id for r in incremental_dedup(delta, corpus).select("doc_id").collect()
    )
    assert got == want and len(got) > 0


def test_planted_duplicates_are_dropped(spark):
    """Synthetic: delta rows whose text IS in the corpus must not
    survive, batch-internal dups keep min id — even at a tiny m where
    false positives are certain (exactness must not depend on FPR)."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [
            (10, "alpha  BETA"),  # normalized dup of corpus 1 → dropped
            (11, "fresh one"),
            (12, "fresh one"),  # batch dup of 11 → dropped
            (13, "epsilon"),
        ],
        "doc_id long, text string",
    )
    out = sorted(
        r.doc_id
        for r in bloom_incremental_dedup(delta, corpus, m_bits=64, k=2)
        .select("doc_id")
        .collect()
    )
    assert out == [11, 13]


def test_plan_has_no_sort_merge_join(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = bloom_incremental_dedup(
        docs.filter(F.col("doc_id") % 3 != 0), docs.filter(F.col("doc_id") % 3 == 0)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_geometry_validation(spark):
    keys = spark.range(1).selectExpr("cast(id as string) as k")
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(keys, "k", m_bits=100)
    with pytest.raises(ValueError, match="k"):
        bloom_build(keys, "k", m_bits=128, k=0)


def test_sparse_bitmap_is_bounded(spark, sf_dir):
    m_bits = 1 << 12
    docs = _docs(spark, sf_dir)
    keys = docs.select(fingerprint(F.col("text")).alias("__fp"))
    bloom = bloom_build(keys, "__fp", m_bits=m_bits, k=5)
    assert bloom.count() <= m_bits // 64
