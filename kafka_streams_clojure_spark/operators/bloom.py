"""In-plan Bloom filter for delta-vs-corpus membership prefiltering
(`[ext]`, north-star mandate — the standard 100 TB ingest-dedup trick).

Spark's own runtime row-level filtering (`BloomFilterAggregate` behind
``spark.sql.optimizer.runtime.bloomFilter.enabled``) is not exposed as
a public SQL function, so the filter is built natively in DataFrame
ops, which also makes its layout explicit and testable:

- **representation**: a SPARSE bitmap — one ``(word int, mask long)``
  row per touched 64-bit word of an ``m_bits``-wide Bloom filter. At
  most ``m_bits/64`` rows regardless of corpus size.
- **build** (:func:`bloom_build`): each corpus key sets ``k`` bits at
  positions ``pmod(xxhash64(key, seed_i), m_bits)``; the ``bit_or``
  aggregation computes per-partition partial masks map-side, so the
  ONLY exchange is ≤ ``m_bits/64`` rows per partition — corpus-size
  independent. The corpus itself never shuffles.
- **probe** (:func:`bloom_prefilter`): ``k`` chained BROADCAST hash
  joins of the (tiny) mask table against the delta — zero shuffles of
  the probed side, fully codegen'd bit tests. A row is ``__maybe``
  only if ALL ``k`` probed bits are set; a missing word row means the
  bit is 0.

The Bloom guarantees NO FALSE NEGATIVES: a key the corpus contains is
always flagged ``__maybe``. False positives only route extra delta
rows to the exact-confirm join in :func:`bloom_incremental_dedup`, so
the composed operator's OUTPUT is exact — identical to
``operators.dedup.incremental_dedup`` — which is why the query key
carrying it is oracle-gated, not rows-only.

Sizing: FPR ≈ (1 - e^(-k·n/m))^k. At 100 TB the corpus digest table
has ~10⁹–10¹¹ keys; 10 bits/key ≈ 1% FPR means the mask table is
~1–100 GB — broadcastable at the low end, and above that you shard
the filter by digest prefix (probe joins gain the prefix as a key) or
accept a higher FPR: every false positive costs one exact-confirm
probe, never a wrong answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streams_clojure_spark.operators._cache import persist_if_uncached
from kafka_streams_clojure_spark.operators.text import fingerprint


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 1 << 17, k: int = 5) -> DataFrame:
    """Sparse Bloom bitmap ``(word, mask)`` over ``keys[key_col]``.

    ``m_bits`` must be a multiple of 64. One explode (k rows/key) +
    one ``bit_or`` groupBy whose exchange is bounded by ``m_bits/64``
    rows per partition — the build never moves corpus-sized data.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits ({m_bits}) must be a positive multiple of 64")
    if k < 1:
        raise ValueError(f"k ({k}) must be >= 1")
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
                for i in range(k)
            ]
        )
    ).alias("__h")
    return (
        keys.select(pos)
        .select(
            (F.col("__h") / 64).cast("int").alias("word"),
            # shiftleft with a column amount: the SQL form accepts
            # expressions for both operands (the PySpark wrapper
            # restricts the amount to a Python int)
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__h % 64 AS INT))").alias("__bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("__bit").alias("mask"))
    )


def bloom_prefilter(
    df: DataFrame, key_col: str, bloom: DataFrame, m_bits: int = 1 << 17, k: int = 5
) -> DataFrame:
    """Adds ``__maybe`` (boolean): could ``df[key_col]`` be in the set
    the Bloom was built over? ``k`` broadcast joins on the word index,
    one per hash seed — no shuffle of ``df``. Must be called with the
    SAME ``m_bits``/``k`` as :func:`bloom_build` (different geometry
    would silently break the no-false-negative guarantee)."""
    out = df
    maybe: Column = F.lit(True)
    probe_cols: list[str] = []
    for i in range(k):
        h = F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits))
        w, b, m = f"__w{i}", f"__b{i}", f"__m{i}"
        out = (
            out.withColumn(w, (h / 64).cast("int"))
            .withColumn(b, (h % 64).cast("int"))
            .join(
                F.broadcast(bloom.select(F.col("word").alias(w), F.col("mask").alias(m))),
                w,
                "left",
            )
        )
        hit = F.when(
            F.col(m).isNotNull(),
            F.expr(f"shiftright({m}, {b}) & 1") == 1,
        ).otherwise(F.lit(False))
        maybe = maybe & hit
        probe_cols += [w, b, m]
    return out.withColumn("__maybe", maybe).drop(*probe_cols)


def bloom_incremental_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp: Column | None = None,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """Exact ingest-delta dedup with a Bloom prefilter — the zero-big-
    shuffle twin of :func:`operators.dedup.incremental_dedup` (same
    output contract: keep new docs whose fingerprint is absent from
    the corpus AND first (min id) within the batch).

    Plan shape — NEITHER big table ever shuffles:

    1. build the Bloom over corpus fingerprints (exchange ≤ m/64 rows),
    2. flag the delta via k broadcast word-joins (map-side only),
    3. ``NOT __maybe`` rows are definitely fresh — they skip the
       corpus entirely (at a steady-state crawl, that is MOST rows),
    4. ``__maybe`` candidates' fps are broadcast AGAINST the corpus
       scan (left-semi) to find the truly-present fps, which broadcast
       back for the anti join — both joins broadcast the small side,
    5. within-batch keep-first is the one delta-keyed aggregation.

    The only corpus-sized work is two column-pruned digest scans
    (build + confirm); with a persisted fingerprint store both become
    metadata-cheap. False positives cost extra confirm probes, never
    wrong output.
    """
    fp_expr = fingerprint(F.col(text_col)) if fp is None else fp
    corpus_fp = corpus_df.select(fp_expr.alias("__fp"))
    bloom = bloom_build(corpus_fp, "__fp", m_bits, k)
    flagged = persist_if_uncached(
        bloom_prefilter(new_df.withColumn("__fp", fp_expr), "__fp", bloom, m_bits, k)
    )
    definite = flagged.filter(~F.col("__maybe"))
    cand = flagged.filter(F.col("__maybe"))
    # fps that truly exist in the corpus: semi join with the CANDIDATE
    # side broadcast, so the corpus digest scan streams map-side
    hit_fps = corpus_fp.join(
        F.broadcast(cand.select("__fp").distinct()), "__fp", "left_semi"
    ).distinct()
    confirmed = cand.join(F.broadcast(hit_fps), "__fp", "left_anti")
    fresh = definite.unionByName(confirmed)
    keep = fresh.groupBy("__fp").agg(F.min(id_col).alias(id_col)).select(id_col)
    return fresh.join(keep, id_col, "left_semi").drop("__fp", "__maybe")
