"""Idempotent persist for multi-consumed subplans.

Operators whose result feeds several plan branches (self-join sides,
branch fan-outs, per-partition summaries) persist the shared subtree so
it computes once. Long sessions re-run the same operator with the same
inputs → an identical logical plan → Spark's CacheManager would log
``Asked to cache already cached data`` on every repeat and keep the one
cache entry anyway. ``persist_if_uncached`` makes the persist
idempotent: reuse the existing cache entry when the plan is already
cached (``DataFrame.storageLevel`` is a CacheManager lookup by plan,
not an object attribute), persist otherwise. Release with
``session.clear_caches`` between pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def persist_if_uncached(df: DataFrame) -> DataFrame:
    """persist() unless an identical plan is already cached."""
    if not (df.storageLevel.useMemory or df.storageLevel.useDisk):
        df = df.persist()
    return df


def persist_scoped(df: DataFrame) -> tuple[DataFrame, bool]:
    """Like :func:`persist_if_uncached`, but reports whether THIS call
    created the cache entry. Operators that unpersist on exit must use
    this — unconditionally unpersisting after a skipped persist would
    evict a cache entry the *caller* created (and still relies on)."""
    if df.storageLevel.useMemory or df.storageLevel.useDisk:
        return df, False
    return df.persist(), True
