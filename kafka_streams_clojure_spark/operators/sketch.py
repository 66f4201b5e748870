"""Bounded-memory frequency sketches: distributed Misra–Gries heavy
hitters (`[ext]`, north-star mandate — completes the approx-sketch
family next to HLL count-distinct and the GK percentile sketch).

Exact heavy hitters (groupBy + HAVING) shuffle one row per DISTINCT
item — at 100 TB of events that distinct set (URLs, user ids, query
strings) can itself be cluster-sized. The Misra–Gries summary caps
per-partition state at ``capacity`` counters and the exchange at
``capacity`` rows per partition, with the classic deterministic
guarantee (Misra & Gries 1982; merge form: Agarwal et al., "Mergeable
Summaries", PODS'12):

- ``est(x) <= true(x) <= est(x) + err`` where ``err`` is the summed
  per-partition undercount bound (``<= n / (capacity + 1)``),
- every item with ``true(x) > err`` survives into the merged summary
  (no false negatives above the bound).

The per-partition summary runs in ``mapInPandas``: each Arrow batch is
counted vectorized (``value_counts``), then MG-merged into the running
``capacity``-bounded dict — the subtraction trick (drop the
``(capacity+1)``-th largest count from everything) IS the Misra–Gries
decrement, applied batch-at-a-time. Python touches ``capacity + batch``
counters per batch, never the raw rows; the final merge is a plain
map-side-combined groupBy over ``<= capacity × partitions`` rows.

These estimates are engine/order-dependent (which items get decremented
depends on partition layout), so the query key carrying this is
rows-only with invariant tests — the EXACT twin
(``q_events_heavy_hitters``) is the oracle-gated key.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_SUMMARY_SCHEMA = StructType(
    [
        StructField("item", StringType(), True),
        StructField("est", LongType(), False),
        StructField("err", LongType(), False),
    ]
)


def _mg_partition(capacity: int):
    """Per-partition Misra–Gries over an ``item`` string column.

    Emits ``(item, est, 0)`` per surviving counter plus ONE
    ``(NULL, 0, err_p)`` row carrying the partition's total undercount
    bound (everything subtracted by the decrement steps)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        err = 0
        for pdf in batches:
            vc = pdf["item"].dropna().value_counts()
            for item, c in vc.items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > capacity:
                # MG decrement, batch form: subtract the (capacity+1)-th
                # largest count from every counter, drop the non-positive
                vals = sorted(counts.values(), reverse=True)
                sub = vals[capacity]
                err += sub
                counts = {k: v - sub for k, v in counts.items() if v > sub}
        out = pd.DataFrame(
            {
                "item": list(counts.keys()) + [None],
                "est": [int(v) for v in counts.values()] + [0],
                "err": [0] * len(counts) + [int(err)],
            }
        )
        yield out.astype({"est": "int64", "err": "int64"})

    return run


def mg_summary(df: DataFrame, item_col: str, capacity: int = 256) -> DataFrame:
    """Merged Misra–Gries summary of ``df[item_col]``:
    ``(item, est, err)`` — ``err`` is the GLOBAL undercount bound
    (constant column), ``est`` the merged lower-bound count. At most
    ``capacity × partitions`` rows reach the final merge."""
    if capacity < 1:
        raise ValueError(f"capacity ({capacity}) must be >= 1")
    parts = df.select(F.col(item_col).cast("string").alias("item")).mapInPandas(
        _mg_partition(capacity), _SUMMARY_SCHEMA
    )
    merged = parts.groupBy("item").agg(
        F.sum("est").alias("est"), F.sum("err").alias("__err_part")
    )
    bound = merged.agg(F.sum("__err_part").alias("err"))
    return (
        merged.filter(F.col("item").isNotNull())
        .crossJoin(F.broadcast(bound))
        .select("item", "est", "err")
    )


def heavy_hitters_sketch(
    df: DataFrame,
    item_col: str,
    phi: float | None = 0.01,
    capacity: int = 256,
    min_count: int | None = None,
) -> DataFrame:
    """Items whose TRUE frequency could exceed the threshold —
    ``phi · n`` (relative) or ``min_count`` (absolute; overrides
    ``phi``) — from the bounded-memory sketch: keep
    ``est + err >= threshold``. Because ``est + err >= true`` always,
    the output is a guaranteed SUPERSET of the true heavy hitters; the
    false-positive band is the classic MG ``threshold - err`` slack
    (``err <= n/(capacity+1)``), so size ``capacity`` to the
    threshold.

    Returns ``(item, est, err, n_total)`` — callers see both the
    lower-bound count and the exact confidence band, so a downstream
    exact confirmation (filter + count on just these items) is one
    cheap semi-join away, mirroring the Bloom-confirm pattern."""
    if min_count is None and not (phi and 0 < phi < 1):
        raise ValueError(f"phi ({phi}) must be in (0, 1) when min_count is unset")
    summary = mg_summary(df, item_col, capacity)
    n = df.select(F.count(F.col(item_col)).alias("n_total"))
    threshold = (
        F.lit(float(min_count)) if min_count is not None else phi * F.col("n_total")
    )
    return (
        summary.crossJoin(F.broadcast(n))
        .filter((F.col("est") + F.col("err")).cast("double") >= threshold)
        .select("item", "est", "err", "n_total")
    )


# ── Count-Min sketch ────────────────────────────────────────────────
#
# The point-query twin of the MG heavy-hitter summary: MG answers "which
# items are frequent", CMS answers "how frequent is THIS item" for any
# item, from depth × width counters regardless of item cardinality.
# Pure built-ins (explode + groupBy on xxhash64 slots) — no Python in
# the row path, unlike the MG pass which needs the decrement loop.
# Estimates are hash-dependent (overestimates from slot collisions), so
# consumers are rows-only keys with invariant tests:
#   est(x) >= true(x) always (counters only ever add), and
#   per-row mass conservation: Σ_slot cnt(d, slot) == n for every d.


def cms_table(
    df: DataFrame, item_col: str, width: int = 512, depth: int = 4, seed: int = 0
) -> DataFrame:
    """Build the sketch: ``(d, slot, cnt)`` rows, ``depth × width``
    cells max. One explode (×depth) + one two-phase groupBy — the
    exchange is bounded by the CELL count, not the item cardinality,
    which is the whole point at 100 TB."""
    if width < 1 or depth < 1:
        raise ValueError(f"width ({width}) and depth ({depth}) must be >= 1")
    rows = df.select(F.col(item_col).cast("string").alias("item"))
    cells = rows.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            F.xxhash64(F.col("item"), F.lit(seed + d)), F.lit(width)
                        ).alias("slot"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    ).select("c.d", "c.slot")
    return cells.groupBy("d", "slot").agg(F.count("*").alias("cnt"))


def cms_query(
    table: DataFrame,
    items_df: DataFrame,
    item_col: str,
    width: int = 512,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Point-query estimates for every row of ``items_df``: min over
    the ``depth`` rows of the item's cell counts (absent cell = 0).
    The sketch table (≤ depth × width rows) is broadcast — query cost
    is a map-side join however many items are probed."""
    probes = items_df.select(F.col(item_col).cast("string").alias("item")).select(
        "item",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            F.xxhash64(F.col("item"), F.lit(seed + d)), F.lit(width)
                        ).alias("slot"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select("item", "c.d", "c.slot")
    return (
        probes.join(F.broadcast(table), ["d", "slot"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
