"""KTable semantics (reference roadmap: KTable integration,
README.md:33-34; ordered state stores api.clj:102-152).

A KTable is the latest-state view of a changelog: per key, the newest
record wins (log compaction). Batch form: ``latest_by_key`` — one
shuffle, max_by on a (ts, tiebreak) struct, no window sort. Streaming
form: the parquet store tables of queries/streaming_keys (point/
range reads); deletes (tombstones) are null-value records filtered
after compaction, mirroring Kafka's tombstone contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_cols: Sequence[str],
    drop_tombstones: str | None = None,
) -> DataFrame:
    """Compact a changelog to its latest state per key.

    ``order_cols`` must totally order each key's records (e.g.
    ``["ts", "event_id"]``). Implemented with ``max_by`` over a packed
    order struct — a plain two-phase aggregation (shuffle ∝ #keys),
    cheaper than the row_number-window alternative which must sort
    every group. ``drop_tombstones``: name of a value column whose
    null marks a delete — such keys are removed AFTER compaction
    (a tombstone only deletes if it is the newest record).
    """
    order = F.struct(*[F.col(c) for c in order_cols])
    # ONE max_by over a packed payload struct: even if order_cols tie
    # within a key, all value columns come from the SAME winning row —
    # independent per-column max_by calls could stitch tied rows into a
    # row that never existed.
    payload = F.struct(*[F.col(c) for c in value_cols])
    compacted = df.groupBy(*key_cols).agg(
        F.max_by(payload, order).alias("__val"), F.max(order).alias("__ord")
    )
    out = compacted.select(
        *key_cols,
        *[F.col("__val")[c].alias(c) for c in value_cols],
        *[F.col("__ord")[c].alias(f"latest_{c}") for c in order_cols],
    )
    if drop_tombstones is not None:
        out = out.filter(F.col(drop_tombstones).isNotNull())
    return out
