"""Per-record error tolerance (SURVEY §2.9).

The reference wraps every record in try/catch: a failing record is
printed and DROPPED, the stream survives (reference api.clj:21-24).
The engine mirrors that contract at micro-batch scale: user Python
logic runs inside an Arrow-batched wrapper that isolates failures to
the offending records instead of failing the query — never
per-record commits, never query-killing poison pills.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def tolerant_map_in_pandas(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    on_error: str = "drop",
) -> DataFrame:
    """Apply ``fn`` batch-wise; if a batch raises, fall back to row-wise
    application and drop (or null out) only the failing rows — the
    reference's swallow-and-continue contract without giving up Arrow
    vectorization on the happy path.

    on_error: 'drop' (reference behavior) | 'raise' (fail fast).
    """
    if on_error not in ("drop", "raise"):
        raise ValueError(f"on_error must be 'drop'|'raise', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            try:
                yield fn(pdf)
            except Exception:
                if on_error == "raise":
                    raise
                good: list[pd.DataFrame] = []
                for i in range(len(pdf)):
                    row = pdf.iloc[[i]]
                    try:
                        good.append(fn(row))
                    except Exception:
                        continue  # drop the poison record, stream survives
                if good:
                    yield pd.concat(good, ignore_index=True)

    return df.mapInPandas(run, schema=schema)
