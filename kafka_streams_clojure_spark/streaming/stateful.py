"""Custom per-key stateful operators (Stores-API parity).

The reference's declared goal: "stateful transducers ... over Kafka
Streams state stores" for joins/windowed aggregates/custom state
(reference README.md:66-68); each transducer instance owns per-task
state (api.clj:41-45). Spark mapping: ``applyInPandasWithState`` —
per-key state managed by the engine's state store, Arrow-batched user
logic, watermark-driven timeouts instead of the stubbed ``punctuate``
(api.clj:26).

Kept deliberately small (SURVEY §7 watch-list item 6): one running
aggregator that demonstrates the full state lifecycle; arbitrary user
folds plug into the same shape.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_counter(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained in engine state across
    micro-batches; emits the updated totals for every key seen in the
    batch — the KS `aggregate`-with-store analog.

    State is two scalars per key — constant memory per key regardless
    of stream length, the shape that scales to 100 TB of throughput.
    """

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

    # output key type follows the input column (a hardcoded `long`
    # would corrupt string/other keys); the value is normalized to
    # double up front so the pandas float accumulation is well-typed.
    key_type = dict(events.dtypes)[key_col]
    return (
        events.select(F.col(key_col), F.col(value_col).cast("double").alias(value_col))
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=f"key {key_type}, n long, total double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
