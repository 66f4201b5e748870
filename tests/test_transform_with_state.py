"""transformWithStateInPandas (Spark 4 arbitrary-state v2: typed state
variables + explicit timers) — ENV-GATED: the API's Python worker talks
to the state server over protobuf, and this container ships no
``google.protobuf`` (verified: ModuleNotFoundError; no pip access).
The engine's stateful surface runs on ``applyInPandasWithState``
(punctuate timers, running counters) which needs no protobuf; this
test auto-activates the moment the environment gains the dependency,
so the modern-API port is a test run away, not a code change.
"""

from __future__ import annotations

import importlib.util

import pytest

try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no parent 'google' namespace package at all
    _HAS_PROTOBUF = False


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas requires google.protobuf (state-server "
    "protocol); not installed in this container and pip is unavailable — "
    "the applyInPandasWithState surface (punctuate/counter) covers parity",
)
def test_transform_with_state_running_count(spark, tmp_path):
    """Minimal TWS smoke: per-key running count with a ValueState."""
    import os
    import uuid

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.n = handle.getValueState("n", "n long")

        def handleInputRows(self, key, rows, timerValues):
            n = self.n.get()[0] if self.n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self.n.update((n,))
            yield pd.DataFrame({"key": [key[0]], "n": [n]})

        def close(self) -> None:
            pass

    d = str(tmp_path / "p0")
    spark.createDataFrame(
        [("a",), ("a",), ("b",)], "user_id string"
    ).coalesce(1).write.parquet(d)
    stream = spark.readStream.schema("user_id string").parquet(str(tmp_path / "p*"))
    out = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Counter(),
        outputStructType="key string, n long",
        outputMode="update",
        timeMode="none",
    )
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    got = {r.key: r.n for r in spark.table(name).collect()}
    assert got == {"a": 2, "b": 1}
