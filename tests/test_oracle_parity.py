"""Differential test: every registered query with an oracle must match
DuckDB exactly (the local mirror of the driver's t2 gate)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


def test_every_oracle_has_a_query():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    sdf = _QUERIES[name](spark, sf_dir)
    rel = duck.sql(_ORACLES[name])
    compare(sdf, rel, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


class _FakeSparkDF:
    """Minimal stand-in exposing toPandas(), for harness unit tests."""

    def __init__(self, pdf):
        self._pdf = pdf

    def toPandas(self):
        return self._pdf


def test_harness_rejects_tz_aware_vs_naive(duck):
    """Regression for the round-1 q_agg_sliding_window blind spot: a
    tz-aware oracle column vs a naive Spark column must FAIL (the driver
    treats it as a schema mismatch), not be normalized to UTC-naive."""
    import pandas as pd

    naive = _FakeSparkDF(
        pd.DataFrame({"w": pd.to_datetime(["2001-01-01 00:00:00"])})
    )
    tz_rel = duck.sql("SELECT to_timestamp(978307200) AS w")  # TIMESTAMPTZ
    with pytest.raises(AssertionError, match="tz-awareness mismatch"):
        compare(naive, tz_rel, "tz_guard")
    # and the naive equivalent passes
    naive_rel = duck.sql("SELECT make_timestamp(978307200000000::BIGINT) AS w")
    compare(naive, naive_rel, "tz_guard_naive")
