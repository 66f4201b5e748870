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
