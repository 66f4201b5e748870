"""Shared pytest fixtures: one SparkSession + one DuckDB connection per run.

The DuckDB connection pre-registers every fixture table as a view named
like the table — mirroring the driver's oracle harness (TESTDATA.md).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from kafka_streams_clojure_spark.session import TABLES, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kscs-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
