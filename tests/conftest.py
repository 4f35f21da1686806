"""Shared fixtures: one SparkSession per test session, one DuckDB
connection with the fixture tables registered as views (mirrors the
driver's oracle setup)."""

from __future__ import annotations

import os

import duckdb
import pytest

from csv2db_spark import get_spark
from csv2db_spark.sources.tables import TABLES

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("csv2db-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()
