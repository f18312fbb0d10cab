"""Shared test fixtures: one SparkSession per test run, SF dir paths."""

from __future__ import annotations

import os
import sys

import pytest

# Repo root on sys.path so `import __spark_entry__` and the package work
# regardless of how pytest is invoked.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scylladb_redpanda_cdc_spark.session import get_session  # noqa: E402

#: Tests run at the smallest SF for speed; the driver's gate runs sf0.01.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_session("scylladb-redpanda-cdc-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
