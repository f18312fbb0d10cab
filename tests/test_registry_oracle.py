"""The main correctness gate, run locally: every registry query with an
oracle is executed on Spark and DuckDB and compared (driver-t2 mirror)."""

from __future__ import annotations

import pytest

from scylladb_redpanda_cdc_spark.plans import registry
from tests.oracle_util import assert_matches_oracle, duckdb_connection

_SPECS = registry()


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("qid", sorted(_SPECS))
def test_query_matches_oracle(qid, spark, sf_dir, con):
    spec = _SPECS[qid]
    df = spec.build(spark, sf_dir)
    if spec.oracle is None:
        # rows-only check (streaming / approximate / wire-format outputs)
        assert df.count() >= 0
        return
    assert_matches_oracle(df, con, spec.oracle, qid)
