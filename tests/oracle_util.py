"""Local mirror of the driver's DuckDB oracle comparison.

The driver compares row count + schema + order-insensitive value hash at
sf0.01 (BASELINE.md "Driver contract"). This helper reproduces that locally:
both result sets are normalized (columns sorted by name, rows sorted by all
columns, dtypes canonicalized) and compared value-by-value — stricter than a
hash mismatch report, so anything passing here should hash-match.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import pandas as pd

from scylladb_redpanda_cdc_spark.schemas import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with every driver table registered as a view,
    mirroring the driver harness (__spark_entry__.py docstring)."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v: Any) -> Any:
    """Canonicalize one value for cross-engine comparison.

    Deliberately strict (no float rounding, no int/float coercion): the
    driver hashes values, so 1864 vs 1864.0 or a last-ulp float diff is a
    real failure. Queries are designed to emit bit-stable values instead.
    """
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return f"{type(v).__name__}:{v}"


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    records = []
    for row in df.itertuples(index=False):
        rec = []
        for v in row:
            if v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
                rec.append(None)
            elif hasattr(v, "item") and not isinstance(v, (list, tuple)):
                # numpy scalar -> python
                rec.append(_canon_cell(v.item()))
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                rec.append(tuple(_canon_cell(x) for x in v))
            else:
                rec.append(_canon_cell(v))
        records.append(tuple(rec))
    return sorted(records, key=lambda r: tuple((x is None, str(x)) for x in r))


def assert_matches_oracle(spark_df, con: duckdb.DuckDBPyConnection, sql: str, qid: str = "?"):
    actual = spark_df.toPandas()
    expected = con.sql(sql).df()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{qid}: column mismatch spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{qid}: row count mismatch spark={len(actual)} oracle={len(expected)}"
    )
    a, e = normalize(actual), normalize(expected)
    mismatches = [i for i, (x, y) in enumerate(zip(a, e)) if x != y]
    assert not mismatches, (
        f"{qid}: {len(mismatches)} row mismatches; first at sorted idx {mismatches[0]}:\n"
        f"  spark : {a[mismatches[0]]}\n  oracle: {e[mismatches[0]]}\n"
        f"  columns: {sorted(actual.columns)}"
    )
