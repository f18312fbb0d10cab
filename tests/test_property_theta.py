"""Randomized equivalence check for the b13 theta-join decomposition.

b13 computes per-supplier counts of strictly-richer customers WITHOUT the
nested-loop join (bucket + suffix-sum + per-bucket merge-rank —
plans/batch_queries.py). Its contract is exact equivalence with the naive
``s JOIN c ON s_acctbal < c_acctbal GROUP BY s_suppkey`` inner join.
Randomized inputs deliberately include ties, negative balances, and values
on exact bucket-width multiples (the decomposition's edge cases).
"""

from __future__ import annotations

import numpy as np
import pytest

from scylladb_redpanda_cdc_spark.plans import registry


def _expected(s_bals: np.ndarray, c_bals: np.ndarray) -> dict[int, int]:
    """Reference model: n_richer per supplier via sorted binary search;
    zero-richer suppliers excluded (inner-join COUNT(*) semantics)."""
    cs = np.sort(c_bals)
    out = {}
    for i, bal in enumerate(s_bals):
        n = len(cs) - np.searchsorted(cs, bal, side="right")
        if n > 0:
            out[i] = int(n)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_theta_decomposition_equals_naive_join(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    n_s, n_c = 120, 250
    # Mix: uniform over the TPC-H acctbal domain, exact bucket-width
    # multiples (x*100.0), and shared values forcing supplier/customer ties.
    shared = rng.uniform(-999.99, 9999.99, 30).round(2)
    s_bals = np.concatenate(
        [
            rng.uniform(-999.99, 9999.99, n_s - 40).round(2),
            rng.integers(-9, 99, 10).astype("float64") * 100.0,
            shared,
        ]
    )
    c_bals = np.concatenate(
        [
            rng.uniform(-999.99, 9999.99, n_c - 40).round(2),
            rng.integers(-9, 99, 10).astype("float64") * 100.0,
            shared,
        ]
    )
    sdir = str(tmp_path)
    spark.createDataFrame(
        [(int(i), float(b)) for i, b in enumerate(s_bals)],
        "s_suppkey long, s_acctbal double",
    ).write.mode("overwrite").parquet(f"{sdir}/supplier.parquet")
    spark.createDataFrame(
        [(int(i), float(b)) for i, b in enumerate(c_bals)],
        "c_custkey long, c_acctbal double",
    ).write.mode("overwrite").parquet(f"{sdir}/customer.parquet")

    got = {
        r["s_suppkey"]: r["n_richer_customers"]
        for r in registry()["b13_join_theta_range"].build(spark, sdir).collect()
    }
    assert got == _expected(s_bals, c_bals)
