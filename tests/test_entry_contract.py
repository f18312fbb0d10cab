"""Driver-contract surface invariants for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle is a non-empty SELECT/WITH statement
    for qid, sql in oracles.items():
        head = sql.lstrip().split(None, 1)[0].upper()
        assert head in ("SELECT", "WITH"), f"{qid}: {head}"


def test_rows_only_set_is_the_documented_one():
    """EVERY query carries a strict value oracle (the former seeded-hash
    holdouts x2/x4/x10/x12 now use engine-portable sha-prefix hashes) — a
    new query silently missing its oracle is a bug, not a choice."""
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()


def test_entry_runs_and_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"customer_id", "n_orders", "total_spend"}
