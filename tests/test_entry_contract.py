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


def test_ts_queries_survive_a_hostile_session_timezone(spark, sf_dir):
    """The driver's session timezone is OUT of our control; load_table
    pins UTC on every load, so a caller that starts in New York must get
    the exact same epoch values a UTC caller gets. Regression for the
    round-4 advisor finding (ntz casts read the session tz)."""
    import duckdb

    from scylladb_redpanda_cdc_spark.plans import registry

    specs = registry()
    con = duckdb.connect()
    for t in (
        "orders lineitem events documents"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet')"
        )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for qid in ("b35_time_bucket_rollup", "b39_cohort_retention"):
            spark.conf.set(
                "spark.sql.session.timeZone", "America/New_York"
            )
            got = sorted(
                map(
                    str,
                    specs[qid]
                    .build(spark, sf_dir)
                    .toPandas()
                    .itertuples(index=False, name=None),
                )
            )
            want = sorted(
                map(
                    str,
                    con.sql(specs[qid].oracle)
                    .df()
                    .itertuples(index=False, name=None),
                )
            )
            assert got == want, qid
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
