"""Round-11 rewrite guards: f12's bounded try_* failing strata and the
one-fold simhash16 kernel.

f12 bounds the exception-backed failure cases to the
``l_linenumber = 4 AND l_orderkey % 64 = 0`` slice (Spark's try_*
failure path builds a SparkException per failing row, ~15 µs — the old
majority-failing columns cost 6.4 s at sf0.1). The bound makes the
failing stratum NARROW, so a fixture change could silently empty it
and the query would stop exercising the failure path at all — these
tests pin both paths present at the smallest fixture.

simhash16 was rewritten from 16 per-bit ``aggregate`` folds (each
re-evaluating the sha256 token-hash transform) to one vote-array fold.
The signature definition must not have moved: a third, independent
implementation (Python hashlib over the same spec) recomputes it
bit-for-bit here, beyond the DuckDB oracle both engines share.
"""

from __future__ import annotations


from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.operators.llm import simhash16
from scylladb_redpanda_cdc_spark.plans import registry


def test_f12_every_try_column_exercises_both_paths(spark, sf_dir):
    """Each exception-backed try column must carry BOTH nulls (the
    bounded failing stratum) and values, even at sf0.001; the
    always-succeeding control column must carry no nulls."""
    df = registry()["f12_fn_try_safe"].build(spark, sf_dir)
    agg = df.agg(
        *[
            f(c).alias(f"{c}_{n}")
            for c in ("safe_div", "safe_mul", "cast_bad", "elem")
            for n, f in (
                ("nulls", lambda col: F.count_if(F.col(col).isNull())),
                ("vals", lambda col: F.count_if(F.col(col).isNotNull())),
            )
        ],
        F.count_if(F.col("cast_ok").isNull()).alias("ok_nulls"),
        F.count("*").alias("n"),
    ).first()
    for c in ("safe_div", "safe_mul", "cast_bad", "elem"):
        assert agg[f"{c}_nulls"] > 0, f"{c}: failing path not exercised"
        assert agg[f"{c}_vals"] > 0, f"{c}: succeeding path not exercised"
    assert agg["ok_nulls"] == 0, "control column must never fail"
    assert agg["n"] > 0


def test_f12_failing_stratum_is_the_declared_slice(spark, sf_dir):
    """The exception-backed nulls appear EXACTLY on the declared
    (l_linenumber = 4, l_orderkey % 64 = 0) slice — the stratum is a
    plan contract (it bounds the per-row exception cost), not an
    incidental data property."""
    df = registry()["f12_fn_try_safe"].build(spark, sf_dir)
    on_slice = (F.col("l_linenumber") == 4) & (F.col("l_orderkey") % 64 == 0)
    bad = df.filter(
        (F.col("safe_mul").isNull() | F.col("cast_bad").isNull())
        != on_slice
    ).count()
    assert bad == 0


def test_simhash16_matches_independent_reference(spark):
    """One-fold Spark kernel == a from-the-spec Python recompute: for
    each bit b of the sha256-prefix 16-bit token hash, vote +1/-1 over
    the tokens; bit set iff the vote sum is positive."""

    from tests.simhash_ref import simhash_ref

    def ref(tokens: list[str]) -> int:
        return simhash_ref(tokens, 16, 4)

    samples = [
        ["the", "quick", "brown", "fox"],
        ["the", "quick", "brown", "fox", "fox", "fox"],
        ["lorem"],
        [],
        ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j"],
    ]
    df = spark.createDataFrame(
        [(i, ws) for i, ws in enumerate(samples)], "i int, ws array<string>"
    ).select("i", simhash16(F.col("ws")).alias("sig"))
    got = {r["i"]: r["sig"] for r in df.collect()}
    for i, ws in enumerate(samples):
        assert got[i] == ref(ws), (i, ws)
