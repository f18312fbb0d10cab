"""Round-12 plan-semantics pins: the shared ``_simhash`` kernel.

Round 12 folded simhash16/simhash32 into one parametric kernel and added
the NULL-token-array → 0 coalesce (the pre-rewrite per-bit form returned
0 there, the one-fold form propagated NULL, and the x10 DuckDB oracle
COALESCEs missing signatures to 0 — the round-11 advice's latent
cross-engine divergence). These tests pin the contract the fixtures
cannot reach: NULL and empty arrays, and the 32-bit width against an
independent from-the-spec recompute (round 11 pinned only the 16-bit
width).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.operators.llm import simhash16, simhash32
from tests.simhash_ref import simhash_ref


def test_simhash_null_and_empty_arrays_yield_zero(spark):
    """NULL array → 0 (the coalesce), empty array → 0 (an empty fold has
    zero votes, no bit positive) — for BOTH widths, matching the oracles'
    ``COALESCE(sig, 0)`` over the docs LEFT JOIN."""
    df = spark.createDataFrame(
        [(0, None), (1, [])], "i int, ws array<string>"
    ).select(
        "i",
        simhash16(F.col("ws")).alias("s16"),
        simhash32(F.col("ws")).alias("s32"),
    )
    got = {r["i"]: (r["s16"], r["s32"]) for r in df.collect()}
    assert got[0] == (0, 0), "NULL token array must coalesce to signature 0"
    assert got[1] == (0, 0), "empty token array must fold to signature 0"


def test_simhash32_matches_independent_reference(spark):
    """The shared kernel at 32 bits == a from-the-spec Python recompute
    over the 8-hex-char sha256 prefix (hash32)."""
    samples = [
        ["the", "quick", "brown", "fox"],
        ["the", "quick", "brown", "fox", "fox", "fox"],
        ["lorem"],
        [],
        ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j"],
    ]
    df = spark.createDataFrame(
        [(i, ws) for i, ws in enumerate(samples)], "i int, ws array<string>"
    ).select("i", simhash32(F.col("ws")).alias("sig"))
    got = {r["i"]: r["sig"] for r in df.collect()}
    for i, ws in enumerate(samples):
        assert got[i] == simhash_ref(ws, 32, 8), (i, ws)


def test_simhash_widths_share_low_bit_structure(spark):
    """The two widths are the SAME fold over NESTED hash prefixes:
    ``hash16`` (first 4 sha256 hex chars) is exactly the high 16 bits of
    ``hash32`` (first 8), so bit b of the 16-bit vote equals bit b+16 of
    the 32-bit vote and ``simhash16(ws) == simhash32(ws) >> 16``
    identically. Round 14's shared `_simhash_sigs` frame (x10 reads the
    top half of x101's signature — one tokenize + sha pass + one fold for
    the pair) rests on this identity; both must also be deterministic,
    non-negative longs within their width."""
    df = spark.createDataFrame(
        [(i, [f"tok{i}", f"tok{i+1}", "shared"]) for i in range(50)],
        "i int, ws array<string>",
    ).select(
        "i",
        simhash16(F.col("ws")).alias("s16"),
        simhash32(F.col("ws")).alias("s32"),
    )
    rows = df.collect()
    again = {r["i"]: (r["s16"], r["s32"]) for r in df.collect()}
    for r in rows:
        assert 0 <= r["s16"] < (1 << 16)
        assert 0 <= r["s32"] < (1 << 32)
        assert r["s16"] == r["s32"] >> 16
        assert again[r["i"]] == (r["s16"], r["s32"])
