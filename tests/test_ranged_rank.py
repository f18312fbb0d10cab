"""operators.rank.ranged_rank — exactness + the balance property that
motivated it (round 11, VERDICT r10 task 1).

The round-10 two-phase ranks partitioned by VALUE-DERIVED cells
(binary magnitude / fixed grids), which bound the number of cells but
not the fattest one: a zipf vocabulary puts ~half of all distinct
tokens in the hapax (n=1) cell, so one task sorted half the vocabulary.
ranged_rank samples range boundaries from the data, so partition sizes
are bounded by ROW COUNT under any distribution. These tests pin:

1. exact rank / running-sum / group-total equality against a
   driver-side reference sort, on a hapax-dominated synthetic vocab;
2. the balance law itself — under a hapax-dominated vocabulary NO
   range partition holds more than a small multiple of rows/P (the
   round-10 cell plan put ~50% in one partition);
3. the degenerate all-equal-score case (the b40/x121 failure mode for
   fixed grids) stays exact and balanced — the tiebreak key spreads it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.operators.rank import ranged_rank


def _hapax_vocab(spark, n_hapax=4000, n_head=200):
    """(token, n): a zipf-shaped vocabulary — a small head with distinct
    frequencies and a hapax tail holding ~95% of distinct tokens."""
    rows = [(f"head_{i:04d}", int(2 + (n_head - i) ** 2)) for i in range(n_head)]
    rows += [(f"hapax_{i:06d}", 1) for i in range(n_hapax)]
    return spark.createDataFrame(rows, "token string, n long")


def test_ranged_rank_exact_on_hapax_vocab(spark):
    df = _hapax_vocab(spark)
    got = (
        ranged_rank(
            df,
            [F.col("n").desc(), F.col("token").asc()],
            mass_col="n",
            npart=16,
        )
        .select("token", "n", "rank", "cum")
        .collect()
    )
    ref = sorted(((r["token"], r["n"]) for r in got), key=lambda t: (-t[1], t[0]))
    want_rank = {tok: i + 1 for i, (tok, _n) in enumerate(ref)}
    cum, want_cum = 0, {}
    for tok, n in ref:
        cum += n
        want_cum[tok] = cum
    assert len(got) == len(ref)
    for r in got:
        assert r["rank"] == want_rank[r["token"]], r
        assert r["cum"] == want_cum[r["token"]], r


def test_ranged_partitions_are_balanced_under_hapax_skew(spark):
    """The balance law: the kernel's range step (repartitionByRange on
    the exact sort order) must never concentrate the hapax mass — the
    fattest partition stays within a small multiple of rows/P, where
    the round-10 cell plan held ~95% of rows in one cell."""
    df = _hapax_vocab(spark)
    npart = 16
    sizes = (
        df.repartitionByRange(npart, F.col("n").desc(), F.col("token").asc())
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in sizes)
    fattest = max(r["count"] for r in sizes)
    # Sampled boundaries are approximate; 3x the ideal share is a loose
    # bound that still rules out the hapax collapse (~95% in one task).
    assert fattest <= 3 * total / npart, sizes


def test_ranged_rank_empty_and_single_row(spark):
    """Edge inputs the boundary sampler must survive: an empty frame (a
    filtered slice with zero rows) and a single row (one partition gets
    everything, every offset map is trivial)."""
    empty = spark.createDataFrame([], "token string, n long")
    assert (
        ranged_rank(
            empty, [F.col("n").desc(), F.col("token").asc()], mass_col="n"
        ).count()
        == 0
    )
    one = spark.createDataFrame([("solo", 5)], "token string, n long")
    row = ranged_rank(
        one, [F.col("n").desc(), F.col("token").asc()], mass_col="n"
    ).first()
    assert (row["rank"], row["cum"]) == (1, 5)


def test_ranged_rank_grouped_and_degenerate_scores(spark):
    """x78/b40's failure mode for fixed grids: ALL scores equal. The
    rank must fall back to the pure tiebreak order per group, and the
    group total must be exact."""
    rows = [(f"en", f"d{i:03d}", 7) for i in range(300)]
    rows += [(f"fr", f"d{i:03d}", 7) for i in range(100)]
    df = spark.createDataFrame(rows, "lang string, doc_id string, score long")
    got = ranged_rank(
        df,
        [F.col("score").desc(), F.col("doc_id").asc()],
        group_cols=("lang",),
        rank_col="r",
        total_col="n",
        npart=8,
    ).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 300, "fr": 100}
    for lang, members in by_lang.items():
        members.sort(key=lambda r: r["doc_id"])
        for i, r in enumerate(members):
            assert r["r"] == i + 1, r
            assert r["n"] == len(members), r
