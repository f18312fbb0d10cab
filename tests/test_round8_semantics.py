"""Targeted semantics for the round-8 operators (beyond the oracle sweep).

The parametrized registry-vs-DuckDB sweep proves value equality; these pin
the CLAIMS each round-8 docstring makes — the interval algebra of the
AS-OF read (a32/s25), the removal accounting of paragraph dedup (x118),
the funnel's monotonicity (x120), the permutation/contiguity law of the
curriculum order (x121), the loss-free merge of the salted aggregate
(b77), and the conservation laws of the skew probe (o15) and media
dedup (x122) — so a future refactor that keeps hashes equal but breaks a
stated invariant still fails loudly.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_a32_one_version_per_key_and_interval_covers_asof(spark, sf_dir):
    """AS-OF semantics (rpk_topic_consume.json:44,52 — the two-event key):
    at any instant each key has AT MOST one valid version, and every
    returned row's interval really covers the as-of point."""
    from scylladb_redpanda_cdc_spark.plans.cdc_queries import (
        a32_asof_point_in_time,
    )

    out = a32_asof_point_in_time(spark, sf_dir).cache()
    try:
        n = out.count()
        assert n > 0
        n_keys = out.select("customer_id", "order_id").distinct().count()
        assert n_keys == n, "a key returned more than one as-of version"
        bad = out.filter(
            (F.col("valid_from") > F.col("asof_offset"))
            | (
                F.col("valid_to").isNotNull()
                & (F.col("valid_to") < F.col("asof_offset"))
            )
        ).count()
        assert bad == 0
    finally:
        out.unpersist()


def test_a32_agrees_with_replay_compaction(spark, sf_dir):
    """The operator's reason to exist: the interval read must equal the
    A18-style answer — compact the log truncated at the as-of offset and
    keep non-deleted keys (their latest pre-asof c/u values)."""
    from scylladb_redpanda_cdc_spark.operators import cdc
    from scylladb_redpanda_cdc_spark.plans.cdc_queries import (
        a32_asof_point_in_time,
    )
    from scylladb_redpanda_cdc_spark.sources.changelog import synth_changelog

    out = a32_asof_point_in_time(spark, sf_dir)
    asof = out.select("asof_offset").first()[0]
    log = synth_changelog(spark, sf_dir).filter(F.col("offset") <= asof)
    replay = cdc.materialize_latest(
        log, ["customer_id", "order_id"], drop_deletes=True
    ).select("customer_id", "order_id", "totalprice", "orderstatus")
    got = out.select("customer_id", "order_id", "totalprice", "orderstatus")
    assert got.exceptAll(replay).count() == 0
    assert replay.exceptAll(got).count() == 0


def test_s25_every_event_matches_exactly_one_closed_version(spark, sf_dir):
    """Before-image law: each u/d event joins precisely the version it
    closed — valid_to must equal offset-1 (never an older interval, never
    the version the event itself opened)."""
    from scylladb_redpanda_cdc_spark.plans.streaming_queries import (
        s25_stream_before_image,
    )
    from scylladb_redpanda_cdc_spark.sources.changelog import synth_changelog

    out = s25_stream_before_image(spark, sf_dir).cache()
    try:
        n = out.count()
        assert n > 0
        assert out.select("offset").distinct().count() == n
        n_ud = (
            synth_changelog(spark, sf_dir)
            .filter(F.col("op").isin("u", "d"))
            .count()
        )
        assert n == n_ud, "some update/delete event lost its before-image"
        # the matched version is the one the event closed: its validity
        # ended exactly one offset before the event applied
        assert (
            out.filter(
                F.col("prior_valid_from") > F.col("offset") - 1
            ).count()
            == 0
        )
    finally:
        out.unpersist()


def test_x118_each_distinct_paragraph_kept_exactly_once(spark, sf_dir):
    """Removal accounting: summing kept counts over docs must equal the
    number of DISTINCT paragraphs in the corpus (first occurrence each),
    and no doc keeps more than it has."""
    from scylladb_redpanda_cdc_spark.operators.llm import hash60, words
    from scylladb_redpanda_cdc_spark.plans.llm_queries import (
        X118_PARA_W,
        x118_paragraph_dedup,
    )
    from scylladb_redpanda_cdc_spark.sources.tables import load_table

    out = x118_paragraph_dedup(spark, sf_dir).cache()
    try:
        assert out.filter(F.col("n_kept") > F.col("n_paras")).count() == 0
        kept_total = out.agg(F.sum("n_kept")).first()[0]
        t = load_table(spark, sf_dir, "documents").select(
            words(F.col("text")).alias("ws")
        ).filter(F.size("ws") > 0)
        n_blocks = F.ceil(F.size("ws") / F.lit(X118_PARA_W)).cast("int")
        paras = F.transform(
            F.sequence(F.lit(0), n_blocks - F.lit(1)),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("ws"), i * X118_PARA_W + 1, X118_PARA_W)
            ),
        )
        n_distinct = (
            t.select(F.explode(paras).alias("p"))
            .select(hash60(F.col("p")).alias("h"))
            .distinct()
            .count()
        )
        assert kept_total == n_distinct
    finally:
        out.unpersist()


def test_x120_funnel_is_monotone_and_anchored(spark, sf_dir):
    """Funnel law: stage 0 counts the whole corpus (share 1e6 ppm) and
    survivors never increase as gates conjoin."""
    from scylladb_redpanda_cdc_spark.plans.llm_queries import (
        x120_filter_funnel,
    )
    from scylladb_redpanda_cdc_spark.sources.tables import load_table

    rows = {
        r["stage_idx"]: r
        for r in x120_filter_funnel(spark, sf_dir).collect()
    }
    assert sorted(rows) == [0, 1, 2, 3]
    n_all = load_table(spark, sf_dir, "documents").count()
    assert rows[0]["n_docs"] == n_all
    assert rows[0]["doc_share_ppm"] == 1_000_000
    for i in (1, 2, 3):
        assert rows[i]["n_docs"] <= rows[i - 1]["n_docs"]
        assert rows[i]["n_ws_tokens"] <= rows[i - 1]["n_ws_tokens"]


def test_x121_rank_is_a_stage_contiguous_permutation(spark, sf_dir):
    """Serving-order law: global_rank is a permutation of 1..N and stages
    occupy contiguous rank blocks (every stage-1 doc serves before any
    stage-2 doc, etc.)."""
    from scylladb_redpanda_cdc_spark.plans.llm_queries import (
        x121_curriculum_order,
    )

    out = x121_curriculum_order(spark, sf_dir).cache()
    try:
        n = out.count()
        agg = out.agg(
            F.min("global_rank").alias("mn"),
            F.max("global_rank").alias("mx"),
            F.countDistinct("global_rank").alias("nd"),
        ).first()
        assert (agg["mn"], agg["mx"], agg["nd"]) == (1, n, n)
        spans = (
            out.groupBy("stage")
            .agg(
                F.min("global_rank").alias("lo"),
                F.max("global_rank").alias("hi"),
                F.count("*").alias("cnt"),
            )
            .orderBy("stage")
            .collect()
        )
        for s in spans:
            assert s["hi"] - s["lo"] + 1 == s["cnt"], "stage block has a gap"
    finally:
        out.unpersist()


def test_b77_salted_merge_equals_direct_groupby(spark, sf_dir):
    """The loss-free claim, in-engine: the two-phase result must equal the
    direct single-phase aggregate computed by Spark itself (the oracle
    proves it against DuckDB; this pins it engine-internally too)."""
    from scylladb_redpanda_cdc_spark.plans.batch_queries import (
        b77_two_phase_skew_agg,
    )
    from scylladb_redpanda_cdc_spark.sources.tables import load_table

    got = b77_two_phase_skew_agg(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    direct = li.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("total_cents"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )
    assert got.exceptAll(direct).count() == 0
    assert direct.exceptAll(got).count() == 0


def test_o15_histogram_conserves_rows(spark, sf_dir):
    """Probe conservation: partition counts sum to the table's row count,
    partitions never exceed the declared width, and a hot flag implies
    load_x1000 > 2000."""
    from scylladb_redpanda_cdc_spark.plans.storage_queries import (
        O15_PARTS,
        o15_shuffle_skew_probe,
    )
    from scylladb_redpanda_cdc_spark.sources.tables import load_table

    out = o15_shuffle_skew_probe(spark, sf_dir).cache()
    try:
        assert out.count() <= O15_PARTS
        total = out.agg(F.sum("n_rows")).first()[0]
        assert total == load_table(spark, sf_dir, "lineitem").count()
        # is_hot derives from the EXACT ratio (n_rows*width > 2*total)
        # while load_x1000 is floored — a ratio in (2.000, 2.001) is hot
        # with load_x1000 == 2000 exactly, so the floored metric's
        # granularity allows equality (round-8 advice).
        bad = out.filter(
            F.col("is_hot") & (F.col("load_x1000") < 2000)
        ).count()
        assert bad == 0
    finally:
        out.unpersist()


def test_x122_reclaim_accounting_is_conserved(spark, sf_dir):
    """Dedup accounting: uniques never exceed blobs, per-mime blob counts
    sum to the corpus, and reclaimed bytes are strictly the non-first
    copies' bytes (reclaimed < total whenever any blob is unique)."""
    from scylladb_redpanda_cdc_spark.plans.llm_queries import x122_media_dedup
    from scylladb_redpanda_cdc_spark.sources.tables import load_table

    out = x122_media_dedup(spark, sf_dir).cache()
    try:
        assert out.filter(F.col("n_unique") > F.col("n_blobs")).count() == 0
        assert out.filter(
            F.col("bytes_reclaimed") >= F.col("bytes_total")
        ).count() == 0
        n_docs = load_table(spark, sf_dir, "documents").count()
        assert out.agg(F.sum("n_blobs")).first()[0] == n_docs
    finally:
        out.unpersist()
