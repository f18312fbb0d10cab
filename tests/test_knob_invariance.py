"""The SG_* scale knobs must never change results — only physical shape.

SURVEY §2 claims each knob (packing fan-out, CC loop shuffle width,
stream-sink shuffle width, broadcast-vs-shuffle key cap) is a pure
parallelism/strategy dial: cluster deployments size them, answers never
move. This file proves that claim per knob by running the affected query
under 2-3 settings and asserting identical results.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pandas as pd
import pytest

from scylladb_redpanda_cdc_spark.plans import registry


@pytest.fixture(scope="module")
def specs():
    return registry()


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    return sorted(map(tuple, pdf[cols].astype(str).values.tolist()))


def test_cc_loop_shuffle_width_is_result_invariant(
    spark, sf_dir, specs, monkeypatch
):
    """x21's min-label loop scopes shuffle width to SG_CC_LOOP_SHUFFLE
    (read per call): cluster labels are partitioning-invariant."""
    outs = []
    for width in ("2", "16"):
        monkeypatch.setenv("SG_CC_LOOP_SHUFFLE", width)
        outs.append(
            _canon(specs["x21_dedup_cluster_cc"].build(spark, sf_dir).toPandas())
        )
    assert outs[0] == outs[1]
    assert outs[0]  # non-vacuous: the fixture has near-dup clusters


def test_stream_sink_shuffle_width_is_result_invariant(
    spark, sf_dir, specs, monkeypatch
):
    """scoped_shuffle defaults to STREAM_SINK_SHUFFLE_PARTITIONS (read per
    call from streaming.core): stateful-stream results are
    partitioning-invariant — the knob trades state-store count for
    per-store overhead, nothing else."""
    from scylladb_redpanda_cdc_spark.streaming import core

    outs = []
    for width in (1, 4):
        monkeypatch.setattr(core, "STREAM_SINK_SHUFFLE_PARTITIONS", width)
        outs.append(
            _canon(specs["s3_stream_tumbling_agg"].build(spark, sf_dir).toPandas())
        )
    assert outs[0] == outs[1]
    assert outs[0]


def test_broadcast_key_cap_strategy_flip_is_result_invariant(
    spark, sf_dir, specs, monkeypatch
):
    """The incremental-merge paths (s10 upsert, x36/s14 standing-index
    dedup) broadcast the batch key set only below BROADCAST_KEY_CAP; cap=0
    forces every batch onto the shuffled-join fallback. Both strategies
    must produce identical merges."""
    from scylladb_redpanda_cdc_spark.streaming import ops

    for qid in ("s10_foreachbatch_upsert", "x36_incremental_dedup"):
        outs = []
        for cap in (0, 2_000_000):
            monkeypatch.setattr(ops, "BROADCAST_KEY_CAP", cap)
            outs.append(_canon(specs[qid].build(spark, sf_dir).toPandas()))
        assert outs[0] == outs[1], qid
        assert outs[0], qid


@pytest.mark.slow
def test_pack_shards_setting_keeps_builder_oracle_agreement():
    """SG_PACK_SHARDS is read once at import by BOTH x24's builder and its
    DuckDB twin, so in-process monkeypatching cannot exercise it; a fresh
    subprocess with a non-default setting proves the pair still agrees
    (and that shard/seq addresses really are derived from the knob)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = """
import duckdb
from pyspark.sql import SparkSession
from scylladb_redpanda_cdc_spark.plans import llm_queries
from scylladb_redpanda_cdc_spark.plans import registry

assert llm_queries.PACK_SHARDS == 7
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.001"
spec = registry()["x24_seq_packing"]
pdf = spec.build(spark, sf).toPandas()
assert int(pdf["shard"].max()) == 6  # the knob reached the plan
con = duckdb.connect()
con.execute("CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
odf = con.sql(spec.oracle).df()
cols = sorted(pdf.columns)
assert sorted(map(tuple, pdf[cols].astype(str).values.tolist())) == \\
       sorted(map(tuple, odf[cols].astype(str).values.tolist()))
print("PACK_SHARDS=7 parity OK")
"""
    env = dict(os.environ, SG_PACK_SHARDS="7")
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "PACK_SHARDS=7 parity OK" in proc.stdout


@pytest.mark.slow
def test_o2_compaction_file_count_survives_small_core_executor():
    """The round-5 ADVICE failure scenario, run for real: on a 2-core
    session with default split confs, 64 tiny files would pack into ~2
    scan partitions and coalesce(4) would emit 2 files, breaking the
    oracle's files_after=4. o2 pins openCost==maxPartitionBytes around
    the compaction read, so the pair must hold even on local[2]."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = """
import duckdb
from pyspark.sql import SparkSession
from scylladb_redpanda_cdc_spark.plans import registry

spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.001"
spec = registry()["o2_compact_small_files"]
pdf = spec.build(spark, sf).toPandas()
assert int(pdf["files_before"].iloc[0]) == 64, pdf
assert int(pdf["files_after"].iloc[0]) == 4, pdf
con = duckdb.connect()
con.execute("CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
odf = con.sql(spec.oracle).df()
cols = sorted(pdf.columns)
assert sorted(map(tuple, pdf[cols].astype(str).values.tolist())) == \\
       sorted(map(tuple, odf[cols].astype(str).values.tolist()))
print("o2 local[2] parity OK")
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "o2 local[2] parity OK" in proc.stdout


def test_shuffle_partition_width_is_result_invariant():
    """An ODD, non-default shuffle width (7, vs the suite's 32 and the
    bench's 64) must not change any value: partitioning is an execution
    concern, never a semantic one. Exercised on the queries whose shapes
    would expose a partition-count dependence if one existed — the
    flagship's offset-authority compaction, x2's banded candidate join,
    w6's two-stacked-window sessionization, b24's per-group top-k, x25's
    salted two-phase stratified sample, and the round-8 shapes (a32's
    broadcast as-of read, x118's first-occurrence window, x121's global
    curriculum sort, b77's salted merge) — each compared against its
    DuckDB oracle in a fresh subprocess (parity at the odd width IS the
    invariance claim)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = """
import duckdb
from pyspark.sql import SparkSession
from scylladb_redpanda_cdc_spark.plans import registry

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "7")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events"
          " documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{sf}/{t}.parquet')")
specs = registry()
for qid in ("flagship_cdc_materialize", "x2_dedup_fuzzy_minhash",
            "w6_win_sessionize", "b24_topk_per_group",
            "x25_stratified_sample",
            # round-8 shapes with partition-sensitive surfaces if any
            # existed: a32's 1-row as-of broadcast over a windowed
            # history, x118's first-occurrence window + rollup, x121's
            # global ntile/rank sort, b77's salted two-phase merge.
            "a32_asof_point_in_time", "x118_paragraph_dedup",
            "x121_curriculum_order", "b77_two_phase_skew_agg",
            # round-9 two-phase rank rewrites: cell histograms +
            # broadcast offsets must be width-invariant too.
            "x75_quantile_normalize", "x78_ccnet_buckets",
            "x81_epoch_shuffle", "x99_class_outliers",
            "b40_rfm_segmentation"):
    spec = specs[qid]
    pdf = spec.build(spark, sf).toPandas()
    odf = con.sql(spec.oracle).df()
    cols = sorted(pdf.columns)
    assert sorted(map(tuple, pdf[cols].astype(str).values.tolist())) == \\
           sorted(map(tuple, odf[cols].astype(str).values.tolist())), qid
    print(qid, "OK at width 7")
"""
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
