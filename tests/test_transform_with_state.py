"""Spark 4 transformWithState surface (environment-gated; see
streaming/tws.py). Skipped where google.protobuf is absent — the
state-server protocol cannot start without it. Where it runs, the
per-key running count must converge to the batch groupBy answer, and
the final per-key value must equal S11's applyInPandasWithState result
on the same input (two stateful APIs, one semantics)."""

from __future__ import annotations

import pytest

pytest.importorskip(
    "google.protobuf",
    reason="transformWithState's Python worker needs protobuf "
    "(absent in the sandbox; see streaming/tws.py)",
)

from pyspark.sql import functions as F


def test_running_count_matches_batch_groupby(spark, sf_dir):
    from scylladb_redpanda_cdc_spark.streaming.core import (
        events_stream,
        run_to_table,
    )
    from scylladb_redpanda_cdc_spark.streaming.tws import running_count_per_key

    ev = events_stream(spark, sf_dir).select("user_id")
    out = run_to_table(
        running_count_per_key(ev.groupBy("user_id")), mode="update"
    )
    # Update mode emits one row per (key, micro-batch); the last per key is
    # the running total == the batch count.
    final = out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    want = (
        events_stream(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    got = {(r["user_id"], r["n_events"]) for r in final.collect()}
    exp = {(r["user_id"], r["n_events"]) for r in run_to_table(want, "complete").collect()}
    assert got == exp
