"""Spark 4 transformWithState surface (streaming/tws.py).

Two tiers (round-8 verdict task 8): the processor LIFECYCLE — init →
handleInputRows per micro-batch with persistent ValueState → close — runs
sandbox-green through drive_locally's in-memory state handle (no
protobuf, no stream). The WIRE path (the worker's protobuf state-server
protocol) still needs google.protobuf and is importorskip-gated inside
the e2e test only, the same honesty contract as the Kafka broker path
(tests/test_kafka_live.py). Where it runs, the per-key running count
must converge to the batch groupBy answer."""

from __future__ import annotations

import pandas as pd
import pytest

from scylladb_redpanda_cdc_spark.streaming.tws import (
    LocalStatefulHandle,
    RunningCountProcessor,
    drive_locally,
)


def _batch(n: int) -> pd.DataFrame:
    return pd.DataFrame({"user_id": [0] * n})


def test_local_lifecycle_accumulates_across_microbatches():
    """State persists per key across micro-batches (the state-store
    contract): three batches for two interleaved keys emit strictly
    running totals, and the finals equal the per-key input row counts."""
    batches = [
        [((1,), _batch(3)), ((2,), _batch(1))],
        [((1,), _batch(2))],
        [((2,), _batch(4)), ((1,), _batch(1))],
    ]
    out = drive_locally(lambda: RunningCountProcessor("user_id"), batches)
    emitted = [(df["user_id"][0], df["n_events"][0]) for df in out]
    assert emitted == [(1, 3), (2, 1), (1, 5), (2, 5), (1, 6)]


def test_local_lifecycle_keys_are_isolated():
    """One key's state never leaks into another: a fresh key starting
    after another key accumulated still counts from zero."""
    batches = [
        [((7,), _batch(5))],
        [((8,), _batch(2)), ((7,), _batch(5))],
    ]
    out = drive_locally(lambda: RunningCountProcessor("user_id"), batches)
    emitted = [(df["user_id"][0], df["n_events"][0]) for df in out]
    assert emitted == [(7, 5), (8, 2), (7, 10)]


def test_local_handle_value_state_contract():
    """The exists/get/update/clear surface RunningCountProcessor relies
    on, pinned directly — including the implicit-key scoping: the SAME
    ValueState object reads different storage after the handle's current
    grouping key switches (the real state-client contract)."""
    h = LocalStatefulHandle()
    s = h.getValueState("n", None)
    h.set_implicit_key((1,))
    assert not s.exists() and s.get() is None
    s.update((3,))
    assert s.exists() and s.get() == (3,)
    assert h.getValueState("n", None) is s  # named slots are stable
    h.set_implicit_key((2,))
    assert not s.exists() and s.get() is None  # other key's slot is empty
    s.update((9,))
    h.set_implicit_key((1,))
    assert s.get() == (3,)  # key 1's value survived key 2's write
    s.clear()
    assert not s.exists()
    h.set_implicit_key((2,))
    assert s.get() == (9,)  # clear only touched key 1


def test_local_lifecycle_instance_model_matches_the_real_engine():
    """The round-11 harness re-instantiates the processor per
    micro-batch (the real transformWithState task model) while sharing
    ONE state handle across batches. So a processor caching data on
    ``self`` (a) still bleeds across keys WITHIN a batch — one instance
    per partition-task — but (b) LOSES its self-cached data at every
    batch boundary, exactly as on the real engine (the round-10 harness
    let self persist across batches, a false green for batch-spanning
    self-caches)."""
    init_counts: list[int] = []

    class SelfCachingProcessor(RunningCountProcessor):
        def init(self, handle):
            init_counts.append(1)
            self._prev = 0  # WRONG: batch-spanning data on self
            super().init(handle)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            total = sum(len(pdf) for pdf in rows)
            self._prev += total
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [self._prev]}
            )

    batches = [
        [((1,), _batch(3)), ((2,), _batch(1))],
        [((1,), _batch(2))],
    ]
    out = drive_locally(lambda: SelfCachingProcessor("user_id"), batches)
    emitted = [(df["user_id"][0], df["n_events"][0]) for df in out]
    # within batch 1 the buggy processor bleeds key 1's total into key 2;
    # at the batch boundary the self-cache RESETS (fresh instance), so
    # batch 2 counts from zero — not the (1, 6) a batch-spanning self
    # would produce.
    assert emitted == [(1, 3), (2, 4), (1, 2)]
    assert len(init_counts) == len(batches)  # init once per micro-batch
    # whereas the ValueState-correct processor accumulates across batches
    # AND stays key-isolated on the identical input
    out_ok = drive_locally(lambda: RunningCountProcessor("user_id"), batches)
    ok = [(df["user_id"][0], df["n_events"][0]) for df in out_ok]
    assert ok == [(1, 3), (2, 1), (1, 5)]


def test_running_count_matches_batch_groupby(spark, sf_dir):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's Python worker needs protobuf "
        "(absent in the sandbox; see streaming/tws.py)",
    )
    from pyspark.sql import functions as F

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
