"""Ultimate reference parity: replay the reference's OWN golden capture.

Reads /root/reference/rpk_topic_consume.json (the checked-in `rpk topic
consume` output, the reference's only test artifact — SURVEY.md §5.1)
through the engine's capture source and CDC operators, and asserts the
tutorial's documented outcomes: 7 events on partition 0 with offsets 0..6,
six inserts + one update, and a materialized state of 6 keys where (1,6)
is 'spaghetti' — the update at offset 6 superseding the insert at offset 5
(reference rpk_topic_consume.json:44,52; README.md:117).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.operators import cdc
from scylladb_redpanda_cdc_spark.sources.rpk_capture import read_rpk_capture

CAPTURE = "/root/reference/rpk_topic_consume.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CAPTURE), reason="reference capture not present"
)


@pytest.fixture(scope="module")
def decoded(spark):
    raw = read_rpk_capture(spark, CAPTURE)
    return cdc.decode_key(cdc.decode_envelope(raw)).persist()


def test_frame_shape(spark, decoded):
    rows = decoded.orderBy("offset").collect()
    assert len(rows) == 7
    assert [r["offset"] for r in rows] == list(range(7))
    assert {r["partition"] for r in rows} == {0}
    assert {r["topic"] for r in rows} == {
        "QuickstartConnectorNamespace.quickstart_keyspace.orders"
    }


def test_op_mix(decoded):
    ops = dict(
        decoded.groupBy("envelope.op").count().collect()
    )
    assert ops == {"c": 6, "u": 1}


def test_materialized_state_matches_tutorial(decoded):
    changes = decoded.select(
        F.col("pk.customer_id").alias("customer_id"),
        F.col("pk.order_id").alias("order_id"),
        F.col("envelope.after.product.value").alias("product"),
        F.col("envelope.op").alias("op"),
        "offset",
    )
    state = {
        (r["customer_id"], r["order_id"]): r["product"]
        for r in cdc.materialize_latest(
            changes, ["customer_id", "order_id"]
        ).collect()
    }
    assert len(state) == 6
    assert state[(1, 6)] == "spaghetti"  # offset-6 update wins over offset-5
    assert state[(1, 1)] == "pizza"
    assert state[(1, 5)] == "lollies"


def test_capture_wire_semantics_all_live_no_preimage(decoded):
    """The REAL capture is all-live and preimage-free: snapshot:"false" on
    every event and before:null even on the op:"u" event (Scylla CDC emits
    no preimages) — rpk_topic_consume.json:4,44. Pins the facts the
    capture-exact fixture flavor reproduces (cdc_fixture docstring)."""
    rows = decoded.select(
        F.col("envelope.source.snapshot").alias("snapshot"),
        F.col("envelope.before").alias("before"),
    ).collect()
    assert {r["snapshot"] for r in rows} == {"false"}
    assert all(r["before"] is None for r in rows)


def test_capture_exact_fixture_matches_real_capture(spark, decoded):
    """The extended=False fixture must agree with the real capture on every
    semantic column (keys, ops, images, snapshot, offsets) — only the
    synthetic timestamps may differ."""
    from scylladb_redpanda_cdc_spark.sources.cdc_fixture import golden_stream_df

    sem_cols = [
        "offset",
        F.col("pk.customer_id").alias("cust"),
        F.col("pk.order_id").alias("order"),
        F.col("envelope.op").alias("op"),
        F.col("envelope.source.snapshot").alias("snapshot"),
        F.col("envelope.before.product.value").alias("before_product"),
        F.col("envelope.after.product.value").alias("after_product"),
    ]
    fixture = cdc.decode_key(
        cdc.decode_envelope(golden_stream_df(spark, extended=False))
    )
    fx = [tuple(r) for r in fixture.select(*sem_cols).orderBy("offset").collect()]
    real = [tuple(r) for r in decoded.select(*sem_cols).orderBy("offset").collect()]
    assert fx == real
