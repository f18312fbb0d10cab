"""Golden CDC replay — the reference's own test, automated (SURVEY.md §5.2.1).

Asserts the semantic contract of reference rpk_topic_consume.json: 7 events
decode, ops are 6 inserts + 1 update, and the materialized state is 6 keys
with (1,6) = 'spaghetti' (the update at offset 6 supersedes the insert at
offset 5 — offset authority, SURVEY.md §4.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.operators import cdc
from scylladb_redpanda_cdc_spark.sources.cdc_fixture import TOPIC, golden_stream_df


def _decoded(spark, extended=False):
    return cdc.decode_key(cdc.decode_envelope(golden_stream_df(spark, extended)))


def test_seven_events_decode(spark):
    df = _decoded(spark)
    rows = df.select("offset", "envelope.op", "topic").orderBy("offset").collect()
    assert len(rows) == 7
    assert [r["op"] for r in rows] == ["c"] * 6 + ["u"]
    assert all(r["topic"] == TOPIC for r in rows)
    assert [r["offset"] for r in rows] == list(range(7))


def test_materialized_state_matches_reference(spark):
    df = _decoded(spark)
    events = df.select(
        F.col("pk.customer_id").alias("customer_id"),
        F.col("pk.order_id").alias("order_id"),
        F.col("envelope.after.product.value").alias("product"),
        F.col("envelope.op").alias("op"),
        "offset",
    )
    state = cdc.materialize_latest(events, ["customer_id", "order_id"])
    rows = {(r.customer_id, r.order_id): r.product for r in state.collect()}
    assert rows == {
        (1, 1): "pizza",
        (1, 2): "cookies",
        (1, 3): "tea",
        (1, 4): "chips",
        (1, 5): "lollies",
        (1, 6): "spaghetti",  # update wins over insert by offset, not op
    }


def test_delete_tombstone_drops_key(spark):
    df = _decoded(spark, extended=True)
    events = df.select(
        F.col("pk.customer_id").alias("customer_id"),
        F.col("pk.order_id").alias("order_id"),
        F.col("envelope.after.product.value").alias("product"),
        F.col("envelope.op").alias("op"),
        "offset",
    )
    state = cdc.materialize_latest(events, ["customer_id", "order_id"])
    keys = {(r.customer_id, r.order_id) for r in state.collect()}
    assert (1, 2) not in keys
    assert len(keys) == 5


def test_cell_three_state_nulls(spark):
    df = _decoded(spark, extended=True)
    # op 'c': before image absent entirely -> before.product untouched
    ins = df.filter(F.col("envelope.op") == "c").select(
        cdc.cell_touched(F.col("envelope.before"), "product").alias("t")
    )
    assert all(not r.t for r in ins.collect())
    # op 'u': both images present and touched
    upd = df.filter(F.col("envelope.op") == "u").select(
        cdc.cell_touched(F.col("envelope.before"), "product").alias("bt"),
        cdc.cell_touched(F.col("envelope.after"), "product").alias("at"),
        cdc.cell_value(F.col("envelope.before"), "product").alias("bv"),
        cdc.cell_value(F.col("envelope.after"), "product").alias("av"),
    )
    r = upd.collect()[0]
    assert (r.bt, r.at, r.bv, r.av) == (True, True, "pasta", "spaghetti")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    n = df.count()
    assert n > 0
    assert set(df.columns) == {"customer_id", "n_orders", "total_spend"}
