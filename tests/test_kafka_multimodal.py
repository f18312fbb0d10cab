"""Kafka production-path config + multimodal plumbing units.

The Kafka connector jar is not in this container, so the source itself
cannot run; these tests pin the config surface (topic naming = the
reference's connector.properties contract) and the fail-fast behavior.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.operators.multimodal import (
    decode_media,
    frame_sample_indices,
    media_struct,
)
from scylladb_redpanda_cdc_spark.sources.kafka import (
    ConnectorConfig,
    kafka_source,
    project_kafka_frame,
)


def test_topic_name_matches_reference():
    """Default config must reproduce the tutorial's consumed topic string
    (reference connector.properties:6-7, README.md:215)."""
    cfg = ConnectorConfig()
    assert (
        cfg.topic("orders")
        == "QuickstartConnectorNamespace.quickstart_keyspace.orders"
    )
    assert cfg.topics == cfg.topic("orders")


def test_kafka_source_fails_fast_without_connector(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_source(spark, ConnectorConfig())


def test_kafka_projection_matches_record_schema(spark):
    """kafka_source's post-load projection, driven by a mock of Spark's
    native Kafka frame (key/value BINARY, timestamp TimestampType,
    timestampType int — the connector's fixed output schema), must produce
    exactly RECORD_SCHEMA and decode bytes -> JSON strings. With this, the
    only broker-dependent seam left is the socket."""
    from scylladb_redpanda_cdc_spark.schemas import RECORD_SCHEMA

    native = spark.createDataFrame(
        [
            (
                "QuickstartConnectorNamespace.quickstart_keyspace.orders",
                bytearray(b'{"payload":{"customer_id":1,"order_id":6}}'),
                bytearray(b'{"payload":{"op":"u"}}'),
                0,
                6,
                1_683_357_342_500,
                0,
            )
        ],
        "topic string, key binary, value binary, partition int, "
        "offset long, ts_ms long, timestampType int",
    ).withColumn("timestamp", F.timestamp_millis("ts_ms")).drop("ts_ms")
    out = project_kafka_frame(native)
    assert out.schema == RECORD_SCHEMA
    row = out.collect()[0]
    assert row["key"] == '{"payload":{"customer_id":1,"order_id":6}}'
    assert row["value"] == '{"payload":{"op":"u"}}'
    assert row["timestamp"] == 1_683_357_342_500


def test_decode_media_is_marked_stub(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with pytest.raises(NotImplementedError, match="codec backend"):
        decode_media(df, codec="pillow")


def test_media_struct_and_frame_indices(spark):
    df = spark.createDataFrame(
        [(1, b"abc", "image/png", 64, 32, 10), (2, b"x", "video/mp4", 8, 8, 2)],
        "doc_id int, blob binary, mime string, width int, height int, n_frames int",
    )
    carried = df.select(
        "doc_id",
        media_struct(
            F.col("blob"), F.col("mime"), F.col("width"), F.col("height")
        ).alias("media"),
        frame_sample_indices(F.col("n_frames")).alias("frames"),
    )
    rows = {r["doc_id"]: r for r in carried.collect()}
    assert rows[1]["media"]["meta"]["n_bytes"] == 3
    assert rows[1]["media"]["meta"]["mime"] == "image/png"
    # 10 frames sampled at k=4 -> evenly spaced floor(i*10/4)
    assert rows[1]["frames"] == [0, 2, 5, 7]
    # fewer frames than max -> every frame once
    assert rows[2]["frames"] == [0, 1]
