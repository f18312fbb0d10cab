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
from scylladb_redpanda_cdc_spark.sources.kafka import ConnectorConfig, kafka_source


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
