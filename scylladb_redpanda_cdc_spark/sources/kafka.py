"""Kafka/Redpanda source & sink — the production transport (SURVEY.md S1,
§3.2; BASELINE.json "Structured Streaming with Kafka/Redpanda source").

Mirrors the reference deployment config surface:

- broker bootstrap  <- ``bootstrap.servers=localhost:19092``
  (reference connect-standalone.properties:1)
- topic naming      <- ``{scylla.name}.{keyspace}.{table}``
  (reference connector.properties:6-7; consumed at README.md:215)
- table list        <- ``scylla.table.names`` (connector.properties:7)
- wire form         <- JsonConverter with schemas.enable=true
  (connect-standalone.properties:2-3) — encode/decode via operators.cdc.

The Kafka connector jar (``spark-sql-kafka-0-10``) is not bundled with a
plain PySpark install; :func:`require_kafka` turns the opaque JVM
class-lookup failure into an actionable error. Everything downstream of the
source is the SAME DAG the file-stream tests exercise (streaming/core.py),
so semantics are verified even where no broker exists — the reference's own
test strategy (golden capture, not broker integration, SURVEY.md §5.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.operators.cdc import (
    decode_envelope,
    decode_key,
    encode_envelope,
)


@dataclass(frozen=True)
class ConnectorConfig:
    """The reference's connector.properties, as code.

    Defaults are the tutorial's literal values so a config-less instantiation
    reproduces the reference pipeline shape exactly.
    """

    bootstrap_servers: str = "localhost:19092"  # connect-standalone.properties:1
    namespace: str = "QuickstartConnectorNamespace"  # connector.properties:6
    keyspace: str = "quickstart_keyspace"  # connector.properties:7
    table_names: tuple[str, ...] = ("orders",)  # connector.properties:7
    #: offset.flush.interval.ms=10000 (connect-standalone.properties:5)
    trigger_interval: str = "10 seconds"
    checkpoint_location: str = "/tmp/connect.offsets.d"  # :4, dir-ified
    starting_offsets: str = "earliest"
    extra_options: dict[str, str] = field(default_factory=dict)

    def topic(self, table: str) -> str:
        """A12 ``topic_name_derive``: ``{namespace}.{keyspace}.{table}``."""
        return f"{self.namespace}.{self.keyspace}.{table}"

    @property
    def topics(self) -> str:
        return ",".join(self.topic(t) for t in self.table_names)


def require_kafka(spark: SparkSession) -> None:
    """Fail fast, with instructions, when the Kafka connector jar is absent
    (it is not part of a plain PySpark install)."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception as exc:  # pragma: no cover - depends on deployment
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka-0-10 connector on the "
            "classpath; launch with --packages org.apache.spark:"
            "spark-sql-kafka-0-10_2.13:<spark-version>. File-stream tests "
            "(streaming/core.py) cover the identical downstream DAG."
        ) from exc


def project_kafka_frame(raw: DataFrame) -> DataFrame:
    """Spark's native Kafka source frame (key/value binary, timestamp
    TimestampType) -> the engine's six-field RECORD_SCHEMA frame
    (rpk_topic_consume.json:2-7): key/value as JSON strings (JsonConverter,
    connector.properties:3-4), timestamp as epoch millis.

    Split out from :func:`kafka_source` so the projection is unit-testable
    without a broker (tests/test_kafka_multimodal.py builds the mock native
    frame and asserts schema equality with RECORD_SCHEMA) — the untested
    seam shrinks to the socket itself.
    """
    return raw.select(
        "topic",
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.unix_millis("timestamp").alias("timestamp"),
        "partition",
        "offset",
    )


def kafka_source(spark: SparkSession, cfg: ConnectorConfig) -> DataFrame:
    """S1 production source: subscribe to the CDC topics; surface the
    reference consumer's exact six-field frame (rpk_topic_consume.json:2-7)
    with key/value decoded from bytes to JSON strings."""
    require_kafka(spark)
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.bootstrap_servers)
        .option("subscribe", cfg.topics)
        .option("startingOffsets", cfg.starting_offsets)
        # At-least-once, like Kafka Connect; dedup/compaction downstream is
        # idempotent by offset authority so replays are harmless.
        .option("failOnDataLoss", "false")
    )
    for k, v in cfg.extra_options.items():
        reader = reader.option(k, v)
    return project_kafka_frame(reader.load())


def decoded_cdc_stream(spark: SparkSession, cfg: ConnectorConfig) -> DataFrame:
    """Source -> typed change events: the A2/A3 decode applied to the live
    stream. Downstream consumers compose exactly like the batch plans
    (op_classify, materialize_latest via foreachBatch — streaming/ops.py)."""
    return decode_key(decode_envelope(kafka_source(spark, cfg)))


def kafka_sink(
    state_changes: DataFrame,
    cfg: ConnectorConfig,
    key_cols: list[str],
    table: str,
):
    """A14 production sink: envelope-encode rows and produce them to the
    derived topic with the reference worker's flush cadence as the trigger.
    Returns the started StreamingQuery."""
    require_kafka(state_changes.sparkSession)
    encoded = encode_envelope(state_changes, key_cols, cfg.topic(table))
    return (
        encoded.select("key", "value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.bootstrap_servers)
        .option("topic", cfg.topic(table))
        .option("checkpointLocation", cfg.checkpoint_location)
        .trigger(processingTime=cfg.trigger_interval)
        .start()
    )
