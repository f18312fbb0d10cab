"""SparkSession factory.

Single place where execution knobs live so every entry point (driver
contract, tests, bench) runs the same configuration. Defaults are sized for
``local[32]`` / small-SF parquet but are chosen to scale: AQE handles
runtime coalescing + skew-join splitting, so a 1000-executor cluster only
needs ``spark.sql.shuffle.partitions`` raised (or left to AQE's initial
partition heuristics) — no code change.

Reference parity: the reference's only runtime knobs are worker cadence and
core counts (connect-standalone.properties:5, README.md:33); everything else
is Catalyst's job (SURVEY.md §4.1-4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_session(app_name: str = "scylladb-redpanda-cdc-spark") -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    - AQE on: runtime partition coalescing + skew-join handling, the 100 TB
      safety net for every shuffle declared in plans/.
    - UTC session timezone: deterministic timestamp semantics that match the
      DuckDB oracle.
    - Arrow on: vectorized pandas UDF / toPandas paths (U2-U4, X ops).
    - Broadcast threshold left at default (10 MB): dimension tables (region,
      nation, customer, supplier, part at bench SF) broadcast automatically;
      plans that *require* a broadcast also declare it with an explicit hint.
    """
    master = os.environ.get("SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
        # rejects; read as long nanos, converted in sources.tables.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Streaming tests replay file streams; keep state-store defaults but
        # make micro-batch planning deterministic.
        .config("spark.sql.streaming.schemaInference", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        # Reliable-checkpoint hygiene (operators/checkpoint.py): when a
        # deployment sets spark.sg.checkpointDir, the ContextCleaner
        # deletes a frame's checkpoint files once the frame is GC'd —
        # without this (default false) every staged frame's files live
        # until the application dies. Static conf: must be set here, at
        # context creation. No effect on the localCheckpoint default.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    return builder.getOrCreate()
