"""Parquet loaders for the driver-generated tables (TESTDATA.md).

Plain ``spark.read.parquet`` — no schema inference beyond the parquet footer
(parquet is self-describing; this is the batch analog of the reference's
schema-embedding discipline, connect-standalone.properties:2-3). Filters and
projections applied by callers reach the scan via Catalyst pushdown; loaders
deliberately do NOT cache or materialize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from scylladb_redpanda_cdc_spark.schemas import TABLE_NAMES


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to session-tz TimestampType at microsecond
    precision, whatever the fixture's physical layout. The driver has
    shipped ``events.parquet`` with ts as TIMESTAMP(NANOS) (which Spark 4
    reads as long nanos under ``spark.sql.legacy.parquet.nanosAsLong``) and
    as plain TIMESTAMP(MICROS) without a UTC annotation (which Spark reads
    as TIMESTAMP_NTZ). Under the engine's UTC session timezone all variants
    land on identical epoch micros — the same value DuckDB's ``epoch_us(ts)``
    sees — so plans and oracles agree regardless of the fixture vintage."""
    from pyspark.sql import functions as F

    kind = dict(df.dtypes).get("ts")
    if kind == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if kind == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, e.g. ``load_table(spark, sf_dir, "lineitem")``.

    Pins the session timezone to UTC on EVERY load: the fixtures store
    naive timestamps (TIMESTAMP_NTZ dates in orders/lineitem, the ntz
    events vintage), and any ntz->instant cast or string-literal
    comparison downstream reads the session timezone — under a non-UTC
    caller session every ts-dependent oracle would silently shift
    relative to DuckDB's naive semantics. The loader is the one choke
    point every query passes through, so the pin here makes the whole
    registry timezone-independent (regression-tested under a hostile
    session tz in tests/test_entry_contract.py)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # The legacy conf is runtime-settable and harmless when ts is not
        # nanos, so set it unconditionally: the loader must work under ANY
        # caller's session, including the driver's vanilla one.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        return normalize_event_ts(df)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (for ``spark.sql`` plans)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
