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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, e.g. ``load_table(spark, sf_dir, "lineitem")``."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the file, which Spark 4's parquet reader
        # rejects unless spark.sql.legacy.parquet.nanosAsLong is on. Set it
        # here (runtime-settable) so the loader works under ANY caller's
        # session, including the driver's vanilla one — then truncate to
        # micros (identically to DuckDB's epoch_us) and restore a real
        # timestamp column for window/watermark semantics.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (for ``spark.sql`` plans)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
