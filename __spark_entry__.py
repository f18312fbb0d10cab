"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All three functions are derived from the single declarative registry in
``scylladb_redpanda_cdc_spark.plans`` — one QuerySpec per SURVEY.md §2 ID.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from scylladb_redpanda_cdc_spark.plans import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Synthesized CDC change log from ``orders`` -> latest-state
    materialization (offset-authoritative, tombstones dropped) ->
    per-customer aggregate. See SURVEY.md §3.3 / §7 stage 0.
    """
    specs = registry()
    return specs["flagship_cdc_materialize"].build(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {qid: spec.build for qid, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return {
        qid: spec.oracle for qid, spec in registry().items() if spec.oracle is not None
    }
