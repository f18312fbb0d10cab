"""Deterministic CDC change-log synthesis from the ``orders`` star table.

The golden fixture (cdc_fixture.py) is 7 rows — enough to pin the semantics,
useless for scale. This module replays the same contract over the driver's
``orders`` table at any SF: every order yields an INSERT event; a
deterministic subset yields a later UPDATE (totalprice bump, the analog of
pasta->spaghetti at reference rpk_topic_consume.json:44,52); another subset a
DELETE (the README.md:166 contract). Offsets are derived from the key so the
log is reproducible and totally ordered per key without any driver-side state.

Everything is expressible in ANSI SQL, so the DuckDB oracle can build the
identical log — this powers the flagship ``entry()`` query's strong oracle.

Scale note (100 TB): the synthesis is three narrow projections + UNION ALL —
no shuffle at all. Downstream compaction (operators.cdc.materialize_latest)
is the only shuffle, on the event key, which is exactly the partitioning a
real Kafka CDC topic would already have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.sources.tables import load_table

#: Selectors for which orders get post-insert activity. Chosen so that at any
#: SF roughly 10% of keys see an update and 1% a delete (non-overlapping
#: concerns are fine; a key may get both, delete wins by offset order).
UPDATE_MOD = 10  # o_orderkey % 10 == 0 -> update event
DELETE_MOD = 100  # o_orderkey % 100 == 7 -> delete event
#: Exact in binary floating point (×2), so the update needs no intermediate
#: rounding — Spark's BigDecimal-based round() and DuckDB's scaled-double
#: ROUND() disagree on half-up knife edges like x*1.1 (observed at sf0.01).
PRICE_BUMP = 2.0


def synth_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change log with columns:
    ``(customer_id, order_id, op, totalprice, orderstatus, ts_ms, offset)``.

    ``offset = o_orderkey*3 + {0 insert, 1 update, 2 delete}`` gives a total
    per-key order with inserts < updates < deletes, mirroring the reference's
    per-partition offset authority (rpk_topic_consume.json:7..55; SURVEY.md A11).
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        o.o_custkey.cast("long").alias("customer_id"),
        o.o_orderkey.cast("long").alias("order_id"),
        o.o_orderstatus.alias("orderstatus"),
        o.o_totalprice.alias("totalprice"),
        # parquet ms-timestamps surface as TIMESTAMP_NTZ; session tz is UTC so
        # the cast is exact and matches DuckDB's epoch_ms over the same file.
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("ts_ms"),
    )

    # ONE scan, not three: each order row emits its insert event plus the
    # conditional update/delete as an exploded per-row array (a UNION ALL of
    # three scans reads the source thrice — at 100 TB that is 3x the I/O for
    # identical rows). ``when`` arms are null when the condition misses;
    # the null filter drops them after the explode.
    def ev(op, totalprice, orderstatus, ts_ms, off):
        return F.struct(
            F.lit(op).alias("op"),
            totalprice.alias("totalprice"),
            orderstatus.alias("orderstatus"),
            ts_ms.alias("ts_ms"),
            off.alias("offset"),
        )

    insert_ev = ev(
        "c",
        F.col("totalprice"),
        F.col("orderstatus"),
        F.col("ts_ms"),
        F.col("order_id") * 3,
    )
    update_ev = F.when(
        F.col("order_id") % UPDATE_MOD == 0,
        ev(
            "u",
            F.col("totalprice") * PRICE_BUMP,
            F.col("orderstatus"),
            F.col("ts_ms") + 60_000,
            F.col("order_id") * 3 + 1,
        ),
    )
    delete_ev = F.when(
        F.col("order_id") % DELETE_MOD == 7,
        ev(
            "d",
            F.lit(None).cast("double"),
            F.lit(None).cast("string"),
            F.col("ts_ms") + 120_000,
            F.col("order_id") * 3 + 2,
        ),
    )
    exploded = base.select(
        "customer_id",
        "order_id",
        F.explode(F.array(insert_ev, update_ev, delete_ev)).alias("e"),
    ).filter(F.col("e").isNotNull())
    return exploded.select(
        "customer_id",
        "order_id",
        "e.op",
        "e.totalprice",
        "e.orderstatus",
        "e.ts_ms",
        "e.offset",
    )


#: The same change log as a DuckDB CTE (oracle side). Kept textually simple
#: and in lockstep with synth_changelog above — change both together.
CHANGELOG_SQL_CTE = f"""
changelog AS (
  SELECT o_custkey AS customer_id, o_orderkey AS order_id, 'c' AS op,
         o_totalprice AS totalprice, o_orderstatus AS orderstatus,
         epoch_ms(o_orderdate) AS ts_ms,
         o_orderkey * 3 AS "offset"
  FROM orders
  UNION ALL
  SELECT o_custkey, o_orderkey, 'u',
         o_totalprice * {PRICE_BUMP}, o_orderstatus,
         epoch_ms(o_orderdate) + 60000,
         o_orderkey * 3 + 1
  FROM orders WHERE o_orderkey % {UPDATE_MOD} = 0
  UNION ALL
  SELECT o_custkey, o_orderkey, 'd',
         NULL, NULL,
         epoch_ms(o_orderdate) + 120000,
         o_orderkey * 3 + 2
  FROM orders WHERE o_orderkey % {DELETE_MOD} = 7
)"""
