"""Golden CDC replay, STREAMING edition (SURVEY.md §5.2.1 as a stream).

The batch golden test proves decode+compaction semantics on the reference's
7 captured events. This test proves the same contract survives streaming
incrementalization: the events are split across TWO micro-batches with the
(1,6) 'pasta' insert and its superseding 'spaghetti' update in DIFFERENT
batches (reference rpk_topic_consume.json:44,52) — the foreachBatch MERGE
must still converge to the exact batch answer, because compaction is
order-insensitive by offset authority (SURVEY.md §4.4).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.operators import cdc
from scylladb_redpanda_cdc_spark.sources.cdc_fixture import golden_stream_df
from scylladb_redpanda_cdc_spark.streaming.core import tmpdir
from scylladb_redpanda_cdc_spark.streaming.ops import foreachbatch_upsert


def _decoded_changes(spark):
    df = cdc.decode_key(cdc.decode_envelope(golden_stream_df(spark, extended=True)))
    return df.select(
        F.col("pk.customer_id").alias("customer_id"),
        F.col("pk.order_id").alias("order_id"),
        F.col("envelope.after.product.value").alias("product"),
        F.col("envelope.op").alias("op"),
        "offset",
    )


def test_streaming_replay_matches_batch_materialization(spark):
    changes = _decoded_changes(spark)

    # Stage two micro-batch files: offsets 0-5 (incl. the pasta insert),
    # then offsets >= 6 (the spaghetti update + delete tombstone). mtimes
    # force the file source to process them in this order.
    stage = tmpdir("golden_stream")
    for i, pred in enumerate((F.col("offset") <= 5, F.col("offset") > 5)):
        part_dir = os.path.join(stage, f"b{i}")
        changes.filter(pred).coalesce(1).write.parquet(part_dir)
        for f in os.listdir(part_dir):
            if f.endswith(".parquet"):
                src = os.path.join(part_dir, f)
                dst = os.path.join(stage, f"{i:02d}.parquet")
                os.rename(src, dst)
                os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(
            "customer_id int, order_id int, product string, op string, `offset` long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    state = foreachbatch_upsert(stream, ["customer_id", "order_id"])
    rows = {
        (r["customer_id"], r["order_id"]): r["product"]
        for r in state.collect()
    }

    # Batch answer: 6 keys minus the delete-tombstoned (1,2); (1,6) must be
    # the offset-6 update, never the offset-5 insert.
    expected = cdc.materialize_latest(
        _decoded_changes(spark), ["customer_id", "order_id"]
    )
    expected_rows = {
        (r["customer_id"], r["order_id"]): r["product"]
        for r in expected.collect()
    }
    assert rows == expected_rows
    assert rows[(1, 6)] == "spaghetti"
    assert (1, 2) not in rows
    assert len(rows) == 5
