"""Exact distributed rank without a single-task sort (SURVEY.md §2
X34/X35/X78/X121/B40 — the two-phase rank keystone, round 11).

``ranged_rank`` computes ``row_number()`` over an arbitrary total order
(and optionally the running sum of a mass column in that order, and the
per-group row total) with NO task ever sorting more than ~1/P of the
input:

1. ``repartitionByRange(P, group asc..., order...)`` — Spark samples the
   sort key and draws P range boundaries, so partitions are balanced by
   ROW COUNT regardless of the value distribution. This is what the
   round-10 binary-magnitude cells could not guarantee: a zipf
   vocabulary puts ~half of all distinct tokens in the hapax (n=1)
   cell, and an equal-width score grid collapses onto one cell when the
   score degenerates — value-derived cells bound the number of cells,
   not the size of the fattest one. Range boundaries are drawn from the
   data, so the fattest range is ~rows/P by construction.
2. A window partitioned by (group..., range id) ranks within each range
   — the range id is captured with ``spark_partition_id()`` ON TOP of
   the range exchange, and within a group the ranges are monotone in
   the sort order (the range sort leads with the group columns), so
   within-range row_number + the count of rows in earlier ranges IS the
   exact global rank.
3. The per-(group, range) histogram (≤P rows per group — bounded by
   cluster parallelism, not data) carries its own cumulative offsets
   (a window over the histogram itself) and is broadcast-joined back
   on (group, range id): every data row reads its offset in O(1)
   (the x121/x75 broadcast-offset law) — never a corpus-sized window,
   and never a per-row fold over a parallelism-sized map.

Determinism: the output rank/cum values do not depend on WHERE the
sampled boundaries fall — any boundary placement yields the same global
rank, so driver re-runs hash-match even though the sampling job is
internal to Spark. Callers must pass a TOTAL order (tiebreak to a
unique key) or within-tie rank assignment is partition-dependent.

Reference parity: the reference (a CDC tutorial, no code) has no
counterpart; this kernel serves the tokenizer/curation family the
driver's LLM-pipeline mandate adds (BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.operators.checkpoint import stage_checkpoint

__all__ = ["ranged_rank"]


def ranged_rank(
    df: DataFrame,
    order_cols: list[Column],
    group_cols: tuple[str, ...] = (),
    mass_col: str | None = None,
    rank_col: str = "rank",
    cum_col: str = "cum",
    total_col: str | None = None,
    npart: int | None = None,
) -> DataFrame:
    """All columns of ``df`` plus ``rank_col`` = exact row_number over
    ``order_cols`` within each ``group_cols`` group; optionally
    ``cum_col`` = running sum of ``mass_col`` in that order and
    ``total_col`` = the group's total row count (for NTILE arithmetic).

    ``group_cols`` must be non-null (the offset join is on them).
    ``order_cols`` must be a total order within each group.
    """
    spark = df.sparkSession
    n = npart or spark.sparkContext.defaultParallelism
    gcols = list(group_cols)
    # The ranged+pid frame MUST be materialized exactly once: the range
    # exchange's boundary sampler seeds from the physical RDD id, so two
    # separate evaluations (the histogram branch and the window branch)
    # can draw DIFFERENT boundaries once the input outgrows the sample
    # (observed at sf0.1: x78 ranks went stale against their offsets and
    # NTILE emitted a phantom 4th tercile). stage_checkpoint (eager)
    # pins one boundary draw and one pid assignment for every consumer —
    # and the sampling pass plus both branches then read this narrow
    # materialized frame instead of recomputing the input. (Cluster
    # deployment: set spark.sg.checkpointDir and the helper swaps in
    # reliable checkpoint() — same single-draw guarantee, survives
    # executor loss; localCheckpoint blocks die with their executor.)
    p = (
        df.repartitionByRange(
            n, *([F.col(g).asc() for g in gcols] + list(order_cols))
        )
        .withColumn("_rr_pid", F.spark_partition_id().cast("long"))
        .transform(stage_checkpoint)
    )

    # Per-(group, range) histogram → PRECOMPUTED offsets. The per-group
    # count/mass maps (≤P entries, the allowlisted tiny-aggregate
    # broadcast) are folded into cumulative offsets ON THE HISTOGRAM
    # ROWS, then broadcast-joined back on (group, pid) so every data
    # row reads its offset in O(1). The earlier form shipped the whole
    # per-group map to every DATA row and folded it per row — an O(P)
    # interpreted higher-order fold per row, which at P = 32k cluster
    # cores multiplies the corpus scan by the cluster width.
    aggs = [F.count("*").alias("_rr_cnt")]
    if mass_col is not None:
        aggs.append(F.sum(mass_col).alias("_rr_mass"))
    hist = p.groupBy(*(gcols + ["_rr_pid"])).agg(*aggs)
    map_aggs = [
        F.map_from_arrays(
            F.collect_list("_rr_pid"), F.collect_list("_rr_cnt")
        ).alias("_rr_cmap")
    ]
    if mass_col is not None:
        map_aggs.append(
            F.map_from_arrays(
                F.collect_list("_rr_pid"), F.collect_list("_rr_mass")
            ).alias("_rr_mmap")
        )
    if gcols:
        maps = hist.groupBy(*gcols).agg(*map_aggs)
        offs = hist.join(F.broadcast(maps), gcols)
    else:
        maps = hist.agg(*map_aggs)
        offs = hist.crossJoin(F.broadcast(maps))
    # The O(P) fold runs once per HISTOGRAM row (O(P²) total — trivial
    # at any cluster width), never per data row.
    offs = offs.withColumn(
        "_rr_coff",
        F.expr(
            "aggregate(map_keys(_rr_cmap), 0L,"
            " (a, k) -> a + IF(k < _rr_pid, _rr_cmap[k], 0L))"
        ),
    )
    if mass_col is not None:
        offs = offs.withColumn(
            "_rr_moff",
            F.expr(
                "aggregate(map_keys(_rr_mmap), 0L,"
                " (a, k) -> a + IF(k < _rr_pid, _rr_mmap[k], 0L))"
            ),
        )
    if total_col is not None:
        offs = offs.withColumn(
            "_rr_tot",
            F.expr("aggregate(map_values(_rr_cmap), 0L, (a, v) -> a + v)"),
        )
    offs = offs.drop("_rr_cmap", "_rr_mmap")
    j = p.join(F.broadcast(offs), gcols + ["_rr_pid"])

    w_in = Window.partitionBy(*(gcols + ["_rr_pid"])).orderBy(*order_cols)
    out = j.withColumn(
        rank_col,
        (F.col("_rr_coff") + F.row_number().over(w_in)).cast("long"),
    )
    if mass_col is not None:
        out = out.withColumn(
            cum_col,
            (
                F.col("_rr_moff")
                + F.sum(mass_col).over(
                    w_in.rowsBetween(Window.unboundedPreceding, 0)
                )
            ).cast("long"),
        )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_rr_tot").cast("long"))
    drop = ["_rr_pid", "_rr_cnt", "_rr_coff"]
    if mass_col is not None:
        drop += ["_rr_mass", "_rr_moff"]
    if total_col is not None:
        drop.append("_rr_tot")
    return out.drop(*drop)
