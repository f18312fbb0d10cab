"""Ad-hoc round-11 probe (not a pytest module): sf0.01 -> sf0.1 scaling
(10x docs / 4x vectors) for the heaviest NEWLY-FLOORED queries — the
200 first-floor entries had no recorded probe shape before round 11 —
plus the rewritten x10. Warm best-of-3 per SF in one session.

Usage: python tests/_probe_r11b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from scylladb_redpanda_cdc_spark.plans import registry

QIDS = (
    "x10_dedup_simhash",
    "x33_span_dedup",
    "b21_agg_percentile",
    "x69_collocation_lift",
    "x43_bm25_rank",
    "x55_source_drift",
    "x57_curation_report",
    "x72_rank_fusion",
    "x73_dataset_card",
    "x84_source_minhash_overlap",
    "b31_join_skew_salted",
    "u6_grouped_map_applyinpandas",
)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-r11b")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()

    def best_of(qid: str, sf_dir: str, n: int = 3) -> float:
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            specs[qid].build(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    for qid in QIDS:
        t_small = best_of(qid, "/root/testdata/sf0.01")
        t_big = best_of(qid, "/root/testdata/sf0.1")
        print(
            f"{qid}: sf0.01 {t_small:.3f} s -> sf0.1 {t_big:.3f} s "
            f"({t_big / t_small:.2f}x for 10x rows)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
