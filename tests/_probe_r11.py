"""Ad-hoc round-11 scaling probes (not a pytest module).

Three probes for SURVEY.md §6:
  A. the ranged-rank rewrites (x34/x35/x93/x100/x78/x121/b40) at
     sf0.01 -> sf0.1 (10x docs), warm best-of-3 per SF;
  B. x46's bounded estimator under 10-way near-dup saturation (every
     sf0.1 doc replicated as ten near-identical variants — the
     x86/x101 adversarial method for the bucket cap);
  C. the fixed-K probe family (x32/x113) at sf0.01 -> sf0.1 (4x
     vectors) — |Q| is literal-bounded, so the scored pass should
     scale with the corpus only.

Usage: python tests/_probe_r11.py [A|B|C ...]  (default: all)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.plans import registry

SAT_DIR = "/tmp/sat10_r11"


def _session():
    return (
        SparkSession.builder.master("local[32]")
        .appName("probe-r11")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def best_of(spark, specs, qid, sf_dir, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        specs[qid].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    return best


def probe_a(spark, specs):
    print("== probe A: ranged-rank rewrites, sf0.01 -> sf0.1 (10x docs)")
    for qid in (
        "x34_vocab_coverage",
        "x35_tokens_to_ids",
        "x93_oov_rate",
        "x100_vocab_budget_sweep",
        "x78_ccnet_buckets",
        "x121_curriculum_order",
        "b40_rfm_segmentation",
    ):
        spark._jvm.System.gc()
        t1 = best_of(spark, specs, qid, "/root/testdata/sf0.01")
        spark._jvm.System.gc()
        t2 = best_of(spark, specs, qid, "/root/testdata/sf0.1")
        print(f"  {qid:28s} {t1:6.2f}s -> {t2:6.2f}s  ({t2 / t1:4.2f}x)")


def build_saturated(spark):
    """10-way near-dup saturation of sf0.1 documents: ten variants per
    doc, each with a tiny distinct tail so variant families collide in
    the same MinHash band buckets (the x86/x101 adversarial method)."""
    if os.path.exists(os.path.join(SAT_DIR, "documents.parquet")):
        return
    d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n = d.agg(F.max("doc_id")).collect()[0][0] + 1
    v = d.crossJoin(
        spark.range(10).select(F.col("id").alias("_variant"))
    ).select(
        (F.col("doc_id") + F.col("_variant") * F.lit(n)).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" tail"), F.col("_variant").cast("string")
        ).alias("text"),
        "lang",
        "source",
        *[c for c in d.columns if c not in ("doc_id", "text", "lang", "source")],
    )
    v.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(SAT_DIR, "documents.parquet")
    )
    # x46 only reads documents; other tables unused on this probe.


def probe_b(spark, specs):
    print("== probe B: x46 bounded estimator, sf0.1 -> 10-way saturation")
    build_saturated(spark)
    spark._jvm.System.gc()
    t1 = best_of(spark, specs, "x46_dedup_est_quality", "/root/testdata/sf0.1")
    r1 = specs["x46_dedup_est_quality"].build(
        spark, "/root/testdata/sf0.1"
    ).count()
    spark._jvm.System.gc()
    t2 = best_of(spark, specs, "x46_dedup_est_quality", SAT_DIR)
    r2 = specs["x46_dedup_est_quality"].build(spark, SAT_DIR).count()
    print(
        f"  x46 {t1:6.2f}s ({r1} pairs) -> {t2:6.2f}s ({r2} pairs)"
        f"  wall {t2 / t1:4.2f}x, pairs {r2 / max(r1, 1):5.1f}x"
    )


def probe_c(spark, specs):
    print("== probe C: fixed-K probe family, sf0.01 -> sf0.1 (4x vectors)")
    for qid in ("x32_knn_join", "x113_knn_label_eval"):
        spark._jvm.System.gc()
        t1 = best_of(spark, specs, qid, "/root/testdata/sf0.01")
        spark._jvm.System.gc()
        t2 = best_of(spark, specs, qid, "/root/testdata/sf0.1")
        print(f"  {qid:28s} {t1:6.2f}s -> {t2:6.2f}s  ({t2 / t1:4.2f}x)")


def main():
    which = set(a.upper() for a in sys.argv[1:]) or {"A", "B", "C"}
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    # warm-up
    specs["b15_agg_basic"].build(spark, "/root/testdata/sf0.01").write.format(
        "noop"
    ).mode("overwrite").save()
    if "A" in which:
        probe_a(spark, specs)
    if "B" in which:
        probe_b(spark, specs)
    if "C" in which:
        probe_c(spark, specs)
    spark.stop()


if __name__ == "__main__":
    main()
