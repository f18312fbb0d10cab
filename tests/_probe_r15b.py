"""Ad-hoc round-15 probe B (not a pytest module): x11's ×100 cold build
under a 32-partition session — the bench-like width where the fan-out
guard's repartition branch actually fires at ×100 (the r12 probe session's
64 partitions keep it dormant: count-based n=46, bytes-based n=58).

Run on the pre-round-15 tree (git stash) and the post tree; compare wall
and the job listing (the sizing ``count()`` jobs must disappear).

Usage: python tests/_probe_r15b.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

import _probe_r12 as r12
import _probe_r13b as r13b
from scylladb_redpanda_cdc_spark.plans import (
    clear_session_frame_caches,
    registry,
)

UI_PORT = 4047


def _session():
    return (
        SparkSession.builder.master("local[32]")
        .appName("probe-r15b")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.retainedStages", "5000")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )


def _rest(path):
    url = f"http://127.0.0.1:{UI_PORT}/api/v1{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main():
    r12.UI_PORT = UI_PORT  # _run_metrics must hit THIS session's UI
    r13b.build_x100()
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    qid = "x11_dedup_ngram_jaccard"
    specs["b15_agg_basic"].build(spark, "/root/testdata/sf0.01").write.format(
        "noop"
    ).mode("overwrite").save()
    app = _rest("/applications")[0]["id"]
    clear_session_frame_caches()
    spark._jvm.System.gc()
    seen_stages = {s["stageId"] for s in _rest(f"/applications/{app}/stages")}
    seen_jobs = {j["jobId"] for j in _rest(f"/applications/{app}/jobs")}
    t0 = time.perf_counter()
    df = specs[qid].build(spark, r13b.X100_DIR)
    built = time.perf_counter() - t0
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    sh, inp, mt = r12._run_metrics(app, seen_stages)
    n_pairs = df.count()
    print(
        f"=== {qid} x100 @32 parts: build {built:.1f}s wall {wall:.1f}s"
        f"  input {inp/1e6:.0f}MB shuffle {sh/1e6:.0f}MB maxTask {mt/1e6:.1f}MB"
        f"  pairs {n_pairs}"
    )
    from datetime import datetime

    f = "%Y-%m-%dT%H:%M:%S.%f%Z"
    for j in sorted(
        (j for j in _rest(f"/applications/{app}/jobs") if j["jobId"] not in seen_jobs),
        key=lambda j: j["jobId"],
    ):
        try:
            dur = (
                datetime.strptime(j["completionTime"], f)
                - datetime.strptime(j["submissionTime"], f)
            ).total_seconds()
            dur = f"{dur:7.1f}s"
        except Exception:
            dur = "       ?"
        print(f"  job {j['jobId']:>4} {dur}  {(j.get('description') or j.get('name') or '')[:90]}")
    spark.stop()


if __name__ == "__main__":
    main()
