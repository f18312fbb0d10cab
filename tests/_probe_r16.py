"""Ad-hoc round-16 per-stage probe (not a pytest module).

VERDICT r15 task 3: per-task vectorization candidates (x61/x90/x7/x108).
Measures, for each qid at a given data dir: wall (steady after a staging
run), input/shuffle bytes, max single-task bytes, and the per-stage
wall/task listing so the expensive stage is attributable before any
rewrite.

Usage: python tests/_probe_r16.py <sf_dir> qid [qid ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _probe_r12 as r12
from scylladb_redpanda_cdc_spark.plans import (
    clear_session_frame_caches,
    registry,
)

UI_PORT = 4048


def main():
    sf_dir = sys.argv[1]
    qids = sys.argv[2:]
    r12.UI_PORT = UI_PORT
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-r16")
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
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    r12._noop_run(specs, spark, "b15_agg_basic", "/root/testdata/sf0.01")
    app = r12._app_id()
    for qid in qids:
        clear_session_frame_caches()
        r12._noop_run(specs, spark, qid, sf_dir)  # staging/warm run
        clear_session_frame_caches()
        spark._jvm.System.gc()
        seen = r12._stage_ids(app)
        wall = r12._noop_run(specs, spark, qid, sf_dir)
        sh, inp, mt = r12._run_metrics(app, seen)
        print(
            f"\n=== {qid} @{sf_dir}: wall {wall:.2f}s input {inp/1e6:.0f}MB"
            f" shuffle {sh/1e6:.0f}MB maxTask {mt/1e6:.1f}MB"
        )
        stages = []
        for s in r12._rest(f"/applications/{app}/stages"):
            if s["stageId"] in seen or s["status"] != "COMPLETE":
                continue
            dur = s.get("executorRunTime", 0) / 1e3  # summed task time
            stages.append(
                (
                    dur,
                    s["stageId"],
                    s["numCompleteTasks"],
                    s.get("inputBytes", 0) / 1e6,
                    s.get("shuffleReadBytes", 0) / 1e6,
                    s.get("shuffleWriteBytes", 0) / 1e6,
                    s["name"][:70],
                )
            )
        stages.sort(reverse=True)
        print(
            f"  {'taskS':>7} {'stage':>5} {'tasks':>5} {'inMB':>7}"
            f" {'shRdMB':>7} {'shWrMB':>7} name"
        )
        for dur, sid, nt, inp_mb, shr, shw, name in stages[:14]:
            print(
                f"  {dur:7.1f} {sid:>5} {nt:>5} {inp_mb:7.1f}"
                f" {shr:7.1f} {shw:7.1f} {name}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
