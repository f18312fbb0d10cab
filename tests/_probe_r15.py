"""Ad-hoc round-15 optimization probe (not a pytest module).

Measures the two VERDICT-r14 targets at the ×100 decade, before and after
the round-15 changes (run it on each tree):

1. x11's postings sizing cost (VERDICT r15 task 1): cold x11 build wall,
   the JOBS the build launches (names + wall each — the `count()` jobs are
   visible here), then x21 riding the pair cache.
2. s22's touched-history re-lead task bound (task 3): wall + max single-
   task bytes across the run's stages.

Usage: python tests/_probe_r15.py [qid ...]   (default: x11, x21, s22)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _probe_r12 as r12
import _probe_r13b as r13b
from scylladb_redpanda_cdc_spark.plans import (
    clear_session_frame_caches,
    registry,
)

DEFAULT = ["x11_dedup_ngram_jaccard", "x21_dedup_cluster_cc", "s22_stream_scd2"]


def _jobs(app):
    url = f"http://127.0.0.1:{r12.UI_PORT}/api/v1/applications/{app}/jobs"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main():
    qids = sys.argv[1:] or DEFAULT
    r13b.build_x100()
    spark = r12._session()
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    r12._noop_run(specs, spark, "b15_agg_basic", "/root/testdata/sf0.01")
    app = r12._app_id()

    for qid in qids:
        clear_session_frame_caches()
        if qid.startswith("x21"):
            # x21's steady state rides x11's pair cache: build it first.
            r12._noop_run(specs, spark, "x11_dedup_ngram_jaccard", r13b.X100_DIR)
        elif qid.startswith("s"):
            # staging pass so the measured run is steady-state
            r12._noop_run(specs, spark, qid, r13b.X100_DIR)
        spark._jvm.System.gc()
        seen_stages = r12._stage_ids(app)
        seen_jobs = {j["jobId"] for j in _jobs(app)}
        t0 = time.perf_counter()
        wall = r12._noop_run(specs, spark, qid, r13b.X100_DIR)
        sh, inp, mt = r12._run_metrics(app, seen_stages)
        print(
            f"\n=== {qid} x100: wall {wall:.1f}s  input {inp/1e6:.0f}MB"
            f"  shuffle {sh/1e6:.0f}MB  maxTask {mt/1e6:.1f}MB"
        )
        # per-stage attribution of the heavy tasks (VERDICT r14 task 3:
        # WHICH stage carries the max task)
        for s in r12._rest(f"/applications/{app}/stages"):
            if s["stageId"] in seen_stages or s["status"] != "COMPLETE":
                continue
            try:
                ts = r12._rest(
                    f"/applications/{app}/stages/{s['stageId']}"
                    f"/{s['attemptId']}/taskSummary?quantiles=1.0"
                )
                task = (
                    ts.get("inputMetrics", {}).get("bytesRead", [0])[-1]
                    + ts.get("shuffleReadMetrics", {}).get("readBytes", [0])[-1]
                )
            except Exception:
                continue
            if task > 20e6:
                print(
                    f"  stage {s['stageId']:>5} tasks={s['numCompleteTasks']:>4}"
                    f" maxTask={task/1e6:7.1f}MB  {s['name'][:80]}"
                )
        new_jobs = sorted(
            (j for j in _jobs(app) if j["jobId"] not in seen_jobs),
            key=lambda j: j["jobId"],
        )
        for j in new_jobs:
            dur = ""
            try:
                from datetime import datetime

                f = "%Y-%m-%dT%H:%M:%S.%f%Z"
                dur = (
                    datetime.strptime(j["completionTime"], f)
                    - datetime.strptime(j["submissionTime"], f)
                ).total_seconds()
                dur = f"{dur:7.1f}s"
            except Exception:
                pass
            desc = (j.get("description") or j.get("name") or "")[:100]
            print(f"  job {j['jobId']:>4} {dur}  {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
