"""Ad-hoc round-14 FOURTH-decade probe for the two heaviest staged-frame
consumers still graded at decade 3 (not a pytest module).

VERDICT r13 task 3: x46 (189.4 s / 12.5 GB shuffle at ×100) and the x21
CC loop (46.1 s at ×100) are exactly where a hidden super-linear term
would hide — the b31 lesson: decade 4 caught what decade 3 called
linear. This probe runs both at ×100 → ×1000 (5 M documents, 1000-way
near-dup saturation) with per-stage attribution (top stages by executor
run time, UI REST) so any growth is attributable to a named stage, not
argued from totals.

Expected shape: both kernels are cap-bounded downstream of corpus-sized
map work — x46's candidate pairs and pruned exact side are
X2_BUCKET_CAP-bounded (buckets are already over-cap at ×100 saturation,
so the eval-scoped volume should be near-FLAT across the decade), x21's
edge list is the df≤50-capped x11 pair set; the linear term left is the
signature/posting map over the corpus (1000-way parallel on a real
cluster). Disk watch: the box has ~66 GB free — the probe prints
/tmp usage before and after each cell.

Usage: python tests/_probe_r14b.py [qid ...]  (default: x21, x46)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _probe_r12 as r12
import _probe_r13b as r13b
import _probe_r13f as r13f
from scylladb_redpanda_cdc_spark.plans import (
    clear_session_frame_caches,
    registry,
)

DECADE4B = ["x21_dedup_cluster_cc", "x46_dedup_est_quality"]


def _free_gb() -> float:
    return shutil.disk_usage("/tmp").free / 1e9


def _top_stages(app: str, after: set[int], k: int = 6):
    rows = []
    for s in r12._rest(f"/applications/{app}/stages"):
        if s["stageId"] in after or s["status"] != "COMPLETE":
            continue
        rows.append(
            (
                s.get("executorRunTime", 0),
                s.get("shuffleReadBytes", 0) + s.get("shuffleWriteBytes", 0),
                s.get("numTasks", 0),
                s["stageId"],
                s.get("name", "?").split("\n")[0][:70],
            )
        )
    rows.sort(reverse=True)
    return rows[:k]


def main():
    qids = sys.argv[1:] or DECADE4B
    r12.build_x10()
    r13b.build_x100()
    r13f.build_x1000()
    spark = r12._session()
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    r12._noop_run(specs, spark, "b15_agg_basic", "/root/testdata/sf0.01")
    app = r12._app_id()
    for qid in qids:
        print(f"== {qid}")
        for label, sf_dir in (("x100", r13b.X100_DIR), ("x1000", r13f.X1000_DIR)):
            clear_session_frame_caches()
            print(f"  [{label}] warm run (free {_free_gb():.1f} GB) ...", flush=True)
            t0 = time.perf_counter()
            r12._noop_run(specs, spark, qid, sf_dir)
            print(
                f"  [{label}] warm {time.perf_counter() - t0:.1f}s; measured run ...",
                flush=True,
            )
            clear_session_frame_caches()
            spark._jvm.System.gc()
            seen = r12._stage_ids(app)
            wall = r12._noop_run(specs, spark, qid, sf_dir)
            sh, _inp, mt = r12._run_metrics(app, seen)
            n = specs[qid].build(spark, sf_dir).count()
            print(
                f"  [{label}] wall {wall:8.2f}s  shuffle {sh / 1e6:9.1f} MB"
                f"  max task {mt / 1e6:7.2f} MB  rows {n}"
                f"  (free {_free_gb():.1f} GB)"
            )
            for rt, shf, nt, sid, name in _top_stages(app, seen):
                print(
                    f"      stage {sid:5d} {rt / 1000:8.1f}s cpu"
                    f" {shf / 1e6:9.1f} MB shuf {nt:5d} tasks  {name}"
                )
        clear_session_frame_caches()
    spark.stop()


if __name__ == "__main__":
    main()
