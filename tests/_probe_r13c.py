"""Ad-hoc round-13 partition-width sweep at decade 3 (not a pytest module).

The ×100 probe (`_probe_r13b.py`) measured x11's max task at 119 MB
under the probe's FIXED 64 shuffle partitions and ASSERTED that "a real
cluster scales partition count with the corpus". This probe measures
that assertion instead of leaving it a claim: the same x11 ×100 cell is
re-run under spark.sql.shuffle.partitions ∈ {64, 256, 1024} (AQE on, as
deployed — AQE coalesces the width back down where volumes are small,
so the sweep also shows the knob is safe to oversize). Expected shape:
max task ∝ postings/partition, i.e. ~4× down per 4× width, while wall
stays flat-or-better — the evidence that the decade-3 task size is a
single-box conf artifact, not a plan property.

Usage: python tests/_probe_r13c.py [qid ...]  (default: x11)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import _probe_r12 as r12
import _probe_r13b as r13b
from scylladb_redpanda_cdc_spark.plans import (
    clear_session_frame_caches,
    registry,
)

WIDTHS = (64, 256, 1024)


def sweep(spark, specs, qids):
    app = r12._app_id()
    print(f"{'query':30s} {'width':>6s} {'wall':>8s} {'shufMB':>9s} {'mxTkMB':>7s}")
    for qid in qids:
        for width in WIDTHS:
            spark.conf.set("spark.sql.shuffle.partitions", str(width))
            clear_session_frame_caches()
            r12._noop_run(specs, spark, qid, r13b.X100_DIR)  # warm/stage
            clear_session_frame_caches()
            spark._jvm.System.gc()
            seen = r12._stage_ids(app)
            wall = r12._noop_run(specs, spark, qid, r13b.X100_DIR)
            sh, _inp, mt = r12._run_metrics(app, seen)
            print(
                f"{qid:30s} {width:6d} {wall:7.2f}s {sh / 1e6:9.1f}"
                f" {mt / 1e6:7.2f}"
            )


def main():
    qids = sys.argv[1:] or ["x11_dedup_ngram_jaccard"]
    print("== ensuring x10 + x100 datasets")
    r12.build_x10()
    r13b.build_x100()
    spark = r12._session()
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    r12._noop_run(specs, spark, "b15_agg_basic", "/root/testdata/sf0.01")
    sweep(spark, specs, qids)
    spark.stop()


if __name__ == "__main__":
    main()
