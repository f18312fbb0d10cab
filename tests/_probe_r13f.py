"""Ad-hoc round-13 FOURTH-decade probe (not a pytest module).

×1000 of sf0.1 — 600M lineitem rows, 15M orders, 5M documents (each
fixture doc with 1000 tailed near-dup variants) — for the kernels whose
decade-3 verdict was "tasks flat / bounded": the flagship CDC
compaction, x1 exact dedup, and b21's exact percentile. The claim being
bought: their per-task volume and (for b21) shuffle bytes stay bounded
at ANOTHER 10×, i.e. the bound is structural, not a lucky decade.

Builds only the three tables these queries read (orders, lineitem,
documents — ~14 GB parquet). ×100 and ×1000 cells measured in this
session (warm second run, caches cleared per cell).

Usage: python tests/_probe_r13f.py [qid ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

import _probe_r12 as r12
import _probe_r13b as r13b
from scylladb_redpanda_cdc_spark.plans import (
    clear_session_frame_caches,
    registry,
)

SRC = r12.SRC
X1000_DIR = "/tmp/r13_x1000"

DECADE4 = [
    "flagship_cdc_materialize",
    "x1_dedup_exact",
    "b21_agg_percentile",
]


def build_x1000() -> None:
    if os.path.exists(os.path.join(X1000_DIR, "_DONE")):
        return
    os.makedirs(X1000_DIR, exist_ok=True)
    con = duckdb.connect()
    ko = con.sql(
        f"SELECT max(o_orderkey)+1 FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()[0]
    kc = con.sql(
        f"SELECT max(o_custkey)+1 FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()[0]
    kd = con.sql(
        f"SELECT max(doc_id)+1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    reps = "(SELECT unnest(range(1000)) AS v)"
    jobs = {
        "orders": f"""SELECT o_orderkey + v*{ko} AS o_orderkey,
            o_custkey + v*{kc} AS o_custkey, o_orderstatus, o_totalprice,
            o_orderdate, o_orderpriority
          FROM read_parquet('{SRC}/orders.parquet') CROSS JOIN {reps}""",
        "lineitem": f"""SELECT l_orderkey + v*{ko} AS l_orderkey, l_partkey,
            l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
            l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{SRC}/lineitem.parquet') CROSS JOIN {reps}""",
        "documents": f"""SELECT doc_id + v*{kd} AS doc_id,
            text || ' tail' || CAST(v AS VARCHAR) AS text, lang, source,
            n_chars + 5 + len(CAST(v AS VARCHAR)) AS n_chars
          FROM read_parquet('{SRC}/documents.parquet') CROSS JOIN {reps}""",
    }
    for name, sql in jobs.items():
        t0 = time.perf_counter()
        con.execute(
            f"COPY ({sql}) TO '{X1000_DIR}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(f"  built {name} x1000 ({time.perf_counter() - t0:.1f}s)")
    open(os.path.join(X1000_DIR, "_DONE"), "w").write("ok")


def main():
    qids = sys.argv[1:] or DECADE4
    r12.build_x10()
    r13b.build_x100()
    print("== building x1000 dataset (orders/lineitem/documents only)")
    build_x1000()
    spark = r12._session()
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    r12._noop_run(specs, spark, "b15_agg_basic", "/root/testdata/sf0.01")
    app = r12._app_id()
    print(
        f"{'query':28s} {'x100 wall':>9s} {'shufMB':>8s} {'mxTkMB':>7s}"
        f" | {'x1000':>8s} {'shufMB':>9s} {'mxTkMB':>7s} {'wall x':>7s}"
    )
    for qid in qids:
        row = []
        for sf_dir in (r13b.X100_DIR, X1000_DIR):
            clear_session_frame_caches()
            r12._noop_run(specs, spark, qid, sf_dir)
            clear_session_frame_caches()
            spark._jvm.System.gc()
            seen = r12._stage_ids(app)
            wall = r12._noop_run(specs, spark, qid, sf_dir)
            sh, _inp, mt = r12._run_metrics(app, seen)
            row.append((wall, sh / 1e6, mt / 1e6))
        (w1, s1, m1), (w2, s2, m2) = row
        print(
            f"{qid:28s} {w1:8.2f}s {s1:8.1f} {m1:7.2f}"
            f" | {w2:7.2f}s {s2:9.1f} {m2:7.2f} {w2 / w1:6.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
