"""Ad-hoc round-13 THIRD-decade probe (not a pytest module).

Rounds 10-12 proved two decades (sf0.01 → sf0.1 → ×10). This probe
adds a third measured decade for the kernels whose 100 TB claims carry
the repo: a ×100 replication of sf0.1 (same per-replica key-shift
recipe as `_probe_r12.build_x10`, range(100)) — ~60M lineitem rows,
500k documents (each fixture doc gains 100 tailed near-dup variants:
the MAXIMALLY saturated near-dup regime), 16.5M events.

Both the ×10 and ×100 cells are measured in THIS session (warm second
run per cell, UI REST stage metrics), so the decade-3 slope is a
clean same-session pair. Output-pair counts are recorded for the
dedup family — at this density the bucket/df caps are expected to
DROP the over-cap families outright (a 100-member content family
exceeds X2_BUCKET_CAP=50 and the df≤50 shingle cut), which is the
designed behavior: candidate generation cost must not grow with
duplicate density.

Usage: python tests/_probe_r13b.py [qid ...]  (default: the DECADE3 set)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

import _probe_r12 as r12
from scylladb_redpanda_cdc_spark.plans import (
    clear_session_frame_caches,
    registry,
)

SRC = r12.SRC
X100_DIR = "/tmp/r13_x100"

DECADE3 = [
    "x1_dedup_exact",
    "x2_dedup_fuzzy_minhash",
    "x11_dedup_ngram_jaccard",
    "b40_rfm_segmentation",
    "u6_grouped_map_applyinpandas",
    "s19_stream_redelivery_dedup",
    "s17_stream_incremental_mv",
]

#: Queries whose OUTPUT row count is itself the scale story (dedup pairs).
COUNT_ROWS = {"x1_dedup_exact", "x2_dedup_fuzzy_minhash", "x11_dedup_ngram_jaccard"}


def build_x100() -> None:
    if os.path.exists(os.path.join(X100_DIR, "_DONE")):
        return
    os.makedirs(X100_DIR, exist_ok=True)
    con = duckdb.connect()
    ko = con.sql(
        f"SELECT max(o_orderkey)+1 FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()[0]
    kc = con.sql(
        f"SELECT max(o_custkey)+1 FROM read_parquet('{SRC}/orders.parquet')"
    ).fetchone()[0]
    ke, ku = con.sql(
        f"SELECT max(event_id)+1, max(user_id)+1 FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()
    kd = con.sql(
        f"SELECT max(doc_id)+1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    reps = "(SELECT unnest(range(100)) AS v)"
    jobs = {
        "orders": f"""SELECT o_orderkey + v*{ko} AS o_orderkey,
            o_custkey + v*{kc} AS o_custkey, o_orderstatus, o_totalprice,
            o_orderdate, o_orderpriority
          FROM read_parquet('{SRC}/orders.parquet') CROSS JOIN {reps}""",
        "lineitem": f"""SELECT l_orderkey + v*{ko} AS l_orderkey, l_partkey,
            l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
            l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{SRC}/lineitem.parquet') CROSS JOIN {reps}""",
        "events": f"""SELECT event_id + v*{ke} AS event_id, ts,
            user_id + v*{ku} AS user_id, event_type, value, props
          FROM read_parquet('{SRC}/events.parquet') CROSS JOIN {reps}""",
        "documents": f"""SELECT doc_id + v*{kd} AS doc_id,
            text || ' tail' || CAST(v AS VARCHAR) AS text, lang, source,
            n_chars + 5 + len(CAST(v AS VARCHAR)) AS n_chars
          FROM read_parquet('{SRC}/documents.parquet') CROSS JOIN {reps}""",
        "embeddings": f"""SELECT vec_id + v*1000000 AS vec_id, embedding, label
          FROM read_parquet('{SRC}/embeddings.parquet') CROSS JOIN {reps}""",
    }
    for name, sql in jobs.items():
        con.execute(
            f"COPY ({sql}) TO '{X100_DIR}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(f"  built {name} x100")
    open(os.path.join(X100_DIR, "_DONE"), "w").write("ok")


def probe(spark, specs, qids):
    app = r12._app_id()
    print(
        f"{'query':30s} {'x10 wall':>9s} {'shufMB':>8s} {'mxTkMB':>7s}"
        f" {'rows':>10s} | {'x100':>8s} {'shufMB':>9s} {'mxTkMB':>7s}"
        f" {'rows':>10s} {'wall x':>7s}"
    )
    for qid in qids:
        row = []
        for sf_dir in (r12.X10_DIR, X100_DIR):
            clear_session_frame_caches()
            r12._noop_run(specs, spark, qid, sf_dir)  # warm/stage run
            clear_session_frame_caches()  # measured run rebuilds staged frames
            spark._jvm.System.gc()
            seen = r12._stage_ids(app)
            wall = r12._noop_run(specs, spark, qid, sf_dir)
            sh, _inp, mt = r12._run_metrics(app, seen)
            n = (
                specs[qid].build(spark, sf_dir).count()
                if qid in COUNT_ROWS
                else -1
            )
            row.append((wall, sh / 1e6, mt / 1e6, n))
        (w1, s1, m1, n1), (w2, s2, m2, n2) = row
        print(
            f"{qid:30s} {w1:8.2f}s {s1:8.1f} {m1:7.2f} {n1:10d}"
            f" | {w2:7.2f}s {s2:9.1f} {m2:7.2f} {n2:10d} {w2 / w1:6.2f}x"
        )


def main():
    qids = sys.argv[1:] or DECADE3
    print("== ensuring x10 dataset")
    r12.build_x10()
    print("== building x100 dataset (sf0.1 replicated 100x, keys shifted)")
    t0 = time.perf_counter()
    build_x100()
    print(f"   ({time.perf_counter() - t0:.1f}s)")
    spark = r12._session()
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    r12._noop_run(specs, spark, "b15_agg_basic", "/root/testdata/sf0.01")
    probe(spark, specs, qids)
    spark.stop()


if __name__ == "__main__":
    main()
