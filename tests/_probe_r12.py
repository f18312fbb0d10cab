"""Ad-hoc round-12 second-decade scaling probes (not a pytest module).

VERDICT r11 task 3: the round-10/11 probes proved sub-linearity one decade
up (sf0.01 -> sf0.1). This probe synthesizes ONE MORE decade for the
top-10 heaviest kernels only (by recorded sf0.1 floor): a x10 replication
of the sf0.1 tables each kernel consumes, with per-replica key shifts so
join/dedup/group cardinalities scale the way a real 10x corpus would
(shifted event_id keeps s19's dedup honest; shifted user_id grows u6's
group count, not its group size; document variants get distinct ' tailN'
suffixes — near-dup families for x46's bucket cap, distinct exact-hashes
for x57's dedup stage).

Per query it records, at sf0.1 and at x10 (warm second run):
  wall seconds, total shuffle read+write bytes, and the max single-task
  bytes (input + shuffle read) across all stages of the run — the three
  numbers the 100 TB claims rest on (SURVEY.md "Round-12 probe" table).

Stage metrics come from the Spark UI REST API (the probe session enables
the UI; the package session keeps it off), attributed to a run by stage-id
watermark.

Usage: python tests/_probe_r12.py [qid ...]   (default: the full heavy set)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

from scylladb_redpanda_cdc_spark.plans import registry

SRC = "/root/testdata/sf0.1"
X10_DIR = "/tmp/r12_x10"
UI_PORT = 4046

#: The top-10 heaviest kernels by committed sf0.1 floor (bench.BASELINE_S,
#: round-11 full-registry flooring) — the set VERDICT r11 task 3 names.
HEAVY = [
    "s17_stream_incremental_mv",
    "u6_grouped_map_applyinpandas",
    "b21_agg_percentile",
    "s22_stream_scd2",
    "s20_stream_partitioned_sink",
    "s19_stream_redelivery_dedup",
    "b41_approx_quantile",
    "x46_dedup_est_quality",
    "x57_curation_report",
    "b31_join_skew_salted",
]

#: sf0.1 tables the heavy set consumes (orders also feeds synth_changelog
#: for s17/s22), with the per-replica key-shift recipe. Key shift base =
#: max(key)+1 per table; l_orderkey shares orders' base so the b31 join
#: keys stay consistent across the replica.
def build_x10() -> None:
    if os.path.exists(os.path.join(X10_DIR, "_DONE")):
        return
    os.makedirs(X10_DIR, exist_ok=True)
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
    kv = con.sql(
        f"SELECT max(vec_id)+1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    reps = "(SELECT unnest(range(10)) AS v)"
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
        # identical vectors x10: every LSH bucket gets ten exact copies —
        # the adversarial saturation case the bucket cap exists for
        "embeddings": f"""SELECT vec_id + v*{kv} AS vec_id, embedding, label
          FROM read_parquet('{SRC}/embeddings.parquet') CROSS JOIN {reps}""",
    }
    for name, sql in jobs.items():
        con.execute(
            f"COPY ({sql}) TO '{X10_DIR}/{name}.parquet' (FORMAT PARQUET)"
        )
        print(f"  built {name} x10")
    open(os.path.join(X10_DIR, "_DONE"), "w").write("ok")


def _session():
    return (
        SparkSession.builder.master("local[32]")
        .appName("probe-r12")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
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


def _rest(path: str):
    url = f"http://127.0.0.1:{UI_PORT}/api/v1{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _app_id() -> str:
    return _rest("/applications")[0]["id"]


def _stage_ids(app: str) -> set[int]:
    return {s["stageId"] for s in _rest(f"/applications/{app}/stages")}


def _run_metrics(app: str, after: set[int]) -> tuple[float, float, float]:
    """(total shuffle r+w bytes, total input bytes, max single-task
    input+shuffle-read bytes) over COMPLETE stages whose stageId was not
    present before the run."""
    shuffle = 0.0
    inp = 0.0
    max_task = 0.0
    for s in _rest(f"/applications/{app}/stages"):
        if s["stageId"] in after or s["status"] != "COMPLETE":
            continue
        shuffle += s.get("shuffleReadBytes", 0) + s.get("shuffleWriteBytes", 0)
        inp += s.get("inputBytes", 0)
        try:
            ts = _rest(
                f"/applications/{app}/stages/{s['stageId']}"
                f"/{s['attemptId']}/taskSummary?quantiles=1.0"
            )
            task = (
                ts.get("inputMetrics", {}).get("bytesRead", [0])[-1]
                + ts.get("shuffleReadMetrics", {}).get("readBytes", [0])[-1]
            )
            max_task = max(max_task, task)
        except Exception:
            pass  # tiny stages may age out of the summary store
    return shuffle, inp, max_task


def _noop_run(specs, spark, qid, sf_dir) -> float:
    t0 = time.perf_counter()
    specs[qid].build(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


def probe(spark, specs, qids):
    app = _app_id()
    print(
        f"{'query':34s} {'sf0.1 wall':>10s} {'inMB':>7s} {'shufMB':>8s}"
        f" {'maxTkMB':>8s} | {'x10 wall':>9s} {'inMB':>7s} {'shufMB':>8s}"
        f" {'maxTkMB':>8s} {'wall x':>7s}"
    )
    for qid in qids:
        row = []
        for sf_dir in (SRC, X10_DIR):
            _noop_run(specs, spark, qid, sf_dir)  # warm/stage run
            spark._jvm.System.gc()
            seen = _stage_ids(app)
            wall = _noop_run(specs, spark, qid, sf_dir)
            sh, inp, mt = _run_metrics(app, seen)
            row.append((wall, inp / 1e6, sh / 1e6, mt / 1e6))
        (w1, i1, s1, m1), (w2, i2, s2, m2) = row
        print(
            f"{qid:34s} {w1:9.2f}s {i1:7.1f} {s1:8.1f} {m1:8.2f}"
            f" | {w2:8.2f}s {i2:7.1f} {s2:8.1f} {m2:8.2f} {w2 / w1:6.2f}x"
        )


#: The O(n^2)-risk near-dup join family — probed with output-pair counts
#: (the saturated corpus grows pairs by three orders of magnitude; the
#: caps must absorb it in bounded wall). Run via `--neardup`.
NEARDUP = [
    "x2_dedup_fuzzy_minhash",
    "x11_dedup_ngram_jaccard",
    "x12_dedup_embedding_cosine",
    "x21_dedup_cluster_cc",
]


def probe_neardup(spark, specs):
    from scylladb_redpanda_cdc_spark.plans import clear_session_frame_caches

    app = _app_id()
    print(
        f"{'query':28s} {'sf0.1':>7s} {'shufMB':>8s} {'mxTkMB':>7s}"
        f" {'rows':>9s} | {'x10':>8s} {'shufMB':>8s} {'mxTkMB':>7s}"
        f" {'rows':>9s} {'wall x':>7s}"
    )
    for qid in NEARDUP:
        row = []
        for sf_dir in (SRC, X10_DIR):
            clear_session_frame_caches()
            _noop_run(specs, spark, qid, sf_dir)  # warm/stage run
            clear_session_frame_caches()          # measured run rebuilds
            spark._jvm.System.gc()
            seen = _stage_ids(app)
            wall = _noop_run(specs, spark, qid, sf_dir)
            sh, _inp, mt = _run_metrics(app, seen)
            n = specs[qid].build(spark, sf_dir).count()
            row.append((wall, sh / 1e6, mt / 1e6, n))
        (w1, s1, m1, n1), (w2, s2, m2, n2) = row
        print(
            f"{qid:28s} {w1:6.2f}s {s1:8.1f} {m1:7.2f} {n1:9d}"
            f" | {w2:7.2f}s {s2:8.1f} {m2:7.2f} {n2:9d} {w2 / w1:6.2f}x"
        )


def main():
    argv = sys.argv[1:]
    neardup = "--neardup" in argv
    qids = [a for a in argv if a != "--neardup"] or HEAVY
    print("== building x10 dataset (sf0.1 replicated 10x, keys shifted)")
    build_x10()
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()
    _noop_run(specs, spark, "b15_agg_basic", "/root/testdata/sf0.01")  # warm
    if neardup:
        probe_neardup(spark, specs)
    else:
        probe(spark, specs, qids)
    spark.stop()


if __name__ == "__main__":
    main()
