"""Structured Streaming runtime (SURVEY.md §2.S, §7 stage 5).

The reference pipeline is a daemon stream: Kafka Connect polls the CDC log,
produces to Redpanda, consumers materialize state (reference
connect-standalone.properties:1-5, README.md:180,206-215). Its Spark
restatement is ``readStream -> transform -> writeStream``. Tests and the
driver run Kafka-less: a file-stream source over the same parquet fixtures
with ``trigger(availableNow=True)`` — the downstream DAG is identical by
construction, so semantics transfer to the Kafka source unchanged (S1).

Driver contract note: every S* query must come back as a *batch* DataFrame
(the driver calls ``.toPandas()``), so each spec runs its stream to
completion into a memory/parquet sink and returns the sink's table. The
memory sink is the TEST harness sink only — the production path is
``writeStream.format("kafka")`` / partitioned parquet with the same DAG.

Scale posture: state stores are keyed exactly like the shuffles they replace
(user_id / window / PK), watermarks bound state (S6), and checkpointing
(S2) makes every sink resumable — identical role to the reference's
``offset.flush.interval.ms`` + ``/tmp/connect.offsets``.
"""

from __future__ import annotations

import itertools
import os
import re
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Explicit source schema (file streams cannot infer; SURVEY.md §1.3 —
#: schema drift must fail loudly, as in Kafka Connect). ``ts``'s physical
#: type has varied across fixture vintages (TIMESTAMP(NANOS) -> long under
#: the legacy conf; TIMESTAMP(MICROS) without UTC annotation -> ntz), so
#: the per-dataset DDL is derived from the parquet footer via
#: :func:`events_stream_ddl`; after :func:`normalize_event_ts` the frame is
#: always this canonical shape.
EVENTS_NORMALIZED_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)

_events_ts_sql_types: dict[str, str] = {}


def _events_ts_sql_type(sf_dir: str) -> str:
    """Spark SQL type the raw ``ts`` column loads as, probed once per
    dataset from the parquet footer (file streams need a declared schema
    up front, so the batch reader's footer-driven inference is replayed
    here by hand)."""
    if sf_dir not in _events_ts_sql_types:
        import pyarrow.parquet as pq

        t = str(
            pq.read_schema(os.path.join(sf_dir, "events.parquet"))
            .field("ts")
            .type
        )
        if t == "int64" or t.startswith("timestamp[ns"):
            kind = "bigint"  # read as long nanos under nanosAsLong
        elif "tz=" in t:
            kind = "timestamp"
        else:
            kind = "timestamp_ntz"
        _events_ts_sql_types[sf_dir] = kind
    return _events_ts_sql_types[sf_dir]


def events_stream_ddl(sf_dir: str) -> str:
    """Source DDL for ``events.parquet`` under ``sf_dir`` (raw, pre-normalize)."""
    return (
        f"event_id bigint, ts {_events_ts_sql_type(sf_dir)}, user_id bigint, "
        "event_type string, value double, props string"
    )

_name_counter = itertools.count()


def _fresh(prefix: str) -> str:
    return f"{prefix}_{next(_name_counter)}"


#: Scratch root for the availableNow test/bench harness: prefer RAM-backed
#: tmpfs when present — micro-batch checkpoints/state are MBs at fixture
#: scale, and shared-box disk-I/O noise otherwise dominates the streaming
#: specs' wall time. Production queries set their own durable
#: checkpointLocation (S2's whole point); this root never backs one.
#: Override with SG_SCRATCH_DIR.
_SCRATCH_ROOT = os.environ.get("SG_SCRATCH_DIR") or (
    "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
)

#: Disk-backed fallback root for CORPUS-SCALED scratch (state versions,
#: staging transports, corpus sinks). An explicit SG_SCRATCH_DIR wins for
#: everything.
_SCRATCH_DISK_ROOT = os.environ.get("SG_SCRATCH_DIR") or tempfile.gettempdir()

#: Expected-volume bytes above which a scratch dir is placed on DISK even
#: when tmpfs is the preferred root. tmpfs is RAM: the round-14 ×1000
#: probe OOM-killed the JVM when two drills' ~8 GB state versions landed
#: on /dev/shm (78 GB of tmpfs = 78 GB of physical memory gone) — the
#: same fixture-constant-becomes-corpus-hazard class as the fixed
#: coalesce/width knobs, fixed with the same 32 MB gate discipline:
#: below the gate (every fixture SF) placement is byte-identical to the
#: old behavior, so floors are untouched.
SCRATCH_TMPFS_GATE_BYTES = int(
    os.environ.get("SG_SCRATCH_TMPFS_GATE_BYTES", str(32 * 1024 * 1024))
)


def tmpdir(prefix: str, bytes_hint: int | None = None) -> str:
    """Per-run scratch dir (checkpoints, file-stream staging, sinks). Left
    for the OS to reap — returned DataFrames may lazily re-read them.

    ``bytes_hint``: the caller's estimate of the volume this dir will
    hold (source-table or staged-stream bytes — driver-side metadata).
    At or above :data:`SCRATCH_TMPFS_GATE_BYTES` the dir is created on
    disk instead of RAM-backed tmpfs; below it (or with no hint — the
    metadata-sized checkpoint/sink dirs) placement is unchanged."""
    root = _SCRATCH_ROOT
    if bytes_hint is not None and bytes_hint >= SCRATCH_TMPFS_GATE_BYTES:
        root = _SCRATCH_DISK_ROOT
    return tempfile.mkdtemp(prefix=f"sg_{prefix}_", dir=root)


def table_bytes(spark: SparkSession, sf_dir: str, table: str) -> int | None:
    """On-disk bytes of a fixture table's parquet — the standard
    ``bytes_hint`` for scratch that stages or derives from that table."""
    return _fs_bytes(spark, os.path.join(sf_dir, f"{table}.parquet"))


def stream_source_bytes(sdf: DataFrame | None) -> int | None:
    """Total on-disk bytes of a stream's file source(s), or None when it
    has none / cannot be priced — the standard ``bytes_hint`` for state
    dirs whose volume tracks the drained log."""
    if sdf is None:
        return None
    total = 0
    for path in stream_source_paths(sdf):
        nbytes = _fs_bytes(sdf.sparkSession, path)
        if nbytes is not None:
            total += nbytes
    return total or None


def staged_dir_valid(path: str | None) -> bool:
    """True iff a cached staging dir still exists and is non-empty. Scratch
    lives under tmpfs (/dev/shm) which the OS may reap mid-session; a cache
    hit on a reaped path would silently yield an EMPTY stream, so callers
    must re-stage when this is False."""
    try:
        return path is not None and os.path.isdir(path) and bool(os.listdir(path))
    except OSError:
        return False


@contextmanager
def scoped_conf(spark: SparkSession, key: str, value: str):
    """Temporarily set a SQL conf, restoring the caller's value (or unset)
    on exit — same discipline as :func:`scoped_shuffle` but for an arbitrary
    key. Use for confs that only need to cover an eager batch read/write,
    never for confs a lazily-executed stream will need at run time."""
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


_events_src_dirs: dict[str, str] = {}


def _events_source_dir(sf_dir: str) -> str:
    """The file-stream source needs a DIRECTORY it can monitor (the fixture
    dir holds ten unrelated tables, and a bare file path trips the source's
    basePath/partition-inference machinery). Stage a one-symlink directory
    per sf_dir — zero data copied, created once per process."""
    if not staged_dir_valid(_events_src_dirs.get(sf_dir)):
        # a one-symlink dir: zero bytes copied, no hint needed
        stage = tmpdir("events_src")
        os.symlink(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(stage, "events.parquet"),
        )
        _events_src_dirs[sf_dir] = stage
    return _events_src_dirs[sf_dir]


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 source: continuous ingest of the ``events`` table.

    File-stream restatement of ``readStream.format("kafka")`` (reference
    broker localhost:19092, connect-standalone.properties:1): same fixed
    frame, different transport. ``ts`` is normalized to micros exactly like
    the batch loader so stream and batch plans agree bit-for-bit.
    """
    from scylladb_redpanda_cdc_spark.sources.tables import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(events_stream_ddl(sf_dir)).parquet(
        _events_source_dir(sf_dir)
    )
    return normalize_event_ts(raw)


#: Shuffle/state-store partition count while materializing a TEST sink.
#: A stateful streaming query creates one state-store instance per shuffle
#: partition per stateful operator, and every micro-batch pays a load+commit
#: on each; at fixture scale that fixed cost dominates wall time (32
#: partitions ≈ 1 s/query of pure store churn, ~6 s for the stream-stream
#: join's two stores; measured: 1 partition roughly halves s9/s11 again vs
#: 4). Results are partitioning-invariant (aggregation / dedup / join /
#: per-key state do not depend on partition count), so this only trades
#: parallelism for per-store overhead. The production path (writeStream to
#: Kafka / partitioned parquet on a real cluster) never passes through
#: these helpers and keeps the session's own setting.
STREAM_SINK_SHUFFLE_PARTITIONS = int(os.environ.get("SG_STREAM_SINK_SHUFFLE", "1"))

#: Staged-source bytes below which the micro-batch plan width stays at the
#: fixture floor (:data:`STREAM_SINK_SHUFFLE_PARTITIONS`) — the same 32 MB
#: gate discipline as ``operators/scale.py::FANOUT_GATE_BYTES``: every
#: graded SF sits far below it, so fixture plans and floors are
#: byte-identical; only corpus-scale streams size up.
STREAM_WIDTH_GATE_BYTES = int(
    os.environ.get("SG_STREAM_WIDTH_GATE_BYTES", str(32 * 1024 * 1024))
)

#: Target staged-source parquet bytes per micro-batch shuffle task above
#: the gate. Parquet expands ~4x in flight (decompression + row overhead,
#: the decade-4 b31 measurement), so 8 MB of source per task bounds
#: in-flight volume at ~32 MB — and at the round-13 x100 corpus
#: (~175 MB staged changelog) yields a width in the same band as the
#: hand-set SG_STREAM_SINK_SHUFFLE=32 the decade probes validated.
STREAM_TARGET_TASK_SOURCE_BYTES = int(
    os.environ.get("SG_STREAM_TARGET_TASK_SOURCE_BYTES", str(8 * 1024 * 1024))
)

#: Hard cap on the adaptive width — past this a deployment resizes the
#: target instead (the FANOUT_MAX_PARTITIONS convention, scaled to the
#: per-micro-batch volumes streams actually carry).
STREAM_WIDTH_MAX = int(os.environ.get("SG_STREAM_WIDTH_MAX", "2048"))

_FILE_SOURCE_RE = re.compile(r"FileSource\[([^\]]+)\]")


def stream_source_paths(sdf: DataFrame) -> list[str]:
    """The file-source director(ies) feeding a streaming DataFrame,
    recovered from its analyzed plan (``FileSource[<path>]`` leaves
    survive any transformation, so callers never thread paths by hand).
    Empty for non-file sources (Kafka, rate, memory) or on any failure."""
    try:
        plan = sdf._jdf.queryExecution().analyzed().toString()
        return _FILE_SOURCE_RE.findall(plan)
    except Exception:
        return []


def stream_shuffle_width(spark: SparkSession, sdf: DataFrame | None) -> int:
    """Micro-batch plan width for a test-sink stream run, sized from the
    staged source's on-disk bytes, floored at
    :data:`STREAM_SINK_SHUFFLE_PARTITIONS`.

    The round-13 decade probes showed the fixed default (1 — correct for
    KB-sized fixture batches where per-state-store overhead dominates) is
    a fixture knob, not a deployment posture: at x100 it serialized
    5.5 M-row merge joins on one core and the probes had to hand-set
    ``SG_STREAM_SINK_SHUFFLE=32``. This helper applies the
    ``state_file_count`` discipline to the PLAN width: below
    :data:`STREAM_WIDTH_GATE_BYTES` of staged source (every fixture SF —
    a driver-side Hadoop FS call, no Spark job) it returns the floor and
    micro-batch plans are byte-identical to the floored ones; above it,
    the width targets ~:data:`STREAM_TARGET_TASK_SOURCE_BYTES` of source
    parquet per task, capped at :data:`STREAM_WIDTH_MAX`. Multiple file
    sources (stream-stream joins) sum their bytes. Results are
    width-invariant for every operator that runs under it
    (``tests/test_knob_invariance.py``), so this trades only per-store
    fixed cost against per-task volume."""
    floor = STREAM_SINK_SHUFFLE_PARTITIONS
    total = stream_source_bytes(sdf) or 0
    if total < STREAM_WIDTH_GATE_BYTES:
        return floor
    import math

    return max(
        floor, min(STREAM_WIDTH_MAX, math.ceil(total / STREAM_TARGET_TASK_SOURCE_BYTES))
    )


# One implementation of the Hadoop getContentSummary pricing call for the
# whole package (round-14 advice: this module carried a byte-identical
# copy). Kept under the private name existing callers/probes use.
from scylladb_redpanda_cdc_spark.operators.scale import (  # noqa: E402
    fs_bytes as _fs_bytes,
)

#: Target on-disk parquet bytes per file for foreachBatch STATE writes.
#: 32 MB of parquet ≈ 100-150 MB of in-flight rows per write task — small
#: enough to bound task memory, large enough to keep file counts sane.
STATE_TARGET_FILE_BYTES = int(
    os.environ.get("SG_STATE_TARGET_FILE_BYTES", str(32 * 1024 * 1024))
)


def _uri_to_local(path: str) -> str:
    """file:///x and file:/x both normalize to /x (non-file URIs pass
    through unchanged)."""
    if path.startswith("file:"):
        path = path[len("file:"):]
        while path.startswith("//"):
            path = path[1:]
    return path


def batch_source_bytes(checkpoint_dir: str, batch_id: int) -> int:
    """On-disk bytes of the files a FileStreamSource admitted at
    ``batch_id``, read from the stream's checkpoint source log
    (``<ckpt>/sources/<i>/<batch_id>`` — one JSON line per file) —
    driver-side metadata only, ``0`` when unpriceable (non-file sources,
    compacted-away or missing log entries). The ``batch_df`` a
    ``foreachBatch`` body receives is a bare LogicalRDD and exposes no
    file metadata, so the checkpoint log is the authoritative record of
    the batch's contribution; the foreachBatch state writers size their
    state-version writes with it (prev + batch — VERDICT r15 task 1)."""
    import glob as _glob
    import json as _json

    total = 0
    try:
        for srcdir in _glob.glob(os.path.join(checkpoint_dir, "sources", "*")):
            logf = os.path.join(srcdir, str(batch_id))
            entries = []
            if os.path.isfile(logf):
                with open(logf, encoding="utf-8") as fh:
                    entries = [
                        _json.loads(ln)
                        for ln in fh
                        if ln.lstrip().startswith("{")
                    ]
            else:  # compacted log: entries carry their batchId
                compact = os.path.join(srcdir, f"{batch_id}.compact")
                if os.path.isfile(compact):
                    with open(compact, encoding="utf-8") as fh:
                        entries = [
                            e
                            for ln in fh
                            if ln.lstrip().startswith("{")
                            for e in (_json.loads(ln),)
                            if e.get("batchId") == batch_id
                        ]
            for e in entries:
                path = _uri_to_local(e.get("path", ""))
                try:
                    total += os.path.getsize(path)
                except OSError:
                    pass
    except Exception:
        return 0
    return total


def state_file_count(
    spark: SparkSession,
    prev_path: str | None,
    floor: int,
    extra_bytes: int = 0,
    prev_bytes: int | None = None,
) -> int:
    """Partition count for a foreachBatch state-version write: target
    ~:data:`STATE_TARGET_FILE_BYTES` of parquet per file, estimated from
    the PREVIOUS version's on-disk size PLUS the arriving batch's
    contribution (``extra_bytes`` — the batch's priced source bytes, see
    :func:`batch_input_bytes`), floored at the caller's fixed count so
    fixture-scale plans and floors stay byte-identical.

    Round 16 (VERDICT r15 task 1): sizing from the previous version ALONE
    lags the written size by one batch — bounded ≤2× under steady drains,
    but the r14 ×1000 s22 drill measured the v2 write at 302 MB/task
    because it was sized from v1 (~2/3 of the final state) during a
    3-batch full-history catch-up. prev + batch bounds the estimate from
    ABOVE the written size (the merge never emits more than state ∪
    batch), so the write task volume stays ≤ the per-file target at any
    drain shape; the cost of an over-estimate is only smaller files.

    ``prev_bytes``: callers that already track the previous version's
    on-disk size (priced once per write) pass it here and no filesystem
    call is made; ``None`` keeps the old behavior of pricing
    ``prev_path`` via the Hadoop FS API.

    Why not a bare ``coalesce(floor)``: coalesce propagates UP the
    physical plan — it caps the parallelism of the entire final merge
    stage, not just the file count. The round-13 ×100 decade-3 probe
    measured that collapse as a 643 MB single task on s17's state merge
    (16 tasks each dragging state/16 of join+union work); another decade
    would put one task past executor memory. Sizing the count from the
    state's actual bytes keeps per-task volume bounded at ANY corpus
    size while file count stays proportional to data — the "target file
    SIZE" rule real lakehouse writers use. The Hadoop FS API prices
    HDFS/S3 state dirs the same way as local ones; on any failure the
    floor is returned (never wrong, merely small)."""
    nbytes = int(extra_bytes or 0)
    if prev_bytes is not None:
        nbytes += prev_bytes
    elif prev_path:
        try:
            jvm = spark._jvm
            p = jvm.org.apache.hadoop.fs.Path(prev_path)
            fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
            nbytes += fs.getContentSummary(p).getLength()
        except Exception:
            return floor
    if nbytes <= 0:
        return floor
    import math

    return max(floor, min(4096, math.ceil(nbytes / STATE_TARGET_FILE_BYTES)))


def state_merge_width(
    spark: SparkSession,
    prev_path: str | None,
    prev_bytes: int | None = None,
) -> int | None:
    """Per-BATCH plan width for a foreachBatch state merge, sized from the
    PREVIOUS state version's on-disk bytes — or ``None`` when the ambient
    width already suffices (the caller then changes nothing).

    :func:`stream_shuffle_width` sizes the whole stream run from the
    staged SOURCE bytes, but a merge batch's touched-key recompute (s22's
    history re-lead, s10/s17's affected-key compaction) shuffles volume
    that tracks the accumulated STATE, not the arriving micro-batch — the
    round-14 ×1000 drill measured a 302 MB task in s22's re-lead stage
    under the source-sized width (VERDICT r14 task 3). Under the
    availableNow test harness the ambient width is already sized from the
    FULL staged source, which bounds the state from above, so this guard
    cannot fire there (round-16 attribution); it exists for the
    continuous-trigger deployment posture, where the session width is a
    fixed cluster conf and a standing state outgrows it during catch-up.
    Same gate discipline as every sizing guard: below
    :data:`STREAM_WIDTH_GATE_BYTES` of state (every fixture SF) this
    returns ``None`` and micro-batch plans stay byte-identical to the
    floored ones; above it, the width targets
    ~:data:`STREAM_TARGET_TASK_SOURCE_BYTES` of state parquet per task
    (the same ~4× in-flight expansion estimate), capped at
    :data:`STREAM_WIDTH_MAX`, and is returned only when it beats the
    ambient ``spark.sql.shuffle.partitions``. Results are width-invariant
    for every merge that runs under it (``tests/test_knob_invariance.py``
    pins the stream family), so this trades only task volume against
    per-task overhead.

    ``prev_bytes`` (round 16): callers that track the previous version's
    size (priced once per write) pass it and NO per-batch filesystem call
    is made — the round-15 form paid one ``getContentSummary`` per
    micro-batch in five stream kernels for a guard that is dormant at
    every fixture SF."""
    if prev_bytes is None:
        if not prev_path:
            return None
        prev_bytes = _fs_bytes(spark, prev_path)
    if prev_bytes is None or prev_bytes < STREAM_WIDTH_GATE_BYTES:
        return None
    import math

    n = min(
        STREAM_WIDTH_MAX, math.ceil(prev_bytes / STREAM_TARGET_TASK_SOURCE_BYTES)
    )
    try:
        ambient = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except Exception:
        ambient = 200
    return n if n > ambient else None


@contextmanager
def scoped_state_merge_width(
    spark: SparkSession,
    prev_path: str | None,
    batch_session: SparkSession | None = None,
    prev_bytes: int | None = None,
):
    """``scoped_shuffle`` at :func:`state_merge_width`'s state-sized width
    for ONE merge batch's planning — a no-op (ambient width untouched)
    whenever the helper returns ``None``, i.e. at every fixture SF.

    ``batch_session`` (round 16, ADVICE r15): ``foreachBatch`` hands the
    body a ``batch_df`` bound to the stream's CLONED session, and an
    executed plan takes its shuffle width from the receiver Dataset's own
    session — so a width set only on the outer session never reaches
    batch-rooted plans (s14's classify write; s10/s22's merge unions that
    reference ``batch_df``). Pass ``batch_df.sparkSession`` and the width
    is scoped (set + restored) on BOTH sessions."""
    n = state_merge_width(spark, prev_path, prev_bytes=prev_bytes)
    if n is None:
        yield
        return
    with scoped_shuffle(spark, n):
        if batch_session is not None and batch_session is not spark:
            with scoped_shuffle(batch_session, n):
                yield
        else:
            yield


@contextmanager
def scoped_stream_shuffle(sdf: DataFrame):
    """:func:`scoped_shuffle` at the width :func:`stream_shuffle_width`
    derives from ``sdf``'s own staged file source(s) — the one entry point
    every stream-run helper uses, so a corpus-scale staged stream plans
    its micro-batches at a data-sized width with no hand-set knob."""
    spark = sdf.sparkSession
    with scoped_shuffle(spark, stream_shuffle_width(spark, sdf)):
        yield


@contextmanager
def scoped_shuffle(spark: SparkSession, n: int = -1):
    """Temporarily set ``spark.sql.shuffle.partitions`` while a test-sink
    stream runs to completion (availableNow is synchronous, so the scope
    covers all micro-batch planning), restoring the caller's value after."""
    if n < 0:
        n = STREAM_SINK_SHUFFLE_PARTITIONS
    key = "spark.sql.shuffle.partitions"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def run_to_table(sdf: DataFrame, mode: str = "append") -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; return the materialized batch DataFrame.

    ``mode``: "append" for row streams, "complete" for aggregations,
    "update" for stateful operators emitting per-key updates.
    """
    name = _fresh("sg_mem")
    with scoped_stream_shuffle(sdf):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return sdf.sparkSession.table(name)


def run_to_parquet(
    sdf: DataFrame, out_dir: str, checkpoint_dir: str, mode: str = "append"
) -> None:
    """Run a stream to completion into a parquet sink with an explicit
    checkpoint — the S2 resumability contract (reference
    connect-standalone.properties:4-5: offsets file + 10 s flush cadence;
    here: checkpointLocation + availableNow). Restarting with the same
    checkpoint reprocesses nothing (exactly-once within the sink)."""
    with scoped_stream_shuffle(sdf):
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
