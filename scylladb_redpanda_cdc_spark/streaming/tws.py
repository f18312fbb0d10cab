"""Spark 4 ``transformWithStateInPandas`` operators (environment-gated).

The arbitrary-stateful-processing surface has two generations: the
``applyInPandasWithState`` API (S11, ``streaming/ops.py`` — runs
everywhere) and Spark 4's ``StatefulProcessor``/``transformWithState``
API, whose Python WORKER speaks a protobuf state-server protocol and
therefore needs the ``google.protobuf`` package at RUNTIME. That package
is absent in this sandbox (and installs are out of scope), so the
streaming execution path runs only where protobuf exists —
``tests/test_transform_with_state.py`` drives it under
``pytest.importorskip`` (the same honesty contract as the Kafka broker
path, ``tests/test_kafka_live.py``).

Importing ``StatefulProcessor`` itself needs no protobuf, so the
processor LOGIC is a module-level class and :func:`drive_locally` runs
the REAL instance lifecycle (one processor per partition, ``init`` once,
``handleInputRows`` per (key, micro-batch) with the handle's implicit
grouping key switched per call, ``close`` once) against
:class:`LocalStatefulHandle` — a minimal in-memory twin of the
state-server handle covering exactly the slice this processor uses
(``getValueState`` → exists/get/update/clear, key-scoped). That upgrades
the processor semantics from import-skipped to sandbox-verified
(``tests/test_transform_with_state.py::test_local_lifecycle_*``,
including the shared-``self``-across-keys hazard the per-key-instance
round-9 harness could not see); only the wire protocol remains
environment-gated.

Semantics: per-key running aggregate with explicit ValueState — the
transformWithState restatement of S11's running-state operator, so the
two APIs are directly comparable on identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StructField, StructType

_STATE_SCHEMA = StructType([StructField("n", LongType())])


def tws_available() -> bool:
    """True iff the transformWithState Python runtime can start here."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


class LocalValueState:
    """In-memory twin of the state-server ValueState: exists/get/update/
    clear — the exact call surface :class:`RunningCountProcessor` uses.
    Like the real state client, reads and writes implicitly target the
    handle's CURRENT grouping key (the runtime sets it before each
    ``handleInputRows`` call), so ONE state object obtained at ``init``
    time serves every key the processor instance later sees. No wire
    protocol, no TTL, no timers; a sandbox harness, not a
    reimplementation of the state store."""

    def __init__(self, handle: "LocalStatefulHandle", name: str) -> None:
        self._handle = handle
        self._name = name

    def _slot(self) -> tuple:
        return (self._name, self._handle._current_key)

    def exists(self) -> bool:
        return self._slot() in self._handle._data

    def get(self) -> tuple | None:
        return self._handle._data.get(self._slot())

    def update(self, value: tuple) -> None:
        self._handle._data[self._slot()] = tuple(value)

    def clear(self) -> None:
        self._handle._data.pop(self._slot(), None)


class LocalStatefulHandle:
    """Minimal StatefulProcessorHandle stand-in: hands out named
    :class:`LocalValueState` views whose storage is keyed by
    ``(state name, current grouping key)`` — the real API's implicit
    key scoping, where ``init`` runs ONCE per processor instance and the
    same ValueState object is reused across keys. ``set_implicit_key``
    is the harness-side twin of the runtime's per-group key switch."""

    def __init__(self) -> None:
        self._states: dict[str, LocalValueState] = {}
        self._data: dict[tuple, tuple] = {}
        self._current_key: tuple | None = None

    def set_implicit_key(self, key: tuple | None) -> None:
        self._current_key = key

    def getValueState(self, name: str, schema) -> LocalValueState:  # noqa: N802
        return self._states.setdefault(name, LocalValueState(self, name))


class RunningCountProcessor(StatefulProcessor):
    """Per-key running event count: ValueState("n") accumulates across
    micro-batches; each batch emits (key, n_so_far)."""

    def __init__(self, key_field: str = "user_id") -> None:
        self._key_field = key_field

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._n = handle.getValueState("n", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):  # noqa: N802
        import pandas as pd

        total = sum(len(pdf) for pdf in rows)
        prev = self._n.get()[0] if self._n.exists() else 0
        self._n.update((prev + total,))
        yield pd.DataFrame(
            {self._key_field: [key[0]], "n_events": [prev + total]}
        )

    def close(self) -> None:
        pass


def drive_locally(
    make_processor, batches: list[list[tuple[tuple, object]]]
) -> list:
    """Run the StatefulProcessor LIFECYCLE without the protobuf state
    server, on the REAL API's instance model (round-11; the round-10
    harness shared one instance across ALL micro-batches, so per-key
    data cached on ``self`` survived longer here than on the real
    engine): the real transformWithState runtime re-instantiates the
    processor per (partition, micro-batch) TASK, so this harness builds
    a FRESH processor and calls ``init`` for every micro-batch, with
    ``close`` at each batch's end. Only the :class:`LocalStatefulHandle`
    — the state store — is shared across batches; within a batch the
    handle's implicit grouping key switches before every
    ``handleInputRows`` call, so ValueState reads/writes are key-scoped
    while ``self`` is shared across keys (the worker-side contract).
    Net: state persists across micro-batches ONLY via ValueState — a
    processor caching batch-spanning data on ``self`` loses it at the
    batch boundary, here and in production. Returns the concatenated
    emitted frames in emission order.

    ``batches`` is a list of micro-batches; each micro-batch is a list of
    ``(key_tuple, pandas_batch)`` pairs. ``make_processor`` builds each
    (partition, micro-batch) task's processor instance."""
    handle = LocalStatefulHandle()
    out: list = []
    for batch in batches:
        proc = make_processor()
        proc.init(handle)
        for key, pdf in batch:
            handle.set_implicit_key(key)
            out.extend(proc.handleInputRows(key, iter([pdf]), None))
        handle.set_implicit_key(None)
        proc.close()
    return out


def running_count_per_key(grouped_stream, key_field: str = "user_id") -> DataFrame:
    """Per-key running event count via Spark 4's StatefulProcessor.

    ``grouped_stream`` is a streaming ``GroupedData`` (``df.groupBy(key)``).
    Returns the Update-mode stream of (key, n_so_far) rows. Requires
    ``google.protobuf`` (see module docstring); callers should check
    :func:`tws_available` first.
    """
    out_schema = StructType(
        [StructField(key_field, LongType()), StructField("n_events", LongType())]
    )
    return grouped_stream.transformWithStateInPandas(
        RunningCountProcessor(key_field),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
