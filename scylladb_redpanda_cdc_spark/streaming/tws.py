"""Spark 4 ``transformWithStateInPandas`` operators (environment-gated).

The arbitrary-stateful-processing surface has two generations: the
``applyInPandasWithState`` API (S11, ``streaming/ops.py`` — runs
everywhere) and Spark 4's ``StatefulProcessor``/``transformWithState``
API, whose Python worker speaks a protobuf state-server protocol and
therefore needs the ``google.protobuf`` package at RUNTIME. That package
is absent in this sandbox (and installs are out of scope), so these
operators are code-complete but execute only where protobuf exists —
``tests/test_transform_with_state.py`` runs them under
``pytest.importorskip`` (the same honesty contract as the Kafka broker
path, ``tests/test_kafka_live.py``).

Semantics: per-key running aggregate with explicit ValueState — the
transformWithState restatement of S11's running-state operator, so the
two APIs are directly comparable on identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def tws_available() -> bool:
    """True iff the transformWithState Python runtime can start here."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def running_count_per_key(grouped_stream, key_field: str = "user_id") -> DataFrame:
    """Per-key running event count via Spark 4's StatefulProcessor.

    ``grouped_stream`` is a streaming ``GroupedData`` (``df.groupBy(key)``).
    Returns the Update-mode stream of (key, n_so_far) rows. Requires
    ``google.protobuf`` (see module docstring); callers should check
    :func:`tws_available` first.
    """
    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField(key_field, LongType()), StructField("n_events", LongType())]
    )
    state_schema = StructType([StructField("n", LongType())])

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            total = sum(len(pdf) for pdf in rows)
            prev = self._n.get()[0] if self._n.exists() else 0
            self._n.update((prev + total,))
            yield pd.DataFrame({key_field: [key[0]], "n_events": [prev + total]})

        def close(self) -> None:
            pass

    return grouped_stream.transformWithStateInPandas(
        RunningCount(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
