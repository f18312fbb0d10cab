"""Reader for ``rpk topic consume`` capture files.

The reference's golden artifact (reference rpk_topic_consume.json:1-56) is
the console consumer's output: CONCATENATED pretty-printed JSON objects —
not JSONL, not a JSON array — each with the fixed six-field frame
``{topic, key, value, timestamp, partition, offset}``
(rpk_topic_consume.json:2-7). This module parses that format into the same
DataFrame shape the Kafka source produces, so the engine can replay a
captured topic byte-for-byte: capture file in, decoded change events and
materialized state out.

Scale note: captures are console diagnostics (KBs), so the object-splitting
runs driver-side by design; at volume the same records arrive through the
Kafka source (sources/kafka.py), which shares every downstream operator.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from scylladb_redpanda_cdc_spark.schemas import RECORD_SCHEMA


def parse_capture_text(text: str) -> list[dict]:
    """Split concatenated JSON objects (json.JSONDecoder.raw_decode walk)."""
    decoder = json.JSONDecoder()
    records, idx, n = [], 0, len(text)
    while idx < n:
        while idx < n and text[idx] in " \t\r\n":
            idx += 1
        if idx >= n:
            break
        obj, idx = decoder.raw_decode(text, idx)
        records.append(obj)
    return records


def read_rpk_capture(spark: SparkSession, path: str) -> DataFrame:
    """Capture file -> the six-field consumer frame (RECORD_SCHEMA), ready
    for decode_envelope/decode_key exactly like a live Kafka read."""
    with open(path, encoding="utf-8") as f:
        records = parse_capture_text(f.read())
    return spark.createDataFrame(records, RECORD_SCHEMA)
