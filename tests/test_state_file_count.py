"""state_file_count sizes foreachBatch state writes by bytes.

The round-13 ×100 probe showed a fixed ``coalesce(16)`` collapsing s17's
whole merge stage (one 643 MB task at decade 3); the fix targets
~STATE_TARGET_FILE_BYTES of parquet per file, estimated from the previous
state version's on-disk size. This file pins the helper's contract:
fixture-scale writes keep the caller's floor (plans and floors stay
byte-identical), the count grows proportionally once the state exceeds
the target, errors degrade to the floor (never wrong, merely small), and
the 4096 cap bounds file-count explosions.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from scylladb_redpanda_cdc_spark.streaming import core


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def test_no_previous_version_returns_floor(spark):
    assert core.state_file_count(spark, None, 16) == 16
    assert core.state_file_count(spark, "", 4) == 4


def test_missing_path_degrades_to_floor(spark, tmp_path):
    missing = str(tmp_path / "never-written")
    assert core.state_file_count(spark, missing, 8) == 8


def test_fixture_scale_state_keeps_floor(spark, tmp_path):
    """A state version far under the per-file target must return exactly
    the caller's floor — this is what keeps fixture-scale plans (and the
    recorded floors) byte-identical to the pre-helper constants."""
    p = str(tmp_path / "v0")
    spark.range(100).write.parquet(p)
    assert core.state_file_count(spark, p, 16) == 16


def test_count_scales_with_state_bytes(spark, tmp_path, monkeypatch):
    """Once the previous version exceeds the target, the count is
    ceil(bytes/target) — proportional to data, not a fixed cap."""
    p = str(tmp_path / "v1")
    spark.range(5000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("h")
    ).write.parquet(p)
    nbytes = _dir_bytes(p)
    assert nbytes > 0
    # Hadoop's getContentSummary counts the same files os.walk sees
    # (plus _SUCCESS, which os.path.getsize also sees — both local).
    monkeypatch.setattr(core, "STATE_TARGET_FILE_BYTES", max(1, nbytes // 3))
    got = core.state_file_count(spark, p, 1)
    assert 3 <= got <= 5  # ceil(n / (n//3)) with rounding slack
    # the floor still wins when it is larger than the byte-derived count
    assert core.state_file_count(spark, p, 64) == 64


def test_count_is_capped_at_4096(spark, tmp_path, monkeypatch):
    p = str(tmp_path / "v2")
    spark.range(1000).write.parquet(p)
    monkeypatch.setattr(core, "STATE_TARGET_FILE_BYTES", 1)
    assert core.state_file_count(spark, p, 4) == 4096
