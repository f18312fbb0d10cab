"""Property-based check of the SCD2 AS-OF read (hypothesis).

a32's contract (the reason SCD2 history exists): for ANY multiset of
events with unique per-key offsets and ANY as-of offset T, filtering the
lead()-built validity intervals at T yields exactly the state that
replaying and compacting the log truncated at T yields — each key's
latest c/u value at T, absent if the latest event at T is a delete or if
nothing happened yet. The a32 spec proves one derived T on the fixture;
this proves the interval algebra itself across random logs and random T
(including T before the first event, on a delete, and past the end).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

_event = st.tuples(
    st.integers(min_value=0, max_value=3),  # key
    st.sampled_from(["c", "u", "d"]),  # op
    st.integers(min_value=-50, max_value=50),  # payload
)


def _model_asof(events, t):
    """Reference: per key, the latest event at offset <= t; keep (key, val,
    valid_from) unless that event is a delete (or none exists)."""
    latest: dict[int, tuple] = {}
    for key, op, val, off in events:
        if off <= t and (key not in latest or off > latest[key][0]):
            latest[key] = (off, op, val)
    return {
        (k, val, off)
        for k, (off, op, val) in latest.items()
        if op != "d"
    }


def _spark_asof(spark, events, t):
    """a32's exact plan shape on a synthetic log: lead() intervals over the
    key, c/u rows only, then the interval filter at the literal t."""
    df = spark.createDataFrame(events, "key int, op string, val int, offset long")
    w = Window.partitionBy("key").orderBy("offset")
    hist = (
        df.withColumn("next_offset", F.lead("offset").over(w))
        .filter(F.col("op").isin("c", "u"))
        .select(
            "key",
            "val",
            F.col("offset").alias("valid_from"),
            (F.col("next_offset") - 1).alias("valid_to"),
        )
    )
    out = hist.filter(
        (F.col("valid_from") <= F.lit(t))
        & (F.col("valid_to").isNull() | (F.col("valid_to") >= F.lit(t)))
    )
    return {(r.key, r.val, r.valid_from) for r in out.collect()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evs=st.lists(_event, min_size=1, max_size=16),
    t_frac=st.integers(min_value=-1, max_value=17),
)
def test_interval_read_equals_replay_at_any_point(spark, evs, t_frac):
    events = [(k, op, v, i) for i, (k, op, v) in enumerate(evs)]
    t = t_frac  # ranges below the first offset (-1) and past the last
    got = _spark_asof(spark, events, t)
    want = _model_asof(events, t)
    assert got == want, (sorted(got), sorted(want), t)
