"""Property-based check of the compaction kernel (hypothesis).

materialize_latest is the engine's semantic core (A6/A9/A10/S10). Its
contract: for ANY multiset of events with unique offsets, the state is the
per-key maximum-offset event, with keys whose final event is a delete
removed — regardless of input order (offset authority, SURVEY.md §4.4:
op codes lie, offsets don't). Hypothesis drives randomized workloads
against a 10-line Python reference model.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from scylladb_redpanda_cdc_spark.operators.cdc import materialize_latest

_event = st.tuples(
    st.integers(min_value=0, max_value=4),  # key
    st.sampled_from(["c", "u", "d"]),  # op
    st.integers(min_value=-100, max_value=100),  # payload
)


def _model(events):
    latest = {}
    for key, op, val, off in events:
        if key not in latest or off > latest[key][1]:
            latest[key] = ((op, val), off)
    return {
        k: (op_val[1])
        for k, (op_val, _) in latest.items()
        if op_val[0] != "d"
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=st.lists(_event, min_size=1, max_size=30), seed=st.randoms())
def test_compaction_matches_model_any_order(spark, evs, seed):
    # unique offsets in arrival order, then shuffle arrival
    events = [(k, op, v, i) for i, (k, op, v) in enumerate(evs)]
    seed.shuffle(events)
    df = spark.createDataFrame(
        events, "key int, op string, val int, offset long"
    )
    got = {
        r["key"]: r["val"]
        for r in materialize_latest(df, ["key"]).collect()
    }
    assert got == _model(events)
