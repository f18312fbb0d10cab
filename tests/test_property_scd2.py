"""Property-based check of the incremental SCD2 merge (hypothesis).

foreachbatch_scd2's contract (S22 / SURVEY §4.4 applied to history): for
ANY multiset of events with unique per-key offsets, merging them in ANY
micro-batch partitioning yields the same version table as the one-pass
batch build (A30): each c/u event opens a version at its offset, the
key's next event closes it at next_offset-1, the last event leaves it
open unless it is a delete. Hypothesis drives random event sets and
random batch splits against a 15-line Python reference model, exercising
the compact step's cross-batch close/reopen paths directly (the s22 spec
proves one fixed 3-file split; this proves the invariant itself).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_event = st.tuples(
    st.integers(min_value=0, max_value=3),  # key
    st.sampled_from(["c", "u", "d"]),  # op
    st.integers(min_value=-50, max_value=50),  # payload
)


def _model(events):
    """Reference SCD2: per key, sort events by offset; c/u rows become
    versions closed by the next event's offset - 1."""
    per_key: dict[int, list] = {}
    for key, op, val, off in events:
        per_key.setdefault(key, []).append((off, op, val))
    out = set()
    for key, evs in per_key.items():
        evs.sort()
        for i, (off, op, val) in enumerate(evs):
            if op == "d":
                continue
            nxt = evs[i + 1][0] if i + 1 < len(evs) else None
            out.add(
                (key, val, off, None if nxt is None else nxt - 1, nxt is None)
            )
    return out


def _run_incremental(spark, events, cut_points):
    """Apply the scd2 compact step batch-by-batch exactly as
    foreachbatch_scd2 does, without the streaming machinery (the
    micro-batch split is the property under test, not the transport)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    key_cols = ["key"]

    def compact(df):
        w = Window.partitionBy(*key_cols).orderBy("offset")
        return (
            df.drop("next_offset")
            .dropDuplicates([*key_cols, "offset"])
            .withColumn("next_offset", F.lead("offset").over(w))
        )

    state = None
    bounds = [0, *cut_points, len(events)]
    for lo, hi in zip(bounds, bounds[1:]):
        batch = events[lo:hi]
        if not batch:
            continue
        bdf = compact(
            spark.createDataFrame(
                batch, "key int, op string, val int, offset long"
            )
        )
        if state is None:
            state = bdf
        else:
            keys = bdf.select(*key_cols).dropDuplicates(key_cols)
            untouched = state.join(keys, key_cols, "left_anti")
            touched = state.join(keys, key_cols, "left_semi")
            state = untouched.unionByName(
                compact(touched.unionByName(bdf))
            )
        state = state.localCheckpoint(eager=True)
    assert state is not None
    return {
        (r.key, r.val, r.offset, r.next_offset and r.next_offset - 1,
         r.next_offset is None)
        for r in state.filter(F.col("op").isin("c", "u")).collect()
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evs=st.lists(_event, min_size=1, max_size=16),
    seed=st.randoms(),
    n_cuts=st.integers(min_value=0, max_value=3),
)
def test_incremental_scd2_matches_batch_model_any_split(spark, evs, seed, n_cuts):
    events = [(k, op, v, i) for i, (k, op, v) in enumerate(evs)]
    seed.shuffle(events)  # arrival order != offset order within a batch
    cuts = sorted(
        seed.sample(range(1, len(events)), min(n_cuts, len(events) - 1))
    ) if len(events) > 1 else []
    got = _run_incremental(spark, events, cuts)
    want = {
        (k, v, off, closed, cur)
        for (k, v, off, closed, cur) in _model(events)
    }
    assert got == want, (sorted(got), sorted(want), cuts)
