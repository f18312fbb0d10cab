"""Property-based tests for the as-of join family (b14 backward, b54
forward+tolerance) against a brute-force Python reference on random event
sets — the same strategy test_property_graph/test_property_compaction
apply to the CC and compaction kernels. The registry oracles prove the
fixture; these prove the SEMANTICS on adversarial shapes (ties, same-ts
events, empty sides, hot users)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

TOL_US = 86_400_000_000

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user_id (hot: few users)
        st.integers(min_value=0, max_value=10),  # ts bucket (hours)
        st.booleans(),  # is_purchase
    ),
    min_size=0,
    max_size=25,
)


def _frame(spark, rows):
    data = [
        (i, u, t * 3_600_000_000, "purchase" if p else "click")
        for i, (u, t, p) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts_us long, event_type string"
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "event_type",
    )


def _ref_backward(rows):
    """Latest click at-or-before each purchase, ties -> highest click id."""
    out = {}
    for i, (u, t, p) in enumerate(rows):
        if not p:
            continue
        best = None
        for j, (u2, t2, p2) in enumerate(rows):
            if p2 or u2 != u or t2 > t:
                continue
            if best is None or (t2, j) > (rows[best][1], best):
                best = j
        if best is not None:
            out[i] = best
    return out


def _ref_forward(rows):
    """Earliest purchase strictly after each click within TOL, ties ->
    lowest purchase id; clicks without a match map to None."""
    out = {}
    for i, (u, t, p) in enumerate(rows):
        if p:
            continue
        best = None
        for j, (u2, t2, p2) in enumerate(rows):
            if not p2 or u2 != u or t2 <= t:
                continue
            if (t2 - t) * 3_600_000_000 > TOL_US:
                continue
            if best is None or (t2, j) < (rows[best][1], best):
                best = j
        out[i] = best
    return out


@settings(max_examples=20, deadline=None)
@given(_events)
def test_backward_asof_matches_bruteforce(rows):
    from tests.conftest import SF_DIR
    from scylladb_redpanda_cdc_spark.session import get_session

    spark = get_session("scylladb-redpanda-cdc-spark-tests")
    e = _frame(spark, rows)
    # run the b14 logic inline on the synthetic frame (same algebra as
    # plans/batch_queries.b14_join_asof, parameterized by input)
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clk = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    from pyspark.sql import Window

    j = pur.join(
        clk,
        (pur.user_id == clk.c_user_id) & (clk.click_ts <= pur.purchase_ts),
        "inner",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("click_ts").desc(), F.col("click_id").desc()
    )
    got = {
        r["purchase_id"]: r["click_id"]
        for r in j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == _ref_backward(rows)


@settings(max_examples=20, deadline=None)
@given(_events)
def test_forward_asof_tolerance_matches_bruteforce(rows):
    from scylladb_redpanda_cdc_spark.session import get_session

    spark = get_session("scylladb-redpanda-cdc-spark-tests")
    e = _frame(spark, rows)
    clk = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    from pyspark.sql import Window

    j = clk.join(
        pur,
        (clk.user_id == pur.p_user_id)
        & (pur.purchase_ts > clk.click_ts)
        & (
            F.unix_micros(pur.purchase_ts.cast("timestamp"))
            - F.unix_micros(clk.click_ts.cast("timestamp"))
            <= TOL_US
        ),
        "left",
    )
    w = Window.partitionBy("click_id").orderBy(
        F.col("purchase_ts").asc_nulls_last(),
        F.col("purchase_id").asc_nulls_last(),
    )
    got = {
        r["click_id"]: r["purchase_id"]
        for r in j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == _ref_forward(rows)
