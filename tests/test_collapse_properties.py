"""Property-based tests for the latest-state collapse (SURVEY §5.4).

The golden-sequence test pins a handful of hand-written cases; here
hypothesis drives arbitrary event interleavings (duplicate versions,
redeliveries, delete-then-reinsert, multi-key) against an independent
Python model of ReplacingMergeTree(ts_ms, sign) semantics.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_cdc_pipeline_docker_spark.operators.collapse import latest_state

# An event: (key, ts_ms, sign, payload)
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # few keys → dense collisions
        st.integers(min_value=0, max_value=8),    # few versions → ts ties
        st.sampled_from([1, -1]),
        st.integers(min_value=0, max_value=100),
    ),
    min_size=0,
    max_size=60,
)


def model_collapse(events):
    """Independent model: per key keep max (ts, sign) row — sign breaks
    version ties (+1 beats -1, matching the operator's deterministic
    tiebreak); drop the key if the winner is a delete.  Duplicate
    (key, ts, sign) rows must not affect the outcome (idempotence), and
    among exact duplicates the surviving payload is whichever sorts
    last — the operator guarantees *a* deterministic winner only when
    the ordering columns are unique, so the model compares payload sets
    only when the winner is unique."""
    state = {}
    for k, ts, sign, payload in events:
        cur = state.get(k)
        if cur is None or (ts, sign) >= (cur[0], cur[1]):
            # collect all rows tying on the max (ts, sign)
            if cur is not None and (ts, sign) == (cur[0], cur[1]):
                cur[2].add(payload)
            else:
                state[k] = [ts, sign, {payload}]
    return {
        k: (ts, sign, payloads)
        for k, (ts, sign, payloads) in state.items()
        if sign == 1
    }


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy)
def test_collapse_matches_model(spark, events):
    expected = model_collapse(events)
    df = spark.createDataFrame(
        events or [(0, 0, 1, 0)], ["id", "ts_ms", "sign", "payload"]
    )
    if not events:
        df = df.filter("id < 0")
    out = latest_state(df, key_cols=("id",)).collect()
    got = {r["id"]: (r["ts_ms"], r["sign"], r["payload"]) for r in out}
    assert set(got) == set(expected)
    for k, (ts, sign, payloads) in expected.items():
        gts, gsign, gpayload = got[k]
        assert (gts, gsign) == (ts, sign)
        assert gpayload in payloads


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy)
def test_collapse_idempotent_under_redelivery(spark, events):
    """collapse(log ∪ log) == collapse(log): at-least-once delivery can
    never change the collapsed state (H5)."""
    if not events:
        return
    df = spark.createDataFrame(events, ["id", "ts_ms", "sign", "payload"])
    doubled = df.unionAll(df)
    a = latest_state(df, key_cols=("id",)).select("id", "ts_ms", "sign").collect()
    b = latest_state(doubled, key_cols=("id",)).select("id", "ts_ms", "sign").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy)
def test_collapse_agg_matches_model(spark, events):
    """The max_by aggregate form satisfies the SAME independent model
    as the window form — incl. version ties, deletes, redelivery."""
    from realtime_cdc_pipeline_docker_spark.operators.collapse import (
        latest_state_agg,
    )

    expected = model_collapse(events)
    df = spark.createDataFrame(
        events or [(0, 0, 1, 0)], ["id", "ts_ms", "sign", "payload"]
    )
    if not events:
        df = df.filter("id < 0")
    out = latest_state_agg(df, key_cols=("id",)).collect()
    got = {r["id"]: (r["ts_ms"], r["sign"], r["payload"]) for r in out}
    assert set(got) == set(expected)
    for k, (ts, sign, payloads) in expected.items():
        gts, gsign, gpayload = got[k]
        assert (gts, gsign) == (ts, sign)
        assert gpayload in payloads


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy)
def test_collapse_agg_equals_window_under_total_order(spark, events):
    """With tiebreak_cols making the ordering TOTAL (payload last), the
    window and aggregate forms must return identical row sets — the
    exchangeability contract that lets callers pick the physical shape
    freely."""
    from realtime_cdc_pipeline_docker_spark.operators.collapse import (
        latest_state_agg,
    )

    if not events:
        return
    df = spark.createDataFrame(events, ["id", "ts_ms", "sign", "payload"])
    kw = dict(key_cols=("id",), tiebreak_cols=("payload",))
    a = sorted(map(tuple, latest_state(df, **kw).collect()))
    b = sorted(map(tuple, latest_state_agg(df, **kw).collect()))
    assert a == b


def test_collapse_agg_partial_combine_no_window(spark, sf_dir):
    """Plan contract for the aggregate form: exactly one exchange, no
    window sort, and a partial max_by BEFORE the exchange (map-side
    combine) — shuffle volume ~ distinct keys, not change-log rows."""
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.collapse import (
        latest_state_agg,
    )
    import pyspark.sql.functions as F

    log = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").cast("long").alias("ts_ms"),
        F.lit(1).alias("sign"),
        F.col("o_orderstatus").alias("status"),
    )
    plan = (
        latest_state_agg(log)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Window" not in plan
    head, _, _ = plan.partition("Exchange")
    # the post-exchange (final) aggregate appears above the exchange in
    # the printed tree; the partial one below it
    assert "max_by" in head
    _, _, tail = plan.partition("Exchange")
    # the map-side partial combine must sit BELOW the exchange — the
    # explicit partial-mode marker, not the (always-present) final agg
    assert "partial_max_by" in tail


def test_coalescing_upsert_interleaves_partial_updates(spark):
    from realtime_cdc_pipeline_docker_spark.operators.collapse import (
        coalescing_upsert,
    )

    rows = [
        # key 1: status set at v1, amount at v2, status corrected at v3
        (1, 1, "new", None), (1, 2, None, 10.0), (1, 3, "paid", None),
        # key 2: a column never set stays NULL
        (2, 1, "new", None),
        # key 3: later NULL does NOT erase an earlier value
        (3, 1, "shipped", 5.0), (3, 2, None, None),
    ]
    df = spark.createDataFrame(rows, "id int, ts int, status string, amount double")
    out = {
        r["id"]: (r["status"], r["amount"])
        for r in coalescing_upsert(
            df, ("id",), "ts", ("status", "amount")
        ).collect()
    }
    assert out == {1: ("paid", 10.0), 2: ("new", None), 3: ("shipped", 5.0)}


def test_coalescing_upsert_single_exchange_no_window(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.collapse import (
        coalescing_upsert,
    )
    import pyspark.sql.functions as F

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("ts_ms"),
        F.col("o_orderstatus").alias("status"),
    )
    plan = (
        coalescing_upsert(orders, ("id",), "ts_ms", ("status",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Window" not in plan
