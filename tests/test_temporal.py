"""As-of join and range join semantics (SURVEY §2.K extension family).

The SQL oracles cover the fixture queries (k1/k2); here we pin the
operator semantics the oracle can't see: direction, tolerance,
duplicate-timestamp tie-breaks, NULL-key SQL-faithfulness, bucket
boundary cases, and the plan shape (equi-join, never a cross join).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.operators.temporal import asof_join, range_join

T = dt.datetime


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u", T(2024, 1, 1, 10)),
            (2, "u", T(2024, 1, 1, 12)),
            (3, "v", T(2024, 1, 1, 9)),
            (4, "w", T(2024, 1, 1, 9)),
            (5, None, T(2024, 1, 1, 9)),
        ],
        "event_id long, user string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "u", T(2024, 1, 1, 9)),
            (101, "u", T(2024, 1, 1, 11)),
            (102, "u", T(2024, 1, 1, 11)),  # duplicate ts -> tie-break
            (103, "v", T(2024, 1, 1, 9)),   # ts equal to left -> <= matches
            (104, None, T(2024, 1, 1, 8)),  # NULL key must never match
        ],
        "order_id long, user string, ts timestamp",
    )
    return left, right


def _ids(df):
    return {r["event_id"]: r["order_id"] for r in df.collect()}


def test_asof_backward_with_ties_and_nulls(spark):
    left, right = _frames(spark)
    got = _ids(asof_join(left, right, "user", "user", right_cols=["order_id"]))
    # 2 -> 102: at the winning timestamp the max tie-break wins
    # 3 -> 103: right ts == left ts matches (<=)
    # 4/5 -> None: no right rows for key / NULL key never matches
    assert got == {1: 100, 2: 102, 3: 103, 4: None, 5: None}


def test_asof_forward(spark):
    left, right = _frames(spark)
    got = _ids(
        asof_join(left, right, "user", "user", right_cols=["order_id"], direction="forward")
    )
    # 1 -> 101: least tie-break among duplicate ts; 2 -> None (nothing later)
    assert got == {1: 101, 2: None, 3: 103, 4: None, 5: None}


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    got = _ids(
        asof_join(
            left, right, "user", "user", right_cols=["order_id"], tolerance_seconds=1800
        )
    )
    # matches farther than 30 min resolve to NULL; only the exact-ts match survives
    assert got == {1: None, 2: None, 3: 103, 4: None, 5: None}


def test_asof_join_is_single_shuffle_no_join_node(spark):
    """The plan must be union + window — one Exchange on the key, no Join
    operator at all (the naive join+rank shape explodes pairs)."""
    left, right = _frames(spark)
    plan = asof_join(left, right, "user", "user", right_cols=["order_id"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_boundaries_and_multi_bucket_span(spark):
    left = spark.createDataFrame(
        [
            (1, "u", T(2024, 1, 1, 9, 30)),   # == interval start: inclusive
            (2, "u", T(2024, 1, 1, 12, 30)),  # == interval end: inclusive
            (3, "u", T(2024, 1, 1, 12, 30, 1)),  # 1s past end: out
            (4, "u", T(2024, 1, 1, 11, 0)),   # interior, different bucket than start
            (5, "x", T(2024, 1, 1, 11, 0)),   # wrong key
        ],
        "event_id long, user string, ts timestamp",
    )
    # 3-hour interval spans 4 hourly buckets
    right = spark.createDataFrame(
        [(7, "u", T(2024, 1, 1, 9, 30), T(2024, 1, 1, 12, 30))],
        "incident long, user string, t0 timestamp, t1 timestamp",
    )
    out = range_join(
        left, right, "ts", "t0", "t1", left_on=["user"], right_on=["user"],
        bucket_seconds=3600,
    )
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 4]
    # each match appears exactly once despite the interval covering 4 buckets
    assert out.count() == out.select("event_id").distinct().count()


def test_range_join_plan_is_equi_join(spark):
    left, right = _frames(spark)
    ivl = right.select(
        "order_id", "user", F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("t1"),
    )
    plan = range_join(
        left, ivl, "ts", "t0", "t1", left_on=["user"], right_on=["user"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_trailing_events_join_horizon_and_rank(spark):
    """Planted: ranks select the k most-recent strictly-before events,
    the horizon excludes older ones, same-ts ties break by event_id
    DESC, and probes with no history emit nothing."""
    from datetime import datetime

    from realtime_cdc_pipeline_docker_spark.operators.temporal import (
        trailing_events_join,
    )

    ev = spark.createDataFrame(
        [
            (1, 10, datetime(2026, 1, 1)),
            (2, 10, datetime(2026, 1, 3)),
            (3, 10, datetime(2026, 1, 5)),
            (4, 10, datetime(2026, 1, 5)),    # tie with 3 -> id DESC first
            (5, 10, datetime(2026, 1, 20)),   # the probe
            (6, 10, datetime(2025, 12, 1)),   # outside 7-day horizon of nothing
            (7, 99, datetime(2026, 1, 19)),   # other user
        ],
        "event_id long, user_id long, ts timestamp",
    )
    probes = ev.filter("event_id = 5").select(
        ev.event_id.alias("probe_event_id"),
        ev.user_id.alias("probe_user_id"),
        ev.ts.alias("probe_ts"),
    )
    # horizon 30 days: events 1-4 eligible; k=3 keeps 4,3,2 (ts DESC, id DESC)
    out = trailing_events_join(
        probes, ev, k=3, horizon_days=30,
        probe_key="probe_user_id", probe_ts="probe_ts",
        event_cols=("event_id",),
    )
    got = [(r["hist_rank"], r["event_id"]) for r in
           out.orderBy("hist_rank").collect()]
    assert got == [(1, 4), (2, 3), (3, 2)]

    # horizon 3 days: only the 1/5 pair... nothing within 3 days of 1/20
    out2 = trailing_events_join(
        probes, ev, k=3, horizon_days=3,
        probe_key="probe_user_id", probe_ts="probe_ts",
        event_cols=("event_id",),
    )
    assert out2.count() == 0


def test_trailing_events_join_duplicate_probes_keep_own_history(spark):
    """VERDICT r9 #3: duplicate probe ROWS must each keep their own
    independent trailing-k history — the old full-row rank partition
    merged them into one interleaved sequence (the first duplicate got
    ranks 1..k, the second got k+1..2k and was filtered away)."""
    from datetime import datetime

    from realtime_cdc_pipeline_docker_spark.operators.temporal import (
        trailing_events_join,
    )

    ev = spark.createDataFrame(
        [
            (1, 10, datetime(2026, 1, 1)),
            (2, 10, datetime(2026, 1, 3)),
            (3, 10, datetime(2026, 1, 5)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    one = spark.createDataFrame(
        [(10, datetime(2026, 1, 10))],
        "probe_user_id long, probe_ts timestamp",
    )
    probes = one.union(one)  # two IDENTICAL probe rows
    out = trailing_events_join(
        probes, ev, k=2, horizon_days=30,
        probe_key="probe_user_id", probe_ts="probe_ts",
        event_cols=("event_id",),
    )
    rows = [(r["hist_rank"], r["event_id"]) for r in out.collect()]
    # each duplicate independently ranks (1, ev3), (2, ev2) -> 4 rows
    assert sorted(rows) == [(1, 3), (1, 3), (2, 2), (2, 2)]

    # and a caller-named unique probe id partitions by THAT column
    keyed = spark.createDataFrame(
        [(100, 10, datetime(2026, 1, 10)), (200, 10, datetime(2026, 1, 10))],
        "pid long, probe_user_id long, probe_ts timestamp",
    )
    out2 = trailing_events_join(
        keyed, ev, k=2, horizon_days=30,
        probe_key="probe_user_id", probe_ts="probe_ts",
        event_cols=("event_id",), probe_id="pid",
    )
    per_pid = {(r["pid"], r["hist_rank"]): r["event_id"] for r in out2.collect()}
    assert per_pid == {(100, 1): 3, (100, 2): 2, (200, 1): 3, (200, 2): 2}
