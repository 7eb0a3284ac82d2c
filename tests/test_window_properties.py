"""Property-based tests for the round-5 window operators (SURVEY §5.4
strategy applied to new surface): hypothesis drives arbitrary interval
layouts against an independent Python interval-merge model (k5), and
arbitrary value series against a brute-force trailing-window statistics
model (e15)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

T0 = datetime.datetime(2024, 1, 1)


# ---------------------------------------------------------------------------
# k5: interval coalescing == classic sweep-line merge
# ---------------------------------------------------------------------------

starts_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # few users → dense overlap
        st.integers(min_value=0, max_value=300),    # start minute
    ),
    min_size=0,
    max_size=25,
)


def model_merge(starts_by_user, width=60):
    """Sweep-line merge of [s, s+width] intervals per user."""
    out = {}
    for uid, mins in starts_by_user.items():
        islands = []
        for s in sorted(mins):
            s0, s1 = s, s + width
            if islands and s0 <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], s1)
                islands[-1][2] += 1
            else:
                islands.append([s0, s1, 1])
        out[uid] = [tuple(i) for i in islands]
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(starts=starts_strategy)
def test_interval_coalesce_matches_sweep_line_model(spark, starts):
    from pyspark.sql import Window

    if not starts:
        return
    rows = [
        (i, T0 + datetime.timedelta(minutes=m), uid)
        for i, (uid, m) in enumerate(starts)
    ]
    inc = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    ).select(
        "event_id",
        "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t1"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("t0", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t0", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got_rows = (
        inc.withColumn(
            "new_island",
            F.when(F.col("t0") > F.max("t1").over(w_prev), 1).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
        .groupBy("user_id", "island")
        .agg(
            F.min("t0").alias("s"),
            F.max("t1").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    got = {}
    for r in got_rows:
        got.setdefault(r["user_id"], []).append(
            (r["island"], r["s"], r["e"], r["n"])
        )
    starts_by_user = {}
    for uid, m in starts:
        starts_by_user.setdefault(uid, []).append(m)
    want = model_merge(starts_by_user)
    for uid, islands in want.items():
        got_islands = sorted(got.get(uid, []))
        assert len(got_islands) == len(islands)
        for (isl, s, e, n), (ws, we, wn) in zip(got_islands, islands):
            assert s == T0 + datetime.timedelta(minutes=ws)
            assert e == T0 + datetime.timedelta(minutes=we)
            assert n == wn


# ---------------------------------------------------------------------------
# e15: cross-multiplied integer z-score test == brute-force float model
# ---------------------------------------------------------------------------

series_strategy = st.lists(
    st.integers(min_value=0, max_value=2_000_000),  # 4-dec fixed-point units
    min_size=0,
    max_size=40,
)


def model_flags(values, lookback=20, min_n=8, z2=9):
    """Brute-force trailing-window z-test over exact integers (python
    ints never overflow, so this is the ground truth the BIGINT
    cross-multiplication must match)."""
    flagged = []
    for i, x in enumerate(values):
        win = values[max(0, i - lookback) : i]
        n = len(win)
        if n < min_n:
            continue
        s1, s2 = sum(win), sum(v * v for v in win)
        if (n * x - s1) ** 2 * (n - 1) > z2 * n * (n * s2 - s1 * s1):
            flagged.append(i)
    return flagged


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=series_strategy)
def test_zscore_matches_bruteforce_model(spark, values):
    from pyspark.sql import Window

    if not values:
        return
    rows = [
        (i, T0 + datetime.timedelta(minutes=i), v) for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, v_u long")
    w = Window.partitionBy(F.lit(1)).orderBy("ts", "event_id").rowsBetween(-20, -1)
    s = df.select(
        "event_id",
        "v_u",
        F.count("v_u").over(w).alias("n"),
        F.coalesce(F.sum("v_u").over(w), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("v_u") * F.col("v_u")).over(w), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    n, v, s1, s2 = F.col("n"), F.col("v_u"), F.col("s1"), F.col("s2")
    dev = n * v - s1
    got = sorted(
        r["event_id"]
        for r in s.filter(
            (n >= 8) & (dev * dev * (n - 1) > F.lit(9) * n * (n * s2 - s1 * s1))
        ).collect()
    )
    assert got == model_flags(values)
