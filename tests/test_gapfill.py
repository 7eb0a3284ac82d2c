"""Gap-fill / LOCF and transition-matrix semantics on planted fixtures
(plans/events_queries.py: e13_gapfill_interpolate, e14_transition_matrix).
Driver-sim covers oracle parity; these pin the SEMANTICS on shapes the
fixture may not contain (multi-day gaps, span edges, absorbing states).
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.plans.events_queries import (
    e13_gapfill_interpolate,
    e14_transition_matrix,
)


def _write_events(spark, rows):
    # rows: (event_id, ts, user_id, event_type, value)
    d = tempfile.mkdtemp(prefix="gapfill_")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).withColumn("props", F.lit("{}")).write.mode("overwrite").parquet(
        d + "/events.parquet"
    )
    return d


def test_gapfill_plants_missing_days_and_carries_forward(spark):
    ts = lambda day, h=12: dt.datetime(2024, 3, day, h, 0, 0)
    rows = [
        # user 1: days 1, 2, 5 — days 3 and 4 are gaps
        (1, ts(1), 1, "view", 1.5),
        (2, ts(2), 1, "view", 2.25),
        (3, ts(5), 1, "view", 4.0),
        # user 2: a single day — no gaps, span of one
        (4, ts(10), 2, "click", 7.0),
    ]
    d = _write_events(spark, rows)
    try:
        out = {
            (r["user_id"], r["day"].day): r
            for r in e13_gapfill_interpolate(spark, d).collect()
        }
        assert set(out) == {(1, 1), (1, 2), (1, 3), (1, 4), (1, 5), (2, 10)}
        # gap days: zero activity, flagged, LOCF carries day 2's value
        for day in (3, 4):
            r = out[(1, day)]
            assert r["gap_filled"] and r["n_events"] == 0
            assert r["day_value"] == 0.0 and r["locf_value"] == 2.25
        # observed days keep their own totals and refresh the carry
        assert not out[(1, 5)]["gap_filled"]
        assert out[(1, 5)]["locf_value"] == 4.0
        assert out[(2, 10)]["n_events"] == 1 and not out[(2, 10)]["gap_filled"]
    finally:
        shutil.rmtree(d)


def test_transition_matrix_counts_and_ppm(spark):
    ts = lambda m: dt.datetime(2024, 3, 1, 12, m, 0)
    rows = [
        # user 1: a -> b -> a -> b   (a->b ×2, b->a ×1)
        (1, ts(0), 1, "a", 0.0),
        (2, ts(1), 1, "b", 0.0),
        (3, ts(2), 1, "a", 0.0),
        (4, ts(3), 1, "b", 0.0),
        # user 2: a -> c             (a->c ×1)
        (5, ts(0), 2, "a", 0.0),
        (6, ts(1), 2, "c", 0.0),
        # user 3: single event — no transitions
        (7, ts(0), 3, "b", 0.0),
    ]
    d = _write_events(spark, rows)
    try:
        out = {
            (r["src"], r["dst"]): r for r in e14_transition_matrix(spark, d).collect()
        }
        assert set(out) == {("a", "b"), ("b", "a"), ("a", "c")}
        assert out[("a", "b")]["n_trans"] == 2
        assert out[("a", "b")]["src_total"] == 3
        assert out[("a", "b")]["prob_ppm"] == 2 * 1_000_000 // 3
        assert out[("a", "c")]["prob_ppm"] == 1_000_000 // 3
        assert out[("b", "a")]["prob_ppm"] == 1_000_000
    finally:
        shutil.rmtree(d)
