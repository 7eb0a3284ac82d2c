"""Boundary-hitting fixtures for oracles whose parity on the driver
testdata holds only because the fixture never exercises an edge
(ADVICE round 3): e2h's exact-30-minute gap and j8's short benchmark
documents.  Each test writes a synthetic table that DOES hit the edge
and asserts Spark == oracle there, so a fixture regeneration can never
silently flip a driver row."""

from __future__ import annotations

import datetime

import duckdb
from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark import plans

from .oracle_harness import canon, col_types


def _run_oracle_on(sql: str, view_files: dict[str, str]) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for name, path in view_files.items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}/*.parquet'")
    cur = con.execute(sql)
    return [d[0] for d in cur.description], cur.fetchall()


def _assert_matches(spark_df, sql: str, view_files: dict[str, str], name: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = _run_oracle_on(sql, view_files)
    assert sorted(s_cols) == sorted(o_cols), name
    assert len(s_rows) == len(o_rows), (
        f"{name}: {len(s_rows)} spark rows != {len(o_rows)} oracle rows"
    )
    assert col_types(s_cols, s_rows) == col_types(o_cols, o_rows), name
    assert canon(s_cols, s_rows) == canon(o_cols, o_rows), name


def _ts(h, m, s=0, us=0):
    return datetime.datetime(2024, 1, 1, h, m, s, us)


def test_e2h_exact_30min_gap_merges(spark, tmp_path):
    """Spark's session_window MERGES events exactly gap apart (verified
    here: 00:00 and 00:30 form ONE session); the oracle's new-session
    rule is strictly-greater and must agree on the boundary."""
    rows = [
        # user 1: exact 30-min gap (merge), then 31-min gap (split)
        (1, _ts(0, 0), 10),
        (1, _ts(0, 30), 11),
        (1, _ts(1, 1), 12),
        # user 2: one microsecond over the gap -> two sessions
        (2, _ts(10, 0), 20),
        (2, _ts(10, 30, 0, 1), 21),
    ]
    df = spark.createDataFrame(
        [
            (eid, ts, uid, "click", 1.0, "{}")
            for uid, ts, eid in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    events_dir = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(events_dir)

    spec = plans.REGISTRY["e2h_session_window"]
    result = spec.fn(spark, str(tmp_path))
    _assert_matches(result, spec.oracle, {"events": events_dir}, "e2h_boundary")

    sessions = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in result.collect()
    }
    # exact-gap events merged: user 1's first session holds BOTH
    assert sessions[(1, _ts(0, 0))] == 2
    assert sessions[(1, _ts(1, 1))] == 1
    # one microsecond past the gap splits
    assert sessions[(2, _ts(10, 0))] == 1
    assert sessions[(2, _ts(10, 30, 0, 1))] == 1


def test_j8_short_benchmark_doc_grams(spark, tmp_path):
    """A <5-token benchmark doc contributes its whole text as one gram
    and the corpus emits matching short windows (the min(n,len)-gram
    rule) — the oracle must model it, not rely on fixtures having no
    short docs at doc_id % 101 == 0."""
    docs = [
        # doc 0 -> benchmark (0 % 101 == 0), only 3 tokens
        (0, "alpha beta gamma"),
        # contains the short bench text as a contiguous 3-token window
        (1, "pad1 pad2 alpha beta gamma pad3 pad4 pad5"),
        # contains the tokens but NOT contiguously -> clean
        (2, "alpha pad6 beta pad7 gamma pad8"),
        # unrelated -> clean
        (3, "zeta eta theta iota kappa lambdax mu nu"),
        # exact copy of the short bench text under another id
        (4, "alpha  beta   gamma"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src1", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs_dir = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(docs_dir)

    spec = plans.REGISTRY["j8_decontaminate"]
    result = spec.fn(spark, str(tmp_path))
    _assert_matches(result, spec.oracle, {"documents": docs_dir}, "j8_short_bench")

    flagged = {r["doc_id"]: r["n_contaminated_grams"] for r in result.collect()}
    assert flagged == {0: 1, 1: 1, 4: 1}


def test_e2i_null_event_type_counts_as_a_type(spark, tmp_path):
    """ADVICE r4: a NULL event_type sorts FIRST in the flag window, so
    the partition's first row saw lag() = NULL and null-safe inequality
    alone never counted the NULL type.  The explicit row_number = 1
    flag restores the oracle's first-row semantics; NULL is one
    distinct type, counted once."""
    rows = [
        # user 1: NULL type first, then two named types, NULL repeats
        (1, _ts(0, 0), 10, None),
        (1, _ts(0, 5), 11, "click"),
        (1, _ts(0, 10), 12, None),
        (1, _ts(0, 15), 13, "view"),
        # user 2: only NULL types -> n_types_seen stays 1 throughout
        (2, _ts(1, 0), 20, None),
        (2, _ts(1, 5), 21, None),
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, et, 1.0, "{}") for uid, ts, eid, et in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    events_dir = str(tmp_path / "events.parquet")
    df.coalesce(1).write.parquet(events_dir)

    spec = plans.REGISTRY["e2i_distinct_to_date"]
    result = spec.fn(spark, str(tmp_path))
    _assert_matches(result, spec.oracle, {"events": events_dir}, "e2i_null_types")

    seen = {r["event_id"]: r["n_types_seen"] for r in result.collect()}
    assert seen == {10: 1, 11: 2, 12: 2, 13: 3, 20: 1, 21: 1}
