"""SCD2 history / snapshot / signed-delta operator tests
(operators/history.py) — hand-built change logs with known interval
structure, plus plan-shape and consistency checks against
latest_state."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtime_cdc_pipeline_docker_spark.operators.collapse import latest_state
from realtime_cdc_pipeline_docker_spark.operators.history import (
    scd2_history,
    signed_delta,
    snapshot_asof,
)

_LOG_SCHEMA = "id long, v string, op string, ts_ms long, sign int"


def _log(spark, rows):
    return spark.createDataFrame(rows, _LOG_SCHEMA)


def _hist_map(df):
    return {
        (r["id"], r["valid_from_ms"]): (r["v"], r["valid_to_ms"], r["is_current"])
        for r in df.collect()
    }


def test_scd2_intervals_chain_and_tombstones_close(spark):
    # key 1: insert -> update -> update (survives); key 2: insert -> delete
    rows = [
        (1, "a", "c", 100, 1),
        (1, "b", "u", 200, 1),
        (1, "c", "u", 300, 1),
        (2, "x", "c", 150, 1),
        (2, "x", "d", 250, -1),
    ]
    hist = _hist_map(scd2_history(_log(spark, rows), key_cols=("id",)))
    assert hist == {
        (1, 100): ("a", 200, False),
        (1, 200): ("b", 300, False),
        (1, 300): ("c", None, True),
        (2, 150): ("x", 250, False),  # closed by the tombstone,
        # and the tombstone itself emits no row: key 2 has no current row
    }


def test_scd2_exactly_one_current_per_live_key(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.sources.cdc import (
        ORDERS_PAYLOAD_SCHEMA,
        decode_envelope,
        synth_orders_envelope,
    )

    decoded = decode_envelope(
        synth_orders_envelope(spark, sf_dir), ORDERS_PAYLOAD_SCHEMA
    )
    hist = scd2_history(decoded, key_cols=("id",))
    per_key = hist.groupBy("id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current")
    )
    # deleted keys (id % 10 == 0): fully-closed history, zero current rows;
    # survivors: exactly one current row
    bad = per_key.filter(
        ((F.col("id") % 10 == 0) & (F.col("n_current") != 0))
        | ((F.col("id") % 10 != 0) & (F.col("n_current") != 1))
    ).count()
    assert bad == 0


def test_scd2_current_rows_equal_latest_state(spark, sf_dir):
    """The SCD2 table's current slice must be exactly the
    ReplacingMergeTree collapse — two operators, one truth."""
    from realtime_cdc_pipeline_docker_spark.sources.cdc import (
        ORDERS_PAYLOAD_SCHEMA,
        decode_envelope,
        synth_orders_envelope,
    )

    decoded = decode_envelope(
        synth_orders_envelope(spark, sf_dir), ORDERS_PAYLOAD_SCHEMA
    )
    cols = ["id", "customer_id", "status", "total_amount"]
    current = scd2_history(decoded, key_cols=("id",)).filter("is_current").select(cols)
    collapsed = latest_state(decoded, key_cols=("id",)).select(cols)
    assert current.exceptAll(collapsed).count() == 0
    assert collapsed.exceptAll(current).count() == 0


def test_scd2_single_shuffle(spark):
    rows = [(1, "a", "c", 100, 1), (1, "b", "u", 200, 1)]
    plan = scd2_history(_log(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_snapshot_asof_boundaries(spark):
    rows = [
        (1, "a", "c", 100, 1),
        (1, "b", "u", 200, 1),
        (2, "x", "c", 150, 1),
        (2, "x", "d", 250, -1),
    ]
    hist = scd2_history(_log(spark, rows), key_cols=("id",))

    def state(at):
        return {(r["id"], r["v"]) for r in snapshot_asof(hist, at).collect()}

    assert state(99) == set()  # before any insert
    assert state(100) == {(1, "a")}  # inclusive valid_from
    assert state(199) == {(1, "a"), (2, "x")}
    assert state(200) == {(1, "b"), (2, "x")}  # half-open: new version at its instant
    assert state(250) == {(1, "b")}  # delete effective at its instant
    assert state(10_000) == {(1, "b")}


def test_signed_delta_expansion(spark):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("amt", T.DoubleType())]
    )
    env = spark.createDataFrame(
        [
            ('{"id":1,"amt":5.0}', None, "d", 300),
            (None, '{"id":1,"amt":null}', "c", 100),
            ('{"id":1,"amt":null}', '{"id":1,"amt":5.0}', "u", 200),
        ],
        "before string, after string, op string, ts_ms long",
    )
    out = signed_delta(env, schema).orderBy("ts_ms", "sign").collect()
    # c -> one +1 row; u -> (-1 before, +1 after); d -> one -1 row
    assert [(r["op"], r["sign"], r["amt"]) for r in out] == [
        ("c", 1, None),
        ("u", -1, None),
        ("u", 1, 5.0),
        ("d", -1, 5.0),
    ]


def test_signed_delta_sum_tracks_live_total(spark):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("amt", T.DoubleType())]
    )
    env = spark.createDataFrame(
        [
            (None, '{"id":1,"amt":10.0}', "c", 100),
            ('{"id":1,"amt":10.0}', '{"id":1,"amt":25.0}', "u", 200),
            (None, '{"id":2,"amt":7.0}', "c", 150),
            ('{"id":2,"amt":7.0}', None, "d", 300),
        ],
        "before string, after string, op string, ts_ms long",
    )
    row = (
        signed_delta(env, schema)
        .agg(
            F.sum(F.col("sign") * F.col("amt")).alias("total"),
            F.sum("sign").alias("live"),
        )
        .collect()[0]
    )
    assert row["total"] == 25.0  # -10 +25 +7 -7 +10 = 25 (key 1 current image)
    assert row["live"] == 1


def test_signed_delta_is_shuffle_and_python_free(spark):
    schema = T.StructType([T.StructField("id", T.LongType())])
    env = spark.createDataFrame(
        [(None, '{"id":1}', "c", 100)],
        "before string, after string, op string, ts_ms long",
    )
    plan = signed_delta(env, schema)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


# ---------------------------------------------------------------------------
# remove_boilerplate (operators/text.py) — planted-banner removal
# ---------------------------------------------------------------------------


def _bp(spark, rows, **kw):
    from realtime_cdc_pipeline_docker_spark.operators.text import remove_boilerplate

    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_removed"])
        for r in remove_boilerplate(df, **kw).collect()
    }


def test_boilerplate_banner_removed_body_kept(spark):
    rows = [
        (1, "s", "BANNER | unique one"),
        (2, "s", "BANNER | unique two"),
        (3, "s", "BANNER | unique three"),
        (4, "s", "unique four"),
    ]
    out = _bp(spark, rows, min_df_frac=0.5)
    assert out == {
        1: ("unique one", 1, 1),
        2: ("unique two", 1, 1),
        3: ("unique three", 1, 1),
        4: ("unique four", 1, 0),
    }


def test_boilerplate_threshold_is_per_group(spark):
    # "COMMON" is boilerplate in source a (2/2 docs) but unique in b (1/2)
    rows = [
        (1, "a", "COMMON | x"),
        (2, "a", "COMMON | y"),
        (3, "b", "COMMON | z"),
        (4, "b", "other | w"),
    ]
    out = _bp(spark, rows, min_df_frac=0.9)
    assert out[1] == ("x", 1, 1)
    assert out[2] == ("y", 1, 1)
    assert out[3] == ("COMMON | z", 2, 0)
    assert out[4] == ("other | w", 2, 0)


def test_boilerplate_all_lines_removed_doc_survives_empty(spark):
    rows = [(1, "s", "SAME"), (2, "s", "SAME"), (3, "s", "SAME | tail")]
    out = _bp(spark, rows, min_df_frac=0.5)
    assert out[1] == ("", 0, 1)
    assert out[2] == ("", 0, 1)
    assert out[3] == ("tail", 1, 1)


def test_boilerplate_separator_is_literal_not_regex(spark):
    # "|" must not act as regex alternation: single spaces inside a
    # line must NOT split it
    rows = [(1, "s", "a b c"), (2, "s", "d e f")]
    out = _bp(spark, rows, min_df_frac=0.9)
    assert out[1] == ("a b c", 1, 0)
    assert out[2] == ("d e f", 1, 0)


def test_boilerplate_membership_join_is_broadcast(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.operators.text import remove_boilerplate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        remove_boilerplate(docs)._jdf.queryExecution().executedPlan().toString()
    )
    # the mark membership test and the group-size join ride broadcasts;
    # the full line stream shuffles only for df and reassembly
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # 4 shuffle exchanges: 2-phase line-df distinct, group count, doc
    # reassembly (broadcast exchanges excluded — they move the tiny side)
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") <= 4, final


def test_scd2_redelivered_duplicates_absorbed_no_extra_exchange(spark):
    rows = [
        (1, "a", "c", 100, 1),
        (1, "b", "u", 200, 1),
        (2, "x", "c", 150, 1),
        (2, "x", "d", 250, -1),
    ]
    once = scd2_history(_log(spark, rows), key_cols=("id",))
    twice_df = scd2_history(_log(spark, rows + rows), key_cols=("id",))
    assert _hist_map(twice_df) == _hist_map(once)
    # idempotence must ride the interval window's shuffle, not add one
    # (after execution the AQE toString appends the Initial Plan section
    # too — count exchanges in the final plan only)
    plan = twice_df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, final


def test_scd2_dedup_off_exposes_duplicates(spark):
    rows = [(1, "a", "c", 100, 1), (1, "b", "u", 200, 1)]
    n = scd2_history(
        _log(spark, rows + rows), key_cols=("id",), dedup_redelivered=False
    ).count()
    assert n == 4  # contract documented: dedup upstream or leave the flag on


def test_changes_only_keeps_first_and_changes(spark):
    from realtime_cdc_pipeline_docker_spark.operators.history import changes_only

    rows = [
        # key a: value repeats, then changes, then repeats
        ("a", 1, "x"), ("a", 2, "x"), ("a", 3, "y"), ("a", 4, "y"), ("a", 5, "x"),
        # key b: NULL -> NULL is unchanged; NULL -> value is a change
        ("b", 1, None), ("b", 2, None), ("b", 3, "z"),
    ]
    df = spark.createDataFrame(rows, "k string, v int, s string")
    out = sorted(
        (r["k"], r["v"]) for r in
        changes_only(df, ("k",), ("v",), ("s",)).collect()
    )
    assert out == [("a", 1), ("a", 3), ("a", 5), ("b", 1), ("b", 3)]


def test_changes_only_preserves_reconstruction(spark, sf_dir):
    """Latest state from the compressed events log == from the full log."""
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.history import changes_only
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))

    def last_type(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("user_id", "event_type")
        )

    full = {r["user_id"]: r["event_type"] for r in last_type(events).collect()}
    comp = changes_only(events, ("user_id",), ("ts", "event_id"), ("event_type",))
    compressed = {r["user_id"]: r["event_type"] for r in last_type(comp).collect()}
    assert full == compressed
    assert comp.count() <= events.count()


def test_changes_only_single_shuffle(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.history import changes_only

    events = load_table(spark, sf_dir, "events")
    plan = (
        changes_only(events, ("user_id",), ("ts", "event_id"), ("event_type",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Python" not in plan


def test_sign_product_moves_revenue_between_segments(spark):
    """The DBSP sign-product rule: a dimension segment change retracts
    the fact contribution from the old segment and asserts it in the
    new one — computed purely from the two signed streams."""
    # Fact deltas: order 1 (cust 10) inserted at 100 cents, updated to
    # 250; order 2 (cust 20) inserted at 50, deleted.
    o = spark.createDataFrame(
        [
            (10, 1, 100), (10, -1, 100), (10, 1, 250),
            (20, 1, 50), (20, -1, 50),
        ],
        "ckey long, sign_o int, cents long",
    )
    # Dim deltas: cust 10 moves A -> B; cust 20 stays A.
    c = spark.createDataFrame(
        [(10, "A", 1), (10, "A", -1), (10, "B", 1), (20, "A", 1)],
        "ckey long, segment string, sign_c int",
    )
    got = {
        r["segment"]: r["net"]
        for r in o.join(c, "ckey")
        .groupBy("segment")
        .agg(F.sum(F.col("sign_o") * F.col("sign_c") * F.col("cents")).alias("net"))
        .collect()
    }
    # Every superseded (fact, dim) version pair cancels: 250 lands in B,
    # segment A nets to zero (order 2 deleted; order 1 retracted from A).
    assert got == {"A": 0, "B": 250}


def test_retention_preserves_time_travel_inside_window(spark, sf_dir):
    """snapshot_asof over the retained history == over the full history
    for every instant >= cutoff; before the cutoff, versions are gone."""
    from realtime_cdc_pipeline_docker_spark.operators.history import (
        retain_history,
        scd2_history,
        snapshot_asof,
    )
    from realtime_cdc_pipeline_docker_spark.plans.cdc_queries import _ASOF_MS
    from realtime_cdc_pipeline_docker_spark.sources.cdc import (
        ORDERS_PAYLOAD_SCHEMA,
        decode_envelope,
        synth_orders_envelope,
    )

    decoded = decode_envelope(
        synth_orders_envelope(spark, sf_dir), ORDERS_PAYLOAD_SCHEMA
    )
    hist = scd2_history(decoded, key_cols=("id",)).persist()
    kept = retain_history(hist, _ASOF_MS)
    assert kept.count() < hist.count()  # something actually expired

    def snap(h, t):
        return sorted(
            (r["id"], r["status"], r["total_amount"])
            for r in snapshot_asof(h, t).collect()
        )

    for t in (_ASOF_MS, _ASOF_MS + 3_600_000, _ASOF_MS + 100_000_000_000):
        assert snap(kept, t) == snap(hist, t)
    # Before the cutoff the retained table is (correctly) incomplete:
    # probe mid-lifecycle of the earliest deleted key (its update
    # interval closed well before the cutoff, so retention dropped it).
    first_deleted_ts0 = (
        hist.filter(F.col("id") % 10 == 0).agg(F.min("valid_from_ms")).first()[0]
    )
    early = first_deleted_ts0 + 90 * 60 * 1000  # inside [ts0+1h, ts0+2h)
    assert early < _ASOF_MS
    assert len(snap(kept, early)) < len(snap(hist, early))
    hist.unpersist()
