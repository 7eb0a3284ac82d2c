"""Temporal-join queries (SURVEY §2.K extension family): as-of join and
interval/range join over `events` × `orders` — the time-series
operations a user of the reference's versioned mart reaches for next
(the order state *as of* an event; events falling *inside* a window).

Spark lacks both as built-ins; ``operators/temporal.py`` implements
them as single-shuffle DataFrame compositions.  DuckDB has native
``ASOF JOIN``, giving k1 a genuinely independent exact oracle (a
different algorithm — binary-search per row — must produce the same
relation).  k2's oracle is a plain inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import epoch_ms, fixed_units
from ..operators.temporal import asof_join, range_join
from .registry import register


@register(
    "k1_asof_order_state",
    oracle="""
    WITH rd AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1
    )
    SELECT e.event_id, e.user_id,
           rd.o_orderkey AS asof_orderkey,
           rd.o_totalprice AS asof_totalprice
    FROM events e
    ASOF LEFT JOIN rd ON e.user_id = rd.o_custkey AND e.ts >= rd.o_orderdate
    """,
)
def k1_asof_order_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (K1): for every event, the user's most recent order at
    or before the event time — the canonical feature-store/point-in-time
    lookup.  Implemented as union-markers + one keyed window (single
    shuffle, no pair explosion; operators/temporal.py); the oracle is
    DuckDB's native ASOF JOIN over a tie-broken right side, an
    independent algorithm producing the same relation."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    out = asof_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )


@register(
    "k2_range_join_incidents",
    oracle="""
    WITH incidents AS (
      SELECT event_id AS incident_id, user_id, ts AS t0,
             ts + INTERVAL 1 HOUR AS t1
      FROM events WHERE event_type = 'error'
    )
    SELECT i.incident_id,
           COUNT(*) AS n_events,
           SUM(CAST(round(e.value * 10000) AS BIGINT)) / 10000.0 AS sum_value
    FROM incidents i
    JOIN events e
      ON e.user_id = i.user_id
     AND e.event_type <> 'error'
     AND e.ts BETWEEN i.t0 AND i.t1
    GROUP BY i.incident_id
    """,
)
def k2_range_join_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join (K2): each error event opens a 1-hour incident
    window; count + sum the same user's non-error activity inside it.
    Implemented by time-bucketing (intervals sequence-explode to covered
    buckets, points map to one bucket, equi-join + residual BETWEEN —
    operators/temporal.py), so Catalyst keeps a hash join; the oracle is
    the plain inequality join.  value is 4-dec fixed-point → exact
    integer units for an order-independent sum."""
    events = load_table(spark, sf_dir, "events")
    incidents = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        "user_id",
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("t1"),
    )
    points = events.filter(F.col("event_type") != "error").select(
        "user_id", "ts", "value"
    )
    joined = range_join(
        points,
        incidents,
        left_ts="ts",
        right_start="t0",
        right_end="t1",
        left_on=["user_id"],
        right_on=["user_id"],
        bucket_seconds=3600,
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(fixed_units("value", 4)) / F.lit(10000.0)).alias("sum_value"),
    )


@register(
    "k3_temporal_dimension_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate,
           CASE WHEN epoch_ms(l.l_shipdate) < epoch_ms(o.o_orderdate)
                  THEN CAST(NULL AS VARCHAR)
                WHEN epoch_ms(l.l_shipdate) < epoch_ms(o.o_orderdate) + 3600000
                  THEN 'processing'
                WHEN o.o_orderkey % 10 = 0
                 AND epoch_ms(l.l_shipdate) >= epoch_ms(o.o_orderdate) + 7200000
                  THEN CAST(NULL AS VARCHAR)
                ELSE o.o_orderstatus END AS status_at_ship
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def k3_temporal_dimension_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time-correct dimension join (K extension — the temporal
    version of every star join in §2.D): each lineitem is joined to the
    version of its order that was VALID AT SHIP TIME, read from the
    SCD2 history (operators/history.py) by equi-key + half-open
    interval containment.  Facts shipping inside the insert hour see
    'processing'; facts shipping after their order's delete tombstone
    see NULL (LEFT join: no visible version ≠ dropped fact) — the
    oracle scripts the same lifecycle arithmetic directly over
    orders ⋈ lineitem.  Intervals per key are disjoint, so the join
    multiplies nothing.  Plan: ONE hash shuffle on the order key with
    the interval residual as a post-join filter — the standard
    fact ⋈ SCD2 shape; at 100 TB both sides co-partition (bucket) on
    the key and the join is exchange-free."""
    from ..operators.history import scd2_history
    from ..sources.cdc import decoded_orders_log

    decoded = decoded_orders_log(spark, sf_dir)
    hist = scd2_history(decoded, key_cols=("id",)).select(
        "id", "status", "valid_from_ms", "valid_to_ms"
    )
    li = load_table(spark, sf_dir, "lineitem")
    ship_ms = epoch_ms("l_shipdate", li.schema["l_shipdate"].dataType)
    facts = li.select("l_orderkey", "l_linenumber", "l_shipdate", ship_ms.alias("__ship_ms"))
    cond = (
        (facts["l_orderkey"] == hist["id"])
        & (F.col("__ship_ms") >= F.col("valid_from_ms"))
        & (F.col("valid_to_ms").isNull() | (F.col("__ship_ms") < F.col("valid_to_ms")))
    )
    return facts.join(hist, cond, "left").select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.col("status").alias("status_at_ship"),
    )


@register(
    "k4_asof_next_order",
    oracle="""
    WITH rd AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1
    ), cand AS (
      SELECT e.event_id, rd.o_orderkey, rd.o_totalprice
      FROM events e JOIN rd
        ON rd.o_custkey = e.user_id
       AND rd.o_orderdate >= e.ts
       AND rd.o_orderdate <= e.ts + INTERVAL 30 DAY
      QUALIFY row_number() OVER (PARTITION BY e.event_id
                                 ORDER BY rd.o_orderdate) = 1
    )
    SELECT e.event_id, e.user_id,
           c.o_orderkey AS next_orderkey,
           c.o_totalprice AS next_totalprice
    FROM events e LEFT JOIN cand c ON c.event_id = e.event_id
    """,
)
def k4_asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join WITH TOLERANCE (K4 — the attribution lookup:
    the user's NEXT order at or after each event, but only within 30
    days, else NULL).  Same union-markers + single keyed window engine
    as k1 run in direction="forward"; the tolerance is a residual
    filter on the matched pair, not a join explosion.  The oracle is
    the explicit candidates + row_number formulation — a different
    algorithm, same relation.  Right side tie-broken per (key, ts) to
    the max orderkey, exactly as k1."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    out = asof_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        direction="forward",
        tolerance_seconds=30 * 86400,
        tiebreak="o_orderkey",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_totalprice"),
    )


@register(
    "k5_interval_coalesce",
    oracle="""
    WITH inc AS (
      SELECT event_id, user_id, ts AS t0, ts + INTERVAL 1 HOUR AS t1
      FROM events WHERE event_type = 'error'
    ), flagged AS (
      SELECT user_id, event_id, t0, t1,
             CASE WHEN t0 > MAX(t1) OVER (
                    PARTITION BY user_id ORDER BY t0, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM inc
    ), islands AS (
      SELECT user_id, t0, t1,
             CAST(SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY t0, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS island
      FROM flagged
    )
    SELECT user_id, island,
           MIN(t0) AS island_start, MAX(t1) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_incidents
    FROM islands
    GROUP BY user_id, island
    """,
)
def k5_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (§2.K extension — merge overlapping incident
    windows into maximal episodes, the temporal-normalization pass
    before any downtime/SLA accounting): classic gaps-and-islands.  A
    window opens a new island iff its start exceeds the running MAX of
    all earlier ends (MAX, not lag(end): an early long interval may
    swallow several later short ones); the island id is the running
    SUM of those flags.  The first row of each partition has an empty
    preceding frame (NULL max) → new_island = 0, so islands number
    from 0 in both engines.

    Scale shape: one shuffle on user_id, two stacked window passes on
    the SAME (user_id, t0, event_id) sort (Spark evaluates both in one
    Window exec chain without re-sorting), then a partial-aggregated
    groupBy.  No joins, no self-join — the naive interval-merge
    formulation is an O(n^2) range self-join."""
    ev = load_table(spark, sf_dir, "events")
    inc = ev.filter(F.col("event_type") == "error").select(
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
    flagged = inc.withColumn(
        "new_island",
        F.when(F.col("t0") > F.max("t1").over(w_prev), 1).otherwise(0),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(w_run).cast("long")
    )
    return islands.groupBy("user_id", "island").agg(
        F.min("t0").alias("island_start"),
        F.max("t1").alias("island_end"),
        F.count(F.lit(1)).alias("n_incidents"),
    )


@register(
    "k6_asof_staleness_gate",
    oracle="""
    WITH rd AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      FROM orders
      QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) = 1
    ), m AS (
      SELECT e.event_id, e.user_id, e.ts,
             rd.o_orderkey, rd.o_totalprice, rd.o_orderdate
      FROM events e
      ASOF LEFT JOIN rd ON e.user_id = rd.o_custkey AND e.ts >= rd.o_orderdate
    )
    SELECT event_id, user_id,
           o_orderkey AS raw_orderkey,
           CASE WHEN o_orderkey IS NOT NULL
                 AND date_diff('day', o_orderdate, CAST(ts AS DATE)) <= 8400
                THEN o_orderkey END AS fresh_orderkey,
           CASE WHEN o_orderkey IS NOT NULL
                 AND date_diff('day', o_orderdate, CAST(ts AS DATE)) <= 8400
                THEN o_totalprice END AS fresh_totalprice
    FROM m
    """,
)
def k6_asof_staleness_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-gated as-of join (§2.K extension — pandas
    ``merge_asof(tolerance=...)``): the k1 point-in-time lookup plus a
    MAX-STALENESS rule — a match staler than the gate resolves to
    NULL (kept row, left-join semantics), the feature-store freshness
    gate
    that prevents a years-old order from silently standing in as
    "current state".  Both the raw and the gated columns are emitted
    so stale matches are observable as raw≠NULL ∧ fresh=NULL.
    Exactness: the gate compares in integer DAY arithmetic
    (datediff both engines) — the operator's ``tolerance_seconds``
    path truncates sub-second fractions differently per engine at the
    exact boundary, so it stays unit-tested
    (operators/temporal.py:asof_join) while the query pins the
    cross-engine-exact day-granular form.  One as-of pass; the gate
    is a post-join column expression reading the attached
    ``__asof_ts``."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    out = asof_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    # 8400 days is fixture-calibrated to populate BOTH branches (the
    # synthetic events sit ~8.2k-8.8k days after the order dates, so a
    # "30 days" gate would nullify every match and test nothing); the
    # semantics are threshold-independent.
    fresh = F.col("o_orderkey").isNotNull() & (
        F.datediff(F.to_date("ts"), F.col("__asof_ts")) <= 8400
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("raw_orderkey"),
        F.when(fresh, F.col("o_orderkey")).alias("fresh_orderkey"),
        F.when(fresh, F.col("o_totalprice")).alias("fresh_totalprice"),
    )


@register(
    "k7_trailing_event_history",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_id % 17 = 0
    ), h AS (
      SELECT p.event_id AS probe_event_id, e.event_id, e.ts,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY e.ts DESC, e.event_id DESC) AS hist_rank
      FROM p JOIN events e
        ON e.user_id = p.user_id
       AND e.ts < p.ts
       AND e.ts >= p.ts - INTERVAL 7 DAY
    )
    SELECT probe_event_id, CAST(hist_rank AS BIGINT) AS hist_rank,
           event_id, epoch_ms(ts) AS event_ts_ms
    FROM h WHERE hist_rank <= 3
    """,
)
def k7_trailing_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-k event history (§2.K7 — the feature-store lookup one
    step past k1's as-of join: for each probed event, the SAME user's
    last 3 events strictly before it, horizon-bounded at 7 days — the
    trailing-context features a next-event model trains on).  The
    probe set is a deterministic event sample (event_id % 17 — a
    feature job scores a batch of examples, not the whole log at
    once).  One equi-key join carrying the range predicate (never a
    cartesian; the horizon bound is the feature definition and the
    100 TB contract), then a per-probe descending-time rank truncated
    map-side at k (WindowGroupLimit).  Total order (ts DESC, event_id
    DESC) makes the selected history deterministic cross-engine; the
    oracle states the same relation as a plain SQL window.  See
    operators/temporal.py:trailing_events_join."""
    from ..operators.temporal import trailing_events_join

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    probes = events.filter(F.col("event_id") % 17 == 0).select(
        F.col("event_id").alias("probe_event_id"),
        F.col("user_id").alias("probe_user_id"),
        F.col("ts").alias("probe_ts"),
    )
    out = trailing_events_join(
        probes,
        events,
        k=3,
        horizon_days=7,
        probe_key="probe_user_id",
        probe_ts="probe_ts",
        event_cols=("event_id",),
        probe_id="probe_event_id",
    )
    return out.select(
        "probe_event_id",
        "hist_rank",
        "event_id",
        F.unix_millis("event_ts").alias("event_ts_ms"),
    )
