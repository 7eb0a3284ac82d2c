"""Event-stream analytics over the `events` table (SURVEY §2.B JSON ops,
§2.E analytics, §2.H batch analogs of windowed streaming aggs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..functions import epoch_ms, fixed_units
from .registry import register

_PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType(), True)])


@register(
    "b02_b05_json_two_phase",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def b02_b05_json_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-driven JSON decode (B2/B5: from_json with explicit schema,
    cdc_processor.py:75,89) over the events `props` payload, aggregated."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_type", F.from_json("props", _PROPS_SCHEMA).alias("p")
    ).select("event_type", F.col("p.k").alias("k"))
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "h4_events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           SUM(CAST(round(value*10000) AS BIGINT)) / 10000.0 AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def h4_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation, batch form (the streaming twin uses
    ``F.window(ts, '1 hour')`` + watermark — tested in tests/, same
    grouping semantics).  value is 4-dec fixed-point → exact units."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(fixed_units("value", 4)) / F.lit(10000.0)).alias("total_value"),
    )


@register(
    "e2d_sessionization",
    oracle="""
    SELECT user_id,
           CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM (
      SELECT user_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) GROUP BY user_id
    """,
)
def e2d_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap session boundaries via lag(), counted
    per user.  The classic gaps-and-islands analytic — one shuffle on
    user_id shared by the window and the groupBy (Catalyst reuses the
    partitioning, verified in plan tests)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_type = events.schema["ts"].dataType
    gap_ms = epoch_ms("ts", ts_type) - epoch_ms(F.lag("ts").over(w), ts_type)
    return (
        events.withColumn(
            "new_sess",
            F.when(gap_ms.isNull() | (gap_ms > 1_800_000), F.lit(1)).otherwise(F.lit(0)),
        )
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "e2e_event_topn_users",
    oracle="""
    SELECT event_type, user_id, user_value, rnk FROM (
      SELECT event_type, user_id, user_value,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY user_value DESC, user_id) AS BIGINT) AS rnk
      FROM (
        SELECT event_type, user_id,
               SUM(CAST(round(value*10000) AS BIGINT)) / 10000.0 AS user_value
        FROM events GROUP BY event_type, user_id
      )
    ) WHERE rnk <= 5
    """,
)
def e2e_event_topn_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 users by total value per event type (pre-aggregate, then
    rank — window input is |users×types|, not |events|)."""
    events = load_table(spark, sf_dir, "events")
    totals = events.groupBy("event_type", "user_id").agg(
        (F.sum(fixed_units("value", 4)) / F.lit(10000.0)).alias("user_value")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("user_value").desc(), "user_id")
    return (
        totals.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("event_type", "user_id", "user_value", "rnk")
    )


@register(
    "h6_stream_stream_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id AS user_id,
           p.ts AS purchase_ts, p.value AS amount,
           v.event_id AS view_id, v.ts AS view_ts
    FROM events p JOIN events v
      ON v.user_id = p.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def h6_stream_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch golden twin of the stream-stream attribution join
    (streaming/joins.py): purchase×prior-view pairs of the same user
    within a 1-hour horizon.  The equi key (user_id) carries the join;
    the time range is a residual — the same plan a co-partitioned
    streaming join runs, with state bounded by watermark + horizon.
    The streaming run of the SAME function is asserted equal in
    tests/test_streaming_join.py."""
    from ..streaming.joins import attribute_purchases

    return attribute_purchases(load_table(spark, sf_dir, "events"))


@register(
    "e3_cohort_retention",
    oracle="""
    WITH cohort AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_day FROM events
    )
    SELECT cohort_day,
           CAST(datediff('day', cohort_day, act_day) AS BIGINT) AS day_offset,
           COUNT(*) AS n_active
    FROM activity JOIN cohort USING (user_id)
    GROUP BY 1, 2
    """,
)
def e3_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (classic product-analytics rollup): users
    cohorted by first-activity day, counted once per active day at
    each day offset.  Both the cohort min and the distinct-activity
    set key on user_id, so the two aggregates and the join share ONE
    hash partitioning of the events table; only (cohort_day, offset)
    counters leave it.  The cohort side is |users| rows — broadcast."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("act_day")
    )
    cohort = ev.groupBy("user_id").agg(F.min("act_day").alias("cohort_day"))
    activity = ev.distinct()
    return (
        activity.join(F.broadcast(cohort), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("act_day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "e4_funnel_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ), conv AS (
      SELECT DISTINCT s.user_id
      FROM s JOIN events e ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > s.signup_ts AND e.ts <= s.signup_ts + INTERVAL 7 DAY
    )
    SELECT CAST(s.signup_ts AS DATE) AS signup_day,
           COUNT(*) AS n_signups,
           CAST(SUM(CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted
    FROM s LEFT JOIN conv ON s.user_id = conv.user_id
    GROUP BY 1
    """,
)
def e4_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel (signup → purchase within 7 days), rolled up by
    signup day.  The conversion test is an EXISTS with a non-equi
    time-bound residual → LEFT SEMI on user_id; the flag joins back
    LEFT so non-converters stay counted.  Every stage keys on user_id
    until the final small rollup."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        s.join(
            purch,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("signup_ts"))
            & (F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")),
            "left_semi",
        )
        .select("user_id")
        .withColumn("__conv", F.lit(1))
    )
    return (
        s.join(conv, "user_id", "left")
        .groupBy(F.to_date("signup_ts").alias("signup_day"))
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum(F.when(F.col("__conv").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_converted"),
        )
    )


# Shared by e2h (batch session_window) and h14 (the same aggregate run
# as a watermarked append-mode stream): the gaps-and-islands golden
# recomputation of 30-min session windows.
SESSION_WINDOW_ORACLE = """
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS sid
      FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """


@register("e2h_session_window", oracle=SESSION_WINDOW_ORACLE)
def e2h_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (§2.E2/H4): Spark's built-in
    ``session_window`` aggregation — the JVM-side twin of both the e2d
    gaps-and-islands query and the applyInPandasWithState sessionizer
    (streaming/windows.py), here as a single SessionWindow aggregate
    with no window-function pass.  Oracle recomputes the islands
    independently (a session closes when the next event is > 30 min
    away — Spark's session_window MERGES events exactly gap apart, so
    the boundary is strict; end = last event + gap, Spark's
    definition).  The same
    expression works under readStream with a watermark — this is the
    operator the custom sessionizer upgrades FROM when per-session
    custom state isn't needed."""
    events = load_table(spark, sf_dir, "events")
    w = F.session_window("ts", "30 minutes").alias("w")
    return (
        events.groupBy("user_id", w)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "e7_change_compression",
    oracle="""
    SELECT user_id, event_id, ts, event_type FROM (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER w AS rn,
             lag(event_type) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) WHERE rn = 1 OR event_type IS DISTINCT FROM prev
    """,
)
def e7_change_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-log run-length compression (§2.E extension): per user, in
    (ts, event_id) order, keep only events whose type differs from the
    immediately preceding one — the OPTIMIZE...DEDUPLICATE analog for
    re-emitted unchanged state.  Null-safe comparison on both engines
    (`<=>` / IS DISTINCT FROM).  One window + filter, single shuffle —
    see operators/history.py:changes_only."""
    from ..operators.history import changes_only

    events = load_table(spark, sf_dir, "events")
    return changes_only(
        events,
        key_cols=("user_id",),
        order_cols=("ts", "event_id"),
        value_cols=("event_type",),
    ).select("user_id", "event_id", "ts", "event_type")


@register(
    "e2i_distinct_to_date",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_types_seen
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) = 1 THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    """,
)
def e2i_distinct_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count over a window (§2.E extension): per
    user, how many distinct event types have been seen up to and
    including each event.  COUNT(DISTINCT) OVER a running frame is
    unsupported in both engines; the portable exact form is the
    first-seen-flag trick — flag each (user, type)'s first occurrence,
    then running-SUM the flags.  BOTH windows here partition on
    user_id alone (the flag window puts event_type in its SORT key,
    not its partition key, and reads the type change off lag()), so
    the plan is ONE exchange + two in-partition sorts; the naive
    partitionBy(user, type) flag window would hash on different keys
    and pay a second shuffle.

    The partition's FIRST row is flagged explicitly (row_number = 1,
    same window — no extra shuffle): NULLs sort first, so a NULL-typed
    first row sees lag() = NULL and `~(NULL <=> NULL)` alone would
    never count the NULL type, diverging from the oracle's
    row_number-per-(user, type) rule (ADVICE r4)."""
    events = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = events.withColumn(
        "first_seen",
        F.when(
            (F.row_number().over(w_first) == 1)
            | ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w_first)),
            1,
        ).otherwise(0),
    )
    return flagged.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("first_seen").over(w_run).cast("long").alias("n_types_seen"),
    )


@register(
    "e2j_range_frame_rolling",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS order_day,
             datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_no,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders GROUP BY 1, 2
    )
    SELECT order_day, revenue_cents,
           CAST(SUM(revenue_cents) OVER (
             ORDER BY day_no RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_30d_cents
    FROM daily
    """,
)
def e2j_range_frame_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame windowing (§2.E extension): trailing-30-DAY revenue
    per day — a VALUE-based frame (days with no orders still age out of
    the window), distinct from e2f's ROWS frame (last N rows).  Both
    engines get the identical integer day-number axis; Spark's
    rangeBetween is numeric-only, so dates become day offsets — the
    portable form.  Scale note: the window input is the POST-AGGREGATE
    day relation (|days| rows, ~2.4k here), so the unpartitioned
    ordered window is driver-trivial; the heavy lifting is the
    map-side-combinable daily aggregate before it."""
    from ..functions import fixed_units

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.to_date("o_orderdate").alias("order_day"))
        .agg(F.sum(fixed_units("o_totalprice")).alias("revenue_cents"))
        .withColumn(
            "day_no", F.datediff("order_day", F.lit("1992-01-01").cast("date"))
        )
    )
    w = Window.orderBy("day_no").rangeBetween(-29, Window.currentRow)
    return daily.select(
        "order_day",
        "revenue_cents",
        F.sum("revenue_cents").over(w).cast("long").alias("rolling_30d_cents"),
    )


@register(
    "b16_variant_json_access",
    oracle="""
    SELECT event_type AS typ,
           't' || CAST(event_id % 3 AS VARCHAR) AS tag0,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, 'k') AS BIGINT)) AS BIGINT)
             AS sum_k
    FROM events
    GROUP BY 1, 2
    """,
)
def b16_variant_json_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-less semi-structured access via the VARIANT type (§2.B
    extension — Spark 4's answer to the two-phase from_json in b02,
    for payloads with NO declared schema): a heterogeneous JSON doc is
    assembled per event (object nesting the fixture's ``props``, a
    string field, an array), ``parse_json``-ed into a variant, and
    fields come out through typed ``variant_get`` paths — including an
    array index — then aggregate.  The oracle recomputes the same
    fields relationally (tag from the id residue, k via DuckDB's JSON
    extraction of the original props), so parity proves the
    variant encode/decode round-trips values exactly.  Variant is
    binary-encoded columnar at rest — fields prune without parsing the
    whole document, unlike a JSON string column."""
    events = load_table(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"meta": '),
        F.col("props"),
        F.lit(', "type": "'),
        F.col("event_type"),
        F.lit('", "tags": ["t'),
        (F.col("event_id") % 3).cast("string"),
        F.lit('", "x"]}'),
    )
    v = F.parse_json(doc)
    flat = events.select(
        F.variant_get(v, "$.type", "string").alias("typ"),
        F.variant_get(v, "$.tags[0]", "string").alias("tag0"),
        F.variant_get(v, "$.meta.k", "bigint").alias("k"),
    )
    return flat.groupBy("typ", "tag0").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
    )


@register(
    "e10_window_funnel",
    oracle="""
    WITH u1 AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
      FROM events GROUP BY 1
    ), u2 AS (
      SELECT e.user_id, u1.t1,
             MIN(CASE WHEN e.event_type = 'click' AND e.ts > u1.t1
                       AND e.ts <= u1.t1 + INTERVAL 7 DAY THEN e.ts END) AS t2
      FROM events e JOIN u1 USING (user_id) GROUP BY 1, 2
    ), u3 AS (
      SELECT e.user_id, u2.t1, u2.t2,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > u2.t2
                       AND e.ts <= u2.t1 + INTERVAL 7 DAY THEN e.ts END) AS t3
      FROM events e JOIN u2 USING (user_id) GROUP BY 1, 2, 3
    )
    SELECT CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS level,
           COUNT(*) AS n_users
    FROM u3 GROUP BY 1
    """,
)
def e10_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel`` analog (§2.E extension): per user,
    the deepest view → click → purchase prefix completed IN ORDER with
    every step inside 7 days of the first — reported as a level
    histogram.  Unlike e4's two-step EXISTS funnel this is ordered,
    multi-level, and window-bounded from the FIRST step.  Spark plan:
    three chained conditional-min WINDOW aggregates all partitioned on
    user_id (each level's predicate references the previous level's
    time — consecutive Window nodes, ONE hash exchange), then a
    row-per-user dedup that reuses the same partitioning, then a
    ≤4-group count.  The oracle computes the identical levels with
    aggregate-then-join passes — two independent formulations, one
    relation."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    seven = F.expr("INTERVAL 7 DAY")
    lv = (
        events.withColumn(
            "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t1"))
                    & (F.col("ts") <= F.col("t1") + seven),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2"))
                    & (F.col("ts") <= F.col("t1") + seven),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = lv.select(
        "user_id",
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
        .alias("level"),
    ).dropDuplicates(["user_id"])
    return per_user.groupBy("level").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "h6b_outer_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.value AS amount,
           v.event_id AS view_id
    FROM events p LEFT JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view'
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    """,
)
def h6b_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER purchase→view attribution (§2.H): unattributed
    purchases survive with NULL view columns — the batch twin of the
    left-outer stream-stream join (streaming/joins.py, how=
    'left_outer'), whose streaming form withholds each NULL emission
    until the watermark proves no match can still arrive (asserted in
    tests/test_streaming_join.py).  Same single user_id shuffle as the
    inner form; the outer side adds no exchange."""
    from ..streaming.joins import attribute_purchases

    events = load_table(spark, sf_dir, "events")
    return attribute_purchases(events, how="left_outer").select(
        "purchase_id", "user_id", "amount", "view_id"
    )


@register(
    "e11_retention_matrix",
    oracle="""
    WITH ue AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    ), coh AS (
      SELECT user_id, MIN(w) AS cw FROM ue GROUP BY user_id
    )
    SELECT CAST(coh.cw AS DATE) AS cohort_week,
           CAST(date_diff('day', coh.cw, ue.w) // 7 AS BIGINT) AS week_offset,
           COUNT(*) AS n_active
    FROM ue JOIN coh ON ue.user_id = coh.user_id
    GROUP BY 1, 2
    """,
)
def e11_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle (§2.E extension — the ClickHouse
    ``retention()`` report shape): users cohorted by first-active ISO
    week; each cell (cohort_week, week_offset) counts users active
    that many weeks later.  Spark fuses the (user, week) dedup AND the
    cohort minimum into ONE user-keyed aggregate (collect_set of the
    user's active weeks — bounded by the calendar, not the event
    count, so the set stays tiny at any data scale — with
    array_min as the cohort), then explodes the set to cells: two
    exchanges total (user_id; then the |cohorts × offsets| cell
    aggregate) where the naive distinct + window + groupBy chain pays
    three.  The map-side partial collect_set is also the
    data-reducing step: the shuffle carries one row per user."""
    events = load_table(spark, sf_dir, "events")
    per_user = (
        events.select("user_id", F.date_trunc("week", F.col("ts")).alias("w"))
        .groupBy("user_id")
        .agg(F.collect_set("w").alias("weeks"))
        .select(F.array_min("weeks").alias("cw"), F.explode("weeks").alias("w"))
    )
    return per_user.groupBy(
        F.to_date("cw").alias("cohort_week"),
        F.expr("datediff(w, cw) div 7").cast("long").alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_active"))


@register(
    "e12_sequence_match",
    oracle="""
    WITH agg AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
      FROM events GROUP BY user_id
    ), after AS (
      SELECT a.user_id, a.s_ts,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > a.s_ts
                      THEN e.ts END) AS p_ts,
             MIN(CASE WHEN e.event_type = 'error' AND e.ts > a.s_ts
                      THEN e.ts END) AS err_ts
      FROM agg a JOIN events e ON e.user_id = a.user_id
      WHERE a.s_ts IS NOT NULL
      GROUP BY a.user_id, a.s_ts
    )
    SELECT user_id, s_ts AS signup_ts,
           (p_ts IS NOT NULL) AS matched,
           (p_ts IS NOT NULL AND (err_ts IS NULL OR err_ts >= p_ts))
             AS matched_clean
    FROM after
    """,
)
def e12_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (§2.E extension — the ClickHouse
    ``sequenceMatch('(?1).*(?2)')`` shape with a negative condition):
    per user, did a purchase follow the FIRST signup (``matched``), and
    did the earliest such purchase happen with NO error event strictly
    between signup and it (``matched_clean``)?  The pattern reduces to
    three conditional MINs — first signup, first purchase after it,
    first error after it — so the whole match is ONE pass: a user_id
    window for the signup anchor and a second conditional aggregate on
    the same key (one exchange, reused).  No self-join, no per-row
    regex state machine — the reduction is what survives 100 TB."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    anchored = events.withColumn(
        "s_ts",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    ).filter(F.col("s_ts").isNotNull())
    agg = anchored.groupBy("user_id", "s_ts").agg(
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("s_ts")),
                F.col("ts"),
            )
        ).alias("p_ts"),
        F.min(
            F.when(
                (F.col("event_type") == "error") & (F.col("ts") > F.col("s_ts")),
                F.col("ts"),
            )
        ).alias("err_ts"),
    )
    return agg.select(
        "user_id",
        F.col("s_ts").alias("signup_ts"),
        F.col("p_ts").isNotNull().alias("matched"),
        (
            F.col("p_ts").isNotNull()
            & (F.col("err_ts").isNull() | (F.col("err_ts") >= F.col("p_ts")))
        ).alias("matched_clean"),
    )


@register(
    "e13_gapfill_interpolate",
    oracle="""
    WITH base AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             COUNT(*) AS n_events,
             SUM(CAST(round(value * 10000) AS BIGINT)) AS day_units
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, MIN(day) AS md, MAX(day) AS xd FROM base GROUP BY 1
    ), cal AS (
      SELECT user_id,
             unnest(generate_series(md, xd, INTERVAL 1 DAY)) AS day
      FROM spans
    )
    SELECT c.user_id, c.day,
           COALESCE(b.n_events, 0) AS n_events,
           COALESCE(b.day_units, 0) / 10000.0 AS day_value,
           (b.n_events IS NULL) AS gap_filled,
           last_value(b.day_units IGNORE NULLS)
             OVER (PARTITION BY c.user_id ORDER BY c.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / 10000.0 AS locf_value
    FROM cal c LEFT JOIN base b USING (user_id, day)
    """,
)
def e13_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling + last-observation-carried-forward (§2.E
    extension — the ClickHouse ``ORDER BY … WITH FILL INTERPOLATE``
    shape the reference's dashboards rely on): per user, the daily
    activity series densified to EVERY calendar day in that user's
    observed [first, last] span; missing days appear with n_events=0,
    day_value=0 and a ``gap_filled`` marker, and ``locf_value`` carries
    the last observed day total forward across the gap.

    Spark shape: one (user_id, day) aggregate; spans via a second,
    strictly smaller aggregate on the same user_id key; the calendar is
    a shuffle-FREE ``sequence()`` + ``explode`` over the span rows (the
    blow-up is bounded by calendar days, never by event count — 365
    rows/user/year no matter how many trillions of events); then one
    left join back on (user_id, day) and a user-keyed LOCF window.
    Value arithmetic stays in exact fixed-point units end to end
    (functions/fixed_units), so the filled series hashes identically on
    any partitioning."""
    events = load_table(spark, sf_dir, "events")
    base = events.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(fixed_units("value", 4)).alias("day_units"),
    )
    spans = base.groupBy("user_id").agg(
        F.min("day").alias("md"), F.max("day").alias("xd")
    )
    cal = spans.select(
        "user_id",
        F.explode(F.sequence("md", "xd", F.expr("interval 1 day"))).alias("day"),
    )
    joined = cal.join(base, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias("n_events"),
        (
            F.coalesce(F.col("day_units"), F.lit(0).cast("long")) / F.lit(10000.0)
        ).alias("day_value"),
        F.col("n_events").isNull().alias("gap_filled"),
        (
            F.last("day_units", ignorenulls=True).over(w) / F.lit(10000.0)
        ).alias("locf_value"),
    )


@register(
    "e14_transition_matrix",
    oracle="""
    WITH t AS (
      SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ), c AS (
      SELECT src, dst, COUNT(*) AS n_trans
      FROM t WHERE dst IS NOT NULL GROUP BY 1, 2
    )
    SELECT src, dst, n_trans,
           CAST(SUM(n_trans) OVER (PARTITION BY src) AS BIGINT) AS src_total,
           CAST(n_trans * 1000000
                // SUM(n_trans) OVER (PARTITION BY src) AS BIGINT) AS prob_ppm
    FROM c
    """,
)
def e14_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (§2.E extension — the behavioral-analytics complement of
    e12's pattern match): for every ordered (src → dst) adjacent pair
    within a user's timeline, the transition count and its per-src
    probability in exact parts-per-million integer arithmetic.

    Spark shape: ONE user-keyed ordered window for ``lead()`` (the only
    event-volume shuffle), then a |types|² cell aggregate and a window
    over the tiny cell table for the row-normalizer — the expensive
    partitioning is touched once, and probability normalization happens
    on the 25-row matrix, not the event stream.  Integer ppm (floor
    division) avoids cross-engine double division drift."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = events.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    c = (
        t.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    ws = Window.partitionBy("src")
    return c.select(
        "src",
        "dst",
        "n_trans",
        F.sum("n_trans").over(ws).alias("src_total"),
        F.expr("CAST(n_trans * CAST(1000000 AS BIGINT) div "
               "sum(n_trans) OVER (PARTITION BY src) AS BIGINT)").alias("prob_ppm"),
    )


@register(
    "e15_zscore_anomaly",
    oracle="""
    WITH q AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 10000) AS BIGINT) AS v_u
      FROM events
    ), s AS (
      SELECT event_id, user_id, ts, v_u,
             CAST(COUNT(v_u) OVER w AS BIGINT) AS n,
             CAST(COALESCE(SUM(v_u) OVER w, 0) AS BIGINT) AS s1,
             CAST(COALESCE(SUM(v_u * v_u) OVER w, 0) AS BIGINT) AS s2
      FROM q
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts, v_u / 10000.0 AS value, n
    FROM s
    WHERE n >= 8
      AND (n * v_u - s1) * (n * v_u - s1) * (n - 1) > 9 * n * (n * s2 - s1 * s1)
    """,
)
def e15_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection (§2.E extension — the
    time-series outlier pass any monitoring/quality pipeline runs):
    flag an event whose value deviates from its user's trailing-window
    mean by more than 3 sample standard deviations.  The test
    ``(x - mean)^2 > 9·var`` is cleared of divisions/sqrt by
    cross-multiplying into ``(n·x - s1)^2·(n-1) > 9·n·(n·s2 - s1^2)``
    — every term an exact BIGINT on 4-decimal fixed-point units, so
    both engines agree bit-for-bit (no float variance recurrences,
    whose summation order differs across engines by design).

    Scale shape: one shuffle on user_id, a bounded 20-row trailing
    frame (constant state per row — Spark streams ROWS frames), no
    joins.  The trailing frame excludes the current row so a genuine
    spike cannot mask itself by inflating its own baseline."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", fixed_units("value", 4).alias("v_u")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    s = ev.select(
        "event_id",
        "user_id",
        "ts",
        "v_u",
        F.count("v_u").over(w).alias("n"),
        F.coalesce(F.sum("v_u").over(w), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("v_u") * F.col("v_u")).over(w), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    n, v, s1, s2 = F.col("n"), F.col("v_u"), F.col("s1"), F.col("s2")
    dev = n * v - s1
    return (
        s.filter((n >= 8) & (dev * dev * (n - 1) > F.lit(9) * n * (n * s2 - s1 * s1)))
        .select(
            "event_id",
            "user_id",
            "ts",
            (v / F.lit(10000.0)).alias("value"),
            "n",
        )
    )


# ONE statement of the OHLC relation, shared verbatim by the batch
# query (e16) and its streaming twin (h13) — the bar spec lives in
# exactly two places total: this SQL and ohlc_window_agg's aggregate
# list (which BOTH queries execute).
OHLC_ORACLE = """
    WITH e AS (
      SELECT event_type,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bar_hour,
             CAST(round(value * 100) AS BIGINT) AS v_c2,
             epoch_ms(ts) * 1000000 + event_id AS okey
      FROM events)
    SELECT bar_hour, event_type,
           arg_min(v_c2, okey) AS open_c2,
           CAST(max(v_c2) AS BIGINT) AS high_c2,
           CAST(min(v_c2) AS BIGINT) AS low_c2,
           arg_max(v_c2, okey) AS close_c2,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(v_c2) AS BIGINT) AS flow_c2
    FROM e GROUP BY bar_hour, event_type
    """


@register("e16_ohlc_bars", oracle=OHLC_ORACLE)
def e16_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars (§2.E extension — the time-bucketed
    first/high/low/last rollup ClickHouse serves with
    argMin/argMax + min/max over toStartOfHour buckets), executed
    through the SHARED batch/stream transform
    (streaming/windows.py:ohlc_window_agg — withWatermark is a no-op
    in batch, and the 1-hour window start equals date_trunc('hour')):
    per (event_type, hour), open/close at the min/max composite
    ordering key (epoch-millis·10⁶ + event_id — a total order while
    event_id < 10⁶, the fixture contract; Spark's min_by would take a
    struct key beyond that, DuckDB's arg_min would not), plus
    high/low/count/sum in fixed-point cents.  ONE map-side-combinable
    hash aggregate — no window sort, no self-join.  h13 runs the SAME
    transform as an append-mode stream against the SAME oracle text
    (``OHLC_ORACLE``)."""
    from ..streaming.windows import ohlc_window_agg

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    return ohlc_window_agg(ev)


@register(
    "e17_ewma_smoothing",
    oracle="""
    WITH v AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 10000) AS BIGINT) AS v_u
      FROM events),
    l AS (
      SELECT event_id, user_id, ts, v_u,
             lag(v_u, 1) OVER w AS l1, lag(v_u, 2) OVER w AS l2,
             lag(v_u, 3) OVER w AS l3, lag(v_u, 4) OVER w AS l4,
             lag(v_u, 5) OVER w AS l5, lag(v_u, 6) OVER w AS l6,
             lag(v_u, 7) OVER w AS l7
      FROM v
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id, ts,
           (128 * v_u
            + 64 * COALESCE(l1, 0) + 32 * COALESCE(l2, 0)
            + 16 * COALESCE(l3, 0) + 8 * COALESCE(l4, 0)
            + 4 * COALESCE(l5, 0) + 2 * COALESCE(l6, 0)
            + 1 * COALESCE(l7, 0)) AS numer_u,
           (128
            + CASE WHEN l1 IS NULL THEN 0 ELSE 64 END
            + CASE WHEN l2 IS NULL THEN 0 ELSE 32 END
            + CASE WHEN l3 IS NULL THEN 0 ELSE 16 END
            + CASE WHEN l4 IS NULL THEN 0 ELSE 8 END
            + CASE WHEN l5 IS NULL THEN 0 ELSE 4 END
            + CASE WHEN l6 IS NULL THEN 0 ELSE 2 END
            + CASE WHEN l7 IS NULL THEN 0 ELSE 1 END) AS denom,
           CAST(128 * v_u
            + 64 * COALESCE(l1, 0) + 32 * COALESCE(l2, 0)
            + 16 * COALESCE(l3, 0) + 8 * COALESCE(l4, 0)
            + 4 * COALESCE(l5, 0) + 2 * COALESCE(l6, 0)
            + 1 * COALESCE(l7, 0) AS DOUBLE)
           / (128
            + CASE WHEN l1 IS NULL THEN 0 ELSE 64 END
            + CASE WHEN l2 IS NULL THEN 0 ELSE 32 END
            + CASE WHEN l3 IS NULL THEN 0 ELSE 16 END
            + CASE WHEN l4 IS NULL THEN 0 ELSE 8 END
            + CASE WHEN l5 IS NULL THEN 0 ELSE 4 END
            + CASE WHEN l6 IS NULL THEN 0 ELSE 2 END
            + CASE WHEN l7 IS NULL THEN 0 ELSE 1 END) / 10000 AS ewma
    FROM l
    """,
)
def e17_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (§2.E extension —
    ClickHouse's exponentialMovingAverage window analog): α = 1/2,
    truncated at 8 taps so the weights 2⁷…2⁰ are exact BIGINTs — the
    IEEE-recurrence form (s = αx + (1-α)s) is partition-order-
    dependent at the ulp level and unverifiable across engines; the
    truncated integer form is bit-exact and loses < 2⁻⁸ of the mass.
    Start-of-series partial windows renormalize by the PRESENT weight
    sum (denom), not the full 255 — no warm-up bias.  Shape: one
    shuffle on user_id; the 7 lags share one window sort and stream
    in constant memory (pure ROWS-frame offsets), then a single
    division at the boundary.  The numer/denom integers carry the
    exact state; the double quotient is one correctly-rounded IEEE op
    so both engines agree bit-for-bit."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", fixed_units("value", 4).alias("v_u")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("v_u", j).over(w).alias(f"l{j}") for j in range(1, 8)]
    d = ev.select("event_id", "user_id", "ts", "v_u", *lags)
    numer = F.lit(128) * F.col("v_u")
    denom = F.lit(128)
    for j in range(1, 8):
        wgt = 1 << (7 - j)
        numer = numer + F.lit(wgt) * F.coalesce(F.col(f"l{j}"), F.lit(0))
        denom = denom + F.when(F.col(f"l{j}").isNull(), F.lit(0)).otherwise(
            F.lit(wgt)
        )
    return d.select(
        "event_id",
        "user_id",
        "ts",
        numer.cast("long").alias("numer_u"),
        denom.cast("long").alias("denom"),
        (numer.cast("double") / denom / F.lit(10000)).alias("ewma"),
    )


def rolling_active_users(ev: DataFrame, window_days: int = 7) -> DataFrame:
    """The e19 plan body over any events-shaped frame (shared with the
    window-edge unit test so the test exercises the REAL query logic):
    distinct (user, day) pairs → contribution explode over the next
    ``window_days`` days → count-distinct per day present in the
    data."""
    du = ev.select("user_id", F.to_date("ts").alias("act_day")).distinct()
    contrib = du.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("o"),
        "act_day",
    ).select("user_id", F.date_add("act_day", F.col("o")).alias("target_day"))
    days = du.select(F.col("act_day").alias("target_day")).distinct()
    return (
        contrib.join(F.broadcast(days), "target_day")
        .groupBy("target_day")
        .agg(F.countDistinct("user_id").alias("mau7"))
    )


@register(
    "e19_rolling_active_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_day FROM events
    ), contrib AS (
      SELECT user_id, act_day + CAST(o AS INT) AS target_day
      FROM du, unnest(range(0, 7)) t(o)
    ), days AS (
      SELECT DISTINCT act_day AS target_day FROM du
    )
    SELECT c.target_day,
           COUNT(DISTINCT c.user_id) AS mau7
    FROM contrib c JOIN days d ON c.target_day = d.target_day
    GROUP BY c.target_day
    """,
)
def e19_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users (§2.E extension — the
    windowed COUNT(DISTINCT) no window frame can express, because
    distinct doesn't decompose over sliding frames): each (user, day)
    activity CONTRIBUTES to the 7 target days it keeps the user
    active for (a 7× explode of the |users×days| DISTINCT pairs, not
    of raw events), then one count-distinct per target day, restricted
    to days that exist in the data.  This contribution-explode is the
    standard EXACT shape at scale — the alternative is an approximate
    sliding HLL (c23's sketch machinery).  Two shuffles total: the
    pair distinct and the final count-distinct."""
    return rolling_active_users(load_table(spark, sf_dir, "events"))
