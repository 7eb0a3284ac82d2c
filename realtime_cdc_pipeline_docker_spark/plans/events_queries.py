"""Event-stream analytics over the `events` table (SURVEY §2.B JSON ops,
§2.E analytics, §2.H batch analogs of windowed streaming aggs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..functions import fixed_units
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
    gap_ms = F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
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
