"""Stream-stream joins (SURVEY §2.H upgrade path).

The reference pipeline never joins two live streams — each CDC table
flows to its own sink and joins happen at query time in ClickHouse
(daily_report.py:21-33 joins the *materialized* tables).  Structured
Streaming can do the join online: an inner join of two streams with
watermarks on both sides and an event-time range condition keeps
bounded state (each side buffers only rows inside
``watermark + horizon``) and emits exactly the batch-equivalent result.

Scale design:

- Both sides shuffle once on the equi key (``user_id``); the range
  condition is a residual, so the join is a co-partitioned hash join,
  never a cross product.
- State per side is O(rows within the watermark window per key) —
  independent of total history.  Without the time-range bound Spark
  would have to buffer a side forever; the ``horizon`` interval is what
  lets the state store evict.
- The transform is one shared function for batch and streaming
  (``withWatermark`` is a no-op in batch), so the batch registry query
  ``h6_stream_stream_attribution`` is the oracle-checked golden twin of
  the streaming run (tests/test_streaming_join.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases(
    events: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Purchase→view attribution: every (purchase, prior view) pair of
    the same user with the view at most ``horizon`` before the purchase.

    Works identically under ``spark.read`` and ``spark.readStream`` on
    an events-shaped frame (event_id, ts timestamp, user_id, event_type,
    value).  All qualifying pairs are emitted (attribution *candidates*;
    a last-touch reduction is a downstream groupBy on purchase_id, which
    streaming would run as a windowed aggregate).

    ``how="left_outer"`` keeps unattributed purchases (NULL view
    columns).  Under streaming, Spark withholds a left row until the
    watermark passes the point where a match could still arrive — the
    NULL emission is watermark-gated, which is exactly what makes the
    outer result correct under late data and is asserted in
    tests/test_streaming_join.py (a purchase's NULL row appears only
    once newer events advance the watermark past it)."""
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        views,
        (F.col("v_user") == F.col("user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
        how,
    ).select("purchase_id", "user_id", "purchase_ts", "amount", "view_id", "view_ts")
