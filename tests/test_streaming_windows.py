"""Watermarked windowed aggregation + stateful sessionization tests
(SURVEY §2.H4 upgrade path, §5.3 stream==batch invariant)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.catalog import load_table
from realtime_cdc_pipeline_docker_spark.streaming.windows import (
    SESSION_GAP_MS,
    sessionize,
    windowed_event_agg,
)

EVENTS_SCHEMA = "user_id long, event_id long, ts timestamp_ntz, event_type string, value double"


def _write_events(spark, sf_dir, out_dir):
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    events.coalesce(2).write.mode("overwrite").parquet(out_dir)
    return events


def test_stream_windowed_agg_equals_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events")
    events = _write_events(spark, sf_dir, src)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        windowed_event_agg(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hourly_agg")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("hourly_agg")

    batch = windowed_event_agg(spark.read.schema(EVENTS_SCHEMA).parquet(src))
    key = ["hour", "event_type", "n_events", "total_value"]
    assert sorted(map(tuple, streamed.select(key).collect())) == sorted(
        map(tuple, batch.select(key).collect())
    )
    assert streamed.count() > 0


def test_watermark_drops_late_event(spark, sf_dir, tmp_path):
    """update mode + maxFilesPerTrigger=1: a second file carrying an
    event 3 h older than the watermark (2 h) must not re-open its
    window — the window's count never increases past the on-time value."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    bounds = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    # file 1 (processed first): the full fixture
    events.coalesce(1).write.mode("overwrite").parquet(src + "/f1.parquet")
    # file 2 (processed second): one late event, 3h before max ts
    late_ts = bounds["hi"] - F.expr("INTERVAL 3 HOURS")
    late = spark.range(1).select(
        F.lit(999999).alias("user_id"),
        F.lit(999999).alias("event_id"),
        F.lit(bounds["hi"]).cast("timestamp_ntz").alias("ts"),
        F.lit("late_probe").alias("event_type"),
        F.lit(0.0).alias("value"),
    ).withColumn("ts", late_ts)
    late.write.mode("overwrite").parquet(src + "/f2.parquet")

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*.parquet")
    )
    q = (
        windowed_event_agg(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("late_agg")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("late_agg")
    # The late probe's window/type combination must never have been
    # emitted: the event was dropped by the watermark.
    assert out.filter(F.col("event_type") == "late_probe").count() == 0


def test_sessionize_stream_matches_batch_closed_sessions(spark, sf_dir, tmp_path):
    src = str(tmp_path / "events")
    events = _write_events(spark, sf_dir, src)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        sessionize(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table("sessions")

    # Batch golden twin: gaps-and-islands sessions that HAVE a successor
    # (i.e. closed by a later event of the same user).
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_ms")
    e = events.select(
        "user_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms")
    )
    marked = e.withColumn(
        "new_sess",
        F.when(
            F.lag("ts_ms").over(w).isNull()
            | (F.col("ts_ms") - F.lag("ts_ms").over(w) > SESSION_GAP_MS),
            1,
        ).otherwise(0),
    ).withColumn("sess_id", F.sum("new_sess").over(w))
    sessions = marked.groupBy("user_id", "sess_id").agg(
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )
    last_per_user = sessions.groupBy("user_id").agg(F.max("sess_id").alias("last_id"))
    closed = sessions.join(last_per_user, "user_id").filter(
        F.col("sess_id") < F.col("last_id")
    )

    key = ["user_id", "session_start_ms", "session_end_ms", "n_events"]
    assert sorted(map(tuple, streamed.select(key).collect())) == sorted(
        map(tuple, closed.select(key).collect())
    )
