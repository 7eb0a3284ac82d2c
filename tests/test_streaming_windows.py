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
    """Two availableNow runs sharing one checkpoint: run 1 processes the
    fixture and persists its watermark (max ts − 2 h); run 2 sees a file
    holding one event 3 h old — beyond the restored watermark — which
    must be dropped, never emitted.  (Two separate runs make the
    ordering deterministic; a single multi-file run would depend on file
    mtime ordering.)"""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    hi = events.agg(F.max("ts").alias("hi")).collect()[0]["hi"]
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)

    out_dir = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            windowed_event_agg(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir)

    events.coalesce(1).write.mode("append").parquet(src)
    run_once()  # run 1: establishes watermark = hi - 2h in the checkpoint

    late = spark.range(1).select(
        F.lit(999999).alias("user_id"),
        F.lit(999999).alias("event_id"),
        (F.lit(hi).cast("timestamp_ntz") - F.expr("INTERVAL 3 HOURS")).alias("ts"),
        F.lit("late_probe").alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    late.write.mode("append").parquet(src)
    out = run_once()  # run 2: resumes from checkpoint, late event dropped
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


def test_dedup_within_watermark_drops_stream_duplicates(spark, sf_dir, tmp_path):
    """Feed the fixture twice (simulated redelivery) through
    dropDuplicatesWithinWatermark — the sink receives each (user_id,
    event_id) once; state stays bounded by the watermark."""
    from realtime_cdc_pipeline_docker_spark.streaming.windows import (
        dedup_events_within_watermark,
    )

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    src = str(tmp_path / "src")
    events.coalesce(1).write.mode("append").parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)  # redelivery
    doubled = spark.read.parquet(src)
    assert doubled.count() == 2 * events.count()

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        dedup_events_within_watermark(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("deduped")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("deduped")
    assert out.count() == events.select("user_id", "event_id").distinct().count()


def test_stream_session_window_equals_batch(spark, sf_dir, tmp_path):
    """The e2h claim held under readStream: the native session_window
    aggregate with a watermark, drained via availableNow, must produce
    exactly the batch sessions (no session straddles the drain because
    the watermark only finalizes — it cannot split — windows)."""
    src = str(tmp_path / "events")
    _write_events(spark, sf_dir, src)

    def sessions(df):
        # Streaming watermarks require TIMESTAMP (LTZ): NTZ event time
        # must be anchored to a zone at the stream boundary (session tz
        # is pinned to UTC in get_session, so the cast is the identity
        # convention).  Batch side gets the same cast so both compare.
        withtz = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return (
            withtz.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
    )
    q = (
        sessions(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(map(tuple, spark.table("stream_sessions").collect()))
    batch = sorted(map(tuple, sessions(spark.read.schema(EVENTS_SCHEMA).parquet(src)).collect()))
    assert streamed == batch and len(streamed) > 0
