"""Stream-stream join: the streaming run of ``attribute_purchases``
must produce exactly its batch result (the oracle-checked
``h6_stream_stream_attribution``), with watermark-bounded join state.
"""

from __future__ import annotations

from realtime_cdc_pipeline_docker_spark.catalog import load_table
from realtime_cdc_pipeline_docker_spark.streaming.joins import attribute_purchases


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_attribution(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    q = (
        attribute_purchases(stream)
        .writeStream.format("memory")
        .queryName("attr_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    progress = q.lastProgress

    got = _rows(spark.table("attr_stream"))
    want = _rows(attribute_purchases(events))
    assert got == want and len(got) > 0

    # the join ran as a stateful streaming join, and state is bounded:
    # far fewer buffered rows than the input (watermark + horizon evict)
    ops = progress["stateOperators"]
    assert any("symmetricHashJoin" in (op.get("operatorName") or "") for op in ops)


def test_streaming_join_state_evicts(spark, sf_dir, tmp_path):
    """Two sequential micro-batches: after the second, the state store
    must NOT hold the full history of side rows — the watermark advanced
    past batch 1, so its buffered views/purchases are evicted."""
    events = load_table(spark, sf_dir, "events").orderBy("ts")
    n = events.count()
    first, second = str(tmp_path / "b1"), str(tmp_path / "b2")
    events.limit(n // 2).write.parquet(first)

    src = str(tmp_path / "src")
    spark.read.parquet(first).write.mode("append").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = attribute_purchases(stream)

    def run_once():
        q = (
            out.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
        return q.lastProgress

    run_once()
    # batch 2: the later half — watermark jumps to (max ts of batch 1) - 2h
    later = events.subtract(events.limit(n // 2))
    later.write.mode("append").parquet(src)
    prog = run_once()

    state_rows = sum(op["numRowsTotal"] for op in prog["stateOperators"])
    side_rows = (
        events.filter("event_type in ('view','purchase')").count()
    )
    assert 0 < state_rows < side_rows


def test_outer_join_null_emission_is_watermark_gated(spark, tmp_path):
    """Left-outer stream-stream join: an unmatched purchase's NULL row
    is withheld until the watermark proves no matching view can still
    arrive, then emitted exactly once."""
    import datetime

    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).write.mode("append").parquet(
            str(tmp_path / "src"), compression="none"
        )

    # Batch 1: one purchase with NO view anywhere near it.
    write_batch([(1, t0, 7, "purchase", 5.0)], "b1")
    src = str(tmp_path / "src")
    stream = spark.readStream.schema(schema).parquet(src)
    out = attribute_purchases(stream, how="left_outer")

    def drain():
        q = (
            out.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(str(tmp_path / "out"))

    got = drain()
    # Watermark has not passed the purchase yet: NULL row withheld.
    assert got.count() == 0

    # The query watermark is the MIN over BOTH sides' watermark nodes,
    # so future VIEWS alone never release the row — the purchase side
    # must also advance (a real property of outer stream-stream joins:
    # a quiet side holds the whole query's watermark back; the earlier
    # view-only variant of this test proved the row stays withheld
    # forever).  Once both sides advance, availableNow's trailing
    # no-data micro-batch applies the new watermark and emits.
    h12 = datetime.timedelta(hours=12)
    write_batch([(2, t0 + h12, 8, "view", None),
                 (3, t0 + h12, 99, "purchase", 1.0)], "b2")
    got = drain()
    rows = [tuple(r) for r in got.filter("purchase_id = 1")
            .select("purchase_id", "view_id").collect()]
    assert rows == [(1, None)]

    # More two-sided traffic: purchase 1's NULL row never repeats.
    write_batch([(6, t0 + datetime.timedelta(hours=15), 8, "view", None),
                 (7, t0 + datetime.timedelta(hours=15), 99, "purchase", 1.0)], "b4")
    assert drain().filter("purchase_id = 1").count() == 1
