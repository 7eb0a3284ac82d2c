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
