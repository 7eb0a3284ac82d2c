"""Event-time windowed streaming (SURVEY §2.H4 upgrade path) and custom
stateful operators.

The reference handles late/out-of-order data purely by version-collapse
at the sink (init-clickhouse.sql:18); this module adds the Structured
Streaming upgrade SURVEY §2.H4 names: ``withWatermark`` + event-time
windows for bounded state, and an ``applyInPandasWithState`` sessionizer
as the custom-stateful-operator pattern (arbitrary per-key state the
built-in operators can't express).

Design notes for scale:

- The windowed aggregate is ONE transform shared by batch and streaming
  callers — Structured Streaming's incrementalization contract.  State
  per (window, event_type) is a counter+sum, bounded by the watermark:
  2 h of hourly windows × |event types| rows, independent of input rate.
- The sessionizer keys state by user: O(active users) state rows, each a
  few longs.  Closed sessions are emitted and dropped from state, so
  state is bounded by concurrent-open-session count, not history.
- Both operators shuffle once on their grouping key — the minimum for
  the semantics.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions import epoch_ms, fixed_units, is_timestamp_type

SESSION_GAP_MS = 30 * 60 * 1000


def windowed_event_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window aggregate over an events-shaped frame.

    Works identically under ``spark.read`` and ``spark.readStream``
    (``withWatermark`` is a no-op in batch) — the batch registry query
    ``h4_events_hourly`` is this operator's golden twin.

    Event time must be session-timezone TIMESTAMP for watermarking
    (TIMESTAMP_NTZ carries no instant), so the fixture's ntz column is
    cast on the way in — a representation change only; the session runs
    UTC."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(fixed_units("value", 4)) / F.lit(10000.0)).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour"), "event_type", "n_events", "total_value"
        )
    )


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# (session_start_ms, last_ts_ms, n_events) of the currently-open session.
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user session folding: events extend the open session while the
    gap stays ≤ 30 min; a larger gap closes it (emit) and opens a new
    one.  State is the single open session — closed sessions leave state
    immediately.  Requires per-batch event-time order within the key,
    which the caller establishes by sorting each pandas batch."""
    (user_id,) = key
    if state.exists:
        start_ms, last_ms, n = state.get
    else:
        start_ms = last_ms = -1
        n = 0
    closed: list[tuple[int, int, int, int]] = []
    for pdf in pdfs:
        for ts_ms in pdf.sort_values("ts_ms")["ts_ms"]:
            ts_ms = int(ts_ms)
            if start_ms < 0:
                start_ms, last_ms, n = ts_ms, ts_ms, 1
            elif ts_ms - last_ms <= SESSION_GAP_MS:
                last_ms, n = ts_ms, n + 1
            else:
                closed.append((user_id, start_ms, last_ms, n))
                start_ms, last_ms, n = ts_ms, ts_ms, 1
    if start_ms >= 0:
        state.update((start_ms, last_ms, n))
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start_ms", "session_end_ms", "n_events"]
        )


def sessionize(events: DataFrame) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``.

    Emits CLOSED sessions (a session closes when a later event of the
    same user arrives > 30 min after it ends).  The open tail session per
    user lives in state and is not emitted — exactly the semantics a
    continuous stream needs.  Batch golden twin: the gaps-and-islands
    window query (e2d) restricted to sessions that have a successor."""
    ts_type = events.schema["ts"].dataType
    if is_timestamp_type(ts_type):
        ts_ms = epoch_ms("ts", ts_type)
    else:  # string/long inputs from raw stream sources: parse first
        ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    prepped = events.select("user_id", ts_ms.alias("ts_ms"))
    return prepped.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_events_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_id"),
    watermark: str = "2 hours",
) -> DataFrame:
    """In-stream exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key's fingerprint only
    until the watermark passes it, so state is O(events per watermark
    window), not O(all history) — the native upgrade of the engine's
    sink-side idempotence (SURVEY §2.H5): duplicates are dropped before
    they ever reach the sink, and the versioned collapse still catches
    anything that slips between restarts."""
    return events.withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def ohlc_window_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window OHLC bars, batch/stream shared transform (the
    streaming twin of the e16 batch query): per (event_type, window),
    open/close = value at the min/max composite ordering key
    (epoch-millis·10⁶ + event_id — a total order, so micro-batch
    arrival order can never change a bar), plus high/low/count/sum in
    fixed-point cents.

    ``min_by``/``max_by`` are declarative aggregates with a
    merge-able (value, key) state pair, so Structured Streaming
    incrementalizes them exactly like sum/count: state per open
    (window, type) bar is a few longs, bounded by the watermark —
    out-of-order events within the watermark fold into the right bar
    by KEY comparison, not arrival order, which is the whole point of
    the composite key."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    e = e.select(
        "ts",
        "event_type",
        fixed_units("value").alias("v_c2"),
        (F.unix_millis("ts") * F.lit(1000000) + F.col("event_id")).alias("okey"),
    )
    return (
        e.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.min_by("v_c2", "okey").alias("open_c2"),
            F.max("v_c2").cast("long").alias("high_c2"),
            F.min("v_c2").cast("long").alias("low_c2"),
            F.max_by("v_c2", "okey").alias("close_c2"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v_c2").cast("long").alias("flow_c2"),
        )
        .select(
            F.col("win.start").alias("bar_hour"),
            "event_type",
            "open_c2",
            "high_c2",
            "low_c2",
            "close_c2",
            "n_events",
            "flow_c2",
        )
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked native session windows, batch/stream shared
    transform (the streaming twin of the e2h batch query, and the
    built-in-operator counterpart of the applyInPandasWithState
    sessionizer above): per user, events merge into one session while
    consecutive gaps stay < ``gap`` (Spark merges events exactly gap
    apart — the strict boundary e2h documents); ``end`` is last event
    + gap by Spark's definition.

    This is THE state-merging streaming aggregate: unlike tumbling
    windows, session windows GROW and MERGE in the state store as
    out-of-order events arrive within the watermark, and a session is
    emitted exactly once — when the watermark passes its end and it
    can no longer merge with anything.  State per user is the set of
    open sessions (a few timestamps + a count), bounded by the
    watermark."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        e.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


class _scoped_confs:
    """Set session confs for the duration of a streaming query START
    (restored afterwards).  A streaming query clones the session conf
    at start, so confs set here are per-query physical-layout choices,
    not session-wide behavior changes."""

    def __init__(self, spark, confs: dict[str, str]):
        self.spark, self.confs = spark, confs

    def __enter__(self):
        self.old = {k: self.spark.conf.get(k) for k in self.confs}
        for k, v in self.confs.items():
            self.spark.conf.set(k, v)

    def __exit__(self, *exc):
        for k, v in self.old.items():
            self.spark.conf.set(k, v)


class _scoped_shuffle_partitions(_scoped_confs):
    """Scope ``spark.sql.shuffle.partitions`` around a streaming query
    start.  A stateful streaming query pins its STATE partition count
    from the session conf at first batch — it is a per-query
    physical-layout choice, not a session one, so it must be sized to
    the query's state cardinality: a few thousand state rows sharded
    32 ways is pure per-partition state-store maintenance overhead
    (round-9 h13 decomposition: 3 605 state rows × 32 partitions ran
    2.5–5.9 s/run with the widest variance in the suite; 8 partitions
    → 1.4–1.8 s, tight.  The same per-task scheduling floor as the
    PageRank iteration sizing, PERF.md §Round-8).  On a real cluster
    the caller passes a count sized rows/250k-ish and ≥ executor
    parallelism; ``None`` keeps the session default."""

    def __init__(self, spark, n: int | None):
        super().__init__(
            spark,
            {} if n is None else {"spark.sql.shuffle.partitions": str(n)},
        )


def run_session_stream(
    spark,
    src_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the session-window aggregation as an append-mode file-source
    stream.  Append mode emits a session once the watermark passes its
    end; callers flushing a bounded fixture must plant a far-future
    sentinel (under a user id excluded from the assertion surface) so
    the final watermark passes every real session's end — the
    sentinel's own session stays open in state and never reaches the
    sink (the h13/h14 sentinel contract).  ``state_partitions`` sizes
    the query's pinned state-store shard count (see
    ``_scoped_shuffle_partitions``); the fixture default suits the
    O(10⁴)-open-session test state."""
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    with _scoped_shuffle_partitions(spark, state_partitions):
        (
            session_window_agg(stream)
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    return spark.read.parquet(sink_dir)


def run_ohlc_stream(
    spark,
    src_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the OHLC aggregation as an append-mode file-source stream.

    Append mode only emits a bar once the watermark passes its window
    end — the production contract (a bar is published exactly once,
    when it can no longer change).  Callers that need EVERY bar of a
    bounded fixture flushed must ensure the source contains events
    advancing the watermark past the last real window (the h13 query
    plants a far-future sentinel per type; the sentinel's own
    still-open bar never emits, so it needs no output filtering).
    ``state_partitions`` sizes the query's pinned state-store shard
    count (see ``_scoped_shuffle_partitions``); the fixture default
    suits the |types|×|hours| ≈ 3.6 k-bar test state."""
    schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(schema).parquet(src_dir)
    with _scoped_shuffle_partitions(spark, state_partitions):
        (
            ohlc_window_agg(stream)
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    return spark.read.parquet(sink_dir)
