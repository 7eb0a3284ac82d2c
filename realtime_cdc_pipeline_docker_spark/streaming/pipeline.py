"""Structured Streaming CDC pipeline.

Reproduces the reference's streaming path (cdc_processor.py:58-145)
Spark-first:

    source (envelope JSON) → two-phase decode → foreachBatch idempotent
    append to a versioned parquet log → latest-state collapse view

Differences from the reference, by design (SURVEY §2.H):

- **Idempotent sink** instead of blind JDBC append (H5): each
  micro-batch is deduplicated on (key, ts_ms) before appending, and the
  collapse view is itself idempotent under redelivery, so an
  at-least-once source yields an effectively-once end state.
- **No swallow-and-continue** (H6): a failing batch fails the query;
  recovery is checkpoint restart, which replays the failed batch.
- ``trigger(availableNow=True)`` for deterministic test/backfill runs;
  production uses the default micro-batch trigger like the reference.

In production the source is ``spark.readStream.format("kafka")`` with
``startingOffsets=earliest`` (cdc_processor.py:64-70); tests use a file
source with the identical envelope schema — the transform is shared
(sources/cdc.py), which is exactly Structured Streaming's batch/stream
unification guarantee.

Scale notes: decode is stateless and pipelines with the source scan; the
only stateful piece is the collapse, which runs merge-on-read (or as a
periodic compaction job).  Checkpointing gives exactly-once offsets
tracking per query; one query per table (multi-runner below) mirrors the
reference's 4 concurrent streams and isolates per-table failure/skew.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.cdc import DEBEZIUM_ENVELOPE_SCHEMA, decode_envelope


def run_cdc_stream(
    spark: SparkSession,
    envelope_dir: str,
    log_dir: str,
    checkpoint_dir: str,
    payload_schema: T.StructType,
    key_cols: Sequence[str] = ("id",),
    available_now: bool = True,
    partition_cols: Sequence[str] = (),
    cluster_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Run the CDC pipeline over a file-based envelope stream.

    Returns the appended versioned log (read back as a batch DataFrame).
    Pass the result to ``operators.latest_state`` for the current-state
    view (init-clickhouse.sql:18 semantics).

    ``partition_cols``/``cluster_cols`` route the log through the mart
    sink (sinks/mart.py): date-partitioned, key-clustered appends — the
    production layout where compaction scope and collapse reads are
    bounded per partition.
    """
    from ..sinks.mart import write_mart

    stream = spark.readStream.schema(DEBEZIUM_ENVELOPE_SCHEMA).json(envelope_dir)
    decoded = decode_envelope(stream, payload_schema)
    dedup_cols = [*key_cols, "ts_ms", "sign"]
    cluster = tuple(cluster_cols) if cluster_cols is not None else tuple(key_cols)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotence point (H5): replayed events inside a redelivered
        # batch collapse to one row; cross-batch duplicates are handled
        # by latest_state's deterministic rank.
        write_mart(
            batch_df.dropDuplicates(dedup_cols),
            log_dir,
            partition_cols=tuple(partition_cols),
            cluster_cols=cluster,
        )

    writer = decoded.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.awaitTermination()
    return spark.read.parquet(log_dir)


def run_cdc_merge_stream(
    spark: SparkSession,
    envelope_dir: str,
    root: str,
    checkpoint_dir: str,
    payload_schema: T.StructType,
    version_col: str = "ts_ms",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    mode: str = "cow",
    compact_every: int | None = None,
) -> None:
    """CDC stream → versioned lake SNAPSHOT: each micro-batch is one
    ``merge_apply`` commit against the copy-on-write snapshot table at
    ``root`` (operators/snapshot.py) — the production shape where the
    Debezium stream maintains the queryable latest-state table
    DIRECTLY, instead of appending a change log that every reader must
    collapse (``run_cdc_stream``'s shape).  Trade-off, stated: the
    merge pays one touched-bucket rewrite per batch, the log shape
    pays a collapse per READ — a table read often and updated in
    narrow batches wants the merge, an audit log wants the log.

    Effectively-once WITHOUT a transactional sink: merge_apply's
    version arbitration (highest ``version_col`` wins, stored row wins
    ties) makes re-merging a delivered batch a visible-state no-op, so
    at-least-once delivery — Spark-retried batches, wiped-checkpoint
    replays, a second run over the same input — converges to the same
    relation (asserted byte-identical in tests).  Contract: within a
    delivery, (key, version) determines the payload; deletes tombstone
    (a replayed older update cannot resurrect the key).

    The snapshot table must exist (``init_snapshot_table``); empty
    micro-batches commit nothing (no version churn on idle triggers).

    ``mode`` picks the physical merge per micro-batch (COW for wide
    batches, MOR delta appends for the narrow continuous case —
    operators/snapshot.py's trade table); with MOR, ``compact_every``
    folds the deltas back every Nth micro-batch (batch_id cadence, so
    a checkpoint replay re-compacts the same batches — idempotent:
    compaction never changes the visible relation).
    """
    from ..operators.snapshot import compact_snapshot_deltas, merge_apply

    reader = spark.readStream.schema(DEBEZIUM_ENVELOPE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    decoded = decode_envelope(reader.json(envelope_dir), payload_schema)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        changes = batch_df.withColumnRenamed("ts_ms", version_col).drop("sign")
        if changes.isEmpty():
            return
        merge_apply(spark, root, changes, mode=mode)
        if compact_every and (batch_id + 1) % compact_every == 0:
            compact_snapshot_deltas(spark, root)

    writer = decoded.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    query.awaitTermination()


def run_multi_table_streams(
    spark: SparkSession,
    tables: dict[str, tuple[str, T.StructType]],
    work_dir: str,
) -> dict[str, DataFrame]:
    """Concurrent per-table streaming queries — mirrors the reference's
    4-stream runner + ``awaitAnyTermination`` (cdc_processor.py:139-145).

    ``tables`` maps table name → (envelope_dir, payload_schema).  All
    queries run under one SparkSession/scheduler, fail-together like the
    reference; with availableNow triggers they drain and terminate.
    """
    queries = {}
    for name, (envelope_dir, payload_schema) in tables.items():
        stream = spark.readStream.schema(DEBEZIUM_ENVELOPE_SCHEMA).json(envelope_dir)
        decoded = decode_envelope(stream, payload_schema)
        log_dir = os.path.join(work_dir, name, "log")

        def write_batch(batch_df: DataFrame, batch_id: int, _log_dir=log_dir) -> None:
            # Exact-row dedup: key-agnostic idempotence for redelivered
            # events (a replayed change event is identical in every
            # column; per-key versions differ in ts_ms/op).
            batch_df.dropDuplicates().write.mode("append").parquet(_log_dir)

        queries[name] = (
            decoded.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", os.path.join(work_dir, name, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    for q in queries.values():
        q.awaitTermination()
    return {
        name: spark.read.parquet(os.path.join(work_dir, name, "log")) for name in tables
    }


def run_enriched_cdc_stream(
    spark: SparkSession,
    envelope_dir: str,
    log_dir: str,
    checkpoint_dir: str,
    payload_schema: T.StructType,
    dim: DataFrame,
    join_expr,
    dim_cols: Sequence[str],
    key_cols: Sequence[str] = ("id",),
) -> DataFrame:
    """CDC stream with in-flight dimension enrichment: a **stream-static
    join** between the decoded change stream and a batch dimension
    table, resolved before the log append — so the mart lands denormal-
    ized and latest-state reads need no join at all (the reference
    leaves this join to ClickHouse query time; at 100 TB you pay it
    once per change event instead of once per query).

    The static side is ``broadcast()``: Structured Streaming re-plans
    the join every micro-batch (a dimension refresh between batches is
    picked up automatically — the documented stream-static semantics),
    and the broadcast keeps each micro-batch shuffle-free on the stream
    side.  LEFT join: a change event must never be dropped because its
    dimension row is missing (H6's no-swallow rule) — it lands with
    NULL enrichment and is observable.

    Same idempotence contract as ``run_cdc_stream``: per-batch
    (key, ts_ms, sign) dedup before the append, collapse downstream.
    """
    stream = spark.readStream.schema(DEBEZIUM_ENVELOPE_SCHEMA).json(envelope_dir)
    decoded = decode_envelope(stream, payload_schema)
    enriched = decoded.join(F.broadcast(dim), join_expr, "left").select(
        decoded["*"], *[dim[c] for c in dim_cols]
    )
    dedup_cols = [*key_cols, "ts_ms", "sign"]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.dropDuplicates(dedup_cols).write.mode("append").parquet(log_dir)

    (
        enriched.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(log_dir)


def run_ivm_aggregate_stream(
    spark: SparkSession,
    envelope_dir: str,
    ledger_dir: str,
    checkpoint_dir: str,
    payload_schema: T.StructType,
    partial_agg,
    group_cols: Sequence[str],
    metric_cols: Sequence[str],
) -> DataFrame:
    """Streaming materialized-view maintenance — the ClickHouse
    AggregatingMergeTree MV contract under Structured Streaming.

    Every micro-batch of CDC envelopes is expanded to signed delta rows
    (operators/history.py:signed_delta — stateless, pipelines with the
    source), reduced by ``partial_agg`` to a partial aggregate keyed by
    ``group_cols``, and APPENDED to a ledger with its batch id.  The
    view read merges the ledger: dedup on (batch_id, group) — so a
    re-attempted batch (foreachBatch is at-least-once within a
    checkpointed run) lands idempotently — then one SUM per metric.
    State size is O(groups × batches), compactable by the same
    merge at any time; the base stream is never rescanned.

    Exactly-once story: checkpoint tracks source offsets (a restart
    re-runs only uncommitted batches), the ledger append is made
    idempotent by the batch-id dedup — together, effectively-once
    aggregates without any blocking state store.
    """
    from ..operators.history import signed_delta

    stream = spark.readStream.schema(DEBEZIUM_ENVELOPE_SCHEMA).json(envelope_dir)
    deltas = signed_delta(stream, payload_schema)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        partial_agg(batch_df).withColumn("__batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(ledger_dir)

    (
        deltas.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    ledger = spark.read.parquet(ledger_dir)
    return (
        ledger.dropDuplicates(["__batch_id", *group_cols])
        .groupBy(*group_cols)
        .agg(*[F.sum(m).cast("long").alias(m) for m in metric_cols])
    )
