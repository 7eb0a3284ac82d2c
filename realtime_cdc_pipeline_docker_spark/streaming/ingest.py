"""Streaming corpus ingestion: the §2.J curation surface under
Structured Streaming.

The batch pipeline (j6c/j7) assumes the corpus is at rest; a production
training-data system ingests continuously — crawl drops, license
deliveries, synthetic generations land as files and must flow through
the same gates before a tokenizer ever sees them.  This module runs the
stateless curation gates inside a file stream and makes the sink
idempotent under redelivery and restart, mirroring the CDC pipeline's
H1/H2/H3/H5 guarantees (streaming/pipeline.py) for documents instead of
change events.

Design notes, 100 TB shape:

- **Gates are stateless per row.**  ``quality_score`` and
  ``token_count`` are pure column expressions.  The repetition gate
  (max token frequency) is recomputed with higher-order array functions
  (``aggregate`` over ``array_distinct``) instead of the batch path's
  explode→groupBy — O(distinct·len) per document, zero state, no
  shuffle, so the micro-batch plan is a pure map and scales with input
  rate, not corpus size.
- **Dedup state is the sink itself.**  Cross-batch exact dedup probes
  each batch's digest against the digests already in the log
  (within-batch dups collapse first).  The log read is column-pruned
  to the 16-byte digest + doc_id, and the log is **digest-bucketed on
  disk** (``bucket = pmod(xxhash64(digest), N)`` partition column), so
  each micro-batch reads only the bucket directories its digests hash
  into — a bucket-local probe, not a full-log scan.  This is exactly
  the CDC sink's idempotence point, so replayed/redelivered files
  cannot double-ingest.
- **Keeper identity is arrival-order-free.**  The log admits a row for
  an already-seen digest only when its doc_id is *strictly lower* than
  the logged minimum, and the read-back collapses each digest to its
  min-doc_id row.  Whatever order deliveries (or micro-batch splits —
  ``availableNow`` may drain in several batches) arrive in, the
  surviving keeper is the global MIN(doc_id) per digest — the same
  keeper the batch golden and the SQL oracle compute.  Growth is
  bounded: a digest gains a row only on a strictly decreasing id.
- **No watermark needed**: documents carry no event time; dedup is
  identity-keyed (content digest), not time-windowed, and the sink
  probe bounds state to the persisted log rather than executor memory.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import token_count, ws_tokens

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def rowwise_top_word_frac(text_col="text") -> F.Column:
    """Max-token-frequency / n_tokens as a pure column expression
    (stream-safe twin of ``operators.text.repetition_signals``'s
    ``top_word_frac``, which needs explode→groupBy).  Cost is
    O(distinct·len) per row — fine for documents, since both factors
    are bounded by document length, not corpus size."""
    toks = ws_tokens(F.lower(F.trim(F.col(text_col) if isinstance(text_col, str) else text_col)))
    top = F.aggregate(
        F.array_distinct(toks),
        F.lit(0),
        lambda acc, t: F.greatest(acc, F.size(F.filter(toks, lambda x: x == t))),
    )
    return top.cast("double") / F.size(toks)


def curation_gate(
    df: DataFrame,
    min_tokens: int = 20,
    min_quality: float = 0.55,
    max_top_word_frac: float = 0.12,
) -> DataFrame:
    """The j6c gate set, stateless: length + composite quality +
    repetition.  Works identically on batch and streaming frames."""
    from ..operators.text import quality_score

    return df.filter(
        (token_count("text") >= min_tokens)
        & (quality_score() >= min_quality)
        & (rowwise_top_word_frac() <= max_top_word_frac)
    )


def _read_log(spark: SparkSession, log_dir: str) -> DataFrame | None:
    """Read the curated log if it exists, else None.  Probes via the
    reader itself (AnalysisException on a missing/empty path) instead
    of ``os.*`` calls, so the 'dedup state is the sink' contract holds
    for any Hadoop-compatible URI (hdfs://, s3a://), not just the
    local filesystem."""
    try:
        return spark.read.parquet(log_dir)
    except AnalysisException:
        return None


def run_corpus_ingest_stream(
    spark: SparkSession,
    src_dir: str,
    log_dir: str,
    checkpoint_dir: str,
    min_tokens: int = 20,
    min_quality: float = 0.55,
    max_top_word_frac: float = 0.12,
    log_buckets: int = 16,
) -> DataFrame:
    """Ingest a parquet file stream of raw documents through the
    curation gates into an exact-deduped curated log; returns the log
    read back as a batch frame (one min-doc_id row per digest).
    ``availableNow`` drains what exists (tests / backfills); drop the
    trigger for continuous runs.

    The log is written ``partitionBy(bucket)`` with
    ``bucket = pmod(xxhash64(digest), log_buckets)``, and each
    micro-batch probe filters the log read to the buckets its own
    digests hash into — partition pruning makes the probe bucket-local
    (verified via ``inputFiles()`` in tests/test_streaming_ingest.py).
    The per-batch list of touched buckets is a driver-side collect of
    at most ``log_buckets`` small integers."""
    stream = spark.readStream.schema(DOCUMENT_SCHEMA).parquet(src_dir)
    gated = curation_gate(stream, min_tokens, min_quality, max_top_word_frac).withColumn(
        "digest", F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
    )
    bucket_expr = F.pmod(F.xxhash64("digest"), F.lit(log_buckets)).cast("int")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Within-batch: one row per digest (deterministic min doc_id).
        # Cross-batch/redelivery: admit a row for a logged digest only
        # when its doc_id is strictly below the logged minimum — the
        # sink is the dedup state (idempotence point), and min-keeper
        # identity holds whatever order batches land in.
        collapsed = (
            batch_df.withColumn(
                "__rn",
                F.row_number().over(Window.partitionBy("digest").orderBy("doc_id")),
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("bucket", bucket_expr)
        )
        log = _read_log(batch_df.sparkSession, log_dir)
        if log is not None:
            # The probe consumes the batch twice (touched-bucket list +
            # join); persist only then — on a fresh log the write is
            # the sole consumer and caching would be pure overhead.
            collapsed = collapsed.persist()
        batch = collapsed
        try:
            if log is not None:
                touched = [r[0] for r in batch.select("bucket").distinct().collect()]
                seen = (
                    log.filter(F.col("bucket").isin(touched))
                    .groupBy("digest")
                    .agg(F.min("doc_id").alias("__logged_min"))
                )
                batch = (
                    batch.join(seen, "digest", "left")
                    .filter(
                        F.col("__logged_min").isNull()
                        | (F.col("doc_id") < F.col("__logged_min"))
                    )
                    .drop("__logged_min")
                )
            # Cluster by bucket before the partitioned append: without
            # this every task writes a sliver into every bucket dir
            # (tasks x buckets small files, measured 4x slower at
            # sf0.1); with it each bucket gets one file per batch.
            batch.repartition("bucket").write.mode("append").partitionBy(
                "bucket"
            ).parquet(log_dir)
        finally:
            if log is not None:
                collapsed.unpersist()

    query = (
        gated.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    log = _read_log(spark, log_dir)
    if log is None:
        return spark.createDataFrame(
            [], DOCUMENT_SCHEMA.add("digest", T.StringType())
        )
    return (
        log.withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy("digest").orderBy("doc_id")),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn", "bucket")
    )


def run_event_dedup_stream(
    spark: SparkSession,
    src_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    dedup_horizon: str = "365 days",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Exactly-once event ingestion via Spark's native watermarked
    dedup state: ``dropDuplicatesWithinWatermark("event_id")``.

    The corpus log (run_corpus_ingest_stream) keeps dedup state in the
    sink because document identity is content-keyed and unbounded in
    time.  Events are the opposite shape — identity is a key plus an
    event time — so the idiomatic Spark answer is the built-in
    watermark-scoped dedup store: duplicates of an event are dropped
    for as long as its event time is above the watermark, and the state
    for older events is evicted automatically.

    100 TB contract: state size is bounded by (event rate x
    ``dedup_horizon``), NOT by stream lifetime — the horizon must cover
    the worst redelivery window (here: wider than the fixture's whole
    time span, so dedup is exact under any micro-batch split; in
    production, the at-least-once source's redelivery SLA).  A
    duplicate older than the horizon is by definition outside the
    delivery contract.  The sink append is the same parquet+checkpoint
    commit protocol as the CDC pipeline (H2/H5): a restart replays
    no batch and re-appends nothing.

    ``state_partitions`` sizes the query's pinned state-store shard
    count (windows._scoped_shuffle_partitions); the fixture default
    suits the O(10⁵)-key test state — production sizes it to
    (event rate × horizon) / target-rows-per-shard.
    """
    from .windows import _scoped_shuffle_partitions

    batch_schema = spark.read.parquet(src_dir).schema
    stream = spark.readStream.schema(batch_schema).parquet(src_dir)
    deduped = stream.withWatermark("ts", dedup_horizon).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    with _scoped_shuffle_partitions(spark, state_partitions):
        (
            deduped.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    return spark.read.parquet(sink_dir)


def compact_log(spark: SparkSession, log_dir: str, files_per_bucket: int = 1) -> dict:
    """Compact the curated log's per-micro-batch small files.

    Every micro-batch appends one file per touched bucket, so a
    long-running ingest accumulates O(batches x buckets) files and the
    bucket-pruned probe degrades from "read one file" to "open
    hundreds of footers".  Standard table maintenance: rewrite each
    bucket partition into ``files_per_bucket`` files, sorted by digest
    (footer min/max on the probe key -> row-group skipping within the
    bucket).

    Mechanics: the log is eagerly ``localCheckpoint``-ed to sever
    lineage from the input files, then written back with *dynamic*
    partition overwrite — only bucket partitions present in the data
    are replaced, the commit is per-partition atomic, and a concurrent
    reader sees each bucket either old or new (both collapse to the
    same min-doc_id state, so the dedup contract is unaffected
    mid-compaction).  At 100 TB you run this rolling, a few buckets
    per pass; the per-bucket rewrite below is the whole algorithm.

    Returns {"files_before": n, "files_after": m} so operators can
    assert the win.
    """
    log = _read_log(spark, log_dir)
    if log is None:
        return {"files_before": 0, "files_after": 0}
    files_before = len(log.inputFiles())
    # Eager materialization: Spark (correctly) refuses to overwrite a
    # path an active plan still reads from; the checkpoint breaks that
    # file lineage.  Size note: the log carries digests + keeper ids,
    # not document bodies — checkpointing it is cheap relative to the
    # corpus.
    snap = log.localCheckpoint(eager=True)
    # Cluster on (bucket, digest-salt): every (bucket, salt) pair hashes
    # to one task, and a task writes one file per bucket value it holds
    # — so each bucket dir ends up with at most ``files_per_bucket``
    # files, whatever the task count.
    (
        snap.repartition(
            F.col("bucket"), F.pmod(F.xxhash64("digest"), F.lit(files_per_bucket))
        )
        .sortWithinPartitions("digest")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(log_dir)
    )
    after = _read_log(spark, log_dir)
    return {
        "files_before": files_before,
        "files_after": len(after.inputFiles()) if after is not None else 0,
    }
