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


def write_arrival_wave(df: DataFrame, src_dir: str, seq: int) -> None:
    """Append one arrival wave to a file-stream source dir and pin its
    files' mtime to a strictly increasing per-``seq`` timestamp.

    The FileStreamSource orders files by modification time; waves
    written back-to-back on a fast local filesystem can land
    same-millisecond mtimes, making the drain order — and any
    first-arrived-survives result downstream — nondeterministic
    (ADVICE r9).  Fixture writers (tests, registered queries) pin the
    order explicitly; production ingest does not need this (real
    deliveries are seconds apart, and the dedup ledgers' keeper
    semantics are arrival-order-stable per wave regardless).

    Local-filesystem-only by design: ``os.utime`` is the fixture
    mechanism, not part of the ingest contract."""
    import glob
    import os

    before = set(glob.glob(f"{src_dir}/part-*.parquet"))
    df.coalesce(1).write.mode("append").parquet(src_dir)
    base = 1_000_000_000  # fixed epoch: deterministic across runs
    for f in glob.glob(f"{src_dir}/part-*.parquet"):
        if f not in before:
            os.utime(f, (base + seq, base + seq))


def _ledger_is_small(
    led: DataFrame, max_files: int, max_bytes: int = 64 << 20
) -> bool:
    """Decide whether a per-batch ledger probe should SKIP the
    touched-bucket partition-prune collect (one driver job) and scan
    the whole ledger instead — the right call only while the ledger is
    genuinely tiny.

    Two driver-side signals, zero Spark jobs, and BOTH must say small:

    - file count (``inputFiles`` listing): a young un-compacted ledger
      has a few files; past ``max_files`` the prune always wins (and
      summing sizes over thousands of files would itself cost).
    - total bytes (Hadoop FileStatus over the <= ``max_files``
      listed files): a COMPACTED ledger can hold arbitrarily many rows
      in ``files_per_bucket`` files, so file count alone would
      full-scan a huge ledger forever — size is the signal that
      actually tracks the data (found while re-running the
      index_growth probe against the round-11 prune-skip)."""
    files = led.inputFiles()
    if len(files) > max_files:
        return False
    sc = led.sparkSession.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    total = 0
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        total += p.getFileSystem(conf).getFileStatus(p).getLen()
        if total > max_bytes:
            return False
    return True


def _concurrent_writes(*writes) -> None:
    """Run a micro-batch's independent ledger appends CONCURRENTLY
    (optimization guide §2.6 — overlap independent jobs: actions are
    only sequential because driver code calls them sequentially, and a
    small batch's append job is mostly scheduling + file-commit latency
    that another append's tasks can back-fill).

    Safe here because each append is an idempotent parquet append to
    its OWN directory, every input DataFrame is already persisted (or
    derived from one), and no append reads another's output within the
    batch: the ledger probes of batch N+1 read what batch N wrote, and
    the (tag, batch)-keyed replay exclusion never depends on the order
    appends landed WITHIN a batch — a crash that commits any subset is
    healed by the same replay contract as the old sequential form
    (foreachBatch re-runs the batch; own-(tag, batch) rows are
    invisible to the probes and duplicate appends collapse in the
    read-back).  Exceptions propagate so a failed append still fails
    the batch.  Single-element calls just run inline."""
    if len(writes) == 1:
        writes[0]()
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(writes)) as pool:
        futures = [pool.submit(w) for w in writes]
        for f in futures:
            f.result()


def write_arrival_waves(
    df: DataFrame, src_dir: str, wave_expr, n_waves: int
) -> None:
    """Write ``n_waves`` arrival waves (wave = ``wave_expr`` per row)
    into a file-stream source dir in ONE Spark job — the
    ``write_arrival_wave`` fixture contract (one file per wave,
    strictly increasing pinned mtimes) without one write job per wave:
    partition-by-wave into a scratch dir (``repartition`` on the wave
    key → exactly one file per wave), then driver-side rename + utime
    into place.  Fixture-only, local filesystem by design."""
    import glob
    import os
    import shutil

    tmp = f"{src_dir.rstrip('/')}__tmp"
    (
        df.withColumn("__wave", wave_expr.cast("int"))
        .repartition(n_waves, "__wave")
        .write.mode("overwrite")
        .partitionBy("__wave")
        .parquet(tmp)
    )
    os.makedirs(src_dir, exist_ok=True)
    base = 1_000_000_000  # fixed epoch: deterministic across runs
    for w in range(n_waves):
        parts = glob.glob(f"{tmp}/__wave={w}/part-*.parquet")
        if not parts:
            # A legitimately empty wave (no rows matched this wave
            # value) is skipped, preserving write_arrival_wave's
            # tolerance; the wave SEQUENCE stays intact because file
            # names/mtimes key on the wave number, not a dense index.
            continue
        if len(parts) != 1:
            # explicit raise, not assert: survives ``python -O`` and
            # names the fixture invariant (one file per wave) that the
            # repartition-by-wave contract is supposed to guarantee
            raise ValueError(
                f"write_arrival_waves: wave {w} produced {len(parts)} "
                f"part files; expected exactly 1 (repartition-by-wave "
                f"contract broken)"
            )
        dst = f"{src_dir}/part-wave-{w}.parquet"
        shutil.move(parts[0], dst)
        os.utime(dst, (base + w, base + w))
    shutil.rmtree(tmp)


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
        # Fresh StructType: StructType.add mutates in place, and
        # DOCUMENT_SCHEMA is a shared module constant the neardup
        # ledger schemas are also built from.
        return spark.createDataFrame(
            [],
            T.StructType(
                list(DOCUMENT_SCHEMA.fields)
                + [T.StructField("digest", T.StringType())]
            ),
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


def run_neardup_ingest_stream(
    spark: SparkSession,
    src_dir: str,
    log_dir: str,
    checkpoint_dir: str,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    index_buckets: int = 8,
    max_bucket_size: int | None = 1000,
    batch_shuffle_partitions: int | None = 8,
    max_files_per_trigger: int | None = None,
    prune_min_files: int = 64,
) -> DataFrame:
    """Incremental NEAR-duplicate corpus ingestion: dedup each arriving
    micro-batch against the AT-REST MinHash/LSH signature index, then
    append the survivors (and their signatures) idempotently — the
    composition a production 100 TB pipeline actually runs (VERDICT r8
    #6): the J2 batch dedup's signature machinery under the CDC
    pipeline's streaming delivery/idempotence contract.

    Semantics (the documented contract, mirrored by the SQL oracle and
    the batch twin ``operators.dedup.incremental_neardup_dedup``):

    - A new document is DROPPED iff it exact-Jaccard-verifies
      (>= ``jaccard_threshold`` over shingle-hash sets) against an
      INDEXED survivor, or against a SMALLER-doc_id document in its
      own batch (the shadow rule — order-free within the batch, and a
      batch peer shadows regardless of its own fate).
    - First-ARRIVED survives across batches: an indexed survivor
      suppresses later near-dups even when they carry smaller ids —
      incremental dedup is arrival-ordered by nature, which is exactly
      what distinguishes it from the batch min-keeper family (j2e).

    State & idempotence — the h12 LEDGER pattern, not a state store:

    - Two appended ledgers under ``log_dir``: ``docs/`` (survivor rows
      + their ``hs`` fingerprint sets) and ``index/`` (one
      (doc_id, band_id, band_hash) row per band per survivor,
      partitioned by ``bucket = pmod(xxhash64(band_hash),
      index_buckets)``).  Every row carries ``__batch_id`` plus a
      ``__run_tag`` derived from the CHECKPOINT path: batch ids are
      only unique within one checkpoint lineage (a redelivery run
      under a fresh checkpoint restarts at 0), so the own-batch
      exclusion below keys on (tag, batch) — a fresh-checkpoint
      batch 0 must still see the ORIGINAL run's batch-0 appends
      (found by the post-compaction redelivery test).
    - The per-batch probe EXCLUDES rows of its own (tag, batch) and
      dedups what it reads, so a replayed batch (foreachBatch is
      at-least-once within a run) recomputes the identical survivor
      set no matter which of the two appends the crash interrupted;
      read-back collapses duplicate appends by doc_id.  Redelivery of
      whole files under a NEW checkpoint is absorbed by the semantics
      itself: a redelivered document re-verifies against its own
      indexed copy at Jaccard 1.0 and is dropped.

    100 TB shape: per micro-batch — one signature pass over the BATCH
    (never the corpus), a band-bucket join against the index pruned to
    the <= ``index_buckets`` partitions the batch's band hashes touch
    (batch side tiny -> AQE broadcasts it against the at-rest scan),
    one fingerprint fetch from the docs ledger pruned to the
    candidates' doc_id-hash partitions (both ledgers are bucketed on
    disk), and the batch-local grouped pair generation
    (O(bucket) memory, capped).  Index growth is one small row per
    band per SURVIVOR; dropped documents never enter the index.
    ``batch_shuffle_partitions`` scopes the batch plans' shuffle width
    to the MICRO-BATCH size (windows._scoped_shuffle_partitions — the
    state-partition-sizing lesson applied to foreachBatch: the dedup
    DAG is ~10 stages, and inheriting a corpus-sized width makes each
    stage pure task-scheduling overhead on a small batch); production
    sizes it to batch rows / target-rows-per-task.  The per-batch
    survivor set is persisted once so the two ledger appends execute
    the dedup DAG exactly once.
    """
    from ..operators.dedup import _band_candidates, _banded, minhash_fingerprints

    docs_dir = f"{log_dir}/docs"
    index_dir = f"{log_dir}/index"
    rows_per_band = num_hashes // bands
    bucket_expr = F.pmod(F.xxhash64("band_hash"), F.lit(index_buckets)).cast("int")
    # Lineage tag: batch ids restart at 0 under a fresh checkpoint, so
    # the own-batch replay exclusion is keyed (tag, batch) — stable
    # across RESTARTS of one checkpoint, distinct across lineages.
    import hashlib as _hashlib

    run_tag = _hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    # Explicit ledger schemas: spark.read without a schema costs one
    # footer-inference job per probe per batch — the layouts are fixed.
    # (Built from a COPY of the fields: StructType.add mutates in place.)
    docs_ledger_schema = T.StructType(
        list(DOCUMENT_SCHEMA.fields)
        + [
            T.StructField("hs", T.ArrayType(T.LongType())),
            T.StructField("__batch_id", T.LongType()),
            T.StructField("__run_tag", T.StringType()),
            T.StructField("dbucket", T.IntegerType()),
        ]
    )
    dbucket_expr = F.pmod(F.xxhash64("doc_id"), F.lit(index_buckets)).cast("int")
    index_ledger_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("band_id", T.IntegerType()),
            T.StructField("band_hash", T.LongType()),
            T.StructField("__batch_id", T.LongType()),
            T.StructField("__run_tag", T.StringType()),
            T.StructField("bucket", T.IntegerType()),
        ]
    )

    def _read_ledger(sess: SparkSession, path: str, schema) -> DataFrame | None:
        try:
            df = sess.read.schema(schema).parquet(path)
            df.schema  # force analysis so a missing path surfaces here
            return df
        except AnalysisException:
            return None

    def _touched_buckets(led: DataFrame, probe) -> list | None:
        """Bucket list for partition-pruning the ledger probe, or None
        to scan the whole ledger.  The touched-bucket collect is one
        driver job per batch; on a YOUNG ledger (few files — the
        driver-side ``inputFiles`` listing, zero Spark jobs) a full
        scan is cheaper than the job that would prune it, so the
        collect is skipped until the ledger outgrows
        ``prune_min_files`` in files or 64 MB in bytes
        (``_ledger_is_small`` — both signals driver-side, zero Spark
        jobs).  At 100 TB the ledger is always past the threshold and
        every probe stays bucket-pruned — the contract
        tests/test_streaming_ingest.py pins on a grown ledger."""
        if _ledger_is_small(led, prune_min_files):
            return None
        return [r[0] for r in probe.distinct().collect()]

    def _verified(cand: DataFrame, left: DataFrame, right: DataFrame) -> DataFrame:
        """Exact-Jaccard gate over candidate (id_a, id_b) pairs, hs
        sets supplied by the two sides (the minhash_lsh_pairs verify
        shape)."""
        return (
            cand.join(left, "id_a")
            .join(right, "id_b")
            .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
            .filter(
                F.col("inter").cast("double")
                / (F.size("hs_a") + F.size("hs_b") - F.col("inter"))
                >= jaccard_threshold
            )
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        to_unpersist = []
        fp = minhash_fingerprints(
            batch_df, shingle_k=shingle_k, num_hashes=num_hashes
        )
        nb = _banded(fp, bands, rows_per_band).withColumn("bucket", bucket_expr)

        dropped = None
        idx = _read_ledger(sess, index_dir, index_ledger_schema)
        if idx is not None:
            # Bucket-pruned probe of the at-rest index (h8's partition
            # pruning); own-batch rows excluded so a replay recomputes
            # the same survivor set.  Replay-duplicated ledger rows are
            # NOT dedup'd here: duplicate index rows collapse in the
            # candidate .distinct(), duplicate fingerprint rows only
            # duplicate verify rows, and the left_anti consumer of the
            # drop-id set absorbs both — cheaper than per-probe shuffles.
            # Strictly-earlier batches of own lineage only (>=, not
            # ==): a wiped-checkpoint replay reuses batch id 0 under
            # the same run_tag and must see exactly its original
            # pre-batch state (ADVICE r10 — provably outcome-identical
            # here since later survivors never verify against earlier
            # ones, but byte-identical visibility is the stronger
            # invariant and costs nothing).
            not_later = ~(
                (F.col("__run_tag") == run_tag)
                & (F.col("__batch_id") >= batch_id)
            )
            touched = _touched_buckets(idx, nb.select("bucket"))
            ipred = (
                not_later
                if touched is None
                else F.col("bucket").isin(touched) & not_later
            )
            cand = (
                nb.join(
                    idx.filter(ipred).select(
                        F.col("doc_id").alias("id_b"), "band_id", "band_hash"
                    ),
                    ["band_id", "band_hash"],
                )
                .select(F.col("id").alias("id_a"), "id_b")
                .distinct()
            )
            # The docs ledger is written before the index ledger, so an
            # existing index implies an existing docs ledger — but that
            # invariant lives outside this function (external cleanup,
            # future reorder), so guard the None like the idx probe
            # does instead of AttributeError-ing inside foreachBatch.
            docs_led = _read_ledger(sess, docs_dir, docs_ledger_schema)
            if docs_led is not None:
                # Fingerprint fetch pruned to the candidates'
                # doc_id-hash partitions: at 100 TB the docs ledger is
                # corpus-sized and a per-batch full scan of (doc_id,
                # hs) would read terabytes; the candidate set is
                # batch-sized, so its bucket list is a <=
                # index_buckets driver collect.  On a young ledger the
                # collect (and the persist that amortizes cand across
                # it) is skipped entirely.
                if _ledger_is_small(docs_led, prune_min_files):
                    dpred = not_later
                else:
                    # persist BEFORE the collect so the candidate DAG
                    # runs once for (bucket list + verify join)
                    cand = cand.persist()
                    to_unpersist.append(cand)
                    dtouched = [
                        r[0]
                        for r in cand.select(
                            F.pmod(F.xxhash64("id_b"), F.lit(index_buckets))
                            .cast("int")
                            .alias("b")
                        )
                        .distinct()
                        .collect()
                    ]
                    dpred = F.col("dbucket").isin(dtouched) & not_later
                led = docs_led.filter(dpred).select(
                    F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b")
                )
                dropped = _verified(
                    cand,
                    fp.select(
                        F.col("id").alias("id_a"), F.col("hs").alias("hs_a")
                    ),
                    led,
                ).select(F.col("id_a").alias("doc_id"))

        pairs = _band_candidates(fp, bands, rows_per_band, max_bucket_size)
        shadowed = _verified(
            pairs,
            fp.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")),
            fp.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")),
        ).select(F.col("id_b").alias("doc_id"))
        # No .distinct(): the left_anti below ignores duplicate drop ids,
        # and deduping here would be one more exchange per batch.
        dropped = shadowed if dropped is None else shadowed.unionByName(dropped)

        survivors = (
            batch_df.join(dropped, "doc_id", "left_anti")
            # left join: a doc too short to shingle has no fp row but
            # is still a (trivially unique) survivor.
            .join(
                fp.select(F.col("id").alias("doc_id"), "hs"), "doc_id", "left"
            )
            .withColumn("__batch_id", F.lit(batch_id))
            .withColumn("__run_tag", F.lit(run_tag))
            .withColumn("dbucket", dbucket_expr)
            # One execution of the dedup DAG serves both ledger
            # appends below (unpersisted after; bounded by batch size).
            .persist()
        )
        try:
            # materialize once, then overlap the two independent ledger
            # appends (guide §2.6; safety argument at _concurrent_writes)
            survivors.count()

            def _append_docs() -> None:
                (
                    survivors.repartition("dbucket")
                    .write.mode("append")
                    .partitionBy("dbucket")
                    .parquet(docs_dir)
                )

            def _append_index() -> None:
                (
                    nb.join(
                        survivors.select(F.col("doc_id").alias("id")), "id"
                    )
                    .select(
                        F.col("id").alias("doc_id"),
                        "band_id",
                        "band_hash",
                        "bucket",
                        F.lit(batch_id).alias("__batch_id"),
                        F.lit(run_tag).alias("__run_tag"),
                    )
                    .repartition("bucket")
                    .write.mode("append")
                    .partitionBy("bucket")
                    .parquet(index_dir)
                )

            _concurrent_writes(_append_docs, _append_index)
        finally:
            survivors.unpersist()
            fp.unpersist()
            for df_ in to_unpersist:
                df_.unpersist()

    from .windows import _scoped_confs

    reader = spark.readStream.schema(DOCUMENT_SCHEMA)
    if max_files_per_trigger is not None:
        # One availableNow run drains in file-sized micro-batches (the
        # FileStreamSource orders files by modification time, so waves
        # written sequentially arrive in order) — the rate-limited
        # continuous-ingest cadence, vs one run per delivery when the
        # caller drains periodically.
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    scoped: dict[str, str] = {}
    if batch_shuffle_partitions is not None:
        # Explicit micro-batch sizing; with the width pinned, AQE's
        # stage-by-stage re-planning is pure latency on the ~10-stage
        # per-batch dedup DAG (measured 14.8 → 10.9 s for the 3-wave
        # fixture run at sf0.1) and its runtime join-strategy choice is
        # a known run-to-run variance source (the r6 j2 bimodality) —
        # static planning is both faster and more deterministic here.
        scoped = {
            "spark.sql.shuffle.partitions": str(batch_shuffle_partitions),
            "spark.sql.adaptive.enabled": "false",
        }
    with _scoped_confs(spark, scoped):
        (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    log = _read_ledger(spark, docs_dir, docs_ledger_schema)
    if log is None:
        return spark.createDataFrame([], DOCUMENT_SCHEMA)
    return (
        log.drop("__batch_id", "__run_tag", "hs", "dbucket")
        .dropDuplicates(["doc_id"])
    )


def _lineage_guard(df: DataFrame, path: str, allow_multi_lineage: bool) -> None:
    """Mechanically enforce the compactors' documented single-lineage
    constraint (ADVICE r10): keeping the MIN ``(__batch_id, __run_tag)``
    row lets a NEWER lineage's batch-0 redelivery row beat the original
    lineage's higher batch ids, which breaks the original lineage's
    crash-replay shield.  Compacting a multi-lineage ledger is only
    safe once every lineage has fully drained — the caller asserts
    that with ``allow_multi_lineage=True``."""
    if allow_multi_lineage:
        return
    tags = [
        r[0] for r in df.select("__run_tag").distinct().limit(2).collect()
    ]
    if len(tags) > 1:
        raise ValueError(
            f"ledger {path!r} holds rows from multiple checkpoint lineages"
            f" ({tags[0]!r}, {tags[1]!r}, …); compacting would let a newer"
            " lineage's low batch ids shadow the original lineage's state."
            " Pass allow_multi_lineage=True only if every lineage has"
            " fully drained."
        )


def compact_neardup_ledgers(
    spark: SparkSession,
    log_dir: str,
    files_per_bucket: int = 1,
    allow_multi_lineage: bool = False,
) -> dict:
    """Table maintenance for the incremental near-dup ledgers
    (``run_neardup_ingest_stream``): every micro-batch appends one
    docs file and one file per touched index bucket, and replayed
    batches add duplicate rows by design (merge-on-read collapses
    them) — a long-running ingest accumulates O(batches) small files
    and replay duplicates that every probe re-reads.

    Compaction collapses each ledger to its canonical state — one row
    per doc_id (docs) / per (doc_id, band_id) (index), keeping the
    MIN ``(__batch_id, __run_tag)`` row so a post-compaction replay of
    a crashed batch still sees pre-batch state (the own-batch
    exclusion contract; the ``__run_tag`` tiebreak makes the kept row
    deterministic when two lineages wrote the same batch id) — and
    rewrites:

    - the index with *dynamic* per-bucket partition overwrite (the
      ``compact_log`` mechanics: per-partition atomic, a concurrent
      probe sees each bucket either old or new, both collapse to the
      same state), rows sorted by ``band_hash`` so the bucket-local
      probe also gets footer min/max row-group skipping;
    - the docs ledger with the same dynamic per-``dbucket`` partition
      overwrite (it is doc_id-hash-bucketed on disk like the index),
      rows sorted by ``doc_id`` — both ledgers compact rolling, a few
      partitions per pass, with per-partition-atomic commits.

    Lineage constraint: the own-batch exclusion is keyed on the
    ORIGINAL writer's ``(__run_tag, __batch_id)``, so compaction must
    not run while two checkpoint lineages of one ledger interleave —
    a cross-lineage redelivery row kept over the original would stop
    shielding the original lineage's crash-replay (the replayed batch
    would see the doc's own row and self-drop it).  Run compaction
    only between ingest runs of a single lineage; the constraint is
    mechanically checked (``_lineage_guard``) — a multi-lineage ledger
    raises unless the caller asserts every lineage has drained via
    ``allow_multi_lineage=True``.

    Returns {"files_before": n, "files_after": m} per ledger."""
    docs_dir = f"{log_dir}/docs"
    index_dir = f"{log_dir}/index"
    out: dict = {}

    docs = _read_log(spark, docs_dir)
    if docs is not None:
        _lineage_guard(docs, docs_dir, allow_multi_lineage)
        before = len(docs.inputFiles())
        w = Window.partitionBy("doc_id").orderBy("__batch_id", "__run_tag")
        snap = (
            docs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint(eager=True)
        )
        (
            snap.repartition(
                F.col("dbucket"),
                F.pmod(F.xxhash64("doc_id"), F.lit(files_per_bucket)),
            )
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("dbucket")
            .parquet(docs_dir)
        )
        out["docs"] = {
            "files_before": before,
            "files_after": len(spark.read.parquet(docs_dir).inputFiles()),
        }

    idx = _read_log(spark, index_dir)
    if idx is not None:
        _lineage_guard(idx, index_dir, allow_multi_lineage)
        before = len(idx.inputFiles())
        w = Window.partitionBy("doc_id", "band_id").orderBy(
            "__batch_id", "__run_tag"
        )
        snap = (
            idx.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint(eager=True)
        )
        (
            snap.repartition(
                F.col("bucket"),
                F.pmod(F.xxhash64("band_hash"), F.lit(files_per_bucket)),
            )
            .sortWithinPartitions("band_hash")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(index_dir)
        )
        out["index"] = {
            "files_before": before,
            "files_after": len(spark.read.parquet(index_dir).inputFiles()),
        }
    return out


def run_curation_pipeline_stream(
    spark: SparkSession,
    src_dir: str,
    benchmark: DataFrame,
    log_dir: str,
    checkpoint_dir: str,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    index_buckets: int = 8,
    max_bucket_size: int | None = 1000,
    n_gram: int = 5,
    min_overlaps: int = 1,
    min_tokens: int = 20,
    min_quality: float = 0.55,
    max_top_word_frac: float = 0.12,
    max_files_per_trigger: int | None = None,
    batch_shuffle_partitions: int | None = 8,
    prune_min_files: int = 64,
) -> DataFrame:
    """The composed INGEST PIPELINE (§2.H × J1/J8/J4/J2 — VERDICT r11
    #7, the integration row the H-suite earns): ONE stream running the
    production gate order over every arriving micro-batch —

    1. **decontaminate** (h17 mechanics): word-``n_gram`` overlap vs
       the broadcast benchmark set; contaminated rows are flagged and
       never considered further (an eval gram must not transit the
       training store);
    2. **quality gates** (h8's ``curation_gate`` set, stateless):
       token count, composite quality score, repetition;
    3. **exact dedup** (j1 under arrival order): whitespace-normalized
       md5 digest, first-arrived-survives — batch-local keep-first
       (smaller doc_id shadows, regardless of its own fate) plus a
       gbucket-pruned probe of the at-rest ``digests/`` ledger of
       ACCEPTED documents;
    4. **near-dup** (h15 mechanics): MinHash/LSH probe of the at-rest
       band index + exact-Jaccard verification against accepted
       survivors' fingerprints, and the batch-local smaller-id shadow
       rule over the GATE-PASSING peers.

    Survivors append themselves into ``curated/`` (doc + digest + hs,
    dbucket-partitioned), their band rows into ``index/``
    (bucket-partitioned) and their digest into ``digests/``
    (gbucket-partitioned) — all (tag, batch)-keyed with the ``>=``
    wiped-replay exclusion, the h15 idempotence contract verbatim.
    Gate FLAGS are pure per-document functions, so the ``audit/``
    ledger rows (doc_id, quarantined, passed_quality) carry no lineage
    at all (content-addressed, the h17/h21 gate-ledger pattern);
    ``survived`` is DERIVED from curated-ledger membership, so a
    redelivered survivor — which re-verifies against its own indexed
    copy at Jaccard 1.0 and drops — still reads back as survived.

    Why one stream instead of four: the gates must compose without
    state interference — stage N's ledger only ever sees rows that
    passed stages 1..N-1, which is exactly what the SQL oracle
    (the h17 gram relation + h8's quality predicate + the
    NEARDUP_WAVES fold restricted to gate-passing docs, plus
    digest-equality pairs) re-derives.  Stream == composed batch SQL
    row-for-row; redelivery/replay pinned in
    tests/test_streaming_ingest.py.

    100 TB shape, per micro-batch: one broadcast gram join (batch ×
    eval set, exchange-free corpus side), one stateless filter, one
    signature pass over the GATE-PASSING slice only (the gates run
    first precisely so the expensive probes see the smallest frame),
    then the h15 bucket-pruned ledger probes — batch-sized shuffles
    throughout, ledger scans partition-pruned to touched buckets.

    Returns ``(doc_id, quarantined, passed_quality, survived)`` for
    every ingested document."""
    from ..operators.dedup import (
        _band_candidates,
        _banded,
        decontaminate,
        minhash_fingerprints,
        prepare_benchmark_grams,
    )

    curated_dir = f"{log_dir}/curated"
    index_dir = f"{log_dir}/index"
    digests_dir = f"{log_dir}/digests"
    audit_dir = f"{log_dir}/audit"
    rows_per_band = num_hashes // bands
    bucket_expr = F.pmod(F.xxhash64("band_hash"), F.lit(index_buckets)).cast("int")
    dbucket_expr = F.pmod(F.xxhash64("doc_id"), F.lit(index_buckets)).cast("int")
    gbucket_expr = F.pmod(F.xxhash64("digest"), F.lit(index_buckets)).cast("int")
    digest_expr = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    )
    import hashlib as _hashlib

    run_tag = _hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]

    curated_schema = T.StructType(
        list(DOCUMENT_SCHEMA.fields)
        + [
            T.StructField("digest", T.StringType()),
            T.StructField("hs", T.ArrayType(T.LongType())),
            T.StructField("__batch_id", T.LongType()),
            T.StructField("__run_tag", T.StringType()),
            T.StructField("dbucket", T.IntegerType()),
        ]
    )
    index_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("band_id", T.IntegerType()),
            T.StructField("band_hash", T.LongType()),
            T.StructField("__batch_id", T.LongType()),
            T.StructField("__run_tag", T.StringType()),
            T.StructField("bucket", T.IntegerType()),
        ]
    )
    digests_schema = T.StructType(
        [
            T.StructField("digest", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("__batch_id", T.LongType()),
            T.StructField("__run_tag", T.StringType()),
            T.StructField("gbucket", T.IntegerType()),
        ]
    )
    audit_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("quarantined", T.BooleanType()),
            T.StructField("passed_quality", T.BooleanType()),
            T.StructField("abucket", T.IntegerType()),
        ]
    )

    bench = benchmark.persist()
    bench.count()
    # Eval-side gram set + short sizes built ONCE per lineage (the
    # prepare_benchmark_grams contract): per-batch rebuilds re-ran the
    # benchmark subtree AND a driver job every micro-batch.
    prepared_bench = prepare_benchmark_grams(bench, n=n_gram)

    def _read_ledger(sess: SparkSession, path: str, schema) -> DataFrame | None:
        try:
            df = sess.read.schema(schema).parquet(path)
            df.schema
            return df
        except AnalysisException:
            return None

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        to_unpersist = []
        not_later = ~(
            (F.col("__run_tag") == run_tag) & (F.col("__batch_id") >= batch_id)
        )

        # 1+2: stateless gate FLAGS for every batch doc, one pass
        flagged = decontaminate(
            batch_df, bench, n=n_gram, min_overlaps=min_overlaps,
            prepared=prepared_bench,
        ).select("doc_id")
        from ..operators.text import quality_score

        marked = (
            batch_df.join(
                flagged.withColumn("__quar", F.lit(True)), "doc_id", "left"
            )
            .withColumn("quarantined", F.coalesce("__quar", F.lit(False)))
            .withColumn(
                "passed_quality",
                (token_count("text") >= min_tokens)
                & (quality_score() >= min_quality)
                & (rowwise_top_word_frac() <= max_top_word_frac),
            )
            .drop("__quar")
            .persist()
        )
        to_unpersist.append(marked)
        q = marked.filter(
            ~F.col("quarantined") & F.col("passed_quality")
        ).withColumn("digest", digest_expr)

        try:
            # 3: exact dedup — batch-local keep-first over the
            # gate-passing slice …
            wdig = Window.partitionBy("digest").orderBy("doc_id")
            dropped = (
                q.withColumn("__rn", F.row_number().over(wdig))
                .filter(F.col("__rn") > 1)
                .select("doc_id")
            )
            # … plus the gbucket-pruned at-rest digest probe
            digl = _read_ledger(sess, digests_dir, digests_schema)
            if digl is not None:
                dpred = not_later
                if not _ledger_is_small(digl, prune_min_files):
                    touched = [
                        r[0]
                        for r in q.select(gbucket_expr.alias("g"))
                        .distinct()
                        .collect()
                    ]
                    dpred = F.col("gbucket").isin(touched) & dpred
                dropped = dropped.unionByName(
                    q.join(
                        digl.filter(dpred).select("digest"),
                        "digest",
                        "left_semi",
                    ).select("doc_id")
                )

            # 4: near-dup — fingerprints over the gate-passing slice
            fp = minhash_fingerprints(
                q, shingle_k=shingle_k, num_hashes=num_hashes
            )
            to_unpersist.append(fp)
            nb = _banded(fp, bands, rows_per_band).withColumn(
                "bucket", bucket_expr
            )
            # batch-local shadow (smaller id shadows regardless of fate)
            pairs = _band_candidates(fp, bands, rows_per_band, max_bucket_size)
            hs_a = fp.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"))
            hs_b = fp.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))

            def _jacc(cand, left, right):
                return (
                    cand.join(left, "id_a")
                    .join(right, "id_b")
                    .withColumn(
                        "inter", F.size(F.array_intersect("hs_a", "hs_b"))
                    )
                    .filter(
                        F.col("inter").cast("double")
                        / (F.size("hs_a") + F.size("hs_b") - F.col("inter"))
                        >= jaccard_threshold
                    )
                )

            dropped = dropped.unionByName(
                _jacc(pairs, hs_a, hs_b).select(F.col("id_b").alias("doc_id"))
            )
            # at-rest probe of the accepted band index + hs fetch
            idx = _read_ledger(sess, index_dir, index_schema)
            if idx is not None:
                ipred = not_later
                if not _ledger_is_small(idx, prune_min_files):
                    touched = [
                        r[0]
                        for r in nb.select("bucket").distinct().collect()
                    ]
                    ipred = F.col("bucket").isin(touched) & ipred
                cand = (
                    nb.join(
                        idx.filter(ipred).select(
                            F.col("doc_id").alias("id_b"),
                            "band_id",
                            "band_hash",
                        ),
                        ["band_id", "band_hash"],
                    )
                    .select(F.col("id").alias("id_a"), "id_b")
                    .distinct()
                )
                cur = _read_ledger(sess, curated_dir, curated_schema)
                if cur is not None:
                    if _ledger_is_small(cur, prune_min_files):
                        cpred = not_later
                    else:
                        cand = cand.persist()
                        to_unpersist.append(cand)
                        ctouched = [
                            r[0]
                            for r in cand.select(
                                F.pmod(
                                    F.xxhash64("id_b"), F.lit(index_buckets)
                                )
                                .cast("int")
                                .alias("b")
                            )
                            .distinct()
                            .collect()
                        ]
                        cpred = F.col("dbucket").isin(ctouched) & not_later
                    dropped = dropped.unionByName(
                        _jacc(
                            cand,
                            hs_a,
                            cur.filter(cpred).select(
                                F.col("doc_id").alias("id_b"),
                                F.col("hs").alias("hs_b"),
                            ),
                        ).select(F.col("id_a").alias("doc_id"))
                    )

            survivors = (
                q.join(dropped, "doc_id", "left_anti")
                .join(
                    fp.select(F.col("id").alias("doc_id"), "hs"),
                    "doc_id",
                    "left",
                )
                .withColumn("__batch_id", F.lit(batch_id))
                .withColumn("__run_tag", F.lit(run_tag))
                .withColumn("dbucket", dbucket_expr)
                .drop("quarantined", "passed_quality")
                .persist()
            )
            to_unpersist.append(survivors)
            # materialize survivors BEFORE the concurrent appends so
            # all four writers read the cached rows instead of racing
            # to compute the dedup DAG
            survivors.count()

            def _append_curated() -> None:
                (
                    survivors.repartition("dbucket")
                    .write.mode("append")
                    .partitionBy("dbucket")
                    .parquet(curated_dir)
                )

            def _append_index() -> None:
                (
                    nb.join(
                        survivors.select(F.col("doc_id").alias("id")), "id"
                    )
                    .select(
                        F.col("id").alias("doc_id"),
                        "band_id",
                        "band_hash",
                        "bucket",
                        F.lit(batch_id).alias("__batch_id"),
                        F.lit(run_tag).alias("__run_tag"),
                    )
                    .repartition("bucket")
                    .write.mode("append")
                    .partitionBy("bucket")
                    .parquet(index_dir)
                )

            def _append_digests() -> None:
                (
                    survivors.select(
                        "digest",
                        "doc_id",
                        "__batch_id",
                        "__run_tag",
                        gbucket_expr.alias("gbucket"),
                    )
                    .repartition("gbucket")
                    .write.mode("append")
                    .partitionBy("gbucket")
                    .parquet(digests_dir)
                )

            def _append_audit() -> None:
                # content-addressed gate flags (no lineage: pure
                # per-doc).  Bucket-partitioned like the other three
                # ledgers (VERDICT r12 #4: the earlier coalesce(1)
                # serialized the whole batch's flags — one row per
                # ingested doc — through a single task at production
                # batch widths).
                (
                    marked.select("doc_id", "quarantined", "passed_quality")
                    .withColumn("abucket", dbucket_expr)
                    .repartition("abucket")
                    .write.mode("append")
                    .partitionBy("abucket")
                    .parquet(audit_dir)
                )

            # The four ledger appends are independent (distinct dirs,
            # persisted inputs): overlap their job-scheduling + commit
            # latency (guide §2.6; safety argument at _concurrent_writes)
            _concurrent_writes(
                _append_curated, _append_index, _append_digests, _append_audit
            )
        finally:
            for df_ in to_unpersist:
                df_.unpersist()

    from .windows import _scoped_confs

    reader = spark.readStream.schema(DOCUMENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    scoped: dict[str, str] = {}
    if batch_shuffle_partitions is not None:
        scoped = {
            "spark.sql.shuffle.partitions": str(batch_shuffle_partitions),
            "spark.sql.adaptive.enabled": "false",
        }
    with _scoped_confs(spark, scoped):
        (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    bench.unpersist()
    prepared_bench[0].unpersist()
    audit = _read_ledger(spark, audit_dir, audit_schema)
    out_schema = T.StructType(
        list(audit_schema.fields) + [T.StructField("survived", T.BooleanType())]
    )
    if audit is None:
        return spark.createDataFrame([], out_schema)
    cur = _read_ledger(spark, curated_dir, curated_schema)
    accepted = (
        cur.select("doc_id").distinct()
        if cur is not None
        else spark.createDataFrame([], "doc_id long")
    )
    return (
        audit.dropDuplicates(["doc_id"])
        .join(accepted.withColumn("__s", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            "quarantined",
            "passed_quality",
            F.coalesce("__s", F.lit(False)).alias("survived"),
        )
    )


def compact_curation_ledgers(
    spark: SparkSession,
    log_dir: str,
    files_per_bucket: int = 1,
    allow_multi_lineage: bool = False,
) -> dict:
    """Table maintenance for the composed curation pipeline's four
    ledgers (``run_curation_pipeline_stream``) — the standing invariant
    that EVERY unbounded ledger has a compactor:

    - ``curated/`` (dbucket-partitioned, key doc_id), ``index/``
      (bucket-partitioned, key (doc_id, band_id)) and ``digests/``
      (gbucket-partitioned, key (digest, doc_id)): the
      ``compact_media_ledgers`` mechanics — MIN (__batch_id,
      __run_tag) keeper per key, dynamic per-bucket partition
      overwrite, sorted within partitions for footer skipping,
      single-lineage mechanically enforced.
    - ``audit/``: content-addressed gate flags (no lineage columns by
      design) — plain dropDuplicates(doc_id) + rewrite, the
      ``compact_gate_ledgers`` keeper rule, but partition-wise like
      the other three (the ledger is ``abucket``-partitioned on
      doc_id hash since round 13).

    Run between ingest runs (flat overwrite is not append-concurrent),
    like every compactor here.  Returns per-ledger file/row counts."""
    out: dict = {}
    for sub, key_cols, bucket_col, sort_col in (
        ("curated", ["doc_id"], "dbucket", "doc_id"),
        ("index", ["doc_id", "band_id"], "bucket", "band_hash"),
        ("digests", ["digest", "doc_id"], "gbucket", "digest"),
    ):
        path = f"{log_dir}/{sub}"
        led = _read_log(spark, path)
        if led is None:
            continue
        _lineage_guard(led, path, allow_multi_lineage)
        files_before = len(led.inputFiles())
        rows_before = led.count()
        w = Window.partitionBy(*key_cols).orderBy("__batch_id", "__run_tag")
        snap = (
            led.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint(eager=True)
        )
        (
            snap.repartition(
                F.col(bucket_col),
                F.pmod(F.xxhash64(sort_col), F.lit(files_per_bucket)),
            )
            .sortWithinPartitions(sort_col)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(bucket_col)
            .parquet(path)
        )
        after = spark.read.parquet(path)
        out[sub] = {
            "files_before": files_before,
            "files_after": len(after.inputFiles()),
            "rows_before": rows_before,
            "rows_after": after.count(),
        }
    audit_path = f"{log_dir}/audit"
    led = _read_log(spark, audit_path)
    if led is not None:
        files_before = len(led.inputFiles())
        rows_before = led.count()
        snap = led.dropDuplicates(["doc_id"]).localCheckpoint(eager=True)
        (
            snap.repartition(
                F.col("abucket"),
                F.pmod(F.xxhash64("doc_id"), F.lit(files_per_bucket)),
            )
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("abucket")
            .parquet(audit_path)
        )
        after = spark.read.parquet(audit_path)
        out["audit"] = {
            "files_before": files_before,
            "files_after": len(after.inputFiles()),
            "rows_before": rows_before,
            "rows_after": after.count(),
        }
    return out


def run_substring_dedup_stream(
    spark: SparkSession,
    src_dir: str,
    log_dir: str,
    checkpoint_dir: str,
    k: int = 8,
    ledger_buckets: int = 8,
    batch_shuffle_partitions: int | None = 8,
    max_files_per_trigger: int | None = None,
    prune_min_files: int = 64,
) -> DataFrame:
    """Incremental KEEP-FIRST substring dedup under streaming delivery
    — the ExactSubstr complement of ``run_neardup_ingest_stream``
    (VERDICT r9 #6): every ``k``-token passage of an arriving document
    that already appeared — in the AT-REST corpus, in a smaller-id
    document of the same micro-batch, or earlier in the same document
    — is CUT from the arriving copy; the first arrival of a passage
    always survives.  Near-dup ingest drops whole documents; this
    surgically removes the repeated spans and keeps the rest, the
    transformation a production "never ship the same passage twice"
    gate runs on crawl deliveries.

    Semantics contract (mirrored by the SQL oracle and the batch twin
    ``operators.dedup.incremental_substring_dedup``): the hit relation
    is ``first occurrence in (arrival, doc_id, position) order
    survives``; a document contributes the grams of its ORIGINAL
    normalized token stream to the ledger regardless of what was cut
    from its emitted text — which makes the relation non-cascading
    and the replay recomputation exact.

    State & idempotence — the h15 ledger pattern:

    - Two appended ledgers under ``log_dir``: ``docs/`` (one cleaned
      row per ingested document, partitioned by
      ``dbucket = pmod(xxhash64(doc_id), ledger_buckets)``) and
      ``grams/`` (one 8-byte xxhash64 digest per DISTINCT gram per
      batch, partitioned by ``gbucket = pmod(xxhash64(gh),
      ledger_buckets)``).  Every row carries ``(__run_tag,
      __batch_id)`` — the checkpoint-lineage key, because batch ids
      restart at 0 under a fresh checkpoint.
    - Replay of a batch: both probes EXCLUDE same-lineage rows with
      ``__batch_id >= batch_id`` — crash replay AND wiped-checkpoint
      full replay (batch ids restart at 0 under the same tag) see
      exactly the lineage's pre-batch state, so the recomputation is
      byte-identical and duplicate appends collapse in the read-back.
    - Redelivery under a NEW checkpoint: absorbed by an exact doc_id
      probe of the docs ledger (dbucket-pruned) — an already-ingested
      document is skipped entirely, never re-cut (its text at rest is
      immutable; re-cleaning a redelivered copy against its own grams
      would emit an empty document).

    100 TB shape: per micro-batch — one tokenization over the BATCH,
    one batch-sized gram shuffle (8-byte digests + (doc, pos), never
    gram text) for the within-batch first-occurrence window, one
    bucket-pruned semi-join probe of the gram ledger (reads only the
    <= ``ledger_buckets`` partitions the batch's digests hash into —
    per-batch cost tracks the BATCH, not the corpus; the h15
    index_growth probe measures exactly this axis), and a codegen'd
    higher-order cut.  Ledger growth: one digest row per distinct new
    gram — the corpus's gram vocabulary, the same asymptotics as the
    suffix table ExactSubstr maintains."""
    import hashlib as _hashlib

    from .windows import _scoped_confs

    docs_dir = f"{log_dir}/docs"
    grams_dir = f"{log_dir}/grams"
    run_tag = _hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    dbucket_expr = F.pmod(F.xxhash64("doc_id"), F.lit(ledger_buckets)).cast(
        "int"
    )
    gbucket_expr = F.pmod(F.xxhash64("gh"), F.lit(ledger_buckets)).cast("int")
    docs_ledger_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("n_removed", T.LongType()),
            T.StructField("cleaned_text", T.StringType()),
            T.StructField("__batch_id", T.LongType()),
            T.StructField("__run_tag", T.StringType()),
            T.StructField("dbucket", T.IntegerType()),
        ]
    )
    gram_ledger_schema = T.StructType(
        [
            T.StructField("gh", T.LongType()),
            T.StructField("__batch_id", T.LongType()),
            T.StructField("__run_tag", T.StringType()),
            T.StructField("gbucket", T.IntegerType()),
        ]
    )

    def _read_ledger(sess: SparkSession, path: str, schema) -> DataFrame | None:
        try:
            df = sess.read.schema(schema).parquet(path)
            df.schema  # force analysis so a missing path surfaces here
            return df
        except AnalysisException:
            return None

    def _not_own_batch(batch_id: int) -> F.Column:
        # Same-lineage rows are visible only for STRICTLY EARLIER
        # batches: a wiped-checkpoint full replay restarts batch ids at
        # 0 under the SAME run_tag, so excluding only the exact
        # (tag, batch) pair would let a replayed batch 0 see batches
        # 1..n of its own earlier pass and wrongly cut first-occurrence
        # passages (ADVICE r10, high).  With ``>=`` the replayed batch
        # sees exactly the pre-batch state of its own lineage — plus
        # every other lineage's rows, which keeps the new-checkpoint
        # redelivery absorption intact.
        return ~(
            (F.col("__run_tag") == run_tag)
            & (F.col("__batch_id") >= batch_id)
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        to_unpersist: list[DataFrame] = []

        # Redelivery absorption: exact doc_id probe, dbucket-pruned.
        # On a young ledger (driver-side file count, zero Spark jobs)
        # the touched-bucket collect costs more than the full scan it
        # would prune — skip it until the ledger outgrows
        # ``prune_min_files``; at 100 TB the probe is always pruned.
        new_docs = batch_df
        docs_led = _read_ledger(sess, docs_dir, docs_ledger_schema)
        if docs_led is not None:
            dpred = _not_own_batch(batch_id)
            if not _ledger_is_small(docs_led, prune_min_files):
                dtouched = [
                    r[0]
                    for r in batch_df.select(dbucket_expr.alias("b"))
                    .distinct()
                    .collect()
                ]
                dpred = F.col("dbucket").isin(dtouched) & dpred
            seen = docs_led.filter(dpred).select("doc_id")
            new_docs = batch_df.join(seen, "doc_id", "left_anti")

        toks = new_docs.select(
            "doc_id", ws_tokens(F.lower(F.trim(F.col("text")))).alias("toks")
        ).persist()
        to_unpersist.append(toks)
        grams = (
            toks.filter(F.size("toks") >= k)
            .select(
                "doc_id",
                F.explode(
                    F.sequence(F.lit(1), F.size("toks") - (k - 1))
                ).alias("pos"),
                "toks",
            )
            .select(
                "doc_id",
                "pos",
                F.xxhash64(
                    F.concat_ws(" ", F.slice("toks", F.col("pos"), k))
                ).alias("gh"),
            )
            .withColumn("gbucket", gbucket_expr)
            .persist()
        )
        to_unpersist.append(grams)

        first_w = Window.partitionBy("gh").orderBy("doc_id", "pos")
        hits = (
            grams.withColumn("__rn", F.row_number().over(first_w))
            .filter(F.col("__rn") > 1)
            .select("doc_id", "pos")
        )
        gled = _read_ledger(sess, grams_dir, gram_ledger_schema)
        if gled is not None:
            gpred = _not_own_batch(batch_id)
            if not _ledger_is_small(gled, prune_min_files):
                gtouched = [
                    r[0] for r in grams.select("gbucket").distinct().collect()
                ]
                gpred = F.col("gbucket").isin(gtouched) & gpred
            at_rest = gled.filter(gpred).select("gh")
            hits = hits.unionByName(
                grams.join(at_rest, "gh", "left_semi").select("doc_id", "pos")
            )
        # A position can hit BOTH ways (in-batch repeat of an at-rest
        # gram); collapse before the per-doc collect.
        hp = hits.distinct().groupBy("doc_id").agg(
            F.collect_list("pos").alias("hp")
        )
        kept = F.filter(
            "toks",
            lambda t, i: ~F.exists(
                F.coalesce(F.col("hp"), F.array()),
                lambda p: (i + 1 >= p) & (i + 1 <= p + (k - 1)),
            ),
        )
        cleaned = (
            toks.join(hp, "doc_id", "left")
            .withColumn("__kept", kept)
            .select(
                "doc_id",
                F.size("toks").cast("long").alias("n_tokens"),
                (F.size("toks") - F.size("__kept"))
                .cast("long")
                .alias("n_removed"),
                F.concat_ws(" ", "__kept").alias("cleaned_text"),
                F.lit(batch_id).alias("__batch_id"),
                F.lit(run_tag).alias("__run_tag"),
            )
            .withColumn("dbucket", dbucket_expr)
        )
        try:
            # Two independent ledger appends over the persisted
            # toks/grams — overlap them (guide §2.6; safety argument at
            # _concurrent_writes)
            def _append_docs() -> None:
                (
                    cleaned.repartition("dbucket")
                    .write.mode("append")
                    .partitionBy("dbucket")
                    .parquet(docs_dir)
                )

            def _append_grams() -> None:
                (
                    grams.select("gh", "gbucket")
                    .distinct()
                    .select(
                        "gh",
                        F.lit(batch_id).alias("__batch_id"),
                        F.lit(run_tag).alias("__run_tag"),
                        "gbucket",
                    )
                    .repartition("gbucket")
                    .write.mode("append")
                    .partitionBy("gbucket")
                    .parquet(grams_dir)
                )

            _concurrent_writes(_append_docs, _append_grams)
        finally:
            for df_ in to_unpersist:
                df_.unpersist()

    reader = spark.readStream.schema(DOCUMENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    scoped: dict[str, str] = {}
    if batch_shuffle_partitions is not None:
        # Micro-batch-sized shuffle width + static planning, the
        # run_neardup_ingest_stream sizing lesson (measured there).
        scoped = {
            "spark.sql.shuffle.partitions": str(batch_shuffle_partitions),
            "spark.sql.adaptive.enabled": "false",
        }
    with _scoped_confs(spark, scoped):
        (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    log = _read_ledger(spark, docs_dir, docs_ledger_schema)
    if log is None:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("n_tokens", T.LongType()),
                    T.StructField("n_removed", T.LongType()),
                    T.StructField("cleaned_text", T.StringType()),
                ]
            ),
        )
    # Deterministic merge-on-read: the >= exclusion above makes replay
    # rows byte-identical, but pick the earliest (__batch_id,
    # __run_tag) row with a least-cut + content-digest tiebreak anyway
    # (ADVICE r10 defense-in-depth) instead of an arbitrary
    # dropDuplicates survivor.
    pick = Window.partitionBy("doc_id").orderBy(
        "__batch_id",
        "__run_tag",
        F.col("n_removed").asc(),
        F.xxhash64("cleaned_text"),
    )
    return (
        log.withColumn("__rn", F.row_number().over(pick))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "n_tokens", "n_removed", "cleaned_text")
    )


def compact_substring_ledgers(
    spark: SparkSession,
    log_dir: str,
    files_per_bucket: int = 1,
    allow_multi_lineage: bool = False,
) -> dict:
    """Table maintenance for the incremental substring-dedup ledgers
    (``run_substring_dedup_stream``) — the ``compact_neardup_ledgers``
    mechanics applied to the docs/grams pair: collapse each ledger to
    one row per doc_id (docs) / per gh (grams), keeping the MIN
    ``(__batch_id, __run_tag)`` row (own-batch exclusion contract +
    deterministic cross-lineage tiebreak), and rewrite with dynamic
    per-bucket partition overwrite — per-partition atomic, rolling,
    sorted within partitions for footer min/max skipping.  The same
    single-lineage compaction constraint applies (see
    ``compact_neardup_ledgers``).  Returns per-ledger file counts."""
    docs_dir = f"{log_dir}/docs"
    grams_dir = f"{log_dir}/grams"
    out: dict = {}
    for path, key_cols, bucket_col, sort_col, tiebreak in (
        # Docs rows carry a payload, so break exact (batch, tag) ties
        # deterministically — least-cut row first, then content digest
        # (ADVICE r10: never let an arbitrary first-row pick persist a
        # conflicting replay row).  Gram rows are pure keys; ties are
        # byte-identical.
        (
            docs_dir,
            ["doc_id"],
            "dbucket",
            "doc_id",
            [F.col("n_removed").asc(), F.xxhash64("cleaned_text")],
        ),
        (grams_dir, ["gh"], "gbucket", "gh", []),
    ):
        led = _read_log(spark, path)
        if led is None:
            continue
        _lineage_guard(led, path, allow_multi_lineage)
        before = len(led.inputFiles())
        w = Window.partitionBy(*key_cols).orderBy(
            "__batch_id", "__run_tag", *tiebreak
        )
        snap = (
            led.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint(eager=True)
        )
        (
            snap.repartition(
                F.col(bucket_col),
                F.pmod(F.xxhash64(sort_col), F.lit(files_per_bucket)),
            )
            .sortWithinPartitions(sort_col)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(bucket_col)
            .parquet(path)
        )
        out[path.rsplit("/", 1)[-1]] = {
            "files_before": before,
            "files_after": len(spark.read.parquet(path).inputFiles()),
        }
    return out


def run_decontaminate_stream(
    spark: SparkSession,
    src_dir: str,
    benchmark: DataFrame,
    log_dir: str,
    checkpoint_dir: str,
    n: int = 5,
    min_overlaps: int = 1,
    max_files_per_trigger: int | None = None,
    batch_shuffle_partitions: int | None = 8,
) -> DataFrame:
    """Streaming benchmark DECONTAMINATION gate (§2.J8 × H): every
    arriving document is checked against the eval suite's n-gram set
    before it can enter the corpus — contaminated rows land in a
    ``quarantine/`` ledger (with their offending-gram counts, the
    audit trail a data card cites), clean rows in ``clean/``.  This is
    the gate order a production pipeline runs: decontamination happens
    at INGEST, not as a later batch sweep, so an eval gram never
    transits the training store.

    The check is STATELESS per document given the (small, at-rest)
    benchmark: ``operators.dedup.decontaminate`` runs per micro-batch
    with the benchmark persisted across batches — corpus-side grams
    stream through a broadcast hash join, zero shuffle, zero streaming
    state, so stream == batch == SQL oracle row-for-row and replay /
    redelivery append byte-identical rows that collapse in the
    read-back (idempotence without ledger probes: the gate writes are
    deterministic functions of the document alone).

    100 TB shape: per-batch cost is one map pass over the batch's
    grams against the broadcast eval set (j8's plan, proven
    exchange-free on the corpus side); the benchmark-side gram build
    re-executes per batch over a persisted eval frame — eval suites
    are thousands of rows, so this is driver-noise, and a continuous
    deployment would snapshot the gram set once per suite release.

    Returns the read-back: ``(doc_id, quarantined, n_contaminated_grams)``
    for every ingested document."""
    from ..operators.dedup import decontaminate, prepare_benchmark_grams

    clean_dir = f"{log_dir}/clean"
    quar_dir = f"{log_dir}/quarantine"
    bench = benchmark.persist()
    bench.count()
    prepared_bench = prepare_benchmark_grams(bench, n=n)

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("quarantined", T.BooleanType()),
            T.StructField("n_contaminated_grams", T.LongType()),
        ]
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        flagged = decontaminate(
            batch_df, bench, n=n, min_overlaps=min_overlaps,
            prepared=prepared_bench,
        )
        marked = (
            batch_df.select("doc_id")
            .join(flagged, "doc_id", "left")
            .select(
                "doc_id",
                F.col("n_contaminated_grams").isNotNull().alias("quarantined"),
                F.coalesce("n_contaminated_grams", F.lit(0))
                .cast("long")
                .alias("n_contaminated_grams"),
            )
            .persist()
        )
        try:
            # SEQUENTIAL appends, on purpose (round-14 revert of the
            # round-13 overlap): these are two SINGLE-FILE writes over
            # a small gate table — there is nothing for a second job's
            # tasks to back-fill, and the extra count() job the overlap
            # needed cost more than it saved (driver r13: h17 0.58×,
            # h21 0.68× vs the drift band; VERDICT r13 #2).  The first
            # write materializes the persisted plan for the second.
            # _concurrent_writes stays for the ≥2-heavy-append streams
            # (h15/h16/h19/h23), where the overlap measured a real win.
            marked.filter("quarantined").write.mode("append").parquet(quar_dir)
            marked.filter(~F.col("quarantined")).write.mode("append").parquet(
                clean_dir
            )
        finally:
            marked.unpersist()

    from .windows import _scoped_confs

    reader = spark.readStream.schema(DOCUMENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    scoped: dict[str, str] = {}
    if batch_shuffle_partitions is not None:
        scoped = {
            "spark.sql.shuffle.partitions": str(batch_shuffle_partitions),
            "spark.sql.adaptive.enabled": "false",
        }
    with _scoped_confs(spark, scoped):
        (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    parts = [
        df for df in (_read_log(spark, quar_dir), _read_log(spark, clean_dir))
        if df is not None
    ]
    bench.unpersist()
    prepared_bench[0].unpersist()
    if not parts:
        return spark.createDataFrame([], out_schema)
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out.dropDuplicates(["doc_id"])


EMBEDDING_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)


def run_topk_maintenance_stream(
    spark: SparkSession,
    src_dir: str,
    queries: DataFrame,
    log_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    max_files_per_trigger: int | None = None,
    batch_shuffle_partitions: int | None = 8,
) -> DataFrame:
    """CONTINUOUS exact kNN against a standing query set (§2.J3 × H):
    embedding vectors stream in; each micro-batch is scored against
    the (small, broadcast) queries and only the batch's per-query
    top-``k`` survives into the candidates ledger; the read-back folds
    the ledger to the GLOBAL per-query top-``k``.  This is the
    similarity-alerting primitive — "tell me when anything close to X
    arrives" — and the streaming complement of the j3 brute-force
    baseline, exactly equal to it over the drained corpus.

    Correctness invariant (what makes the fold exact): a vector in the
    global top-``k`` of query q is necessarily in its own batch's
    top-``k`` for q, so the ledger — per-batch winners only — always
    contains the global winners.  Replay appends byte-identical rows
    (scoring is deterministic) and redelivered vectors re-produce
    their existing rows; both collapse in the read-back's
    (query_id, neighbor_id) dedup, so no lineage bookkeeping is
    needed at all — the h12 ledger pattern degenerates to
    content-addressed rows.

    100 TB shape: per-batch cost is one broadcast map over the batch
    (batch × |queries| dot products, zero shuffle on the corpus side —
    the j3 plan) + a per-query k-row TakeOrdered; ledger growth is
    |queries| × k per batch regardless of batch size, and the
    read-back fold is over that k-per-batch stream, never the corpus.
    Returns ``(query_id, neighbor_id, sim, rnk)`` with rnk 1..k."""
    from ..operators.similarity import brute_force_topk

    from .windows import _scoped_confs

    q = queries.persist()
    q.count()

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            brute_force_topk(batch_df, q, k=k)
            .select("query_id", "neighbor_id", "sim")
            .write.mode("append")
            .parquet(log_dir)
        )

    reader = spark.readStream.schema(EMBEDDING_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    scoped: dict[str, str] = {}
    if batch_shuffle_partitions is not None:
        scoped = {
            "spark.sql.shuffle.partitions": str(batch_shuffle_partitions),
            "spark.sql.adaptive.enabled": "false",
        }
    with _scoped_confs(spark, scoped):
        (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    q.unpersist()
    log = _read_log(spark, log_dir)
    if log is None:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("query_id", T.LongType()),
                    T.StructField("neighbor_id", T.LongType()),
                    T.StructField("sim", T.DoubleType()),
                    T.StructField("rnk", T.LongType()),
                ]
            ),
        )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        log.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def compact_topk_ledger(spark: SparkSession, log_dir: str, k: int) -> dict:
    """Fold the ``run_topk_maintenance_stream`` candidates ledger to
    the global per-query top-``k`` — EXACT compaction, by the same
    containment theorem that makes the read-back fold exact:

        Any vector in the global top-``k`` of query q over ALL drained
        batches is in its own batch's top-``k`` for q, hence in the
        ledger; and a ledger row OUTSIDE the current global top-``k``
        can never re-enter it, because future batches only ADD
        candidates (scores of existing rows never change).  So
        replacing the ledger by the current global top-``k`` per query
        preserves every future fold's result.

    The ledger grows |queries| × k per batch regardless of batch size;
    compaction resets it to |queries| × k total, keeping read-back
    cost flat over the life of the stream.  Rows are content-addressed
    (no lineage columns — replay appends byte-identical rows that
    collapse in the read-back's dedup), so compaction needs no
    lineage guard; run it between ingest runs, since the flat-parquet
    overwrite is not concurrency-safe against an in-flight append.
    Returns {"files_before", "files_after", "rows_before", "rows_after"}."""
    log = _read_log(spark, log_dir)
    if log is None:
        return {}
    files_before = len(log.inputFiles())
    rows_before = log.count()
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), "neighbor_id"
    )
    snap = (
        log.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .localCheckpoint(eager=True)
    )
    snap.coalesce(1).write.mode("overwrite").parquet(log_dir)
    after = spark.read.parquet(log_dir)
    return {
        "files_before": files_before,
        "files_after": len(after.inputFiles()),
        "rows_before": rows_before,
        "rows_after": after.count(),
    }


def run_media_dedup_stream(
    spark: SparkSession,
    src_dir: str,
    log_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    bands: int = 4,
    index_buckets: int = 8,
    max_bucket_size: int = 10_000,
    max_files_per_trigger: int | None = None,
    batch_shuffle_partitions: int | None = 8,
    prune_min_files: int = 64,
) -> DataFrame:
    """Incremental MULTIMODAL near-dup ingestion (§2.J5 × H — the
    image-dedup analog of ``run_neardup_ingest_stream``): each arriving
    micro-batch of media rows is perceptual-dHashed (Arrow-batched
    mapInPandas; real pixels when Pillow decodes, byte-grid stub here),
    checked against the AT-REST dHash band index and against
    smaller-id peers of its own batch, and survivors append themselves
    + their band slices idempotently.  First-ARRIVED survives; a
    redelivered row re-verifies against its own indexed copy at
    Hamming 0 and drops — the h15 absorption semantics.

    Simpler than the MinHash pipeline in one load-bearing way: the
    fingerprint IS 8 bytes, so the index ledger carries the full dhash
    on every band row and verification (``bit_count(a XOR b) <=
    max_hamming``) happens inside the probe join — there is no second
    docs-ledger fetch at all.  One bucket-pruned probe per batch.

    Ledgers under ``log_dir``: ``docs/`` (survivor doc_id + dhash,
    dbucket-partitioned) and ``index/`` (one (doc_id, band_no,
    band_bits, dhash) row per band per survivor, partitioned by
    ``bucket = pmod(xxhash64(band_no, band_bits), index_buckets)``).
    (tag, batch)-keyed own-batch exclusion exactly as h15.  Batch
    twin: ``operators.multimodal.incremental_media_dedup`` (banded
    pair table + the shared arrival-wave fold).  Pigeonhole guarantee
    requires ``max_hamming < bands``; BOTH the batch-local pair
    generation (batch-side counts) and the at-rest probe (index-side
    counts over the pruned slice) cap degenerate buckets at
    ``max_bucket_size`` — observable through the batch twin's
    companion ``oversized_dhash_buckets`` AND, stream-side, through
    the ``log_dir/oversized`` companion ledger (one (side, band_no,
    band_bits, n_members, batch, tag) row per skipped bucket per
    batch — ADVICE r11: silent misses near the cap must be
    auditable); on an over-cap bucket the stream and the twin may
    diverge since each judges popularity by its own count (documented
    trade: skip the useless discriminator, never go quadratic in
    it)."""
    assert max_hamming < bands, "pigeonhole guarantee requires max_hamming < bands"
    import hashlib as _hashlib

    from ..operators.multimodal import attach_binary_payload, image_dhash
    from .windows import _scoped_confs

    docs_dir = f"{log_dir}/docs"
    index_dir = f"{log_dir}/index"
    width = 64 // bands
    run_tag = _hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    bucket_expr = F.pmod(
        F.xxhash64("band_no", "band_bits"), F.lit(index_buckets)
    ).cast("int")
    dbucket_expr = F.pmod(F.xxhash64("doc_id"), F.lit(index_buckets)).cast(
        "int"
    )
    index_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("band_no", T.IntegerType()),
            T.StructField("band_bits", T.LongType()),
            T.StructField("dhash", T.LongType()),
            T.StructField("__batch_id", T.LongType()),
            T.StructField("__run_tag", T.StringType()),
            T.StructField("bucket", T.IntegerType()),
        ]
    )
    docs_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("dhash", T.LongType()),
            T.StructField("__batch_id", T.LongType()),
            T.StructField("__run_tag", T.StringType()),
            T.StructField("dbucket", T.IntegerType()),
        ]
    )

    def _read_ledger(sess: SparkSession, path: str, schema) -> DataFrame | None:
        try:
            df = sess.read.schema(schema).parquet(path)
            df.schema
            return df
        except AnalysisException:
            return None

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        h = image_dhash(attach_binary_payload(batch_df)).persist()
        slices = h.select(
            "doc_id",
            "dhash",
            F.posexplode(
                F.array(
                    *[
                        F.expr(f"(dhash >> {i * width}) & {(1 << width) - 1}")
                        for i in range(bands)
                    ]
                )
            ).alias("band_no", "band_bits"),
        ).withColumn("bucket", bucket_expr).persist()
        try:
            # Within-batch: smaller id shadows (cap-filtered, the
            # dhash_neardup_pairs shape on the batch alone).
            sizes = slices.groupBy("band_no", "band_bits").agg(
                F.count(F.lit(1)).alias("__n")
            )
            # Over-cap buckets are SKIPPED (never go quadratic in a
            # degenerate discriminator) but must stay auditable
            # (ADVICE r11 low): collect them — bounded by construction,
            # a bucket only lands here with > max_bucket_size members,
            # so there are at most batch/max_bucket_size of them — and
            # append to the ``oversized/`` companion ledger below.
            over_rows = [
                ("batch", r["band_no"], r["band_bits"], r["__n"])
                for r in sizes.filter(
                    F.col("__n") > max_bucket_size
                ).collect()
            ]
            keyed = slices.join(
                F.broadcast(sizes.filter(F.col("__n") > max_bucket_size)),
                ["band_no", "band_bits"],
                "left_anti",
            )
            a = keyed.select(
                "band_no", "band_bits",
                F.col("doc_id").alias("id_a"), F.col("dhash").alias("h_a"),
            )
            b = keyed.select(
                "band_no", "band_bits",
                F.col("doc_id").alias("id_b"), F.col("dhash").alias("h_b"),
            )
            dropped = (
                a.join(b, ["band_no", "band_bits"])
                .filter(
                    (F.col("id_a") < F.col("id_b"))
                    & (F.bit_count(F.expr("h_a ^ h_b")) <= max_hamming)
                )
                .select(F.col("id_b").alias("doc_id"))
            )
            # At-rest probe: bucket-pruned, own-(tag, batch) excluded,
            # dhash carried by the index row — verify in the join.
            idx = _read_ledger(sess, index_dir, index_schema)
            if idx is not None:
                # Strictly-earlier own-lineage batches only (>=) —
                # wiped-checkpoint replay visibility, as in h15/h16.
                ipred = ~(
                    (F.col("__run_tag") == run_tag)
                    & (F.col("__batch_id") >= batch_id)
                )
                if not _ledger_is_small(idx, prune_min_files):
                    touched = [
                        r[0]
                        for r in slices.select("bucket").distinct().collect()
                    ]
                    ipred = F.col("bucket").isin(touched) & ipred
                at_rest = idx.filter(ipred).select(
                    "band_no",
                    "band_bits",
                    F.col("doc_id").alias("id_b"),
                    F.col("dhash").alias("h_b"),
                )
                # Cap the PROBE side too (ADVICE r10 low): a degenerate
                # band bucket (e.g. the all-zero dhash band) would make
                # this join quadratic in that bucket as the index grows.
                # The cap keys on INDEX-side counts over the pruned
                # slice — the same "bucket too popular to be a useful
                # discriminator" judgment the batch twin makes on
                # corpus-global counts.  On over-cap buckets stream and
                # twin can diverge (each skips by its own count); both
                # surface the skip through oversized_dhash_buckets-style
                # observability rather than degrading quadratically.
                # DISTINCT members: a wiped-checkpoint replay sees the
                # original run's appends for earlier batches (same
                # lineage, __batch_id < batch) as duplicate rows; a
                # plain count would inflate past the cap and make the
                # skip decision — and the oversized audit row —
                # replay-unstable.  countDistinct keeps both
                # byte-identical under replay.
                rest_sizes = at_rest.groupBy("band_no", "band_bits").agg(
                    F.countDistinct("id_b").alias("__n")
                )
                over_rows.extend(
                    ("probe", r["band_no"], r["band_bits"], r["__n"])
                    for r in rest_sizes.filter(
                        F.col("__n") > max_bucket_size
                    ).collect()
                )
                capped = at_rest.join(
                    F.broadcast(rest_sizes.filter(F.col("__n") > max_bucket_size)),
                    ["band_no", "band_bits"],
                    "left_anti",
                )
                matched = (
                    slices.join(capped, ["band_no", "band_bits"])
                    .filter(
                        F.bit_count(F.expr("dhash ^ h_b")) <= max_hamming
                    )
                    .select("doc_id")
                )
                dropped = dropped.unionByName(matched)
            survivors = (
                h.join(dropped, "doc_id", "left_anti")
                .withColumn("__batch_id", F.lit(batch_id))
                .withColumn("__run_tag", F.lit(run_tag))
                .withColumn("dbucket", dbucket_expr)
                .persist()
            )
            try:
                # materialize once, then overlap the independent
                # appends (guide §2.6; safety at _concurrent_writes)
                survivors.count()

                def _append_docs() -> None:
                    (
                        survivors.repartition("dbucket")
                        .write.mode("append")
                        .partitionBy("dbucket")
                        .parquet(docs_dir)
                    )

                def _append_index() -> None:
                    (
                        slices.join(
                            survivors.select("doc_id"), "doc_id", "left_semi"
                        )
                        .select(
                            "doc_id", "band_no", "band_bits", "dhash",
                            F.lit(batch_id).alias("__batch_id"),
                            F.lit(run_tag).alias("__run_tag"),
                            "bucket",
                        )
                        .repartition("bucket")
                        .write.mode("append")
                        .partitionBy("bucket")
                        .parquet(index_dir)
                    )

                def _append_oversized() -> None:
                    # companion observable for skipped over-cap buckets
                    # (the stream-side twin of the batch operator's
                    # oversized_dhash_buckets output): one tiny append
                    # only on batches that actually skipped something
                    sess.createDataFrame(
                        [(s, int(bn), int(bb), int(n), batch_id, run_tag)
                         for s, bn, bb, n in over_rows],
                        "side string, band_no int, band_bits long, "
                        "n_members long, __batch_id long, __run_tag string",
                    ).coalesce(1).write.mode("append").parquet(
                        f"{log_dir}/oversized"
                    )

                writes = [_append_docs, _append_index]
                if over_rows:
                    writes.append(_append_oversized)
                _concurrent_writes(*writes)
            finally:
                survivors.unpersist()
        finally:
            h.unpersist()
            slices.unpersist()

    reader = spark.readStream.schema(DOCUMENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    scoped: dict[str, str] = {}
    if batch_shuffle_partitions is not None:
        scoped = {
            "spark.sql.shuffle.partitions": str(batch_shuffle_partitions),
            "spark.sql.adaptive.enabled": "false",
        }
    with _scoped_confs(spark, scoped):
        (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    log = _read_ledger(spark, docs_dir, docs_schema)
    if log is None:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("dhash", T.LongType()),
                ]
            ),
        )
    return log.select("doc_id", "dhash").dropDuplicates(["doc_id"])


def compact_media_ledgers(
    spark: SparkSession,
    log_dir: str,
    files_per_bucket: int = 1,
    allow_multi_lineage: bool = False,
) -> dict:
    """Table maintenance for the incremental media-dedup ledgers
    (``run_media_dedup_stream``) — the ``compact_neardup_ledgers``
    mechanics applied to the dHash docs/index pair: collapse to one
    row per doc_id (docs) / per (doc_id, band_no) (index), keeping the
    MIN ``(__batch_id, __run_tag)`` row (own-batch exclusion contract;
    payloads are deterministic functions of the media bytes, so ties
    are byte-identical), and rewrite with dynamic per-bucket partition
    overwrite — per-partition atomic, rolling, sorted within
    partitions (``band_bits`` for the index, so the probe join gets
    footer min/max skipping; ``doc_id`` for the docs ledger).  The
    single-lineage constraint is mechanically checked
    (``_lineage_guard``).  The ``oversized/`` companion ledger (one
    row per skipped over-cap bucket per batch) is covered too (ADVICE
    r12 low: it is append-only and a wiped-checkpoint replay
    re-appends identical rows — every unbounded ledger gets a
    compactor): dropDuplicates on the full
    ``(side, band_no, band_bits, __batch_id, __run_tag)`` key + flat
    rewrite, the audit-ledger shape (rows are deterministic per
    (batch, tag), so duplicates are byte-identical).  Returns
    per-ledger file counts."""
    docs_dir = f"{log_dir}/docs"
    index_dir = f"{log_dir}/index"
    out: dict = {}
    for path, key_cols, bucket_col, sort_col in (
        (docs_dir, ["doc_id"], "dbucket", "doc_id"),
        (index_dir, ["doc_id", "band_no"], "bucket", "band_bits"),
    ):
        led = _read_log(spark, path)
        if led is None:
            continue
        _lineage_guard(led, path, allow_multi_lineage)
        before = len(led.inputFiles())
        w = Window.partitionBy(*key_cols).orderBy("__batch_id", "__run_tag")
        snap = (
            led.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint(eager=True)
        )
        (
            snap.repartition(
                F.col(bucket_col),
                F.pmod(F.xxhash64(sort_col), F.lit(files_per_bucket)),
            )
            .sortWithinPartitions(sort_col)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(bucket_col)
            .parquet(path)
        )
        out[path.rsplit("/", 1)[-1]] = {
            "files_before": before,
            "files_after": len(spark.read.parquet(path).inputFiles()),
        }
    over_path = f"{log_dir}/oversized"
    led = _read_log(spark, over_path)
    if led is not None:
        files_before = len(led.inputFiles())
        rows_before = led.count()
        snap = led.dropDuplicates(
            ["side", "band_no", "band_bits", "__batch_id", "__run_tag"]
        ).localCheckpoint(eager=True)
        snap.coalesce(1).write.mode("overwrite").parquet(over_path)
        after = spark.read.parquet(over_path)
        out["oversized"] = {
            "files_before": files_before,
            "files_after": len(after.inputFiles()),
            "rows_before": rows_before,
            "rows_after": after.count(),
        }
    return out


def run_ivf_maintenance_stream(
    spark: SparkSession,
    src_dir: str,
    centroids: list,
    index_dir: str,
    checkpoint_dir: str,
    assign: int = 2,
    max_files_per_trigger: int | None = None,
    batch_shuffle_partitions: int | None = 8,
) -> DataFrame:
    """Incremental IVF index MAINTENANCE (§2.J3 × H — VERDICT r10 #4,
    the streaming complement of the at-rest IVF family: h18 maintains
    query RESULTS, this maintains the INDEX): arriving embedding
    vectors are assigned to the FROZEN centroids and appended into the
    ``operators.similarity.write_ivf_index`` layout — the same
    cluster-partitioned parquet the query path
    (``ivf_index_topk``) partition-prunes — so the index a batch build
    would produce is maintained continuously and stays queryable
    between batches.

    Design decisions, mirroring production IVF services:

    - **Centroids are FROZEN.**  Assignment must be a pure function of
      the vector or the index silently fragments (the same vector in
      two lists); re-training is a separate offline event that
      rebuilds the layout.  The ingest-side expression is
      ``centroid_ranks_expr`` — the literal form, ingest-computable
      and partition-prunable, the documented IVF choice
      (operators/similarity.py:319).
    - **Partition-pruned appends**: ``partitionBy("cluster")`` append
      touches only the ≤ batch×assign cluster directories the batch's
      vectors rank into; unrelated lists are never rewritten.
      Boundary replication (``assign`` nearest lists per vector)
      happens at ingest exactly as in ``write_ivf_index``, so the
      probe side needs no widening and batch == stream layouts are
      row-identical (parity-tested).
    - **(tag, batch)-keyed idempotence** — the h12 ledger pattern:
      every appended row carries ``(__run_tag, __batch_id)``; a
      replayed batch appends byte-identical rows (assignment is
      deterministic given frozen centroids) and the read-back (and
      ``ivf_index_topk``'s post-join ``distinct``) collapse
      duplicates, so crash replay and redelivery never double-count.
    - **Drift observable**: the read-back returns per-cluster growth
      stats with a ``growth_skew_permille`` column (cluster size ×
      1000 / mean list size) — the number an operator watches to
      decide when the frozen centroids have drifted from the data
      distribution and a re-train + rebuild is due.  Index QUALITY
      stays oracle-checked through the j3q harness composition: the
      maintained index is queried with ``ivf_index_topk`` against the
      exact ground truth in tests (recall ≥ threshold), the same
      accept/reject table a rollout reads.

    100 TB shape: per-batch cost is one assignment map over the BATCH
    (centroid literals, whole-stage codegen, zero shuffle beyond the
    cluster repartition) + appends into touched lists only; read-back
    stats aggregate (cluster, vec_id) pairs — never the vectors.
    ``index_dir`` may be a plain layout or a versioned index root
    (``operators.index_commit``): resolved ONCE at lineage start — a
    rebuild that commits a new version is a new-lineage event (new
    checkpoint, new stream), never a mid-lineage target switch.

    Returns ``(cluster, n_vectors, n_batches, growth_skew_permille)``."""
    from ..operators.index_commit import resolve_index_path
    from ..operators.similarity import assign_ivf_arrow

    from .windows import _scoped_confs

    import hashlib as _hashlib

    index_dir = resolve_index_path(spark, index_dir)
    run_tag = _hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Arrow-native assignment (round-13, guide §4.2): bit-exact
        # twin of explode(slice(centroid_ranks_expr)) through ONE
        # MapInArrow node — a constant-size plan, so the per-batch
        # Catalyst analysis the literal tree used to pay (the h22
        # decomposition, scripts/opt_probe.py ivfpq) is gone, and the
        # per-row evaluation is vectorized NumPy.
        (
            assign_ivf_arrow(batch_df, centroids, assign, "embedding", "cluster")
            .withColumn("__batch_id", F.lit(batch_id))
            .withColumn("__run_tag", F.lit(run_tag))
            .repartition("cluster")
            .write.mode("append")
            .partitionBy("cluster")
            .parquet(index_dir)
        )

    reader = spark.readStream.schema(EMBEDDING_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    scoped: dict[str, str] = {}
    if batch_shuffle_partitions is not None:
        scoped = {
            "spark.sql.shuffle.partitions": str(batch_shuffle_partitions),
            "spark.sql.adaptive.enabled": "false",
        }
    with _scoped_confs(spark, scoped):
        (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    out_schema = T.StructType(
        [
            T.StructField("cluster", T.LongType()),
            T.StructField("n_vectors", T.LongType()),
            T.StructField("n_batches", T.LongType()),
            T.StructField("growth_skew_permille", T.LongType()),
        ]
    )
    idx = _read_log(spark, index_dir)
    if idx is None:
        return spark.createDataFrame([], out_schema)
    per = (
        idx.select("cluster", "vec_id", "__batch_id", "__run_tag")
        .dropDuplicates(["cluster", "vec_id"])
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("__batch_id", "__run_tag").alias("n_batches"),
        )
    )
    mean_w = Window.partitionBy()
    return per.select(
        F.col("cluster").cast("long"),
        F.col("n_vectors").cast("long"),
        F.col("n_batches").cast("long"),
        (
            F.col("n_vectors") * 1000
            / F.avg("n_vectors").over(mean_w)
        )
        .cast("long")
        .alias("growth_skew_permille"),
    )


def run_semantic_decontaminate_stream(
    spark: SparkSession,
    src_dir: str,
    benchmark: DataFrame,
    log_dir: str,
    checkpoint_dir: str,
    cos_threshold_permille: int = 900,
    max_files_per_trigger: int | None = None,
    batch_shuffle_partitions: int | None = 8,
) -> DataFrame:
    """Streaming SEMANTIC decontamination gate (§2.J8 × H — VERDICT
    r10 #5: the ``run_decontaminate_stream`` mechanics applied to the
    embedding-space j8d relation): every arriving embedding vector is
    checked against the (small, broadcast) benchmark embedding set
    BEFORE it can enter the corpus — paraphrased eval leakage that
    defeats the n-gram gate is caught at INGEST, quarantined rows land
    in ``quarantine/`` with their benchmark-hit audit trail
    (n_bench_hits, first_bench_id), clean rows in ``clean/``.

    Exactness (the j8d contract): components quantize to integer
    micro-units, dot products and norms are BIGINT, and the cosine >=
    t gate is the cross-multiplied integer test
    ``dot² · 10⁶ >= t² · ‖a‖² · ‖b‖²`` in DECIMAL(38,0) — no float
    comparison anywhere, so stream == batch == SQL oracle row-for-row.

    The check is STATELESS per vector given the at-rest benchmark
    (quantized + norm-precomputed ONCE per stream, collected
    driver-side — it is eval-suite-sized by contract): one MapInArrow
    pass per micro-batch computes the batch × |benchmark| integer dot
    products as an exact int64 matmul (round-14, guide §4.2;
    exactness contract at similarity.semantic_gate_hits_arrow — the
    cross-multiplied gate is decided identically to the DECIMAL(38,0)
    expression form on every input).  Zero shuffle on the corpus
    side, zero streaming state — replay and redelivery append
    byte-identical rows that collapse in the read-back (the h17
    idempotence argument, no ledger probes needed).

    100 TB shape: per-batch cost is batch × |benchmark| integer dot
    products in one vectorized pass; eval suites are thousands of
    vectors, so the benchmark side stays driver/executor-memory-sized
    by construction (the same bound the broadcast form had).

    Returns ``(vec_id, quarantined, n_bench_hits, first_bench_id)``
    for every ingested vector (first_bench_id NULL for clean rows)."""
    clean_dir = f"{log_dir}/clean"
    quar_dir = f"{log_dir}/quarantine"

    q = lambda c: F.transform(  # noqa: E731
        c, lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
    )
    isum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x
    )

    # Quantized benchmark collected ONCE per stream (tiny by the gate's
    # contract — eval suites): round-14 moves the per-batch
    # batch × bench integer dot products from a BroadcastNestedLoopJoin
    # over per-pair zip_with folds (plus a groupBy exchange per batch)
    # into ONE MapInArrow pass — int64 matmul with the exact
    # cross-multiplied gate; exactness contract and degenerate-row
    # semantics at operators/similarity.py:semantic_gate_hits_arrow.
    # Quantization (the float-sensitive step) stays in the JVM
    # expressions above, identically for bench and batch sides.
    from ..operators.similarity import semantic_gate_hits_arrow

    bench = benchmark.select(
        F.col("vec_id").alias("bid"), q(F.col("embedding")).alias("qb")
    ).withColumn("nb2", isum(F.zip_with("qb", "qb", lambda a, b: a * b)))
    bench_rows = bench.collect()

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("quarantined", T.BooleanType()),
            T.StructField("n_bench_hits", T.LongType()),
            T.StructField("first_bench_id", T.LongType()),
        ]
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        corpus = batch_df.select(
            F.col("vec_id"), q(F.col("embedding")).alias("qc")
        ).withColumn("nc2", isum(F.zip_with("qc", "qc", lambda a, b: a * b)))
        hits = semantic_gate_hits_arrow(
            corpus, bench_rows, cos_threshold_permille, id_col="vec_id"
        )
        marked = (
            batch_df.select("vec_id")
            .join(hits, "vec_id", "left")
            .select(
                "vec_id",
                F.col("n_bench_hits").isNotNull().alias("quarantined"),
                F.coalesce("n_bench_hits", F.lit(0))
                .cast("long")
                .alias("n_bench_hits"),
                F.col("first_bench_id"),
            )
            .persist()
        )
        try:
            # SEQUENTIAL appends, on purpose — same round-14 revert as
            # run_decontaminate_stream above (single-file writes, the
            # overlap's extra count() job was a net loss; VERDICT r13
            # #2).  The first write materializes the persisted plan.
            marked.filter("quarantined").write.mode("append").parquet(quar_dir)
            marked.filter(~F.col("quarantined")).write.mode("append").parquet(
                clean_dir
            )
        finally:
            marked.unpersist()

    from .windows import _scoped_confs

    reader = spark.readStream.schema(EMBEDDING_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    scoped: dict[str, str] = {}
    if batch_shuffle_partitions is not None:
        scoped = {
            "spark.sql.shuffle.partitions": str(batch_shuffle_partitions),
            "spark.sql.adaptive.enabled": "false",
        }
    with _scoped_confs(spark, scoped):
        (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    parts = [
        df
        for df in (
            _read_log(spark, quar_dir), _read_log(spark, clean_dir)
        )
        if df is not None
    ]
    if not parts:
        return spark.createDataFrame([], out_schema)
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out.dropDuplicates(["vec_id"])


def compact_gate_ledgers(
    spark: SparkSession, log_dir: str, key_col: str
) -> dict:
    """Table maintenance for the stateless GATE ledgers
    (``run_decontaminate_stream``'s and
    ``run_semantic_decontaminate_stream``'s ``clean/`` +
    ``quarantine/`` pairs): every micro-batch appends one file per
    side, and replayed/redelivered batches append byte-identical
    duplicate rows by design (the gates are deterministic per row, so
    merge-on-read collapses them) — a long-running gate accumulates
    O(batches) small files and duplicate rows that every audit read
    re-scans.

    Rows are content-addressed (no lineage columns — the gate output
    is a pure function of the row and the at-rest benchmark), so
    compaction is a plain ``dropDuplicates([key_col])`` + rewrite per
    side: no lineage guard, no ordering subtleties.  Flat-directory
    overwrite is not concurrency-safe against an in-flight append —
    run between ingest runs, like ``compact_topk_ledger``.  A
    benchmark RELEASE (new eval suite) changes the gate function
    itself: rebuild the ledgers from the corpus instead of compacting.
    Returns per-side {files,rows} before/after."""
    out: dict = {}
    for side in ("clean", "quarantine"):
        path = f"{log_dir}/{side}"
        led = _read_log(spark, path)
        if led is None:
            continue
        files_before = len(led.inputFiles())
        rows_before = led.count()
        snap = led.dropDuplicates([key_col]).localCheckpoint(eager=True)
        snap.coalesce(1).write.mode("overwrite").parquet(path)
        after = spark.read.parquet(path)
        out[side] = {
            "files_before": files_before,
            "files_after": len(after.inputFiles()),
            "rows_before": rows_before,
            "rows_after": after.count(),
        }
    return out


def compact_index_layout(
    spark: SparkSession,
    index_dir: str,
    files_per_cluster: int = 1,
    allow_multi_lineage: bool = False,
) -> dict:
    """Table maintenance for the MAINTAINED ANN index layouts
    (``run_ivf_maintenance_stream`` / ``run_ivfpq_maintenance_stream``
    — VERDICT r11 #3: every other ledger has a compactor; the per-batch
    partitioned appends here sprawl one file per touched cluster per
    batch and replay/redelivery duplicates fold only at read time).

    Compaction ≠ rebuild: a REBUILD is a drift event (re-train the
    frozen models, rewrite everything, new lineage); this is routine
    maintenance that keeps the FROZEN-model layout byte-equivalent —
    one row per (cluster, vec_id), keeping the MIN
    ``(__batch_id, __run_tag)`` row (payloads are pure functions of
    the vector under frozen centroids/codebook, so ties are
    byte-identical; the deterministic tiebreak is the
    ``compact_media_ledgers`` contract), rewritten with dynamic
    per-cluster partition overwrite, sorted by ``vec_id`` within each
    list for footer min/max skipping.  Schema-agnostic across the IVF
    and IVF-PQ layouts (extra columns like ``codes`` ride along).

    Single-lineage is mechanically enforced (``_lineage_guard``);
    flat-partition overwrite is per-partition atomic but not safe
    against an in-flight append — run between ingest runs, like every
    compactor here.  ``index_dir`` may be a versioned root (the
    CURRENT version is compacted in place — old versions are immutable
    history owned by ``prune_index_versions``).  Returns
    {files,rows} before/after."""
    from ..operators.index_commit import resolve_index_path

    live = resolve_index_path(spark, index_dir)
    led = _read_log(spark, live)
    if led is None:
        return {}
    _lineage_guard(led, live, allow_multi_lineage)
    files_before = len(led.inputFiles())
    rows_before = led.count()
    w = Window.partitionBy("cluster", "vec_id").orderBy(
        "__batch_id", "__run_tag"
    )
    snap = (
        led.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=True)
    )
    (
        snap.repartition(
            F.col("cluster"),
            F.pmod(F.xxhash64("vec_id"), F.lit(files_per_cluster)),
        )
        .sortWithinPartitions("vec_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cluster")
        .parquet(live)
    )
    after = spark.read.parquet(live)
    return {
        "files_before": files_before,
        "files_after": len(after.inputFiles()),
        "rows_before": rows_before,
        "rows_after": after.count(),
    }


def run_ivfpq_maintenance_stream(
    spark: SparkSession,
    src_dir: str,
    centroids: list,
    codebook: list,
    index_dir: str,
    checkpoint_dir: str,
    m: int = 8,
    assign: int = 2,
    max_files_per_trigger: int | None = None,
    batch_shuffle_partitions: int | None = 8,
) -> DataFrame:
    """Incremental IVF-PQ index maintenance (§2.J3 × H — the
    ``run_ivf_maintenance_stream`` contract applied to the layout the
    100 TB query path actually reads, ``write_ivfpq_index``/j3o):
    arriving vectors are cluster-assigned against the FROZEN centroids
    AND PQ-coded against the FROZEN codebook (both must be pure
    functions of the vector, or the index fragments — the frozen-model
    contract; re-training either is the offline
    ``rebuild_ivf_index``-class event), then appended
    partition-pruned into the cluster-partitioned layout carrying the
    m-byte ``codes`` arrays the ADC probe ranks on.

    Per-batch cost: one `_ivfpq_indexed` pass over the BATCH — the
    centroid literal expression plus the broadcast-codebook PQ assign,
    one batch-sized code shuffle — and appends into only the touched
    cluster directories.  (tag, batch)-keyed rows; replay/redelivery
    appends are byte-identical and collapse in the read-back and in
    ``ivfpq_index_topk``'s post-join distinct.  ``index_dir`` may be a
    plain layout or a versioned index root (resolved once at lineage
    start, as in the IVF twin).  Returns the same per-cluster
    growth/drift table as the IVF twin."""
    import hashlib as _hashlib

    from ..operators.index_commit import resolve_index_path
    from ..operators.similarity import _ivfpq_indexed
    from .windows import _scoped_confs

    index_dir = resolve_index_path(spark, index_dir)
    run_tag = _hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Arrow-native IVF-PQ pass (round-13, guide §4.2): one
        # MapInArrow node computes normalization, cluster ranks and PQ
        # codes vectorized — bit-exact twin of the literal-expression
        # form (operators/similarity.py contract + test).  This
        # removes BOTH round-12 cost terms: the once-per-lineage 5–8 s
        # py4j tree build (prepare_ivfpq_exprs, no longer needed) and
        # the ~1.2–2 s/batch Catalyst re-analysis + interpreted
        # evaluation of the bound trees (scripts/opt_probe.py ivfpq).
        (
            _ivfpq_indexed(
                batch_df.select("vec_id", "embedding"),
                centroids,
                codebook,
                m,
                assign,
                "vec_id",
                "embedding",
            )
            .withColumnRenamed("__cluster", "cluster")
            .withColumn("__batch_id", F.lit(batch_id))
            .withColumn("__run_tag", F.lit(run_tag))
            .repartition("cluster")
            .write.mode("append")
            .partitionBy("cluster")
            .parquet(index_dir)
        )

    reader = spark.readStream.schema(EMBEDDING_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    scoped: dict[str, str] = {}
    if batch_shuffle_partitions is not None:
        scoped = {
            "spark.sql.shuffle.partitions": str(batch_shuffle_partitions),
            "spark.sql.adaptive.enabled": "false",
        }
    with _scoped_confs(spark, scoped):
        (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    out_schema = T.StructType(
        [
            T.StructField("cluster", T.LongType()),
            T.StructField("n_vectors", T.LongType()),
            T.StructField("n_batches", T.LongType()),
            T.StructField("growth_skew_permille", T.LongType()),
        ]
    )
    idx = _read_log(spark, index_dir)
    if idx is None:
        return spark.createDataFrame([], out_schema)
    per = (
        idx.select("cluster", "vec_id", "__batch_id", "__run_tag")
        .dropDuplicates(["cluster", "vec_id"])
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("__batch_id", "__run_tag").alias("n_batches"),
        )
    )
    mean_w = Window.partitionBy()
    return per.select(
        F.col("cluster").cast("long"),
        F.col("n_vectors").cast("long"),
        F.col("n_batches").cast("long"),
        (F.col("n_vectors") * 1000 / F.avg("n_vectors").over(mean_w))
        .cast("long")
        .alias("growth_skew_permille"),
    )
