"""Streaming corpus ingestion (streaming/ingest.py): the §2.J curation
gates under Structured Streaming, with the CDC pipeline's idempotence
guarantees — stream result == batch golden twin, stable under
duplicate delivery, redelivery, and checkpoint restart."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.operators.dedup import dedup_exact
from realtime_cdc_pipeline_docker_spark.operators.text import repetition_signals
from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
    curation_gate,
    rowwise_top_word_frac,
    run_corpus_ingest_stream,
)


def _batch_golden(docs):
    """The batch-side truth: same gates (batch repetition op), then
    exact dedup keeping min doc_id per normalized text."""
    gated = curation_gate(docs)
    keep = dedup_exact(gated).select("doc_id")
    return gated.join(keep, "doc_id", "left_semi")


def test_rowwise_top_word_frac_matches_batch_operator(spark, sf_dir):
    """The stream-safe HOF recomputation must equal the batch
    explode→groupBy top_word_frac on every fixture document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = repetition_signals(docs).select("doc_id", "top_word_frac")
    stream_side = docs.select("doc_id", rowwise_top_word_frac().alias("hof"))
    diff = (
        batch.join(stream_side, "doc_id")
        .filter(F.abs(F.col("top_word_frac") - F.col("hof")) > 1e-12)
        .count()
    )
    assert diff == 0


def test_ingest_stream_equals_batch_golden_with_redelivery(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")

    # Delivery 1: first half.  Delivery 2: second half PLUS a full
    # redelivery of the first half (duplicate files) and an exact
    # duplicate doc under a different id (content dedup, not id dedup).
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    half.coalesce(1).write.mode("append").parquet(src)
    out1 = run_corpus_ingest_stream(spark, src, log, ckpt)
    n1 = out1.count()
    assert n1 == _batch_golden(half).count()

    dup_content = half.limit(1).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    rest.unionByName(half).unionByName(dup_content).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out2 = run_corpus_ingest_stream(spark, src, log, ckpt)

    golden = _batch_golden(docs)
    assert out2.count() == golden.count() > n1
    assert (
        out2.select("doc_id").exceptAll(golden.select("doc_id")).count() == 0
        and golden.select("doc_id").exceptAll(out2.select("doc_id")).count() == 0
    )

    # Restart with an existing checkpoint and no new files: a no-op.
    out3 = run_corpus_ingest_stream(spark, src, log, ckpt)
    assert out3.count() == golden.count()

    # Restart with a WIPED checkpoint (full replay): the sink-side
    # digest probe still keeps the log exactly-once.
    import shutil

    shutil.rmtree(ckpt)
    out4 = run_corpus_ingest_stream(spark, src, log, ckpt)
    assert out4.count() == golden.count()
    assert os.path.isdir(log)


def _passing_text(spark, sf_dir) -> str:
    """Any fixture document that clears the curation gates."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curation_gate(docs).select("text").first()[0]


def test_ingest_keeper_is_global_min_under_out_of_order_delivery(
    spark, sf_dir, tmp_path
):
    """The oracle pins the dedup keeper to MIN(doc_id) per digest; the
    sink must agree even when the LOWER doc_id arrives in a LATER
    delivery (multi-batch/out-of-order, ADVICE round 3).  The log
    admits strictly-lower ids and the read-back collapses to the min,
    so keeper identity is arrival-order-free."""
    text = _passing_text(spark, sf_dir)
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    high = spark.createDataFrame([(1_000_000, text, "en", "late", len(text))], schema)
    high.coalesce(1).write.mode("append").parquet(src)
    out1 = run_corpus_ingest_stream(spark, src, log, ckpt)
    assert [r["doc_id"] for r in out1.collect()] == [1_000_000]

    low = spark.createDataFrame([(10, text, "en", "early", len(text))], schema)
    low.coalesce(1).write.mode("append").parquet(src)
    out2 = run_corpus_ingest_stream(spark, src, log, ckpt)
    rows = out2.collect()
    assert len(rows) == 1, "one keeper per digest"
    assert rows[0]["doc_id"] == 10, "keeper must be the global min doc_id"
    assert rows[0]["source"] == "early"

    # and an even-later redelivery of the high id stays dropped
    high.coalesce(1).write.mode("append").parquet(src)
    out3 = run_corpus_ingest_stream(spark, src, log, ckpt)
    assert [r["doc_id"] for r in out3.collect()] == [10]


def test_ingest_log_probe_is_bucket_local(spark, sf_dir, tmp_path):
    """The curated log is digest-bucketed on disk; the probe's
    bucket-IN filter must reach the scan as a PartitionFilter (pruned
    at file-listing time — the 100 TB probe contract), and on disk the
    matching bucket directories hold strictly fewer files than the
    whole log."""
    import glob

    from pyspark.sql import functions as F2

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    docs.coalesce(4).write.parquet(src)
    run_corpus_ingest_stream(spark, src, log, ckpt, log_buckets=16)

    full = spark.read.parquet(log)
    buckets = sorted(r[0] for r in full.select("bucket").distinct().collect())
    assert len(buckets) > 4, "fixture digests should spread over many buckets"

    # the probe shape write_batch builds: filter on the partition column
    one = full.filter(F2.col("bucket").isin([buckets[0]]))
    plan = one._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0], (
        "bucket predicate must prune partitions at the scan, not filter rows"
    )

    all_files = glob.glob(f"{log}/bucket=*/*.parquet")
    one_dir = glob.glob(f"{log}/bucket={buckets[0]}/*.parquet")
    assert one_dir and len(one_dir) < len(all_files)
    # and the pruned probe returns exactly that bucket's digests
    assert one.count() == spark.read.parquet(f"{log}/bucket={buckets[0]}").count()


class TestEventDedupStream:
    def _events(self, spark):
        from datetime import datetime

        rows = [
            (i, datetime(2026, 1, 1, 0, i % 60), i % 5, "view" if i % 2 else "buy", 1.0, "{}")
            for i in range(40)
        ]
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )

    def test_duplicate_deliveries_collapse(self, spark, tmp_path):
        from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
            run_event_dedup_stream,
        )

        ev = self._events(spark)
        src = str(tmp_path / "src")
        ev.write.mode("overwrite").parquet(src)
        ev.write.mode("append").parquet(src)  # full redelivery
        ev.filter("event_id % 3 = 0").write.mode("append").parquet(src)
        out = run_event_dedup_stream(
            spark, src, str(tmp_path / "sink"), str(tmp_path / "ckpt")
        )
        assert out.count() == 40
        assert out.select("event_id").distinct().count() == 40

    def test_restart_appends_nothing(self, spark, tmp_path):
        from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
            run_event_dedup_stream,
        )

        ev = self._events(spark)
        src = str(tmp_path / "src")
        ev.write.mode("overwrite").parquet(src)
        sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
        assert run_event_dedup_stream(spark, src, sink, ckpt).count() == 40
        # Same checkpoint, no new files: the restarted query must be a
        # no-op (H2/H5 semantics carried over to the event stream).
        assert run_event_dedup_stream(spark, src, sink, ckpt).count() == 40
        # New files arriving after the restart ARE picked up, and
        # still deduped against the watermark state horizon.
        ev.filter("event_id >= 30").write.mode("append").parquet(src)
        assert run_event_dedup_stream(spark, src, sink, ckpt).count() == 40


def test_compact_log_shrinks_files_and_preserves_state(spark, tmp_path, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_log,
        run_corpus_ingest_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "src")
    log_dir = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    # Three deliveries -> three micro-batch appends -> many small files.
    docs.filter("doc_id % 3 = 0").repartition(4).write.mode("append").parquet(src)
    run_corpus_ingest_stream(spark, src, log_dir, ckpt)
    docs.filter("doc_id % 3 = 1").repartition(4).write.mode("append").parquet(src)
    run_corpus_ingest_stream(spark, src, log_dir, ckpt)
    docs.filter("doc_id % 3 = 2").repartition(4).write.mode("append").parquet(src)
    before = run_corpus_ingest_stream(spark, src, log_dir, ckpt)
    state_before = sorted((r["doc_id"], r["digest"]) for r in before.collect())

    stats = compact_log(spark, log_dir, files_per_bucket=1)
    assert stats["files_after"] < stats["files_before"]
    # One file per bucket dir after compaction.
    import collections, os
    per_bucket = collections.Counter()
    for root, _dirs, files in os.walk(log_dir):
        pq = [f for f in files if f.endswith(".parquet")]
        if pq:
            per_bucket[os.path.basename(root)] += len(pq)
    assert per_bucket and all(v == 1 for v in per_bucket.values())

    # The collapsed dedup state is byte-identical, and a post-compaction
    # incremental delivery still dedups against it.
    after = run_corpus_ingest_stream(spark, src, log_dir, ckpt)
    assert sorted((r["doc_id"], r["digest"]) for r in after.collect()) == state_before


def test_event_dedup_stream_on_rocksdb_state_store(spark, tmp_path):
    """The 100 TB state-store configuration: the same watermarked dedup
    stream runs on the RocksDB state store provider (state spills to
    local disk instead of living on the JVM heap — the only provider
    shape that survives billions of in-flight keys) and produces the
    exact rows the default HDFS-backed provider does.  Also asserts
    RocksDB actually engaged by inspecting the checkpoint's state dir.
    """
    import datetime
    import glob

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_event_dedup_stream,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i % 40, t0 + datetime.timedelta(minutes=i % 40), i % 40, "click", 1.0, "{}")
        for i in range(120)  # every event delivered 3x
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).write.parquet(src)

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    prior = spark.conf.get(provider_key, None)
    try:
        spark.conf.set(provider_key, rocksdb)
        out = run_event_dedup_stream(
            spark, src, str(tmp_path / "sink_r"), str(tmp_path / "ckpt_r")
        )
        got = sorted(r["event_id"] for r in out.select("event_id").collect())
    finally:
        if prior is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prior)
    assert got == list(range(40))  # exact dedup, same as the default provider
    # RocksDB leaves its own artifacts under the state checkpoint
    # (zip snapshots / changelog files), which HDFSBackedStateStore never writes
    state_files = glob.glob(str(tmp_path / "ckpt_r" / "state" / "**"), recursive=True)
    assert any(f.endswith((".zip", ".changelog")) for f in state_files), state_files[:20]


# --- incremental near-dup ingestion (run_neardup_ingest_stream, h15/j2m) ---


def _ndoc(doc_id, text, lang="en", source="test"):
    return (doc_id, text, lang, source, len(text))


def _ntext(seed: str, n: int = 30, tweak: int = -1) -> str:
    # Every 5-char shingle of a token (and of a token boundary)
    # contains the group letter, so distinct groups share NO shingles
    # and sit at Jaccard 0; within-group near-dups differ by one token.
    toks = [f"{seed * 3}{j}{seed * 3}" for j in range(n)]
    if tweak >= 0:
        toks[tweak] = f"{seed * 2}9{tweak}9{seed * 2}"
    return " ".join(toks)


def _neardup_fixture(spark):
    """Planted waves exercising every semantic branch of the
    incremental contract:

    - cross-wave suppression: 301 (wave 1) near-dups indexed 3 (wave 0)
    - FIRST-ARRIVED survives: 300 (wave 0) and 7 (wave 1) are
      near-dups; 300 has the larger id but the earlier wave -> 300
      survives, 7 drops (the case no min-keeper dedup reproduces)
    - within-wave shadow: 9 drops against smaller-id 6 (both wave 0)
    - chain through the index: 15 shadowed by 12 in wave 0; 302
      (wave 2) near-dups BOTH -> drops against indexed survivor 12
    - unique docs pass through every wave
    """
    w0 = spark.createDataFrame(
        [
            _ndoc(3, _ntext("a")),
            _ndoc(300, _ntext("b")),
            _ndoc(6, _ntext("c")),
            _ndoc(9, _ntext("c", tweak=2)),
            _ndoc(12, _ntext("d")),
            _ndoc(15, _ntext("d", tweak=4)),
            _ndoc(18, _ntext("e")),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    w1 = spark.createDataFrame(
        [
            _ndoc(301, _ntext("a", tweak=1)),
            _ndoc(7, _ntext("b", tweak=3)),
            _ndoc(19, _ntext("f")),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    w2 = spark.createDataFrame(
        [
            _ndoc(302, _ntext("d", tweak=7)),
            _ndoc(20, _ntext("g")),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    expected_survivors = {3, 300, 6, 12, 18, 19, 20}
    return [w0, w1, w2], expected_survivors


def _write_waves(waves, src, start=0):
    """Append waves with pinned strictly-increasing mtimes so the
    FileStreamSource's modification-time drain order is deterministic
    (first-arrived-survives depends on it)."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        write_arrival_wave,
    )

    for i, w in enumerate(waves):
        write_arrival_wave(w, src, start + i)


def test_neardup_ingest_planted_semantics(spark, tmp_path):
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_neardup_ingest_stream,
    )

    waves, expected = _neardup_fixture(spark)
    src = str(tmp_path / "src")
    _write_waves(waves, src)
    out = run_neardup_ingest_stream(
        spark,
        src,
        str(tmp_path / "log"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    assert {r["doc_id"] for r in out.collect()} == expected


def test_neardup_ingest_stream_equals_batch_twin(spark, tmp_path):
    """Independent-path agreement: the per-batch index-probe stream and
    the global-pair-table batch fold must produce the same survivor
    set on waves that match the batch twin's doc_id % 3 assignment."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        incremental_neardup_dedup,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_neardup_ingest_stream,
    )

    waves, _ = _neardup_fixture(spark)
    # _neardup_fixture ids are constructed so wave == doc_id % 3
    corpus = waves[0]
    for w in waves[1:]:
        corpus = corpus.unionByName(w)
    src = str(tmp_path / "src")
    _write_waves(waves, src)
    stream_surv = {
        r["doc_id"]
        for r in run_neardup_ingest_stream(
            spark,
            src,
            str(tmp_path / "log"),
            str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
        ).collect()
    }
    twin = incremental_neardup_dedup(corpus, n_waves=3)
    twin_surv = {r["doc_id"] for r in twin.collect() if r["survived"]}
    assert stream_surv == twin_surv
    # and the twin's wave assignment matches the planted waves
    assert all(
        r["wave"] == r["doc_id"] % 3 for r in twin.collect()
    )


def test_neardup_ingest_periodic_drains_equal_single_run(spark, tmp_path):
    """Delivering one wave per availableNow run over a SHARED
    checkpoint (the periodic-drain cadence — each later run is exactly
    a checkpoint RESTART with new files pending) must equal the single
    rate-limited run."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_neardup_ingest_stream,
    )

    waves, expected = _neardup_fixture(spark)
    src_a = str(tmp_path / "src_a")
    out = None
    for w in waves:
        w.coalesce(1).write.mode("append").parquet(src_a)
        out = run_neardup_ingest_stream(
            spark, src_a, str(tmp_path / "log_a"), str(tmp_path / "ckpt_a")
        )
    drained = {r["doc_id"] for r in out.collect()}
    assert drained == expected
    # restart with nothing pending appends nothing
    again = run_neardup_ingest_stream(
        spark, src_a, str(tmp_path / "log_a"), str(tmp_path / "ckpt_a")
    )
    assert {r["doc_id"] for r in again.collect()} == expected


def test_neardup_ingest_redelivery_is_absorbed(spark, tmp_path):
    """Full redelivery of every wave under a NEW checkpoint (the h10
    at-least-once delivery pattern): each redelivered document
    re-verifies against its own indexed copy at Jaccard 1.0 and drops,
    so the ledger read-back is unchanged."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_neardup_ingest_stream,
    )

    waves, expected = _neardup_fixture(spark)
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    first = run_neardup_ingest_stream(
        spark, src, log, str(tmp_path / "ckpt1"), max_files_per_trigger=1
    )
    assert {r["doc_id"] for r in first.collect()} == expected
    # redeliver everything: new files, fresh checkpoint, same ledgers
    _write_waves(waves, src, start=len(waves))
    second = run_neardup_ingest_stream(
        spark, src, log, str(tmp_path / "ckpt2"), max_files_per_trigger=1
    )
    rows = second.collect()
    assert {r["doc_id"] for r in rows} == expected
    assert len(rows) == len(expected)  # read-back collapses, no doubles


def test_neardup_ingest_index_probe_is_bucket_pruned(spark, tmp_path):
    """The per-batch index probe must read only the bucket partitions
    the batch's band hashes touch (h8's partition-pruning contract,
    applied to the LSH index ledger)."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_neardup_ingest_stream,
    )

    waves, _ = _neardup_fixture(spark)
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    run_neardup_ingest_stream(
        spark, src, log, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    idx = spark.read.parquet(f"{log}/index")
    all_buckets = {r[0] for r in idx.select("bucket").distinct().collect()}
    assert len(all_buckets) > 1, "fixture bands should spread over buckets"

    def _pruned(df, col):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        part = plan.split("PartitionFilters", 1)
        return len(part) == 2 and col in part[1].split("]", 1)[0]

    # the index probe shape: filter on the band-bucket partition column
    assert _pruned(idx.filter(F.col("bucket").isin([min(all_buckets)])), "bucket"), (
        "bucket predicate must prune partitions at the scan, not filter rows"
    )
    # the fingerprint fetch shape: the docs ledger is doc_id-hash
    # bucketed and the per-batch hs read filters on dbucket — at 100 TB
    # the ledger is corpus-sized, so this prune is what keeps the
    # per-batch fetch batch-sized instead of corpus-sized.
    docs_led = spark.read.parquet(f"{log}/docs")
    dbuckets = {r[0] for r in docs_led.select("dbucket").distinct().collect()}
    assert len(dbuckets) > 1, "fixture docs should spread over dbuckets"
    assert _pruned(
        docs_led.filter(F.col("dbucket").isin([min(dbuckets)])), "dbucket"
    ), "dbucket predicate must prune the docs-ledger scan"


def test_neardup_ledger_compaction_preserves_state(spark, tmp_path):
    """Compaction must shrink both ledgers' file counts, leave the
    survivor read-back unchanged, and keep the at-rest index fully
    probe-able: a post-compaction delivery of a near-dup of an indexed
    survivor must still drop."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_neardup_ledgers,
        run_neardup_ingest_stream,
    )

    waves, expected = _neardup_fixture(spark)
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    run_neardup_ingest_stream(
        spark, src, log, str(tmp_path / "ckpt1"), max_files_per_trigger=1
    )
    # redeliver everything (new checkpoint): absorbed, but the ledgers
    # now hold replay-duplicate APPENDS the compaction should fold away
    _write_waves(waves, src, start=len(waves))
    run_neardup_ingest_stream(
        spark, src, log, str(tmp_path / "ckpt2"), max_files_per_trigger=1
    )

    # Both lineages (ckpt1, ckpt2) have fully drained — assert that to
    # the mechanically-checked single-lineage constraint.
    stats = compact_neardup_ledgers(spark, log, allow_multi_lineage=True)
    assert stats["docs"]["files_after"] < stats["docs"]["files_before"]
    assert stats["index"]["files_after"] < stats["index"]["files_before"]
    docs_led = spark.read.parquet(f"{log}/docs")
    assert docs_led.count() == len(expected)  # one row per survivor
    assert {r["doc_id"] for r in docs_led.collect()} == expected

    # the compacted index still drives the probe: a fresh near-dup of
    # survivor 3 ("a" group) delivered post-compaction must drop
    extra = spark.createDataFrame(
        [_ndoc(999, _ntext("a", tweak=5)), _ndoc(998, _ntext("h"))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _write_waves([extra], src, start=2 * len(waves))
    out = run_neardup_ingest_stream(
        spark, src, log, str(tmp_path / "ckpt3"), max_files_per_trigger=100
    )
    assert {r["doc_id"] for r in out.collect()} == expected | {998}


def _substr_fixture(spark):
    """Planted keep-first substring corpus, wave == doc_id % 3 (the
    TestIncrementalSubstringDedup fixture re-cut into wave frames)."""
    P = " ".join(f"p{i}" for i in range(10))
    Q = " ".join(f"q{i}" for i in range(10))
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    def doc(i, text):
        return (i, text, "en", "t", len(text))

    w0 = spark.createDataFrame(
        [
            doc(3, " ".join(f"a{i}" for i in range(5)) + f" {P} "
                + " ".join(f"a{i}" for i in range(5, 10))),
            doc(6, " ".join(f"b{i}" for i in range(4)) + f" {P} "
                + " ".join(f"b{i}" for i in range(4, 8))),
            doc(9, f"{Q} e0 e1 {Q}"),
        ],
        schema,
    )
    w1 = spark.createDataFrame(
        [doc(1, f"c0 c1 {P} " + " ".join(f"c{i}" for i in range(2, 8)))],
        schema,
    )
    w2 = spark.createDataFrame(
        [doc(2, " ".join(f"d{i}" for i in range(20)))], schema
    )
    return [w0, w1, w2]


def test_substring_stream_planted_and_equals_batch_twin(spark, tmp_path):
    """Stream result == batch twin on the planted corpus, and the
    planted expectations hold: first arrival of P (doc 3) intact,
    same-wave higher id (doc 6) cut, later-wave SMALLER id (doc 1)
    still cut (first-arrived beats min-keeper), within-doc repeat
    (doc 9) keeps its first occurrence, unique doc 2 untouched."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        incremental_substring_dedup,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_substring_dedup_stream,
    )

    waves = _substr_fixture(spark)
    src = str(tmp_path / "src")
    _write_waves(waves, src)
    out = {
        r["doc_id"]: r
        for r in run_substring_dedup_stream(
            spark,
            src,
            str(tmp_path / "log"),
            str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
        ).collect()
    }
    assert out[3]["n_removed"] == 0
    assert out[6]["n_removed"] == 10
    assert out[1]["n_removed"] == 10
    assert out[2]["n_removed"] == 0
    assert out[9]["n_removed"] == 10
    assert out[9]["cleaned_text"].split() == (
        [f"q{i}" for i in range(10)] + ["e0", "e1"]
    )

    corpus = waves[0]
    for w in waves[1:]:
        corpus = corpus.unionByName(w)
    twin = {
        r["doc_id"]: r
        for r in incremental_substring_dedup(corpus, n_waves=3, k=8).collect()
    }
    assert set(twin) == set(out)
    for i, r in twin.items():
        assert (r["n_tokens"], r["n_removed"], r["cleaned_text"]) == (
            out[i]["n_tokens"],
            out[i]["n_removed"],
            out[i]["cleaned_text"],
        ), f"doc {i} diverges"


def test_substring_stream_redelivery_absorbed(spark, tmp_path):
    """Full redelivery under a NEW checkpoint: every redelivered doc is
    skipped by the doc_id probe (never re-cut against its own grams),
    so the read-back is byte-identical."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_substring_dedup_stream,
    )

    waves = _substr_fixture(spark)
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    first = {
        r["doc_id"]: r
        for r in run_substring_dedup_stream(
            spark, src, log, str(tmp_path / "ckpt1"), max_files_per_trigger=1
        ).collect()
    }
    _write_waves(waves, src, start=len(waves))
    rows = run_substring_dedup_stream(
        spark, src, log, str(tmp_path / "ckpt2"), max_files_per_trigger=1
    ).collect()
    assert len(rows) == len(first)
    for r in rows:
        f = first[r["doc_id"]]
        assert (r["n_removed"], r["cleaned_text"]) == (
            f["n_removed"],
            f["cleaned_text"],
        )


def test_substring_stream_gram_probe_is_bucket_pruned(spark, tmp_path):
    """Both at-rest probes (gram ledger by gbucket, docs ledger by
    dbucket) must prune partitions at the scan — the 100 TB contract
    that keeps per-batch cost batch-sized as the ledgers grow."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_substring_dedup_stream,
    )

    waves = _substr_fixture(spark)
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    run_substring_dedup_stream(
        spark, src, log, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )

    def _pruned(df, col):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        part = plan.split("PartitionFilters", 1)
        return len(part) == 2 and col in part[1].split("]", 1)[0]

    grams = spark.read.parquet(f"{log}/grams")
    gbuckets = {r[0] for r in grams.select("gbucket").distinct().collect()}
    assert len(gbuckets) > 1, "fixture grams should spread over buckets"
    assert _pruned(grams.filter(F.col("gbucket").isin([min(gbuckets)])), "gbucket")
    docs_led = spark.read.parquet(f"{log}/docs")
    dbuckets = {r[0] for r in docs_led.select("dbucket").distinct().collect()}
    assert _pruned(docs_led.filter(F.col("dbucket").isin([min(dbuckets)])), "dbucket")


def test_substring_ledger_compaction_preserves_state(spark, tmp_path):
    """Compaction must shrink both substring ledgers' file counts,
    leave the cleaned read-back unchanged, and keep the gram ledger
    probe-able: a post-compaction delivery repeating an indexed
    passage must still be cut."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_substring_ledgers,
        run_substring_dedup_stream,
        write_arrival_wave,
    )

    waves = _substr_fixture(spark)
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    first = {
        (r["doc_id"], r["n_removed"], r["cleaned_text"])
        for r in run_substring_dedup_stream(
            spark, src, log, str(tmp_path / "ckpt1"), max_files_per_trigger=1
        ).collect()
    }
    # full redelivery (new checkpoint): absorbed, ledgers gain files
    _write_waves(waves, src, start=len(waves))
    run_substring_dedup_stream(
        spark, src, log, str(tmp_path / "ckpt2"), max_files_per_trigger=1
    )

    stats = compact_substring_ledgers(spark, log, allow_multi_lineage=True)
    assert stats["docs"]["files_after"] < stats["docs"]["files_before"]
    assert stats["grams"]["files_after"] < stats["grams"]["files_before"]
    docs_led = spark.read.parquet(f"{log}/docs")
    assert docs_led.count() == len(first)  # one row per doc
    assert {
        (r["doc_id"], r["n_removed"], r["cleaned_text"])
        for r in docs_led.collect()
    } == first

    # the compacted gram ledger still drives the cut: a fresh doc
    # repeating P (first seen in doc 3) must lose it post-compaction
    P = " ".join(f"p{i}" for i in range(10))
    extra = spark.createDataFrame(
        [(100, f"z0 z1 z2 {P} z3 z4", "en", "t", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    write_arrival_wave(extra, src, 99)
    out = {
        r["doc_id"]: r
        for r in run_substring_dedup_stream(
            spark, src, log, str(tmp_path / "ckpt3")
        ).collect()
    }
    assert out[100]["n_removed"] == 10
    assert "p0" not in out[100]["cleaned_text"].split()


def test_decontaminate_stream_equals_batch_and_absorbs_redelivery(
    spark, sf_dir, tmp_path
):
    """The streaming gate must reproduce the batch j8 relation
    row-for-row (stateless per doc), and a full redelivery under a new
    checkpoint must collapse in the read-back."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import decontaminate
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_decontaminate_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select("text")
    waves = [docs.filter(F.col("doc_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    out = {
        r["doc_id"]: r
        for r in run_decontaminate_stream(
            spark, src, bench, log, str(tmp_path / "ckpt1"),
            max_files_per_trigger=1,
        ).collect()
    }
    assert len(out) == docs.count()
    batch = {
        r["doc_id"]: r["n_contaminated_grams"]
        for r in decontaminate(docs, bench).collect()
    }
    for i, r in out.items():
        if i in batch:
            assert r["quarantined"] and r["n_contaminated_grams"] == batch[i]
        else:
            assert not r["quarantined"] and r["n_contaminated_grams"] == 0

    # redelivery under a new checkpoint: absorbed
    _write_waves(waves, src, start=len(waves))
    rows = run_decontaminate_stream(
        spark, src, bench, log, str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    ).collect()
    assert len(rows) == len(out)


def test_topk_maintenance_stream_equals_batch_and_absorbs_redelivery(
    spark, sf_dir, tmp_path
):
    """The per-batch-winners ledger fold must equal the batch
    brute-force top-k over the drained corpus (global winner ⊆ its own
    batch's winners), and redelivery must collapse content-addressed."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        brute_force_topk,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_topk_maintenance_stream,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    waves = [emb.filter(F.col("vec_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    out = run_topk_maintenance_stream(
        spark, src, queries, log, str(tmp_path / "ckpt1"),
        k=5, max_files_per_trigger=1,
    )
    got = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in out.collect()}
    want = {
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    assert got == want

    # redelivery under a new checkpoint: ledger gains rows, fold unchanged
    _write_waves(waves, src, start=len(waves))
    again = run_topk_maintenance_stream(
        spark, src, queries, log, str(tmp_path / "ckpt2"),
        k=5, max_files_per_trigger=1,
    )
    assert {
        (r["query_id"], r["neighbor_id"], r["rnk"]) for r in again.collect()
    } == want


def test_media_dedup_stream_equals_batch_twin_and_plants(spark, sf_dir, tmp_path):
    """Stream == batch twin on the real fixture corpus, and a planted
    near-twin text (same bytes except the ends — hamming ≤ 3 dhash)
    delivered in a LATER wave is dropped while its original survives."""
    from realtime_cdc_pipeline_docker_spark.operators.multimodal import (
        attach_binary_payload,
        incremental_media_dedup,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_media_dedup_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    waves = [docs.filter(F.col("doc_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    _write_waves(waves, src)
    surv = {
        r["doc_id"]
        for r in run_media_dedup_stream(
            spark, src, str(tmp_path / "log"), str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
        ).collect()
    }
    twin = incremental_media_dedup(attach_binary_payload(docs), n_waves=3)
    twin_surv = {r["doc_id"] for r in twin.collect() if r["survived"]}
    assert surv == twin_surv

    # planted near-twin: doc 0's text, first char swapped, delivered
    # later at a higher id in a fresh stream — must drop against the
    # indexed original
    base = docs.orderBy("doc_id").limit(1).collect()[0]
    src2 = str(tmp_path / "src2")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    w0 = spark.createDataFrame([(base["doc_id"], base["text"], "en", "t", 1)], schema)
    tweaked = "Z" + base["text"][1:]
    w1 = spark.createDataFrame([(base["doc_id"] + 3, tweaked, "en", "t", 1)], schema)
    _write_waves([w0, w1], src2)
    out2 = {
        r["doc_id"]
        for r in run_media_dedup_stream(
            spark, src2, str(tmp_path / "log2"), str(tmp_path / "ckpt2"),
            max_files_per_trigger=1,
        ).collect()
    }
    assert out2 == {base["doc_id"]}


def test_media_dedup_stream_redelivery_absorbed(spark, sf_dir, tmp_path):
    """Redelivered media rows re-verify against their own indexed copy
    at Hamming 0 and drop; the survivor set is unchanged."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_media_dedup_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    waves = [docs.filter(F.col("doc_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    first = {
        r["doc_id"]
        for r in run_media_dedup_stream(
            spark, src, log, str(tmp_path / "ckpt1"), max_files_per_trigger=1
        ).collect()
    }
    _write_waves(waves, src, start=len(waves))
    rows = run_media_dedup_stream(
        spark, src, log, str(tmp_path / "ckpt2"), max_files_per_trigger=1
    ).collect()
    assert {r["doc_id"] for r in rows} == first
    assert len(rows) == len(first)


def test_substring_stream_wiped_checkpoint_replay_is_stable(spark, tmp_path):
    """Full crash-replay: wiping the checkpoint replays every wave
    under the SAME lineage tag with batch ids restarting at 0 — each
    replayed batch must exclude exactly the original run's
    corresponding appends via the (tag, batch) key, recompute
    byte-identically, and collapse in the read-back."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_substring_dedup_stream,
    )

    waves = _substr_fixture(spark)
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    _write_waves(waves, src)
    first = {
        r["doc_id"]: (r["n_removed"], r["cleaned_text"])
        for r in run_substring_dedup_stream(
            spark, src, log, ckpt, max_files_per_trigger=1
        ).collect()
    }
    import shutil

    shutil.rmtree(ckpt)
    rows = run_substring_dedup_stream(
        spark, src, log, ckpt, max_files_per_trigger=1
    ).collect()
    assert len(rows) == len(first)
    for r in rows:
        assert (r["n_removed"], r["cleaned_text"]) == first[r["doc_id"]]
    # Byte-identical recomputation, asserted on the LEDGER itself (not
    # just the tie-broken read-back): replay appends must agree with
    # the original rows under the identical (doc, tag, batch) key —
    # the ADVICE r10 conflicting-rows reproduction must be impossible.
    led = spark.read.parquet(f"{log}/docs")
    keys = led.select("doc_id", "__run_tag", "__batch_id").distinct().count()
    full = led.distinct().count()
    assert full == keys, "replay wrote conflicting rows under one key"


def test_compaction_refuses_multi_lineage_ledger(spark, tmp_path):
    """The single-lineage compaction constraint is mechanically
    checked: a ledger holding two checkpoint lineages raises unless
    the caller asserts both have drained (ADVICE r10)."""
    import pytest

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_substring_ledgers,
        run_substring_dedup_stream,
    )

    waves = _substr_fixture(spark)
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    run_substring_dedup_stream(spark, src, log, str(tmp_path / "ckpt1"))
    # single lineage: compaction is allowed without the override
    compact_substring_ledgers(spark, log)
    # a second lineage delivers NEW material -> two tags in the ledger
    extra = spark.createDataFrame(
        [(200, " ".join(f"x{i}" for i in range(12)), "en", "t", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _write_waves([extra], src, start=len(waves))
    run_substring_dedup_stream(spark, src, log, str(tmp_path / "ckpt2"))
    led = spark.read.parquet(f"{log}/grams")
    assert led.select("__run_tag").distinct().count() > 1
    with pytest.raises(ValueError, match="multiple checkpoint lineages"):
        compact_substring_ledgers(spark, log)
    compact_substring_ledgers(spark, log, allow_multi_lineage=True)


def test_media_dedup_stream_wiped_checkpoint_replay_is_stable(
    spark, sf_dir, tmp_path
):
    """Same crash-replay contract for the media stream: a wiped
    checkpoint replays every wave under the original lineage tag and
    the survivor set must be unchanged."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_media_dedup_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    waves = [docs.filter(F.col("doc_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    _write_waves(waves, src)
    first = {
        r["doc_id"]
        for r in run_media_dedup_stream(
            spark, src, log, ckpt, max_files_per_trigger=1
        ).collect()
    }
    import shutil

    shutil.rmtree(ckpt)
    rows = run_media_dedup_stream(
        spark, src, log, ckpt, max_files_per_trigger=1
    ).collect()
    assert {r["doc_id"] for r in rows} == first
    assert len(rows) == len(first)


def test_topk_ledger_compaction_is_exact(spark, sf_dir, tmp_path):
    """Compacting the candidates ledger to the global per-query top-k
    must leave the fold unchanged, reset ledger size to |queries| * k
    (read-back cost flat over the stream's life), and preserve every
    FUTURE fold: vectors delivered post-compaction still rank exactly
    as the batch brute-force over the whole corpus."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        brute_force_topk,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_topk_ledger,
        run_topk_maintenance_stream,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    early = emb.filter(F.col("vec_id") % 4 != 0)
    late = emb.filter(F.col("vec_id") % 4 == 0)
    waves = [early.filter(F.col("vec_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    out = run_topk_maintenance_stream(
        spark, src, queries, log, str(tmp_path / "ckpt1"),
        k=5, max_files_per_trigger=1,
    )
    before_fold = {
        (r["query_id"], r["neighbor_id"], r["rnk"]) for r in out.collect()
    }

    stats = compact_topk_ledger(spark, log, k=5)
    assert stats["files_after"] < stats["files_before"]
    assert stats["rows_after"] == queries.count() * 5  # flat: |queries|*k
    assert stats["rows_after"] < stats["rows_before"]
    from pyspark.sql import Window

    compacted = spark.read.parquet(log)
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    fold = {
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in compacted.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .collect()
    }
    assert fold == before_fold

    # future folds preserved: deliver the held-out quarter, compare to
    # batch brute-force over the FULL corpus
    _write_waves([late], src, start=len(waves))
    again = run_topk_maintenance_stream(
        spark, src, queries, log, str(tmp_path / "ckpt2"),
        k=5, max_files_per_trigger=1,
    )
    want = {
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    assert {
        (r["query_id"], r["neighbor_id"], r["rnk"]) for r in again.collect()
    } == want


def test_media_ledger_compaction_preserves_state(spark, sf_dir, tmp_path):
    """Compaction must shrink both media ledgers' file counts, leave
    the survivor read-back unchanged, and keep the at-rest index
    probe-able: a post-compaction near-twin of an indexed survivor
    must still drop."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_media_ledgers,
        run_media_dedup_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    waves = [docs.filter(F.col("doc_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    first = {
        r["doc_id"]
        for r in run_media_dedup_stream(
            spark, src, log, str(tmp_path / "ckpt1"), max_files_per_trigger=1
        ).collect()
    }

    stats = compact_media_ledgers(spark, log)
    assert stats["docs"]["files_after"] < stats["docs"]["files_before"]
    assert stats["index"]["files_after"] < stats["index"]["files_before"]
    docs_led = spark.read.parquet(f"{log}/docs")
    assert docs_led.count() == len(first)
    assert {r["doc_id"] for r in docs_led.collect()} == first

    # compacted index still drives the probe: a near-twin (first char
    # swapped -> hamming <= 3 dhash) of a surviving doc must drop
    base = docs.join(
        spark.createDataFrame([(i,) for i in sorted(first)[:1]], "doc_id long"),
        "doc_id",
    ).collect()[0]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    extra = spark.createDataFrame(
        [
            (900_000, "Z" + base["text"][1:], "en", "t", 1),
        ],
        schema,
    )
    _write_waves([extra], src, start=len(waves))
    out = run_media_dedup_stream(
        spark, src, log, str(tmp_path / "ckpt2"), max_files_per_trigger=1
    )
    assert {r["doc_id"] for r in out.collect()} == first


def test_ivf_maintenance_stream_parity_redelivery_and_recall(
    spark, sf_dir, tmp_path
):
    """The maintained IVF layout must be row-identical to the batch
    ``write_ivf_index`` build with the same frozen centroids (stream ==
    batch parity), absorb full redelivery under a new checkpoint
    (content-addressed rows collapse), and keep index QUALITY
    oracle-checked via the j3q composition: querying the MAINTAINED
    index achieves recall >= 0.8 vs exact brute force."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        brute_force_topk,
        ivf_index_topk,
        train_ivf_centroids,
        write_ivf_index,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_ivf_maintenance_stream,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = train_ivf_centroids(emb, n_centroids=16)
    waves = [emb.filter(F.col("vec_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    idx_dir = str(tmp_path / "index")
    _write_waves(waves, src)
    stats = run_ivf_maintenance_stream(
        spark, src, centroids, idx_dir, str(tmp_path / "ckpt1"),
        max_files_per_trigger=1,
    ).collect()
    assert stats, "per-cluster stats expected"
    n_total = sum(r["n_vectors"] for r in stats)

    # stream == batch layout parity (same centroids, same assign)
    batch_dir = str(tmp_path / "batch_index")
    write_ivf_index(emb, batch_dir, centroids, assign=2)
    got = {
        (r["vec_id"], r["cluster"])
        for r in spark.read.parquet(idx_dir).select("vec_id", "cluster").collect()
    }
    want = {
        (r["vec_id"], r["cluster"])
        for r in spark.read.parquet(batch_dir).select("vec_id", "cluster").collect()
    }
    assert got == want
    assert n_total == len(want)

    # drift observable: skew is per-cluster size relative to the mean
    mean = n_total / len(stats)
    for r in stats:
        assert r["growth_skew_permille"] == int(r["n_vectors"] * 1000 / mean)

    # redelivery under a new checkpoint: rows collapse content-addressed
    _write_waves(waves, src, start=len(waves))
    stats2 = run_ivf_maintenance_stream(
        spark, src, centroids, idx_dir, str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    ).collect()
    assert {(r["cluster"], r["n_vectors"]) for r in stats2} == {
        (r["cluster"], r["n_vectors"]) for r in stats
    }

    # j3q composition: recall of the MAINTAINED index vs exact truth
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_index_topk(
            spark, idx_dir, queries, centroids, k=5, nprobe=6
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"maintained-index recall {recall:.2f} < 0.8"


def test_semantic_decontaminate_stream_equals_batch_and_absorbs_redelivery(
    spark, sf_dir, tmp_path
):
    """The streaming gate must reproduce the batch j8d relation
    row-for-row (stateless per vector, integer cross-multiplied gate),
    flag the planted scaled copies (cosine exactly 1 with their
    benchmark twin), and collapse a full redelivery under a new
    checkpoint in the read-back."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_semantic_decontaminate_stream,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench = emb.filter(F.col("vec_id") % 40 == 0).select("vec_id", "embedding")
    corpus = (
        emb.filter(F.col("vec_id") % 40 != 0)
        .select("vec_id", "embedding", "label")
        .unionByName(
            emb.filter(F.col("vec_id") % 120 == 0).select(
                (F.col("vec_id") + 1_000_000).alias("vec_id"),
                F.transform(
                    "embedding", lambda x: x * F.lit(2.0).cast("float")
                ).alias("embedding"),
                "label",
            )
        )
    )
    waves = [corpus.filter(F.col("vec_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    out = {
        r["vec_id"]: r
        for r in run_semantic_decontaminate_stream(
            spark, src, bench, log, str(tmp_path / "ckpt1"),
            max_files_per_trigger=1,
        ).collect()
    }
    assert len(out) == corpus.count()
    # every planted scale-2 copy is quarantined with its twin as a hit
    planted = [r["vec_id"] for r in emb.filter(F.col("vec_id") % 120 == 0).collect()]
    assert planted
    for v in planted:
        r = out[v + 1_000_000]
        assert r["quarantined"] and r["n_bench_hits"] >= 1
        assert r["first_bench_id"] is not None
    # clean rows carry the audit-null contract
    n_quar = sum(1 for r in out.values() if r["quarantined"])
    assert 0 < n_quar < len(out)
    for r in out.values():
        if not r["quarantined"]:
            assert r["n_bench_hits"] == 0 and r["first_bench_id"] is None

    # redelivery under a new checkpoint: absorbed in the read-back
    _write_waves(waves, src, start=len(waves))
    rows = run_semantic_decontaminate_stream(
        spark, src, bench, log, str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    ).collect()
    assert len(rows) == len(out)
    for r in rows:
        f = out[r["vec_id"]]
        assert (r["quarantined"], r["n_bench_hits"], r["first_bench_id"]) == (
            f["quarantined"], f["n_bench_hits"], f["first_bench_id"]
        )


def test_gate_ledger_compaction_collapses_redelivery_duplicates(
    spark, sf_dir, tmp_path
):
    """After a full redelivery the gate ledgers hold duplicate
    content-addressed rows and twice the files; compaction must fold
    both to one row per doc with the relation unchanged."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_gate_ledgers,
        run_decontaminate_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select("text")
    waves = [docs.filter(F.col("doc_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    _write_waves(waves, src)
    first = {
        (r["doc_id"], r["quarantined"], r["n_contaminated_grams"])
        for r in run_decontaminate_stream(
            spark, src, bench, log, str(tmp_path / "ckpt1"),
            max_files_per_trigger=1,
        ).collect()
    }
    _write_waves(waves, src, start=len(waves))
    run_decontaminate_stream(
        spark, src, bench, log, str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    assert spark.read.parquet(f"{log}/clean").count() > len(
        [r for r in first if not r[1]]
    ), "redelivery should have appended duplicate rows"

    stats = compact_gate_ledgers(spark, log, key_col="doc_id")
    for side in ("clean", "quarantine"):
        assert stats[side]["files_after"] < stats[side]["files_before"]
        assert stats[side]["rows_after"] < stats[side]["rows_before"]
    folded = {
        (r["doc_id"], r["quarantined"], r["n_contaminated_grams"])
        for p in ("clean", "quarantine")
        for r in spark.read.parquet(f"{log}/{p}").collect()
    }
    assert folded == first


def test_substring_stream_wiped_replay_with_foreign_lineage(spark, tmp_path):
    """The ADVICE r10 fix under the WORST interleave: ledger holds a
    FOREIGN lineage's rows AND the own lineage is wiped-checkpoint
    replayed.  The replayed batches must still see the foreign
    lineage's state (redelivery absorption) while excluding their own
    lineage's later batches — read-back byte-identical to the
    pre-replay state."""
    import shutil

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_substring_dedup_stream,
    )

    waves = _substr_fixture(spark)
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    # lineage A ingests the full fixture
    _write_waves(waves, src)
    first = {
        r["doc_id"]: (r["n_removed"], r["cleaned_text"])
        for r in run_substring_dedup_stream(
            spark, src, log, str(tmp_path / "ckptA"), max_files_per_trigger=1
        ).collect()
    }
    # lineage B delivers NEW material -> foreign rows in the ledger
    extra = spark.createDataFrame(
        [(300, " ".join(f"y{i}" for i in range(12)), "en", "t", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _write_waves([extra], src, start=len(waves))
    ckpt_b = str(tmp_path / "ckptB")
    second = {
        r["doc_id"]: (r["n_removed"], r["cleaned_text"])
        for r in run_substring_dedup_stream(
            spark, src, log, ckpt_b, max_files_per_trigger=1
        ).collect()
    }
    assert set(second) == set(first) | {300}
    # wipe lineage B's checkpoint: it replays EVERYTHING (all 4 files)
    # under its own tag with batch ids restarting at 0 — lineage A's
    # rows stay visible (absorption), B's own later batches do not.
    shutil.rmtree(ckpt_b)
    rows = run_substring_dedup_stream(
        spark, src, log, ckpt_b, max_files_per_trigger=1
    ).collect()
    assert len(rows) == len(second)
    for r in rows:
        assert (r["n_removed"], r["cleaned_text"]) == second[r["doc_id"]], (
            f"doc {r['doc_id']} diverged after cross-lineage wiped replay"
        )


def test_ivf_rebuild_restores_quality_after_drift(spark, sf_dir, tmp_path):
    """The maintenance lifecycle end-to-end: maintain under FROZEN
    centroids trained on HALF the distribution, watch the drift
    observable move, re-train + rebuild in place, and verify (a) the
    rebuilt layout is exactly the batch build over the accumulated
    corpus, (b) queries over the rebuilt index hit recall >= 0.8 vs
    exact truth, (c) the layout stays partition-pruned."""
    from pyspark.sql import functions as F2

    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        brute_force_topk,
        ivf_index_topk,
        rebuild_ivf_index,
        train_ivf_centroids,
        write_ivf_index,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_ivf_maintenance_stream,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    frozen = train_ivf_centroids(half, n_centroids=16)
    waves = [emb.filter(F.col("vec_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    idx_dir = str(tmp_path / "index")
    _write_waves(waves, src)
    run_ivf_maintenance_stream(
        spark, src, frozen, idx_dir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )

    new_centroids = rebuild_ivf_index(spark, idx_dir, n_centroids=16)

    # (a) rebuilt layout == batch build over the accumulated corpus
    batch_dir = str(tmp_path / "batch")
    write_ivf_index(emb, batch_dir, new_centroids, assign=2)
    got = {
        (r["vec_id"], r["cluster"])
        for r in spark.read.parquet(idx_dir).select("vec_id", "cluster").collect()
    }
    want = {
        (r["vec_id"], r["cluster"])
        for r in spark.read.parquet(batch_dir).select("vec_id", "cluster").collect()
    }
    assert got == want

    # (b) recall over the rebuilt index
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_index_topk(
            spark, idx_dir, queries, new_centroids, k=5, nprobe=6
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.8

    # (c) cluster predicate still prunes at the scan
    idx = spark.read.parquet(idx_dir)
    plan = idx.filter(F2.col("cluster").isin([0])) \
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    part = plan.split("PartitionFilters", 1)
    assert len(part) == 2 and "cluster" in part[1].split("]", 1)[0]


def test_ledger_is_small_uses_bytes_not_just_files(spark, tmp_path):
    """A COMPACTED ledger holds arbitrarily many rows in a handful of
    files — the prune-skip must key on total BYTES too, or it would
    full-scan a huge compacted ledger forever."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        _ledger_is_small,
    )

    path = str(tmp_path / "led")
    spark.range(1000).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(path)
    led = spark.read.parquet(path)
    # one small file: small under the default byte cap
    assert _ledger_is_small(led, max_files=64) is True
    # same single file, but a byte cap below its size: NOT small —
    # the compacted-huge-ledger case in miniature
    assert _ledger_is_small(led, max_files=64, max_bytes=64) is False
    # file-count signal alone still trips
    assert _ledger_is_small(led, max_files=0) is False


def test_stream_probe_pruned_path_matches_skip_path(spark, tmp_path):
    """Result-identity of the two probe modes: forcing the
    touched-bucket prune (prune_min_files=0, the 100 TB path) must
    produce byte-identical read-backs to the young-ledger full-scan
    skip (the default at fixture scale) for both the near-dup and the
    substring streams."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_neardup_ingest_stream,
        run_substring_dedup_stream,
    )

    waves = _substr_fixture(spark)
    for runner, cols in (
        (run_neardup_ingest_stream, lambda r: (r["doc_id"],)),
        (
            run_substring_dedup_stream,
            lambda r: (r["doc_id"], r["n_removed"], r["cleaned_text"]),
        ),
    ):
        name = runner.__name__
        src = str(tmp_path / f"src_{name}")
        _write_waves(waves, src)
        skip = {
            cols(r)
            for r in runner(
                spark, src, str(tmp_path / f"log_skip_{name}"),
                str(tmp_path / f"ckpt_skip_{name}"), max_files_per_trigger=1,
            ).collect()
        }
        pruned = {
            cols(r)
            for r in runner(
                spark, src, str(tmp_path / f"log_prune_{name}"),
                str(tmp_path / f"ckpt_prune_{name}"),
                max_files_per_trigger=1, prune_min_files=0,
            ).collect()
        }
        assert pruned == skip, f"{name}: probe modes diverge"


def test_ivfpq_maintenance_stream_parity_redelivery_and_recall(
    spark, sf_dir, tmp_path
):
    """The maintained IVF-PQ layout must be row-identical (ids,
    clusters, AND code arrays) to the batch write_ivfpq_index build
    with the same frozen centroids + codebook, absorb redelivery
    under a new checkpoint, and answer ADC queries at recall >= 0.8
    vs exact truth."""
    from realtime_cdc_pipeline_docker_spark.functions import vec_normalize
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_index_topk,
        seed_codebook,
        train_ivf_centroids,
        write_ivfpq_index,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_ivfpq_maintenance_stream,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = train_ivf_centroids(emb, n_centroids=16)
    normed = emb.select("vec_id", vec_normalize("embedding").alias("embedding"))
    codebook = seed_codebook(normed, k=16)
    waves = [emb.filter(F.col("vec_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    idx_dir = str(tmp_path / "index")
    _write_waves(waves, src)
    stats = run_ivfpq_maintenance_stream(
        spark, src, centroids, codebook, idx_dir, str(tmp_path / "ckpt1"),
        max_files_per_trigger=1,
    ).collect()
    assert stats

    batch_dir = str(tmp_path / "batch")
    write_ivfpq_index(emb, batch_dir, centroids, codebook, assign=2)
    key = lambda r: (r["vec_id"], r["cluster"], tuple(r["codes"]))  # noqa: E731
    got = {key(r) for r in spark.read.parquet(idx_dir)
           .select("vec_id", "cluster", "codes").collect()}
    want = {key(r) for r in spark.read.parquet(batch_dir)
            .select("vec_id", "cluster", "codes").collect()}
    assert got == want

    # redelivery under a new checkpoint: content-addressed collapse
    _write_waves(waves, src, start=len(waves))
    stats2 = run_ivfpq_maintenance_stream(
        spark, src, centroids, codebook, idx_dir, str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    ).collect()
    assert {(r["cluster"], r["n_vectors"]) for r in stats2} == {
        (r["cluster"], r["n_vectors"]) for r in stats
    }

    # ADC recall over the MAINTAINED layout
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_index_topk(
            spark, idx_dir, queries, centroids, codebook, k=5, nprobe=6
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.8


def test_media_stream_oversized_buckets_are_observable(spark, tmp_path):
    """ADVICE r11 low: a skipped over-cap bucket must leave an audit
    row.  Two byte-identical docs in one wave trip every band bucket
    at max_bucket_size=1 (batch side); a later wave probing the same
    bands trips the probe side.  Both sides land in log_dir/oversized
    and, because the cap skipped the check, all rows survive."""
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_media_dedup_stream,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    txt = "the quick brown fox jumps over the lazy dog " * 4
    w0 = spark.createDataFrame([(1, txt, "en", "t", 1), (2, txt, "en", "t", 1)], schema)
    w1 = spark.createDataFrame([(3, txt, "en", "t", 1)], schema)
    src, log = str(tmp_path / "src"), str(tmp_path / "log")
    _write_waves([w0, w1], src)
    surv = {
        r["doc_id"]
        for r in run_media_dedup_stream(
            spark, src, log, str(tmp_path / "ckpt"),
            max_files_per_trigger=1, max_bucket_size=1,
        ).collect()
    }
    # cap skipped the degenerate buckets -> nothing was deduped
    assert surv == {1, 2, 3}
    over = spark.read.parquet(f"{log}/oversized")
    sides = {r["side"] for r in over.collect()}
    assert sides == {"batch", "probe"}
    # batch-side rows from batch 0 (the 2-member buckets), probe-side
    # rows from batch 1 (index holds 2 copies per band)
    assert over.filter("side = 'batch' AND n_members = 2").count() > 0
    assert over.filter("side = 'probe' AND n_members = 2").count() > 0

    # ADVICE r12 low: the oversized ledger has a compactor too — a
    # wiped-checkpoint replay re-appends identical rows; compaction
    # folds them back to exactly the pre-replay relation.
    import shutil

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_media_ledgers,
    )

    key = lambda r: (  # noqa: E731
        r["side"], r["band_no"], r["band_bits"],
        r["n_members"], r["__batch_id"], r["__run_tag"],
    )
    before_replay = sorted(key(r) for r in over.collect())
    shutil.rmtree(str(tmp_path / "ckpt"))
    run_media_dedup_stream(
        spark, src, log, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, max_bucket_size=1,
    )
    replayed = spark.read.parquet(f"{log}/oversized")
    assert replayed.count() == 2 * len(before_replay)
    stats = compact_media_ledgers(spark, log)
    assert stats["oversized"]["rows_after"] == len(before_replay)
    after = sorted(
        key(r) for r in spark.read.parquet(f"{log}/oversized").collect()
    )
    assert after == before_replay


def test_write_arrival_waves_tolerates_empty_wave(spark, tmp_path):
    """ADVICE r11 low: a wave value with no matching rows is skipped
    (write_arrival_wave parity) instead of crashing the fixture
    writer; the non-empty waves keep their pinned mtime order."""
    import glob

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        write_arrival_waves,
    )

    df = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 2)], "doc_id long, w int"
    )
    src = str(tmp_path / "src")
    write_arrival_waves(df.drop("w"), src, F.when(F.col("doc_id") <= 2, 0).otherwise(2), 3)
    files = sorted(glob.glob(f"{src}/part-wave-*.parquet"))
    assert [f.rsplit("-", 1)[1] for f in files] == ["0.parquet", "2.parquet"]
    back = spark.read.parquet(src)
    assert back.count() == 3


def test_concurrent_writes_completes_all_and_propagates_errors(spark, tmp_path):
    """Round-13 optimization: the multi-append streams overlap their
    per-batch ledger appends via ``_concurrent_writes`` (guide §2.6).
    Contract pinned here: every append lands (the pool joins before
    returning), a failing append raises so the batch still fails, and
    the single-write path runs inline."""
    import pytest

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        _concurrent_writes,
    )

    df = spark.range(100).withColumn("b", F.pmod("id", F.lit(4)).cast("int"))

    def mk(path):
        def w():
            df.repartition("b").write.mode("append").partitionBy("b").parquet(
                path
            )

        return w

    paths = [str(tmp_path / f"led{i}") for i in range(4)]
    _concurrent_writes(*[mk(p) for p in paths])
    for p in paths:
        assert spark.read.parquet(p).count() == 100

    def boom():
        raise RuntimeError("append failed")

    with pytest.raises(RuntimeError, match="append failed"):
        _concurrent_writes(mk(str(tmp_path / "ok")), boom)
    # inline single-write path
    _concurrent_writes(mk(str(tmp_path / "solo")))
    assert spark.read.parquet(str(tmp_path / "solo")).count() == 100


def test_ivfpq_rebuild_restores_adc_recall_after_drift(spark, sf_dir, tmp_path):
    """VERDICT r11 #2 — the IVF-PQ lifecycle hole, closed: maintain
    under FROZEN centroids AND codebook trained on HALF the
    distribution (into a VERSIONED index root), then
    rebuild_ivfpq_index re-trains BOTH models on the accumulated
    corpus and commits a new version atomically.  Verify (a) the
    rebuilt layout equals the batch write_ivfpq_index build (ids,
    clusters, code arrays), (b) ADC recall >= 0.8 vs exact truth over
    the rebuilt index, (c) the previous version survived the commit,
    (d) the layout still partition-prunes."""
    from pyspark.sql import functions as F2

    from realtime_cdc_pipeline_docker_spark.functions import vec_normalize
    from realtime_cdc_pipeline_docker_spark.operators.index_commit import (
        init_index_root,
        resolve_index_path,
    )
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_index_topk,
        rebuild_ivfpq_index,
        seed_codebook,
        train_ivf_centroids,
        write_ivfpq_index,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_ivfpq_maintenance_stream,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    frozen_c = train_ivf_centroids(half, n_centroids=16)
    frozen_cb = seed_codebook(
        half.select("vec_id", vec_normalize("embedding").alias("embedding")),
        k=16,
    )
    waves = [emb.filter(F.col("vec_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    root = str(tmp_path / "index_root")
    v1 = init_index_root(spark, root)
    _write_waves(waves, src)
    run_ivfpq_maintenance_stream(
        spark, src, frozen_c, frozen_cb, root, str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    assert resolve_index_path(spark, root) == v1
    n_v1 = spark.read.parquet(v1).count()

    new_c, new_cb = rebuild_ivfpq_index(
        spark, root, n_centroids=16, pq_k=16
    )
    live = resolve_index_path(spark, root)
    assert live.endswith("v_000002")
    # (c) previous version intact after the commit
    assert spark.read.parquet(v1).count() == n_v1

    # (a) rebuilt layout == batch build over the accumulated corpus
    batch_dir = str(tmp_path / "batch")
    write_ivfpq_index(emb, batch_dir, new_c, new_cb, assign=2)
    key = lambda r: (r["vec_id"], r["cluster"], tuple(r["codes"]))  # noqa: E731
    got = {key(r) for r in spark.read.parquet(live)
           .select("vec_id", "cluster", "codes").collect()}
    want = {key(r) for r in spark.read.parquet(batch_dir)
            .select("vec_id", "cluster", "codes").collect()}
    assert got == want

    # (b) ADC recall over the rebuilt index, resolved through the root
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_index_topk(
            spark, root, queries, new_c, new_cb, k=5, nprobe=6
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.8

    # (d) cluster predicate still prunes at the scan
    plan = spark.read.parquet(live).filter(F2.col("cluster").isin([0])) \
        ._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    part = plan.split("PartitionFilters", 1)
    assert len(part) == 2 and "cluster" in part[1].split("]", 1)[0]

    # (e) VERDICT r12 #3 — prune AFTER the quality gate passed: the
    # explicit GC removes v1, the live version and its recall are
    # untouched, and a reader that resolved before the prune still
    # completes on the current version's files.
    from realtime_cdc_pipeline_docker_spark.operators.index_commit import (
        prune_index_versions,
    )

    reader = spark.read.parquet(resolve_index_path(spark, root))
    pruned = prune_index_versions(spark, root, keep=1)
    assert v1 in pruned["removed"] and live in pruned["kept"]
    assert resolve_index_path(spark, root) == live
    assert reader.count() == len(want)
    approx_after = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_index_topk(
            spark, root, queries, new_c, new_cb, k=5, nprobe=6
        ).collect()
    }
    assert approx_after == approx


def test_maintained_index_compaction_preserves_state(spark, sf_dir, tmp_path):
    """VERDICT r11 #3: the maintained IVF-PQ layout's compactor folds
    wiped-checkpoint replay duplicates and per-batch small files
    WITHOUT re-training (compaction != rebuild), and the ADC query
    results are identical before and after."""
    import shutil

    from realtime_cdc_pipeline_docker_spark.functions import vec_normalize
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        ivfpq_index_topk,
        seed_codebook,
        train_ivf_centroids,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_index_layout,
        run_ivfpq_maintenance_stream,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroids = train_ivf_centroids(emb, n_centroids=16)
    codebook = seed_codebook(
        emb.select("vec_id", vec_normalize("embedding").alias("embedding")),
        k=16,
    )
    waves = [emb.filter(F.col("vec_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    idx_dir = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    _write_waves(waves, src)
    run_ivfpq_maintenance_stream(
        spark, src, centroids, codebook, idx_dir, ckpt,
        max_files_per_trigger=1,
    )
    # wiped-checkpoint replay: same lineage tag, batches restart at 0,
    # every appended row is a byte-identical duplicate
    shutil.rmtree(ckpt)
    run_ivfpq_maintenance_stream(
        spark, src, centroids, codebook, idx_dir, ckpt,
        max_files_per_trigger=1,
    )

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    before = {
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in ivfpq_index_topk(
            spark, idx_dir, queries, centroids, codebook, k=5, nprobe=6
        ).collect()
    }

    stats = compact_index_layout(spark, idx_dir)
    assert stats["rows_after"] < stats["rows_before"]
    assert stats["files_after"] < stats["files_before"]
    # exactly one row per (cluster, vec_id) after folding
    led = spark.read.parquet(idx_dir)
    assert led.count() == led.select("cluster", "vec_id").distinct().count()

    after = {
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in ivfpq_index_topk(
            spark, idx_dir, queries, centroids, codebook, k=5, nprobe=6
        ).collect()
    }
    assert after == before


def test_curation_pipeline_stream_composes_and_absorbs_redelivery(
    spark, sf_dir, tmp_path
):
    """The composed gate stream (h23): decontaminate -> quality ->
    exact dedup -> near-dup in ONE stream.  Gate flags imply
    non-survival, redelivery under a new checkpoint is absorbed
    (survivors re-verify against their own indexed copies), and a
    wiped-checkpoint replay under the SAME lineage reproduces the
    identical relation."""
    import shutil

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_curation_pipeline_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select("text")
    waves = [docs.filter(F.col("doc_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    _write_waves(waves, src)
    out1 = {
        r["doc_id"]: (r["quarantined"], r["passed_quality"], r["survived"])
        for r in run_curation_pipeline_stream(
            spark, src, bench, log, ckpt, max_files_per_trigger=1
        ).collect()
    }
    assert len(out1) == docs.count()
    # composition invariants: a gate failure is never a survivor, and
    # the pipeline actually exercised every stage
    assert all(not (q or not p) or not s for q, p, s in out1.values())
    assert any(q for q, _, _ in out1.values())        # decontam fired
    assert any(not p for _, p, _ in out1.values())    # quality fired
    assert any(s for _, _, s in out1.values())        # survivors exist
    n_surv = sum(1 for _, _, s in out1.values() if s)
    assert 0 < n_surv < len(out1)

    # wiped-checkpoint replay, same lineage: byte-identical relation
    shutil.rmtree(ckpt)
    out_replay = {
        r["doc_id"]: (r["quarantined"], r["passed_quality"], r["survived"])
        for r in run_curation_pipeline_stream(
            spark, src, bench, log, ckpt, max_files_per_trigger=1
        ).collect()
    }
    assert out_replay == out1

    # redelivery under a NEW checkpoint lineage: absorbed
    _write_waves(waves, src, start=len(waves))
    out2 = {
        r["doc_id"]: (r["quarantined"], r["passed_quality"], r["survived"])
        for r in run_curation_pipeline_stream(
            spark, src, bench, log, str(tmp_path / "ckpt2"),
            max_files_per_trigger=1,
        ).collect()
    }
    assert out2 == out1


def test_curation_ledger_compaction_preserves_state(spark, sf_dir, tmp_path):
    """compact_curation_ledgers shrinks all four h23 ledgers' file
    counts, folds wiped-replay duplicates, and the pipeline relation
    (and a later incremental drain against the compacted ledgers) is
    unchanged."""
    import shutil

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_curation_ledgers,
        run_curation_pipeline_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select("text")
    waves = [docs.filter(F.col("doc_id") % 3 == w) for w in range(3)]
    src, log, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "log"), str(tmp_path / "ckpt")
    )
    _write_waves(waves, src)
    first = {
        r["doc_id"]: (r["quarantined"], r["passed_quality"], r["survived"])
        for r in run_curation_pipeline_stream(
            spark, src, bench, log, ckpt, max_files_per_trigger=1
        ).collect()
    }
    # wiped-checkpoint replay doubles every ledger row (same lineage)
    shutil.rmtree(ckpt)
    run_curation_pipeline_stream(
        spark, src, bench, log, ckpt, max_files_per_trigger=1
    )

    stats = compact_curation_ledgers(spark, log)
    assert set(stats) == {"curated", "index", "digests", "audit"}
    for sub, s in stats.items():
        assert s["files_after"] < s["files_before"], sub
        assert s["rows_after"] < s["rows_before"], sub
    # curated folds to exactly one row per survivor
    n_surv = sum(1 for _, _, s in first.values() if s)
    assert stats["curated"]["rows_after"] == n_surv
    assert stats["digests"]["rows_after"] == n_surv

    # the read-back relation is unchanged, and a NEW wave of exact
    # copies still dedups against the compacted ledgers
    _write_waves(waves, src, start=3)
    out2 = {
        r["doc_id"]: (r["quarantined"], r["passed_quality"], r["survived"])
        for r in run_curation_pipeline_stream(
            spark, src, bench, log, str(tmp_path / "ckpt2"),
            max_files_per_trigger=1,
        ).collect()
    }
    assert out2 == first


def test_curation_pipeline_stream_equals_batch_twin(spark, sf_dir, tmp_path):
    """Three-way agreement, stream == batch twin (== SQL via both
    registered oracles): the per-batch ledger-probe mechanics and the
    global pair-algebra twin reach the identical composed relation."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        incremental_curation_pipeline,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_curation_pipeline_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select("text")
    waves = [docs.filter(F.col("doc_id") % 3 == w) for w in range(3)]
    src = str(tmp_path / "src")
    _write_waves(waves, src)
    stream = {
        r["doc_id"]: (r["quarantined"], r["passed_quality"], r["survived"])
        for r in run_curation_pipeline_stream(
            spark, src, bench, str(tmp_path / "log"), str(tmp_path / "ckpt"),
            max_files_per_trigger=1,
        ).collect()
    }
    twin = {
        r["doc_id"]: (r["quarantined"], r["passed_quality"], r["survived"])
        for r in incremental_curation_pipeline(docs, bench).collect()
    }
    assert stream == twin
