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
