"""Multimodal plumbing tests (SURVEY §2.J5): binary payload round trips,
Arrow batch shapes, declared schemas, 1→N frame expansion."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.catalog import load_table
from realtime_cdc_pipeline_docker_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
    resize_images,
    sample_frames,
)


def _media(spark, sf_dir, n=50):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < n)
    return attach_binary_payload(docs)


def test_payload_roundtrip_and_meta(spark, sf_dir):
    media = _media(spark, sf_dir)
    row = media.filter("doc_id = 1").collect()[0]
    assert bytes(row["payload"]).decode("utf-8")  # valid UTF-8 round trip
    assert row["meta"]["mime"] == "text/plain"
    assert row["meta"]["n_bytes"] == len(row["payload"])


def test_extract_features_schema_and_determinism(spark, sf_dir):
    feats = extract_features(_media(spark, sf_dir))
    a = sorted(map(tuple, feats.select("doc_id", "width", "height").collect()))
    b = sorted(map(tuple, feats.select("doc_id", "width", "height").collect()))
    assert a == b  # deterministic stub
    r = feats.filter("doc_id = 1").collect()[0]
    assert len(r["feature"]) == 4 and r["n_bytes"] > 0


def test_resize_exact_output_size(spark, sf_dir):
    out = resize_images(_media(spark, sf_dir), width=16, height=16).collect()
    assert out
    for r in out:
        assert len(r["payload"]) == 256
        assert (r["width"], r["height"]) == (16, 16)


def test_frame_sampling_expands_rows(spark, sf_dir):
    media = _media(spark, sf_dir)
    frames = sample_frames(media, every_n_bytes=64, max_frames=4)
    n_media = media.count()
    n_frames = frames.count()
    assert n_frames > n_media  # 1→N expansion
    per_doc = frames.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    assert per_doc <= 4
    for r in frames.filter("doc_id = 1").collect():
        assert len(r["frame"]) == 64
