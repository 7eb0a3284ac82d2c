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


def test_stub_decode_ignores_pil_for_text_payloads():
    """The oracle-exact stub path must be taken for text/plain whether or
    not Pillow is installed — only image/* mimes dispatch to a real
    decoder."""
    from realtime_cdc_pipeline_docker_spark.operators.multimodal import _decode_media

    payload = b"hello multimodal world"
    n = len(payload)
    width, height, feature = _decode_media(payload, "text/plain")
    assert (width, height) == ((n % 640) + 1, (n % 480) + 1)
    assert feature[0] == float(n)


def test_real_image_decode_when_pil_available(spark):
    """Import-guarded real path: with Pillow present, image/* payloads
    report true dimensions through the same mapInPandas plumbing."""
    import io

    import pytest

    from realtime_cdc_pipeline_docker_spark.operators.multimodal import _pil

    Image = _pil()
    if Image is None:
        pytest.skip("Pillow not installed; real-decode path not exercisable here")
    buf = io.BytesIO()
    Image.new("L", (17, 11), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, png, ("image/png", len(png)))],
        "doc_id long, payload binary, meta struct<mime:string,n_bytes:long>",
    )
    row = extract_features(media).collect()[0]
    assert (row["width"], row["height"]) == (17, 11)
    assert row["feature"][1] == 128.0


def test_audio_energy_windows_overlap_semantics(spark):
    from realtime_cdc_pipeline_docker_spark.operators.multimodal import (
        attach_binary_payload,
        audio_energy_windows,
    )

    rows = [
        (1, "a" * 40),   # starts 0/16/32: full, short tail 24, short tail 8
        (2, "b" * 16),   # one short window [0:16]
        (3, ""),         # no windows
        (4, "c" * 400),  # capped at max_windows=16
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = audio_energy_windows(attach_binary_payload(df))
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc.get(1, [])) == 3  # starts 0,16,32 (< 40)
    w0, w1, w2 = sorted(by_doc[1], key=lambda r: r["win_no"])
    assert (w0["win_start"], w0["win_len"], w0["energy"]) == (0, 32, 32 * ord("a"))
    assert (w1["win_start"], w1["win_len"], w1["energy"]) == (16, 24, 24 * ord("a"))
    assert (w2["win_start"], w2["win_len"], w2["energy"]) == (32, 8, 8 * ord("a"))
    assert len(by_doc[2]) == 1 and by_doc[2][0]["win_len"] == 16
    assert 3 not in by_doc
    assert len(by_doc[4]) == 16  # max_windows cap


def test_dhash_deterministic_and_pure_function_of_payload(spark):
    from realtime_cdc_pipeline_docker_spark.operators.multimodal import image_dhash

    rows = [(1, "hello world " * 20), (2, "hello world " * 20), (3, "different entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["dhash"] for r in image_dhash(attach_binary_payload(df)).collect()}
    assert out[1] == out[2]  # identical payloads -> identical hash
    assert out[1] != out[3]
    # stable across runs
    again = {r["doc_id"]: r["dhash"] for r in image_dhash(attach_binary_payload(df)).collect()}
    assert out == again


def test_dhash_banding_pigeonhole_completeness(spark):
    """Pairs at hamming exactly max_hamming MUST be found (pigeonhole:
    3 flips cannot touch all 4 bands); pairs differing in every band
    must NOT pair.  Hashes are planted via crafted payloads run through
    the real operator end-to-end."""
    from realtime_cdc_pipeline_docker_spark.operators.multimodal import (
        dhash_neardup_pairs,
        image_dhash,
    )

    base = bytes(range(72)) * 3  # 216 bytes, strictly increasing cells per 72-block
    # three flips: perturb bytes sampled by three different cells
    mutated = bytearray(base)
    n, cells = len(base), 72
    for cell in (0, 10, 20):
        pos = (cell * n) // cells
        mutated[pos] = 255  # reverses that cell's left>right comparison
    df = spark.createDataFrame(
        [(1, bytes(base)), (2, bytes(mutated)), (3, bytes(reversed(base)))],
        "doc_id long, payload binary",
    ).select("doc_id", "payload", F.struct(F.lit("application/octet-stream").alias("mime"), F.length("payload").cast("long").alias("n_bytes")).alias("meta"))
    hashes = {r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()}
    d12 = bin((hashes[1] ^ hashes[2]) & (2**64 - 1)).count("1")
    d13 = bin((hashes[1] ^ hashes[3]) & (2**64 - 1)).count("1")
    assert 1 <= d12 <= 3, d12
    assert d13 > 3, d13
    pairs = {(r["doc_a"], r["doc_b"]) for r in dhash_neardup_pairs(df).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs and (2, 3) not in pairs


def test_dhash_cap_skips_are_observable(spark):
    from realtime_cdc_pipeline_docker_spark.operators.multimodal import (
        dhash_neardup_pairs,
        oversized_dhash_buckets,
    )

    # 5 identical payloads: every band bucket has 5 members
    df = spark.createDataFrame(
        [(i, "same payload " * 10) for i in range(5)], "doc_id long, text string"
    )
    media = attach_binary_payload(df)
    uncapped = dhash_neardup_pairs(media, max_bucket_size=10)
    assert uncapped.count() == 10  # C(5,2)
    assert oversized_dhash_buckets(media, max_bucket_size=10).count() == 0
    capped = dhash_neardup_pairs(media, max_bucket_size=4)
    assert capped.count() == 0  # all buckets skipped...
    over = oversized_dhash_buckets(media, max_bucket_size=4)
    assert over.count() == 4  # ...and all 4 skips are observable
