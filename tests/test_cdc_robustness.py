"""CDC decode robustness: snapshot ops, schema drift, malformed payloads.

Debezium realities the golden test doesn't cover: the initial snapshot
emits op='r' (read) events (reference snapshot.mode=initial,
docker-compose.yml:168); producers upgrade and add fields; crashed
producers can emit truncated JSON.  Spark's from_json is PERMISSIVE by
default — extra fields ignored, missing fields null, malformed input →
all-null struct — and the decode inherits exactly those semantics.
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from realtime_cdc_pipeline_docker_spark.sources.cdc import decode_envelope

PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

ENVELOPE = T.StructType(
    [
        T.StructField("before", T.StringType(), True),
        T.StructField("after", T.StringType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
    ]
)


def _decode(spark, rows):
    df = spark.createDataFrame(rows, ENVELOPE)
    return decode_envelope(df, PAYLOAD)


def test_snapshot_read_op_counts_as_upsert(spark):
    """op='r' (initial snapshot) routes through `after` with sign +1 —
    identical to an insert, as the reference's CASE produces
    (cdc_processor.py:85-93 handles only 'd' specially)."""
    out = _decode(
        spark,
        [(None, json.dumps({"id": 1, "status": "snap"}), "r", 100)],
    ).collect()
    assert len(out) == 1
    assert (out[0]["id"], out[0]["status"], out[0]["sign"], out[0]["op"]) == (
        1,
        "snap",
        1,
        "r",
    )


def test_extra_fields_from_newer_producer_ignored(spark):
    """Schema drift forward: a newer producer adds fields; the declared
    payload schema simply doesn't project them."""
    payload = {"id": 2, "status": "ok", "new_col": "added-in-v2", "n": 7}
    out = _decode(spark, [(None, json.dumps(payload), "c", 100)]).collect()
    assert (out[0]["id"], out[0]["status"]) == (2, "ok")
    assert "new_col" not in out[0].asDict()


def test_missing_fields_become_null(spark):
    """Schema drift backward: an older producer omits a column → NULL
    (the reference's NULL total_amount window is the same mechanism)."""
    out = _decode(spark, [(None, json.dumps({"id": 3}), "c", 100)]).collect()
    assert out[0]["id"] == 3 and out[0]["status"] is None


def test_malformed_payload_yields_null_columns_not_failure(spark):
    """Truncated JSON must not kill the stream: PERMISSIVE from_json
    yields an all-null payload row (still carrying op/ts_ms/sign for
    quarantine routing) rather than raising."""
    out = _decode(spark, [(None, '{"id": 4, "status"', "c", 100)]).collect()
    assert len(out) == 1
    assert out[0]["id"] is None and out[0]["status"] is None
    assert out[0]["ts_ms"] == 100 and out[0]["sign"] == 1


def test_delete_with_null_before_survives(spark):
    """Debezium can emit deletes with null before (tombstone-adjacent);
    decode yields a null-payload delete row rather than failing."""
    out = _decode(spark, [(None, None, "d", 100)]).collect()
    assert len(out) == 1
    assert out[0]["sign"] == -1 and out[0]["id"] is None


def test_split_quarantine_routes_null_keys(spark):
    from realtime_cdc_pipeline_docker_spark.sources.cdc import split_quarantine

    rows = [
        (None, json.dumps({"id": 1, "status": "ok"}), "c", 100),
        (None, '{"broken', "c", 200),          # malformed -> null key
        (None, None, "d", 300),                # null-before delete -> null key
        (json.dumps({"id": 2, "status": "x"}), None, "d", 400),
    ]
    good, bad = split_quarantine(_decode(spark, rows))
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    bad_rows = bad.collect()
    assert len(bad_rows) == 2
    assert {r["ts_ms"] for r in bad_rows} == {200, 300}  # diagnosable
