"""Structured Streaming CDC tests (SURVEY §5.2-5.3).

Golden-sequence semantics, the stream==batch invariant, checkpoint
restart (no reprocessing, no duplicates), and the concurrent multi-table
runner mirroring the reference's 4-stream layout (cdc_processor.py:139-145).

All streams run file-source + ``trigger(availableNow=True)`` so results
are deterministic and the suite needs no Kafka.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from realtime_cdc_pipeline_docker_spark.operators.collapse import latest_state
from realtime_cdc_pipeline_docker_spark.sources.cdc import (
    ORDERS_PAYLOAD_SCHEMA,
    decode_envelope,
)
from realtime_cdc_pipeline_docker_spark.streaming.pipeline import (
    run_cdc_stream,
    run_multi_table_streams,
)

PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("total_amount", T.DoubleType(), True),
    ]
)


def _env(op, ts, before=None, after=None):
    return {
        "before": json.dumps(before) if before else None,
        "after": json.dumps(after) if after else None,
        "op": op,
        "ts_ms": ts,
    }


# Golden sequence (FIXTURES.md §B1 / SURVEY §5.2): key 1 insert→update,
# key 2 insert→delete, key 3 insert then LATE stale update (lower ts_ms
# arrives after a newer version — must lose the collapse), key 4
# insert+update sharing ts_ms with a delete (sign tiebreak).
GOLDEN = [
    _env("c", 100, after={"id": 1, "status": "processing", "total_amount": None}),
    _env("u", 200, before={"id": 1, "status": "processing", "total_amount": None},
         after={"id": 1, "status": "shipped", "total_amount": 42.5}),
    _env("c", 100, after={"id": 2, "status": "processing", "total_amount": 10.0}),
    _env("d", 300, before={"id": 2, "status": "processing", "total_amount": 10.0}),
    _env("c", 100, after={"id": 3, "status": "processing", "total_amount": None}),
    _env("u", 500, before={"id": 3, "status": "processing", "total_amount": None},
         after={"id": 3, "status": "delivered", "total_amount": 99.0}),
    # late, stale (ts 250 < 500) — must NOT win
    _env("u", 250, before={"id": 3, "status": "processing", "total_amount": None},
         after={"id": 3, "status": "cancelled", "total_amount": 0.0}),
    _env("c", 100, after={"id": 4, "status": "processing", "total_amount": 7.0}),
    # delete and update share ts_ms=400: ClickHouse keeps last-inserted;
    # our deterministic tiebreak is sign desc → the upsert (+1) wins.
    _env("d", 400, before={"id": 4, "status": "processing", "total_amount": 7.0}),
    _env("u", 400, before={"id": 4, "status": "processing", "total_amount": 7.0},
         after={"id": 4, "status": "shipped", "total_amount": 7.0}),
]

EXPECTED_FINAL = {
    1: ("shipped", 42.5),
    # 2 deleted
    3: ("delivered", 99.0),
    4: ("shipped", 7.0),
}


def _write_jsonl(path: str, events: list[dict], name: str = "part-0.json") -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _final_state(log_df):
    rows = latest_state(log_df, key_cols=("id",)).collect()
    return {r["id"]: (r["status"], r["total_amount"]) for r in rows}


def test_golden_cdc_semantics(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_jsonl(src, GOLDEN)
    log = run_cdc_stream(
        spark, src, str(tmp_path / "log"), str(tmp_path / "ckpt"), PAYLOAD
    )
    assert log.count() == len(GOLDEN)  # append-only log keeps every version
    assert _final_state(log) == EXPECTED_FINAL


def test_stream_equals_batch(spark, tmp_path):
    """Structured Streaming invariant: the incremental plan over a file
    source produces the same rows as the batch plan over the same files."""
    src = str(tmp_path / "src")
    _write_jsonl(src, GOLDEN)
    streamed = run_cdc_stream(
        spark, src, str(tmp_path / "log"), str(tmp_path / "ckpt"), PAYLOAD
    )
    batch = decode_envelope(
        spark.read.schema(
            T.StructType(
                [
                    T.StructField("before", T.StringType()),
                    T.StructField("after", T.StringType()),
                    T.StructField("op", T.StringType()),
                    T.StructField("ts_ms", T.LongType()),
                ]
            )
        ).json(src),
        PAYLOAD,
    )
    key = ["id", "ts_ms", "sign", "op", "status"]
    assert sorted(map(tuple, streamed.select(key).collect())) == sorted(
        map(tuple, batch.select(key).collect())
    )


def test_checkpoint_restart_no_duplicates(spark, tmp_path):
    """H2/H5: a restarted query resumes from the checkpoint — already-
    committed files are not re-appended, new files are picked up."""
    src, log, ckpt = (str(tmp_path / d) for d in ("src", "log", "ckpt"))
    first, second = GOLDEN[:6], GOLDEN[6:]
    _write_jsonl(src, first, "a.json")
    log_df = run_cdc_stream(spark, src, log, ckpt, PAYLOAD)
    assert log_df.count() == len(first)

    _write_jsonl(src, second, "b.json")
    log_df = run_cdc_stream(spark, src, log, ckpt, PAYLOAD)  # same checkpoint
    assert log_df.count() == len(GOLDEN)  # 6 + 4, no re-append of a.json
    assert _final_state(log_df) == EXPECTED_FINAL


def test_restart_with_no_new_data_is_noop(spark, tmp_path):
    src, log, ckpt = (str(tmp_path / d) for d in ("src", "log", "ckpt"))
    _write_jsonl(src, GOLDEN)
    run_cdc_stream(spark, src, log, ckpt, PAYLOAD)
    log_df = run_cdc_stream(spark, src, log, ckpt, PAYLOAD)
    assert log_df.count() == len(GOLDEN)


def test_multi_table_runner(spark, tmp_path):
    """4 concurrent per-table queries, one SparkSession — the reference's
    stream-per-table layout (cdc_processor.py:139-145)."""
    tables = {}
    for t in ("customers", "products", "orders", "order_items"):
        src = str(tmp_path / t / "src")
        events = [
            _env("c", 100, after={"id": 1, "status": t, "total_amount": 1.0}),
            _env("u", 200, before={"id": 1, "status": t, "total_amount": 1.0},
                 after={"id": 1, "status": t + "_v2", "total_amount": 2.0}),
        ]
        _write_jsonl(src, events)
        tables[t] = (src, PAYLOAD)

    logs = run_multi_table_streams(spark, tables, str(tmp_path / "work"))
    assert set(logs) == set(tables)
    for t, df in logs.items():
        assert df.count() == 2
        state = _final_state(df)
        assert state == {1: (t + "_v2", 2.0)}


def test_late_data_idempotent_redelivery(spark, tmp_path):
    """At-least-once redelivery: feeding the same file content again under
    a FRESH checkpoint double-appends the log, but the collapsed view is
    unchanged (idempotent end state — H5)."""
    src, log = str(tmp_path / "src"), str(tmp_path / "log")
    _write_jsonl(src, GOLDEN)
    run_cdc_stream(spark, src, log, str(tmp_path / "ckpt1"), PAYLOAD)
    log_df = run_cdc_stream(spark, src, log, str(tmp_path / "ckpt2"), PAYLOAD)
    assert log_df.count() == 2 * len(GOLDEN)
    assert _final_state(log_df) == EXPECTED_FINAL


def test_four_table_cdc_end_to_end(spark, sf_dir, tmp_path):
    """The reference's full topology (cdc_processor.py:139-145): four
    concurrent streaming queries, one per table, each with its own
    payload schema, checkpoint, and log — collapsed states must match
    the per-table expected survivors (deletes at key%10==0 vanish)."""
    from realtime_cdc_pipeline_docker_spark.sources.cdc import (
        CDC_TABLES,
        synth_table_envelope,
    )

    tables = {}
    for name, (schema, _, _, _) in CDC_TABLES.items():
        src = str(tmp_path / name / "src")
        synth_table_envelope(spark, sf_dir, name).coalesce(2).write.mode(
            "overwrite"
        ).json(src)
        tables[name] = (src, schema)

    logs = run_multi_table_streams(spark, tables, str(tmp_path / "work"))
    assert set(logs) == set(CDC_TABLES)

    for name, (schema, fixture, select_exprs, key_cols) in CDC_TABLES.items():
        base = spark.read.parquet(f"{sf_dir}/{fixture}.parquet").selectExpr(
            *select_exprs
        )
        k = F.col(key_cols[0])
        # distinct keys: the fixture's order_items reuses line numbers,
        # and versioned-upsert semantics keep one row per key
        expected = base.filter(k % 10 != 0).select(*key_cols).distinct().count()
        collapsed = latest_state(logs[name], key_cols=key_cols)
        assert collapsed.count() == expected, name
        # updated keys (k%3==0, not deleted) carry the update version
        upd = collapsed.filter((F.col(key_cols[0]) % 3 == 0)).select("ts_ms")
        assert upd.count() > 0
        mods = upd.withColumn("mod", (F.col("ts_ms") - 3_600_000) >= 1_000_000_000)
        assert mods.filter(~F.col("mod")).count() == 0, name


def test_enriched_stream_missing_dim_key_lands_null(spark, tmp_path):
    """Stream-static enrichment: events keep flowing when the dimension
    row is missing (H6 no-swallow — LEFT join), landing with NULL
    enrichment; present keys land denormalized."""
    from realtime_cdc_pipeline_docker_spark.streaming.pipeline import (
        run_enriched_cdc_stream,
    )

    src = str(tmp_path / "src")
    _write_jsonl(
        src,
        [
            _env("c", 100, after={"id": 1, "status": "processing", "total_amount": None}),
            _env("c", 100, after={"id": 2, "status": "processing", "total_amount": 5.0}),
        ],
    )
    dim = spark.createDataFrame([(1, "Alice")], "id_key long, cust_name string")
    log = run_enriched_cdc_stream(
        spark,
        envelope_dir=src,
        log_dir=str(tmp_path / "log"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        payload_schema=PAYLOAD,
        dim=dim,
        join_expr=F.col("id") == F.col("id_key"),
        dim_cols=("cust_name",),
    )
    got = {r["id"]: r["cust_name"] for r in log.collect()}
    assert got == {1: "Alice", 2: None}


def test_enriched_stream_redelivery_idempotent(spark, tmp_path):
    """Two stream runs over the same envelopes (fresh checkpoint = full
    redelivery) collapse to the same final state."""
    from realtime_cdc_pipeline_docker_spark.streaming.pipeline import (
        run_enriched_cdc_stream,
    )

    src = str(tmp_path / "src")
    _write_jsonl(src, GOLDEN)
    dim = spark.createDataFrame([(i, f"c{i}") for i in range(1, 6)],
                                "id_key long, cust_name string")
    log = None
    for run in ("a", "b"):
        log = run_enriched_cdc_stream(
            spark,
            envelope_dir=src,
            log_dir=str(tmp_path / "log"),
            checkpoint_dir=str(tmp_path / f"ckpt_{run}"),
            payload_schema=PAYLOAD,
            dim=dim,
            join_expr=F.col("id") == F.col("id_key"),
            dim_cols=("cust_name",),
        )
    assert _final_state(log) == EXPECTED_FINAL


def test_ivm_aggregate_stream_incremental_and_restart(spark, tmp_path):
    """The streaming MV ledger: new envelope waves fold in incrementally
    (only uncommitted batches process on restart), and a no-data restart
    changes nothing."""
    from realtime_cdc_pipeline_docker_spark.streaming.pipeline import (
        run_ivm_aggregate_stream,
    )

    src, ledger, ckpt = (str(tmp_path / d) for d in ("src", "ledger", "ckpt"))
    dim = spark.createDataFrame([(1, "A", 1), (2, "B", 1)],
                                "ckey long, segment string, sign_c int")

    def partial(batch):
        return (
            batch.join(F.broadcast(dim), F.col("id") == F.col("ckey"))
            .groupBy("segment")
            .agg(
                F.sum(
                    F.col("sign") * F.col("sign_c")
                    * F.round(F.col("total_amount") * 100).cast("long")
                ).alias("revenue_cents")
            )
        )

    def run():
        return run_ivm_aggregate_stream(
            spark, src, ledger, ckpt, PAYLOAD,
            partial_agg=partial, group_cols=("segment",),
            metric_cols=("revenue_cents",),
        )

    _write_jsonl(src, [
        _env("c", 100, after={"id": 1, "status": "new", "total_amount": 10.0}),
        _env("c", 100, after={"id": 2, "status": "new", "total_amount": 5.0}),
    ], name="wave1.json")
    view = {r["segment"]: r["revenue_cents"] for r in run().collect()}
    assert view == {"A": 1000, "B": 500}

    # Wave 2: order 1 re-priced; only this wave is processed on restart.
    _write_jsonl(src, [
        _env("u", 200, before={"id": 1, "status": "new", "total_amount": 10.0},
             after={"id": 1, "status": "paid", "total_amount": 25.0}),
    ], name="wave2.json")
    view = {r["segment"]: r["revenue_cents"] for r in run().collect()}
    assert view == {"A": 2500, "B": 500}

    # No-data restart: a no-op.
    view = {r["segment"]: r["revenue_cents"] for r in run().collect()}
    assert view == {"A": 2500, "B": 500}


# ---------------------------------------------------------------------------
# run_cdc_merge_stream: CDC stream -> versioned lake snapshot
# (streaming/pipeline.py x operators/snapshot.py)
# ---------------------------------------------------------------------------


def _merge_stream(spark, src, root, ckpt, **kw):
    from realtime_cdc_pipeline_docker_spark.streaming.pipeline import (
        run_cdc_merge_stream,
    )

    run_cdc_merge_stream(spark, src, root, ckpt, PAYLOAD, **kw)


def _snapshot_state(spark, root):
    from realtime_cdc_pipeline_docker_spark.operators.snapshot import (
        read_snapshot,
    )

    rows = read_snapshot(spark, root).collect()
    return {r["id"]: (r["status"], r["total_amount"]) for r in rows}


def _init_tbl(spark, root):
    from realtime_cdc_pipeline_docker_spark.operators.snapshot import (
        init_snapshot_table,
    )

    init_snapshot_table(
        spark, root, key_cols=["id"], version_col="ts_ms", num_buckets=4
    )


def test_merge_stream_golden_semantics(spark, tmp_path):
    """The stream-merged snapshot reproduces the golden final state —
    including the late-stale-update loss and the same-ts delete/upsert
    tiebreak latest_state resolves as sign desc."""
    src = str(tmp_path / "src")
    _write_jsonl(src, GOLDEN)
    root = str(tmp_path / "tbl")
    _init_tbl(spark, root)
    _merge_stream(spark, src, root, str(tmp_path / "ckpt"))
    assert _snapshot_state(spark, root) == EXPECTED_FINAL


def test_merge_stream_multi_batch_equals_single_batch(spark, tmp_path):
    """Splitting the delivery into per-file micro-batches (each its own
    merge commit, with cross-batch version arbitration) converges to
    the same relation as one batch."""
    src = str(tmp_path / "src")
    for i, e in enumerate(GOLDEN):
        _write_jsonl(src, [e], name=f"part-{i}.json")
    root = str(tmp_path / "tbl")
    _init_tbl(spark, root)
    _merge_stream(
        spark, src, root, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    assert _snapshot_state(spark, root) == EXPECTED_FINAL
    from realtime_cdc_pipeline_docker_spark.operators.snapshot import (
        snapshot_versions,
    )

    # one commit per non-empty micro-batch on top of the bootstrap
    assert len(snapshot_versions(spark, root)) == len(GOLDEN) + 1


def test_merge_stream_wiped_checkpoint_replay_converges(spark, tmp_path):
    """At-least-once delivery: wiping the checkpoint and re-running the
    whole stream re-merges every batch; version arbitration (stored row
    wins ties) makes the visible relation IDENTICAL."""
    src = str(tmp_path / "src")
    _write_jsonl(src, GOLDEN)
    root = str(tmp_path / "tbl")
    _init_tbl(spark, root)
    _merge_stream(spark, src, root, str(tmp_path / "ckpt1"))
    before = _snapshot_state(spark, root)
    _merge_stream(spark, src, root, str(tmp_path / "ckpt2"))  # full replay
    assert _snapshot_state(spark, root) == before == EXPECTED_FINAL


def test_merge_stream_restart_no_new_data_commits_nothing(spark, tmp_path):
    """A restart on the SAME checkpoint with no new input produces no
    micro-batch work and no version churn."""
    from realtime_cdc_pipeline_docker_spark.operators.snapshot import (
        snapshot_versions,
    )

    src = str(tmp_path / "src")
    _write_jsonl(src, GOLDEN)
    root = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    _init_tbl(spark, root)
    _merge_stream(spark, src, root, ckpt)
    versions = snapshot_versions(spark, root)
    _merge_stream(spark, src, root, ckpt)  # same checkpoint, no new files
    assert snapshot_versions(spark, root) == versions
    assert _snapshot_state(spark, root) == EXPECTED_FINAL


def test_merge_stream_mor_with_compaction_cadence(spark, tmp_path):
    """MOR per-batch merges with compact_every fold deltas mid-stream;
    the final relation matches the golden state and the final manifest
    is delta-free when the cadence lands on the last batch."""
    from realtime_cdc_pipeline_docker_spark.operators.snapshot import (
        snapshot_versions,
    )

    src = str(tmp_path / "src")
    for i, e in enumerate(GOLDEN):
        _write_jsonl(src, [e], name=f"part-{i}.json")
    root = str(tmp_path / "tbl")
    _init_tbl(spark, root)
    _merge_stream(
        spark,
        src,
        root,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        mode="mor",
        compact_every=2,
    )
    assert _snapshot_state(spark, root) == EXPECTED_FINAL
    cur = max(snapshot_versions(spark, root))
    roles = {
        r["role"]
        for r in spark.read.parquet(f"{root}/v_{cur:06d}/manifest").collect()
    }
    assert roles == {"base"}  # 10 batches, cadence 2 -> last batch compacts
