"""CDC queries (SURVEY.md §2 M3/C4/E1/H): envelope decode, signed rows,
latest-state collapse — batch and streaming forms.

The envelope fixture is synthesized deterministically from `orders`
(FIXTURES.md §B1): INSERT(status='processing', NULL total) →
UPDATE(final status + total) → DELETE for keys ≡ 0 (mod 10).  The
oracles therefore express the *expected end state* directly over
`orders` in plain SQL — mechanism-independent golden checks.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.collapse import latest_state
from ..sources.cdc import ORDERS_PAYLOAD_SCHEMA, decode_envelope, synth_orders_envelope
from ..streaming.pipeline import run_cdc_stream
from .registry import register

def _work_dir(query: str, sf_dir: str) -> str:
    """Deterministic per-(query, sf) scratch dir, reset on entry.

    ``tempfile.mkdtemp`` would leak one tree per invocation across
    repeated driver/bench runs; a name derived from (query, sf_dir) is
    reused and wiped instead, so N runs occupy one dir, not N.  The wipe
    also clears the streaming checkpoint, which must not outlive its
    (rewritten) input."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    work = os.path.join(tempfile.gettempdir(), f"rtcdc_{query}_{tag}")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    return work


_FINAL_STATE_ORACLE = """
    SELECT o_orderkey AS id, o_custkey AS customer_id, o_orderdate AS order_date,
           o_orderstatus AS status, o_totalprice AS total_amount
    FROM orders WHERE o_orderkey % 10 <> 0
"""


@register(
    "m3_cdc_decode_signed",
    oracle="""
    SELECT o_orderkey AS id, 'c' AS op, epoch_ms(o_orderdate) AS ts_ms, 1 AS sign,
           'processing' AS status, CAST(NULL AS DOUBLE) AS total_amount
    FROM orders
    UNION ALL
    SELECT o_orderkey, 'u', epoch_ms(o_orderdate) + 3600000, 1, o_orderstatus, o_totalprice
    FROM orders
    UNION ALL
    SELECT o_orderkey, 'd', epoch_ms(o_orderdate) + 7200000, -1, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def m3_cdc_decode_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase Debezium decode → signed/versioned rows
    (cdc_processor.py:74-98 semantics, incl. the NULL-decimal insert
    window and op='d' routing through `before`).  Stateless row-local
    work — pipelines with the source, no shuffle."""
    envelope = synth_orders_envelope(spark, sf_dir)
    decoded = decode_envelope(envelope, ORDERS_PAYLOAD_SCHEMA)
    return decoded.select("id", "op", "ts_ms", "sign", "status", "total_amount")


@register("e1_cdc_latest_state", oracle=_FINAL_STATE_ORACLE)
def e1_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CDC batch path: decode → ReplacingMergeTree(ts_ms, sign)
    collapse (init-clickhouse.sql:18-19).  Deleted keys (≡0 mod 10)
    vanish; survivors show their final UPDATE image.  One shuffle on the
    key — the minimum for versioned-upsert semantics."""
    envelope = synth_orders_envelope(spark, sf_dir)
    decoded = decode_envelope(envelope, ORDERS_PAYLOAD_SCHEMA)
    return latest_state(decoded, key_cols=("id",)).select(
        "id", "customer_id", "order_date", "status", "total_amount"
    )


@register(
    "e1b_latest_event_state",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value FROM (
      SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY ts DESC,
                        (CASE WHEN event_type = 'error' THEN -1 ELSE 1 END) DESC,
                        event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND event_type <> 'error'
    """,
)
def e1b_latest_event_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """latest_state applied to the driver's native `events` change log:
    key=user_id, version=ts (tiebreak event_id), 'error' events act as
    deletes.  Shows the collapse operator is schema-generic."""
    events = load_table(spark, sf_dir, "events")
    signed = events.withColumn(
        "sign", F.when(F.col("event_type") == "error", F.lit(-1)).otherwise(F.lit(1))
    )
    return latest_state(
        signed,
        key_cols=("user_id",),
        version_col="ts",
        sign_col="sign",
        tiebreak_cols=("event_id",),
    ).select("user_id", "event_id", "ts", "event_type", "value")


@register("h_stream_cdc_orders", oracle=_FINAL_STATE_ORACLE)
def h_stream_cdc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same CDC pipeline as e1, run through Structured Streaming:
    file-based envelope source → availableNow micro-batches →
    foreachBatch idempotent append (H1/H2/H3/H5) → collapse.  Shares the
    e1 oracle — stream result == batch result == SQL golden state."""
    work = _work_dir("cdc_stream", sf_dir)
    envelope = synth_orders_envelope(spark, sf_dir)
    # repartition, not coalesce: coalesce(4) would collapse the whole
    # synth stage (3-way union + to_json) onto 4 threads; the shuffle
    # boundary keeps synthesis at full parallelism and still emits a
    # bounded file count for the file-stream source to list.
    envelope.repartition(8).write.mode("overwrite").json(f"{work}/input")
    log = run_cdc_stream(
        spark,
        envelope_dir=f"{work}/input",
        log_dir=f"{work}/log",
        checkpoint_dir=f"{work}/ckpt",
        payload_schema=ORDERS_PAYLOAD_SCHEMA,
    )
    return latest_state(log, key_cols=("id",)).select(
        "id", "customer_id", "order_date", "status", "total_amount"
    )
