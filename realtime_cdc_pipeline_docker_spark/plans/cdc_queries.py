"""CDC queries (SURVEY.md §2 M3/C4/E1/H): envelope decode, signed rows,
latest-state collapse — batch and streaming forms.

The envelope fixture is synthesized deterministically from `orders`
(FIXTURES.md §B1): INSERT(status='processing', NULL total) →
UPDATE(final status + total) → DELETE for keys ≡ 0 (mod 10).  The
oracles therefore express the *expected end state* directly over
`orders` in plain SQL — mechanism-independent golden checks.
"""

from __future__ import annotations

import atexit
import glob
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.collapse import latest_state
from ..sources.cdc import ORDERS_PAYLOAD_SCHEMA, decode_envelope, orders_envelope
from ..streaming.pipeline import run_cdc_stream
from .registry import register

def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


_WORK_DIRS_CREATED: set[str] = set()


def _reap_work_dirs() -> None:
    for work in _WORK_DIRS_CREATED:
        shutil.rmtree(work, ignore_errors=True)


_LEGACY_REAPED = False


def _reap_legacy_dirs(base: str) -> None:
    """One-time sweep of scratch dirs older naming schemes left behind
    (ADVICE r8: the per-query reap below only matches the CURRENT
    ``rtcdc_<query>_<tag>_<pid>`` shape, so pre-r8 ``mkdtemp`` index
    trees — ``rtcdc_<kind>_index_<random>`` — and pid-before-tag dirs
    — ``rtcdc_<query>_<pid>_<tag>`` — persisted forever).  A dir is
    CURRENT iff its name ends ``_<8-hex-tag>_<digits-pid>``; anything
    else under ``rtcdc_*`` is a dead scheme and is removed."""
    global _LEGACY_REAPED
    if _LEGACY_REAPED:
        return
    _LEGACY_REAPED = True
    hexdigits = set("0123456789abcdef")
    for path in glob.glob(os.path.join(base, "rtcdc_*")):
        parts = os.path.basename(path).split("_")
        current = (
            len(parts) >= 4
            and parts[-1].isdigit()
            and len(parts[-2]) == 8
            and set(parts[-2]) <= hexdigits
        )
        if not current:
            shutil.rmtree(path, ignore_errors=True)


def _work_dir(query: str, sf_dir: str) -> str:
    """Deterministic per-(query, sf, PROCESS) scratch dir, reset on entry.

    ``tempfile.mkdtemp`` would leak one tree per invocation across
    repeated driver/bench runs; a name derived from (query, sf_dir) is
    reused and wiped instead, so N runs occupy one dir, not N.  The wipe
    also clears the streaming checkpoint, which must not outlive its
    (rewritten) input.

    Per-PROCESS (pid suffix) because the driver's correctness pass and
    the bench run concurrently on the same sf_dir: with a shared path,
    one session's reset-on-entry rmtree deletes the other's in-flight
    streaming checkpoint or input dir mid-run (first hit as a b20
    bench/driver-sim race, VERDICT r6; applies equally to every
    streaming consumer, ADVICE r6).  The pid suffix would leak one tree
    per exited process, so entry also reaps same-(query, sf) siblings
    whose pid is no longer alive, and an atexit hook removes this
    process's own dirs."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = tempfile.gettempdir()
    # Older naming schemes (no-pid, mkdtemp index trees, pid-before-
    # tag) are swept once per process by _reap_legacy_dirs; the
    # per-(query, tag) reap below handles the current scheme's
    # dead-pid siblings.
    _reap_legacy_dirs(base)
    shutil.rmtree(os.path.join(base, f"rtcdc_{query}_{tag}"), ignore_errors=True)
    for sibling in glob.glob(os.path.join(base, f"rtcdc_{query}_{tag}_*")):
        pid_part = sibling.rsplit("_", 1)[-1]
        if not pid_part.isdigit() or (
            int(pid_part) != os.getpid() and not _pid_alive(int(pid_part))
        ):
            shutil.rmtree(sibling, ignore_errors=True)
    work = os.path.join(base, f"rtcdc_{query}_{tag}_{os.getpid()}")
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    if not _WORK_DIRS_CREATED:
        atexit.register(_reap_work_dirs)
    _WORK_DIRS_CREATED.add(work)
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
    envelope = orders_envelope(spark, sf_dir)
    decoded = decode_envelope(envelope, ORDERS_PAYLOAD_SCHEMA)
    return decoded.select("id", "op", "ts_ms", "sign", "status", "total_amount")


@register("e1_cdc_latest_state", oracle=_FINAL_STATE_ORACLE)
def e1_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CDC batch path: decode → ReplacingMergeTree(ts_ms, sign)
    collapse (init-clickhouse.sql:18-19).  Deleted keys (≡0 mod 10)
    vanish; survivors show their final UPDATE image.  One shuffle on the
    key — the minimum for versioned-upsert semantics."""
    envelope = orders_envelope(spark, sf_dir)
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
    from ..sources.cdc import orders_envelope_json_dir

    work = _work_dir("cdc_stream", sf_dir)
    log = run_cdc_stream(
        spark,
        envelope_dir=orders_envelope_json_dir(spark, sf_dir),
        log_dir=f"{work}/log",
        checkpoint_dir=f"{work}/ckpt",
        payload_schema=ORDERS_PAYLOAD_SCHEMA,
    )
    return latest_state(log, key_cols=("id",)).select(
        "id", "customer_id", "order_date", "status", "total_amount"
    )


# ---------------------------------------------------------------------------
# §2.E extension: change history (SCD2 / time travel / collapsing deltas)
# ---------------------------------------------------------------------------

# Snapshot instant for e5b: 1995-07-01 00:00:00 naive-UTC, mid-range of
# the fixture's order dates.  Chosen ON an insert boundary: orders dated
# exactly 1995-07-01 have ts0 == _ASOF_MS, so the snapshot must show
# their INSERT image ('processing', NULL total) — the half-open
# [from, to) convention is exercised, not just the interior.
_ASOF_MS = 804_556_800_000


_SCD2_ORACLE = """
    SELECT o_orderkey AS id, o_custkey AS customer_id,
           o_orderdate AS order_date,
           'processing' AS status, CAST(NULL AS DOUBLE) AS total_amount,
           epoch_ms(o_orderdate) AS valid_from_ms,
           epoch_ms(o_orderdate) + 3600000 AS valid_to_ms,
           FALSE AS is_current
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderdate, o_orderstatus, o_totalprice,
           epoch_ms(o_orderdate) + 3600000,
           CASE WHEN o_orderkey % 10 = 0 THEN epoch_ms(o_orderdate) + 7200000
                ELSE CAST(NULL AS BIGINT) END,
           o_orderkey % 10 <> 0
    FROM orders
    """


@register("e5_scd2_history", oracle=_SCD2_ORACLE)
def e5_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity-interval history from the CDC log (§2.E extension):
    every key shows its INSERT version closed by the UPDATE, the UPDATE
    version open (current) for survivors and closed by the DELETE
    tombstone for keys ≡ 0 (mod 10) — which emit no row of their own.
    The oracle rebuilds the full interval table from `orders` + the
    scripted lifecycle, mechanism-independent.  One shuffle on the key
    (same minimum as e1's collapse); see operators/history.py."""
    from ..operators.history import scd2_history

    envelope = orders_envelope(spark, sf_dir)
    decoded = decode_envelope(envelope, ORDERS_PAYLOAD_SCHEMA)
    return scd2_history(decoded, key_cols=("id",)).select(
        "id", "customer_id", "order_date", "status", "total_amount",
        "valid_from_ms", "valid_to_ms", "is_current",
    )


@register(
    "e5b_snapshot_asof",
    oracle=f"""
    SELECT o_orderkey AS id, o_custkey AS customer_id,
           o_orderdate AS order_date,
           CASE WHEN {_ASOF_MS} < epoch_ms(o_orderdate) + 3600000
                THEN 'processing' ELSE o_orderstatus END AS status,
           CASE WHEN {_ASOF_MS} < epoch_ms(o_orderdate) + 3600000
                THEN CAST(NULL AS DOUBLE) ELSE o_totalprice END AS total_amount
    FROM orders
    WHERE epoch_ms(o_orderdate) <= {_ASOF_MS}
      AND NOT (o_orderkey % 10 = 0
               AND epoch_ms(o_orderdate) + 7200000 <= {_ASOF_MS})
    """,
)
def e5b_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: world state at 1995-07-01T00:00Z reconstructed from
    the SCD2 table (§2.E extension).  Keys inserted later are absent,
    keys deleted earlier are absent, keys mid-lifecycle show the version
    whose [from, to) interval covers the instant — including the
    boundary bucket of orders dated exactly at the snapshot, which must
    show their just-inserted 'processing' image.  A pure filter over the
    history — shuffle-free given a materialized SCD2 table, partition-
    prunable on valid_from date; see operators/history.py."""
    from ..operators.history import scd2_history, snapshot_asof

    envelope = orders_envelope(spark, sf_dir)
    decoded = decode_envelope(envelope, ORDERS_PAYLOAD_SCHEMA)
    hist = scd2_history(decoded, key_cols=("id",))
    return snapshot_asof(hist, _ASOF_MS).select(
        "id", "customer_id", "order_date", "status", "total_amount"
    )


_DELTA_REPORT_ORACLE = """
    SELECT CAST(o_orderdate AS DATE) AS order_day,
           CAST(SUM(CASE WHEN o_orderkey % 10 = 0 THEN 0
                    ELSE CAST(round(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS revenue_cents,
           CAST(SUM(CASE WHEN o_orderkey % 10 = 0 THEN 0 ELSE 1 END)
                AS BIGINT) AS live_orders
    FROM orders GROUP BY 1
    """


@register("e6_collapsing_delta_report", oracle=_DELTA_REPORT_ORACLE)
def e6_collapsing_delta_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained daily revenue via CollapsingMergeTree
    deltas (§2.E extension): UPDATE envelopes expand to (-before, +after)
    signed pairs, so SUM(sign * cents) / SUM(sign) over the *change
    stream alone* equals the report over final state — the oracle states
    the latter directly over `orders`.  Inserts carry NULL totals (sum-
    neutral), deletes subtract themselves out; exact integer cents make
    the signed sum order-free.  Stateless explode + one map-side-
    combinable aggregate — no base-table rescan, unlike the reference's
    daily_report.py full-state scan; see operators/history.py."""
    from ..operators.history import signed_delta

    envelope = orders_envelope(spark, sf_dir)
    deltas = signed_delta(envelope, ORDERS_PAYLOAD_SCHEMA)
    return (
        deltas.groupBy(F.to_date("order_date").alias("order_day"))
        .agg(
            F.sum(
                F.col("sign")
                * F.round(F.col("total_amount") * 100).cast("long")
            ).alias("revenue_cents"),
            F.sum("sign").cast("long").alias("live_orders"),
        )
    )


@register("h10_stream_scd2_history", oracle=_SCD2_ORACLE)
def h10_stream_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history maintained under Structured Streaming: the same
    file-stream → foreachBatch append log as h_stream_cdc_orders, with
    the history as a merge-on-read view over the log — exactly the
    ClickHouse model (append change rows, collapse on read) applied to
    intervals instead of latest state.  The envelope is DELIVERED TWICE
    through two independent stream runs (distinct checkpoints), so the
    log carries cross-batch duplicates of every event: the view's
    zero-extra-exchange redelivery dedup (operators/history.py) must
    absorb them to match the batch oracle.  stream == batch == SQL
    golden, under at-least-once delivery."""
    from ..operators.history import scd2_history

    from ..sources.cdc import orders_envelope_json_dir

    work = _work_dir("scd2_stream", sf_dir)
    for run in ("a", "b"):  # two deliveries of the same events
        run_cdc_stream(
            spark,
            envelope_dir=orders_envelope_json_dir(spark, sf_dir),
            log_dir=f"{work}/log",
            checkpoint_dir=f"{work}/ckpt_{run}",
            payload_schema=ORDERS_PAYLOAD_SCHEMA,
        )
    log = spark.read.parquet(f"{work}/log")
    return scd2_history(log, key_cols=("id",)).select(
        "id", "customer_id", "order_date", "status", "total_amount",
        "valid_from_ms", "valid_to_ms", "is_current",
    )


@register("c20_incremental_mart_refresh", oracle=_DELTA_REPORT_ORACLE)
def c20_incremental_mart_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance (§2.C extension —
    the AggregatingMergeTree pattern): the daily-revenue mart is BUILT
    from the initial snapshot wave (INSERT envelopes), MATERIALIZED to
    parquet, then REFRESHED by merging the partial aggregate of the
    later change wave (UPDATE/DELETE signed deltas) — the base wave is
    never rescanned.  Partial aggregates of signed integer cents are
    mergeable by plain SUM, so refresh cost is O(|delta|) + O(|mart|),
    independent of history size; the oracle states the equivalent
    full-recompute over final state (same golden report as e6).  See
    operators/history.py:signed_delta."""
    from ..sources.cdc import signed_orders_deltas

    work = _work_dir("mart_refresh", sf_dir)
    deltas = signed_orders_deltas(spark, sf_dir)

    def report(df: DataFrame) -> DataFrame:
        return df.groupBy(F.to_date("order_date").alias("order_day")).agg(
            F.sum(
                F.col("sign") * F.round(F.col("total_amount") * 100).cast("long")
            ).alias("revenue_cents"),
            F.sum("sign").cast("long").alias("live_orders"),
        )

    # Wave 1 — initial snapshot: materialize the mart.
    report(deltas.filter(F.col("op") == "c")).write.mode("overwrite").parquet(
        f"{work}/mart"
    )
    state = spark.read.parquet(f"{work}/mart")
    # Wave 2 — subsequent changes: merge partial aggregates, no rescan.
    delta_agg = report(deltas.filter(F.col("op") != "c"))
    return (
        state.unionByName(delta_agg)
        .groupBy("order_day")
        .agg(
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
            F.sum("live_orders").cast("long").alias("live_orders"),
        )
    )


@register(
    "h11_stream_static_enrich",
    oracle="""
    SELECT o.o_orderkey AS id, o.o_custkey AS customer_id,
           o.o_orderdate AS order_date, o.o_orderstatus AS status,
           o.o_totalprice AS total_amount,
           c.c_name AS customer_name, c.c_mktsegment AS customer_segment
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey % 10 <> 0
    """,
)
def h11_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment (§2.H extension): the orders
    change stream LEFT-joined per micro-batch against the broadcast
    customer dimension BEFORE the log append, so the mart lands
    denormalized and the latest-state read needs no join (the reference
    defers this join to ClickHouse query time — at scale you pay it
    once per change event, not once per query).  Oracle: final CDC
    state joined to customer in plain SQL.  See
    streaming/pipeline.py:run_enriched_cdc_stream."""
    from ..streaming.pipeline import run_enriched_cdc_stream

    from ..sources.cdc import orders_envelope_json_dir

    work = _work_dir("cdc_enrich", sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    log = run_enriched_cdc_stream(
        spark,
        envelope_dir=orders_envelope_json_dir(spark, sf_dir),
        log_dir=f"{work}/log",
        checkpoint_dir=f"{work}/ckpt",
        payload_schema=ORDERS_PAYLOAD_SCHEMA,
        dim=dim,
        join_expr=F.col("customer_id") == F.col("c_custkey"),
        dim_cols=("c_name", "c_mktsegment"),
    )
    return latest_state(log, key_cols=("id",)).select(
        "id",
        "customer_id",
        "order_date",
        "status",
        "total_amount",
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("customer_segment"),
    )


_IVM_SEGMENT_ORACLE = """
    SELECT CASE WHEN c.c_custkey % 7 = 0 THEN 'MACHINERY'
                ELSE c.c_mktsegment END AS segment,
           CAST(SUM(CASE WHEN o.o_orderkey % 10 = 0 THEN 0
                    ELSE CAST(round(o.o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS revenue_cents,
           CAST(SUM(CASE WHEN o.o_orderkey % 10 = 0 THEN 0 ELSE 1 END)
                AS BIGINT) AS live_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """


@register("c22_ivm_join_report", oracle=_IVM_SEGMENT_ORACLE)
def c22_ivm_join_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance ACROSS A JOIN (§2.C extension — the
    DBSP/differential-dataflow sign-product rule): revenue per customer
    market segment computed ONLY from two signed change streams — the
    orders lifecycle (insert NULL → update total → every-10th delete)
    and a customer stream where every 7th customer changes segment
    (-old, +new) — joined with signs MULTIPLYING.  Because signed
    multisets compose through joins (Σ sign_o·sign_c·x), the net
    contribution of every superseded version cancels and the aggregate
    equals the report over final state, which is exactly what the
    oracle states over orders ⋈ customer.  Neither base table is
    rescanned — the 100 TB property: view refresh cost is O(|changes|),
    not O(|history|).

    Plan: the dimension delta stream is synthesized in ONE scan
    (signed_delta's explode idiom) and **broadcast**; one
    BroadcastHashJoin + one map-side-combinable aggregate — no shuffle
    of the fact-side deltas."""
    from ..sources.cdc import signed_orders_deltas

    o_delta = signed_orders_deltas(spark, sf_dir)
    return _segment_signed_report(o_delta, _customer_segment_deltas(spark, sf_dir))


def _customer_segment_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed customer-dimension change stream for c22/h12: every
    customer asserted with its original segment; every 7th customer
    additionally retracts it and asserts 'MACHINERY' (a segment move).
    Synthesized in ONE dimension scan via the signed_delta explode
    idiom."""
    cust = load_table(spark, sf_dir, "customer")
    keep = F.struct(F.col("c_mktsegment").alias("segment"), F.lit(1).alias("sign_c"))
    retract = F.struct(F.col("c_mktsegment").alias("segment"), F.lit(-1).alias("sign_c"))
    assert_new = F.struct(F.lit("MACHINERY").alias("segment"), F.lit(1).alias("sign_c"))
    return cust.select(
        F.col("c_custkey").alias("ckey"),
        F.explode(
            F.when(
                F.col("c_custkey") % 7 == 0, F.array(keep, retract, assert_new)
            ).otherwise(F.array(keep))
        ).alias("d"),
    ).select("ckey", "d.*")


def _segment_signed_report(o_delta: DataFrame, c_delta: DataFrame) -> DataFrame:
    """Sign-product join + segment aggregate shared by c22 (batch) and
    h12's per-micro-batch partial aggregation."""
    facts = o_delta.select(
        "customer_id",
        F.col("sign").alias("sign_o"),
        F.round(F.col("total_amount") * 100).cast("long").alias("cents"),
    )
    joined = facts.join(F.broadcast(c_delta), F.col("customer_id") == F.col("ckey"))
    return joined.groupBy("segment").agg(
        F.sum(F.col("sign_o") * F.col("sign_c") * F.col("cents"))
        .cast("long")
        .alias("revenue_cents"),
        F.sum(F.col("sign_o") * F.col("sign_c")).cast("long").alias("live_orders"),
    )


@register("h12_stream_ivm_join", oracle=_IVM_SEGMENT_ORACLE)
def h12_stream_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c22's sign-product join view maintained UNDER STRUCTURED
    STREAMING (§2.H extension — the ClickHouse AggregatingMergeTree MV
    re-expressed): each micro-batch of order envelopes expands to
    signed deltas, joins the broadcast customer delta stream, and
    appends its per-segment partial aggregate to a batch-id'd ledger;
    the view read dedups on (batch_id, segment) and SUMs.  The stream
    runs TWICE on one checkpoint — the second run is a restart no-op
    (offsets committed), so the ledger must not double-count: restart
    recovery is part of what the oracle parity proves.  stream == batch
    (c22) == SQL golden.  See
    streaming/pipeline.py:run_ivm_aggregate_stream."""
    from ..streaming.pipeline import run_ivm_aggregate_stream

    from ..sources.cdc import orders_envelope_json_dir

    work = _work_dir("ivm_stream", sf_dir)
    c_delta = _customer_segment_deltas(spark, sf_dir)
    out = None
    for _ in range(2):  # second run: checkpoint restart, must be a no-op
        out = run_ivm_aggregate_stream(
            spark,
            envelope_dir=orders_envelope_json_dir(spark, sf_dir),
            ledger_dir=f"{work}/ledger",
            checkpoint_dir=f"{work}/ckpt",
            payload_schema=ORDERS_PAYLOAD_SCHEMA,
            partial_agg=lambda batch: _segment_signed_report(batch, c_delta),
            group_cols=("segment",),
            metric_cols=("revenue_cents", "live_orders"),
        )
    return out


@register(
    "e5c_history_retention",
    oracle=f"""
    SELECT * FROM ({_SCD2_ORACLE})
    WHERE valid_to_ms IS NULL OR valid_to_ms > {_ASOF_MS}
    """,
)
def e5c_history_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """History retention / VACUUM (§2.E extension): the SCD2 table with
    every version that expired before the 1995-07-01 cutoff dropped —
    open intervals and still-visible closed intervals survive, so time
    travel remains exact for any instant inside the retention window
    (asserted as a property in tests/test_history.py).  A pure filter
    over the history; with valid_to date partitioning this is a
    partition drop at scale.  See operators/history.py:retain_history."""
    from ..operators.history import retain_history, scd2_history

    envelope = orders_envelope(spark, sf_dir)
    decoded = decode_envelope(envelope, ORDERS_PAYLOAD_SCHEMA)
    hist = scd2_history(decoded, key_cols=("id",))
    return retain_history(hist, _ASOF_MS).select(
        "id", "customer_id", "order_date", "status", "total_amount",
        "valid_from_ms", "valid_to_ms", "is_current",
    )


@register(
    "e9_coalescing_upsert",
    oracle="""
    SELECT o_orderkey AS id, 'processing' AS status,
           o_totalprice AS total_amount, o_custkey AS customer_id
    FROM orders
    """,
)
def e9_coalescing_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-update upsert (§2.E extension — per-column anyLast):
    a sparse CDC feed where v1 sets (status, customer_id) and v2 sets
    ONLY total_amount (other columns NULL = unchanged).  Whole-row
    latest-state would erase v1's status; the coalescing collapse takes
    each column from its latest non-null version, so the final image
    interleaves both updates — exactly what the oracle states from
    orders.  One aggregate, one shuffle; see
    operators/collapse.py:coalescing_upsert."""
    from ..operators.collapse import coalescing_upsert

    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.select(
        F.col("o_orderkey").alias("id"),
        F.lit(1).alias("ts_ms"),
        F.lit("processing").alias("status"),
        F.lit(None).cast("double").alias("total_amount"),
        F.col("o_custkey").alias("customer_id"),
    )
    v2 = orders.select(
        F.col("o_orderkey").alias("id"),
        F.lit(2).alias("ts_ms"),
        F.lit(None).cast("string").alias("status"),
        F.col("o_totalprice").alias("total_amount"),
        F.lit(None).cast("long").alias("customer_id"),
    )
    return coalescing_upsert(
        v1.unionByName(v2),
        key_cols=("id",),
        version_col="ts_ms",
        value_cols=("status", "total_amount", "customer_id"),
    )


@register(
    "m4_multi_table_mart",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem
      QUALIFY row_number() OVER (PARTITION BY l_orderkey, l_linenumber
                                 ORDER BY l_partkey DESC, l_quantity DESC) = 1
    )
    SELECT c.c_mktsegment AS segment, p.p_type AS category,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_quantity * 100, 0) AS BIGINT)
                    * CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT))
                AS BIGINT) AS gross_c4
    FROM li l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey  AND o.o_orderkey % 10 <> 0
    JOIN customer c  ON o.o_custkey  = c.c_custkey   AND c.c_custkey  % 10 <> 0
    JOIN part p      ON l.l_partkey  = p.p_partkey   AND p.p_partkey  % 10 <> 0
    WHERE l.l_orderkey % 10 <> 0
    GROUP BY 1, 2
    """,
)
def m4_multi_table_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's WHOLE 4-table CDC surface as one relation
    (register-postgres.json:11-12 captures customers/products/orders/
    order_items; the reference then joins the marts in ClickHouse at
    query time): decode all four Debezium envelope streams through the
    SAME generic two-phase decoder (pluggable payload schemas,
    cdc_processor.py:50-55), collapse each to latest state, and join
    into the revenue-by-segment-and-category mart.

    The oracle never sees an envelope: it states the report over the
    FIXTURE tables with each stream's lifecycle applied analytically
    (INSERT all → UPDATE every 3rd key re-images → DELETE every 10th
    key, so final state = rows with key % 10 ≠ 0; order_items' DELETE
    keys on order_id).  The fixture's (order_id, line_no) is NOT
    unique, so those duplicate keys carry EQUAL versions into the
    collapse — the deterministic tiebreak_cols contract of
    ``latest_state`` decides the winner, and the oracle states the
    identical max-(product_id, quantity) rule; without it the survivor
    would be partition-order-dependent.  Parity therefore proves
    decode → collapse (incl. tie policy) → join end-to-end for every
    table at once — the decode runs at bronze-spill time
    (``decoded_table_log``, once per process: production stores the
    decoded form; m3/e1 keep decode itself an explicitly-benched
    operator).  Plan: four bronze scans, one collapse window each,
    then broadcast dims into the fact join — the same shape the
    100 TB mart runs nightly.  (The window collapse already prunes to
    one candidate per key per map task via the partial
    WindowGroupLimit below its exchange; ``latest_state_agg`` is the
    aggregate-composable alternative — see collapse.py's measured
    comparison.)"""
    from ..functions import fixed_units
    from ..operators.collapse import latest_state
    from ..sources.cdc import CDC_TABLES, decoded_table_log

    tiebreak = {"order_items": ("product_id", "quantity")}
    state = {}
    for name, (_schema, _fixture, _sel, key_cols) in CDC_TABLES.items():
        decoded = decoded_table_log(spark, sf_dir, name)
        state[name] = latest_state(
            decoded, key_cols=key_cols, tiebreak_cols=tiebreak.get(name, ())
        )

    items = state["order_items"].select(
        "order_id", "product_id", fixed_units("quantity").alias("qty_c2")
    )
    orders = state["orders"].select(F.col("id").alias("order_id"), "customer_id")
    custs = state["customers"].select(
        F.col("id").alias("customer_id"), F.col("segment")
    )
    prods = state["products"].select(
        F.col("id").alias("product_id"),
        "category",
        fixed_units("price").alias("price_c2"),
    )
    return (
        items.join(orders, "order_id")
        .join(F.broadcast(custs), "customer_id")
        .join(F.broadcast(prods), "product_id")
        .groupBy("segment", "category")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("qty_c2") * F.col("price_c2")).cast("long").alias("gross_c4"),
        )
    )


# ---------------------------------------------------------------------------
# M5-M7: CDC MERGE into a versioned lake snapshot (operators/snapshot.py)
# ---------------------------------------------------------------------------

# One snapshot table shared by m5/m6/m7, built once per (process, sf):
# the three CDC waves mirror the m3/e1 envelope fixture (INSERT
# processing/NULL-total -> UPDATE final state -> DELETE keys = 0 mod
# 10), applied through merge_apply instead of a read-time collapse.
# Version map after the build: v1 = empty bootstrap, v2 = post-insert,
# v3 = post-update, v4 = post-delete (current).
_SNAPSHOT_ROOTS: dict[str, str] = {}


def _ensure_orders_snapshot(spark: SparkSession, sf_dir: str) -> str:
    root = _SNAPSHOT_ROOTS.get(sf_dir)
    if root is not None:
        return root
    from ..operators.snapshot import init_snapshot_table, merge_apply

    work = _work_dir("order_snapshot", sf_dir)
    root = f"{work}/tbl"
    orders = load_table(spark, sf_dir, "orders")

    def wave(version, op, status_col, total_col, flt=None):
        df = orders if flt is None else orders.filter(flt)
        return df.select(
            F.col("o_orderkey").alias("id"),
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderdate").alias("order_date"),
            status_col.alias("status"),
            total_col.alias("total_amount"),
            F.lit(version).cast("bigint").alias("v"),
            F.lit(op).alias("op"),
        )

    init_snapshot_table(
        spark, root, key_cols=["id"], version_col="v", num_buckets=16
    )
    merge_apply(
        spark,
        root,
        wave(1, "c", F.lit("processing"), F.lit(None).cast("double")),
    )
    merge_apply(
        spark, root, wave(2, "u", F.col("o_orderstatus"), F.col("o_totalprice"))
    )
    merge_apply(
        spark,
        root,
        wave(
            3,
            "d",
            F.col("o_orderstatus"),
            F.col("o_totalprice"),
            flt=F.col("o_orderkey") % 10 == 0,
        ),
    )
    _SNAPSHOT_ROOTS[sf_dir] = root
    return root


_SNAPSHOT_COLS = ("id", "customer_id", "order_date", "status", "total_amount")


@register("m5_merge_apply_snapshot", oracle=_FINAL_STATE_ORACLE)
def m5_merge_apply_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO a versioned lake snapshot (§2.A2/E1 x
    operators/snapshot.py): the m3 CDC waves applied as three
    merge_apply batches against a copy-on-write bucketed parquet table
    committed through the atomic marker protocol — the lake-side form
    of the reference's ClickHouse ReplacingMergeTree sink
    (cdc_processor.py:104-114, clickhouse/init.sql).  Same oracle as
    e1/h: the merged table IS the latest-state relation.  Scale shape:
    each merge rewrites only the buckets its batch touches and carries
    the rest forward by manifest reference; deletes are tombstones, so
    replayed or out-of-order envelopes cannot resurrect a key."""
    from ..operators.snapshot import read_snapshot

    root = _ensure_orders_snapshot(spark, sf_dir)
    return read_snapshot(spark, root).select(*_SNAPSHOT_COLS)


@register(
    "m6_snapshot_time_travel",
    oracle="""
    SELECT o_orderkey AS id, o_custkey AS customer_id,
           o_orderdate AS order_date, o_orderstatus AS status,
           o_totalprice AS total_amount
    FROM orders
    """,
)
def m6_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel (§2.A2 ext): read the snapshot AS OF version 3 —
    after the UPDATE wave, before the DELETE wave — so every key is
    visible with its final payload, including the keys the current
    version has tombstoned.  An old version is just an old manifest;
    its files stay live until prune_snapshot_versions retires them,
    so the read is an ordinary pruned parquet scan, not a log replay."""
    from ..operators.snapshot import read_snapshot

    root = _ensure_orders_snapshot(spark, sf_dir)
    return read_snapshot(spark, root, version=3).select(*_SNAPSHOT_COLS)


@register(
    "m7_snapshot_diff",
    oracle="""
    SELECT 'delete' AS change_type, o_orderkey AS id
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT 'update' AS change_type, o_orderkey AS id
    FROM orders WHERE o_orderkey % 10 <> 0
    """,
)
def m7_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (§2.A2 ext): row-level change set between the
    post-insert version (v2) and the current post-delete version (v4)
    — every surviving key updated (processing -> final), every key =
    0 mod 10 deleted.  The diff joins ONLY buckets whose manifest
    entry differs between the two versions (a carried-forward bucket
    cannot contain a change), so its cost tracks the changed data."""
    from ..operators.snapshot import snapshot_diff

    root = _ensure_orders_snapshot(spark, sf_dir)
    return snapshot_diff(spark, root, 2, 4)


@register("h24_stream_merge_apply", oracle=_FINAL_STATE_ORACLE)
def h24_stream_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC stream maintaining the lake snapshot DIRECTLY (§2.H x
    operators/snapshot.py): the envelope file stream is merged into
    the copy-on-write snapshot table one commit per micro-batch
    (streaming/pipeline.py:run_cdc_merge_stream) — the production
    counterpart of h_stream_cdc_orders, which appends a change log and
    collapses on read.  maxFilesPerTrigger=3 forces multiple
    micro-batches over the 8-part fixture, so the COW manifest chain
    and cross-batch version arbitration both run under the gate.
    Same oracle as e1/h/m5: stream-merged table == batch-merged table
    == collapsed log == SQL golden state."""
    from ..operators.snapshot import init_snapshot_table, read_snapshot
    from ..sources.cdc import orders_envelope_json_dir
    from ..streaming.pipeline import run_cdc_merge_stream

    work = _work_dir("cdc_merge_stream", sf_dir)
    root = f"{work}/tbl"
    init_snapshot_table(
        spark, root, key_cols=["id"], version_col="ts_ms", num_buckets=16
    )
    run_cdc_merge_stream(
        spark,
        envelope_dir=orders_envelope_json_dir(spark, sf_dir),
        root=root,
        checkpoint_dir=f"{work}/ckpt",
        payload_schema=ORDERS_PAYLOAD_SCHEMA,
        max_files_per_trigger=3,
    )
    return read_snapshot(spark, root).select(*_SNAPSHOT_COLS)


@register(
    "m8_merge_on_read_snapshot",
    oracle="""
    SELECT c_custkey AS id, c_name AS name,
           c_mktsegment AS segment, c_acctbal AS acctbal
    FROM customer WHERE c_custkey % 7 <> 0
    """,
)
def m8_merge_on_read_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read snapshot maintenance (§2.A2 ext, the narrow-batch
    half of operators/snapshot.py): a customer table bootstrapped with
    one COW wave, then maintained by MOR merges — update + delete
    batches APPEND bucket-partitioned delta files (O(batch) whatever
    the table size) and the READ collapses base ∪ deltas per key,
    tombstones last.  This is the write-amplification escape hatch COW
    cannot give a scattered batch (hash bucketing spreads any such
    batch across every bucket, so a COW merge would rewrite the whole
    table to change a handful of rows); compact_snapshot_deltas folds
    the deltas back on the maintenance schedule (probe + parity in
    tests/test_snapshot.py and scripts/scale_probe.py).  The returned
    relation runs THROUGH the MOR collapse path — the oracle re-derives
    the final state independently."""
    from ..operators.snapshot import (
        init_snapshot_table,
        merge_apply,
        read_snapshot,
    )

    work = _work_dir("mor_snapshot", sf_dir)
    root = f"{work}/tbl"
    cust = load_table(spark, sf_dir, "customer")

    def wave(version, op, segment_col, acctbal_col, flt=None):
        df = cust if flt is None else cust.filter(flt)
        return df.select(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            segment_col.alias("segment"),
            acctbal_col.alias("acctbal"),
            F.lit(version).cast("bigint").alias("v"),
            F.lit(op).alias("op"),
        )

    init_snapshot_table(
        spark, root, key_cols=["id"], version_col="v", num_buckets=8
    )
    merge_apply(
        spark,
        root,
        wave(1, "c", F.lit("UNKNOWN"), F.lit(None).cast("double")),
    )
    merge_apply(
        spark,
        root,
        wave(2, "u", F.col("c_mktsegment"), F.col("c_acctbal")),
        mode="mor",
    )
    merge_apply(
        spark,
        root,
        wave(
            3,
            "d",
            F.col("c_mktsegment"),
            F.col("c_acctbal"),
            flt=F.col("c_custkey") % 7 == 0,
        ),
        mode="mor",
    )
    return read_snapshot(spark, root).select("id", "name", "segment", "acctbal")


@register(
    "m9_change_data_feed",
    oracle="""
    SELECT 'u' AS op, o_orderkey AS id, o_custkey AS customer_id,
           o_orderdate AS order_date, o_orderstatus AS status,
           o_totalprice AS total_amount, CAST(2 AS BIGINT) AS v
    FROM orders WHERE o_orderkey % 10 <> 0
    UNION ALL
    SELECT 'd', o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def m9_change_data_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed (§2.A2 ext): the CDC envelope BETWEEN two
    snapshot versions, re-derived from the snapshots themselves —
    op 'u' + the v_to payload for every surviving key (the update wave
    bumped each version 1→2), op 'd' with NULL payload for the
    tombstoned keys.  Closes the loop with h24: a CDC stream merges
    INTO the table, this feeds the same envelope shape OUT to a
    downstream replica, bucket-pruned like the diff it derives from.
    Delta-CDF semantics on plain parquet + the atomic marker
    protocol."""
    from ..operators.snapshot import change_data_feed

    root = _ensure_orders_snapshot(spark, sf_dir)
    return change_data_feed(spark, root, 2, 4)
