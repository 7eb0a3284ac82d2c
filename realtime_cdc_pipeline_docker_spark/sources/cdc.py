"""Debezium-envelope CDC decode — the reference's core streaming transform.

The reference consumes Kafka topics of Debezium change events and decodes
them in two phases (reference spark-jobs/cdc_processor.py:50-55, 74-98):

1. parse the envelope ``{before, after, op, ts_ms}`` where ``before`` /
   ``after`` are *raw JSON strings* (deliberately: one generic envelope
   decoder, pluggable per-table payload schemas);
2. route ``op='d'`` → ``before`` else ``after``, stamp ``sign`` (+1
   upsert / -1 delete, cdc_processor.py:90-93), parse the payload with
   the table schema, flatten.

This module reproduces those semantics batch/stream agnostically: the
transform is a pure DataFrame→DataFrame function, so the same code runs
under ``spark.read`` in tests and ``spark.readStream`` in production —
Structured Streaming's core design point (incrementalized batch plan).

Scale notes: the decode is stateless row-local work (JSON parse + CASE),
fully inside whole-stage codegen — it pipelines with the Kafka scan and
never shuffles.  Correctness under out-of-order delivery is delegated to
the versioned sink + latest-state collapse (operators/collapse.py),
exactly like the reference's ReplacingMergeTree design.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import epoch_ms

# Envelope: before/after kept as StringType on purpose (two-phase parse,
# cdc_processor.py:50-55).
DEBEZIUM_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("before", T.StringType(), True),
        T.StructField("after", T.StringType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
    ]
)

# Payload schema for the synthetic orders change stream (mirrors the
# reference's orders table, init-db.sql:26-32 / cdc_processor.py:32-40,
# remapped onto the driver's TPC-H-ish `orders` fixture).
ORDERS_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("customer_id", T.LongType(), True),
        T.StructField("order_date", T.TimestampType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("total_amount", T.DoubleType(), True),
    ]
)


def parse_envelope(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Phase-1 parse: raw JSON (bytes or string) → envelope columns.

    Mirrors cdc_processor.py:74-76 (`cast("string")` → ``from_json`` →
    ``select("data.*")``).
    """
    return raw.select(
        F.from_json(F.col(value_col).cast("string"), DEBEZIUM_ENVELOPE_SCHEMA).alias("data")
    ).select("data.*")


def decode_envelope(envelope: DataFrame, payload_schema: T.StructType) -> DataFrame:
    """Phase-2 decode: envelope rows → signed, versioned payload rows.

    Semantics of cdc_processor.py:84-98:
      payload = before if op='d' else after    (CASE WHEN)
      sign    = -1     if op='d' else +1
      output  = payload.* + ts_ms + sign
    """
    routed = envelope.withColumn(
        "payload_json",
        F.when(F.col("op") == "d", F.col("before")).otherwise(F.col("after")),
    ).withColumn(
        "sign",
        F.when(F.col("op") == "d", F.lit(-1)).otherwise(F.lit(1)),
    )
    return routed.select(
        F.from_json("payload_json", payload_schema).alias("payload"),
        "op",
        "ts_ms",
        "sign",
    ).select("payload.*", "op", "ts_ms", "sign")


def decode_raw_stream(raw: DataFrame, payload_schema: T.StructType) -> DataFrame:
    """Full two-phase decode from a raw key/value source (Kafka-shaped)."""
    return decode_envelope(parse_envelope(raw), payload_schema)


# ---------------------------------------------------------------------------
# Deterministic envelope fixture (FIXTURES.md §B1)
# ---------------------------------------------------------------------------

# Scripted per-key event sequence derived from the driver's `orders`
# table, mirroring the reference generator's lifecycle
# (data-generator/main.py:103-128, 154-160): INSERT with NULL
# total_amount → UPDATE setting total_amount + final status → DELETE for
# every 10th key.  ts_ms offsets make versions strictly increasing per key.
_DELETE_MOD = 10


def synth_orders_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the Debezium-envelope change stream for the orders fixture.

    Returns envelope rows ``(before, after, op, ts_ms)`` with JSON-string
    payloads — byte-compatible with what the phase-1 parser emits, so
    tests can feed it straight into ``decode_envelope`` (or serialize it
    to JSON files for a Structured Streaming file source).
    """
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = orders.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderdate").alias("order_date"),
        F.col("o_orderstatus").alias("final_status"),
        F.col("o_totalprice").alias("total_amount"),
        epoch_ms("o_orderdate", orders.schema["o_orderdate"].dataType).alias("ts0"),
    )

    def payload(status, amount):
        return F.to_json(
            F.struct(
                F.col("id"),
                F.col("customer_id"),
                F.col("order_date"),
                status.alias("status"),
                amount.alias("total_amount"),
            )
        )

    insert_p = payload(F.lit("processing"), F.lit(None).cast("double"))
    update_p = payload(F.col("final_status"), F.col("total_amount"))

    inserts = base.select(
        F.lit(None).cast("string").alias("before"),
        insert_p.alias("after"),
        F.lit("c").alias("op"),
        F.col("ts0").alias("ts_ms"),
    )
    updates = base.select(
        insert_p.alias("before"),
        update_p.alias("after"),
        F.lit("u").alias("op"),
        (F.col("ts0") + 3_600_000).alias("ts_ms"),
    )
    deletes = base.filter(F.col("id") % _DELETE_MOD == 0).select(
        update_p.alias("before"),
        F.lit(None).cast("string").alias("after"),
        F.lit("d").alias("op"),
        (F.col("ts0") + 7_200_000).alias("ts_ms"),
    )
    return inserts.unionByName(updates).unionByName(deletes)


# Per-process spill of the synthesized envelope, keyed by sf_dir.
_ENVELOPE_SPILL: dict[str, str] = {}


def orders_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orders change stream as a STORED log: ``synth_orders_envelope``
    materialized to parquet ONCE per process per ``sf_dir``, then read
    back.  In production the envelope IS a stored log (a Kafka topic /
    object-store archive), so queries consuming it should scan a source,
    not re-run the generator — and benchmarks that rebuilt the fixture
    inside every CDC query run were measuring fixture synthesis, not the
    operator under test (VERDICT r4 #5).  The generator is deterministic,
    so the spill is written at most once and every consumer sees
    identical rows."""
    path = _ENVELOPE_SPILL.get(sf_dir)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="cdc_orders_envelope_")
        synth_orders_envelope(spark, sf_dir).write.mode("overwrite").parquet(path)
        _ENVELOPE_SPILL[sf_dir] = path
    return spark.read.parquet(path)


_DECODED_SPILL: dict[tuple[str, str], str] = {}


def _decoded_spill(spark: SparkSession, sf_dir: str, kind: str, build) -> DataFrame:
    path = _DECODED_SPILL.get((sf_dir, kind))
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix=f"cdc_orders_{kind}_")
        build().write.mode("overwrite").parquet(path)
        _DECODED_SPILL[(sf_dir, kind)] = path
    return spark.read.parquet(path)


def decoded_orders_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DECODED orders change log (payload columns + op/ts_ms/sign),
    materialized once per process — the bronze table a production
    deployment stores after envelope decode, so operators downstream of
    the decode (SCD2 build, temporal joins, collapses) read a source
    instead of re-parsing 3 JSON images per order on every run.  The
    decode itself stays an explicitly-benched operator (m3, e1, h*)."""
    return _decoded_spill(
        spark,
        sf_dir,
        "decoded",
        lambda: decode_envelope(orders_envelope(spark, sf_dir), ORDERS_PAYLOAD_SCHEMA),
    )


def table_envelope(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """``synth_table_envelope`` as a stored log, materialized once per
    process per (sf_dir, table) — same contract as ``orders_envelope``
    for the reference's other three captured tables."""
    return _decoded_spill(
        spark,
        sf_dir,
        f"env_{table}",
        lambda: synth_table_envelope(spark, sf_dir, table),
    )


def decoded_table_log(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """The DECODED change log for any captured table — the
    ``decoded_orders_log`` contract generalized to the reference's full
    4-table surface: production stores the bronze (decoded) form, so
    mart-refresh operators read columns, not Debezium JSON.  Decode
    cost is paid once per process at spill time and stays an
    explicitly-benched operator via m3/e1."""
    schema = CDC_TABLES[table][0]
    return _decoded_spill(
        spark,
        sf_dir,
        f"decoded_{table}",
        lambda: decode_envelope(table_envelope(spark, sf_dir, table), schema),
    )


_JSON_INPUT_SPILL: dict[str, str] = {}


def orders_envelope_json_dir(spark: SparkSession, sf_dir: str) -> str:
    """The envelope fixture as a JSON FILE DIRECTORY for the Structured
    Streaming file source, written once per process (8 parts — bounded
    listing, full synth parallelism behind the shuffle).  Streaming
    queries point readStream at this stored input and keep their
    log/checkpoint dirs per-run; rewriting the input every run was
    fixture cost, not stream cost (VERDICT r4 #5)."""
    path = _JSON_INPUT_SPILL.get(sf_dir)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="cdc_orders_json_")
        orders_envelope(spark, sf_dir).repartition(8).write.mode("overwrite").json(path)
        _JSON_INPUT_SPILL[sf_dir] = path
    return path


def signed_orders_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ±signed delta form of the orders change log (Z-set rows for
    IVM), materialized once per process — same stored-bronze rationale
    as ``decoded_orders_log``."""
    from ..operators.history import signed_delta

    return _decoded_spill(
        spark,
        sf_dir,
        "signed",
        lambda: signed_delta(orders_envelope(spark, sf_dir), ORDERS_PAYLOAD_SCHEMA),
    )


# ---------------------------------------------------------------------------
# Reference 4-table CDC surface (register-postgres.json:11-12 includes
# customers, products, orders, order_items), remapped onto the driver's
# fixture tables.  Each entry: (payload schema, fixture table, column
# projection to the reference's payload shape, key column).
# ---------------------------------------------------------------------------

CUSTOMERS_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),            # customers.id
        T.StructField("name", T.StringType(), True),        # customers.name
        T.StructField("nation_id", T.IntegerType(), True),  # ~ address region
        T.StructField("acctbal", T.DoubleType(), True),
        T.StructField("segment", T.StringType(), True),
    ]
)

PRODUCTS_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),          # products.id
        T.StructField("name", T.StringType(), True),      # products.name
        T.StructField("category", T.StringType(), True),  # products.category
        T.StructField("price", T.DoubleType(), True),     # products.price
    ]
)

ORDER_ITEMS_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType(), True),    # order_items.order_id
        T.StructField("line_no", T.IntegerType(), True),  # (composite key part)
        T.StructField("product_id", T.LongType(), True),  # order_items.product_id
        T.StructField("quantity", T.DoubleType(), True),  # order_items.quantity
    ]
)

# table name (reference topic suffix) → (payload schema, fixture table,
# select-exprs producing the payload columns, key columns)
CDC_TABLES = {
    "customers": (
        CUSTOMERS_PAYLOAD_SCHEMA,
        "customer",
        [
            "c_custkey AS id",
            "c_name AS name",
            "c_nationkey AS nation_id",
            "c_acctbal AS acctbal",
            "c_mktsegment AS segment",
        ],
        ("id",),
    ),
    "products": (
        PRODUCTS_PAYLOAD_SCHEMA,
        "part",
        [
            "p_partkey AS id",
            "p_name AS name",
            "p_type AS category",
            "p_retailprice AS price",
        ],
        ("id",),
    ),
    "orders": (
        ORDERS_PAYLOAD_SCHEMA,
        "orders",
        [
            "o_orderkey AS id",
            "o_custkey AS customer_id",
            "o_orderdate AS order_date",
            "o_orderstatus AS status",
            "o_totalprice AS total_amount",
        ],
        ("id",),
    ),
    "order_items": (
        ORDER_ITEMS_PAYLOAD_SCHEMA,
        "lineitem",
        [
            "l_orderkey AS order_id",
            "l_linenumber AS line_no",
            "l_partkey AS product_id",
            "l_quantity AS quantity",
        ],
        ("order_id", "line_no"),
    ),
}


def synth_table_envelope(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Generic deterministic envelope stream for any CDC_TABLES entry:
    INSERT of every row, then UPDATE of every 3rd key (re-image, +1 h),
    then DELETE of every 10th key (+2 h) — the reference generator's
    insert/update lifecycle (data-generator/main.py:103-160) applied
    uniformly so multi-table tests exercise real per-table schemas."""
    schema, fixture, select_exprs, key_cols = CDC_TABLES[table]
    base = spark.read.parquet(f"{sf_dir}/{fixture}.parquet").selectExpr(*select_exprs)
    key0 = F.col(key_cols[0])
    ts0 = (F.xxhash64(key0).bitwiseAND(F.lit(0x7FFFFFFF)) + F.lit(1_000_000_000)).alias(
        "ts0"
    )
    payload = F.to_json(F.struct(*[F.col(f.name) for f in schema.fields]))
    rows = base.select(payload.alias("img"), key0.alias("k"), ts0)
    inserts = rows.select(
        F.lit(None).cast("string").alias("before"),
        F.col("img").alias("after"),
        F.lit("c").alias("op"),
        F.col("ts0").alias("ts_ms"),
    )
    updates = rows.filter(F.col("k") % 3 == 0).select(
        F.col("img").alias("before"),
        F.col("img").alias("after"),
        F.lit("u").alias("op"),
        (F.col("ts0") + 3_600_000).alias("ts_ms"),
    )
    deletes = rows.filter(F.col("k") % 10 == 0).select(
        F.col("img").alias("before"),
        F.lit(None).cast("string").alias("after"),
        F.lit("d").alias("op"),
        (F.col("ts0") + 7_200_000).alias("ts_ms"),
    )
    return inserts.unionByName(updates).unionByName(deletes)


def kafka_envelope_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Production CDC source: one Kafka topic of Debezium envelopes →
    parsed envelope stream (§2.A1, cdc_processor.py:64-70 verbatim
    semantics: subscribe one topic, earliest offsets, value bytes →
    two-phase decode downstream).

    Requires the spark-sql-kafka package on the classpath (the reference
    submits with --packages spark-sql-kafka-0-10, spark-entrypoint.sh:37).
    Tests use the file-based envelope source instead — the transform
    stack after this function is identical, which is the point: swap the
    source, keep the pipeline."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_envelope(raw, value_col="value")


def split_quarantine(
    decoded: DataFrame, key_cols: Sequence[str] = ("id",)
) -> tuple[DataFrame, DataFrame]:
    """Route decoded CDC rows into (good, quarantine).

    PERMISSIVE decoding (the engine's stance, tested in
    tests/test_cdc_robustness.py) turns malformed payloads into all-null
    rows instead of failing the stream; a null KEY makes a row useless to
    the versioned collapse, so such rows go to a dead-letter side
    (op/ts_ms preserved for diagnosis) while everything else proceeds.
    Call inside foreachBatch and write each side to its own location —
    the filter is a narrow op evaluated once per side off the same scan."""
    null_key = None
    for k in key_cols:
        cond = F.col(k).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    return decoded.filter(~null_key), decoded.filter(null_key)
