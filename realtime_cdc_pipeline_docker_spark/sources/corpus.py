"""Line-delimited JSON corpus source (SURVEY §2.A extension).

The reference ingests exactly one wire format — Debezium JSON over
Kafka (reference spark-jobs/cdc_processor.py:58-75).  A corpus engine
additionally needs the dominant interchange format for document
corpora: JSONL (one JSON object per line — the distribution format of
Common-Crawl-derived datasets).  This module gives it the same
robustness contract the CDC source has (sources/cdc.py:312
``split_quarantine``): an explicit schema, PERMISSIVE parse, and a
corrupt-record channel — a malformed line must never kill a 100 TB
ingest job, and must never silently become a row of NULLs either.

Scale shape: ``spark.read.json`` with an *explicit* schema performs no
inference pass (schema inference reads the whole dataset twice), splits
by newlines, and parses JSON in the JVM (Jackson) — scan-parallel,
zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL directory into ``(good, quarantine)``.

    ``good`` carries exactly the declared schema; ``quarantine`` carries
    the raw offending line.  PERMISSIVE mode keeps the job alive on bad
    input; the corrupt-record column makes the badness observable
    instead of swallowed (§2.H6's no-swallow rule, applied to batch).
    Spark requires the corrupt column's source rows to be materialized
    before filtering on it (a cached/pruned scan may elide the parse
    error), so both outputs are projected from one parsed frame.
    """
    # StructType.add mutates in place — build a fresh struct so the
    # caller's schema (often the module constant) stays pristine.
    parsed_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = spark.read.schema(parsed_schema).option(
        "columnNameOfCorruptRecord", CORRUPT_COL
    ).option("mode", "PERMISSIVE").json(path)
    # Spark refuses to filter on the corrupt column straight off the
    # file scan (SPARK-26243: referencing only the corrupt column of a
    # pruned scan is ambiguous) — a no-op cache boundary is the
    # documented workaround and costs one pass over already-read lines.
    parsed = parsed.cache()
    good = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, quarantine


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a corpus as JSONL (one object per line, snappy-free text).

    Partition-parallel: every task writes its own file; no coordination
    beyond the final commit protocol — the same layout a 1000-executor
    export would produce."""
    df.write.mode("overwrite").json(path)


ORDERS_CSV_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Read a headerless CSV directory into ``(good, quarantine)`` —
    the JSONL robustness contract (explicit schema, PERMISSIVE parse,
    corrupt-record channel) applied to the other interchange format
    every warehouse still speaks.  A row with an unparsable cell or
    the wrong shape lands in quarantine as its raw line; it neither
    kills the job nor silently becomes NULLs.

    Same scale shape as JSONL: explicit schema means no inference pass
    (CSV inference reads everything once just to guess types), newline
    splitting keeps the scan parallel (no ``multiLine`` — documents
    with embedded newlines belong in JSONL/parquet, not CSV), parsing
    is JVM-side Univocity — zero Python."""
    parsed_schema = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = (
        spark.read.schema(parsed_schema)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("mode", "PERMISSIVE")
        .option("header", "false")
        .csv(path)
    )
    # Same SPARK-26243 cache boundary as read_jsonl: the corrupt column
    # is only reliable when the full row was actually parsed.
    parsed = parsed.cache()
    good = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, quarantine


def write_csv(df: DataFrame, path: str) -> None:
    """Write a headerless CSV export (partition-parallel, one file per
    task).  Doubles print in Java shortest-roundtrip form and
    timestamps in ISO-8601, both of which this module's reader maps
    back to identical values — the b13 oracle proves that exactness."""
    df.write.mode("overwrite").option("header", "false").csv(path)


def write_orc(df: DataFrame, path: str) -> None:
    """Write an ORC export (zlib-compressed, partition-parallel) — the
    third interchange format a warehouse-adjacent corpus engine must
    speak (Hive/Trino-native, as parquet is Spark/DuckDB-native).
    ORC is a first-class Spark source: fully typed, splittable, with
    file/stripe statistics the reader uses for predicate pushdown."""
    df.write.mode("overwrite").orc(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """Read an ORC directory with an explicit schema (no inference
    footprint; missing columns surface as a schema mismatch up front,
    not NULLs downstream).  ORC is self-describing and type-checked at
    write time, so there is no corrupt-record channel to wire — a
    torn/truncated file fails the scan loudly, which is the correct
    contract for a binary columnar format (quarantine applies to
    line-oriented text formats where a single bad LINE is isolable).

    Scale shape: scan-parallel across stripes, column-pruned and
    predicate-pushed by the vectorized JVM ORC reader — identical plan
    properties to the parquet scans every other query uses."""
    return spark.read.schema(schema).orc(path)
