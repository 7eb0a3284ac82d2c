"""Parquet table catalog for the driver testdata layout.

``/root/testdata/sf{X}/{table}.parquet`` — TPC-H-ish star schema plus
``events`` (stream table), ``documents`` / ``embeddings`` (LLM-pipeline
extension fixtures).  See TESTDATA.md / FIXTURES.md.

Scans are plain ``spark.read.parquet`` so Catalyst gets full predicate
pushdown + column pruning into the vectorized parquet reader.  At 100 TB
the same loader works over a partitioned object-store layout — nothing
here assumes local files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are fixed-cardinality; supplier/part/customer grow with
# sf but stay orders of magnitude under the fact tables).
BROADCASTABLE = frozenset({"region", "nation", "supplier", "part", "customer"})


# Columns stored as TIMESTAMP(NANOS) in the fixture parquet.  Spark reads
# them as long (legacy.parquet.nanosAsLong); we convert to micros
# timestamps with integer division — same truncation DuckDB applies, so
# oracles agree.  (Double division would lose precision: epoch-nanos
# exceed 2^53.)
_NANOS_TIMESTAMP_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TIMESTAMP_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Widen a narrow scan to the cluster's parallelism — no-op if wide.

    File-splitting assigns partitions by input *bytes*
    (``maxPartitionBytes``), which under-parallelizes CPU-bound operators
    whose work per byte is large (shingling ≈ k hashes/char expands rows
    ~2000×): a small parquet file lands on one core.  At 100 TB the scan
    is already thousands of partitions and this returns the input
    unchanged — the repartition only fires when partitions < cores."""
    if df.isStreaming:  # .rdd is undefined on streams; micro-batches
        return df       # inherit source parallelism instead
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# Persisted-intermediate tracking.  Operators that .persist() an
# intermediate consumed by their (lazy) result — minhash fingerprints,
# simhash signatures, inverted indexes, CC labels — cannot unpersist it
# before the caller materializes the result, so they register it here and
# the CALLER releases after materialization.  Unpersisting an
# already-released or still-referenced frame is safe (Spark falls back to
# recompute), so release_persisted() can be called after every query.
# ---------------------------------------------------------------------------

_PERSISTED: list[DataFrame] = []


def track_persisted(df: DataFrame) -> DataFrame:
    """Register a persisted intermediate for later release_persisted()."""
    _PERSISTED.append(df)
    return df


def release_persisted() -> None:
    """Unpersist every tracked intermediate (call once results are
    materialized — bench.py and the test harness do this per query, so
    cached blocks don't accumulate over a long session).  Blocking:
    async unpersist leaves the old run's blocks competing with the
    next run's cache for storage memory (measured as bimodal minhash
    timings in back-to-back bench runs — eviction mid-job forces
    recompute); blocking removal costs milliseconds and makes
    successive runs independent."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist(blocking=True)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for spark.sql() entry points)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
