"""Versioned mart table sink — the engine-native form of the reference's
ClickHouse JDBC sink (cdc_processor.py:104-114 + init-clickhouse.sql).

The reference appends micro-batches over JDBC (batchsize 5000,
isolation NONE) into ``ReplacingMergeTree(ts_ms, sign) ORDER BY id``
tables, delegating clustering and collapse to ClickHouse.  Here the same
storage contract is expressed with parquet primitives:

- **append-only** versioned rows (``mode("append")``) — the write is
  idempotent-by-layering, collapse is merge-on-read
  (``operators.collapse.latest_state``) or merge-on-write (``compact``);
- **date partitioning** (``partitionBy``) — static + dynamic partition
  pruning replace ClickHouse's PARTITION BY, so time-bounded readers
  touch only their partitions;
- **key clustering** (``sortWithinPartitions``) — the ``ORDER BY id``
  primary-index analog (init-clickhouse.sql:19): parquet row-group
  min/max stats on the sorted key let point/range scans skip row groups;
- **file sizing** (``maxRecordsPerFile``) — the batchsize analog: keeps
  files splittable and bounded instead of one file per task.

At 100 TB: partitions bound compaction scope (compact only partitions
that received appends), clustering bounds collapse-read amplification,
and nothing here is local-filesystem specific.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_mart(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = (),
    cluster_cols: Sequence[str] = ("id",),
    max_records_per_file: int = 1_000_000,
    mode: str = "append",
) -> None:
    """Append a (micro-)batch to a versioned mart table."""
    out = df
    if cluster_cols:
        out = out.sortWithinPartitions(*cluster_cols)
    writer = out.write.option("maxRecordsPerFile", max_records_per_file).mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def read_mart(spark: SparkSession, path: str) -> DataFrame:
    """Read a mart table (partition columns come back as columns;
    predicates on them prune directories before any file is opened)."""
    return spark.read.parquet(path)


def compact_mart_partitions(
    spark: SparkSession,
    path: str,
    touched_partitions: Sequence,
    partition_col: str,
    key_cols: Sequence[str] = ("id",),
    version_col: str = "ts_ms",
    sign_col: str = "sign",
    cluster_cols: Sequence[str] = ("id",),
    max_records_per_file: int = 1_000_000,
) -> None:
    """Incremental background merge: compact ONLY the partitions that
    received appends, leaving every other partition's files untouched —
    the explicit form of ClickHouse's per-part background merge
    (init-clickhouse.sql:18), which never rewrites quiescent parts.

    Correctness does not depend on a key's versions living in one
    partition: compaction within the touched set only removes rows
    *dominated inside that set*, and a dominated row can never win the
    global ``latest_state`` rank — so merge-on-read over the compacted
    table equals merge-on-read over the full log, always.

    Mechanics: read the touched partitions (partition-pruned scan),
    collapse to max-version per key (delete markers retained so later
    appends still layer), materialize via ``localCheckpoint`` (the
    overwrite deletes the files the plan would otherwise still be
    reading), then dynamic-partition-overwrite — Spark replaces exactly
    the partition directories present in the written data.  At 100 TB
    each maintenance cycle therefore costs O(appended partitions), not
    O(table); a production deployment on an object store would stage +
    swap directories instead of localCheckpoint for crash-atomicity
    (or use a table format whose metadata commit provides it).
    """
    from ..operators.collapse import compact

    touched = read_mart(spark, path).filter(
        F.col(partition_col).isin(list(touched_partitions))
    )
    compacted = compact(
        touched, key_cols=key_cols, version_col=version_col, sign_col=sign_col
    )
    if cluster_cols:
        compacted = compacted.repartition(F.col(partition_col)).sortWithinPartitions(
            *cluster_cols
        )
    compacted = compacted.localCheckpoint()
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            compacted.write.option("maxRecordsPerFile", max_records_per_file)
            .mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    compacted.unpersist()


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    driver: str,
    batchsize: int = 5000,
    user: str | None = None,
    password: str | None = None,
) -> None:
    """JDBC append sink with the reference's exact write profile
    (cdc_processor.py:104-114): mode append, batchsize 5000,
    isolationLevel NONE (the OLAP store is not transactional; the
    versioned collapse makes redelivery safe, so relaxed isolation is
    correct, not sloppy).  Untested here (no database in the container);
    `write_mart` is the engine-native sink with the same layering
    semantics."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", batchsize)
        .option("isolationLevel", "NONE")
        .mode("append")
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    writer.save()


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and bucket-sorted) on its join key.

    THE co-location primitive for repeated big-table joins: two tables
    bucketed into the same ``num_buckets`` on the same key join
    bucket-to-bucket with **no Exchange on either side** — at 100 TB the
    fact-to-fact shuffle (the single most expensive stage in any
    repeated join pipeline) is paid once at write time and never again.
    ``sort`` additionally orders each bucket file, giving key-clustered
    row groups (min/max stat skipping on the join key); note Spark 3+
    re-sorts per task at read regardless (write-time ordering is only
    trusted under the legacy ``bucketedTableScan.outputOrdering`` flag)
    — the win this function banks is the eliminated Exchange.

    Spark's bucketing metadata lives in the session/warehouse catalog,
    hence ``saveAsTable`` rather than a path write — on a production
    deployment that's the shared metastore.  Sizing rule: pick
    ``num_buckets`` so one bucket of the LARGER table fits an executor
    (bucket count is fixed at write; it is the unit of join/task
    parallelism for every later read).
    """
    # Cluster rows to their bucket before writing: otherwise every task
    # emits a sliver into every bucket (tasks x buckets small files).
    # One shuffle here buys one well-sized, key-sorted file per bucket.
    out = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    writer = (
        out.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def zorder_key(
    cols: Sequence, los: Sequence[int], his: Sequence[int], bits: int = 16
) -> F.Column:
    """Morton (Z-order) interleaved key over N exact-integer columns —
    the multi-dimensional clustering expression behind
    ``write_zordered``.  Each column is scaled to ``bits`` levels over
    its caller-declared ``[lo, hi)`` range (declared, not discovered:
    the layout stays stable across deliveries, same contract as
    operators/profile.py:histogram), clamped at the edges, then the
    bit planes are interleaved so that rows close in EVERY dimension
    get close keys.  Pure integer column arithmetic — shifts, masks,
    adds — whole-stage codegen, no UDF."""
    assert len(cols) == len(los) == len(his)
    assert len(cols) * bits <= 62, "interleaved key must fit a signed long"
    n = len(cols)
    levels = []
    for c, lo, hi in zip(cols, los, his):
        v = F.col(c) if isinstance(c, str) else c
        x = F.least(F.greatest(v - F.lit(lo), F.lit(0)), F.lit(hi - lo - 1)).cast(
            "long"
        )
        # level in [0, 2^bits): scale by range.  Double arithmetic is
        # fine here — the key is a LAYOUT heuristic, deterministic for
        # a given input either way; the clamp guards the top edge.
        lvl = F.floor(x * F.lit(float(1 << bits)) / F.lit(float(hi - lo)))
        levels.append(F.least(lvl, F.lit((1 << bits) - 1)).cast("long"))
    key = F.lit(0).cast("long")
    for d, lvl in enumerate(levels):
        for b in range(bits):
            key = key + (
                F.shiftleft(F.shiftright(lvl, b).bitwiseAND(F.lit(1)), b * n + d)
            )
    return key.cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    los: Sequence[int],
    his: Sequence[int],
    num_buckets: int = 16,
    bits: int = 16,
) -> None:
    """Multi-dimensional clustering for data skipping (the OPTIMIZE
    ZORDER BY analog): partition the table by the TOP bits of the
    Morton key (``num_buckets`` must be a power of 4 so a bucket is a
    whole quadrant at some depth), sorting by the full key within, so
    every bucket covers an ALIGNED hyper-rectangle of the key space
    instead of a thin slice of one column.

    Alignment is the load-bearing choice: range-partitioning the key
    (the obvious alternative) draws boundaries mid-key, and a file
    straddling a high-order quadrant boundary has a bounding box as
    wide as the whole table in every dimension — z-curve locality only
    bounds boxes for PREFIX-aligned intervals.  (Found empirically:
    the straddle case fails the bounding-box test roughly one run in
    three.)  Bucket = key prefix also makes the bucket a real
    PARTITION COLUMN, so bucket predicates prune directories before
    any footer is read; parquet row-group min/max on the sorted key
    serves finer pruning within.

    One hash shuffle on the bucket + in-partition sort — same cost as
    any clustered write; tests/test_mart_sink.py asserts exact bucket
    alignment vs a single-column sort layout."""
    n = len(cols)
    depth = 0
    while (1 << (n * depth)) < num_buckets:
        depth += 1
    assert (1 << (n * depth)) == num_buckets, (
        f"num_buckets must be a power of 2^{n} for aligned {n}-D buckets"
    )
    key = zorder_key(cols, los, his, bits)
    bucket = F.shiftright(key, n * (bits - depth)).alias("__zbucket")
    (
        df.withColumn("__z", key)
        .withColumn("__zbucket", bucket)
        .repartition("__zbucket")
        .sortWithinPartitions("__zbucket", "__z")
        .drop("__z")
        .write.mode("overwrite")
        .partitionBy("__zbucket")
        .parquet(path)
    )
