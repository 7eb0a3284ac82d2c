"""SparkSession builder.

Mirrors the reference's runtime configuration (AQE enabled —
reference script/spark-entrypoint.sh:39) and adds the settings a
100 TB deployment needs from day one:

- Adaptive Query Execution with partition coalescing and skew-join
  handling: at 1000-executor scale, static shuffle partitioning is
  always wrong for at least one stage; AQE re-plans from runtime stats.
- ``spark.sql.shuffle.partitions`` sized for the test scale by default
  but overridable via ``SPARK_GRAFT_SHUFFLE_PARTITIONS``; on a real
  cluster this should be ~2-3x total cores (or left to AQE coalescing
  from a high initial value).
- UTC session timezone so event-time semantics are deployment-independent.
- Arrow enabled for the Pandas-UDF extension operators (vectorized
  batch transfer instead of per-row pickling).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_session(
    app: str = "realtime-cdc-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    Local test harness runs ``local[$SPARK_GRAFT_CPUS]``; on a cluster
    the master comes from spark-submit and this builder only sets SQL conf.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app)
        .master(master)
        # AQE: runtime re-planning — coalesce tiny shuffle partitions,
        # demote to broadcast joins, split skewed partitions.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic event-time semantics regardless of host TZ.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for the pandas-UDF extension operators.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The dedup/similarity operators aggregate collect_set
        # fingerprints over high-cardinality keys (one group per
        # document).  ObjectHashAggregate's default sort-based fallback
        # threshold is 128 in-memory groups — i.e. EVERY partition of
        # such an aggregate abandons hash aggregation and sorts the
        # full shingle stream, measured 2-3x slower and the source of
        # bimodal minhash timings (sort spill interaction).  128k
        # groups per task keeps hash aggregation for any sanely-sized
        # partition while still falling back before unbounded memory;
        # at 100 TB, partition sizing (shuffle.partitions) governs
        # groups-per-task, not this cap.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
        # AQE coalescing costs stages by BYTES, but the dedup verify
        # stages (array_intersect exact-Jaccard over candidate pairs)
        # are CPU-dense and byte-light: 84k pairs ≈ 2 MB of shuffle yet
        # ~3.3 s of single-thread CPU — the default 1 MB floor coalesced
        # that stage to ONE task whenever AQE's threshold-edge broadcast
        # flip routed the verify through its own shuffle, producing the
        # bimodal minhash timings (r6: 2.6 s vs 6.1 s; event-log
        # diagnosis in PERF.md §j2-bimodality).  A 64k floor keeps
        # small-byte CPU-dense stages parallel on local[32]; at cluster
        # scale the parallelism-first target (total/parallelism)
        # dominates and this floor is inert.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        # Keep the UI off in tests/bench (less noise, faster startup).
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # The fixture parquet stores TIMESTAMP(NANOS), which Spark's
        # reader rejects by default; read as long, catalog converts to
        # micros timestamps (matching DuckDB's nanos→micros truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # A 213-query bench session compiles thousands of generated
        # classes; the JVM's default 240 MB reserved code cache fills
        # late in the run, HotSpot stops JIT-compiling, and the LAST
        # queries in the suite run partially interpreted (r7 bench:
        # j9h samples trending 9.5 s → 17.1 s within one run, plus
        # 0.5–2 s drift on other late-suite rows).  512 MB keeps the
        # whole suite compiled; irrelevant to correctness, and on a
        # real cluster executors run far fewer distinct plans per JVM.
        .config(
            "spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=512m"
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
