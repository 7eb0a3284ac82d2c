"""Round-13 optimization probes: quantify the micro-batch machinery
floor and the per-batch cost structure of the heavy h-series streams.

Usage: python scripts/opt_probe.py <probe> [sf_dir]

Probes:
  machinery  — drain the 3-wave documents source through foreachBatch
               bodies of increasing weight (no-op / isEmpty / noop-write)
               to price the Structured Streaming machinery itself,
               separate from any operator work (guide §1: measure first).
  appends    — price one bucketed ledger append (repartition(key) +
               partitionBy write of a ~1.7k-row batch) solo vs four of
               them submitted from a thread pool (guide §2.6: overlap
               independent jobs so the next job's tasks back-fill the
               tail of the current one).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from realtime_cdc_pipeline_docker_spark.session import get_session  # noqa: E402
from realtime_cdc_pipeline_docker_spark.catalog import load_table  # noqa: E402


def _fresh(path: str) -> str:
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def probe_machinery(spark, sf_dir: str) -> None:
    from realtime_cdc_pipeline_docker_spark.plans.pipeline_queries import (
        _ensure_doc_waves,
        _NEARDUP_SRC,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import DOCUMENT_SCHEMA
    from realtime_cdc_pipeline_docker_spark.streaming.windows import _scoped_confs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    _ensure_doc_waves(docs, sf_dir)
    src = _NEARDUP_SRC[sf_dir]

    def drain(body, tag: str, runs: int = 3) -> None:
        walls = []
        for i in range(runs):
            ckpt = _fresh(f"/tmp/opt_probe/ckpt_{tag}_{i}")
            reader = spark.readStream.schema(DOCUMENT_SCHEMA).option(
                "maxFilesPerTrigger", "1"
            )
            stream = reader.parquet(src)
            t0 = time.time()
            with _scoped_confs(
                spark,
                {
                    "spark.sql.shuffle.partitions": "8",
                    "spark.sql.adaptive.enabled": "false",
                },
            ):
                (
                    stream.writeStream.foreachBatch(body)
                    .option("checkpointLocation", ckpt)
                    .trigger(availableNow=True)
                    .start()
                    .awaitTermination()
                )
            walls.append(round(time.time() - t0, 3))
        print(f"{tag}: {walls} (3 micro-batches per run)")

    batch_times: list[float] = []

    def noop_body(batch_df, batch_id):
        t0 = time.time()
        batch_times.append(t0)

    def isempty_body(batch_df, batch_id):
        if batch_df.isEmpty():
            return

    def noopwrite_body(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        batch_df.write.mode("overwrite").format("noop").save()

    drain(noop_body, "pure-noop")
    if len(batch_times) >= 6:
        gaps = [
            round(b - a, 3) for a, b in zip(batch_times[-3:-1], batch_times[-2:])
        ]
        print(f"  inter-batch gaps in last run: {gaps}")
    drain(isempty_body, "isEmpty-only")
    drain(noopwrite_body, "isEmpty+noop-write")


def probe_appends(spark, sf_dir: str) -> None:
    from concurrent.futures import ThreadPoolExecutor

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .filter(F.col("doc_id") % 3 == 0)
        .persist()
    )
    n = docs.count()
    print(f"batch rows: {n}")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    def one_append(i: int, root: str) -> float:
        t0 = time.time()
        (
            docs.withColumn(
                "bkt", F.pmod(F.xxhash64("doc_id") + i, F.lit(8)).cast("int")
            )
            .repartition("bkt")
            .write.mode("append")
            .partitionBy("bkt")
            .parquet(f"{root}/led{i}")
        )
        return round(time.time() - t0, 3)

    for trial in range(3):
        root = _fresh(f"/tmp/opt_probe/seq_{trial}")
        t0 = time.time()
        solo = [one_append(i, root) for i in range(4)]
        seq_wall = round(time.time() - t0, 3)
        root = _fresh(f"/tmp/opt_probe/par_{trial}")
        t0 = time.time()
        with ThreadPoolExecutor(max_workers=4) as pool:
            par = list(pool.map(lambda i: one_append(i, root), range(4)))
        par_wall = round(time.time() - t0, 3)
        print(
            f"trial {trial}: sequential 4 appends {seq_wall}s {solo} "
            f"| threaded {par_wall}s {par}"
        )
    docs.unpersist()


def probe_ivfpq(spark, sf_dir: str) -> None:
    """Decompose one h22-shaped micro-batch into: Column-tree build
    (prepared, should be ~0), Catalyst analysis, optimization+planning,
    and execution (noop + real bucketed append) — to see where the
    ~3.4 s/batch floor claimed by PERF.md round-12 actually goes."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        _ivfpq_indexed,
        prepare_ivfpq_exprs,
    )
    from realtime_cdc_pipeline_docker_spark.plans.similarity_queries import (
        _fixture_centroids,
        _fixture_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = _fixture_centroids(emb, sf_dir, "ivf", 16)
    codebook = _fixture_codebook(spark, sf_dir)
    batch = emb.filter(F.col("vec_id") % 3 == 0).select("vec_id", "embedding")
    batch.count()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    t0 = time.time()
    prepared = prepare_ivfpq_exprs(centroids, codebook, 8, 2)
    t_prep = time.time() - t0
    print(f"prepare_ivfpq_exprs (py4j tree build): {t_prep:.3f}s")

    for trial in range(3):
        t0 = time.time()
        df = (
            _ivfpq_indexed(
                batch, centroids, codebook, 8, 2, "vec_id", "embedding",
                exprs=prepared,
            )
            .withColumnRenamed("__cluster", "cluster")
            .withColumn("__batch_id", F.lit(trial))
            .withColumn("__run_tag", F.lit("probe"))
        )
        t_build = time.time() - t0
        t0 = time.time()
        df.schema  # forces analysis only
        t_analyze = time.time() - t0
        t0 = time.time()
        df._jdf.queryExecution().executedPlan()  # optimize + plan
        t_plan = time.time() - t0
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t_exec = time.time() - t0
        root = _fresh(f"/tmp/opt_probe/ivfpq_{trial}")
        t0 = time.time()
        (
            df.repartition("cluster")
            .write.mode("append")
            .partitionBy("cluster")
            .parquet(root)
        )
        t_append = time.time() - t0
        print(
            f"trial {trial}: build {t_build:.3f}s analyze {t_analyze:.3f}s "
            f"plan {t_plan:.3f}s exec(noop) {t_exec:.3f}s append {t_append:.3f}s"
        )


def probe_pagerank(spark, sf_dir: str) -> None:
    """Decompose e18 (round-14: driver showed 11.8 s at 32 cores vs
    ~4.6 s at 8 — anti-scaling 0.39): price the edge-table build, the
    two count jobs, and each of the 10 iterations separately, under
    (a) the current cadence-2 lazy localCheckpoint and (b) an eager
    per-iteration materialization, to locate where the 32-core run
    loses time."""
    from realtime_cdc_pipeline_docker_spark.catalog import release_persisted
    from realtime_cdc_pipeline_docker_spark.operators.graph import (
        EDGE_ROWS_PER_PARTITION,
        TOTAL_MASS,
        _edges_with_degree,
        _pagerank_round,
    )
    from realtime_cdc_pipeline_docker_spark.plans import REGISTRY

    # --- whole-query wall, bench methodology (3 runs) ---
    fn = REGISTRY["e18_graph_pagerank"].fn
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    release_persisted()
    for trial in range(3):
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        release_persisted()
        print(f"e18 full query trial {trial}: {wall:.3f}s")

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cs = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    edges = cs.unionByName(
        cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )

    t0 = time.time()
    pre = _edges_with_degree(edges, "src", "dst").persist()
    n_edges = pre.count()
    t_build = time.time() - t0
    t0 = time.time()
    n = pre.select("src").distinct().count()
    t_nodes = time.time() - t0
    nparts = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            -(-n_edges // EDGE_ROWS_PER_PARTITION),
        ),
    )
    t0 = time.time()
    full_deg = pre.repartition(nparts, "src").persist()
    full_deg.count()
    t_layout = time.time() - t0
    print(
        f"edges={n_edges} nodes={n} nparts={nparts} "
        f"build={t_build:.3f}s nodes_count={t_nodes:.3f}s layout={t_layout:.3f}s"
    )
    r0 = TOTAL_MASS // n
    base = (100 - 85) * r0

    ranks = (
        full_deg.select("src", "deg")
        .distinct()
        .select(
            F.col("src").alias("node"), F.lit(r0).cast("long").alias("rank_u")
        )
        .localCheckpoint(eager=True)
    )
    for i in range(10):
        t0 = time.time()
        ranks = _pagerank_round(full_deg, ranks, base, 85).localCheckpoint(
            eager=True
        )
        print(f"  iter {i} (eager ckpt): {time.time() - t0:.3f}s")
    pre.unpersist()
    full_deg.unpersist()


def main() -> None:
    probe = sys.argv[1] if len(sys.argv) > 1 else "machinery"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_session(app=f"opt-probe-{probe}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warm-up
    spark.sparkContext.setJobDescription(f"opt_probe:{probe}")
    if probe == "machinery":
        probe_machinery(spark, sf_dir)
    elif probe == "appends":
        probe_appends(spark, sf_dir)
    elif probe == "ivfpq":
        probe_ivfpq(spark, sf_dir)
    elif probe == "pagerank":
        probe_pagerank(spark, sf_dir)
    else:
        raise SystemExit(f"unknown probe {probe}")


if __name__ == "__main__":
    main()
