"""Pre-built-index ANN query-time probe (VERDICT r5 #6 / r6 #1).

The IVF family queries (j3c/j3e/j3k/j3o) are EXCLUDED from bench.py
because they re-train the k-means index (and PQ codebook) every run —
an offline build cost by contract: at 100 TB the index is trained on a
sample and materialized ONCE at ingest, and what a user pays per query
batch is the probe.  This script measures that query-time honestly:

1. OFFLINE (timed once, reported separately): train centroids, seed
   the PQ codebook, materialize both index layouts —
   ``write_ivf_index`` (cluster-partitioned float vectors) and
   ``write_ivfpq_index`` (cluster-partitioned + m-byte PQ codes).
2. QUERY (1 warm-up + N measured runs each, median, full
   materialization through the noop sink):
   - ``ivf_inmem``  — ``ivf_ann_topk`` with pre-trained centroids:
     corpus assignment + probe + in-list exact rerank (the j3c query
     path; assignment would be ingest-computed at scale, so this is an
     UPPER bound on the in-memory probe).
   - ``ivf_index``  — ``ivf_index_topk`` over the parquet IVF layout:
     partition-pruned scan of the probed clusters only (the j3e query
     path; THE at-rest query cost).
   - ``ivfpq_inmem`` — ``ivfpq_adc_topk`` with pre-trained
     centroids + codebook (the j3k query path: LUT build + ADC rank +
     shortlist + exact rerank; per-run PQ code computation included,
     ingest-computed at scale → upper bound).
   - ``ivfpq_index`` — ``ivfpq_index_topk`` over the parquet IVF-PQ
     layout (the j3o query path; the true 100 TB ADC query cost).

Writes ``IVF_PROBE.json`` to the repo root (cited by PERF.md and by
bench.py's EXCLUDED reasons) and prints it as one JSON line.

Usage: python scripts/ivf_query_probe.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.catalog import load_table, release_persisted
from realtime_cdc_pipeline_docker_spark.functions import vec_normalize
from realtime_cdc_pipeline_docker_spark.operators.similarity import (
    ivf_ann_topk,
    ivf_index_topk,
    ivfpq_adc_topk,
    ivfpq_index_topk,
    seed_codebook,
    train_ivf_centroids,
    write_ivf_index,
    write_ivfpq_index,
)
from realtime_cdc_pipeline_docker_spark.plans.similarity_queries import (
    _N_QUERIES,
    _TOP_K,
)
from realtime_cdc_pipeline_docker_spark.session import get_session


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def _bench_query(build, runs: int) -> dict:
    """1 unmeasured warm-up + ``runs`` measured noop-sink runs, median."""
    build().write.mode("overwrite").format("noop").save()
    release_persisted()
    sample = []
    for _ in range(runs):
        sample.append(
            _timed(
                lambda: build().write.mode("overwrite").format("noop").save()
            )
        )
        release_persisted()
    return {"median_sec": sorted(sample)[len(sample) // 2], "samples": sample}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session(app="ivf_query_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    work = tempfile.mkdtemp(prefix="rtcdc_ivf_probe_")

    # ---- offline build: trained once, materialized once ----
    build_sec: dict[str, float] = {}
    centroids: list[list[float]] = []
    codebook: list[list[float]] = []
    build_sec["train_centroids"] = _timed(
        lambda: centroids.extend(train_ivf_centroids(emb))
    )
    normed = emb.select("vec_id", vec_normalize("embedding").alias("embedding"))
    build_sec["seed_codebook"] = _timed(
        lambda: codebook.extend(seed_codebook(normed, k=16))
    )
    build_sec["write_ivf_index"] = _timed(
        lambda: write_ivf_index(emb, f"{work}/ivf", centroids)
    )
    build_sec["write_ivfpq_index"] = _timed(
        lambda: write_ivfpq_index(emb, f"{work}/ivfpq", centroids, codebook)
    )

    # ---- query time over the pre-built artifacts ----
    query = {
        "ivf_inmem": _bench_query(
            lambda: ivf_ann_topk(emb, queries, k=_TOP_K, centroids=centroids),
            runs,
        ),
        "ivf_index": _bench_query(
            lambda: ivf_index_topk(
                spark, f"{work}/ivf", queries, centroids, k=_TOP_K
            ),
            runs,
        ),
        "ivfpq_inmem": _bench_query(
            lambda: ivfpq_adc_topk(
                emb, queries, k=_TOP_K, centroids=centroids, codebook=codebook
            ),
            runs,
        ),
        "ivfpq_index": _bench_query(
            lambda: ivfpq_index_topk(
                spark, f"{work}/ivfpq", queries, centroids, codebook, k=_TOP_K
            ),
            runs,
        ),
    }
    shutil.rmtree(work, ignore_errors=True)

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None
    out = {
        "sf": sf,
        "sf_dir": sf_dir,
        "n_queries": _N_QUERIES,
        "top_k": _TOP_K,
        "runs_per_query": runs,
        "offline_build_sec": build_sec,
        "query_sec": query,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "IVF_PROBE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
