"""Solo-query timing harness: bench.py's exact methodology (noop sink,
unmeasured warm-ups, median of N runs) for a named subset of registered
queries — the solo-triage instrument PERF.md's decompositions use.

Usage: python scripts/solo_bench.py q1 [q2 ...] [--runs N] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_cdc_pipeline_docker_spark import plans  # noqa: E402
from realtime_cdc_pipeline_docker_spark.catalog import release_persisted  # noqa: E402
from realtime_cdc_pipeline_docker_spark.session import get_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import bench  # noqa: E402  (JIT_HEAVY membership)

    spark = get_session(app="solo-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from realtime_cdc_pipeline_docker_spark.sources.cdc import (
        decoded_orders_log,
        orders_envelope,
        orders_envelope_json_dir,
        signed_orders_deltas,
    )

    orders_envelope(spark, sf_dir).count()
    decoded_orders_log(spark, sf_dir).count()
    signed_orders_deltas(spark, sf_dir).count()
    orders_envelope_json_dir(spark, sf_dir)

    out = {}
    for name in names:
        fn = plans.REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"solo:{name}")
        for _ in range(3 if name in bench.JIT_HEAVY else 1):
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            release_persisted()
        sample = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            sample.append(round(time.time() - t0, 3))
            release_persisted()
        out[name] = {"median": sorted(sample)[len(sample) // 2], "samples": sample}
        print(f"{name}: median {out[name]['median']}s samples {sample}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
