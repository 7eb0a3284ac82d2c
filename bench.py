"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_wall_sec", "value": N, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full materialization
of every output row — count() would let Spark skip projection work).

Methodology: each query is first run once at sf0.001 (~1/100 of the
bench data).  That compiles the query's whole-stage-codegen classes
(janino) and JITs them — measured at up to 8 s for the widest generated
aggregates, i.e. larger than the steady-state query itself — so the
timed sf run measures execution, not compilation.  The warm-up cannot
pre-compute anything: it reads different files at a different scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from realtime_cdc_pipeline_docker_spark import plans  # noqa: E402
from realtime_cdc_pipeline_docker_spark.session import get_session  # noqa: E402

HEADLINE = [
    "flagship_revenue_report",
    "c01_global_sum",
    "c03_order_totals",
    "c06_pricing_summary",
    "c08_rollup",
    "d1_join_inner_fk",
    "d2_d3_join_three_way",
    "d4_join_left_outer",
    "d6_join_star_snowflake",
    "e1_cdc_latest_state",
    "e2a_window_topn",
    "e2c_window_running_sum",
    "e2d_sessionization",
    "h4_events_hourly",
    "j1_dedup_exact",
    "j2_minhash_neardup",
    "j3_similarity_topk",
    "j4a_text_stats",
    "j4c_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None
    spark = get_session(app="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JIT + executor spin-up, not counted.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    warm_dir = "/root/testdata/sf0.001"
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = plans.REGISTRY[name].fn
        if os.path.isdir(warm_dir) and warm_dir != sf_dir:
            fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        times[name] = round(time.time() - t0, 3)

    out = {
        "metric": "total_wall_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
