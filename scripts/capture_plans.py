"""Capture explain("formatted") for named registered queries.

Usage: python scripts/capture_plans.py <outdir> <suffix> q1 [q2 ...]

Writes <outdir>/<query>_<suffix>.txt.  Run from the repo checkout whose
plans you want (the round's *_before.txt come from a worktree at the
round-start commit).  Streaming rows execute their stream inside the
registered fn; the captured plan is the returned READ-BACK relation —
the per-batch plans live inside foreachBatch and are documented via
scripts/opt_probe.py decompositions instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_cdc_pipeline_docker_spark import plans  # noqa: E402
from realtime_cdc_pipeline_docker_spark.catalog import release_persisted  # noqa: E402
from realtime_cdc_pipeline_docker_spark.session import get_session  # noqa: E402


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_session(app=f"plans-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    from realtime_cdc_pipeline_docker_spark.sources.cdc import (
        orders_envelope,
        orders_envelope_json_dir,
    )

    orders_envelope(spark, sf_dir).count()
    orders_envelope_json_dir(spark, sf_dir)
    for name in names:
        df = plans.REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        release_persisted()
        print(f"captured {name}_{suffix}", flush=True)


if __name__ == "__main__":
    main()
