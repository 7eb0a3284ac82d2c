"""Simulate the driver's verify pass end-to-end against __spark_entry__.py.

Runs entry() at sf0.001, then every queries() entry at sf0.01 compared
to its oracle_sql() via DuckDB (row count + python types + exact
order-insensitive values).  Prints one JSON line per query + a summary.

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import __spark_entry__ as entrymod
from oracle_harness import assert_parity

from realtime_cdc_pipeline_docker_spark.session import get_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app="driver-sim")

    t0 = time.time()
    n = entrymod.entry(spark).count()
    print(json.dumps({"check": "entry_smoke", "rows": n, "sec": round(time.time() - t0, 2)}))
    assert n > 0

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    timings: dict[str, float] = {}
    for name, fn in sorted(queries.items()):
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                assert_parity(df, oracles[name], sf_dir, name)
                status = "oracle_match"
            else:
                rows = df.count()
                status = f"rows_only({rows})"
            timings[name] = round(time.time() - t0, 2)
            print(json.dumps({"query": name, "status": status, "sec": timings[name]}))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(json.dumps({"query": name, "status": "FAIL", "error": str(exc)[:400]}))
    # Gate-time risk surface: the driver's verify pass has finite time;
    # anything slow here (Spark side + oracle side combined) is the
    # first candidate for an oracle rewrite or plan fix next round.
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    print(json.dumps({"slowest": slowest, "total_sec": round(sum(timings.values()), 1)}))
    print(json.dumps({"total": len(queries), "oracle": len(oracles), "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
