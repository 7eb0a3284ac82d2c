"""Regenerate COUNTS.json — the ONE generated source for every count
the docs cite (VERDICT r7 #4: hand-maintained counts drifted four
rounds running; SURVEY/README now cite this file instead).

Counts emitted:
- ``tests_collected``: pytest collection over ``tests/`` (no run).
- ``queries_registered`` / ``queries_oracle_bearing`` /
  ``queries_rows_only``: from the live registry.
- ``driver_sim``: per-status tally of the latest
  ``DRIVER_SIM_REPORT.jsonl`` (written by the in-suite gate), if any.
- ``bench_headline``: total/query-count/sf copied from the committed
  ``BENCH_FULL.json`` (VERDICT r8 #3 — the prose headline drifted from
  the artifact exactly like the hand-maintained test counts did; docs
  must cite THIS number and the gate test cross-checks any literal
  "N s for ALL" headline in PERF.md/SURVEY.md against it).

``tests/test_driver_sim_gate.py::test_counts_json_current`` pins the
registry-derived numbers so COUNTS.json cannot silently go stale.

Usage: python scripts/update_counts.py
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from realtime_cdc_pipeline_docker_spark import plans

    registered = len(plans.REGISTRY)
    oracle_bearing = sum(
        1 for s in plans.REGISTRY.values() if s.oracle is not None
    )

    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        capture_output=True,
        text=True,
        cwd=REPO,
        check=False,
    )
    m = re.search(r"(\d+) tests? collected", proc.stdout)
    if not m:
        # pytest -q prints "N tests collected in X.XXs" on the tail line;
        # fall back to counting node ids if the summary format changes.
        node_lines = [
            l for l in proc.stdout.splitlines() if "::" in l and not l.startswith("=")
        ]
        tests_collected = len(node_lines)
    else:
        tests_collected = int(m.group(1))

    counts = {
        "tests_collected": tests_collected,
        "queries_registered": registered,
        "queries_oracle_bearing": oracle_bearing,
        "queries_rows_only": registered - oracle_bearing,
    }

    bench_full = os.path.join(REPO, "BENCH_FULL.json")
    if os.path.exists(bench_full):
        bench = json.load(open(bench_full))
        counts["bench_headline"] = {
            "total_sec": bench["value"],
            "queries": len(bench["queries"]),
            "registered": bench.get("registered"),
            "excluded": len(bench.get("excluded", {})),
            "sf": bench.get("sf"),
        }
        # Freeze the artifact the headline was generated FROM (VERDICT r9
        # #2): the driver's own bench re-run overwrites BENCH_FULL.json in
        # the post-commit working tree, so the gate test compares the docs
        # against THIS snapshot — written only here, alongside COUNTS.json,
        # and committed with it — never against the mutable BENCH_FULL.
        with open(os.path.join(REPO, "BENCH_COMMITTED.json"), "w") as f:
            json.dump(bench, f)
            f.write("\n")

    report = os.path.join(REPO, "DRIVER_SIM_REPORT.jsonl")
    if os.path.exists(report):
        tally: dict[str, int] = {"oracle_match": 0, "rows_only": 0, "fail": 0}
        for line in open(report):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            status = rec.get("status")
            if status is None:
                continue
            if status == "oracle_match":
                tally["oracle_match"] += 1
            elif status.startswith("rows_only"):
                tally["rows_only"] += 1
            else:
                tally["fail"] += 1
        counts["driver_sim"] = tally

    with open(os.path.join(REPO, "COUNTS.json"), "w") as f:
        json.dump(counts, f, indent=1)
        f.write("\n")
    print(json.dumps(counts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
