"""CI gate: the FULL driver contract at the driver's own scale.

``tests/test_oracle_parity.py`` checks every oracle at sf0.001 inside
the shared pytest session; this test additionally runs
``scripts/driver_sim.py`` at sf0.01 in a SUBPROCESS — a cold import of
``__spark_entry__`` under a fresh JVM, exactly what the real driver
does — so queries rotated out of the 50-row ``DRIVER_PRIORITY`` window
cannot silently rot between driver rounds (VERDICT r3 #7).  The
per-query report is written to ``DRIVER_SIM_REPORT.jsonl`` at the repo
root for the round's records.

Deselect with ``-m "not driversim"`` when iterating on a single
operator; the default suite runs it.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.driversim
def test_driver_sim_full_pass():
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "driver_sim.py"), "/root/testdata/sf0.01"],
        capture_output=True,
        text=True,
        timeout=1800,
        check=False,
    )
    (REPO / "DRIVER_SIM_REPORT.jsonl").write_text(proc.stdout)
    assert proc.returncode == 0, (
        "driver-sim failed; tail of report:\n"
        + proc.stdout[-2000:]
        + "\nstderr tail:\n"
        + proc.stderr[-1000:]
    )


def test_driver_window_is_all_oracle_bearing():
    """The driver verifies the FIRST 50 registered queries; a rows-only
    query in that window burns a slot on a weak check.  Every window
    slot must carry an exact oracle, every DRIVER_PRIORITY name must
    resolve, and the window must be exactly the priority list."""
    from realtime_cdc_pipeline_docker_spark import plans
    from realtime_cdc_pipeline_docker_spark.plans.registry import DRIVER_PRIORITY

    names = list(plans.queries_map())
    oracles = plans.oracle_sql_map()
    missing = [n for n in DRIVER_PRIORITY if n not in plans.REGISTRY]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"
    window = names[: len(DRIVER_PRIORITY)]
    assert window == list(DRIVER_PRIORITY)
    rows_only = [n for n in window if n not in oracles]
    assert not rows_only, f"rows-only queries occupy window slots: {rows_only}"
