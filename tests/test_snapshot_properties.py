"""Property-based tests for the snapshot MERGE contract (the
test_collapse_properties methodology applied to operators/snapshot.py).

The hand-written tests pin the golden cases; here hypothesis drives
arbitrary change sequences — duplicate versions, delete/upsert ties,
redeliveries, late stale updates — through merge_apply under an
ARBITRARY partitioning of the sequence into batches, in BOTH physical
modes, against an independent Python model of the commutative
arbitration rule (max version, upsert-over-delete on ties).  The
convergence claim ("any partitioning of the delivery yields the same
relation") is exactly the property hypothesis is built to attack.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_cdc_pipeline_docker_spark.operators.snapshot import (
    init_snapshot_table,
    merge_apply,
    read_snapshot,
)

# A change: (key, version, op, payload).  Few keys/versions → dense
# collisions; payload is a FUNCTION of (key, version, op) — the
# documented contract ((key, version) determines the payload) — so
# redeliveries are byte-identical, as a real CDC source's are.
changes_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=6),
        st.sampled_from(["c", "u", "d"]),
    ),
    min_size=0,
    max_size=24,
)

# How to split the sequence into micro-batches: a list of cut ratios.
cuts_strategy = st.lists(
    st.floats(min_value=0.0, max_value=1.0), min_size=0, max_size=4
)


def model_merge(changes):
    """Independent model of the arbitration: per key keep the row with
    max (version, not-delete); visible state drops deleted keys."""
    state: dict[int, tuple[int, bool]] = {}
    for k, v, op in changes:
        deleted = op == "d"
        cur = state.get(k)
        # rank: higher version wins; tie → upsert (not-delete) wins;
        # tie again → identical row (payload is f(k, v, op)), keep.
        if cur is None or (v, not deleted) > (cur[0], not cur[1]):
            state[k] = (v, deleted)
    return {
        (k, v) for k, (v, deleted) in state.items() if not deleted
    }


def _batches(changes, cut_ratios):
    cuts = sorted({int(r * len(changes)) for r in cut_ratios})
    out, prev = [], 0
    for c in cuts + [len(changes)]:
        if c > prev:
            out.append(changes[prev:c])
        prev = c
    return out


@pytest.mark.parametrize("mode", ["cow", "mor"])
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(changes=changes_strategy, cut_ratios=cuts_strategy)
def test_any_batching_converges_to_model(
    spark, tmp_path_factory, mode, changes, cut_ratios
):
    work = tmp_path_factory.mktemp("snapprop")
    root = str(work / "tbl")
    init_snapshot_table(
        spark, root, key_cols=["id"], version_col="v", num_buckets=4
    )
    rows = [
        (k, v, op, f"p{k}.{v}.{op}")
        for k, v, op in changes
    ]
    for batch in _batches(rows, cut_ratios):
        merge_apply(
            spark,
            root,
            spark.createDataFrame(
                batch, "id BIGINT, v BIGINT, op STRING, val STRING"
            ),
            mode=mode,
        )
    if not changes:
        return
    got = {
        (r["id"], r["v"]) for r in read_snapshot(spark, root).collect()
    }
    assert got == model_merge(changes)
