"""Versioned snapshot table (operators/snapshot.py): MERGE-apply
semantics, copy-on-write bucket pruning, tombstone arbitration, time
travel, diff, vacuum, and GC — the lake-side ReplacingMergeTree
contract (reference: cdc_processor.py sink + clickhouse/init.sql DDL)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.operators.snapshot import (
    compact_snapshot_deltas,
    init_snapshot_table,
    merge_apply,
    prune_snapshot_versions,
    read_snapshot,
    snapshot_diff,
    snapshot_versions,
    vacuum_tombstones,
)


def _changes(spark, rows):
    """rows: (id, v, op, val)"""
    return spark.createDataFrame(
        rows, "id BIGINT, v BIGINT, op STRING, val STRING"
    )


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _init(spark, root, num_buckets=4):
    init_snapshot_table(
        spark, root, key_cols=["id"], version_col="v", num_buckets=num_buckets
    )


def _state(spark, root, **kw):
    return {
        (r["id"], r["v"], r["val"])
        for r in read_snapshot(spark, root, **kw).collect()
    }


def test_merge_upsert_and_delete(spark, root):
    _init(spark, root)
    merge_apply(
        spark,
        root,
        _changes(spark, [(1, 1, "c", "a"), (2, 1, "c", "b"), (3, 1, "c", "c")]),
    )
    merge_apply(
        spark,
        root,
        _changes(spark, [(2, 2, "u", "B"), (3, 2, "d", "c"), (4, 2, "c", "d")]),
    )
    assert _state(spark, root) == {(1, 1, "a"), (2, 2, "B"), (4, 2, "d")}


def test_version_arbitration_and_idempotent_replay(spark, root):
    _init(spark, root)
    wave = _changes(spark, [(1, 5, "c", "new"), (2, 5, "c", "x")])
    merge_apply(spark, root, wave)
    # A LATE change with an older version loses.
    merge_apply(spark, root, _changes(spark, [(1, 3, "u", "stale")]))
    assert _state(spark, root) == {(1, 5, "new"), (2, 5, "x")}
    # Replaying an applied batch byte-for-byte is a no-op.
    before = _state(spark, root)
    merge_apply(spark, root, wave)
    assert _state(spark, root) == before


def test_delete_tombstone_beats_late_older_update(spark, root):
    _init(spark, root)
    merge_apply(spark, root, _changes(spark, [(1, 1, "c", "a")]))
    merge_apply(spark, root, _changes(spark, [(1, 3, "d", "a")]))
    # The delete is a TOMBSTONE: a replayed v=2 update must not
    # resurrect the key.
    merge_apply(spark, root, _changes(spark, [(1, 2, "u", "zombie")]))
    assert _state(spark, root) == set()
    tombs = read_snapshot(spark, root, include_tombstones=True).collect()
    assert [(r["id"], r["v"], r["_deleted"]) for r in tombs] == [(1, 3, True)]


def test_copy_on_write_prunes_untouched_buckets(spark, root):
    """A merge touching one key rewrites ONLY that key's bucket: every
    other bucket's manifest entry — and its physical files — carry
    forward unchanged.  This is the O(touched)-not-O(table) claim."""
    _init(spark, root, num_buckets=8)
    merge_apply(
        spark,
        root,
        _changes(spark, [(i, 1, "c", f"r{i}") for i in range(64)]),
    )
    v2 = spark.read.parquet(f"{root}/v_000002/manifest")
    paths_v2 = {r["kbucket"]: r["relpath"] for r in v2.collect()}
    merge_apply(spark, root, _changes(spark, [(7, 2, "u", "R7")]))
    v3 = spark.read.parquet(f"{root}/v_000003/manifest")
    paths_v3 = {r["kbucket"]: r["relpath"] for r in v3.collect()}
    changed = {b for b in paths_v3 if paths_v3[b] != paths_v2.get(b)}
    assert len(changed) == 1  # exactly the bucket id=7 hashes to
    carried = set(paths_v2) - changed
    assert carried and all(paths_v3[b] == paths_v2[b] for b in carried)
    # the carried relpaths still point at v_000002's physical files
    assert all(paths_v3[b].startswith("data/v_000002/") for b in carried)
    # and the merged state is right
    assert (7, 2, "R7") in _state(spark, root)
    assert (8, 1, "r8") in _state(spark, root)


def test_time_travel_reads_old_version(spark, root):
    _init(spark, root)
    merge_apply(spark, root, _changes(spark, [(1, 1, "c", "a"), (2, 1, "c", "b")]))
    merge_apply(spark, root, _changes(spark, [(1, 2, "u", "A"), (2, 2, "d", "b")]))
    assert snapshot_versions(spark, root) == [1, 2, 3]
    assert _state(spark, root, version=2) == {(1, 1, "a"), (2, 1, "b")}
    assert _state(spark, root) == {(1, 2, "A")}


def test_snapshot_diff_labels(spark, root):
    _init(spark, root)
    merge_apply(
        spark,
        root,
        _changes(spark, [(1, 1, "c", "a"), (2, 1, "c", "b"), (3, 1, "c", "c")]),
    )
    merge_apply(
        spark,
        root,
        _changes(spark, [(1, 2, "u", "A"), (3, 2, "d", "c"), (4, 2, "c", "d")]),
    )
    got = {
        (r["change_type"], r["id"])
        for r in snapshot_diff(spark, root, 2, 3).collect()
    }
    assert got == {("update", 1), ("delete", 3), ("insert", 4)}
    # diff against the empty bootstrap version: everything is an insert
    got0 = {
        (r["change_type"], r["id"])
        for r in snapshot_diff(spark, root, 1, 2).collect()
    }
    assert got0 == {("insert", 1), ("insert", 2), ("insert", 3)}


def test_vacuum_tombstones_horizon(spark, root):
    _init(spark, root)
    merge_apply(spark, root, _changes(spark, [(1, 1, "c", "a"), (2, 1, "c", "b")]))
    merge_apply(spark, root, _changes(spark, [(1, 2, "d", "a"), (2, 5, "d", "b")]))
    vacuum_tombstones(spark, root, below_version=3)
    tombs = {
        (r["id"], r["v"])
        for r in read_snapshot(spark, root, include_tombstones=True)
        .filter(F.col("_deleted"))
        .collect()
    }
    # v=2 tombstone dropped (below horizon), v=5 kept
    assert tombs == {(2, 5)}
    assert _state(spark, root) == set()


def test_schema_evolution_on_merge(spark, root):
    _init(spark, root)
    merge_apply(spark, root, _changes(spark, [(1, 1, "c", "a")]))
    wider = spark.createDataFrame(
        [(2, 2, "c", "b", "extra")],
        "id BIGINT, v BIGINT, op STRING, val STRING, note STRING",
    )
    merge_apply(spark, root, wider)
    rows = {
        (r["id"], r["val"], r["note"])
        for r in read_snapshot(spark, root).collect()
    }
    assert rows == {(1, "a", None), (2, "b", "extra")}


def test_prune_gc_keeps_referenced_data(spark, root):
    _init(spark, root, num_buckets=4)
    merge_apply(
        spark, root, _changes(spark, [(i, 1, "c", f"r{i}") for i in range(16)])
    )
    merge_apply(spark, root, _changes(spark, [(1, 2, "u", "R1")]))
    merge_apply(spark, root, _changes(spark, [(2, 3, "u", "R2")]))
    state_before = _state(spark, root)
    res = prune_snapshot_versions(spark, root, keep=2)
    # v_000002's data tree is still referenced by the kept manifests
    # (its untouched buckets were carried forward) and must survive.
    assert "data/v_000002" not in res["removed_data"]
    assert os.path.isdir(f"{root}/data/v_000002")
    assert _state(spark, root) == state_before
    # old manifests gone, current + one prior kept
    assert snapshot_versions(spark, root) == [3, 4]
    # time travel to a pruned version now fails cleanly
    with pytest.raises(ValueError):
        read_snapshot(spark, root, version=2)


def test_prune_gc_removes_orphan_data(spark, root):
    _init(spark, root, num_buckets=2)
    merge_apply(spark, root, _changes(spark, [(1, 1, "c", "a"), (2, 1, "c", "b")]))
    # rewrite BOTH buckets so v_000002's data is fully superseded
    merge_apply(spark, root, _changes(spark, [(1, 2, "u", "A"), (2, 2, "u", "B")]))
    merge_apply(spark, root, _changes(spark, [(1, 3, "u", "AA"), (2, 3, "u", "BB")]))
    res = prune_snapshot_versions(spark, root, keep=2)
    assert "data/v_000002" in res["removed_data"]
    assert not os.path.isdir(f"{root}/data/v_000002")
    assert _state(spark, root) == {(1, 3, "AA"), (2, 3, "BB")}
    assert _state(spark, root, version=3) == {(1, 2, "A"), (2, 2, "B")}


# ---------------------------------------------------------------------------
# Merge-on-read mode: delta appends, read-time collapse, compaction
# ---------------------------------------------------------------------------


def test_mor_merge_equals_cow_merge(spark, tmp_path):
    """The two physical strategies implement ONE logical contract: the
    same change sequence applied cow-only and mor-only yields the same
    visible relation, including tombstone arbitration."""
    waves = [
        [(i, 1, "c", f"r{i}") for i in range(20)],
        [(3, 2, "u", "R3"), (4, 2, "d", "x"), (21, 2, "c", "new")],
        [(4, 1, "u", "zombie"), (5, 3, "u", "R5")],  # late older update
    ]
    roots = {}
    for mode in ("cow", "mor"):
        root = str(tmp_path / mode)
        _init(spark, root)
        for wv in waves:
            merge_apply(spark, root, _changes(spark, wv), mode=mode)
        roots[mode] = _state(spark, root)
    assert roots["cow"] == roots["mor"]
    assert (4, 1, "zombie") not in roots["mor"]


def test_mor_append_does_not_rewrite_base(spark, tmp_path):
    """A MOR merge appends delta entries and carries EVERY existing
    manifest row forward — zero base rewrite, O(batch) whatever the
    table size (the write-amplification fix COW cannot give a narrow
    scattered batch)."""
    root = str(tmp_path / "tbl")
    _init(spark, root, num_buckets=8)
    merge_apply(
        spark, root, _changes(spark, [(i, 1, "c", f"r{i}") for i in range(64)])
    )
    v2 = {
        (r["kbucket"], r["relpath"], r["role"])
        for r in spark.read.parquet(f"{root}/v_000002/manifest").collect()
    }
    merge_apply(spark, root, _changes(spark, [(7, 2, "u", "R7")]), mode="mor")
    v3 = {
        (r["kbucket"], r["relpath"], r["role"])
        for r in spark.read.parquet(f"{root}/v_000003/manifest").collect()
    }
    assert v2 < v3  # every old row carried forward verbatim
    added = v3 - v2
    assert len(added) == 1 and next(iter(added))[2] == "delta"
    assert next(iter(added))[1].startswith("data/v_000003/")
    assert (7, 2, "R7") in _state(spark, root)


def test_mor_replay_is_visible_noop(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _init(spark, root)
    merge_apply(spark, root, _changes(spark, [(1, 1, "c", "a"), (2, 1, "c", "b")]))
    batch = _changes(spark, [(1, 2, "u", "A"), (2, 2, "d", "b")])
    merge_apply(spark, root, batch, mode="mor")
    before = _state(spark, root)
    merge_apply(spark, root, batch, mode="mor")  # redelivery
    assert _state(spark, root) == before == {(1, 2, "A")}


def test_compact_snapshot_deltas_parity_and_fold(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _init(spark, root, num_buckets=4)
    merge_apply(
        spark, root, _changes(spark, [(i, 1, "c", f"r{i}") for i in range(16)])
    )
    for v in (2, 3, 4):
        merge_apply(
            spark,
            root,
            _changes(spark, [(v, v, "u", f"R{v}"), (100 + v, v, "c", "n")]),
            mode="mor",
        )
    before = _state(spark, root)
    stats = compact_snapshot_deltas(spark, root)
    assert stats["compacted_buckets"] >= 1
    assert stats["manifest_rows_after"] <= stats["manifest_rows_before"]
    # post-compaction manifest carries no deltas and the relation is
    # IDENTICAL — collapse applied once instead of at every read
    cur = max(snapshot_versions(spark, root))
    roles = {
        r["role"]
        for r in spark.read.parquet(
            f"{root}/v_{cur:06d}/manifest"
        ).collect()
    }
    assert roles == {"base"}
    assert _state(spark, root) == before
    # idempotent: a second compaction is a no-op
    assert compact_snapshot_deltas(spark, root)["compacted_buckets"] == 0


def test_mor_diff_compares_visible_states(spark, tmp_path):
    """Diff over MOR versions must collapse before comparing: a delta
    bucket holds superseded versions and replay duplicates."""
    root = str(tmp_path / "tbl")
    _init(spark, root)
    merge_apply(spark, root, _changes(spark, [(1, 1, "c", "a"), (2, 1, "c", "b")]))
    merge_apply(spark, root, _changes(spark, [(1, 2, "u", "A")]), mode="mor")
    merge_apply(spark, root, _changes(spark, [(2, 3, "d", "b")]), mode="mor")
    got = {
        (r["change_type"], r["id"])
        for r in snapshot_diff(spark, root, 2, 4).collect()
    }
    assert got == {("update", 1), ("delete", 2)}


def test_vacuum_collapses_mor_bucket(spark, tmp_path):
    """A dead tombstone in a delta must not resurrect the key's older
    base upsert: vacuum collapses before dropping."""
    root = str(tmp_path / "tbl")
    _init(spark, root)
    merge_apply(spark, root, _changes(spark, [(1, 1, "c", "a")]))
    merge_apply(spark, root, _changes(spark, [(1, 2, "d", "a")]), mode="mor")
    vacuum_tombstones(spark, root, below_version=10)
    assert _state(spark, root) == set()
    assert read_snapshot(spark, root, include_tombstones=True).count() == 0


def test_lookup_snapshot_prunes_to_key_buckets(spark, tmp_path):
    """The point-lookup path reads ONLY the buckets the keys hash to —
    asserted on the scan's actual input files, not just the result."""
    from realtime_cdc_pipeline_docker_spark.operators.snapshot import (
        lookup_snapshot,
    )

    root = str(tmp_path / "tbl")
    _init(spark, root, num_buckets=16)
    merge_apply(
        spark, root, _changes(spark, [(i, 1, "c", f"r{i}") for i in range(256)])
    )
    df = lookup_snapshot(spark, root, [7, 13])
    got = {(r["id"], r["val"]) for r in df.collect()}
    assert got == {(7, "r7"), (13, "r13")}
    touched_dirs = {f.split("/kb=")[1].split("/")[0] for f in df.inputFiles()}
    assert len(touched_dirs) <= 2  # at most one bucket per key, of 16


def test_lookup_snapshot_sees_mor_deltas_and_tombstones(spark, tmp_path):
    from realtime_cdc_pipeline_docker_spark.operators.snapshot import (
        lookup_snapshot,
    )

    root = str(tmp_path / "tbl")
    _init(spark, root)
    merge_apply(spark, root, _changes(spark, [(1, 1, "c", "a"), (2, 1, "c", "b")]))
    merge_apply(
        spark, root, _changes(spark, [(1, 2, "u", "A"), (2, 2, "d", "b")]),
        mode="mor",
    )
    rows = {(r["id"], r["val"]) for r in lookup_snapshot(spark, root, [1, 2]).collect()}
    assert rows == {(1, "A")}  # update visible, tombstone filtered


def test_change_data_feed_envelope(spark, tmp_path):
    """CDF between two versions: op c/u/d with the v_to payload,
    NULL payload for deletes — the envelope a downstream replica
    needs."""
    from realtime_cdc_pipeline_docker_spark.operators.snapshot import (
        change_data_feed,
    )

    root = str(tmp_path / "tbl")
    _init(spark, root)
    merge_apply(
        spark,
        root,
        _changes(spark, [(1, 1, "c", "a"), (2, 1, "c", "b"), (3, 1, "c", "c")]),
    )
    merge_apply(
        spark,
        root,
        _changes(spark, [(1, 2, "u", "A"), (3, 2, "d", "c"), (4, 2, "c", "d")]),
    )
    rows = {
        (r["op"], r["id"], r["val"], r["v"])
        for r in change_data_feed(spark, root, 2, 3).collect()
    }
    assert rows == {
        ("u", 1, "A", 2),
        ("d", 3, None, None),
        ("c", 4, "d", 2),
    }


def test_concurrent_merge_conflict_detected(spark, tmp_path):
    """Two writers merging against the same parent: the second commit
    must fail loudly (lost-update detection), not silently drop the
    first writer's changes.  Simulated by committing an out-of-band
    version between a merge's read and its commit."""
    from unittest import mock

    from realtime_cdc_pipeline_docker_spark.operators import snapshot as snap

    root = str(tmp_path / "tbl")
    _init(spark, root)
    merge_apply(spark, root, _changes(spark, [(1, 1, "c", "a")]))

    real_begin = snap.begin_index_version

    def racing_begin(spark_, root_):
        staged = real_begin(spark_, root_)
        # another writer lands a full merge while ours is mid-flight
        with mock.patch.object(snap, "begin_index_version", real_begin):
            merge_apply(spark_, root_, _changes(spark_, [(9, 9, "c", "z")]))
        return staged

    with mock.patch.object(snap, "begin_index_version", racing_begin):
        with pytest.raises(RuntimeError, match="merge conflict"):
            merge_apply(spark, root, _changes(spark, [(2, 2, "c", "b")]))
    # the racing writer's change survived; ours was rejected, not lost
    assert (9, 9, "z") in _state(spark, root)
    assert (2, 2, "b") not in _state(spark, root)
