"""The versioned-index commit protocol (operators/index_commit.py) —
VERDICT r11 #4 / ADVICE r11 medium: commit must be ONE atomic
small-file write, old versions must survive the commit (concurrent
readers + quality-gate fallback), and deletion happens only in the
explicit GC."""

import pytest
from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.operators.index_commit import (
    begin_index_version,
    commit_index_version,
    current_index_version,
    init_index_root,
    is_index_root,
    prune_index_versions,
    resolve_index_path,
)


def _write(spark, path, ids):
    # append: writes into an init'd version dir without clobbering its
    # _COMMITTED marker (the maintenance-stream write mode)
    spark.createDataFrame([(i,) for i in ids], "vec_id long").write.mode(
        "append"
    ).parquet(path)


def test_plain_dir_resolves_to_itself(spark, tmp_path):
    p = str(tmp_path / "plain")
    _write(spark, p, [1, 2])
    assert not is_index_root(spark, p)
    assert resolve_index_path(spark, p) == p


def test_commit_is_marker_only_and_old_version_survives(spark, tmp_path):
    root = str(tmp_path / "root")
    v1 = init_index_root(spark, root)
    assert v1.endswith("v_000001")
    _write(spark, v1, [1])
    assert resolve_index_path(spark, root) == v1

    staged = begin_index_version(spark, root)
    assert staged.endswith("v_000002")
    _write(spark, staged, [1, 2])
    # staging is invisible until commit
    assert resolve_index_path(spark, root) == v1

    # a "concurrent reader" resolved v1 before the commit …
    reader = spark.read.parquet(resolve_index_path(spark, root))
    live = commit_index_version(spark, staged)
    assert resolve_index_path(spark, root) == live
    # … and still completes on the old version's untouched files
    assert reader.count() == 1
    assert spark.read.parquet(resolve_index_path(spark, root)).count() == 2


def test_commit_refuses_missing_or_nonversion_path(spark, tmp_path):
    root = str(tmp_path / "root")
    init_index_root(spark, root)
    with pytest.raises(ValueError, match="does not exist"):
        commit_index_version(spark, f"{root}/v_000099")
    p = str(tmp_path / "other")
    _write(spark, p, [1])
    with pytest.raises(ValueError, match="not a v_"):
        commit_index_version(spark, p)


def test_init_refuses_existing_root(spark, tmp_path):
    root = str(tmp_path / "root")
    init_index_root(spark, root)
    with pytest.raises(ValueError, match="already has versions"):
        init_index_root(spark, root)


def test_prune_keeps_current_and_inflight_staging(spark, tmp_path):
    root = str(tmp_path / "root")
    v1 = init_index_root(spark, root)
    _write(spark, v1, [1])
    v2 = begin_index_version(spark, root)
    _write(spark, v2, [1, 2])
    commit_index_version(spark, v2)
    # an ABANDONED staging dir older than current (simulate: v2 is
    # current, craft nothing older) — instead: v3 staged but never
    # committed is NEWER than current -> an in-flight rebuild, kept
    v3 = begin_index_version(spark, root)
    _write(spark, v3, [1, 2, 3])

    out = prune_index_versions(spark, root, keep=1)
    assert v1 in out["removed"]
    assert v2 in out["kept"] and v3 in out["kept"]
    assert resolve_index_path(spark, root) == v2

    # committing v3 makes v2 prunable and v3 current
    commit_index_version(spark, v3)
    out2 = prune_index_versions(spark, root, keep=1)
    assert v2 in out2["removed"]
    assert resolve_index_path(spark, root) == v3
    assert spark.read.parquet(resolve_index_path(spark, root)).count() == 3


def test_prune_clamps_keep_to_current(spark, tmp_path):
    root = str(tmp_path / "root")
    v1 = init_index_root(spark, root)
    _write(spark, v1, [7])
    out = prune_index_versions(spark, root, keep=0)
    assert out["removed"] == [] and v1 in out["kept"]
    assert spark.read.parquet(resolve_index_path(spark, root)).collect()[0][0] == 7


def test_rebuild_on_versioned_root_commits_new_version(spark, sf_dir, tmp_path):
    """rebuild_ivf_index on a versioned root: stages v2, commits via
    the marker, keeps v1 intact, and the query path resolves v2."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        rebuild_ivf_index,
        train_ivf_centroids,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    root = str(tmp_path / "root")
    # canonical build flow: stage → write → commit (the writer's
    # mode("overwrite") replaces the staging dir, so the marker goes
    # on AFTER the write)
    v1 = begin_index_version(spark, root)
    c0 = train_ivf_centroids(emb.filter(F.col("vec_id") % 2 == 0), n_centroids=4)
    write_ivf_index(emb, v1, c0, assign=2)
    commit_index_version(spark, v1)
    n_v1 = spark.read.parquet(v1).count()

    rebuild_ivf_index(spark, root, n_centroids=4)
    live = resolve_index_path(spark, root)
    assert live.endswith("v_000002")
    # v1 untouched by the commit
    assert spark.read.parquet(v1).count() == n_v1
    assert spark.read.parquet(live).select("vec_id").distinct().count() == 200


def test_begin_claims_exclusively_under_race(spark, tmp_path):
    """Two rebuilds racing for the next version must never share a
    staging path: the root-level _CLAIM file create is the atomic
    arbiter (on HDFS/POSIX — see the begin docstring for the
    object-store scope).  Simulated race: a pre-r13-style racer
    occupies v2 out-of-band (staging dir, no claim file) AFTER the
    loser's listing would have seen it free — begin must skip to v3."""
    from realtime_cdc_pipeline_docker_spark.operators.index_commit import (
        STAGING_MARKER,
    )

    root = str(tmp_path / "root")
    v1 = init_index_root(spark, root)
    _write(spark, v1, [1])
    # a racer claims v_000002 directly (what a concurrent begin does)
    import os

    os.makedirs(f"{root}/v_000002")
    open(f"{root}/v_000002/{STAGING_MARKER}", "w").close()

    got = begin_index_version(spark, root)
    assert got.endswith("v_000003")
    # and the claim itself is on disk, so a THIRD caller skips both
    assert begin_index_version(spark, root).endswith("v_000004")
    # uncommitted claims stay invisible to readers
    assert resolve_index_path(spark, root) == v1


def test_claim_survives_writer_overwrite_window(spark, tmp_path):
    """VERDICT r12 #5 — the third-claimer interleave: a staged writer
    using mode("overwrite") briefly DELETES its claimed dir; the
    root-level _CLAIM file keeps the number reserved through that
    window, so an interleaved begin can never re-claim it."""
    import shutil

    root = str(tmp_path / "root")
    v1 = init_index_root(spark, root)
    _write(spark, v1, [1])
    v2 = begin_index_version(spark, root)
    assert v2.endswith("v_000002")
    # the overwrite writer's delete phase: the claimed dir is GONE
    shutil.rmtree(v2)
    # a third claimer interleaving exactly here must skip to v3
    assert begin_index_version(spark, root).endswith("v_000003")
    # the in-flight writer completes its overwrite write and commits
    spark.createDataFrame([(1,), (2,)], "vec_id long").write.mode(
        "overwrite"
    ).parquet(v2)
    assert commit_index_version(spark, v2) == v2
    assert resolve_index_path(spark, root) == v2
    assert spark.read.parquet(resolve_index_path(spark, root)).count() == 2


def test_resolve_raises_on_staging_only_root(spark, tmp_path):
    """ADVICE r12 low: a versioned root whose only versions are
    uncommitted staging dirs must raise a descriptive error at resolve
    time, not an opaque schema-inference failure at scan time."""
    root = str(tmp_path / "root")
    staged = begin_index_version(spark, root)
    _write(spark, staged, [1])
    with pytest.raises(ValueError, match="no committed version"):
        resolve_index_path(spark, root)
    # committing makes the same root resolve normally
    commit_index_version(spark, staged)
    assert resolve_index_path(spark, root) == staged


def test_prune_clears_claim_records(spark, tmp_path):
    """prune removes the _CLAIM record with its version, and clears
    orphan claims (file, no dir) older than current — while leaving a
    newer in-flight claim alone."""
    import os

    root = str(tmp_path / "root")
    v1 = init_index_root(spark, root)
    _write(spark, v1, [1])
    v2 = begin_index_version(spark, root)
    _write(spark, v2, [1, 2])
    commit_index_version(spark, v2)
    # orphan OLD claim: simulate a pre-write crash at v_000001's era
    # by deleting v1's dir after prune marks it… instead craft directly:
    # prune removes v1 (keep=1) and must take _CLAIM_v_000002's sibling
    # records only when their versions go.
    v3 = begin_index_version(spark, root)  # in-flight, newer: kept
    out = prune_index_versions(spark, root, keep=1)
    assert v1 in out["removed"]
    names = set(os.listdir(root))
    # v2's claim record still present (v2 kept), v3's present (in flight)
    assert "_CLAIM_v_000002" in names and "_CLAIM_v_000003" in names
    # an abandoned orphan claim older than current is swept next prune
    os.remove(f"{root}/_CLAIM_v_000003")
    open(f"{root}/_CLAIM_v_000001", "w").close()
    import shutil

    shutil.rmtree(v3)
    prune_index_versions(spark, root, keep=1)
    assert "_CLAIM_v_000001" not in set(os.listdir(root))


def test_compaction_targets_current_version_of_root(spark, sf_dir, tmp_path):
    """compact_index_layout on a VERSIONED root compacts the current
    committed version in place (old versions are immutable history
    owned by prune), and the maintained-stream + compactor + resolve
    pipeline composes."""
    import shutil

    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        train_ivf_centroids,
    )
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_index_layout,
        run_ivf_maintenance_stream,
        write_arrival_waves,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(300)
    centroids = train_ivf_centroids(emb, n_centroids=4)
    root = str(tmp_path / "root")
    v1 = init_index_root(spark, root)
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    write_arrival_waves(emb, src, F.col("vec_id") % 3, 3)
    run_ivf_maintenance_stream(
        spark, src, centroids, root, ckpt, max_files_per_trigger=1
    )
    # wiped replay doubles the rows, same lineage
    shutil.rmtree(ckpt)
    run_ivf_maintenance_stream(
        spark, src, centroids, root, ckpt, max_files_per_trigger=1
    )
    stats = compact_index_layout(spark, root)
    assert stats["rows_after"] < stats["rows_before"]
    # compaction landed inside v1, not beside it
    assert resolve_index_path(spark, root) == v1
    led = spark.read.parquet(v1)
    assert led.count() == stats["rows_after"]
    assert led.count() == led.select("cluster", "vec_id").distinct().count()
