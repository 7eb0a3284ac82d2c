"""Versioned lake-table snapshots: CDC MERGE-apply, time travel, diff.

The reference pipeline lands CDC rows in ClickHouse and lets
ReplacingMergeTree collapse each key to its latest version at read
time (/root/reference/spark-jobs/cdc_processor.py:74-114, the
ReplacingMergeTree DDL in /root/reference/clickhouse/init.sql).  That
is a DATABASE-side merge.  At 100 TB the curated corpus lives on an
object store, not in a database — so the lake-side equivalent is a
MERGE INTO that maintains a deduplicated snapshot TABLE on parquet
with atomic, time-travelable commits.  This module is that operator,
built Spark-first on the repo's existing versioned-root commit
protocol (``operators/index_commit.py``: commit = ONE atomic
``_COMMITTED`` marker create; no rename, no read-window where nothing
is live).

Layout (copy-on-write at hash-bucket granularity)::

    root/
      _TABLE_META.json           (key cols, version col, num_buckets)
      _CLAIM_v_000002
      v_000001/  _COMMITTED  manifest/   (parquet: kbucket, relpath)
      v_000002/  ...
      data/
        v_000002/ kb=0/ kb=7/ ...        (files written BY v_000002)

- A snapshot version is its MANIFEST: (kbucket, relpath) rows naming
  the one data directory that holds each bucket's current rows.  A
  merge rewrites ONLY the buckets its change-batch touches and carries
  every other manifest row forward unchanged — cost is O(touched
  buckets), never O(table).  ``num_buckets`` is the scale knob: the
  fixture uses 16; a 100 TB table uses thousands, so a batch touching
  0.1% of keys rewrites ~0.1% of the data.
- Commit, claim arbitration, staging invisibility, and version GC are
  the index protocol's, unchanged.  ``prune_snapshot_versions``
  additionally sweeps ``data/v_*`` trees no kept manifest references.
- DELETEs are TOMBSTONES (``_deleted = true`` rows kept in the
  bucket): a replayed or late change with an older version number
  must LOSE to the delete, which requires the delete to stay
  observable.  ``read_snapshot`` filters them; ``vacuum_tombstones``
  below is the explicit GC (drop tombstones older than a version
  horizon — the same contract as every compactor here: run it only
  when no change older than the horizon can still arrive).

Merge semantics (the ReplacingMergeTree contract, made explicit):

- ``key_cols`` identify a row; ``version_col`` (monotone per key)
  arbitrates.  Highest version wins; on a version TIE the row already
  in the snapshot wins, so re-applying a batch is a byte-identical
  no-op (idempotent replay — the repo's standing ledger invariant).
- ``op_col`` holds the CDC op; rows whose op equals ``delete_op``
  tombstone the key, every other op upserts the payload.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from .index_commit import (
    _fs,
    _list_versions,
    begin_index_version,
    commit_index_version,
    current_index_version,
    init_index_root,
    prune_index_versions,
)

_META_FILE = "_TABLE_META.json"
_DELETED = "_deleted"
_KBUCKET = "kbucket"


def _manifest_df(spark: SparkSession, rows: list[tuple[int, str]]) -> DataFrame:
    """(kbucket, relpath) DataFrame from driver-side rows WITHOUT
    ``spark.createDataFrame(rows)``: on this Spark build, writing a
    Python-rows LocalRelation to parquet pays a ~4-6 s constant (vs
    0.2-0.7 s for a ``range``-derived plan — measured, PERF.md
    §Round-13), and a merge writes a manifest every call.  The
    literal-struct inline keeps the whole manifest in the query plan;
    rows are bounded by num_buckets, a table constant."""
    if not rows:
        return spark.range(0).select(
            F.col("id").cast("int").alias(_KBUCKET),
            F.lit("").alias("relpath"),
        )
    entries = F.array(
        *[
            F.struct(
                F.lit(int(b)).cast("int").alias(_KBUCKET),
                F.lit(p).alias("relpath"),
            )
            for b, p in rows
        ]
    )
    return spark.range(1).select(F.inline(entries))


def _read_meta(spark: SparkSession, root: str) -> dict:
    fs, _ = _fs(spark, root)
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/{_META_FILE}")
    if not fs.exists(path):
        raise ValueError(f"{root} is not a snapshot table (no {_META_FILE})")
    stream = fs.open(path)
    try:
        raw = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("utf-8")
    finally:
        stream.close()
    return json.loads(raw)


def _write_small_file(spark: SparkSession, path: str, payload: str) -> None:
    fs, hpath = _fs(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()


def init_snapshot_table(
    spark: SparkSession,
    root: str,
    *,
    key_cols: list[str],
    version_col: str,
    num_buckets: int = 16,
) -> str:
    """Create ``root`` as an EMPTY snapshot table: table meta + a
    committed ``v_000001`` whose manifest has zero rows.  Returns the
    live version path.  ``num_buckets`` is fixed for the table's
    lifetime (it defines the key→bucket hash); changing it means a
    full rewrite into a new root, exactly like re-bucketing a bucketed
    warehouse table."""
    live = init_index_root(spark, root)
    _write_small_file(
        spark,
        f"{root.rstrip('/')}/{_META_FILE}",
        json.dumps(
            {
                "key_cols": list(key_cols),
                "version_col": version_col,
                "num_buckets": int(num_buckets),
            }
        ),
    )
    # v_000001's manifest: an empty (kbucket, relpath) relation.  An
    # explicit empty parquet write (not a missing dir) so readers of
    # ANY committed version take one code path.
    _manifest_df(spark, []).coalesce(1).write.mode("overwrite").parquet(
        f"{live}/manifest"
    )
    return live


def _manifest(spark: SparkSession, version_path: str) -> DataFrame:
    return spark.read.parquet(f"{version_path}/manifest")


def _version_path(spark: SparkSession, root: str, version: int | None) -> str:
    """Committed version dir for ``version`` (None = current)."""
    if version is None:
        cur = current_index_version(spark, root)
        if cur is None:
            raise ValueError(f"{root} has no committed snapshot version")
        return cur
    for n, path, committed in _list_versions(spark, root):
        if n == version:
            if not committed:
                raise ValueError(
                    f"snapshot version {version} of {root} is an "
                    "uncommitted staging dir"
                )
            return path
    raise ValueError(f"{root} has no version {version}")


def _read_manifest_data(
    spark: SparkSession, root: str, manifest_rows: list, schema_hint: str | None
) -> DataFrame | None:
    """The union of the data dirs a manifest names, or None when the
    manifest is empty.  One ``spark.read.parquet(*paths)`` — every
    path is a leaf ``kb=N`` dir carrying identical schema (``kbucket``
    is stored as a REGULAR column inside the files; the ``kb=`` dir
    layer exists only so a merge can address one bucket's files), so
    no basePath/partition-discovery coupling across versions."""
    if not manifest_rows:
        return None
    paths = [f"{root.rstrip('/')}/{r['relpath']}" for r in manifest_rows]
    # mergeSchema: buckets written before a widening merge lack the new
    # columns; the union schema NULL-fills them (footer-only pass — the
    # standard price of parquet schema evolution, paid per manifest
    # read, never a data scan).
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def merge_apply(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    *,
    op_col: str = "op",
    delete_op: str = "d",
) -> str:
    """MERGE a CDC change batch into the snapshot table at ``root`` and
    commit the result as a new version; returns the new live path.

    Scale shape: the change batch is hashed to ``kbucket`` and ONLY
    the touched buckets are read back, collapsed, and rewritten — the
    untouched buckets' files are carried forward by manifest
    reference, never copied (asserted byte-identical in
    tests/test_snapshot.py).  The touched-bucket list is a bounded
    collect (≤ num_buckets integers, a table constant — never
    data-sized).  The collapse itself is one hash shuffle of
    (touched base ∪ changes) on the key — batch-plus-touched-sized,
    not table-sized."""
    meta = _read_meta(spark, root)
    key_cols, version_col, nbuckets = (
        meta["key_cols"],
        meta["version_col"],
        meta["num_buckets"],
    )
    payload_cols = [
        c for c in changes.columns if c not in (op_col, _KBUCKET, _DELETED)
    ]
    for k in (*key_cols, version_col):
        if k not in payload_cols:
            raise ValueError(f"changes is missing table column {k!r}")

    norm = changes.select(
        *[F.col(c) for c in payload_cols],
        (F.col(op_col) == F.lit(delete_op)).alias(_DELETED),
    ).withColumn(
        _KBUCKET,
        F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(nbuckets)).cast(
            "int"
        ),
    )

    # Bounded by num_buckets (table constant), not by batch size.
    touched = sorted(
        r[0] for r in norm.select(_KBUCKET).distinct().collect()
    )
    cur_path = _version_path(spark, root, None)
    manifest_rows = [r.asDict() for r in _manifest(spark, cur_path).collect()]
    touched_set = set(touched)
    base_rows = [r for r in manifest_rows if r[_KBUCKET] in touched_set]
    carry_rows = [r for r in manifest_rows if r[_KBUCKET] not in touched_set]

    base = _read_manifest_data(spark, root, base_rows, None)
    # Highest version wins; tie → the STORED row (_src 0 ranks before
    # the change's 1) so replaying an already-applied batch is a no-op.
    # allowMissingColumns widens the schema when a change batch adds a
    # column: stored rows read back as NULL for it (the b14 evolution
    # semantics, applied to the snapshot).
    stacked = norm.withColumn("_src", F.lit(1))
    if base is not None:
        stacked = base.withColumn("_src", F.lit(0)).unionByName(
            stacked, allowMissingColumns=True
        )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(),
        F.col("_src").asc(),
    )
    collapsed = (
        stacked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )

    staged = begin_index_version(spark, root)
    version_name = staged.rstrip("/").rsplit("/", 1)[-1]  # v_NNNNNN
    data_rel = f"data/{version_name}"
    out = collapsed.withColumn("kb", F.col(_KBUCKET))
    # One write job for all touched buckets; kb= dirs give the manifest
    # a per-bucket address while kbucket stays a regular column.
    out.repartition(max(len(touched), 1), _KBUCKET).write.partitionBy(
        "kb"
    ).mode("overwrite").parquet(f"{root.rstrip('/')}/{data_rel}")

    new_rows = [
        {_KBUCKET: b, "relpath": f"{data_rel}/kb={b}"} for b in touched
    ] + carry_rows
    _manifest_df(
        spark, [(r[_KBUCKET], r["relpath"]) for r in new_rows]
    ).coalesce(1).write.mode("overwrite").parquet(f"{staged}/manifest")
    return commit_index_version(spark, staged)


def read_snapshot(
    spark: SparkSession,
    root: str,
    *,
    version: int | None = None,
    include_tombstones: bool = False,
) -> DataFrame:
    """The snapshot relation at ``version`` (None = current) — time
    travel is just naming an older committed version; its manifest
    still references exactly the files that were live then (prune GC
    is the only thing that retires them)."""
    meta = _read_meta(spark, root)
    vpath = _version_path(spark, root, version)
    rows = [r.asDict() for r in _manifest(spark, vpath).collect()]
    df = _read_manifest_data(spark, root, rows, None)
    if df is None:
        raise ValueError(
            f"snapshot {root} version {version} is empty — no buckets "
            "have been written yet"
        )
    if not include_tombstones:
        df = df.filter(~F.col(_DELETED))
    return df


def snapshot_versions(spark: SparkSession, root: str) -> list[int]:
    """Committed version numbers, ascending."""
    return [n for n, _, ok in _list_versions(spark, root) if ok]


def snapshot_diff(
    spark: SparkSession,
    root: str,
    v_from: int,
    v_to: int,
) -> DataFrame:
    """Row-level diff between two committed versions: one row per key
    whose visible state changed, labeled ``change_type`` ∈
    {insert, delete, update}.  Tombstone-aware: a key visible at
    ``v_from`` and tombstoned at ``v_to`` is a delete.  The join is a
    key-hash shuffle of the two snapshots; at scale the manifests
    make a bucket-pruned variant trivial (join only buckets whose
    relpath differs between the versions — buckets carried forward
    untouched CANNOT contain a change), which we apply below so the
    diff cost tracks the CHANGED data, not the table."""
    meta = _read_meta(spark, root)
    key_cols, version_col = meta["key_cols"], meta["version_col"]
    pa = _version_path(spark, root, v_from)
    pb = _version_path(spark, root, v_to)
    rows_a = {r[_KBUCKET]: r["relpath"] for r in _manifest(spark, pa).collect()}
    rows_b = {r[_KBUCKET]: r["relpath"] for r in _manifest(spark, pb).collect()}
    changed = [
        b
        for b in set(rows_a) | set(rows_b)
        if rows_a.get(b) != rows_b.get(b)
    ]
    a = _read_manifest_data(
        spark, root, [{"relpath": rows_a[b]} for b in changed if b in rows_a], None
    )
    b = _read_manifest_data(
        spark, root, [{"relpath": rows_b[b]} for b in changed if b in rows_b], None
    )
    keyed = [F.col(k) for k in key_cols]
    if a is None and b is None:
        return spark.createDataFrame(
            [], "change_type STRING, " + ", ".join(f"{k} BIGINT" for k in key_cols)
        )

    def visible(df: DataFrame | None, side: str) -> DataFrame | None:
        if df is None:
            return None
        return df.filter(~F.col(_DELETED)).select(
            *keyed, F.col(version_col).alias(f"{side}_version")
        )

    va, vb = visible(a, "from"), visible(b, "to")
    if va is None:
        return vb.select(
            F.lit("insert").alias("change_type"), *key_cols
        )
    if vb is None:
        return va.select(
            F.lit("delete").alias("change_type"), *key_cols
        )
    joined = va.join(vb, on=key_cols, how="full_outer")
    return (
        joined.withColumn(
            "change_type",
            F.when(F.col("from_version").isNull(), F.lit("insert"))
            .when(F.col("to_version").isNull(), F.lit("delete"))
            .when(
                F.col("from_version") != F.col("to_version"), F.lit("update")
            ),
        )
        .filter(F.col("change_type").isNotNull())
        .select("change_type", *key_cols)
    )


def vacuum_tombstones(
    spark: SparkSession, root: str, *, below_version: int
) -> str:
    """Rewrite every bucket holding tombstones whose ``version_col`` <
    ``below_version`` with those rows dropped, committed as a new
    snapshot version.  Run only when no change older than the horizon
    can still arrive (the standing compactor contract) — after this,
    a replayed pre-horizon change would RESURRECT its key."""
    meta = _read_meta(spark, root)
    version_col = meta["version_col"]
    cur = _version_path(spark, root, None)
    rows = [r.asDict() for r in _manifest(spark, cur).collect()]
    df = _read_manifest_data(spark, root, rows, None)
    dead = F.col(_DELETED) & (F.col(version_col) < F.lit(below_version))
    if df is None:
        return cur
    hit = sorted(
        r[0]
        for r in df.filter(dead).select(_KBUCKET).distinct().collect()
    )
    if not hit:
        return cur
    hit_set = set(hit)
    keep_rows = [r for r in rows if r[_KBUCKET] not in hit_set]
    rewrite = _read_manifest_data(
        spark, root, [r for r in rows if r[_KBUCKET] in hit_set], None
    ).filter(~dead)
    staged = begin_index_version(spark, root)
    version_name = staged.rstrip("/").rsplit("/", 1)[-1]
    data_rel = f"data/{version_name}"
    rewrite.withColumn("kb", F.col(_KBUCKET)).repartition(
        max(len(hit), 1), _KBUCKET
    ).write.partitionBy("kb").mode("overwrite").parquet(
        f"{root.rstrip('/')}/{data_rel}"
    )
    # A bucket the vacuum emptied writes NO kb= dir; its manifest row
    # must simply disappear (a bucket absent from the manifest IS the
    # empty bucket).  Bounded collect, <= num_buckets ints.
    nonempty = {
        r[0] for r in rewrite.select(_KBUCKET).distinct().collect()
    }
    new_rows = [
        {_KBUCKET: b, "relpath": f"{data_rel}/kb={b}"}
        for b in hit
        if b in nonempty
    ] + keep_rows
    _manifest_df(
        spark, [(r[_KBUCKET], r["relpath"]) for r in new_rows]
    ).coalesce(1).write.mode("overwrite").parquet(f"{staged}/manifest")
    return commit_index_version(spark, staged)


def prune_snapshot_versions(
    spark: SparkSession, root: str, keep: int = 2
) -> dict:
    """Version GC + data GC.  Delegates version-dir retention to the
    index protocol's ``prune_index_versions`` (current always kept,
    staging newer than current left alone), then deletes every
    ``data/v_*`` tree that no SURVIVING manifest references — a data
    dir written by a pruned version can still be live if a later
    manifest carries its buckets forward, so referenced-set, not
    writer-version, decides."""
    result = prune_index_versions(spark, root, keep=keep)
    referenced: set[str] = set()
    for n, path, committed in _list_versions(spark, root):
        if not committed:
            continue
        for r in _manifest(spark, path).collect():
            # manifest names leaf kb= dirs; the GC unit is the version's
            # whole data tree (data/v_NNNNNN)
            referenced.add("/".join(r["relpath"].split("/")[:2]))
    fs, _ = _fs(spark, root)
    jvm = spark._jvm
    data_root = jvm.org.apache.hadoop.fs.Path(f"{root.rstrip('/')}/data")
    removed_data = []
    if fs.exists(data_root):
        for status in fs.listStatus(data_root):
            name = status.getPath().getName()
            if f"data/{name}" not in referenced:
                fs.delete(status.getPath(), True)
                removed_data.append(f"data/{name}")
    result["removed_data"] = sorted(removed_data)
    return result
