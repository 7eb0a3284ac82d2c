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


def _manifest_df(
    spark: SparkSession, rows: list[tuple[int, str, str]]
) -> DataFrame:
    """(kbucket, relpath, role) DataFrame from driver-side rows WITHOUT
    ``spark.createDataFrame(rows)``: on this Spark build, writing a
    Python-rows LocalRelation to parquet pays a ~4-6 s constant (vs
    0.2-0.7 s for a ``range``-derived plan — measured, PERF.md
    §Round-13), and a merge writes a manifest every call.  The
    literal-struct inline keeps the whole manifest in the query plan;
    rows are bounded by num_buckets × (1 + deltas-per-bucket), and
    deltas are folded by compaction — a bounded plan tree."""
    if not rows:
        return spark.range(0).select(
            F.col("id").cast("int").alias(_KBUCKET),
            F.lit("").alias("relpath"),
            F.lit("").alias("role"),
        )
    entries = F.array(
        *[
            F.struct(
                F.lit(int(b)).cast("int").alias(_KBUCKET),
                F.lit(p).alias("relpath"),
                F.lit(role).alias("role"),
            )
            for b, p, role in rows
        ]
    )
    return spark.range(1).select(F.inline(entries))


def _concurrent_snapshot_writes(*writes) -> None:
    """Run a merge's independent STAGED writes concurrently (guide
    §2.6): the data files and the manifest/schema land under
    uncommitted locations whose visibility is gated on the final
    atomic marker, so their relative completion order is irrelevant —
    a crash that finishes any subset leaves an invisible staging dir,
    exactly as with the old sequential order.  Exceptions propagate so
    a failed write still fails the merge (no marker is created)."""
    from concurrent.futures import ThreadPoolExecutor

    if len(writes) == 1:
        writes[0]()
        return
    with ThreadPoolExecutor(max_workers=len(writes)) as pool:
        futures = [pool.submit(w) for w in writes]
        for f in futures:
            f.result()


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


_SCHEMA_FILE = "_SCHEMA.json"


def _write_schema(spark: SparkSession, version_path: str, df: DataFrame) -> None:
    """Persist the version's data schema beside its manifest, so a
    version whose manifest is EMPTY (a vacuum emptied the table) still
    reads as an empty, correctly-typed relation instead of an error."""
    _write_small_file(
        spark, f"{version_path.rstrip('/')}/{_SCHEMA_FILE}", df.schema.json()
    )


def _read_schema(spark: SparkSession, version_path: str):
    from pyspark.sql import types as T

    fs, _ = _fs(spark, version_path)
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(
        f"{version_path.rstrip('/')}/{_SCHEMA_FILE}"
    )
    if not fs.exists(path):
        return None
    stream = fs.open(path)
    try:
        raw = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("utf-8")
    finally:
        stream.close()
    return T.StructType.fromJson(json.loads(raw))


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
    spark: SparkSession, root: str, manifest_rows: list
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


def _commit_from_parent(
    spark: SparkSession, root: str, staged: str, parent: str
) -> str:
    """Commit ``staged`` after verifying the table's current version is
    still the ``parent`` this writer merged against.  The table
    carries the repo's standing ONE-WRITER-PER-ROOT contract (same as
    every compactor and index rebuild here): the claim protocol
    prevents two writers from clobbering each other's FILES, but two
    concurrent merges would both base on the same parent manifest and
    the later commit would silently drop the earlier one's changes
    (lost update).  This check turns that silent loss into a loud
    error for everything but a commit racing inside the
    check-to-marker window — best-effort DETECTION under the serial
    contract, not serializability; a store with a conditional-PUT
    marker create could close the window."""
    now = current_index_version(spark, root)
    if now != parent:
        raise RuntimeError(
            f"merge conflict on {root}: merged against {parent} but the "
            f"current version is now {now} — another writer committed "
            "during this merge.  The table contract is one writer per "
            "root; re-run the merge against the new current version."
        )
    return commit_index_version(spark, staged)


def _collapse(df: DataFrame, key_cols, version_col: str) -> DataFrame:
    """Latest-wins collapse over stored rows: (version desc, upsert-
    over-delete) — the read-time half of the merge contract.  Exact
    duplicate (key, version) rows (MOR replay appends) carry identical
    payloads by contract, so the row_number pick is value-deterministic
    even where it is row-arbitrary."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(), F.col(_DELETED).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_apply(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    *,
    op_col: str = "op",
    delete_op: str = "d",
    mode: str = "cow",
) -> str:
    """MERGE a CDC change batch into the snapshot table at ``root`` and
    commit the result as a new version; returns the new live path.

    Two physical strategies, one logical contract:

    - ``mode="cow"`` (copy-on-write, default): touched buckets are
      read back, collapsed with the batch, and REWRITTEN; untouched
      buckets carry forward by manifest reference, never copied
      (asserted byte-identical in tests/test_snapshot.py).  Reads stay
      collapse-free.  Right for WIDE change waves, where the rewrite
      is mostly the batch itself.
    - ``mode="mor"`` (merge-on-read): the batch is APPENDED as
      bucket-partitioned delta files — cost is O(batch) regardless of
      table size — and readers collapse base ∪ deltas at read time
      (``_collapse``).  Right for NARROW scattered batches, where COW
      would rewrite ``min(num_buckets, batch_keys)`` buckets ≈ the
      whole table to change a handful of rows (hash bucketing spreads
      any scattered batch across every bucket — write amplification =
      table/batch).  ``compact_snapshot_deltas`` folds deltas back
      into their buckets; a COW merge of a bucket folds its deltas as
      a side effect.  The measured crossover is in PERF.md §Round-13.

    Column names ``kbucket`` and ``_deleted`` are RESERVED (the
    physical bucket id and tombstone flag); a change batch must not
    carry payload columns with those names.

    The touched-bucket list is a bounded collect (≤ num_buckets
    integers, a table constant — never data-sized).  The COW collapse
    is one hash shuffle of (touched base ∪ changes) on the key —
    batch-plus-touched-sized, not table-sized; the MOR append is
    shuffle-free beyond the batch's own bucket partitioning."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"merge_apply: unknown mode {mode!r}")
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

    if mode == "mor":
        staged = begin_index_version(spark, root)
        version_name = staged.rstrip("/").rsplit("/", 1)[-1]
        data_rel = f"data/{version_name}"
        new_rows = manifest_rows + [
            {_KBUCKET: b, "relpath": f"{data_rel}/kb={b}", "role": "delta"}
            for b in touched
        ]

        def _write_data() -> None:
            norm.withColumn("kb", F.col(_KBUCKET)).repartition(
                max(len(touched), 1), _KBUCKET
            ).write.partitionBy("kb").mode("overwrite").parquet(
                f"{root.rstrip('/')}/{data_rel}"
            )

        def _write_manifest() -> None:
            _manifest_df(
                spark,
                [(r[_KBUCKET], r["relpath"], r["role"]) for r in new_rows],
            ).coalesce(1).write.mode("overwrite").parquet(f"{staged}/manifest")
            _write_schema(spark, staged, norm)

        # The manifest names the data paths, not their contents, and
        # both land under UNCOMMITTED locations (visibility = the final
        # marker) — so the two write jobs are independent and overlap
        # (guide §2.6); a crash between them leaves an uncommitted
        # staging dir either way.
        _concurrent_snapshot_writes(_write_data, _write_manifest)
        return _commit_from_parent(spark, root, staged, cur_path)

    base_rows = [r for r in manifest_rows if r[_KBUCKET] in touched_set]
    carry_rows = [r for r in manifest_rows if r[_KBUCKET] not in touched_set]

    base = _read_manifest_data(spark, root, base_rows)
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
    # Tie order: upsert beats delete at the SAME version (the
    # golden-sequence semantics latest_state implements as sign desc,
    # tests/test_streaming.py GOLDEN key 4), THEN stored-first.
    # _deleted must rank BEFORE _src so the rule is order-independent:
    # if stored-first ranked higher, a delete+upsert pair sharing a
    # version would resolve differently depending on which arrived in
    # an earlier batch (stream != batch — caught by
    # test_merge_stream_multi_batch_equals_single_batch).  With this
    # order the winner is max(version, upsert-over-delete, stored) — a
    # commutative/associative choice, so any partitioning of the
    # delivery into batches converges to the same relation.  Two
    # same-version upserts with DIFFERENT payloads are outside the
    # contract ((key, version) determines the payload).
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(),
        F.col(_DELETED).asc(),
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
    new_rows = [
        {_KBUCKET: b, "relpath": f"{data_rel}/kb={b}", "role": "base"}
        for b in touched
    ] + carry_rows

    def _write_data() -> None:
        # One write job for all touched buckets; kb= dirs give the
        # manifest a per-bucket address while kbucket stays a regular
        # column.
        out.repartition(max(len(touched), 1), _KBUCKET).write.partitionBy(
            "kb"
        ).mode("overwrite").parquet(f"{root.rstrip('/')}/{data_rel}")

    def _write_manifest() -> None:
        _manifest_df(
            spark, [(r[_KBUCKET], r["relpath"], r["role"]) for r in new_rows]
        ).coalesce(1).write.mode("overwrite").parquet(f"{staged}/manifest")
        _write_schema(spark, staged, collapsed)

    # Independent uncommitted writes — overlap them (see the MOR arm).
    _concurrent_snapshot_writes(_write_data, _write_manifest)
    return _commit_from_parent(spark, root, staged, cur_path)


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
    df = _read_manifest_data(spark, root, rows)
    if df is None:
        schema = _read_schema(spark, vpath)
        if schema is None:
            raise ValueError(
                f"snapshot {root} version {version} is empty — no "
                "buckets have been written yet"
            )
        # table legitimately emptied (vacuum dropped the last rows):
        # an empty relation with the version's recorded schema
        return spark.createDataFrame([], schema)
    if any(r["role"] == "delta" for r in rows):
        # MOR read path: collapse base ∪ deltas per key.  Pure-COW
        # versions skip this — their reads stay shuffle-free, which is
        # the reason COW exists.
        df = _collapse(df, meta["key_cols"], meta["version_col"])
    if not include_tombstones:
        df = df.filter(~F.col(_DELETED))
    return df


def lookup_snapshot(
    spark: SparkSession,
    root: str,
    keys: list,
    *,
    version: int | None = None,
) -> DataFrame:
    """Point lookup: the visible rows for ``keys``, reading ONLY the
    buckets those keys hash to — the serving-path read.  The key →
    bucket hash is evaluated JVM-side on a literal relation (one tiny
    job, no table scan), the manifest is pruned to the hit buckets,
    and the scan's input files are exactly those buckets' files
    (asserted via ``inputFiles()`` in tests).  At 100 TB with
    thousands of buckets this is an O(keys/num_buckets · bucket_size)
    read, not a table scan.  ``keys``: scalars for a single-column
    key, tuples for a composite key."""
    meta = _read_meta(spark, root)
    key_cols, version_col, nbuckets = (
        meta["key_cols"],
        meta["version_col"],
        meta["num_buckets"],
    )
    if not keys:
        raise ValueError("lookup_snapshot: empty key list")
    tuples = [k if isinstance(k, tuple) else (k,) for k in keys]
    if any(len(t) != len(key_cols) for t in tuples):
        raise ValueError(
            f"lookup_snapshot: keys must have {len(key_cols)} column(s)"
        )
    vpath = _version_path(spark, root, version)
    # Key literals MUST carry the table's exact key types: xxhash64 is
    # type-sensitive (hash(13::int) != hash(13::bigint)), so an uncast
    # Python literal would probe the WRONG bucket.  The per-version
    # _SCHEMA.json records the stored types.
    schema = _read_schema(spark, vpath)
    key_type = {
        f.name: f.dataType.simpleString()
        for f in (schema.fields if schema is not None else [])
        if f.name in key_cols
    }

    def _key_lit(v, c):
        lit = F.lit(v)
        return (lit.cast(key_type[c]) if c in key_type else lit).alias(c)

    # literal key relation (the _manifest_df pattern — never
    # createDataFrame(python_rows) on a hot path)
    entries = F.array(
        *[
            F.struct(*[_key_lit(v, c) for v, c in zip(t, key_cols)])
            for t in tuples
        ]
    )
    key_df = spark.range(1).select(F.inline(entries))
    bucket_of = key_df.withColumn(
        _KBUCKET,
        F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(nbuckets)).cast(
            "int"
        ),
    )
    hit = {r[_KBUCKET] for r in bucket_of.select(_KBUCKET).distinct().collect()}
    rows = [
        r.asDict()
        for r in _manifest(spark, vpath).collect()
        if r[_KBUCKET] in hit
    ]
    df = _read_manifest_data(spark, root, rows)
    if df is None:
        schema = _read_schema(spark, vpath)
        if schema is None:
            raise ValueError(
                f"lookup_snapshot: {root} version {version} has no data"
            )
        return spark.createDataFrame([], schema).drop(_DELETED)
    df = df.join(F.broadcast(key_df), on=key_cols, how="left_semi")
    if any(r["role"] == "delta" for r in rows):
        df = _collapse(df, key_cols, version_col)
    return df.filter(~F.col(_DELETED))


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

    def by_bucket(vpath: str) -> dict[int, list[str]]:
        out: dict[int, list[str]] = {}
        for r in _manifest(spark, vpath).collect():
            out.setdefault(r[_KBUCKET], []).append(r["relpath"])
        return {b: sorted(ps) for b, ps in out.items()}

    rows_a, rows_b = by_bucket(pa), by_bucket(pb)
    changed = [
        b
        for b in set(rows_a) | set(rows_b)
        if rows_a.get(b) != rows_b.get(b)
    ]

    def side_df(rows: dict[int, list[str]]) -> DataFrame | None:
        sel = [
            {"relpath": p}
            for b in changed
            if b in rows
            for p in rows[b]
        ]
        return _read_manifest_data(spark, root, sel)

    a, b = side_df(rows_a), side_df(rows_b)
    keyed = [F.col(k) for k in key_cols]
    if a is None and b is None:
        # no bucket differs → empty diff, typed from the stored schema
        # (BIGINT fallback only for pre-schema-file versions)
        schema = _read_schema(spark, pb) or _read_schema(spark, pa)
        types = {
            f.name: f.dataType.simpleString()
            for f in (schema.fields if schema is not None else [])
        }
        cols = ", ".join(
            f"{k} {types.get(k, 'bigint').upper()}" for k in key_cols
        )
        return spark.createDataFrame([], f"change_type STRING, {cols}")

    def visible(df: DataFrame | None, side: str) -> DataFrame | None:
        if df is None:
            return None
        # collapse first: with MOR deltas a bucket holds superseded
        # versions and replay duplicates; the diff compares VISIBLE
        # states, not raw files
        df = _collapse(df, key_cols, version_col)
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


def change_data_feed(
    spark: SparkSession,
    root: str,
    v_from: int,
    v_to: int,
) -> DataFrame:
    """The CDC envelope BETWEEN two committed versions: one row per key
    whose visible state changed, carrying ``op`` (c/u/d) and the
    ``v_to``-side payload (NULL payload for deletes) — i.e. the change
    stream a DOWNSTREAM consumer would need to replicate the table
    from ``v_from`` to ``v_to``, re-derived from the snapshots
    themselves.  This closes the loop with the ingest side: a CDC
    stream merges INTO the table (run_cdc_merge_stream), and this
    feeds the same envelope shape OUT — Delta's change-data-feed
    semantics, computed bucket-pruned like ``snapshot_diff`` (only
    buckets whose manifest entries differ are read)."""
    meta = _read_meta(spark, root)
    key_cols, version_col = meta["key_cols"], meta["version_col"]
    diff = snapshot_diff(spark, root, v_from, v_to)
    to_state = read_snapshot(spark, root, version=v_to)
    op = (
        F.when(F.col("change_type") == "insert", F.lit("c"))
        .when(F.col("change_type") == "update", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    payload_cols = [
        c
        for c in to_state.columns
        if c not in (*key_cols, _KBUCKET, _DELETED)
    ]
    # deletes have no v_to-side payload: left join NULL-fills them
    return (
        diff.join(to_state.drop(_KBUCKET, _DELETED), on=key_cols, how="left")
        .select(op.alias("op"), *key_cols, *payload_cols)
    )


def vacuum_tombstones(
    spark: SparkSession, root: str, *, below_version: int
) -> str:
    """Rewrite every bucket holding tombstones whose ``version_col`` <
    ``below_version`` with those rows dropped, committed as a new
    snapshot version.  Run only when no change older than the horizon
    can still arrive (the standing compactor contract) — after this,
    a replayed pre-horizon change would RESURRECT its key.  The
    rewrite COLLAPSES first (a MOR bucket holds superseded versions;
    dropping a dead tombstone row file-wise while an older upsert of
    the same key survived in the base would resurrect the key), so a
    vacuumed bucket comes out compacted as a side effect."""
    meta = _read_meta(spark, root)
    version_col = meta["version_col"]
    cur = _version_path(spark, root, None)
    rows = [r.asDict() for r in _manifest(spark, cur).collect()]
    df = _read_manifest_data(spark, root, rows)
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
    rewrite = _collapse(
        _read_manifest_data(
            spark, root, [r for r in rows if r[_KBUCKET] in hit_set]
        ),
        meta["key_cols"],
        version_col,
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
        {_KBUCKET: b, "relpath": f"{data_rel}/kb={b}", "role": "base"}
        for b in hit
        if b in nonempty
    ] + keep_rows
    _manifest_df(
        spark, [(r[_KBUCKET], r["relpath"], r["role"]) for r in new_rows]
    ).coalesce(1).write.mode("overwrite").parquet(f"{staged}/manifest")
    _write_schema(spark, staged, rewrite)
    return _commit_from_parent(spark, root, staged, cur)


def compact_snapshot_deltas(spark: SparkSession, root: str) -> dict:
    """Fold every bucket's MOR delta files back into one base file set
    per bucket, committed as a new version — the maintenance half of
    ``mode="mor"``.  The visible relation is unchanged (collapse
    semantics are applied once, at compaction, instead of at every
    read); read-time collapse cost and manifest width return to the
    pure-COW floor.  Standing compactor contract: one maintenance
    writer per root between runs.  Returns {compacted_buckets,
    manifest_rows_before, manifest_rows_after} (no-op dict when there
    are no deltas)."""
    meta = _read_meta(spark, root)
    cur = _version_path(spark, root, None)
    rows = [r.asDict() for r in _manifest(spark, cur).collect()]
    hit = sorted({r[_KBUCKET] for r in rows if r["role"] == "delta"})
    if not hit:
        return {
            "compacted_buckets": 0,
            "manifest_rows_before": len(rows),
            "manifest_rows_after": len(rows),
        }
    hit_set = set(hit)
    keep_rows = [r for r in rows if r[_KBUCKET] not in hit_set]
    folded = _collapse(
        _read_manifest_data(
            spark, root, [r for r in rows if r[_KBUCKET] in hit_set]
        ),
        meta["key_cols"],
        meta["version_col"],
    )
    staged = begin_index_version(spark, root)
    version_name = staged.rstrip("/").rsplit("/", 1)[-1]
    data_rel = f"data/{version_name}"
    folded.withColumn("kb", F.col(_KBUCKET)).repartition(
        max(len(hit), 1), _KBUCKET
    ).write.partitionBy("kb").mode("overwrite").parquet(
        f"{root.rstrip('/')}/{data_rel}"
    )
    new_rows = [
        {_KBUCKET: b, "relpath": f"{data_rel}/kb={b}", "role": "base"}
        for b in hit
    ] + keep_rows
    _manifest_df(
        spark, [(r[_KBUCKET], r["relpath"], r["role"]) for r in new_rows]
    ).coalesce(1).write.mode("overwrite").parquet(f"{staged}/manifest")
    _write_schema(spark, staged, folded)
    _commit_from_parent(spark, root, staged, cur)
    return {
        "compacted_buckets": len(hit),
        "manifest_rows_before": len(rows),
        "manifest_rows_after": len(new_rows),
    }


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
