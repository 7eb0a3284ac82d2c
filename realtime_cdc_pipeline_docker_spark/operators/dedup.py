"""Deduplication operators for training-data pipelines (SURVEY §2.J1/J2).

Four families, all expressed as DataFrame transformations designed for
the 100 TB shape of the problem:

- **Exact** — hash the normalized text to a 32-byte digest and keep one
  row per digest.  Shuffling 32-byte keys instead of document bodies is
  the difference between a feasible and an infeasible job at scale.
- **MinHash + LSH** — char-shingle → k minhash values → band → bucket
  group-by pair generation.  Candidate generation is O(n) per band
  bucket instead of O(n²); only candidates pay exact-Jaccard
  verification.
- **SimHash** — 64-bit signature whose hamming distance approximates
  token-multiset similarity; banding the 64 bits into 4×16-bit keys
  finds all pairs within hamming≤3 without a cross join (pigeonhole:
  any pair differing in ≤3 bits agrees on ≥1 of 4 bands).
- **Embedding cosine** — see operators/similarity.py (random-hyperplane
  LSH buckets + in-bucket verification).

Execution shape: signatures are computed by **explode → whole-stage-
codegen hash aggregate**, not by higher-order array functions — Spark
evaluates HOF lambdas interpreted, per element, which measured ~30×
slower than the codegen aggregate on the same data (44 s → 1.5 s for
MinHash at sf0.1).  The explode never materializes: it pipelines into
the partial aggregate, and map-side combine keeps the shuffle at
|docs| × num_hashes longs.  No Python in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import spread, track_persisted
from ..functions import _affine_params, ws_tokens


def normalize_text(col="text") -> F.Column:
    """Canonical text form for dedup: lowercase, collapsed whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per exact (normalized) text.

    groupBy on sha2 digest → min(id): map-side combinable, tiny shuffle
    keys.  Returns (id_col, dup_count)."""
    return (
        df.groupBy(F.sha2(normalize_text(text_col), 256).alias("text_hash"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
        .select(id_col, "dup_count")
    )


def shingle_hashes(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """(id, h) character-k-shingle hash stream, fully codegen.

    Positions are exploded from a ``sequence`` and substring-hashed
    row-wise — no array materialization, no HOF lambdas; the explode
    pipelines straight into downstream partial aggregates, so this is a
    *stream*, not a materialized table (duplicate hashes are NOT removed
    here — min() is duplicate-insensitive and collect_set dedups inside
    the aggregate, both map-side, which keeps every shuffle at one row
    per doc instead of one per shingle).  Hashes are masked to 31 bits
    so affine MinHash products stay < 2^62 (no ANSI overflow).  A string
    shorter than ``k`` contributes its whole self as one shingle."""
    base = spread(
        df.select(F.col(id_col).alias("id"), normalize_text(text_col).alias("t"))
    )
    return (
        base.select(
            "id",
            "t",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.length("t") - (k - 1), F.lit(1)))
            ).alias("i"),
        )
        .select(
            "id",
            F.xxhash64(F.substring(F.col("t"), F.col("i"), k))
            .bitwiseAND(F.lit(0x7FFFFFFF))
            .alias("h"),
        )
    )


_MINHASH_AGGS: dict[int, list] = {}
_BAND_ARRAYS: dict[tuple[int, int], object] = {}
_CACHE_GATEWAY_KEY: list = []


def _fresh_column_caches() -> None:
    """Guard for the module-level Column caches (ADVICE r12 low):
    cached Columns wrap py4j handles tied to the live JVM gateway, so
    a SparkContext restarted in the same Python process would leave
    stale handles behind.  Key both caches to the active gateway and
    clear them when it changes — per-process memoization with
    per-JVM-lifetime validity."""
    from pyspark import SparkContext

    active = SparkContext._active_spark_context
    key = id(active._gateway) if active is not None else None
    if not _CACHE_GATEWAY_KEY or _CACHE_GATEWAY_KEY[0] != key:
        _MINHASH_AGGS.clear()
        _BAND_ARRAYS.clear()
        _CACHE_GATEWAY_KEY[:] = [key]


def minhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_hashes: int = 32,
) -> DataFrame:
    """Per-doc MinHash signature columns m0..m{n-1} plus the distinct
    shingle-hash fingerprint set — single explode, single map-side-
    combined aggregate, one small row per doc, persisted.  (a·h+b)
    mod p (p = 2³¹−1, prime) is a universal-hash permutation — the mod
    is load-bearing: without it the affine map is monotonic in h and
    every family member collapses to a function of min(h).  The
    ``num_hashes``-wide agg Column list is memoized per gateway
    (``_MINHASH_AGGS``) — streaming callers pay the py4j tree build
    once per process, not per micro-batch."""
    _fresh_column_caches()
    aggs = _MINHASH_AGGS.get(num_hashes)
    if aggs is None:
        params = _affine_params(num_hashes)
        p = F.lit((1 << 31) - 1)
        aggs = [F.collect_set("h").alias("hs")] + [
            F.min((F.col("h") * F.lit(a) + F.lit(b)) % p).alias(f"m{i}")
            for i, (a, b) in enumerate(params)
        ]
        _MINHASH_AGGS[num_hashes] = aggs
    sh = shingle_hashes(df, text_col, id_col, shingle_k)
    fp = sh.groupBy("id").agg(*aggs).persist()
    track_persisted(fp)
    return fp


def _banded(fp: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """Project the signature table to one (id, band_id, band_hash) row
    per band — pure projection, no shuffle.  The band struct array is
    memoized per (bands, rows_per_band), like the minhash aggs."""
    _fresh_column_caches()
    key = (bands, rows_per_band)
    band_arr = _BAND_ARRAYS.get(key)
    if band_arr is None:
        band_arr = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"m{i}").cast("string")
                                    for i in range(
                                        b * rows_per_band, (b + 1) * rows_per_band
                                    )
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band")
        _BAND_ARRAYS[key] = band_arr
    return fp.select("id", band_arr).select(
        "id", "band.band_id", "band.band_hash"
    )


def _bucket_sizes(banded: DataFrame) -> DataFrame:
    """Per-bucket member count ``(band_id, band_hash, __bsz)`` — one
    map-side-combinable aggregate over the banded projection."""
    return banded.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("__bsz")
    )


def _local_pairs(buckets: DataFrame, list_col: str) -> DataFrame:
    """Expand each row's array into ordered element pairs ``(a, b)``
    with ``a < b`` — the bucket-local combination step shared by the
    MinHash / SimHash / n-gram families.

    Positional over the ``array_sort``'d array: ``posexplode`` pins
    ``a`` at position ``i``, then ``explode(slice(arr, i+2, size))``
    emits every later element as ``b``.  Sorting first makes positional
    order coincide with value order, so ``a < b`` holds without a
    filter.  Peak memory per generated row is O(B) — one reference to
    the bucket array — never the O(B²) struct array that a
    ``flatten(transform(.., transform(..)))`` form materializes as a
    single value before explode (at the default simhash cap of 10 000
    that array would be ~10⁸ structs, multi-GB in one row).  The cap
    therefore bounds both output cardinality AND in-flight memory."""
    return (
        buckets.select(F.array_sort(F.col(list_col)).alias("__sorted"))
        .select("__sorted", F.posexplode("__sorted").alias("__pos", "a"))
        .select(
            "a",
            F.explode(
                F.slice("__sorted", F.col("__pos") + F.lit(2), F.size("__sorted"))
            ).alias("b"),
        )
    )


def _band_candidates(
    fp: DataFrame,
    bands: int,
    rows_per_band: int,
    max_bucket_size: int | None,
    banded: DataFrame | None = None,
    bucket_sizes: DataFrame | None = None,
) -> DataFrame:
    """Band the signature table and emit in-bucket candidate pairs
    (id_a < id_b), with the quadratic-bound bucket cap.

    ``banded`` / ``bucket_sizes`` let a caller that already built the
    banded projection or the per-bucket count table (``lsh_band_sweep``
    needs the counts for its ``oversized_buckets`` column) pass them in
    instead of re-aggregating the identical buckets here.

    Pair generation is a bucket-local GROUP BY, not a self-join:
    ``collect_list(id)`` per (band_id, band_hash) — buffer bounded by
    the pre-filtered ``max_bucket_size`` — then the positional O(B)-
    per-row expansion of ``_local_pairs``.  One shuffle of the banded
    table, co-partitioned by construction, no broadcast
    anywhere in the hot path.  The previous bucket SELF-join left the
    build-side choice to AQE, and at sf0.1 both sides' size estimates
    sit at ~9 MiB — right at the 10 MiB broadcast threshold — so a
    run-to-run stats race on the cached signature table flipped the
    build side and with it the downstream stage layout (the r6 j2
    bench bimodality: 2.6 s vs 6.1 s, event-log diagnosis in PERF.md).
    The grouped form has ONE plan at every scale: at 100 TB neither
    side of that join was broadcastable anyway, and the group-by needs
    no co-location guesswork."""
    if banded is None:
        banded = _banded(fp, bands, rows_per_band)

    if max_bucket_size is not None:
        # Keep only sane buckets BEFORE collecting them: the count
        # aggregate is map-side combinable (small), and pre-filtering
        # bounds the collect_list buffer below — a degenerate
        # boilerplate bucket must never materialize as one giant array.
        if bucket_sizes is None:
            bucket_sizes = _bucket_sizes(banded)
        ok = bucket_sizes.filter(F.col("__bsz") <= max_bucket_size).select(
            "band_id", "band_hash"
        )
        banded = banded.join(ok, ["band_id", "band_hash"])

    buckets = banded.groupBy("band_id", "band_hash").agg(
        F.collect_list("id").alias("ids")
    )
    return (
        _local_pairs(buckets, "ids")
        .select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .distinct()
    )


def lsh_band_sweep(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_hashes: int = 32,
    band_options: tuple[int, ...] = (4, 8, 16),
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
    sample_fraction: float = 1.0,
    max_docs: int | None = 100_000,
) -> DataFrame:
    """LSH banding-parameter sweep — the tuning table a dedup config
    change reads BEFORE committing a 100 TB run: for each band layout
    (bands × rows-per-band over the SAME signature width), the
    candidate-pair count, the count surviving exact-Jaccard
    verification at ``jaccard_threshold``, and precision in ppm.

    The sweep's 100 TB contract is that it runs on a corpus SAMPLE —
    the S-curve estimate needs ~10⁴–10⁵ docs for tight confidence
    intervals, and exact verification of a full corpus's candidates is
    the very cost the tuning is meant to avoid.  The contract is CODE,
    not prose (VERDICT r9 #4): ``sample_fraction`` keeps each doc iff
    a salted hash of its id falls under the fraction (deterministic,
    engine-reproducible, no ordering dependence), ``max_docs``
    hard-caps the swept set at the docs with the smallest salted hash
    (a uniform deterministic subset via one TakeOrderedAndProject over
    the id column — top-k per partition then merge, never a global
    sort), and the ``sampled_docs`` output column reports the count
    actually swept so a mis-pointed run is observable in the result
    table itself.  ``max_docs=None`` with ``sample_fraction=1.0`` is
    the explicit full-corpus opt-out for small fixtures.

    More, shorter bands → looser S-curve → more candidates (recall ↑,
    precision ↓): candidates and verified counts are monotone
    non-decreasing in ``bands`` (superset property, pinned by test)
    — PROVIDED no bucket exceeds ``max_bucket_size`` at the finer
    layout.  Finer layouts hash fewer signature rows per band, so
    buckets are denser, and the cap can drop a bucket at 16×2 whose
    pairs survived at 4×8, breaking the superset property on
    degenerate corpora.  The per-layout ``oversized_buckets`` column
    makes that observable: monotonicity is guaranteed whenever it is
    0 for every layout.  The signature/fingerprint table is computed ONCE
    (``minhash_fingerprints``) and re-banded per config — re-banding
    is a projection of the signature columns, so the sweep costs one
    corpus pass plus |configs| small candidate joins, NOT |configs|
    corpus passes.  Returns one row per config."""
    for b in band_options:
        if num_hashes % b:
            raise ValueError(f"bands={b} does not divide num_hashes={num_hashes}")
    if not (0.0 < sample_fraction <= 1.0):
        raise ValueError(f"sample_fraction={sample_fraction} outside (0, 1]")
    if sample_fraction < 1.0:
        # Deterministic Bernoulli sample on a SALTED id hash: the salt
        # decorrelates the keep decision from every other xxhash64 use
        # of the same ids (banding, bucketing); pmod keeps it in
        # [0, 1e6) regardless of sign.
        df = df.filter(
            F.pmod(F.xxhash64(F.col(id_col), F.lit("band_sweep")), F.lit(1_000_000))
            < int(sample_fraction * 1_000_000)
        )
    if max_docs is not None:
        # The cap is the docs with the SMALLEST salted hash — uniform,
        # deterministic, order-independent.  orderBy+limit over the id
        # projection plans as TakeOrderedAndProject; the ≤max_docs id
        # list then broadcast-joins back (ids only, bounded by the cap).
        keep = (
            df.select(
                F.col(id_col),
                F.xxhash64(F.col(id_col), F.lit("sweep_cap")).alias("__ord"),
            )
            .orderBy("__ord")
            .limit(max_docs)
            .select(id_col)
        )
        df = df.join(F.broadcast(keep), id_col)
    fp = minhash_fingerprints(df, text_col, id_col, shingle_k, num_hashes)
    sampled_docs = fp.agg(F.count(F.lit(1)).alias("sampled_docs"))
    sides = fp.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"))
    sides_b = fp.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
    stats = None
    for bands in band_options:
        banded = _banded(fp, bands, num_hashes // bands)
        if max_bucket_size is None:
            oversized = None
            sizes = None
        else:
            # ONE bucket-count aggregate per layout, persisted (it is
            # |buckets| small rows): the oversized_buckets column and
            # the candidate join's cap filter both read it, instead of
            # re-banding and re-counting the identical buckets twice.
            sizes = track_persisted(_bucket_sizes(banded).persist())
            oversized = sizes.filter(F.col("__bsz") > max_bucket_size).agg(
                F.count(F.lit(1)).alias("oversized_buckets")
            )
        cand = _band_candidates(
            fp,
            bands,
            num_hashes // bands,
            max_bucket_size,
            banded=banded,
            bucket_sizes=sizes,
        )
        verified = (
            cand.join(sides, "id_a")
            .join(sides_b, "id_b")
            .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
            .withColumn(
                "jaccard",
                F.col("inter").cast("double")
                / (F.size("hs_a") + F.size("hs_b") - F.col("inter")),
            )
            .agg(
                F.count(F.lit(1)).alias("n_candidates"),
                F.sum(
                    (F.col("jaccard") >= jaccard_threshold).cast("long")
                ).alias("n_verified"),
            )
            .select(
                F.lit(bands).cast("long").alias("bands"),
                F.lit(num_hashes // bands).cast("long").alias("rows_per_band"),
                F.coalesce(F.col("n_candidates"), F.lit(0)).alias("n_candidates"),
                F.coalesce(F.col("n_verified"), F.lit(0)).alias("n_verified"),
                F.expr(
                    "CASE WHEN n_candidates = 0 THEN 0 "
                    "ELSE div(1000000 * n_verified, n_candidates) END"
                ).alias("precision_ppm"),
            )
        )
        if oversized is None:
            verified = verified.withColumn(
                "oversized_buckets", F.lit(0).cast("long")
            )
        else:
            verified = verified.crossJoin(oversized)
        stats = verified if stats is None else stats.unionByName(verified)
    # One 1-row count over the persisted signature table, stamped on
    # every layout row: the observable witness of the sample contract.
    return stats.crossJoin(sampled_docs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH + exact-Jaccard verification.

    rows_per_band = num_hashes/bands controls the S-curve: with 8 bands
    of 4 rows, pairs at Jaccard ~0.5 have ~90% collision probability.
    Returns (id_a, id_b, jaccard) with id_a < id_b.

    Plan shape (all codegen, three shuffles minimum for the semantics):
    1. shingle explode → distinct (id, h)           [shuffle on (id,h)]
    2. hash-aggregate 32 affine minima per id       [map-side combined]
       → band hashes → bucket group-by pair-gen     [shuffle on band key]
    3. candidate pairs → shared-shingle counting
       join for exact Jaccard                       [shuffle on id]

    Scale: band-bucket keys are (band_id, 8-byte hash); a bucket with B
    docs yields B² candidates, so ``max_bucket_size`` drops buckets
    larger than the cap before pair generation — *the* guard against
    web-corpus degeneracy (boilerplate pages put thousands of docs in
    one bucket and make pair expansion quadratic).  Members of a dropped
    bucket keep their other bands; clusters big enough to overflow every
    band are near-identical boilerplate that ``dedup_exact`` catches
    first (run it upstream — that is the documented contract).  The
    default cap is far above any honest bucket (collisions of
    *dissimilar* docs on 4 concatenated minhashes are ~impossible), so
    it only fires on degenerate data; ``None`` disables.
    """
    rows_per_band = num_hashes // bands

    # 1+2. One pass over the shingle-hash stream computes BOTH the
    # 32-column MinHash signature and the distinct-hash fingerprint set
    # per doc (``minhash_fingerprints``).  The result is |docs| small
    # rows: persist it (at 100 TB this is the signature table you write
    # at ingest — and the table ``lsh_band_sweep`` re-bands without
    # recomputing).
    fp = minhash_fingerprints(df, text_col, id_col, shingle_k, num_hashes)
    candidates = _band_candidates(fp, bands, rows_per_band, max_bucket_size)

    # 3. Exact Jaccard on candidates via the per-doc fingerprint arrays
    # already in ``fp``: joined to each candidate side, verified with a
    # single array_intersect pass per pair.  This moves one fingerprint
    # row per doc + 2 per candidate — versus the exploded counting-join
    # alternative, which materializes |candidates|·|shingles| rows
    # (measured 12M intermediate rows on 84k candidates).  AQE
    # broadcasts the fingerprint side when small.
    return (
        candidates.join(
            fp.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a"
        )
        .join(fp.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("hs_a", "hs_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("hs_a") + F.size("hs_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def portable_token_hash(col) -> F.Column:
    """60-bit token hash computable identically in Spark and DuckDB:
    first 15 hex chars of md5, parsed base-16.  Used when a cross-engine
    oracle must recompute signatures; xxhash64 is the faster default."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_hash: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per document as (id, sim) — codegen aggregate form.

    Explode the token multiset (duplicates count, per SimHash), hash each
    token once, then one hash-aggregate with 64 ±1-vote sums; the final
    sign-collapse to a long is a flat 64-term bitwise expression.
    ``token_hash="md5"`` switches to the engine-portable hash (see
    ``portable_token_hash``) so SQL oracles can recompute signatures."""
    tok = F.col("tok")
    hashed = portable_token_hash(tok) if token_hash == "md5" else F.xxhash64(tok)
    toks = spread(
        df.select(
            F.col(id_col).alias("id"),
            F.explode(ws_tokens(normalize_text(text_col))).alias("tok"),
        )
    ).select("id", hashed.alias("h"))
    votes = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for j in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.col(f"v{j}") > 0,
                F.lit(1 << j if j < 63 else -(1 << 63)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("id", sig.alias("sim"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    token_hash: str = "xxhash64",
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate pairs via 64-bit SimHash with 4×16-bit banding.

    Any pair with hamming ≤ 3 shares at least one exact 16-bit band
    (pigeonhole over 4 bands), so banding finds every such pair without
    a cross join; candidates are verified with an exact popcount.
    Returns (id_a, id_b, hamming).

    ``max_bucket_size`` bounds pair generation: 16-bit bands have only
    65 536 values, so at corpus scale a band bucket holds ~n/65 536
    *dissimilar* docs by chance alone, plus any boilerplate cluster.
    Dropping an over-cap bucket weakens the pigeonhole guarantee only
    for pairs whose sole agreeing band overflowed — boilerplate that
    exact dedup should have removed upstream.  ``None`` disables."""
    from ..functions import hamming64

    sigs = track_persisted(simhash_signatures(df, text_col, id_col, token_hash).persist())
    banded = sigs.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftrightunsigned(F.col("sim"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("band"),
    ).select("id", "sim", "band.band_id", "band.band_val")

    if max_bucket_size is not None:
        ok = (
            banded.groupBy("band_id", "band_val")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .filter(F.col("__bsz") <= max_bucket_size)
            .select("band_id", "band_val")
        )
        banded = banded.join(ok, ["band_id", "band_val"])

    # Bucket-local group-by pair generation (same shape and rationale
    # as _band_candidates: one banded shuffle, collect_list bounded by
    # the pre-filtered cap, no broadcast-vs-shuffle decision for AQE
    # to flip at a size-estimate edge).  _local_pairs keeps per-row
    # memory O(B): array_sort on (id, sim) structs orders by id first
    # (ids unique per bucket), so positional pairs satisfy id_a < id_b.
    buckets = banded.groupBy("band_id", "band_val").agg(
        F.collect_list(F.struct("id", "sim")).alias("rows")
    )
    candidates = (
        _local_pairs(buckets, "rows")
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
        .distinct()
    )
    return (
        candidates.withColumn("hamming", hamming64("sim_a", "sim_b"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    jaccard_threshold: float = 0.5,
    max_gram_df: int | None = 1000,
) -> DataFrame:
    """Word n-gram Jaccard near-dup via inverted-index join.

    N-grams are built codegen-style: explode token positions from a
    ``sequence``, window the token array with ``slice`` once per
    position, hash.  The inverted index joins on the n-gram hash, counts
    co-occurrences per pair, and computes |A∩B| / (|A|+|B|-|A∩B|) —
    never materializes the O(n²) pair space, only pairs sharing ≥1
    n-gram.

    ``max_gram_df`` drops stop-grams — n-grams occurring in more than
    that many documents — from the index before the join.  A gram with
    document frequency d contributes d² join rows, so one boilerplate
    phrase ("all rights reserved …") makes the join quadratic at corpus
    scale; dropping it bounds every gram's contribution.  Sizes and
    intersections are both computed over the filtered gram universe, so
    jaccard stays a true Jaccard — of the informative grams (pairs
    similar ONLY via boilerplate stop-grams intentionally don't pair).
    The default is inactive on non-degenerate corpora; ``None``
    disables."""
    toks = spread(
        df.select(
            F.col(id_col).alias("id"), ws_tokens(normalize_text(text_col)).alias("toks")
        ).filter(F.size("toks") >= n)
    )
    inv = (
        toks.select(
            "id",
            "toks",
            F.explode(F.sequence(F.lit(1), F.size("toks") - (n - 1))).alias("i"),
        )
        .select(
            "id",
            F.xxhash64(F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), n))).alias(
                "gram"
            ),
        )
        .distinct()
        .persist()  # feeds the df-count, sizes, and both join sides
    )
    track_persisted(inv)
    if max_gram_df is not None:
        # Document frequency per gram (map-side combinable) → keep the
        # informative grams.  The join is on the same gram key the
        # pair-generation group-by shuffles on, and reads the cached
        # index, not the shingle explode.
        keep = (
            inv.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_gram_df)
            .select("gram")
        )
        inv = inv.join(keep, "gram")
    sizes = inv.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))

    # Gram-local group-by pair generation (same shape and rationale as
    # _band_candidates: the df-cap prefilter bounds collect_list, one
    # gram-keyed shuffle replaces the inverted-index self-join, and no
    # join-strategy decision is left for AQE to flip run-to-run).
    per_gram = inv.groupBy("gram").agg(F.collect_list("id").alias("ids"))
    co = (
        _local_pairs(per_gram, "ids")
        .groupBy(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        co.join(sizes.select(F.col("id").alias("id_a"), F.col("n_grams").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_grams").alias("nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def prepare_benchmark_grams(
    benchmark: DataFrame, text_col: str = "text", n: int = 5
) -> tuple[DataFrame, list[int]]:
    """Precompute what ``decontaminate`` needs from the EVAL side —
    the distinct gram-hash set (persisted) and the short-doc window
    sizes (a driver collect of < n integers) — so a streaming gate
    builds them ONCE per lineage instead of re-running the benchmark
    subtree and its driver job every micro-batch (the gate is called
    per batch in run_decontaminate_stream / run_curation_pipeline_
    stream; a production deployment snapshots this per suite RELEASE).
    Caller owns the persist: unpersist the returned frame when the
    lineage ends."""
    bench_toks = benchmark.select(
        ws_tokens(normalize_text(text_col)).alias("toks")
    )
    short = bench_toks.filter((F.size("toks") > 0) & (F.size("toks") < n))
    grams = (
        _gram_windows(benchmark, F.lit(0), n, text_col)
        .select("gram")
        .unionByName(
            short.select(F.xxhash64(F.concat_ws(" ", "toks")).alias("gram"))
        )
        .distinct()
        .persist()
    )
    grams.count()
    short_sizes = sorted(
        r[0]
        for r in short.select(F.size("toks").alias("m")).distinct().collect()
    )
    return grams, short_sizes


def _gram_windows(df: DataFrame, id_expr, size, text_col: str) -> DataFrame:
    """All ``size``-token sliding-window gram hashes per row (shared by
    ``decontaminate`` and ``prepare_benchmark_grams``)."""
    toks = df.select(
        id_expr.alias("id"),
        ws_tokens(normalize_text(text_col)).alias("toks"),
    ).filter(F.size("toks") >= size)
    return toks.select(
        "id",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (size - 1))).alias("i"),
        "toks",
    ).select(
        "id",
        F.xxhash64(
            F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), size))
        ).alias("gram"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_overlaps: int = 1,
    prepared: tuple[DataFrame, list[int]] | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs that share ≥
    ``min_overlaps`` distinct word ``n``-grams with ANY benchmark/eval
    document (the overlap check every training-data pipeline runs before
    a model sees the corpus — cf. the 13-gram collision rule popularized
    by the GPT-3 and PaLM data cards).

    Returns one row per contaminated doc: ``(doc_id,
    n_contaminated_grams)`` where the count is over DISTINCT offending
    grams in that doc.

    Short eval items are NOT silently excluded: a benchmark doc with
    fewer than ``n`` tokens contributes its whole normalized text as one
    gram (the GPT-3 data card's min(13, len)-gram rule, mirroring
    ``shingle_hashes``), and the corpus side additionally emits sliding
    windows of exactly those short lengths — driven by the benchmark,
    so when no short eval docs exist (the common case) the corpus does
    one n-gram pass and nothing more.  NOTE: discovering those lengths
    is a driver-side ``collect`` of at most ``n``−1 integers from the
    eval side, which makes *constructing* this DataFrame run one small
    eager Spark job over the (tiny, broadcastable) benchmark — plan
    construction is not fully lazy here, by design.

    100 TB shape: the benchmark side is small by nature (eval suites are
    thousands of documents, not billions), so its distinct gram-hash set
    is built first and **broadcast** — the corpus side then streams
    through a broadcast hash join with NO shuffle of corpus grams (no
    pre-join ``.distinct()``: de-duplication happens AFTER the join via
    ``count_distinct``, where cardinality is contaminated-grams-only —
    tests/test_dedup.py asserts the corpus subtree is exchange-free).
    The benchmark side needs no id column at all.  Gram keys are 8-byte
    xxhash64 values, never gram text.  ``prepared`` takes a
    ``prepare_benchmark_grams`` result so micro-batch callers pay the
    eval-side build (and its driver job) once per lineage.
    """
    if prepared is not None:
        bench_grams, short_sizes = prepared
    else:
        # Benchmark grams: n-token windows, plus whole-text grams for
        # sub-n-token docs.  Tiny by nature → distinct is cheap; the
        # short-size discovery is a driver-side collect of at most
        # n-1 integers from the (small, broadcastable) eval side.
        bench_toks = benchmark.select(
            ws_tokens(normalize_text(text_col)).alias("toks")
        )
        short = bench_toks.filter((F.size("toks") > 0) & (F.size("toks") < n))
        bench_grams = (
            _gram_windows(benchmark, F.lit(0), n, text_col)
            .select("gram")
            .unionByName(
                short.select(F.xxhash64(F.concat_ws(" ", "toks")).alias("gram"))
            )
            .distinct()
        )
        short_sizes = sorted(
            r[0]
            for r in short.select(F.size("toks").alias("m")).distinct().collect()
        )

    corpus_grams = _gram_windows(corpus, F.col(id_col), n, text_col)
    for m in short_sizes:
        corpus_grams = corpus_grams.unionByName(
            _gram_windows(corpus, F.col(id_col), m, text_col)
        )

    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(F.col("id").alias(id_col))
        .agg(F.count_distinct("gram").alias("n_contaminated_grams"))
        .filter(F.col("n_contaminated_grams") >= min_overlaps)
    )


def connected_components(
    pairs: DataFrame,
    max_iters: int = 10,
    a_col: str = "id_a",
    b_col: str = "id_b",
    stats: dict | None = None,
) -> DataFrame:
    """Connected components of the near-duplicate pair graph by
    min-label propagation: every node repeatedly adopts the smallest
    label reachable over an edge, converging in O(component diameter)
    rounds.  Near-dup components are shallow (chains of a few edits), so
    the loop exits early via a per-round convergence check.

    Returns (id, component) with component = min node id in the
    component.  Scale shape: each round is one join + one min-aggregate,
    both on the node id — the standard large-graph CC pattern (a full
    GraphX/Pregel run would converge identically; this stays pure
    DataFrame).  The convergence check is FUSED into the propagation
    aggregate (the previous label is carried through the union and
    recovered with min(); changes are counted by scanning the
    checkpointed result) — no per-round join against the previous
    label table.  Each round ends in ``localCheckpoint``: persist alone
    caches *execution* but the logical plan still doubles per round (the
    union refers to the previous labels twice), so any deep iteration
    OOMs the driver on plan construction — checkpointing truncates the
    lineage to the materialized result.  (On a real cluster prefer
    ``checkpoint()`` to reliable storage: localCheckpoint blocks die
    with an executor.)

    ``max_iters`` is a safety bound, not a silent truncation: if the
    per-round convergence check still sees label changes after
    ``max_iters`` rounds (a component with diameter > max_iters),
    this RAISES rather than return labels that would split one
    component into several keepers.

    ``stats``, if given, receives ``{"rounds": N}`` — the number of
    propagation rounds actually executed (scale probes assert near-dup
    graphs converge in a handful of rounds; see
    ``scripts/scale_probe.py``).
    """
    # Both edge orientations from ONE pass over pairs: a union of
    # pairs-with-itself-reversed would put the pairs subtree in the DAG
    # twice, and Spark re-executes duplicated subtrees (no cross-branch
    # CSE) — for LSH-generated pairs that doubles the dominant cost of
    # the whole keeper pipeline.  explode keeps a single pairs scan.
    pre = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(a_col).alias("src"), F.col(b_col).alias("dst")),
                    F.struct(F.col(b_col).alias("src"), F.col(a_col).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .persist()
    )
    # Row-count-sized layout for the table every round probes — the
    # e18 lesson (operators/graph.py:EDGE_ROWS_PER_PARTITION): near-dup
    # pair graphs are typically tiny next to the corpus, and inheriting
    # the distinct shuffle's full width makes each propagation round
    # pay per-task scheduling for near-empty partitions.  On a big
    # graph the defaultParallelism cap binds and nothing changes.
    from .graph import EDGE_ROWS_PER_PARTITION

    n_edges = pre.count()
    spark = pairs.sparkSession
    nparts = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            -(-n_edges // EDGE_ROWS_PER_PARTITION),
        ),
    )
    edges = pre.repartition(nparts, "src").persist()
    # ``pre`` exists only to size and feed this one repartition;
    # materialize ``edges`` eagerly and drop ``pre`` NOW — keeping
    # both cached for the whole propagation loop doubles cache memory
    # on large pair graphs (ADVICE r8).
    edges.count()
    pre.unpersist()
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    changed = -1
    rounds = 0
    label_type = dict(labels.dtypes)["component"]
    for _ in range(max_iters):
        rounds += 1
        msgs = edges.join(
            labels.withColumnRenamed("id", "src"), "src"
        ).select(
            F.col("dst").alias("id"),
            "component",
            F.lit(None).cast(label_type).alias("__prev"),
        )
        # The previous label rides through the SAME min-aggregate that
        # produces the new labels (each id contributes exactly one
        # non-null __prev row, so min() recovers it) — convergence is
        # then a null-safe scan of the just-checkpointed result, NOT a
        # second join against the old label table.  One label-table
        # pass per round instead of two; at 100 TB the removed pass is
        # a full shuffle join per round.
        new_labels = (
            labels.withColumn("__prev", F.col("component"))
            .unionByName(msgs)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.min("__prev").alias("__prev"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(
            F.expr("NOT (component <=> __prev)")
        ).count()
        labels = new_labels.drop("__prev")
        if changed == 0:
            break
    edges.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge within max_iters={max_iters} "
            f"({changed} labels still changing); a component's diameter exceeds "
            f"the bound — raise max_iters rather than emit split components"
        )
    return labels


def dedup_keepers(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Resolve near-dup pairs to a keep/drop decision per document:
    cluster pairs into components, keep the min-id doc per component;
    documents in no pair keep themselves.  Returns
    (id_col, keeper, is_keeper) for every input document."""
    comp = connected_components(pairs)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comp, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("component", "id").alias("keeper"),
            (F.coalesce("component", "id") == F.col("id")).alias("is_keeper"),
        )
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    n: int = 5,
) -> DataFrame:
    """Per-benchmark-document contamination attribution: for each eval
    doc, how many *other* corpus docs share at least one word
    ``n``-gram with it, and over how many distinct grams.  This is the
    report a decontamination run ships to the eval owners —
    ``decontaminate`` answers "which corpus docs must go", this answers
    "which benchmarks are compromised, and how badly".

    Returns ``(bench_id, n_contaminated_docs, n_shared_grams)`` —
    eval docs with zero external overlap emit no row.  Corpus rows
    whose id equals the bench id are excluded (when the eval set is
    carved from the corpus, every doc trivially matches itself).

    Contract: benchmark docs shorter than ``n`` tokens are out of scope
    here (they contribute no gram; ``decontaminate`` handles them via
    the min(n,len) rule — this report keys on *attributable* n-gram
    evidence only).

    100 TB shape: identical to ``decontaminate`` — the (bench_id, gram)
    set is small by nature, deduplicated and **broadcast**; corpus
    grams stream through the broadcast join with NO shuffle of the
    corpus subtree.  The only exchange is the final groupBy on
    bench_id (post-join cardinality: contaminated evidence only).
    Gram keys are 8-byte xxhash64 values, never gram text."""
    def grams(df: DataFrame, id_expr) -> DataFrame:
        toks = df.select(
            id_expr.alias("id"),
            ws_tokens(normalize_text(text_col)).alias("toks"),
        ).filter(F.size("toks") >= n)
        return toks.select(
            "id",
            F.explode(F.sequence(F.lit(1), F.size("toks") - (n - 1))).alias("i"),
            "toks",
        ).select(
            "id",
            F.xxhash64(
                F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), n))
            ).alias("gram"),
        )

    bench_grams = (
        grams(benchmark, F.col(bench_id_col))
        .select(F.col("id").alias(bench_id_col), "gram")
        .distinct()
    )
    corpus_grams = grams(corpus, F.col(id_col))
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .filter(F.col("id") != F.col(bench_id_col))
        .groupBy(bench_id_col)
        .agg(
            F.count_distinct("id").alias("n_contaminated_docs"),
            F.count_distinct("gram").alias("n_shared_grams"),
        )
    )


def _deletion_variant_keys(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, txt, v) rows: each string keyed by itself plus every
    single-character deletion variant (the SymSpell candidate keys)."""
    c = F.col(text_col)
    i_minus = lambda i: c.substr(F.lit(1), i - F.lit(1))  # noqa: E731
    i_plus = lambda i: c.substr(i + F.lit(1), F.length(c))  # noqa: E731
    variants = F.transform(
        F.sequence(F.lit(0), F.length(c)),
        lambda i: F.when(i == F.lit(0), c).otherwise(
            F.concat(i_minus(i), i_plus(i))
        ),
    )
    return df.select(
        F.col(id_col).alias("id"), c.alias("txt"), F.explode(variants).alias("v")
    ).distinct()  # a string can emit the same variant twice (equal chars)


def oversized_variant_buckets(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """The buckets ``fuzzy_neardup_pairs`` SKIPS under its cap:
    ``(v, n_members)`` for every deletion-variant key shared by more
    than ``max_bucket_size`` strings.  An empty result certifies the
    companion pair run was EXACT (no candidate was dropped); a
    non-empty one is the alert a production dedup run must surface
    before claiming completeness (ADVICE r4: the cap must be
    observable, not silent).  One aggregate over the same keying
    expression — cheap enough to run alongside every pair run."""
    return (
        _deletion_variant_keys(df, text_col, id_col)
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > max_bucket_size)
    )


def fuzzy_neardup_pairs(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Edit-distance-1 near-duplicate pairs via the SymSpell
    deletion-neighborhood (Garbe's symmetric delete algorithm): each
    string emits itself plus every single-character deletion as
    candidate keys; two strings within Levenshtein distance 1
    PROVABLY share a key (substitution at i → both delete i; an
    insertion/deletion pair → the shorter string IS one of the longer
    one's deletion variants), so an equi-join on the variant is an
    EXACT candidate generator — no LSH probability, no cross join.
    Candidates then pay one ``levenshtein`` verification.

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``, one row per
    pair.  Cost: (len+1) variants per row — a linear explode that
    pipelines into the join shuffle.

    EXACTNESS IS CONDITIONAL ON THE CAP: candidate buckets above
    ``max_bucket_size`` members (degenerate keys — very short strings
    share deletion variants massively) are skipped, and a pair whose
    ONLY shared variant is such a bucket is NOT emitted.  Run
    ``oversized_variant_buckets`` with the same arguments to observe
    exactly which buckets (if any) were skipped — empty means the
    result is provably the full distance-≤1 pair set."""
    keyed = _deletion_variant_keys(df, text_col, id_col)
    sizes = keyed.groupBy("v").agg(F.count(F.lit(1)).alias("__vn"))
    keyed = keyed.join(
        F.broadcast(sizes.filter(F.col("__vn") > max_bucket_size)), "v", "left_anti"
    )
    a = keyed.select(F.col("v"), F.col("id").alias("id_a"), F.col("txt").alias("ta"))
    b = keyed.select(F.col("v"), F.col("id").alias("id_b"), F.col("txt").alias("tb"))
    return (
        a.join(b, "v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ta", "tb")
        .distinct()
        .filter(F.levenshtein("ta", "tb") <= 1)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("ta", "tb").cast("long").alias("dist"),
        )
    )


def pair_set_eval(
    truth: DataFrame, pred: DataFrame, scale: int = 1_000_000
) -> DataFrame:
    """Dedup-quality evaluation: compare a PREDICTED pair set (any of
    the candidate families above) against a TRUTH pair set (planted
    duplicates, or an exact brute-force run on a sample) and report
    counts + precision/recall in exact parts-per-million — the QA gate
    a production dedup config change ships behind.

    Both inputs are (id_a, id_b) with id_a < id_b; rows are
    deduplicated here, so callers can pass raw pair streams.  Plan:
    two distincts, one equi-join on the pair key, three 1-row
    aggregates broadcast-crossed together — the output is a single
    row, and nothing driver-side touches the pair sets."""
    t = truth.select("id_a", "id_b").distinct()
    p = pred.select("id_a", "id_b").distinct()
    n_true = t.agg(F.count(F.lit(1)).alias("n_true"))
    n_pred = p.agg(F.count(F.lit(1)).alias("n_pred"))
    n_hit = p.join(t, ["id_a", "id_b"]).agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_true.crossJoin(F.broadcast(n_pred))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_true",
            "n_pred",
            "n_hit",
            F.when(
                F.col("n_pred") > 0,
                F.round(F.lit(scale) * F.col("n_hit") / F.col("n_pred"), 0).cast("long"),
            )
            .otherwise(F.lit(None))
            .alias("precision_ppm"),
            F.when(
                F.col("n_true") > 0,
                F.round(F.lit(scale) * F.col("n_hit") / F.col("n_true"), 0).cast("long"),
            )
            .otherwise(F.lit(None))
            .alias("recall_ppm"),
        )
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    n: int = 5,
    threshold_ppm: int = 300_000,
) -> DataFrame:
    """FUZZY decontamination (the n-gram-overlap-ratio rule used by
    real eval-hygiene pipelines, e.g. the GPT-3/PaLM appendix method —
    public papers): a corpus doc is contaminated BY a benchmark doc
    when ≥ ``threshold_ppm`` of the benchmark's distinct word
    ``n``-grams appear in it — catching partial/edited copies that
    exact any-gram matching (``decontaminate``) would flag too
    aggressively and digest matching would miss entirely.

    Returns ``(doc_id, bench_id, n_shared_grams, bench_grams,
    overlap_ppm)`` for flagged pairs, self-matches excluded.  The ratio
    divides two exact integers once per surviving pair.  Contract as
    in ``contamination_report``: docs shorter than ``n`` tokens are out
    of scope (no attributable n-gram evidence; the any-gram
    ``decontaminate`` pass handles them via its min(n,len) rule).

    100 TB shape: same as ``decontaminate`` — the benchmark gram set
    (with per-doc totals) is tiny and BROADCAST; the corpus subtree
    streams through the join with no exchange; the only shuffle is the
    (doc, bench) pair aggregate over contaminated evidence only."""
    def grams(df: DataFrame, id_expr) -> DataFrame:
        toks = df.select(
            id_expr.alias("id"),
            ws_tokens(normalize_text(text_col)).alias("toks"),
        ).filter(F.size("toks") >= n)
        return (
            toks.select(
                "id",
                F.explode(
                    F.sequence(F.lit(1), F.size("toks") - (n - 1))
                ).alias("i"),
                "toks",
            )
            .select(
                "id",
                F.xxhash64(
                    F.concat_ws(" ", F.slice(F.col("toks"), F.col("i"), n))
                ).alias("gram"),
            )
            .distinct()
        )

    bench_grams = grams(benchmark, F.col(bench_id_col)).select(
        F.col("id").alias(bench_id_col), "gram"
    )
    bench_sizes = bench_grams.groupBy(bench_id_col).agg(
        F.count(F.lit(1)).alias("bench_grams")
    )
    corpus_grams = grams(corpus, F.col(id_col))
    shared = (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .filter(F.col("id") != F.col(bench_id_col))
        .groupBy("id", bench_id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    return (
        shared.join(F.broadcast(bench_sizes), bench_id_col)
        .withColumn(
            "overlap_ppm",
            F.round(
                F.lit(1_000_000) * F.col("n_shared_grams") / F.col("bench_grams"), 0
            ).cast("long"),
        )
        .filter(F.col("overlap_ppm") >= threshold_ppm)
        .select(
            F.col("id").alias(id_col),
            bench_id_col,
            "n_shared_grams",
            "bench_grams",
            "overlap_ppm",
        )
    )


def chunk_level_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    boundary_mod: int = 8,
) -> DataFrame:
    """Sub-document dedup via CONTENT-DEFINED CHUNKING (the
    Rabin-boundary idea of dedup storage systems applied at token
    granularity): a chunk boundary falls after token ``i`` whenever the
    hash of the trailing ``window``-token gram ≡ 0 (mod
    ``boundary_mod``), so boundaries are a pure function of LOCAL
    content — insert a paragraph into a document and every chunk
    outside it keeps its exact identity, which fixed-size chunking
    destroys (the whole point: shared passages dedup across documents
    that are globally different).

    Returns per-chunk occurrence stats:
    ``(chunk_digest, n_occurrences, n_docs, first_doc_id)`` — the
    chunk-level dup map a passage-dedup pass consumes.  Expected chunk
    length is ``boundary_mod`` tokens.

    The boundary hash is the engine-portable md5 construction
    (``portable_token_hash`` family), so the DuckDB oracle applies the
    identical rule.  Plan: one position explode → boundary flags →
    per-doc running-sum window (ONE hash shuffle on the doc id) →
    chunk reassembly via array_sort(collect_list) in the same
    partitioning → digest aggregate.  The shuffle carries (id, pos,
    token) triples; at 100 TB the reassembly aggregate is map-side
    combinable and the digest groupBy shuffles 16-byte keys."""
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(ws_tokens(normalize_text(text_col))).alias("pos", "tok"),
    )
    gram = F.concat_ws(
        " ", *[F.lag("tok", window - 1 - j).over(
            W.partitionBy("id").orderBy("pos")
        ) for j in range(window)]
    )
    h = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    flagged = toks.select(
        "id",
        "pos",
        "tok",
        F.when(
            (F.col("pos") >= window - 1) & (F.pmod(h, F.lit(boundary_mod)) == 0), 1
        )
        .otherwise(0)
        .alias("b"),
    )
    w_run = (
        W.partitionBy("id").orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    )
    chunked = flagged.select(
        "id",
        "pos",
        "tok",
        F.coalesce(F.sum("b").over(w_run), F.lit(0)).alias("chunk_id"),
    )
    chunks = chunked.groupBy("id", "chunk_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("chunk_text")
    )
    return (
        chunks.groupBy(F.md5("chunk_text").alias("chunk_digest"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("id").alias("n_docs"),
            F.min("id").alias("first_doc_id"),
        )
    )


def _lcp_arrays(a: F.Column, b: F.Column) -> F.Column:
    """Longest common prefix of two token arrays as a codegen'd
    zip/position expression: first mismatch position in the zipped
    arrays (0 = none); ``zip_with`` pads the shorter side with NULL,
    and eqNullSafe against a real token is false, so the pad counts
    as a mismatch — LCP clamps at the shorter suffix, which is the
    true common-prefix length when one suffix ends inside the other
    (both engines: see the j2k oracle's identical branch)."""
    mism = F.array_position(
        F.zip_with(a, b, lambda x, y: x.eqNullSafe(y)), F.lit(False)
    )
    return F.when(b.isNull(), F.lit(0)).otherwise(
        F.when(mism > 0, mism - 1).otherwise(F.size(a))
    )


def _suffix_order_replen(sfx: DataFrame) -> DataFrame:
    """Per-suffix maximal repeat length = max LCP with the two
    suffix-ORDER neighbors (the defining property of the LCP array),
    computed WITHOUT a single-partition global window:

    1. ``repartitionByRange`` on the sort key — the distributed sort
       every engine uses for ORDER BY; partition ids then follow key
       order by construction.
    2. lag/lead inside each partition (`Window.partitionBy(pid)` —
       every partition processes its own rows in parallel).
    3. An O(partitions) BOUNDARY table — each partition's first/last
       suffix — stitched with a window over the tiny table itself,
       broadcast back, fills the one missing neighbor at each
       partition edge.

    Input: ``(id, pos, s, sk)``; output ``(id, pos, replen)``.
    Exactly equal to the naive ``Window.orderBy(sk, id, pos)`` over
    the whole table (test-pinned), without its one-task bottleneck."""
    from pyspark.sql import Window

    spark = sfx.sparkSession
    nparts = spark.sparkContext.defaultParallelism
    # Both consumers below (the lag/lead table and the boundary table)
    # must observe the SAME RangePartitioner boundaries.  Two layers
    # guarantee it (ADVICE r8 flagged the invariant as implicit; an
    # eager localCheckpoint would also pin it but costs ~1.7× on j2k —
    # measured, PERF.md §Round-9):
    #  1. ReuseExchange compiles the range exchange ONCE per executed
    #     plan — pinned by tests/test_dedup.py (exactly one
    #     `Exchange rangepartitioning` + a `ReusedExchange` in the
    #     operator's physical plan).
    #  2. Even under separate compilations, RangePartitioner's
    #     reservoir sampling is seeded by partition index
    #     (byteswap32(idx)), so identical deterministic input yields
    #     identical boundaries.
    d = sfx.repartitionByRange(nparts, "sk", "id", "pos").withColumn(
        "pid", F.spark_partition_id()
    )
    w_in = Window.partitionBy("pid").orderBy("sk", "id", "pos")
    nb = d.select(
        "id",
        "pos",
        "s",
        "pid",
        F.lag("s").over(w_in).alias("sp"),
        F.lead("s").over(w_in).alias("sn"),
    )
    # first/last suffix per partition, stitched to neighbor partitions
    # over the tiny boundary table (O(partitions) rows).
    key = F.struct("sk", "id", "pos")
    edges = d.groupBy("pid").agg(
        F.min_by("s", key).alias("first_s"), F.max_by("s", key).alias("last_s")
    )
    w_pid = Window.orderBy("pid")
    edges = edges.select(
        "pid",
        F.lag("last_s").over(w_pid).alias("prev_last"),
        F.lead("first_s").over(w_pid).alias("next_first"),
    )
    return nb.join(F.broadcast(edges), "pid").select(
        "id",
        "pos",
        F.greatest(
            _lcp_arrays(F.col("s"), F.coalesce("sp", "prev_last")),
            _lcp_arrays(F.col("s"), F.coalesce("sn", "next_first")),
        ).alias("replen"),
    )


def _suffix_order_replen_naive(sfx: DataFrame) -> DataFrame:
    """The single-partition global-window form of
    :func:`_suffix_order_replen` — reference semantics for the
    equivalence test only; never called by the operator."""
    from pyspark.sql import Window

    order = Window.orderBy("sk", "id", "pos")
    return sfx.select(
        "id",
        "pos",
        F.greatest(
            _lcp_arrays(F.col("s"), F.lag("s").over(order)),
            _lcp_arrays(F.col("s"), F.lead("s").over(order)),
        ).alias("replen"),
    )


def maximal_repeat_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 12,
    cap: int = 32,
) -> DataFrame:
    """VARIABLE-LENGTH maximal-repeat detection — the true
    suffix-array form of substring dedup (Lee et al. 2022,
    arXiv:2107.06499 "ExactSubstr"), completing the fixed-k-gram
    :func:`repeated_passage_spans`: instead of marking duplicated
    k-grams, every token position gets its exact maximal repeat
    length — the longest passage starting there that occurs >= 2
    times ANYWHERE in the corpus (same doc or across docs) — and
    positions whose repeat length >= ``min_len`` are unioned into the
    spans a substring-dedup pass cuts.  Relational decomposition, all
    linear:

    1. Truncated suffix table: one row per token position carrying
       ``slice(toks, pos, cap)`` — the suffix's first ``cap`` tokens
       (``cap`` bounds both the reported length and the shuffle
       width; real deployments cap reported repeat lengths the same
       way).  Positions within ``min_len`` of the doc end are
       excluded up front — their repeat length cannot reach the
       threshold, and dropping them provably never changes a
       surviving neighbor LCP (the max-LCP partner and every suffix
       ordered between have length >= the LCP >= ``min_len``).
    2. Suffix ORDER: one global sort by the space-joined suffix key
       (tokens are whitespace-free, so string order == token-array
       order).  The maximal repeat length at a position equals the
       larger of its longest-common-prefix with the two ORDER
       neighbors — the defining property of the LCP array, no
       suffix-pair quadratics.  LCP itself is a codegen'd
       ``zip_with`` fold over the two <= ``cap``-token arrays.
    3. Coverage spans: per-doc union of the variable-length
       intervals [pos, pos + repeat_len - 1] via a running-max
       gaps-and-islands window (adjacent/overlapping intervals
       merge), one window + one aggregate keyed on doc.

    At 100 TB the sort shuffles ``cap`` tokens per position —
    ``cap``× the corpus, the price of exact variable-length spans
    (the k-gram form ships k tokens per position for fixed-k
    answers); production would digest rank tables via prefix
    doubling (log passes) if that constant bites.  The suffix-order
    NEIGHBOR computation is fully distributed: a range-partitioned
    sort, per-partition lag/lead windows, and an O(partitions)
    boundary table that stitches each partition's edge rows to its
    neighbors' — never a single-partition global window (the naive
    ``Window.orderBy(<whole table>)`` form; equality of the two forms
    is pinned by test).

    Returns ``(doc_id, span_start, span_end, max_repeat_len,
    n_positions)``: 1-based inclusive token spans, the longest exact
    repeat inside each span (clamped at ``cap``), and how many
    positions in the span start a >= ``min_len`` repeat."""
    toks = df.select(
        F.col(id_col).alias("id"),
        ws_tokens(F.lower(F.trim(F.col(text_col)))).alias("toks"),
    ).filter(F.size("toks") >= min_len)
    sfx = (
        toks.select(
            "id",
            F.explode(
                F.sequence(F.lit(1), F.size("toks") - (min_len - 1))
            ).alias("pos"),
            "toks",
        )
        .select("id", "pos", F.slice("toks", F.col("pos"), cap).alias("s"))
        .withColumn("sk", F.concat_ws(" ", "s"))
    )
    rep = _suffix_order_replen(sfx).filter(F.col("replen") >= min_len)

    from pyspark.sql import Window

    by_doc = Window.partitionBy("id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + F.col("replen") - 1).over(
        by_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = rep.withColumn(
        "new_isl",
        F.when(
            prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "isl",
        F.sum("new_isl").over(
            by_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy(F.col("id").alias(id_col), "isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            F.max(F.col("pos") + F.col("replen") - 1)
            .cast("long")
            .alias("span_end"),
            F.max("replen").cast("long").alias("max_repeat_len"),
            F.count(F.lit(1)).alias("n_positions"),
        )
        .drop("isl")
    )


def repeated_passage_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_repeats: int = 2,
) -> DataFrame:
    """EXACT repeated-passage detection — the fixed-k-gram form of
    suffix-array substring dedup (Lee et al. 2022, arXiv:2107.06499,
    "Deduplicating Training Data Makes Language Models Better"): any
    ``k``-token passage occurring >= ``min_repeats`` times corpus-wide
    is a repeated passage; every hit maps back to its (doc, position),
    and overlapping/adjacent hits coalesce into MAXIMAL spans — the
    token ranges a substring-dedup pass would cut.  A repeat of length
    L >= k produces L-k+1 consecutive duplicated grams, so the
    coalesced span recovers the full repeated region exactly (the
    suffix-array result for matches >= k) without any suffix sorting —
    three relational steps:

    1. gram stream: one tokens-array per doc (no shuffle), position
       explode -> k-token gram per position.  Grams stay STRINGS here
       so the DuckDB oracle can recompute them byte-for-byte; a 100 TB
       deployment digests them to 8-byte xxhash64 first (collision
       odds ~2^-64 per pair — immaterial for span marking) so the
       shuffle carries fixed-width keys, the same digest-not-body
       discipline as dedup_exact.
    2. duplicated grams: one map-side-combinable count >= min_repeats
       (join-back fan-out is the hit count — LINEAR, never quadratic,
       so no bucket cap is needed).
    3. spans: per-doc gaps-and-islands over hit positions (new island
       when the gap exceeds k — beyond that the spans [p, p+k-1] no
       longer touch), one window + one aggregate, both keyed on doc.

    Returns ``(doc_id, span_start, span_end, n_grams_hit)`` with
    1-based inclusive token indices."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        ws_tokens(F.lower(F.trim(F.col(text_col)))).alias("toks"),
    ).filter(F.size("toks") >= k)
    grams = toks.select(
        "id",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (k - 1))).alias("pos"),
        "toks",
    ).select(
        "id",
        "pos",
        F.concat_ws(" ", F.slice("toks", F.col("pos"), k)).alias("gram"),
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_repeats)
        .select("gram")
    )
    hits = grams.join(dup, "gram").select("id", "pos")
    w = Window.partitionBy("id").orderBy("pos")
    islands = hits.withColumn(
        "new_isl",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > k),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "isl",
        F.sum("new_isl").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy(F.col("id").alias(id_col), "isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + (k - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_grams_hit"),
        )
        .drop("isl")
    )


def incremental_neardup_dedup(
    df: DataFrame,
    n_waves: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """BATCH twin of ``streaming.ingest.run_neardup_ingest_stream``:
    the corpus partitioned into ``n_waves`` arrival waves
    (``wave = doc_id % n_waves``, processed in wave order), each wave
    near-dup-deduplicated against the SURVIVORS of earlier waves plus
    the shadow rule within its own wave:

    - dropped iff exact-Jaccard >= ``jaccard_threshold`` vs an
      earlier-wave SURVIVOR, or vs a smaller-id document of the SAME
      wave (shadowing peers count regardless of their own fate).
    - First-ARRIVED survives: an earlier-wave survivor suppresses a
      later near-dup even when the later doc has the smaller id — the
      property that separates incremental dedup from the batch
      min-keeper family, and the parity tests plant exactly that case.

    Mechanism differs from the stream on purpose (independent-path
    agreement for the parity test): ONE LSH pass over the whole corpus
    yields the verified near-dup pair table (``minhash_lsh_pairs`` —
    exhaustive on fixtures whose true pairs sit far above the
    threshold, the documented j2 contract), then the wave fold is
    plain set algebra over that table — ``n_waves`` anti-joins, no
    driver-side row data.  The stream instead probes the at-rest
    index per batch and never sees a global pair table.

    Returns one row per document: ``(doc_id, wave, survived)``.
    """
    pairs = minhash_lsh_pairs(
        df,
        text_col,
        id_col,
        shingle_k,
        num_hashes,
        bands,
        jaccard_threshold,
        max_bucket_size,
    ).select("id_a", "id_b")
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_waves).cast("long").alias("wave"),
    )
    return incremental_wave_fold(docs, pairs, n_waves)


def incremental_curation_pipeline(
    df: DataFrame,
    benchmark: DataFrame,
    n_waves: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_gram: int = 5,
    min_tokens: int = 20,
    min_quality: float = 0.55,
    max_top_word_frac: float = 0.12,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """BATCH twin of ``streaming.ingest.run_curation_pipeline_stream``
    (the j2m ↔ h15 twin-pair discipline applied to the composed
    pipeline): the production gate order — decontaminate → quality →
    exact digest dedup → near-dup — over ``n_waves`` arrival waves
    (``wave = doc_id % n_waves``).

    Mechanism differs from the stream on purpose (independent-path
    agreement for the parity test): gate FLAGS are computed corpus-wide
    (they are pure per-document functions), then ONE pair table —
    verified exact-Jaccard pairs (``minhash_lsh_pairs``) UNIONED with
    normalized-digest-equality pairs, both restricted to the
    gate-PASSING docs — feeds the shared ``incremental_wave_fold``.
    The stream instead probes its at-rest ledgers per micro-batch.
    Returns ``(doc_id, wave, quarantined, passed_quality, survived)``
    for every document — the same relation as the h23 SQL oracle."""
    from ..functions import token_count
    from ..operators.text import quality_score
    from ..streaming.ingest import rowwise_top_word_frac

    quar = decontaminate(
        df, benchmark, text_col=text_col, id_col=id_col, n=n_gram
    ).select(id_col)
    flagged = (
        df.join(
            quar.withColumn("__q", F.lit(True)), id_col, "left"
        )
        .withColumn("quarantined", F.coalesce("__q", F.lit(False)))
        .withColumn(
            "passed_quality",
            (token_count(text_col) >= min_tokens)
            & (quality_score() >= min_quality)
            & (rowwise_top_word_frac(text_col) <= max_top_word_frac),
        )
        .drop("__q")
        .persist()
    )
    track_persisted(flagged)
    q = flagged.filter(~F.col("quarantined") & F.col("passed_quality"))
    jp = minhash_lsh_pairs(
        q, text_col, id_col, shingle_k, num_hashes, bands,
        jaccard_threshold, max_bucket_size,
    ).select("id_a", "id_b")
    dig = q.select(
        F.col(id_col),
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
        ).alias("__dig"),
    )
    digest_pairs = (
        dig.alias("a")
        .join(dig.alias("b"), "__dig")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
    fold = incremental_wave_fold(
        q.select(
            F.col(id_col).alias("doc_id"),
            (F.col(id_col) % n_waves).cast("long").alias("wave"),
        ),
        jp.unionByName(digest_pairs),
        n_waves,
    )
    return (
        flagged.select(
            F.col(id_col).alias("doc_id"),
            (F.col(id_col) % n_waves).cast("long").alias("wave"),
            "quarantined",
            "passed_quality",
        )
        .join(fold.select("doc_id", "survived"), "doc_id", "left")
        .select(
            "doc_id",
            "wave",
            "quarantined",
            "passed_quality",
            F.coalesce("survived", F.lit(False)).alias("survived"),
        )
    )


def incremental_wave_fold(
    docs: DataFrame, pairs: DataFrame, n_waves: int
) -> DataFrame:
    """The arrival-wave survivor fold shared by the incremental dedup
    batch twins (j2m text near-dup, j5g media near-dup): given
    ``docs (doc_id, wave)`` and an undirected near-dup ``pairs (id_a,
    id_b)`` relation, compute first-ARRIVED-survives — a doc is
    dropped iff it pairs with an earlier-wave SURVIVOR or with a
    smaller-id doc of its own wave (shadowing peers count regardless
    of their own fate).  ``n_waves`` anti-joins over the pair table,
    no driver-side row data.  Returns ``(doc_id, wave, survived)``."""
    # Both orientations from ONE pass via explode — a union of pairs
    # with its own reversal puts the pair-generation subtree in the DAG
    # twice and Spark re-executes duplicated subtrees (the
    # connected_components lesson; measured 2× the dominant cost here).
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a"), F.col("id_b")),
                    F.struct(
                        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")
                    ),
                )
            ).alias("e")
        )
        .select("e.id_a", "e.id_b")
        .persist()
    )
    track_persisted(sym)
    survivors = None
    for w in range(n_waves):
        wave = docs.filter(F.col("wave") == w)
        shadowed = (
            sym.filter(F.col("id_a") < F.col("id_b"))
            .join(wave.select(F.col("doc_id").alias("id_a")), "id_a")
            .join(wave.select(F.col("doc_id").alias("id_b")), "id_b")
            .select(F.col("id_b").alias("doc_id"))
        )
        dropped = shadowed
        if survivors is not None:
            matched = (
                sym.join(
                    survivors.select(F.col("doc_id").alias("id_a")), "id_a"
                )
                .join(wave.select(F.col("doc_id").alias("id_b")), "id_b")
                .select(F.col("id_b").alias("doc_id"))
            )
            dropped = dropped.unionByName(matched)
        # Persist each wave's survivor table (tiny: O(wave) ids): wave
        # w's subtree is otherwise re-executed inside every later
        # wave's `matched` join AND the final flag join — Spark does
        # not dedupe repeated uncached subtrees (round-13 optimization;
        # the `sym` persist above only covers the pair table).
        surv_w = wave.join(dropped, "doc_id", "left_anti").persist()
        track_persisted(surv_w)
        survivors = (
            surv_w if survivors is None else survivors.unionByName(surv_w)
        )
    # Flags in ONE pass at the end (a per-wave flag join would add
    # n_waves more joins over the same docs table).
    return docs.join(
        survivors.select("doc_id", F.lit(True).alias("survived")),
        "doc_id",
        "left",
    ).select(
        "doc_id", "wave", F.coalesce("survived", F.lit(False)).alias("survived")
    )


def apply_substring_dedup(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """APPLY substring dedup: cut the coverage spans
    :func:`maximal_repeat_spans` found out of each document and emit
    the cleaned corpus — the transformation step of Lee et al. 2022
    ExactSubstr (their tool likewise removes EVERY occurrence of a
    duplicated passage; a keep-first policy would need a global
    occurrence ranking and is deliberately out of contract — both
    copies of a marked repeat are cut).

    Output, one row per input document: ``(doc_id, n_tokens,
    n_removed, cleaned_text)`` where ``cleaned_text`` is the
    space-join of the surviving NORMALIZED tokens (lower/trim/ws-split
    — span positions are defined over that token array, so the
    cleaned text is too; a production pass that must preserve raw
    bytes would map token spans back through char offsets).

    Shape: spans collapse to one small array per doc (they are unioned
    intervals — a handful per document), broadcast-joined to the token
    table; the cut is a per-row higher-order ``filter`` with the
    position index tested against the span array — O(len · spans) per
    document, no shuffle beyond the span groupBy, scales with the
    corpus scan."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        ws_tokens(F.lower(F.trim(F.col(text_col)))).alias("toks"),
    )
    sp = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("sps")
    )
    kept = F.filter(
        "toks",
        lambda t, i: ~F.exists(
            F.coalesce(F.col("sps"), F.array()),
            lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
        ),
    )
    return (
        toks.join(sp, "doc_id", "left")
        .withColumn("__kept", kept)
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            (F.size("toks") - F.size("__kept")).cast("long").alias("n_removed"),
            F.concat_ws(" ", "__kept").alias("cleaned_text"),
        )
    )


def incremental_substring_dedup(
    df: DataFrame,
    n_waves: int = 3,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental KEEP-FIRST substring dedup, batch twin of
    ``streaming.ingest.run_substring_dedup_stream`` (§2.J2 × H — the
    ExactSubstr complement of :func:`incremental_neardup_dedup`,
    VERDICT r9 #6): the corpus arrives in ``n_waves`` waves
    (``wave = doc_id % n_waves``), and every ``k``-token passage of an
    arriving document that ALREADY APPEARED — in an earlier wave, in a
    smaller-id document of the same wave, or earlier in the same
    document — is cut from the arriving copy.  The first occurrence in
    arrival order always survives: this is the keep-first policy that
    the at-rest form (``apply_substring_dedup``/j2n, which cuts every
    occurrence per Lee et al. 2022) deliberately leaves out, because a
    batch pass has no occurrence ranking — arrival order IS the
    ranking an incremental pipeline gets for free.

    Ledger contract (shared with the stream): a document contributes
    the grams of its ORIGINAL normalized token stream regardless of
    what was cut from its emitted text.  That makes the cut relation
    non-cascading — one global first-occurrence window, no per-wave
    iteration:

    1. gram stream: tokens-array per doc, position explode, gram
       DIGESTED to xxhash64 so the one shuffle carries a fixed 8-byte
       key + (wave, doc, pos) — never gram text (the dedup_exact
       digest-not-body discipline; the oracle recomputes on strings,
       byte-exact modulo 2^-64 collisions).
    2. hit relation: ``row_number() OVER (PARTITION BY gram ORDER BY
       wave, doc_id, pos) > 1`` — one window on the gram shuffle.
    3. cut: hit positions collapse to one small per-doc array; a
       codegen'd higher-order filter drops tokens covered by any
       [p, p + k - 1] hit window (the ``apply_substring_dedup`` cut
       shape) — no second shuffle beyond the per-doc collect.

    Returns one row per document: ``(doc_id, wave, n_tokens,
    n_removed, cleaned_text)`` over the normalized token array."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_waves).cast("long").alias("wave"),
        ws_tokens(F.lower(F.trim(F.col(text_col)))).alias("toks"),
    )
    grams = toks.filter(F.size("toks") >= k).select(
        "doc_id",
        "wave",
        F.explode(F.sequence(F.lit(1), F.size("toks") - (k - 1))).alias("pos"),
        "toks",
    ).select(
        "doc_id",
        "wave",
        "pos",
        F.xxhash64(F.concat_ws(" ", F.slice("toks", F.col("pos"), k))).alias(
            "gh"
        ),
    )
    from pyspark.sql import Window

    first_w = Window.partitionBy("gh").orderBy("wave", "doc_id", "pos")
    hits = (
        grams.withColumn("__rn", F.row_number().over(first_w))
        .filter(F.col("__rn") > 1)
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("hp"))
    )
    kept = F.filter(
        "toks",
        lambda t, i: ~F.exists(
            F.coalesce(F.col("hp"), F.array()),
            lambda p: (i + 1 >= p) & (i + 1 <= p + (k - 1)),
        ),
    )
    return (
        toks.join(hits, "doc_id", "left")
        .withColumn("__kept", kept)
        .select(
            "doc_id",
            "wave",
            F.size("toks").cast("long").alias("n_tokens"),
            (F.size("toks") - F.size("__kept")).cast("long").alias("n_removed"),
            F.concat_ws(" ", "__kept").alias("cleaned_text"),
        )
    )
