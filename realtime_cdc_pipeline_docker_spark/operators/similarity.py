"""Similarity search over embedding columns (SURVEY §2.J3).

Two paths, as a 100 TB design requires:

- **Brute-force cosine top-k** — the exact baseline.  Query vectors are
  broadcast (they are few); the corpus scan is embarrassingly parallel;
  per-partition top-k then a tiny global merge.  Exact, O(|corpus|·|Q|).
- **Random-hyperplane LSH (SimHash for vectors)** — the ANN scale path.
  Sign-pattern of h dot products buckets the corpus; queries probe only
  their bucket (optionally multi-probe neighbors).  Hyperplanes are a
  deterministic seeded matrix, broadcast as a literal — the bucketing is
  a pure column expression, so the corpus can be *pre-bucketed at ingest*
  and bucket-partitioned on disk: a query then touches one partition,
  which is the property that survives 100 TB.

The IVF variant replaces random hyperplanes with spherical k-means
centroids (better recall per probe, needs a training pass), indexes
each vector under its ``assign`` nearest cells (boundary replication),
and materializes the inverted file as a cluster-partitioned parquet
layout (``write_ivf_index``) so query-time probes are partition-pruned
scans — assign-to-bucket + in-bucket exact rerank throughout.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import vec_cosine, vec_dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    ``queries`` must be small (broadcast side).  Returns
    (query_id, neighbor_id, sim, rnk) with rank 1..k, ties broken by
    neighbor id for determinism."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            vec_cosine("__qvec", vec_col).alias("sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def _hyperplanes(num_planes: int, dim: int, seed: str = "rtcdc") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from SHA-256 — no RNG
    state, reproducible across runs/machines (resume-safe)."""
    planes = []
    for p in range(num_planes):
        row = []
        for i in range(0, dim, 8):
            digest = hashlib.sha256(f"{seed}:{p}:{i}".encode()).digest()
            row.extend(
                struct.unpack("<8i", digest[:32])
            )
        planes.append([(v / 2**31) for v in row[:dim]])
    return planes


def lsh_bucket_expr(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Sign-pattern bucket id of a vector under the given hyperplanes —
    a pure column expression (computable at ingest for pre-bucketing)."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        dot = vec_dot(F.col(vec_col), F.array(*[F.lit(float(v)) for v in plane]))
        bucket = bucket.bitwiseOR(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def lsh_table_seeds(num_tables: int) -> list[str]:
    """Seeds for the independent hash tables (table 0 keeps the original
    seed so single-table callers and pre-bucketed corpora stay valid)."""
    return ["rtcdc" if t == 0 else f"rtcdc:tbl{t}" for t in range(num_tables)]


def probe_masks(num_planes: int, hamming: int) -> list[int]:
    """XOR masks for every bucket within the given hamming radius of the
    query's bucket (0 → just the bucket, 1 → +num_planes single-bit
    flips, 2 → +all two-bit flips)."""
    masks = [0]
    if hamming >= 1:
        masks += [1 << j for j in range(num_planes)]
    if hamming >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(num_planes)
            for j in range(i + 1, num_planes)
        ]
    return masks


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    num_tables: int = 6,
    hamming_probe: int = 1,
) -> DataFrame:
    """Approximate top-k via multi-table, multi-probe hyperplane LSH.

    A single sign-pattern table recalls a neighbor at angle θ with
    probability (1-θ/π)^planes — on near-orthogonal corpora (θ≈65°)
    that's a few percent, useless.  Two standard amplifiers fix it
    without giving up the equi-join plan shape:

    - **num_tables independent tables** (E2LSH-style OR-construction):
      a neighbor is found if ANY table collides — recall
      1-(1-p^planes)^tables;
    - **multi-probe** (Lv et al., VLDB'07): each query also probes the
      buckets within ``hamming_probe`` bit-flips of its own, the
      next-most-likely homes of a near neighbor, trading a few extra
      probes for many fewer tables.

    Defaults (6 planes × 6 tables, hamming≤1 ⇒ 42 probe buckets)
    measure recall@5 ≈ 0.9 vs brute force on the *random* fixture —
    the adversarial case; clustered real embeddings recall higher with
    far smaller candidate sets (tests/test_similarity.py).

    Scale shape: the per-table bucket ids are pure column expressions →
    at ingest the corpus stores num_tables bucket columns (or is
    directory-partitioned by table-0 bucket).  The in-plan
    ``explode`` to (table, bucket) long form keeps this a single corpus
    scan feeding one broadcast equi-join — never a hamming-distance
    ⋈-predicate, which would be a cross join.  Duplicate candidates
    (hits in several tables) collapse in a map-side-combinable
    max aggregate before ranking."""
    tables = [
        _hyperplanes(num_planes, dim, seed) for seed in lsh_table_seeds(num_tables)
    ]
    c = corpus.select(
        id_col,
        vec_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket_expr(vec_col, planes).alias("bkt"),
                    )
                    for t, planes in enumerate(tables)
                ]
            )
        ).alias("__tb"),
    ).select(
        id_col,
        vec_col,
        F.col("__tb.tbl").alias("__tbl"),
        F.col("__tb.bkt").alias("__bkt"),
    )
    masks = probe_masks(num_planes, hamming_probe)
    q = queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
    for t, planes in enumerate(tables):
        q = q.withColumn(f"__b{t}", lsh_bucket_expr("__qvec", planes))
    q = q.select(
        query_id_col,
        "__qvec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        F.col(f"__b{t}").bitwiseXOR(F.lit(m)).alias("bkt"),
                    )
                    for t in range(len(tables))
                    for m in masks
                ]
            )
        ).alias("__tb"),
    ).select(
        query_id_col,
        "__qvec",
        F.col("__tb.tbl").alias("__tbl"),
        F.col("__tb.bkt").alias("__bkt"),
    )
    scored = (
        c.join(F.broadcast(q), ["__tbl", "__bkt"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            vec_cosine("__qvec", vec_col).alias("sim"),
        )
        .groupBy(query_id_col, "neighbor_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket self-join +
    exact cosine verification.  Near-identical vectors agree on all
    hyperplane signs with high probability, so candidates = in-bucket
    pairs only.  Returns (id_a, id_b, sim)."""
    planes = _hyperplanes(num_planes, dim)
    b = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("__bucket", lsh_bucket_expr("vec", planes))
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(
            y,
            (F.col("x.__bucket") == F.col("y.__bucket")) & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            vec_cosine("x.vec", "y.vec").alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-based alternative to hyperplane
# LSH (SURVEY §2.J3 "IVF or LSH-bucketed variant").
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Spherical k-means centroids, trained with Lloyd iterations.

    - **Deterministic init**: the ``n_centroids`` corpus vectors with the
      smallest ``xxhash64(id)`` — a seedless reproducible sample.
    - **Spherical**: vectors are unit-normalized and assignment is
      max-dot-product, so cluster membership is scale-invariant (a
      positively-scaled duplicate always lands with its original).
    - Each iteration: one broadcast-assignment pass + one
      posexplode/groupBy mean — both map-side combinable.  Centroid
      state (n_centroids × dim doubles) is collected to the driver
      between iterations, as any iterative-refinement loop must; at
      100 TB you train on a sample and only the final *assignment* scan
      touches the full corpus.
    """
    from ..functions import vec_normalize

    normed = corpus.select(
        F.col(id_col).alias("id"), vec_normalize(vec_col).alias("v")
    ).persist()
    seeds = (
        normed.orderBy(F.xxhash64(F.col("id").cast("string")), "id")
        .limit(n_centroids)
        .collect()
    )
    centroids = [list(r["v"]) for r in seeds]

    for _ in range(n_iters):
        # Table-form assignment (assign_clusters_table, pinned bit-equal
        # to the literal nearest_centroid_expr): the literal form
        # re-plans an n_centroids×dim-literal expression tree every
        # iteration, which dominated training wall-time at 64 centroids
        # (driver-side optimization, not compute).
        assigned = assign_clusters_table(normed, centroids)
        means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster", F.col("pm.m").alias("centroid"))
            .collect()
        )
        new = {r["cluster"]: list(r["centroid"]) for r in means}
        # keep the old centroid for clusters that lost every member
        centroids = [new.get(i, c) for i, c in enumerate(centroids)]
        # re-normalize (spherical k-means projects means back to the sphere)
        centroids = [
            [x / (sum(y * y for y in c) ** 0.5 or 1.0) for x in c] for c in centroids
        ]
    normed.unpersist()
    return centroids


def nearest_centroid_expr(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """Index of the max-dot-product centroid — a pure column expression
    (centroids are literals), computable at ingest for pre-partitioning
    the corpus by cluster."""
    scored = F.array(
        *[
            F.struct(
                vec_dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c])).alias(
                    "dot"
                ),
                F.lit(i).alias("idx"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_max(scored)["idx"]


def assign_clusters_table(
    normed: DataFrame,
    centroids: list[list[float]],
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """Nearest-centroid assignment via a BROADCAST COMPONENT TABLE
    instead of the literal expression ``nearest_centroid_expr`` builds:
    posexplode the (unit) vectors, broadcast-join the (cluster, pos,
    c) centroid components, one map-side-combinable (id, cluster)
    dot-product aggregate, then ``max_by`` per id — every step
    whole-stage codegen, no HOF lambdas, no literal blow-up.

    Why it exists: the literal form inlines n_centroids × dim floats
    into ONE generated method, so its janino-compile cost grows with
    the centroid count (the j3j 64 KB lesson) — which forced j2f down
    to 8 clusters, and SemDeDup with few clusters makes the
    cluster-LOCAL quadratic term large (~n²/8 pairs).  The table form
    is O(1) in generated-code size, so the cluster count can follow
    SemDeDup's ~√n prescription and keep the quadratic term small.
    The literal form stays the right choice where the centroid count
    is small and the expression must be ingest-computable (IVF
    partition pruning).  Deterministic tiebreak: highest dot wins,
    then HIGHEST cluster id — nearest_centroid_expr's array_max over
    (dot, idx) structs resolves dot ties to the highest idx, and the
    composite max_by key mirrors that (equivalence is pinned on ties
    too, by test).

    Rows whose vector is null or empty (posexplode emits nothing)
    come back with a NULL cluster via the left join — same behavior
    as nearest_centroid_expr, which evaluates to null on them —
    rather than silently vanishing from the output.

    Returns ``(id_col, vec_col, cluster)``."""
    spark = normed.sparkSession
    n = len(centroids)
    comp = spark.createDataFrame(
        [(ci, pos, float(x)) for ci, c in enumerate(centroids) for pos, x in enumerate(c)],
        "cluster int, pos int, c double",
    )
    dots = (
        normed.select(id_col, F.posexplode(vec_col).alias("pos", "x"))
        .join(F.broadcast(comp), "pos")
        .groupBy(id_col, "cluster")
        .agg(F.sum(F.col("x").cast("double") * F.col("c")).alias("dot"))
    )
    # nearest_centroid_expr resolves dot ties to the HIGHEST cluster
    # index (array_max over (dot, idx) structs); mirror that exactly so
    # the two assignment forms are interchangeable.
    best = dots.groupBy(id_col).agg(
        F.max_by("cluster", F.struct(F.col("dot"), F.col("cluster"))).alias(
            "cluster"
        )
    )
    return normed.join(best, id_col, "left")


def centroid_ranks_expr(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """Centroid indices sorted by descending dot product (for nprobe)."""
    scored = F.array(
        *[
            F.struct(
                (-vec_dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))).alias(
                    "neg"
                ),
                F.lit(i).alias("idx"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.array_sort(scored)["idx"]


# ---------------------------------------------------------------------------
# Arrow-native assignment twins (round-13 optimization).
#
# The literal-expression forms above inline n_centroids×dim (and for PQ
# k×dim more) float literals into the plan.  That is the right call for
# a prepared, run-many-times plan — but a MICRO-BATCH caller builds a
# fresh DataFrame per batch, and classic PySpark analyzes EAGERLY on
# every transformation, so each batch re-pays Catalyst analysis of the
# ~10⁴-node tree (measured 1.2–2.0 s/batch, scripts/opt_probe.py ivfpq)
# on top of ~0.5 ms/row evaluation.  The guide-§4.2 answer is one
# vectorized Arrow pass: a tiny constant-size plan (one MapInArrow
# node), NumPy math inside.
#
# BIT-EXACTNESS CONTRACT (what makes this a safe swap, pinned by
# tests/test_similarity.py::test_arrow_assignment_bitexact_*):
# every float op replicates the expression form's op sequence exactly —
# * vec_dot folds left-to-right: acc=0.0; acc = acc + v[i]*c[i].  The
#   NumPy twin runs the same per-element IEEE-754 double ops in the
#   same order via a sequential loop over dims of vectorized (mul,
#   add) — identical bits, because each NumPy elementwise op is the
#   same single f64 instruction per element.
# * float32 inputs are widened to f64 first (exact), matching the
#   expressions' x.cast("double").
# * vec_normalize: norm² folds left-to-right from 0.0, then sqrt (IEEE
#   correctly-rounded in both), then per-element division.
# * centroid_ranks_expr = array_sort over (neg, idx) structs = stable
#   argsort of neg (ties → lowest idx).  pq_best_expr = array_min over
#   (d2, code) structs = first-occurrence argmin (ties → lowest code);
#   its d2 starts at the FIRST term (no 0.0 seed), replicated.
# Because the floats carry identical bits, every tie/compare decides
# identically, so the emitted integers (clusters, codes) are equal —
# not approximately, but row-for-row.  Degenerate vectors (null or
# wrong length): the expression form's dots come out all-null, every
# (neg, idx) struct ties, and the stable sort yields ranks [0, 1, …] —
# the arrow form emits the same [0..assign) clusters (and [0]*m codes,
# matching array_min's all-null-d2 tie → lowest code) explicitly.
# All-NaN vectors tie the same way on both paths (probed in round 13).
# The one intentional divergence: the PQ expression form RAISES
# (ANSI element_at) on a wrong-LENGTH vector — out of the fixture
# contract entirely — where the arrow form treats it like null.
# ---------------------------------------------------------------------------


def _vecs_np(col, dim: int):
    """(valid_mask, V) from an Arrow list column: f64 matrix of the
    valid (non-null, exactly ``dim``-long) vectors, widened exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    lengths = pc.list_value_length(col)
    valid = pc.fill_null(
        pc.and_kleene(
            col.is_valid(), pc.equal(lengths, pa.scalar(dim, lengths.type))
        ),
        False,
    )
    valid_np = valid.to_numpy(zero_copy_only=False).astype(bool)
    taken = col.filter(pa.array(valid_np))
    flat = taken.flatten().to_numpy(zero_copy_only=False)
    V = np.asarray(flat, dtype=np.float64).reshape(-1, dim)
    return valid_np, V


def _seq_dots_np(V, C):
    """vec_dot twin: acc=0.0; acc = acc + v[i]*c[i] over dims in order
    — same IEEE-754 double sequence as the codegen fold, so same bits."""
    import numpy as np

    acc = np.zeros((V.shape[0], C.shape[0]), dtype=np.float64)
    with np.errstate(invalid="ignore", over="ignore"):
        for i in range(V.shape[1]):
            acc = acc + V[:, i : i + 1] * C[:, i][None, :]
    return acc


def _cluster_ranks_np(V, C, top: int):
    """centroid_ranks_expr twin: stable argsort over -dot (ties →
    lowest centroid index, = array_sort over (neg, idx) structs)."""
    import numpy as np

    neg = -_seq_dots_np(V, C)
    return np.argsort(neg, axis=1, kind="stable")[:, :top]


def _normalize_np(V):
    """vec_normalize twin: norm² folded left-to-right from 0.0."""
    import numpy as np

    acc = np.zeros(V.shape[0], dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
        for i in range(V.shape[1]):
            acc = acc + V[:, i] * V[:, i]
        return V / np.sqrt(acc)[:, None]


def _pq_codes_np(NV, CB, m: int):
    """pq_best_expr twin per subspace: d2 accumulates term-by-term in
    dim order starting from the first term; argmin ties → lowest code."""
    import numpy as np

    n, dim = NV.shape
    assert dim % m == 0, (
        f"PQ subspace split: dim {dim} not divisible by m {m}"
    )  # the expression form's contract — never silently truncate tail dims
    dsub = dim // m
    codes = np.empty((n, m), dtype=np.int64)
    with np.errstate(invalid="ignore", over="ignore"):
        for sub in range(m):
            acc = None
            for i in range(dsub):
                col = sub * dsub + i
                d = NV[:, col][:, None] - CB[:, col][None, :]
                t = d * d
                acc = t if acc is None else acc + t
            codes[:, sub] = np.argmin(acc, axis=1)
    return codes


def assign_ivf_arrow(
    df: DataFrame,
    centroids: list[list[float]],
    assign: int,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """Row-passthrough IVF assignment: every input column survives,
    plus ``cluster_col`` (int) exploded over the ``assign`` nearest
    centroids — bit-identical rows to
    ``withColumn(c, explode(slice(centroid_ranks_expr(vec), 1, assign)))``
    but through ONE MapInArrow node (constant plan size, vectorized
    math; see the bit-exactness contract above)."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    dim = C.shape[1]
    # slice(ranks, 1, assign) degrades gracefully when assign exceeds
    # the centroid count (it returns all n_centroids ranks); clamp so
    # the twin matches instead of a NumPy broadcast error (ADVICE r13).
    a = min(int(assign), len(centroids))
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(cluster_col, T.IntegerType())]
    )
    vec_idx = df.columns.index(vec_col)

    def gen(batches):
        import numpy as np
        import pyarrow as pa

        for b in batches:
            if b.num_rows == 0:
                continue
            valid, V = _vecs_np(b.column(vec_idx), dim)
            all_ranks = np.tile(np.arange(a, dtype=np.int64), (b.num_rows, 1))
            if valid.any():
                all_ranks[valid] = _cluster_ranks_np(V, C, a)
            idx = np.repeat(np.arange(b.num_rows), a)
            tbl = pa.Table.from_batches([b]).take(pa.array(idx))
            clusters = pa.array(all_ranks.ravel(), pa.int32())
            yield from (
                tbl.append_column(cluster_col, clusters)
                .combine_chunks()
                .to_batches()
            )

    return df.mapInArrow(gen, out_schema)


def ivfpq_indexed_arrow(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebook: list[list[float]],
    m: int,
    assign: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow twin of the expression-built ``_ivfpq_indexed`` relation
    ``(id, vec, __cluster, codes[m])`` — normalization, spherical
    cluster ranks and PQ codes in one vectorized pass (bit-exactness
    contract above; equality pinned by test)."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    CB = np.asarray(codebook, dtype=np.float64)
    dim = C.shape[1]
    assert dim % m == 0, (
        f"PQ subspace split: dim {dim} not divisible by m {m}"
    )
    a = min(int(assign), len(centroids))  # match slice() semantics (ADVICE r13)
    narrow = corpus.select(id_col, vec_col)
    out_schema = T.StructType(
        list(narrow.schema.fields)
        + [
            T.StructField("__cluster", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.LongType())),
        ]
    )

    def gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            if b.num_rows == 0:
                continue
            vec = b.column(1)
            # The expression twin RAISES on a wrong-LENGTH vector (ANSI
            # element_at into the missing subspace position); silently
            # assigning clusters [0..assign) with all-zero codes would
            # corrupt the index on malformed embeddings (ADVICE r13).
            lengths = pc.list_value_length(vec)
            wrong = pc.fill_null(
                pc.and_kleene(
                    vec.is_valid(),
                    pc.not_equal(lengths, pa.scalar(dim, lengths.type)),
                ),
                False,
            )
            n_wrong = pc.sum(pc.cast(wrong, pa.int64())).as_py() or 0
            if n_wrong:
                raise ValueError(
                    f"ivfpq_indexed_arrow: {n_wrong} vector(s) with "
                    f"length != {dim} — malformed embeddings must not "
                    "enter the PQ index (the expression form raises too)"
                )
            valid, V = _vecs_np(vec, dim)
            all_ranks = np.tile(np.arange(a, dtype=np.int64), (b.num_rows, 1))
            all_codes = np.zeros((b.num_rows, m), dtype=np.int64)
            if valid.any():
                NV = _normalize_np(V)
                all_ranks[valid] = _cluster_ranks_np(NV, C, a)
                all_codes[valid] = _pq_codes_np(NV, CB, m)
            idx = np.repeat(np.arange(b.num_rows), a)
            tbl = pa.Table.from_batches([b]).take(pa.array(idx))
            clusters = pa.array(all_ranks.ravel(), pa.int32())
            code_vals = pa.array(
                np.repeat(all_codes, a, axis=0).ravel(), pa.int64()
            )
            offsets = pa.array(
                np.arange(0, (len(idx) + 1) * m, m, dtype=np.int32)
            )
            code_arr = pa.ListArray.from_arrays(offsets, code_vals)
            yield from (
                tbl.append_column("__cluster", clusters)
                .append_column("codes", code_arr)
                .combine_chunks()
                .to_batches()
            )

    return narrow.mapInArrow(gen, out_schema)


def semantic_gate_hits_arrow(
    corpus: DataFrame,
    bench_rows: list,
    t_permille: int,
    id_col: str = "cid",
    qc_col: str = "qc",
    nc2_col: str = "nc2",
) -> DataFrame:
    """Arrow twin of the semantic-decontamination gate's
    ``corpus.crossJoin(broadcast(bench))`` + integer-cosine filter +
    ``groupBy(id).agg(count, min(bid))`` (j8d / h21 / the semantic
    gate stream): one MapInArrow pass computing, per corpus row, the
    number of benchmark hits and the smallest hitting benchmark id —
    rows with zero hits are NOT emitted, exactly like the expression
    form's inner groupBy over the filtered pairs.

    EXACTNESS CONTRACT (simpler than the float contract above —
    everything here is integer):

    * inputs are the ALREADY-QUANTIZED micro-unit components
      (``qc``/``qb`` array<long>, produced by the same JVM ``round(x *
      1e6)`` expressions both engines run — quantization never moves
      into NumPy, so the one genuinely float-sensitive step stays
      byte-identical);
    * dot products and norms are exact int64 sums (the expression
      form's ``aggregate(zip_with(...))`` long fold is the same exact
      integer regardless of association); a pre-checked magnitude
      bound (dim · max|qc| · max|qb| < 2⁶²) guards the vectorized
      matmul, with an arbitrary-precision object-dtype fallback when a
      batch exceeds it — exact either way, never silently wrapped;
    * the cross-multiplied gate ``dot²·10⁶ ≥ t²·‖c‖²·‖b‖²`` is decided
      in float64 only where a conservative relative-error band (1e-9,
      vs the ≤ ~5e-16 true bound of two roundings per side) makes the
      comparison provably decisive, and re-decided in Python
      arbitrary-precision integers for every border pair — so the
      emitted hit set equals the DECIMAL(38,0) expression form's on
      every input, including exact-threshold ties.

    Degenerate rows replicate the expression semantics: a corpus row
    whose ``qc`` is null / wrong-length / null-element (→ null dot in
    ``zip_with``) or whose ``nc2`` is null can never pass the filter —
    no hits emitted; benchmark rows with the same defects are excluded
    from the matrix for the same reason.  ``bench_rows`` is the
    collected (bid, qb, nb2) benchmark — tiny by the gate's contract
    (eval suites), the same rows the expression form broadcasts."""
    import numpy as np

    t2 = int(t_permille) * int(t_permille)
    valid_bench = [
        r
        for r in bench_rows
        if r["qb"] is not None
        and r["nb2"] is not None
        and all(x is not None for x in r["qb"])
    ]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_bench_hits", T.LongType()),
            T.StructField("first_bench_id", T.LongType()),
        ]
    )
    narrow = corpus.select(id_col, qc_col, nc2_col)
    if valid_bench:
        dims = {len(r["qb"]) for r in valid_bench}
        if len(dims) != 1:
            raise ValueError(
                f"semantic_gate_hits_arrow: benchmark dims differ: {dims}"
            )
        (dim,) = dims
    if not valid_bench:
        return narrow.sparkSession.createDataFrame([], out_schema)

    QB = np.asarray([list(r["qb"]) for r in valid_bench], dtype=np.int64)
    NB2 = np.asarray([int(r["nb2"]) for r in valid_bench], dtype=np.int64)
    BIDS = np.asarray([int(r["bid"]) for r in valid_bench], dtype=np.int64)
    max_qb = int(np.abs(QB).max()) if QB.size else 0

    def gen(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        NB2_f = NB2.astype(np.float64)
        for b in batches:
            if b.num_rows == 0:
                continue
            ids = b.column(0)
            qc = b.column(1)
            nc2 = b.column(2)
            lengths = pc.list_value_length(qc)
            valid = pc.fill_null(
                pc.and_kleene(
                    pc.and_kleene(
                        qc.is_valid(),
                        pc.equal(lengths, pa.scalar(dim, lengths.type)),
                    ),
                    nc2.is_valid(),
                ),
                False,
            ).to_numpy(zero_copy_only=False).astype(bool)
            if valid.any():
                taken = qc.filter(pa.array(valid))
                flat = taken.flatten()
                if flat.null_count:
                    # rows with null ELEMENTS → null dot on the
                    # expression path → never a hit; drop them too
                    isnull = pc.is_null(flat).to_numpy(zero_copy_only=False)
                    row_lens = np.full(int(valid.sum()), dim)
                    starts = np.zeros(len(row_lens) + 1, dtype=np.int64)
                    np.cumsum(row_lens, out=starts[1:])
                    bad = np.add.reduceat(isnull.astype(np.int64), starts[:-1]) > 0
                    vidx = np.nonzero(valid)[0]
                    valid[vidx[bad]] = False
                    taken = qc.filter(pa.array(valid))
                    flat = taken.flatten()
            if not valid.any():
                continue
            V = np.asarray(
                flat.to_numpy(zero_copy_only=False), dtype=np.int64
            ).reshape(-1, dim)
            nc2v = nc2.filter(pa.array(valid)).to_numpy(zero_copy_only=False)
            nc2v = np.asarray(nc2v, dtype=np.int64)
            max_qc = int(np.abs(V).max()) if V.size else 0
            if dim * max_qc * max_qb < 2**62:
                dots = V @ QB.T  # exact int64, bound checked above
            else:
                dots = np.asarray(
                    V.astype(object) @ QB.T.astype(object)
                )  # arbitrary-precision, exact
            pos = dots > 0
            dots_f = np.asarray(dots, dtype=np.float64)
            L = dots_f * dots_f * 1.0e6
            R = float(t2) * nc2v.astype(np.float64)[:, None] * NB2_f[None, :]
            sure_ge = L >= R * (1.0 + 1e-9)
            sure_lt = L <= R * (1.0 - 1e-9)
            hit = pos & sure_ge
            border = pos & ~(sure_ge | sure_lt)
            if border.any():
                for i, j in zip(*np.nonzero(border)):
                    hit[i, j] = (
                        int(dots[i, j]) ** 2 * 1_000_000
                        >= t2 * int(nc2v[i]) * int(NB2[j])
                    )
            n_hits = hit.sum(axis=1).astype(np.int64)
            has_hit = n_hits > 0
            if not has_hit.any():
                continue
            first = np.where(hit, BIDS[None, :], np.iinfo(np.int64).max).min(
                axis=1
            )
            ids_np = np.asarray(
                ids.filter(pa.array(valid)).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids_np[has_hit], pa.int64()),
                    pa.array(n_hits[has_hit], pa.int64()),
                    pa.array(first[has_hit], pa.int64()),
                ],
                schema=pa.schema(
                    [
                        (id_col, pa.int64()),
                        ("n_bench_hits", pa.int64()),
                        ("first_bench_id", pa.int64()),
                    ]
                ),
            )

    return narrow.mapInArrow(gen, out_schema)


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 6,
    assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: index corpus rows under their ``assign``
    nearest centroids (the inverted file, with boundary replication),
    probe each query's ``nprobe`` nearest lists, exact-rerank inside.
    At scale the corpus is written partitioned by ``cluster`` so a
    query touches nprobe partitions — same pre-partitioning property as
    the LSH bucket path, with data-adapted cells instead of random
    hyperplanes.

    ``assign > 1`` is the boundary-replication dial: a vector near a
    cell edge is indexed in its runner-up cells too, so a neighbor
    just across the boundary is still found without probing more
    lists.  Index size grows ``assign``-fold; probe cost grows with
    per-list size, not list count.  Measured on the fixture's
    near-orthogonal random vectors (the hardest case — neighbors barely
    correlate with cells), recall@5 of 16 cells:

    =========  =========  ========
    assign     nprobe     recall@5
    =========  =========  ========
    1          6          0.71
    1          8          0.80
    2 (def)    6 (def)    0.91
    2          8          0.96
    =========  =========  ========

    The defaults clear the same ≥0.8 bar the LSH path is tested to
    (tests/test_similarity.py).  Planted true duplicates are found at
    any nprobe ≥ 1 (scale-invariant assignment).  The (query, neighbor)
    pair dedup (two shared cells → same pair twice) happens in the
    pre-rank ``distinct``."""
    if centroids is None:
        centroids = train_ivf_centroids(corpus, n_centroids, vec_col=vec_col, id_col=id_col)
    if assign <= 1:
        c = corpus.withColumn("__cluster", nearest_centroid_expr(vec_col, centroids))
    else:
        # arrow twin of explode(slice(centroid_ranks_expr)) — bit-exact
        # (contract above); one constant-size MapInArrow node instead
        # of the n_centroids×dim literal tree
        c = assign_ivf_arrow(corpus, centroids, assign, vec_col, "__cluster")
    q = (
        queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
        .withColumn(
            "__cluster",
            F.explode(F.slice(centroid_ranks_expr("__qvec", centroids), 1, nprobe)),
        )
    )
    scored = (
        c.join(F.broadcast(q), "__cluster")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            vec_cosine("__qvec", vec_col).alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]],
    assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF inverted file as a ``cluster``-partitioned
    parquet layout — the storage half of the ANN contract.  At 100 TB
    the index is built ONCE at ingest (the centroid expression is a
    pure column function, so this is a single scan + write), and every
    query-time probe then reads only its ``nprobe`` cluster
    directories via partition pruning — the filesystem enforces the
    'touch nprobe lists' property instead of a runtime filter.
    Boundary replication (``assign``) happens at write time, so the
    probe side needs no widening.  Clustered by ``cluster`` before the
    write: one file per list per job, not tasks×lists slivers (same
    hygiene as the ingest log)."""
    # arrow twin of explode(slice(centroid_ranks_expr)) — bit-exact
    # (contract above), constant plan size at any centroid count
    indexed = assign_ivf_arrow(corpus, centroids, assign, vec_col, "cluster")
    (
        indexed.repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(path)
    )


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Query a ``write_ivf_index`` layout: read ONLY the union of the
    query batch's probed clusters (a partition-pruned scan — asserted
    via PartitionFilters in tests/test_similarity.py), then the same
    in-list exact rerank as ``ivf_ann_topk``.  The probed-cluster list
    is a driver-side collect bounded by ``n_queries × nprobe`` small
    integers.  ``path`` may be a plain layout or a versioned index
    root (``index_commit`` protocol — resolved to the current
    committed version here, so a reader never sees a half-rebuilt
    mix).  Returns the identical relation to ``ivf_ann_topk`` with
    the same centroids/assign/nprobe (equivalence-tested)."""
    from .index_commit import resolve_index_path

    path = resolve_index_path(spark, path)
    q = (
        queries.select(query_id_col, F.col(vec_col).alias("__qvec"))
        .withColumn(
            "__cluster",
            F.explode(F.slice(centroid_ranks_expr("__qvec", centroids), 1, nprobe)),
        )
    )
    probed = sorted({r[0] for r in q.select("__cluster").distinct().collect()})
    idx = (
        spark.read.parquet(path)
        .filter(F.col("cluster").isin(probed))
        .withColumnRenamed("cluster", "__cluster")
    )
    scored = (
        idx.join(F.broadcast(q), "__cluster")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            vec_cosine("__qvec", vec_col).alias("sim"),
        )
        .distinct()
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def embedding_centroids(
    df: DataFrame,
    by: str = "label",
    vec_col: str = "embedding",
    micro: int = 1_000_000,
) -> DataFrame:
    """Per-group embedding centroid in fixed-point micro-units:
    ``(group, pos, n_vectors, sum_micro)`` where ``sum_micro =
    SUM(round(x * micro))`` as BIGINT.

    Centroids drive dataset cartography (per-domain/per-cluster mean
    vectors), drift monitoring, and IVF seeding.  Floating-point SUM is
    order-dependent and therefore not reproducible across partitionings
    — a correctness problem for any audit that re-runs the aggregation
    on different cluster layouts.  Rounding each component to integer
    micro-units first (one deterministic IEEE multiply + half-away
    round, identical in every engine) makes the sum exact, associative,
    and layout-independent — the same fixed-point discipline the
    revenue queries use (functions.fixed_units).

    Plan: posexplode → one hash aggregate keyed (group, pos) — map-side
    combinable, one exchange, ~group_count x dim result rows.
    """
    return (
        df.select(F.col(by).alias("grp"), F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("grp", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.round(F.col("x").cast("double") * micro).cast("long")).alias(
                "sum_micro"
            ),
        )
        .select(F.col("grp").alias(by), F.col("pos").cast("long"), "n_vectors", "sum_micro")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
) -> DataFrame:
    """Symmetric int8 quantization: per-vector max-abs scale, component
    ``q = round(x / scale * levels)`` in [-levels, levels] — the
    compression step that makes a 100 TB float32 embedding store a
    25 TB int8 one (4x less scan I/O for candidate generation; rerank
    reads the float originals for the short list).

    Deterministic and engine-exact: the scale is a pure max (no
    arithmetic), and the quantizer is two correctly-rounded IEEE double
    ops + half-away rounding — identical bit patterns in any engine, so
    the DuckDB oracle checks it value-for-value.  All-zero vectors
    quantize to zeros (scale 0 guard).

    Output is the tall (id, pos, q, scale) relation — the layout a
    columnar int8 store scans; one generate, no exchange."""
    scale = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x)))
    return (
        df.select(F.col(id_col), F.col(vec_col), scale.alias("scale"))
        .select(
            id_col,
            "scale",
            F.posexplode(vec_col).alias("pos", "x"),
        )
        .select(
            id_col,
            F.col("pos").cast("int"),
            F.when(F.col("scale") == 0, F.lit(0))
            .otherwise(
                F.round(
                    F.col("x").cast("double") / F.col("scale").cast("double") * levels
                )
            )
            .cast("int")
            .alias("q"),
            "scale",
        )
    )


def projection_signs(
    out_dims: int = 16, in_dims: int = 64, seed_tag: str = "rp"
) -> list[list[int]]:
    """The +-1 sign matrix for ``random_projection``, derived from md5 so
    any engine (or auditor) can regenerate it independently:
    ``sign(i, j) = +1 iff the first hex nibble of md5("rp:i:j") is even``.

    A seeded PRNG matrix would tie the operator to one library's stream;
    a cryptographic-hash matrix is reproducible from the spec alone (the
    same determinism argument as the md5 corpus shuffle,
    operators/sampling.py) and each entry is an unbiased coin.
    """
    return [
        [
            1
            if int(hashlib.md5(f"{seed_tag}:{i}:{j}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for j in range(in_dims)
        ]
        for i in range(out_dims)
    ]


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dims: int = 16,
    in_dims: int = 64,
    micro: int = 1_000_000,
    seed_tag: str = "rp",
) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection: dim reduction
    d -> k before LSH/IVF candidate generation, so bucket hashing and
    distance screening read k numbers per vector instead of d (the
    standard 100 TB trick: project 768 -> 64, generate candidates in the
    small space, re-rank survivors with full vectors).

    ``proj[i] = sum_j sign(i, j) * round(vec[j] * micro)`` — components
    are quantized to exact integer micro-units FIRST (same fixed-point
    discipline as ``embedding_centroids``), so the projection is integer
    arithmetic: exact, associative, layout- and engine-independent.
    With +-1 signs the projection is distance-preserving in expectation
    (Achlioptas 2003 — database-friendly random projections; public
    result), and computing it is add/subtract only, no multiplies.

    The sign matrix is an in-plan literal (k x d ints), so the whole
    operator is a shuffle-free scan-side projection: transform ->
    zip_with -> aggregate, all inside whole-stage codegen.  No joins, no
    Python, no state — it composes with any downstream bucketing in the
    same stage.
    """
    signs = projection_signs(out_dims, in_dims, seed_tag)
    qvec = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * micro).cast("long")
    )
    out = df.withColumn("__q", qvec)
    proj = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.array(*[F.lit(s) for s in row]).cast("array<long>"),
                    F.col("__q"),
                    lambda s, q: s * q,
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            for row in signs
        ]
    )
    return out.withColumn("proj_micro", proj).drop("__q")


def semantic_dedup(
    embeddings: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.995,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_size: int = 10_000,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with spherical
    k-means, then inside each cluster drop every vector that has a
    lower-id neighbor with cosine ≥ ``threshold``.  Returns the
    SURVIVING rows ``(vec_id, cluster)``.

    Keeper policy: *dominated-by-any-lower-id* — deterministic
    (min-id representative per duplicate neighborhood) and biased
    toward over-removal on chains, the conservative direction for
    training data (a borderline near-dup costs less than a kept
    duplicate).  Candidate generation is cluster-local by construction:
    SemDeDup's observation is that ε-duplicates co-locate under
    k-means, so the quadratic term is per-cluster, not corpus-wide.

    100 TB shape: centroids train on a sample (train_ivf_centroids);
    assignment is a pure column expression (computable at ingest →
    the corpus can land pre-partitioned by cluster, making the
    self-join co-located).  Clusters above ``max_cluster_size`` are
    excluded from pairing (their rows all survive) and the skip is
    observable in the returned ``oversized`` flag — the same
    degenerate-bucket cap every dedup family here carries: a fixture
    where k-means collapses must not produce an O(n²) join.

    ``centroids`` accepts a pre-trained centroid set: centroid training
    is an OFFLINE cost (train on a sample once, reuse across runs — the
    same contract as the IVF index build), so callers that re-run the
    dedup pass should train once and pass the result instead of paying
    Lloyd iterations per run."""
    from ..functions import vec_normalize

    normed = embeddings.select(
        F.col(id_col).alias("id"), vec_normalize(vec_col).alias("v")
    )
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_centroids=n_clusters, vec_col=vec_col, id_col=id_col
        )
    # Table-form assignment (assign_clusters_table): O(1) generated-code
    # size in the centroid count, so n_clusters can follow SemDeDup's
    # ~sqrt(n) prescription — the cluster-LOCAL quadratic pairing term
    # below is n²/n_clusters, and with the literal-expression form the
    # janino compile cost capped n_clusters at 8, which made that term
    # dominate (measured 16.5 s of the old 16.9 s j2f bench row).
    assigned = assign_clusters_table(normed, centroids)
    # Unassignable rows (null/empty embedding → NULL cluster from the
    # table-form assignment) pass through as survivors: they have no
    # measurable cosine to anything, so they must not be dropped — and
    # an inner join on the (null) cluster key would do exactly that.
    sizes = (
        assigned.filter(F.col("cluster").isNotNull())
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("__csize"))
    )
    assigned = assigned.join(F.broadcast(sizes), "cluster", "left").withColumn(
        "oversized", F.coalesce(F.col("__csize") > max_cluster_size, F.lit(False))
    )
    small = assigned.filter(~F.col("oversized") & F.col("cluster").isNotNull())
    a = small.select(
        F.col("cluster"), F.col("id").alias("id_a"), F.col("v").alias("va")
    )
    b = small.select(
        F.col("cluster"), F.col("id").alias("id_b"), F.col("v").alias("vb")
    )
    dominated = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(vec_dot(F.col("va"), F.col("vb")) >= F.lit(threshold))
        .select(F.col("id_b").alias("id"))
        .distinct()
    )
    return (
        assigned.join(dominated, "id", "left_anti")
        .select(F.col("id").alias(id_col), "cluster", "oversized")
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "score",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): from each query's candidate pool (the exact or ANN
    top-N), greedily select ``k`` items maximizing
    ``lam·relevance − (1−lam)·max_similarity_to_already_selected`` —
    the standard diversity pass between retrieval and the context
    window, so near-duplicate passages don't crowd out coverage.

    Greedy selection is inherently sequential in ``k`` but independent
    per query, so the engine shape is ``applyInPandas`` over the query
    group: Arrow ships each (tiny — N candidates) group to one vectorized
    numpy loop.  This is the sanctioned custom-operator pattern (SURVEY
    §2.I): built-in operators cannot express a data-dependent greedy
    recurrence, and the Python work is O(N·k) on a few dozen rows per
    query — never corpus-scale.  Ties broken by id: deterministic."""
    import pandas as pd  # noqa: F401

    from pyspark.sql import types as T

    # Key/id output types mirror the INPUT schema (ADVICE r4: hardcoded
    # `long` broke any caller with string ids).
    out_schema = T.StructType(
        [
            T.StructField(query_col, candidates.schema[query_col].dataType),
            T.StructField(id_col, candidates.schema[id_col].dataType),
            T.StructField("mmr_rank", T.LongType()),
            T.StructField("mmr_score", T.DoubleType()),
        ]
    )

    def pick(pdf):
        import numpy as np

        vecs = np.stack(pdf[vec_col].to_numpy())
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        unit = vecs / norms[:, None]
        rel = pdf[score_col].to_numpy().astype("float64")
        ids = pdf[id_col].to_numpy()
        order = np.lexsort((ids,))  # stable id order for tie-breaks
        selected: list[int] = []
        scores: list[float] = []
        cand = list(order)
        while cand and len(selected) < k:
            best_i, best_s = None, None
            for i in cand:
                penalty = (
                    max(float(unit[i] @ unit[j]) for j in selected)
                    if selected
                    else 0.0
                )
                s = lam * rel[i] - (1.0 - lam) * penalty
                if best_s is None or s > best_s + 1e-12:
                    best_i, best_s = i, s
            selected.append(best_i)
            scores.append(best_s)
            cand.remove(best_i)
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[0],
                id_col: ids[selected],
                "mmr_rank": range(1, len(selected) + 1),
                "mmr_score": scores,
            }
        )

    return candidates.groupBy(query_col).applyInPandas(pick, out_schema)


def pq_best_expr(codebook: list[list[float]], m: int) -> F.Column:
    """The PQ argmin as a standalone Column (references ``__v`` and
    ``subspace``) — factored out of ``pq_assign`` so a MICRO-BATCH
    caller can build the k·dim literal tree ONCE per stream lineage
    and reuse it across batches: constructing these Column objects is
    thousands of py4j round-trips, measured 5–8.5 s per build at
    pq_k=16 × dim=64 — which dominated h22's per-batch wall when
    rebuilt inside ``foreachBatch`` (exec of the same pass: 0.6–1.9 s).
    Column expressions are immutable unbound trees; rebinding the same
    tree to each batch DataFrame is free."""
    k = len(codebook)
    dim = len(codebook[0])
    dsub = dim // m
    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    cands = []
    for c in range(k):
        cb = F.array(*[F.lit(float(x)) for x in codebook[c]])
        terms = None
        for i in range(dsub):
            idx = (F.col("subspace") * dsub + (i + 1)).cast("int")
            d = F.element_at(F.col("__v"), idx).cast("double") - F.element_at(cb, idx)
            t = d * d
            terms = t if terms is None else terms + t
        cands.append(F.struct(terms.alias("d2"), F.lit(c).cast("long").alias("code")))
    return F.array_min(F.array(*cands))


def pq_assign(
    df: DataFrame,
    codebook: list[list[float]],
    m: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
    best: F.Column | None = None,
) -> DataFrame:
    """Product-quantization assignment (Jégou et al., PAMI'11): split
    each vector into ``m`` subvectors and snap each to its nearest
    codeword from ``codebook`` (k full-dim vectors; subspace ``i`` uses
    their i-th slices).  The code tuple is the compressed representation
    ANN indexes store — k^m effective centroids for k·dim floats of
    codebook.

    Engine shape: the codebook is a handful of PLAN LITERALS (k·dim
    doubles — the sanctioned bounded-driver-state pattern, same as the
    k-means centroids above), so assignment is a pure per-row codegen
    expression with NO shuffle and NO join: the subspace index
    explodes FIRST (a 1→m Generate), then each output row evaluates
    only its own k squared-distance sums and one array_min over
    (d2, code) structs for the argmin (ties → lowest code,
    deterministic).  Ordering matters for codegen: building all
    m·k·dsub distance terms inside the Generate consume (the explode-
    last formulation) inlines every argmin twice and blows janino's
    64 KB method limit — whole-stage codegen silently falls back to
    interpreted mode, measured 4× slower at sf0.1.  At 100 TB this
    pipelines with the scan, and the output is groupable by
    (subspace, code) for inverted-list builds.  Distances are exact
    double arithmetic in a fixed left-to-right term order, so
    ``dist2_fp = floor(scale·d2 + 0.5)`` is bit-reproducible on any
    engine.  ``best`` takes a prebuilt ``pq_best_expr`` column —
    micro-batch callers build it once per lineage."""
    rows = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("subspace"),
    )
    if best is None:
        best = pq_best_expr(codebook, m)
    return rows.select(
        id_col,
        F.col("subspace").cast("long").alias("subspace"),
        best["code"].alias("code"),
        F.floor(F.lit(scale) * best["d2"] + F.lit(0.5)).cast("long").alias("dist2_fp"),
    )


def seed_codebook(
    df: DataFrame, k: int = 4, vec_col: str = "embedding", id_col: str = "vec_id"
) -> list[list[float]]:
    """Deterministic seed codebook: the ``k`` lowest-id vectors —
    k·dim floats of bounded driver state (the k-means++ seeding spot;
    a Lloyd refinement pass would slot in here unchanged)."""
    rows = df.orderBy(id_col).select(vec_col).limit(k).collect()
    return [list(r[0]) for r in rows]


def pq_codes(
    df: DataFrame,
    codebook: list[list[float]],
    m: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    best: F.Column | None = None,
) -> DataFrame:
    """Per-vector PQ code ARRAY (length ``m``, code of each subspace in
    order) — ``pq_assign`` pivoted to the at-rest layout an IVF-PQ
    index stores next to the cluster id.  One shuffle at INDEX BUILD
    time (offline); query-time consumers read the array."""
    return (
        pq_assign(df, codebook, m=m, vec_col=vec_col, id_col=id_col, best=best)
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("subspace", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
    )


def ivfpq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 6,
    assign: int = 2,
    m: int = 8,
    pq_k: int = 16,
    shortlist: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list[list[float]] | None = None,
    codebook: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-PQ with asymmetric distance computation (Jégou et al.,
    PAMI'11) — THE 100 TB ANN shape: probe ``nprobe`` inverted lists
    (IVF), rank candidates by table-lookup ADC over their stored PQ
    codes (never touching candidate vectors), exact-rerank only the
    ``shortlist`` survivors.  At scale the index stores (cluster,
    codes[m]) per vector — m bytes of code instead of dim·4 of floats —
    so the probe scan reads ~32× less and the full-precision vectors
    are fetched for shortlist·|queries| rows only.

    Engine decomposition, all existing pieces:
    - index side: spherical-k-means cluster assignment with boundary
      replication (= ``ivf_ann_topk``) + ``pq_codes`` over UNIT
      vectors (unit-sphere L2 is monotone in cosine, so ADC ranks in
      cosine order);
    - query side: each query precomputes its m×pq_k LUT — built by a
      (mi, c) slot explode + collect (tiny: |queries|·m·pq_k rows; a
      single flat literal expression would re-blow the janino 64 KB
      limit that ``pq_assign`` documents);
    - ADC = Σ_m lut[mi·pq_k + codes[mi]] — an 8-step fold per
      candidate, no vector math;
    - exact cosine rerank of the shortlist, deterministic ties.

    Returns (query_id, neighbor_id, sim, rnk≤k).  Recall is governed
    by (nprobe, assign) × (pq_k, shortlist); defaults clear the ≥0.8
    recall@5 bar on the adversarial random fixture
    (tests/test_similarity.py)."""
    from ..functions import vec_normalize

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids, vec_col=vec_col, id_col=id_col
        )
    if codebook is None:
        normed = corpus.select(
            F.col(id_col), vec_normalize(vec_col).alias("__nv")
        )
        codebook = seed_codebook(
            normed.select(id_col, F.col("__nv").alias(vec_col)), k=pq_k
        )
    indexed = _ivfpq_indexed(corpus, centroids, codebook, m, assign, id_col, vec_col)
    return _adc_query(
        indexed, queries, centroids, codebook, k, nprobe, m, pq_k, shortlist,
        id_col, vec_col, query_id_col,
    )


def prepare_ivfpq_exprs(
    centroids: list[list[float]],
    codebook: list[list[float]],
    m: int,
    assign: int,
) -> dict:
    """Prebuild the two literal-heavy Column trees an ``_ivfpq_indexed``
    pass needs — the per-batch py4j construction cost was the dominant
    term of the h22 maintenance stream's wall (see ``pq_best_expr``):
    build once per stream lineage, rebind per micro-batch."""
    return {
        "cluster_ranks": F.slice(
            centroid_ranks_expr("__nv", centroids), 1, assign
        ),
        "pq_best": pq_best_expr(codebook, m),
    }


def _ivfpq_indexed(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebook: list[list[float]],
    m: int,
    assign: int,
    id_col: str,
    vec_col: str,
    exprs: dict | None = None,
) -> DataFrame:
    """The IVF-PQ index relation ``(id, vec, __cluster*, codes[m])`` —
    spherical cluster assignment with boundary replication + PQ codes
    over UNIT vectors (unit-sphere L2 is monotone in cosine).

    Round-13: delegates to ``ivfpq_indexed_arrow`` (one MapInArrow
    node, constant plan size — removes both the per-batch Catalyst
    analysis of the k·dim literal trees and their ~0.5 ms/row
    evaluation; bit-exactness contract + pin above).  Pass ``exprs``
    (a ``prepare_ivfpq_exprs`` dict) to force the literal-expression
    form — kept as the plan-literal reference and for the equality
    test."""
    if exprs is not None:
        return _ivfpq_indexed_expr(
            corpus, centroids, codebook, m, assign, id_col, vec_col, exprs
        )
    return ivfpq_indexed_arrow(
        corpus, centroids, codebook, m, assign, id_col, vec_col
    )


def _ivfpq_indexed_expr(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebook: list[list[float]],
    m: int,
    assign: int,
    id_col: str,
    vec_col: str,
    exprs: dict | None = None,
) -> DataFrame:
    """The literal-expression form of ``_ivfpq_indexed`` (pre-round-13
    default): the k·dim centroid + codebook trees inlined as plan
    literals.  ``exprs`` takes a ``prepare_ivfpq_exprs`` dict."""
    from ..functions import vec_normalize

    if exprs is None:
        exprs = prepare_ivfpq_exprs(centroids, codebook, m, assign)
    normed = corpus.select(
        F.col(id_col), F.col(vec_col), vec_normalize(vec_col).alias("__nv")
    )
    codes = pq_codes(
        normed.select(id_col, F.col("__nv").alias(vec_col)),
        codebook,
        m=m,
        best=exprs["pq_best"],
    )
    return (
        normed.withColumn("__cluster", F.explode(exprs["cluster_ranks"]))
        .join(codes, id_col)
        .select(id_col, vec_col, "__cluster", "codes")
    )


def write_ivfpq_index(
    corpus: DataFrame,
    path: str,
    centroids: list[list[float]],
    codebook: list[list[float]],
    m: int = 8,
    assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF-PQ index as a ``cluster``-partitioned parquet
    layout — the at-rest form of the 100 TB ANN contract (same storage
    discipline as ``write_ivf_index``, plus the m-byte PQ codes the ADC
    probe ranks on without touching candidate vectors).  Built ONCE at
    ingest; queries partition-prune to their ``nprobe`` cluster
    directories.  Clustered by ``cluster`` before the write: one file
    per list per job."""
    indexed = _ivfpq_indexed(
        corpus, centroids, codebook, m, assign, id_col, vec_col
    ).withColumnRenamed("__cluster", "cluster")
    (
        indexed.repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(path)
    )


def ivfpq_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    codebook: list[list[float]],
    k: int = 5,
    nprobe: int = 6,
    m: int = 8,
    pq_k: int = 16,
    shortlist: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Query a ``write_ivfpq_index`` layout: partition-pruned scan of
    the query batch's probed clusters (the probed-cluster list is a
    driver-side collect bounded by ``n_queries × nprobe`` integers),
    then the identical ADC → shortlist → exact-rerank pipeline as
    ``ivfpq_adc_topk`` — equivalence with the in-memory form under the
    same centroids/codebook is pytest-pinned.  ``path`` may be a plain
    layout or a versioned index root (resolved to the current
    committed version)."""
    from ..functions import vec_normalize
    from .index_commit import resolve_index_path

    path = resolve_index_path(spark, path)

    q = queries.select(
        query_id_col, vec_normalize(vec_col).alias("__qv")
    ).withColumn(
        "__cluster",
        F.explode(F.slice(centroid_ranks_expr("__qv", centroids), 1, nprobe)),
    )
    probed = sorted({r[0] for r in q.select("__cluster").distinct().collect()})
    indexed = (
        spark.read.parquet(path)
        .filter(F.col("cluster").isin(probed))
        .withColumnRenamed("cluster", "__cluster")
    )
    return _adc_query(
        indexed, queries, centroids, codebook, k, nprobe, m, pq_k, shortlist,
        id_col, vec_col, query_id_col,
    )


def _adc_query(
    indexed: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebook: list[list[float]],
    k: int,
    nprobe: int,
    m: int,
    pq_k: int,
    shortlist: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """ADC probe over an ``(id, vec, __cluster, codes)`` index relation:
    per-query LUT build, table-lookup ADC rank, shortlist, exact cosine
    rerank — the query half shared by ``ivfpq_adc_topk`` (in-memory
    index) and ``ivfpq_index_topk`` (parquet index)."""
    from ..functions import vec_cosine, vec_normalize

    dim = len(codebook[0])
    dsub = dim // m

    # ---- query-side LUT via a BROADCAST COMPONENT TABLE ----
    # (the assign_clusters_table form, round 11): the previous literal
    # form inlined pq_k × dim codebook floats into ONE generated
    # method, referenced dsub times — the j3j 64 KB-class codegen
    # surface, whose janino+C2 compile dominated the j3k/j3o
    # first-execution cost (measured 9.65 s first vs 2.05 s second in
    # one session) and which stops compiling at production sizes
    # (dim 1024 × pq_k 256 = 262k literals).  The table form is O(1)
    # in generated-code size: posexplode the (unit) query vector,
    # broadcast-join the (i, c, x) codebook components, one
    # map-side-combinable (query, mi, c) squared-distance aggregate,
    # then the same slot-sorted collect.  (Per-subspace sums now
    # accumulate in aggregate order rather than the literal form's
    # fixed left-to-right chain — an ULP-level reordering; ADC ranks
    # are approximate by contract and the shortlist rerank is exact.)
    spark = queries.sparkSession
    comp = spark.createDataFrame(
        [
            (i, c, float(x))
            for c, row in enumerate(codebook)
            for i, x in enumerate(row)
        ],
        "i int, c int, x double",
    )
    q0 = queries.select(query_id_col, vec_normalize(vec_col).alias("__qv"))
    qcomp = q0.select(query_id_col, F.posexplode("__qv").alias("i", "qx"))
    d2 = (
        qcomp.join(F.broadcast(comp), "i")
        .withColumn("__d", F.col("qx").cast("double") - F.col("x"))
        .groupBy(
            query_id_col,
            (F.col("i") / dsub).cast("int").alias("mi"),
            "c",
        )
        .agg(F.sum(F.col("__d") * F.col("__d")).alias("d2"))
    )
    luts = (
        d2.select(
            query_id_col,
            (F.col("mi") * pq_k + F.col("c")).alias("slot"),
            "d2",
        )
        .groupBy(query_id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("slot", "d2"))),
                lambda s: s["d2"],
            ).alias("__lut")
        )
    )
    probes = (
        q0.withColumn(
            "__cluster",
            F.explode(F.slice(centroid_ranks_expr("__qv", centroids), 1, nprobe)),
        )
        .join(luts, query_id_col)
        .select(query_id_col, "__qv", "__cluster", "__lut")
    )

    # ---- probe: ADC rank, shortlist, exact rerank ----
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, mi: acc
        + F.element_at(
            F.col("__lut"),
            (mi * pq_k + F.element_at(F.col("codes"), mi + F.lit(1)) + 1).cast("int"),
        ),
    )
    cands = (
        indexed.join(F.broadcast(probes), "__cluster")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            "__qv",
            vec_col,
            adc.alias("__adc"),
        )
        .distinct()
    )
    w_short = Window.partitionBy(query_id_col).orderBy(F.col("__adc"), "neighbor_id")
    short = cands.withColumn("__srnk", F.row_number().over(w_short)).filter(
        F.col("__srnk") <= shortlist
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        short.select(
            query_id_col,
            "neighbor_id",
            vec_cosine("__qv", vec_col).alias("sim"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def mrl_truncation_eval(
    emb: DataFrame,
    query_filter,
    dims: tuple[int, ...] = (64, 32, 16, 8),
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-truncation retrieval evaluation (Kusupati et al.
    2022, MRL — the dimension-vs-recall tradeoff report that decides
    how many dims a 100 TB embedding store actually persists): for
    each candidate prefix length, run exact cosine top-k with BOTH
    sides truncated to the prefix and score recall@k against the
    full-dimension ground truth.

    One row per dim: (dim, n_queries, hits, recall_ppm) — recall in
    exact integer ppm (Σ|truncated∩full| · 10⁶ div (k·|queries|)).
    The full-width entry scores 10⁶ by construction (self-check).
    Shape: |dims|+1 brute-force passes over the corpus with the
    query side broadcast — an evaluation harness run on a SAMPLE, not
    a production scan (production uses the chosen dim's IVF/PQ
    index; this report chooses it)."""
    queries = emb.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col)
    )
    truth = brute_force_topk(emb, queries, k, id_col, vec_col).select(
        "query_id", F.col("neighbor_id").alias("true_id")
    )
    n_queries = queries.count()
    if n_queries == 0:
        # a silent 0-recall report would read as "truncation destroyed
        # retrieval"; an empty query sample is a caller bug — and under
        # the repo's ANSI sessions div-by-zero below would error anyway
        raise ValueError(
            "mrl_truncation_eval: query_filter selected no rows — "
            "recall over an empty query sample is undefined"
        )
    out = None
    for dim in dims:
        t_emb = emb.select(id_col, F.slice(vec_col, 1, dim).alias(vec_col))
        t_q = queries.select(
            "query_id", F.slice(vec_col, 1, dim).alias(vec_col)
        )
        got = brute_force_topk(t_emb, t_q, k, id_col, vec_col).select(
            "query_id", "neighbor_id"
        )
        hits = got.join(
            truth,
            (got["query_id"] == truth["query_id"])
            & (got["neighbor_id"] == truth["true_id"]),
        ).count()
        row = emb.sparkSession.createDataFrame(
            [(dim, n_queries, hits)], "dim long, n_queries long, hits long"
        ).select(
            "dim",
            "n_queries",
            "hits",
            F.expr(f"div(1000000 * hits, {k} * n_queries)").alias("recall_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _commit_rebuilt_layout(spark, index_dir: str, write_staged) -> None:
    """Shared commit step for the index rebuilds: write the new layout
    via ``write_staged(path)`` and make it live.

    - **Versioned root** (``operators.index_commit`` protocol — the
      production shape): stage into the next ``v_NNNNNN`` dir, then
      ``commit_index_version`` = ONE atomic marker-file create.  No
      window where nothing is live, concurrent readers finish on the
      old version's (untouched) files, a crash mid-write leaves only
      an invisible staging dir, and the old version survives until an
      explicit ``prune_index_versions`` — so the caller's quality gate
      can still fall back (ADVICE r11 medium, closed).
    - **Plain directory** (legacy local layout): sibling write, then
      live → ``__old``, staging → live via the Hadoop FileSystem API
      (URI parity).  This path has a documented NON-ATOMIC window
      between the two renames in which the live path does not exist —
      acceptable only where no reader runs concurrently (the local
      test/sandbox shape); ``__old`` is KEPT (never rmtree'd) so a
      crash in the window is recoverable by hand and the previous
      index outlives the swap.  Deployments with concurrent readers
      must use a versioned root."""
    from .index_commit import (
        begin_index_version,
        commit_index_version,
        is_index_root,
    )

    if is_index_root(spark, index_dir):
        staged = begin_index_version(spark, index_dir)
        write_staged(staged)
        commit_index_version(spark, staged)
        return
    staging = f"{index_dir.rstrip('/')}__rebuild"
    write_staged(staging)
    jvm = spark._jvm
    hlive = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = hlive.getFileSystem(spark._jsc.hadoopConfiguration())
    hold = jvm.org.apache.hadoop.fs.Path(f"{index_dir.rstrip('/')}__old")
    fs.delete(hold, True)
    fs.rename(hlive, hold)
    fs.rename(jvm.org.apache.hadoop.fs.Path(staging), hlive)


def rebuild_ivf_index(
    spark,
    index_dir: str,
    n_centroids: int = 16,
    n_iters: int = 3,
    assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Re-train + REBUILD a maintained IVF layout — the offline event
    the maintenance stream's ``growth_skew_permille`` drift observable
    schedules (the other half of the frozen-centroid contract in
    ``streaming.ingest.run_ivf_maintenance_stream``: the stream never
    moves a centroid, so when the data distribution drifts, quality is
    restored by re-training on what actually accumulated and
    rewriting the inverted file once).

    Steps, all standard at-rest machinery:

    1. Read the maintained layout back (``resolve_index_path`` — a
       plain dir or the current version of a versioned root) and
       collapse it to one row per vector (boundary-replicated
       ``cluster`` slices and replay/redelivery duplicates fold in a
       ``dropDuplicates`` on the id — the rows are content-addressed).
    2. ``train_ivf_centroids`` on the deduplicated corpus (sampled
       upstream at 100 TB — the training-scan contract documented
       there).
    3. ``write_ivf_index`` to a staging path and commit via
       ``_commit_rebuilt_layout`` — an atomic marker-file commit on a
       versioned root (object-store-safe), a documented-window sibling
       swap on a legacy plain dir.

    Returns the new centroids — the caller hands them to the next
    ``run_ivf_maintenance_stream`` lineage (new checkpoint, fresh
    ledger semantics) and to the query path.  Quality is re-checked
    the same way the maintenance stream is gated: the j3q recall
    composition (test-pinned)."""
    from .index_commit import resolve_index_path

    live = resolve_index_path(spark, index_dir)
    corpus = (
        spark.read.parquet(live)
        .select(id_col, vec_col)
        .dropDuplicates([id_col])
        .localCheckpoint(eager=True)
    )
    centroids = train_ivf_centroids(
        corpus, n_centroids=n_centroids, n_iters=n_iters,
        vec_col=vec_col, id_col=id_col,
    )
    _commit_rebuilt_layout(
        spark,
        index_dir,
        lambda staged: write_ivf_index(
            corpus, staged, centroids, assign=assign,
            id_col=id_col, vec_col=vec_col,
        ),
    )
    return centroids


def train_pq_codebook(
    df: DataFrame,
    k: int = 16,
    n_iters: int = 3,
    m: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Lloyd-refined PQ codebook — the training pass ``seed_codebook``
    documents as "a Lloyd refinement would slot in here unchanged".
    Proper Lloyd for the repo's SHARED-codebook PQ structure
    (``pq_assign``: codeword ``c``'s i-th SLICE serves subspace ``i``)
    is per-subspace k-means over the UNIT vectors: each iteration
    assigns every (vector, subspace) slice to its nearest codeword
    slice with ``pq_assign`` itself (so training optimizes exactly the
    quantizer the index stores), then updates each codeword slice to
    the mean of its assigned slices — full-dim spherical k-means is
    the WRONG refinement here (the sphere renormalization rescales
    every slice by the full-vector norm factor, measurably hurting ADC
    recall on the drift fixture).

    A drift rebuild MUST re-train on the accumulated distribution —
    the deterministic lowest-id seeds alone would keep quantizing with
    pre-drift codewords and recall would not recover.  Per iteration:
    one codegen assignment pass + one posexplode/groupBy mean (both
    map-side combinable); k·dim doubles of driver state between
    iterations — the ``train_ivf_centroids`` scale contract (train on
    a sample at 100 TB)."""
    from ..functions import vec_normalize

    dim = len(df.select(vec_col).first()[0])
    dsub = dim // m
    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    normed = df.select(
        F.col(id_col), vec_normalize(vec_col).alias(vec_col)
    ).persist()
    codebook = seed_codebook(normed, k=k, vec_col=vec_col, id_col=id_col)
    for _ in range(n_iters):
        assigned = pq_assign(
            normed, codebook, m=m, vec_col=vec_col, id_col=id_col
        ).select(id_col, "subspace", "code")
        means = (
            assigned.join(normed, id_col)
            .select(
                "subspace",
                "code",
                F.posexplode(vec_col).alias("pos0", "x"),
            )
            # keep only the positions inside this row's subspace slice
            .filter(
                (F.col("pos0") >= F.col("subspace") * dsub)
                & (F.col("pos0") < (F.col("subspace") + 1) * dsub)
            )
            .groupBy("code", "pos0")
            .agg(F.avg("x").alias("mval"))
            .collect()
        )
        new = [list(c) for c in codebook]  # empty slots keep old slice
        for r in means:
            new[r["code"]][r["pos0"]] = r["mval"]
        codebook = new
    normed.unpersist()
    return codebook


def rebuild_ivfpq_index(
    spark,
    index_dir: str,
    n_centroids: int = 16,
    pq_k: int = 16,
    n_iters: int = 3,
    m: int = 8,
    assign: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[list[float]]]:
    """Re-train + REBUILD a maintained IVF-PQ layout (VERDICT r11 #2 —
    the lifecycle hole: the layout the 100 TB query path actually
    reads had maintenance-in but no maintenance-out).  The
    ``rebuild_ivf_index`` mechanics extended to the second frozen
    model: BOTH the centroids AND the PQ codebook re-train on the
    accumulated corpus (``train_ivf_centroids`` +
    ``train_pq_codebook``), then one ``write_ivfpq_index`` build is
    committed through the same staging protocol (atomic marker commit
    on a versioned root; documented-window sibling swap on a legacy
    plain dir).

    Returns ``(centroids, codebook)`` — the caller hands the pair to
    the next ``run_ivfpq_maintenance_stream`` lineage and to
    ``ivfpq_index_topk``.  Quality gate: the drift→rebuild→ADC-recall-
    restored e2e test (tests/test_streaming_ingest.py), the h20 shape
    applied to the PQ path."""
    from .index_commit import resolve_index_path

    live = resolve_index_path(spark, index_dir)
    corpus = (
        spark.read.parquet(live)
        .select(id_col, vec_col)
        .dropDuplicates([id_col])
        .localCheckpoint(eager=True)
    )
    centroids = train_ivf_centroids(
        corpus, n_centroids=n_centroids, n_iters=n_iters,
        vec_col=vec_col, id_col=id_col,
    )
    codebook = train_pq_codebook(
        corpus, k=pq_k, n_iters=n_iters, m=m, vec_col=vec_col, id_col=id_col
    )
    _commit_rebuilt_layout(
        spark,
        index_dir,
        lambda staged: write_ivfpq_index(
            corpus, staged, centroids, codebook, m=m, assign=assign,
            id_col=id_col, vec_col=vec_col,
        ),
    )
    return centroids, codebook
