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


@register("j3b_ann_lsh_topk", oracle=None)
def j3b_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets (J3 scale
    path): corpus pre-bucketable at ingest, queries probe one bucket.
    Recall vs brute force asserted in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_ann_topk(emb, queries, k=_TOP_K).select(
        "query_id", "neighbor_id", "rnk"
    )


@register("j2_minhash_neardup", oracle=None)
def j2_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate pairs (J2): shingle → 32-hash MinHash
    signature → 8×4 band buckets → candidate join → exact Jaccard ≥ 0.5.
    Planted-duplicate detection tested in tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs)


@register("j2b_ngram_jaccard", oracle=None)
def j2b_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup via inverted-index join (J2):
    explodes n-grams, joins on gram hash, never materializes O(n²)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs)


@register("j2d_embedding_neardup", oracle=None)
def j2d_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (J2/J3): hyperplane-LSH bucket
    self-join + exact cosine ≥ 0.9 verification."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.9)
