"""Deduplication operators for training-data pipelines (SURVEY §2.J1/J2).

Four families, all expressed as DataFrame transformations designed for
the 100 TB shape of the problem:

- **Exact** — hash the normalized text to a 32-byte digest and keep one
  row per digest.  Shuffling 32-byte keys instead of document bodies is
  the difference between a feasible and an infeasible job at scale.
- **MinHash + LSH** — char-shingle → k minhash values → band → bucket
  self-join.  Candidate generation is O(n) per band bucket instead of
  O(n²); only candidates pay the exact-Jaccard verification.
- **SimHash** — 64-bit signature whose hamming distance approximates
  token-multiset similarity; banding the 64 bits into 4×16-bit keys
  finds all pairs within hamming≤3 without a cross join (pigeonhole:
  any pair differing in ≤3 bits agrees on ≥1 of 4 bands).
- **Embedding cosine** — see operators/similarity.py (random-hyperplane
  LSH buckets + in-bucket verification).

Everything is built-in-function codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    char_shingles,
    minhash_signature,
    simhash_from_votes,
    simhash_votes,
    ws_tokens,
)


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


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH + exact-Jaccard verification.

    rows_per_band = num_hashes/bands controls the S-curve: with 8 bands
    of 4 rows, pairs at Jaccard ~0.5 have ~90% collision probability.
    Returns (id_a, id_b, jaccard) with id_a < id_b.

    Scale: the only shuffles are the band-bucket exchange (keys are
    (band_id, 8-byte hash)) and the verification join on doc ids.  A
    bucket containing B docs yields B² candidates — at 100 TB add a
    bucket-size cap (count per bucket, drop degenerate mega-buckets:
    they are near-identical boilerplate better handled by exact dedup).
    """
    rows_per_band = num_hashes // bands
    base = (
        df.select(
            F.col(id_col).alias("id"),
            char_shingles(text_col, shingle_k).alias("shingles"),
        )
        .withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))
        # The signature table feeds the band explode AND both sides of
        # the candidate self-join AND the verification join; without
        # materialization Spark recomputes shingling+hashing 4x.  At
        # 100 TB this is a written signature table; locally, persist.
        .persist()
    )

    banded = base.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("id", "band.band_id", "band.band_hash")

    left = banded.alias("x")
    right = banded.alias("y")
    candidates = (
        left.join(
            right,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )

    shingle_sets = base.select("id", "shingles")
    verified = (
        candidates.join(
            shingle_sets.withColumnRenamed("id", "id_a").withColumnRenamed(
                "shingles", "sh_a"
            ),
            "id_a",
        )
        .join(
            shingle_sets.withColumnRenamed("id", "id_b").withColumnRenamed(
                "shingles", "sh_b"
            ),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs via 64-bit SimHash with 4×16-bit banding.

    Any pair with hamming ≤ 3 shares at least one exact 16-bit band
    (pigeonhole over 4 bands), so banding finds every such pair without
    a cross join; candidates are verified with an exact popcount.
    Returns (id_a, id_b, hamming)."""
    from ..functions import hamming64

    sigs = (
        df.select(
            F.col(id_col).alias("id"),
            simhash_votes(ws_tokens(normalize_text(text_col))).alias("votes"),
        )
        .withColumn("sim", simhash_from_votes("votes"))
        .drop("votes")
        .persist()  # referenced by both sides of the band self-join
    )
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

    x, y = banded.alias("x"), banded.alias("y")
    candidates = (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.sim").alias("sim_a"),
            F.col("y.sim").alias("sim_b"),
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
) -> DataFrame:
    """Word n-gram Jaccard near-dup via inverted-index join.

    Explodes each doc's distinct n-grams, joins on the n-gram hash
    (inverted index), counts co-occurrences per pair, and computes
    |A∩B| / (|A|+|B|-|A∩B|) — never materializes the O(n²) pair space,
    only pairs sharing ≥1 n-gram.  At 100 TB, drop stop-grams (df-top
    frequent n-grams) before the join to kill the skew; here the data is
    small enough not to."""
    grams = (
        df.select(
            F.col(id_col).alias("id"),
            # Materialize the token array once; referencing the
            # tokenization expression inside the lambdas below would
            # re-run it per n-gram (no CSE across lambda boundaries).
            ws_tokens(normalize_text(text_col)).alias("toks"),
        )
        .select(
            "id",
            F.array_distinct(
                F.transform(
                    F.filter(
                        F.transform(
                            F.sequence(
                                F.lit(0), F.greatest(F.size("toks") - n, F.lit(0))
                            ),
                            lambda i: F.slice(F.col("toks"), i + 1, n),
                        ),
                        lambda arr: F.size(arr) == n,
                    ),
                    lambda arr: F.xxhash64(F.concat_ws(" ", arr)),
                )
            ).alias("grams"),
        )
        .withColumn("n_grams", F.size("grams"))
    )

    inv = grams.select(
        "id", "n_grams", F.explode("grams").alias("gram")
    ).persist()  # both sides of the inverted-index self-join
    x, y = inv.alias("x"), inv.alias("y")
    co = (
        x.join(y, (F.col("x.gram") == F.col("y.gram")) & (F.col("x.id") < F.col("y.id")))
        .groupBy(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.n_grams").alias("na"),
            F.col("y.n_grams").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        co.withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
