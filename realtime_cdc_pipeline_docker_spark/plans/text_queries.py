"""Text-analysis & exact-dedup queries over `documents`
(SURVEY §2.J1/J4/J5).  Oracle SQL is generated from the same frozen
marker lists / patterns the Spark operators use, so both sides compute
the identical deterministic function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import TOKEN_PATTERN, regex_token_count, token_count
from ..operators import multimodal
from ..operators.dedup import dedup_exact, simhash_pairs
from ..operators.text import LANG_MARKERS, LANG_PRIORITY, fingerprint, lang_id, lang_scores, quality_score
from .registry import register


@register(
    "j1_dedup_exact",
    oracle="""
    SELECT min(doc_id) AS doc_id, COUNT(*) AS dup_count
    FROM documents
    GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
    """,
)
def j1_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one row per normalized text (min doc_id kept).
    Spark side groups on the sha2-256 digest — 32-byte shuffle keys
    instead of document bodies, the only shape that works at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_exact(docs)


@register(
    "j4a_text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS BIGINT) AS n_tokens_bpe,
           length(text) / len(string_split_regex(trim(text), '\\s+')) AS avg_token_len
    FROM documents
    """,
)
def j4a_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (J4): whitespace tokens + BPE-ish regex tokens +
    average token length.  Pure row-local codegen expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        token_count("text").cast("long").alias("n_tokens"),
        regex_token_count("text").cast("long").alias("n_tokens_bpe"),
        (F.length("text").cast("double") / token_count("text")).alias("avg_token_len"),
    )


def _lang_oracle() -> str:
    toks = "list_transform(string_split_regex(trim(text), '\\s+'), t -> lower(t))"
    score_exprs = {
        lang: (
            f"len(list_filter({toks}, t -> t IN "
            f"({', '.join(repr(m) for m in markers)})))"
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_PRIORITY) + ")"
    case = f"CASE WHEN {best} = 0 THEN 'und' " + " ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in LANG_PRIORITY
    ) + " ELSE 'und' END"
    scores_sql = ", ".join(f"{expr} AS s_{lang}" for lang, expr in score_exprs.items())
    return f"""
    SELECT doc_id, lang, {case} AS predicted_lang
    FROM (SELECT doc_id, lang, {scores_sql} FROM documents)
    """


@register("j4b_lang_id", oracle=_lang_oracle())
def j4b_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID heuristic (J4): per-language stopword-marker hit
    counts, argmax with fixed priority tie-break.  Output carries the
    labeled lang alongside the prediction for accuracy audits."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_id("text").alias("predicted_lang"))


@register(
    "j4c_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
           least(len(string_split_regex(trim(text), '\\s+')) / 100.0, 1.0) * 0.5
             + length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text) * 0.5
             AS quality
    FROM documents
    """,
)
def j4c_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (J4): length + alphabetic-ratio composite in [0,1].
    Integer counts + IEEE double division → bit-exact vs the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").cast("long").alias("n_tokens"),
        quality_score("text").alias("quality"),
    )


@register(
    "j4d_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def j4d_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (J4): md5 over normalized text —
    engine-portable digest for cross-system dedup joins."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fingerprint"))


@register("j2c_simhash_neardup", oracle=None)
def j2c_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (J2): 64-bit signatures, 4×16-bit band
    candidate join, exact hamming verify ≤3.  No SQL oracle (xxhash64 is
    Spark-specific); invariant-tested in tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs)


@register(
    "j5_multimodal_plumbing",
    oracle="""
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
           sha256(text) AS digest, 'text/plain' AS mime
    FROM documents
    """,
)
def j5_multimodal_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal columns (J5): opaque binary payload + typed metadata
    struct; byte-level ops (length, sha2 digest) on the payload.  The
    payload here is UTF-8 text bytes, so DuckDB's sha256(VARCHAR) —
    which hashes the UTF-8 encoding — is an exact oracle."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(docs)
    return media.select(
        "doc_id",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("digest"),
        F.col("meta.mime").alias("mime"),
    )


@register("j5b_multimodal_features", oracle=None)
def j5b_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode / feature extraction (J5): Arrow-batched
    ``mapInPandas`` with a declared output schema.  The media decoder is
    a deterministic STUB (no media libs in this container) — the batch
    plumbing is the real deliverable; rows-only check + pytest."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(docs)
    return multimodal.extract_features(media)


@register("j5c_image_resize", oracle=None)
def j5c_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize path (J5): binary payloads through the Arrow-batched
    mapInPandas resize stub — exact output sizing tested in
    tests/test_multimodal.py."""
    from ..operators.multimodal import attach_binary_payload, resize_images

    docs = load_table(spark, sf_dir, "documents")
    return resize_images(attach_binary_payload(docs), width=32, height=32)


@register("j5d_frame_sample", oracle=None)
def j5d_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (J5): 1→N row expansion streaming out of the
    decoder iterator (no pre-materialized frame arrays)."""
    from ..operators.multimodal import attach_binary_payload, sample_frames

    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary_payload(docs))


@register("j4e_winnow_fingerprints", oracle=None)
def j4e_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) document fingerprints (J4, MOSS
    algorithm): windowed minima over k-gram hashes — shared-region
    guarantee and density tested in tests/test_dedup.py.  Rows-only:
    fingerprints are xxhash64 values (no cross-engine hash oracle)."""
    from ..operators.text import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs)
