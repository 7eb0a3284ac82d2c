"""Text-analysis & exact-dedup queries over `documents`
(SURVEY §2.J1/J4/J5).  Oracle SQL is generated from the same frozen
marker lists / patterns the Spark operators use, so both sides compute
the identical deterministic function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@register(
    "j2c_simhash_neardup",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(t, ' ')) AS tok
      FROM (SELECT doc_id, lower(trim(regexp_replace(text,'\\s+',' ','g'))) AS t
            FROM documents)
    ), h AS (
      SELECT doc_id, CAST('0x' || substr(md5(tok),1,15) AS BIGINT) AS hv FROM toks
    ), votes AS (
      SELECT doc_id,
             SUM(CASE WHEN (hv >> 0) & 1 = 1 THEN 1 ELSE -1 END) AS v0,
             SUM(CASE WHEN (hv >> 1) & 1 = 1 THEN 1 ELSE -1 END) AS v1,
             SUM(CASE WHEN (hv >> 2) & 1 = 1 THEN 1 ELSE -1 END) AS v2,
             SUM(CASE WHEN (hv >> 3) & 1 = 1 THEN 1 ELSE -1 END) AS v3,
             SUM(CASE WHEN (hv >> 4) & 1 = 1 THEN 1 ELSE -1 END) AS v4,
             SUM(CASE WHEN (hv >> 5) & 1 = 1 THEN 1 ELSE -1 END) AS v5,
             SUM(CASE WHEN (hv >> 6) & 1 = 1 THEN 1 ELSE -1 END) AS v6,
             SUM(CASE WHEN (hv >> 7) & 1 = 1 THEN 1 ELSE -1 END) AS v7,
             SUM(CASE WHEN (hv >> 8) & 1 = 1 THEN 1 ELSE -1 END) AS v8,
             SUM(CASE WHEN (hv >> 9) & 1 = 1 THEN 1 ELSE -1 END) AS v9,
             SUM(CASE WHEN (hv >> 10) & 1 = 1 THEN 1 ELSE -1 END) AS v10,
             SUM(CASE WHEN (hv >> 11) & 1 = 1 THEN 1 ELSE -1 END) AS v11,
             SUM(CASE WHEN (hv >> 12) & 1 = 1 THEN 1 ELSE -1 END) AS v12,
             SUM(CASE WHEN (hv >> 13) & 1 = 1 THEN 1 ELSE -1 END) AS v13,
             SUM(CASE WHEN (hv >> 14) & 1 = 1 THEN 1 ELSE -1 END) AS v14,
             SUM(CASE WHEN (hv >> 15) & 1 = 1 THEN 1 ELSE -1 END) AS v15,
             SUM(CASE WHEN (hv >> 16) & 1 = 1 THEN 1 ELSE -1 END) AS v16,
             SUM(CASE WHEN (hv >> 17) & 1 = 1 THEN 1 ELSE -1 END) AS v17,
             SUM(CASE WHEN (hv >> 18) & 1 = 1 THEN 1 ELSE -1 END) AS v18,
             SUM(CASE WHEN (hv >> 19) & 1 = 1 THEN 1 ELSE -1 END) AS v19,
             SUM(CASE WHEN (hv >> 20) & 1 = 1 THEN 1 ELSE -1 END) AS v20,
             SUM(CASE WHEN (hv >> 21) & 1 = 1 THEN 1 ELSE -1 END) AS v21,
             SUM(CASE WHEN (hv >> 22) & 1 = 1 THEN 1 ELSE -1 END) AS v22,
             SUM(CASE WHEN (hv >> 23) & 1 = 1 THEN 1 ELSE -1 END) AS v23,
             SUM(CASE WHEN (hv >> 24) & 1 = 1 THEN 1 ELSE -1 END) AS v24,
             SUM(CASE WHEN (hv >> 25) & 1 = 1 THEN 1 ELSE -1 END) AS v25,
             SUM(CASE WHEN (hv >> 26) & 1 = 1 THEN 1 ELSE -1 END) AS v26,
             SUM(CASE WHEN (hv >> 27) & 1 = 1 THEN 1 ELSE -1 END) AS v27,
             SUM(CASE WHEN (hv >> 28) & 1 = 1 THEN 1 ELSE -1 END) AS v28,
             SUM(CASE WHEN (hv >> 29) & 1 = 1 THEN 1 ELSE -1 END) AS v29,
             SUM(CASE WHEN (hv >> 30) & 1 = 1 THEN 1 ELSE -1 END) AS v30,
             SUM(CASE WHEN (hv >> 31) & 1 = 1 THEN 1 ELSE -1 END) AS v31,
             SUM(CASE WHEN (hv >> 32) & 1 = 1 THEN 1 ELSE -1 END) AS v32,
             SUM(CASE WHEN (hv >> 33) & 1 = 1 THEN 1 ELSE -1 END) AS v33,
             SUM(CASE WHEN (hv >> 34) & 1 = 1 THEN 1 ELSE -1 END) AS v34,
             SUM(CASE WHEN (hv >> 35) & 1 = 1 THEN 1 ELSE -1 END) AS v35,
             SUM(CASE WHEN (hv >> 36) & 1 = 1 THEN 1 ELSE -1 END) AS v36,
             SUM(CASE WHEN (hv >> 37) & 1 = 1 THEN 1 ELSE -1 END) AS v37,
             SUM(CASE WHEN (hv >> 38) & 1 = 1 THEN 1 ELSE -1 END) AS v38,
             SUM(CASE WHEN (hv >> 39) & 1 = 1 THEN 1 ELSE -1 END) AS v39,
             SUM(CASE WHEN (hv >> 40) & 1 = 1 THEN 1 ELSE -1 END) AS v40,
             SUM(CASE WHEN (hv >> 41) & 1 = 1 THEN 1 ELSE -1 END) AS v41,
             SUM(CASE WHEN (hv >> 42) & 1 = 1 THEN 1 ELSE -1 END) AS v42,
             SUM(CASE WHEN (hv >> 43) & 1 = 1 THEN 1 ELSE -1 END) AS v43,
             SUM(CASE WHEN (hv >> 44) & 1 = 1 THEN 1 ELSE -1 END) AS v44,
             SUM(CASE WHEN (hv >> 45) & 1 = 1 THEN 1 ELSE -1 END) AS v45,
             SUM(CASE WHEN (hv >> 46) & 1 = 1 THEN 1 ELSE -1 END) AS v46,
             SUM(CASE WHEN (hv >> 47) & 1 = 1 THEN 1 ELSE -1 END) AS v47,
             SUM(CASE WHEN (hv >> 48) & 1 = 1 THEN 1 ELSE -1 END) AS v48,
             SUM(CASE WHEN (hv >> 49) & 1 = 1 THEN 1 ELSE -1 END) AS v49,
             SUM(CASE WHEN (hv >> 50) & 1 = 1 THEN 1 ELSE -1 END) AS v50,
             SUM(CASE WHEN (hv >> 51) & 1 = 1 THEN 1 ELSE -1 END) AS v51,
             SUM(CASE WHEN (hv >> 52) & 1 = 1 THEN 1 ELSE -1 END) AS v52,
             SUM(CASE WHEN (hv >> 53) & 1 = 1 THEN 1 ELSE -1 END) AS v53,
             SUM(CASE WHEN (hv >> 54) & 1 = 1 THEN 1 ELSE -1 END) AS v54,
             SUM(CASE WHEN (hv >> 55) & 1 = 1 THEN 1 ELSE -1 END) AS v55,
             SUM(CASE WHEN (hv >> 56) & 1 = 1 THEN 1 ELSE -1 END) AS v56,
             SUM(CASE WHEN (hv >> 57) & 1 = 1 THEN 1 ELSE -1 END) AS v57,
             SUM(CASE WHEN (hv >> 58) & 1 = 1 THEN 1 ELSE -1 END) AS v58,
             SUM(CASE WHEN (hv >> 59) & 1 = 1 THEN 1 ELSE -1 END) AS v59,
             SUM(CASE WHEN (hv >> 60) & 1 = 1 THEN 1 ELSE -1 END) AS v60,
             SUM(CASE WHEN (hv >> 61) & 1 = 1 THEN 1 ELSE -1 END) AS v61,
             SUM(CASE WHEN (hv >> 62) & 1 = 1 THEN 1 ELSE -1 END) AS v62,
             SUM(CASE WHEN (hv >> 63) & 1 = 1 THEN 1 ELSE -1 END) AS v63
      FROM h GROUP BY doc_id
    ), sig AS (
      SELECT doc_id, (CASE WHEN v0 > 0 THEN 1 ELSE 0 END) + (CASE WHEN v1 > 0 THEN 2 ELSE 0 END) + (CASE WHEN v2 > 0 THEN 4 ELSE 0 END) + (CASE WHEN v3 > 0 THEN 8 ELSE 0 END) + (CASE WHEN v4 > 0 THEN 16 ELSE 0 END) + (CASE WHEN v5 > 0 THEN 32 ELSE 0 END) + (CASE WHEN v6 > 0 THEN 64 ELSE 0 END) + (CASE WHEN v7 > 0 THEN 128 ELSE 0 END) + (CASE WHEN v8 > 0 THEN 256 ELSE 0 END) + (CASE WHEN v9 > 0 THEN 512 ELSE 0 END) + (CASE WHEN v10 > 0 THEN 1024 ELSE 0 END) + (CASE WHEN v11 > 0 THEN 2048 ELSE 0 END) + (CASE WHEN v12 > 0 THEN 4096 ELSE 0 END) + (CASE WHEN v13 > 0 THEN 8192 ELSE 0 END) + (CASE WHEN v14 > 0 THEN 16384 ELSE 0 END) + (CASE WHEN v15 > 0 THEN 32768 ELSE 0 END) + (CASE WHEN v16 > 0 THEN 65536 ELSE 0 END) + (CASE WHEN v17 > 0 THEN 131072 ELSE 0 END) + (CASE WHEN v18 > 0 THEN 262144 ELSE 0 END) + (CASE WHEN v19 > 0 THEN 524288 ELSE 0 END) + (CASE WHEN v20 > 0 THEN 1048576 ELSE 0 END) + (CASE WHEN v21 > 0 THEN 2097152 ELSE 0 END) + (CASE WHEN v22 > 0 THEN 4194304 ELSE 0 END) + (CASE WHEN v23 > 0 THEN 8388608 ELSE 0 END) + (CASE WHEN v24 > 0 THEN 16777216 ELSE 0 END) + (CASE WHEN v25 > 0 THEN 33554432 ELSE 0 END) + (CASE WHEN v26 > 0 THEN 67108864 ELSE 0 END) + (CASE WHEN v27 > 0 THEN 134217728 ELSE 0 END) + (CASE WHEN v28 > 0 THEN 268435456 ELSE 0 END) + (CASE WHEN v29 > 0 THEN 536870912 ELSE 0 END) + (CASE WHEN v30 > 0 THEN 1073741824 ELSE 0 END) + (CASE WHEN v31 > 0 THEN 2147483648 ELSE 0 END) + (CASE WHEN v32 > 0 THEN 4294967296 ELSE 0 END) + (CASE WHEN v33 > 0 THEN 8589934592 ELSE 0 END) + (CASE WHEN v34 > 0 THEN 17179869184 ELSE 0 END) + (CASE WHEN v35 > 0 THEN 34359738368 ELSE 0 END) + (CASE WHEN v36 > 0 THEN 68719476736 ELSE 0 END) + (CASE WHEN v37 > 0 THEN 137438953472 ELSE 0 END) + (CASE WHEN v38 > 0 THEN 274877906944 ELSE 0 END) + (CASE WHEN v39 > 0 THEN 549755813888 ELSE 0 END) + (CASE WHEN v40 > 0 THEN 1099511627776 ELSE 0 END) + (CASE WHEN v41 > 0 THEN 2199023255552 ELSE 0 END) + (CASE WHEN v42 > 0 THEN 4398046511104 ELSE 0 END) + (CASE WHEN v43 > 0 THEN 8796093022208 ELSE 0 END) + (CASE WHEN v44 > 0 THEN 17592186044416 ELSE 0 END) + (CASE WHEN v45 > 0 THEN 35184372088832 ELSE 0 END) + (CASE WHEN v46 > 0 THEN 70368744177664 ELSE 0 END) + (CASE WHEN v47 > 0 THEN 140737488355328 ELSE 0 END) + (CASE WHEN v48 > 0 THEN 281474976710656 ELSE 0 END) + (CASE WHEN v49 > 0 THEN 562949953421312 ELSE 0 END) + (CASE WHEN v50 > 0 THEN 1125899906842624 ELSE 0 END) + (CASE WHEN v51 > 0 THEN 2251799813685248 ELSE 0 END) + (CASE WHEN v52 > 0 THEN 4503599627370496 ELSE 0 END) + (CASE WHEN v53 > 0 THEN 9007199254740992 ELSE 0 END) + (CASE WHEN v54 > 0 THEN 18014398509481984 ELSE 0 END) + (CASE WHEN v55 > 0 THEN 36028797018963968 ELSE 0 END) + (CASE WHEN v56 > 0 THEN 72057594037927936 ELSE 0 END) + (CASE WHEN v57 > 0 THEN 144115188075855872 ELSE 0 END) + (CASE WHEN v58 > 0 THEN 288230376151711744 ELSE 0 END) + (CASE WHEN v59 > 0 THEN 576460752303423488 ELSE 0 END) + (CASE WHEN v60 > 0 THEN 1152921504606846976 ELSE 0 END) + (CASE WHEN v61 > 0 THEN 2305843009213693952 ELSE 0 END) + (CASE WHEN v62 > 0 THEN 4611686018427387904 ELSE 0 END) AS s FROM votes
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.s, b.s)) <= 3
""",
)
def j2c_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (J2): 64-bit signatures, 4×16-bit band
    candidate join, exact hamming verify ≤3.

    EXACT oracle for any data: the query uses the engine-portable md5
    token hash (operators.dedup.portable_token_hash), DuckDB recomputes
    all signatures and compares ALL pairs, and pigeonhole over the 4
    bands guarantees the banded operator finds every hamming≤3 pair —
    the banding changes the plan shape, never the answer.  (The Spark
    default stays xxhash64 for speed; invariant tests cover it.)"""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, token_hash="md5")


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


@register(
    "j5b_multimodal_features",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             'text/plain' AS mime,
             CAST(length(text) AS BIGINT) AS n_bytes,
             CAST((length(text) % 640) + 1 AS INT) AS width,
             CAST((length(text) % 480) + 1 AS INT) AS height,
             [CAST(CAST(length(text) AS DOUBLE) AS FLOAT),
              CAST(CAST(list_sum(list_transform(range(1, least(length(text),256)+1),
                        i -> ord(substr(text, CAST(i AS INT), 1)))) AS DOUBLE)
                   / least(length(text),256) AS FLOAT),
              CAST(CAST(ord(substr(text,1,1)) AS DOUBLE) AS FLOAT),
              CAST(CAST(ord(substr(text,least(length(text),256),1)) AS DOUBLE) AS FLOAT)
             ] AS feature
      FROM documents
    )
    SELECT doc_id, mime, n_bytes, width, height,
           CAST(i - 1 AS INT) AS pos,
           CAST(feature[CAST(i AS INT)] AS DOUBLE) AS value
    FROM f, unnest(generate_series(1, 4)) AS t(i)
    """,
)
def j5b_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode / feature extraction (J5): Arrow-batched
    ``mapInPandas`` with a declared output schema.  The media decoder is
    a deterministic STUB (no media libs in this container) — the batch
    plumbing is the real deliverable.

    Boundary projection: the operator keeps ``feature`` as
    ``array<float>`` (the shape a training pipeline consumes); the
    *registered* query posexplodes it to ``(pos, value)`` rows because
    the driver canonicalizes results through pandas ``sort_values``,
    which cannot order object columns of Python lists
    (CORRECTNESS_r03: ``unhashable type: 'list'``).  ``value`` is cast
    float32→float64 on BOTH sides (exact) so the hash compares DOUBLEs.

    Oracle rationale: the fixture text is pure ASCII (verified), so byte
    stats equal code-point stats; sums of ≤256 byte values are exact
    integers in both engines, the single division is identical IEEE, and
    casting each element through FLOAT on the SQL side reproduces the
    Arrow float32 quantization bit-for-bit — an exact SQL gate on a
    Python mapInPandas path."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(docs)
    feats = multimodal.extract_features(media)
    return feats.select(
        "doc_id",
        "mime",
        "n_bytes",
        "width",
        "height",
        F.posexplode("feature").alias("pos", "value"),
    ).withColumn("value", F.col("value").cast("double"))


@register(
    "j5c_image_resize",
    oracle="""
    SELECT doc_id, 32 AS width, 32 AS height,
           hex(encode(substr(repeat(text, CAST(1024/length(text) AS INT)+1), 1, 1024)))
             AS payload_hex
    FROM documents
    """,
)
def j5c_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize path (J5): binary payloads through the Arrow-batched
    mapInPandas resize stub — exact output sizing tested in
    tests/test_multimodal.py.  ASCII fixture ⇒ the byte-resample stub is
    SQL-computable (repeat+truncate+encode), giving the binary-payload
    round trip an exact oracle.

    Boundary projection: the operator round-trips real BinaryType; the
    registered query emits ``hex(payload)`` because the driver's pandas
    canonicalizer cannot sort bytearray columns (CORRECTNESS_r03:
    ``unhashable type: 'bytearray'``).  Spark and DuckDB both hex-encode
    uppercase, so the check stays byte-exact."""
    from ..operators.multimodal import attach_binary_payload, resize_images

    docs = load_table(spark, sf_dir, "documents")
    resized = resize_images(attach_binary_payload(docs), width=32, height=32)
    return resized.select(
        "doc_id", "width", "height", F.hex("payload").alias("payload_hex")
    )


@register(
    "j5d_frame_sample",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS frame_no,
           hex(encode(substr(text, CAST(i*64+1 AS INT), 64))) AS frame_hex
    FROM documents, unnest(range(0, least(8, length(text)//64))) AS t(i)
    """,
)
def j5d_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (J5): 1→N row expansion streaming out of the
    decoder iterator (no pre-materialized frame arrays).  ASCII fixture
    ⇒ the fixed-width byte windows are SQL-computable, oracle-gating the
    row-expansion semantics (count, numbering, and frame bytes).

    Boundary projection: frames stay BinaryType inside the operator; the
    registered query emits ``hex(frame)`` for the driver's pandas
    canonicalizer (bytearray columns are unsortable there —
    CORRECTNESS_r03)."""
    from ..operators.multimodal import attach_binary_payload, sample_frames

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_binary_payload(docs))
    return frames.select("doc_id", "frame_no", F.hex("frame").alias("frame_hex"))


@register("j4e_winnow_fingerprints", oracle=None)
def j4e_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) document fingerprints (J4, MOSS
    algorithm): windowed minima over k-gram hashes — shared-region
    guarantee and density tested in tests/test_dedup.py.  Rows-only:
    fingerprints are xxhash64 values (no cross-engine hash oracle)."""
    from ..operators.text import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs)


@register(
    "j8_decontaminate",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ), bench_toks AS (
      SELECT t FROM toks WHERE doc_id % 101 = 0
    ), sizes AS (
      SELECT 5 AS m
      UNION
      SELECT len(t) AS m FROM bench_toks WHERE len(t) > 0 AND len(t) < 5
    ), grams AS (
      SELECT doc_id, array_to_string(list_slice(t, i, i + m - 1), ' ') AS gram
      FROM (SELECT doc_id, t, m, unnest(generate_series(1, len(t) - m + 1)) AS i
            FROM toks, sizes WHERE len(t) >= m)
    ), bench AS (
      SELECT DISTINCT array_to_string(list_slice(t, i, i + 4), ' ') AS gram
      FROM (SELECT t, unnest(generate_series(1, len(t) - 4)) AS i FROM bench_toks)
      UNION
      SELECT DISTINCT array_to_string(t, ' ') AS gram
      FROM bench_toks WHERE len(t) > 0 AND len(t) < 5
    )
    SELECT g.doc_id, CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_contaminated_grams
    FROM grams g JOIN bench USING (gram)
    GROUP BY g.doc_id
    """,
)
def j8_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (J8): flag corpus docs sharing any
    5-token gram with the eval set (here: every 101st doc standing in
    for a benchmark suite — the flagged set therefore includes those
    docs themselves plus their planted near-duplicates).  Spark joins
    on 8-byte xxhash64 gram keys against the broadcast benchmark set;
    the oracle joins on gram text — identical counts absent a 64-bit
    hash collision (none at any fixture scale).  The oracle models the
    FULL operator contract including the min(n,len)-gram short-doc
    rule (whole-text grams for <n-token bench docs + matching corpus
    window sizes), so parity does not depend on the fixture containing
    no short benchmark docs."""
    from ..operators.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select("text")
    return decontaminate(docs, bench)


@register(
    "j9_vocab_topk",
    oracle=r"""
    SELECT lang, tok, n, rnk FROM (
      SELECT lang, tok, COUNT(*) AS n,
             CAST(row_number() OVER (PARTITION BY lang
                                     ORDER BY COUNT(*) DESC, tok ASC) AS BIGINT) AS rnk
      FROM (SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
            FROM documents)
      GROUP BY lang, tok
    ) WHERE rnk <= 20
    """,
)
def j9_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head (J9): top-20 tokens per language — the counting
    pass under tokenizer training (see operators/text.py:vocab_topk;
    WindowGroupLimit plan asserted in tests/test_plans.py)."""
    from ..operators.text import vocab_topk

    return vocab_topk(load_table(spark, sf_dir, "documents"), k=20)


@register(
    "j9b_top_terms",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), dfreq AS (
      SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
    )
    SELECT doc_id, tok, tf, df, score, rnk FROM (
      SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
             (tf.tf * 1000000) // dfreq.df AS score,
             CAST(row_number() OVER (PARTITION BY tf.doc_id
                                     ORDER BY (tf.tf * 1000000) // dfreq.df DESC,
                                              tf.tok ASC) AS BIGINT) AS rnk
      FROM tf JOIN dfreq USING (tok)
    ) WHERE rnk <= 3
    """,
)
def j9b_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic terms per document (J9): tf × reciprocal-df in
    exact integer arithmetic (log-free so both engines rank
    identically; see operators/text.py:top_terms_tf_rdf)."""
    from ..operators.text import top_terms_tf_rdf

    return top_terms_tf_rdf(load_table(spark, sf_dir, "documents"), k=3)


def _pii_oracle() -> str:
    from ..operators.text import PII_PATTERNS

    plant = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
        " || ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'"
    )
    sql = (
        "SELECT doc_id, CASE WHEN doc_id % 3 = 0 "
        f"THEN {plant} ELSE text END AS t FROM documents"
    )
    # One nested layer per cascade step: the count reads the layer's
    # INPUT text (inner t), the rewrite feeds the next layer — exactly
    # the operator's count-then-redact order.
    for kind, pat, repl in PII_PATTERNS:
        sql = (
            f"SELECT * REPLACE (regexp_replace(t, '{pat}', '{repl}', 'g') AS t), "
            f"CAST(len(regexp_extract_all(t, '{pat}')) AS BIGINT) AS n_{kind} "
            f"FROM ({sql})"
        )
    return f"SELECT doc_id, t AS redacted, n_email, n_phone, n_ipv4 FROM ({sql})"


@register("j4g_pii_redaction", oracle=_pii_oracle())
def j4g_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (J4 extension): email/phone/IPv4 redaction cascade with
    per-kind match counts.  PII is planted in-engine on every third doc
    (both engines synthesize the identical strings) so the oracle proves
    the redaction FIRES, not merely that it leaves clean text alone.
    Scan-side codegen: no shuffle, no Python — see operators/text.py
    redact_pii for the 100 TB cost argument."""
    from ..operators.text import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com call 415-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" from 10."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".0.1"),
            ),
        ).otherwise(F.col("text")),
    )
    return redact_pii(planted).select(
        "doc_id",
        F.col("text").alias("redacted"),
        "n_email",
        "n_phone",
        "n_ipv4",
    )


@register(
    "j5e_audio_energy_windows",
    oracle="""
    WITH wins AS (
      SELECT doc_id, CAST(i AS INT) AS win_no,
             CAST(i * 16 AS BIGINT) AS win_start,
             substr(text, CAST(i * 16 + 1 AS INT), 32) AS w
      FROM documents,
           unnest(range(0, least(16, CASE WHEN length(text) = 0 THEN 0
                                          ELSE (length(text) - 1) // 16 + 1 END)))
             AS t(i)
    )
    SELECT doc_id, win_no, win_start,
           CAST(length(w) AS BIGINT) AS win_len,
           CAST((SELECT COALESCE(SUM(ord(substr(w, CAST(j AS INT), 1))), 0)
                 FROM unnest(range(1, length(w) + 1)) AS s(j)) AS BIGINT) AS energy
    FROM wins
    """,
)
def j5e_audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio framing (J5): overlapping byte windows (hop 16 < window 32
    — the STFT shape) with exact integer energy, streamed out of an
    Arrow-batched mapInPandas decoder.  ASCII fixture ⇒ window bytes and
    energies are SQL-computable, oracle-gating the overlap row-count
    semantics (ceil(n/hop) windows, short tails) a boundary bug would
    break."""
    from ..operators.multimodal import attach_binary_payload, audio_energy_windows

    docs = load_table(spark, sf_dir, "documents")
    return audio_energy_windows(attach_binary_payload(docs))


@register(
    "j4h_boilerplate_removal",
    oracle="""
    WITH planted AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 3 = 0
                  THEN 'subscribe to the ' || source || ' weekly newsletter | ' || text
                  ELSE text END AS text
      FROM documents
    ),
    lines AS (
      SELECT doc_id, source, CAST(i - 1 AS INT) AS line_no, l[CAST(i AS INT)] AS line
      FROM (SELECT doc_id, source, string_split(text, ' | ') AS l FROM planted),
           unnest(range(1, len(l) + 1)) t(i)
    ),
    gd AS (SELECT source, count(DISTINCT doc_id) AS nd FROM planted GROUP BY 1),
    ldf AS (SELECT source, line, count(DISTINCT doc_id) AS df FROM lines GROUP BY 1, 2),
    bp AS (SELECT l.source, l.line FROM ldf l JOIN gd USING (source)
           WHERE df >= nd * 0.2),
    kept AS (SELECT li.doc_id, li.line_no, li.line
             FROM lines li LEFT JOIN bp
               ON li.source = bp.source AND li.line = bp.line
             WHERE bp.line IS NULL),
    reb AS (SELECT doc_id, string_agg(line, ' | ' ORDER BY line_no) AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY 1),
    tot AS (SELECT doc_id, source, count(*) AS n_lines FROM lines GROUP BY 1, 2)
    SELECT t.doc_id, t.source,
           coalesce(r.clean_text, '') AS clean_text,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_kept,
           CAST(t.n_lines - coalesce(r.n_kept, 0) AS BIGINT) AS n_lines_removed
    FROM tot t LEFT JOIN reb r ON t.doc_id = r.doc_id
    """,
)
def j4h_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate line removal (J4 extension): lines
    repeating across >= 20% of a source's documents are dropped, docs
    reassembled from unique content.  The fixture has no natural
    boilerplate (max within-source 5-gram df is 8%), so a per-source
    newsletter banner is planted in-engine on every third doc — both
    engines synthesize identical strings — and the oracle proves the
    removal FIRES (banner gone, body intact, counts exact), not merely
    that clean docs pass through.  See operators/text.py
    remove_boilerplate for the broadcast-anti-join scale shape."""
    from ..operators.text import remove_boilerplate

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("subscribe to the "),
                F.col("source"),
                F.lit(" weekly newsletter | "),
                F.col("text"),
            ),
        ).otherwise(F.col("text")),
    )
    return remove_boilerplate(planted).select(
        "doc_id", "source", "clean_text", "n_lines_kept", "n_lines_removed"
    )


@register(
    "j1b_url_dedup",
    oracle=r"""
    WITH u0 AS (
      SELECT doc_id,
        'HTTPS://' ||
        CASE WHEN doc_id % 3 = 0 THEN 'WWW.Example.COM:443'
             ELSE 'cdn.example.org' END ||
        '/docs/' || CAST(doc_id % 50 AS VARCHAR) ||
        CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
        CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&utm_campaign=x&page=2'
             WHEN doc_id % 4 = 1 THEN '?page=2' ELSE '' END ||
        CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
      FROM documents
    ), u1 AS (
      SELECT doc_id, regexp_replace(url, '#.*$', '', 'g') AS u FROM u0
    ), u2 AS (
      SELECT doc_id,
        regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*') AS head,
        substr(u, length(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*')) + 1)
          AS rest
      FROM u1
    ), u3 AS (
      SELECT doc_id,
        regexp_replace(regexp_replace(lower(head),
          '^(http://.*):80$', '\1', 'g'),
          '^(https://.*):443$', '\1', 'g') AS head,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          rest, '([?&])((utm_[a-z]+|fbclid)=[^&#]*&)+', '\1', 'g'),
          '[?&]((utm_[a-z]+|fbclid)=[^&#]*&?)+$', '', 'g'),
          '\?$', '', 'g'), '/\?', '?', 'g'), '/$', '', 'g') AS rest
      FROM u2
    )
    SELECT head || rest AS canonical_url,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc_id
    FROM u3 GROUP BY 1
    """,
)
def j1b_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (J1 extension — the Common-Crawl first pass:
    one fetch survives per canonical URL).  Noisy URLs are planted
    in-engine per doc (uppercase scheme/host, default :443 port,
    trailing slash, utm_*/page query mixes, #fragments keyed on doc_id
    residues), canonicalized by operators/text.py:canonicalize_url —
    a pure regexp column chain in the Java∩RE2 syntax the oracle
    applies literally — and grouped.  Distinct noise combinations of
    the same logical URL provably collapse (n_docs > 1 rows) while
    `page=2` query payloads survive the tracking-param strip.  Plan:
    scan → codegen projection → one hash aggregate; at 100 TB this is
    the cheapest dedup pass there is, run it first."""
    from ..operators.text import canonicalize_url

    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.Example.COM:443"))
        .otherwise(F.lit("cdn.example.org")),
        F.lit("/docs/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0, F.lit("?utm_source=feed&utm_campaign=x&page=2"))
        .when(F.col("doc_id") % 4 == 1, F.lit("?page=2"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return (
        docs.select("doc_id", canonicalize_url(url).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


@register(
    "j8b_contamination_report",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, array_to_string(list_slice(t, i, i + 4), ' ') AS gram
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
            FROM toks WHERE len(t) >= 5)
    ), bench AS (
      SELECT DISTINCT doc_id AS bench_id, gram FROM grams WHERE doc_id % 101 = 0
    )
    SELECT b.bench_id,
           COUNT(DISTINCT g.doc_id) AS n_contaminated_docs,
           COUNT(DISTINCT g.gram) AS n_shared_grams
    FROM grams g JOIN bench b USING (gram)
    WHERE g.doc_id <> b.bench_id
    GROUP BY b.bench_id
    """,
)
def j8b_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination attribution (J8 companion): per eval doc (every
    101st doc standing in for a benchmark suite), how many OTHER corpus
    docs share a 5-gram with it and over how many distinct grams — the
    report that tells eval owners which benchmarks are compromised.
    Spark joins corpus gram hashes against the broadcast (bench_id,
    gram) set — corpus subtree shuffle-free, same shape as j8 — while
    the oracle joins gram text; identical absent a 64-bit collision
    (none at any fixture scale).  See
    operators/dedup.py:contamination_report."""
    from ..operators.dedup import contamination_report

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return contamination_report(docs, bench)


@register(
    "j4i_intradoc_dedup",
    oracle=r"""
    WITH built AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN 'visit ' || source || ' dot com | ' || text ||
                       ' | visit ' || source || ' dot com | ' || text
                  ELSE text END AS t
      FROM documents
    ), lines AS (
      SELECT doc_id, t, string_split(t, ' | ') AS l FROM built
    ), kept AS (
      SELECT doc_id, line, i
      FROM (SELECT doc_id, l, unnest(l) AS line,
                   unnest(generate_series(1, len(l))) AS i
            FROM lines)
      WHERE list_position(l, line) = i
    )
    SELECT k.doc_id,
           string_agg(k.line, ' | ' ORDER BY k.i) AS clean_text,
           CAST(MAX(len(lines.l)) AS BIGINT) AS n_lines,
           CAST(MAX(len(lines.l)) - COUNT(*) AS BIGINT) AS n_lines_removed
    FROM kept k JOIN lines ON k.doc_id = lines.doc_id
    GROUP BY k.doc_id
    """,
)
def j4i_intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition removal (J4 extension): every third doc
    is rebuilt as banner | body | banner | body — a templated crawl
    record repeating its own nav block AND its own body — and the
    operator keeps each line's FIRST occurrence in order, so exactly
    the trailing banner+body copies vanish while untouched docs pass
    through byte-identical.  Pure higher-order array expressions
    (split → index-aware filter → rejoin): per-row, shuffle-free, no
    explode-driven row expansion — the safe shape for billion-doc
    scrubbing.  See operators/text.py:dedup_lines_within_doc."""
    from ..operators.text import dedup_lines_within_doc

    docs = load_table(spark, sf_dir, "documents")
    banner = F.concat(F.lit("visit "), F.col("source"), F.lit(" dot com"))
    built = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                banner, F.lit(" | "), F.col("text"), F.lit(" | "),
                banner, F.lit(" | "), F.col("text"),
            ),
        ).otherwise(F.col("text")),
    )
    return dedup_lines_within_doc(built)


@register(
    "j2g_fuzzy_neardup",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def j2g_fuzzy_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (edit-distance-1) near-dup pairs over customer names via
    the SymSpell deletion-neighborhood (J2 extension — the
    entity-name twin of the text-shingle families: one-keystroke
    variants of the same entity).  The oracle is brute-force all-pairs
    Levenshtein — an O(n²) computation the operator provably
    reproduces with a linear explode + equi-join.  Exact candidate
    coverage is a theorem CONDITIONAL on no variant bucket exceeding
    the cap (ADVICE r4); here that precondition is verified, not
    assumed — the companion ``oversized_variant_buckets`` run over the
    same fixture is empty (tests/test_dedup.py pins this), so the full
    value-parity oracle is sound.  See
    operators/dedup.py:fuzzy_neardup_pairs."""
    from ..operators.dedup import fuzzy_neardup_pairs

    cust = load_table(spark, sf_dir, "customer")
    return fuzzy_neardup_pairs(cust, text_col="c_name", id_col="c_custkey")


@register(
    "j9c_bpe_pair_counts",
    oracle=r"""
    WITH toks AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents
    ), pairs AS (
      SELECT t[i] AS lft, t[i + 1] AS rght
      FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2)
    )
    SELECT lft AS left, rght AS right, n, rnk FROM (
      SELECT lft, rght, COUNT(*) AS n,
             CAST(row_number() OVER (ORDER BY COUNT(*) DESC, lft, rght)
                  AS BIGINT) AS rnk
      FROM pairs GROUP BY lft, rght
    ) WHERE rnk <= 20
    """,
)
def j9c_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-candidate scan (J9 extension — the counting pass every
    tokenizer-training iteration runs): top-20 adjacent word pairs
    across the corpus, deterministic tie-break.  Position-based pair
    explode (no self-join), one count aggregate; see
    operators/text.py:bpe_pair_counts."""
    from ..operators.text import bpe_pair_counts

    return bpe_pair_counts(load_table(spark, sf_dir, "documents"))


@register(
    "j4j_stopword_profile",
    oracle="""
    WITH per AS (
      SELECT lang, source, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), c AS (
      SELECT lang, source, len(t) AS n,
             len(list_filter(t, x -> list_contains(
               ['the','a','an','of','and','or','to','in','is','it'], x))) AS s
      FROM per
    )
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(SUM(s) AS BIGINT) AS n_stopwords,
           CAST(ROUND(1000000 * CAST(SUM(s) AS DOUBLE) / SUM(n), 0) AS BIGINT)
             AS stop_ppm
    FROM c GROUP BY lang, source
    """,
)
def j4j_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stopword-density profile per (lang, source) (§2.J4
    extension — the function-word signal quality filters cut on).  The
    frozen 10-word list is shared verbatim with the oracle; per-row
    work is a higher-order array filter (no explode — the token array
    never leaves the row) and the ratio is derived from the two exact
    integer sums once per group.  One scan, one map-side-combined
    aggregate of |lang×source| groups.  See
    operators/text.py:stopword_stats."""
    from ..operators.text import stopword_stats

    return stopword_stats(load_table(spark, sf_dir, "documents"))


@register(
    "j4k_domain_quota",
    oracle="""
    SELECT doc_id, source, n_chars, quota_rank FROM (
      SELECT doc_id, source, n_chars,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars DESC, doc_id) AS BIGINT)
               AS quota_rank
      FROM documents
    ) WHERE quota_rank <= 15
    """,
)
def j4k_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota enforcement (§2.J4/J6 governance — no source
    may exceed its document cap in the training mix): rank best-first
    within source (largest docs here; any quality key plugs in) and
    keep 15.  Compiles to WindowGroupLimit: each shuffle partition
    discards beyond-quota rows BEFORE the exchange — at 100 TB the
    shuffle carries ≤ |sources|·k rows per mapper, not the corpus.
    See operators/sampling.py:quota_per_stratum."""
    from ..operators.sampling import quota_per_stratum

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return quota_per_stratum(
        docs, "source", 15, order_cols=(F.col("n_chars").desc(), F.col("doc_id"))
    )


@register(
    "j9d_unigram_lm_ppl",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
      FROM documents
    ), vocab AS (
      SELECT w, COUNT(*) AS c FROM toks GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(c) AS DOUBLE) AS n_total FROM vocab
    ), model AS (
      SELECT w, CAST(FLOOR(10000 * ln(n_total / c) + 0.5) AS BIGINT) AS nll_fp
      FROM vocab, tot
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(nll_fp) AS BIGINT) AS sum_nll_fp,
           CAST(ROUND(CAST(SUM(nll_fp) AS DOUBLE) / COUNT(*), 0) AS BIGINT)
             AS mean_nll_fp
    FROM toks JOIN model USING (w) GROUP BY doc_id
    """,
)
def j9d_unigram_lm_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity scoring (§2.J9 extension — the classic LM
    quality filter): corpus unigram model, per-doc total/mean negative
    log-likelihood.  ln is quantized once per distinct vocab count
    (floor(1e4·ln+0.5) — integer micro-nats), so document scores are
    exact integer sums and engines only need ln agreement to ~1e-9,
    coarser than any libm difference.  One token explode feeds both
    the vocab aggregate (broadcast back as the model) and the per-doc
    aggregate: single corpus scan, broadcast-hash model join, one
    full-size exchange.  See operators/text.py:unigram_nll."""
    from ..operators.text import unigram_nll

    return unigram_nll(load_table(spark, sf_dir, "documents"))


@register(
    "j8c_fuzzy_decontaminate",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 4), ' ') AS gram
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 4)) AS i
            FROM toks WHERE len(t) >= 5)
    ), bench AS (
      SELECT doc_id AS bench_id, gram FROM grams WHERE doc_id % 101 = 0
    ), sizes AS (
      SELECT bench_id, COUNT(*) AS bench_grams FROM bench GROUP BY bench_id
    ), shared AS (
      SELECT g.doc_id, b.bench_id, COUNT(*) AS n_shared_grams
      FROM grams g JOIN bench b ON g.gram = b.gram AND g.doc_id <> b.bench_id
      GROUP BY g.doc_id, b.bench_id
    )
    SELECT s.doc_id, s.bench_id, s.n_shared_grams, z.bench_grams,
           CAST(ROUND(1000000 * CAST(s.n_shared_grams AS DOUBLE)
                      / z.bench_grams, 0) AS BIGINT) AS overlap_ppm
    FROM shared s JOIN sizes z ON s.bench_id = z.bench_id
    WHERE CAST(ROUND(1000000 * CAST(s.n_shared_grams AS DOUBLE)
                     / z.bench_grams, 0) AS BIGINT) >= 300000
    """,
)
def j8c_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY decontamination (J8 extension — the overlap-RATIO rule of
    real eval-hygiene pipelines): a corpus doc is contaminated by a
    benchmark doc when ≥ 30 % of the benchmark's distinct 5-gram set
    appears in it — partial/edited copies that exact any-gram matching
    over-flags and digest matching misses.  Spark joins on 8-byte
    xxhash64 gram keys against the BROADCAST benchmark set (corpus
    subtree exchange-free, like j8); the oracle joins on gram text.
    See operators/dedup.py:fuzzy_decontaminate."""
    from ..operators.dedup import fuzzy_decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return fuzzy_decontaminate(docs, bench)


@register(
    "j9e_vocab_coverage",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
      FROM documents
    ), vocab AS (
      SELECT w FROM (
        SELECT w, COUNT(*) AS c FROM toks GROUP BY w
        QUALIFY row_number() OVER (ORDER BY c DESC, w) <= 50
      )
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_vocab_tokens,
           CAST(ROUND(1000000 * CAST(SUM(CASE WHEN v.w IS NOT NULL THEN 1
                                             ELSE 0 END) AS DOUBLE)
                      / COUNT(*), 0) AS BIGINT) AS coverage_ppm
    FROM toks t LEFT JOIN vocab v ON t.w = v.w
    GROUP BY doc_id
    """,
)
def j9e_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage (J9 extension — the OOV-rate audit
    run before committing a vocab): coverage of each document by the
    frozen top-50 corpus vocabulary, in exact ppm.  One token explode
    feeds both the vocab aggregate (top-k by (count desc, token) —
    WindowGroupLimit) and, via a BROADCAST left join of the tiny vocab,
    the per-doc coverage aggregate: single corpus scan, one full-size
    exchange."""
    from ..functions import ws_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.trim(F.col("text"))))).alias("w")
    )
    w_rank = Window.orderBy(F.col("c").desc(), F.col("w").asc())
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= 50)
        .select("w", F.lit(True).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab"), 1).otherwise(0))
            .cast("long")
            .alias("n_vocab_tokens"),
            F.round(
                F.lit(1_000_000)
                * F.sum(F.when(F.col("__in_vocab"), 1).otherwise(0))
                / F.count(F.lit(1)),
                0,
            )
            .cast("long")
            .alias("coverage_ppm"),
        )
    )


@register(
    "j1c_chunk_level_dedup",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, generate_subscripts(t, 1) AS i, unnest(t) AS tok
      FROM (SELECT doc_id,
                   string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                                ' ') AS t
            FROM documents)
    ), flagged AS (
      SELECT doc_id, i, tok,
             CASE WHEN i >= 3 AND
                  CAST('0x' || substr(md5(
                    lag(tok, 2) OVER w || ' ' || lag(tok, 1) OVER w || ' ' || tok
                  ), 1, 15) AS BIGINT) % 8 = 0
             THEN 1 ELSE 0 END AS b
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY i)
    ), chunked AS (
      SELECT doc_id, i, tok,
             COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS chunk_id
      FROM flagged
    ), chunks AS (
      SELECT doc_id, chunk_id,
             string_agg(tok, ' ' ORDER BY i) AS chunk_text
      FROM chunked GROUP BY doc_id, chunk_id
    )
    SELECT md5(chunk_text) AS chunk_digest,
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT doc_id) AS n_docs,
           MIN(doc_id) AS first_doc_id
    FROM chunks GROUP BY 1
    """,
)
def j1c_chunk_level_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup via content-defined chunking (J1 extension —
    the Rabin-boundary idea at token granularity): chunk boundaries are
    a pure function of local content (trailing-3-gram hash ≡ 0 mod 8),
    so shared passages keep their identity across globally-different
    documents — the passage-level dup map fixed-size chunking cannot
    produce.  Boundary hash is the engine-portable md5 construction;
    the oracle applies the identical rule over gram text.  See
    operators/dedup.py:chunk_level_dedup."""
    from ..operators.dedup import chunk_level_dedup

    return chunk_level_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "j9f_heavy_hitters",
    oracle=r"""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ), tot AS (
      SELECT COUNT(*) AS total_tokens FROM tok
    ), c AS (
      SELECT tok, COUNT(*) AS n FROM tok GROUP BY 1
    )
    SELECT c.tok, c.n, t.total_tokens,
           CAST(c.n * 1000000 // t.total_tokens AS BIGINT) AS freq_ppm
    FROM c, tot t
    WHERE c.n * 1000 > t.total_tokens
    """,
)
def j9f_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy-hitter tokens above 0.1 % corpus frequency (J9
    extension — the frequent-items pass under stopword discovery and
    tokenizer pre-analysis) via the two-pass Misra-Gries
    sketch-then-verify plan: per-partition MG candidates (arrow-batched
    mapInPandas, candidate-superset theorem in the operator docstring)
    then a broadcast-semi-join exact recount — the full token stream is
    never shuffled.  The oracle is the naive exact GROUP BY: same
    answer, quadratically worse shuffle at scale.  See
    operators/text.py:heavy_hitter_tokens."""
    from ..operators.text import heavy_hitter_tokens

    return heavy_hitter_tokens(load_table(spark, sf_dir, "documents"))


@register("j5f_image_dhash_neardup", oracle=None)
def j5f_image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal near-dup pairs by perceptual dHash banding (§2.J5 —
    the image-dedup pass of a multimodal training pipeline): 64-bit
    difference-hash per payload (Arrow-batched mapInPandas; real
    pixels when Pillow can decode, deterministic byte-grid stub here),
    then SimHash-style band join + bit_count(XOR) verification — the
    pigeonhole guarantee (hamming ≤ 3 < 4 bands ⇒ one exact band
    match) replaces any all-pairs product.

    The fixture corpus has no byte-identical payloads, so the query
    plants its own ground truth (the j2h planted-twin pattern): every
    50th document gains a twin with its first and last bytes replaced
    — the byte-grid analog of a re-encoded image — which perturbs at
    most the grid cells sampling those bytes.  Each planted twin must pair
    with its source at hamming ≤ 3; unrelated documents must not.
    Rows-only by nature (the hash lives behind the Python decode
    boundary); banding completeness, cap observability, and the
    planted guarantees are pinned in tests/test_multimodal.py.  See
    operators/multimodal.py:dhash_neardup_pairs."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(docs)
    twins = media.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat(
            F.lit(b"\x00"),
            F.expr("substring(payload, 2, length(payload) - 2)"),
            F.lit(b"\x00"),
        ).alias("payload"),
        "meta",
    )
    return multimodal.dhash_neardup_pairs(media.unionByName(twins))


@register(
    "j9g_bigram_pmi",
    oracle=r"""
    WITH arrs AS (
      SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM documents
    ), totals AS (
      SELECT CAST(SUM(len(t)) AS DOUBLE) AS n_uni,
             CAST(SUM(GREATEST(len(t) - 1, 0)) AS DOUBLE) AS n_bi
      FROM arrs
    ), uni AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(t) AS w FROM arrs) GROUP BY w
    ), pairs AS (
      SELECT t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM arrs WHERE len(t) >= 2)
    ), pab AS (
      SELECT w1, w2, COUNT(*) AS c_ab FROM pairs GROUP BY w1, w2
      HAVING COUNT(*) >= 5
    ), scored AS (
      SELECT w1, w2, c_ab,
             CAST(FLOOR(10000 * ln((CAST(c_ab AS DOUBLE) * n_uni * n_uni)
                                   / (n_bi * a.c * b.c)) + 0.5) AS BIGINT)
               AS pmi_fp
      FROM pab
      JOIN uni a ON pab.w1 = a.w
      JOIN uni b ON pab.w2 = b.w
      CROSS JOIN totals
    )
    SELECT w1, w2, c_ab, pmi_fp, rnk FROM (
      SELECT w1, w2, c_ab, pmi_fp,
             CAST(row_number() OVER (ORDER BY pmi_fp DESC, w1 ASC, w2 ASC)
                  AS BIGINT) AS rnk
      FROM scored
    ) WHERE rnk <= 100
    """,
)
def j9g_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information (§2.J9 —
    the word2vec phrase-builder score): top-100 adjacent pairs by
    quantized-micro-nat PMI with a min-count-5 support filter.  One
    ln per pair on an identical IEEE expression tree, integer
    everywhere else.  See operators/text.py:bigram_pmi."""
    from ..operators.text import bigram_pmi

    return bigram_pmi(load_table(spark, sf_dir, "documents"))


@register(
    "j4l_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]')) AS ch
      FROM documents
    ), per AS (
      SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
    ), withn AS (
      SELECT doc_id, ch, c, CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
      FROM per
    ), terms AS (
      SELECT doc_id, n,
             CAST(FLOOR(10000 * ln(CAST(n AS DOUBLE) / c) + 0.5) AS BIGINT) * c
               AS term
      FROM withn
    )
    SELECT doc_id, MAX(n) AS n_alnum,
           CAST(SUM(term) AS BIGINT) AS ent_fp_total,
           CAST(ROUND(CAST(SUM(term) AS DOUBLE) / MAX(n), 0) AS BIGINT)
             AS mean_ent_fp
    FROM terms GROUP BY doc_id
    """,
)
def j4l_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy gibberish detector (§2.J4 — base64 blobs and
    key-mash score near the uniform ceiling ln 36, natural text well
    below): per-doc Shannon entropy over [a-z0-9] in exact quantized
    micro-nats (the j9d contract).  ASCII-only char split keeps both
    engines codepoint-identical by construction.  See
    operators/text.py:char_entropy."""
    from ..operators.text import char_entropy

    return char_entropy(load_table(spark, sf_dir, "documents"))


def _bpe_rounds_sql(n_merges: int) -> str:
    """The shared WITH-chain that RE-DERIVES BPE training in DuckDB —
    ``n_merges`` unrolled rounds of pair count -> deterministic argmax
    (count desc, left, right) -> greedy apply — over a chr(1)-anchored
    string encoding of the token stream: every token is wrapped in
    single chr(1) anchors and joined, so a pair pattern
    chr(1)l chr(1)chr(1)r chr(1) is boundary-anchored on BOTH sides
    (an un-anchored right side would prefix-match a longer merged
    token — e.g. pair (order, order) against token "order fast";
    caught by a doc-464 parity diff).  Tokens are whitespace-split so
    they contain no chr(1); ``replace`` scans left-to-right and
    resumes AFTER each replacement, and consecutive pair occurrences
    never share characters under this encoding — exactly the
    operators/text.py:_apply_merge fold semantics.  A round whose
    best pair falls below min_count=2 rewrites with a chr(2) pattern
    that matches nothing — the no-op twin of bpe_train's early stop
    (once a round no-ops, the corpus is unchanged, so every later
    round derives the same sub-threshold argmax and no-ops too).
    Exposes CTEs ``m1..mN`` (the per-round argmax rows) and ``rN``
    (the fully-rewritten corpus) for the callers' final SELECTs."""
    sep = "chr(1) || chr(1)"
    parts = [
        r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS l
      FROM documents
    ), r0 AS (
      SELECT doc_id, len(l) AS n_before,"""
        + f"\n             chr(1) || array_to_string(l, {sep}) || chr(1) AS s"
        + "\n      FROM t\n    )"
    ]
    for i in range(1, n_merges + 1):
        prev = f"r{i - 1}"
        parts.append(
            f""", p{i} AS (
      SELECT w[i] AS lft, w[i + 1] AS rght, COUNT(*) AS n
      FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
            FROM (SELECT string_split(trim(s, chr(1)), {sep}) AS w
                  FROM {prev})
            WHERE len(w) >= 2)
      GROUP BY 1, 2
    ), m{i} AS (
      SELECT lft, rght, n FROM p{i} ORDER BY n DESC, lft, rght LIMIT 1
    ), r{i} AS (
      SELECT doc_id, n_before,
             replace(s,
               coalesce((SELECT CASE WHEN n >= 2
                                     THEN chr(1) || lft || {sep} || rght || chr(1)
                                     ELSE chr(2) END FROM m{i}), chr(2)),
               coalesce((SELECT CASE WHEN n >= 2
                                     THEN chr(1) || lft || ' ' || rght || chr(1)
                                     ELSE chr(3) END FROM m{i}), chr(3))) AS s
      FROM {prev}
    )"""
        )
    return "".join(parts)


def _bpe_train_oracle(n_merges: int = 5) -> str:
    """DuckDB twin of ``bpe_train`` ITSELF: the merge table the
    training loop emits, one row per effective round, re-derived by
    the shared unrolled-round chain.  Rounds whose argmax falls below
    min_count=2 produce no row — and once one no-ops, all later
    rounds re-derive the same sub-threshold argmax (corpus unchanged),
    so the plain ``n >= 2`` filter reproduces the early stop."""
    rows = "\n      UNION ALL ".join(
        f"""SELECT CAST({i - 1} AS BIGINT) AS iteration,
             lft AS "left", rght AS "right", CAST(n AS BIGINT) AS n
      FROM m{i} WHERE n >= 2"""
        for i in range(1, n_merges + 1)
    )
    return _bpe_rounds_sql(n_merges) + f"\n    {rows}"


@register("j9h_bpe_train", oracle=_bpe_train_oracle(5))
def j9h_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE merge training (§2.J9 — the tokenizer-training
    loop itself, not just its inner scan j9c): five rounds of
    corpus-wide pair counting → argmax promotion → codegen'd
    array-fold rewrite, driver-loop-iterative like k-means/CC (only
    the bounded argmax row crosses to the driver; localCheckpoint per
    round).  ORACLE-BEARING since round 8 (was rows-only): the oracle
    RE-DERIVES the merge table itself — five unrolled
    count/argmax/apply rounds over the chr(1)-anchored greedy replace
    (_bpe_rounds_sql), early stop reproduced by the n >= 2 filter —
    so the training loop's OUTPUT is hash-verified cross-engine, on
    top of the pure-Python-model equivalence pinned in
    tests/test_round5_ops.py.  See operators/text.py:bpe_train."""
    from ..operators.text import bpe_train

    merges = bpe_train(load_table(spark, sf_dir, "documents"), n_merges=5)
    return spark.createDataFrame(
        merges or [], "iteration int, left string, right string, n long"
    ).select(
        F.col("iteration").cast("long"), "left", "right", F.col("n").cast("long")
    )


@register(
    "j4m_gopher_rules",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             string_split_regex(trim(text), '\\s+') AS toks,
             string_split(text, chr(10)) AS lines,
             CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
               AS word_chars,
             CAST((length(text)
                   - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) // 3
                  AS BIGINT) AS n_ellipsis,
             CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
               AS n_hash
      FROM documents),
    t AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             word_chars,
             CAST(len(list_filter(toks, tk -> regexp_matches(tk, '[A-Za-z]')))
                  AS BIGINT) AS alpha_words,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(lines,
                    ln -> starts_with(trim(ln), '-')
                          OR starts_with(trim(ln), '*'))) AS BIGINT)
               AS bullet_lines,
             CAST(len(list_filter(lines, ln -> ends_with(trim(ln), '...')))
                  AS BIGINT) AS ellipsis_lines,
             n_hash + n_ellipsis AS sym_chars
      FROM s)
    SELECT doc_id, n_words, word_chars, alpha_words, n_lines, bullet_lines,
           ellipsis_lines, sym_chars,
           (n_words >= 50 AND n_words <= 100000) AS r_word_count,
           (word_chars >= 3 * n_words AND word_chars <= 10 * n_words)
             AS r_mean_word_len,
           (alpha_words * 10 >= n_words * 8) AS r_alpha_ratio,
           (bullet_lines * 10 <= n_lines * 9) AS r_bullet_ratio,
           (ellipsis_lines * 10 <= n_lines * 3) AS r_ellipsis_ratio,
           (sym_chars * 10 <= n_words) AS r_symbol_ratio,
           ((n_words >= 50 AND n_words <= 100000)
            AND (word_chars >= 3 * n_words AND word_chars <= 10 * n_words)
            AND (alpha_words * 10 >= n_words * 8)
            AND (bullet_lines * 10 <= n_lines * 9)
            AND (ellipsis_lines * 10 <= n_lines * 3)
            AND (sym_chars * 10 <= n_words)) AS passes_gopher
    FROM t
    """,
)
def j4m_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule gate (§2.J4 — the composite corpus filter
    every LLM ingest pipeline runs before tokenization; see
    operators/text.py:gopher_signals for the rule set and the
    exact-integer design).  Emits the raw signals AND each rule's
    verdict so a corpus audit can see WHY a document failed, not just
    that it did."""
    from ..operators.text import gopher_signals

    docs = load_table(spark, sf_dir, "documents")
    sig = gopher_signals("text")
    return docs.select("doc_id", *[col.alias(name) for name, col in sig.items()])


@register(
    "j5g_audio_vad_segments",
    oracle="""
    WITH wins AS (
      SELECT doc_id, CAST(i AS INT) AS win_no,
             CAST(i * 16 AS BIGINT) AS win_start,
             substr(text, CAST(i * 16 + 1 AS INT), 32) AS w
      FROM documents,
           unnest(range(0, least(16, CASE WHEN length(text) = 0 THEN 0
                                          ELSE (length(text) - 1) // 16 + 1 END)))
             AS t(i)
    ), framed AS (
      SELECT doc_id, win_no, win_start,
             CAST(length(w) AS BIGINT) AS win_len,
             CAST((SELECT COALESCE(SUM(ord(substr(w, CAST(j AS INT), 1))), 0)
                   FROM unnest(range(1, length(w) + 1)) AS s(j)) AS BIGINT)
               AS energy
      FROM wins
    ), active AS (
      SELECT doc_id, win_no, win_start, win_len, energy,
             win_no - row_number() OVER (PARTITION BY doc_id ORDER BY win_no)
               AS island
      FROM framed WHERE energy > win_len * 96
    )
    SELECT doc_id,
           CAST(min(win_start) AS BIGINT) AS seg_start,
           CAST(max(win_start + win_len) AS BIGINT) AS seg_end,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(energy) AS BIGINT) AS total_energy
    FROM active GROUP BY doc_id, island
    """,
)
def j5g_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segments (J5): the decode → frame → threshold →
    coalesce chain of a speech-corpus pipeline — j5e's Arrow-batched
    framing feeding the gaps-and-islands segmenter
    (operators/multimodal.py:vad_segments).  The ASCII fixture keeps
    frame energies SQL-computable, so the oracle verifies the FULL
    chain including run-coalescing boundary semantics (shared bytes
    under hop < window, single-frame islands, tail frames)."""
    from ..operators.multimodal import (
        attach_binary_payload,
        audio_energy_windows,
        vad_segments,
    )

    docs = load_table(spark, sf_dir, "documents")
    return vad_segments(audio_energy_windows(attach_binary_payload(docs)))


@register(
    "j4n_linear_classifier",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_transform(string_split_regex(trim(text), '\s+'),
                            t -> lower(t)) AS toks
      FROM documents
    ), feats AS (
      SELECT doc_id, lang,
             CAST(len(toks) AS BIGINT) AS n_feats,
             list_transform(toks,
                t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 4096) AS b
      FROM toks
    )
    SELECT doc_id, lang, n_feats,
           CAST(list_sum(list_transform(b, x -> x % 7 - 3)) AS BIGINT)
             AS score_u,
           (list_sum(list_transform(b, x -> x % 7 - 3)) > 0) AS predicted_keep
    FROM feats
    """,
)
def j4n_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear classifier inference (§2.J4 — the
    fastText-style quality/safety scorer every modern corpus pipeline
    runs per document, e.g. the DCLM/FineWeb-Edu filter stage), as
    PURE column expressions: tokens hash into 4096 feature buckets
    (md5-prefix — the repo's engine-portable hash convention), each bucket
    carries an integer weight (here a fixed synthetic weight table
    w(b) = b mod 7 − 3; in production a broadcast weight array from a
    trained model), and the document score is the weight sum — a
    shuffle-free scan-side map, the shape that scores 100 TB without a
    single exchange or UDF.  Exact integer arithmetic end-to-end."""
    from ..operators.text import hashed_linear_score

    docs = load_table(spark, sf_dir, "documents")
    n_feats, score = hashed_linear_score("text")
    return docs.select(
        "doc_id",
        "lang",
        n_feats.alias("n_feats"),
        score.alias("score_u"),
        (score > 0).alias("predicted_keep"),
    )


@register(
    "j5h_mime_sniffing",
    oracle=r"""
    WITH p AS (
      SELECT doc_id,
             (CASE doc_id % 4
                WHEN 0 THEN '\x89\x50\x4E\x47\x0D\x0A\x1A\x0A'::BLOB
                WHEN 1 THEN '\xFF\xD8\xFF'::BLOB
                WHEN 2 THEN encode(CASE WHEN doc_id % 8 = 2
                                        THEN 'GIF87a' ELSE 'GIF89a' END)
                ELSE ''::BLOB END) || encode(text) AS payload
      FROM documents)
    SELECT doc_id,
           CASE WHEN left(hex(payload), 16) = '89504E470D0A1A0A'
                  THEN 'image/png'
                WHEN left(hex(payload), 6) = 'FFD8FF'
                  THEN 'image/jpeg'
                WHEN left(hex(payload), 8) = hex(encode('GIF8'))
                  THEN 'image/gif'
                ELSE 'application/octet-stream' END AS sniffed_mime,
           CAST(octet_length(payload) AS BIGINT) AS n_bytes
    FROM p
    """,
)
def j5h_mime_sniffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte container sniffing (J5 — the decoder-dispatch step of
    a multimodal ingest): payloads planted with real PNG/JPEG/GIF
    signatures (by doc_id mod 4; the remainder stays headerless) are
    classified by binary prefix inspection
    (operators/multimodal.py:sniff_mime; both GIF87a and GIF89a are
    planted — the sniff is the version-agnostic 'GIF8' prefix).  The oracle rebuilds the
    same blobs with DuckDB BLOB literals and re-sniffs them with its
    own hex-prefix comparisons — parity proves the byte-level signatures, not
    just the planting rule."""
    from ..operators.multimodal import sniff_mime

    docs = load_table(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 4 == 0, F.unhex(F.lit("89504E470D0A1A0A")))
        .when(F.col("doc_id") % 4 == 1, F.unhex(F.lit("FFD8FF")))
        .when(
            F.col("doc_id") % 4 == 2,
            F.when(F.col("doc_id") % 8 == 2, F.lit("GIF87a"))
            .otherwise(F.lit("GIF89a"))
            .cast("binary"),
        )
        .otherwise(F.lit("").cast("binary"))
    )
    p = docs.select(
        "doc_id", F.concat(magic, F.col("text").cast("binary")).alias("payload")
    )
    return p.select(
        "doc_id",
        sniff_mime("payload").alias("sniffed_mime"),
        F.length("payload").cast("long").alias("n_bytes"),
    )


def _bpe_encode_oracle(n_merges: int = 4) -> str:
    """DuckDB twin of train-then-encode BPE: the merge table is
    RE-DERIVED inside the oracle by the shared unrolled-round chain
    (:func:`_bpe_rounds_sql` — see there for the chr(1)-anchored
    greedy-replace mechanics and the early-stop no-op twin), then the
    per-doc raw vs encoded token counts are read off the final
    rewritten corpus — so an ITERATIVE tokenizer becomes
    hash-verifiable cross-engine, the e18-pagerank contract applied
    to BPE."""
    sep = "chr(1) || chr(1)"
    return (
        _bpe_rounds_sql(n_merges)
        + f"""
    SELECT doc_id,
           CAST(n_before AS BIGINT) AS n_tokens_raw,
           CAST(len(string_split(trim(s, chr(1)), {sep})) AS BIGINT)
             AS n_tokens_bpe,
           CAST(n_before - len(string_split(trim(s, chr(1)), {sep}))
                AS BIGINT) AS n_merged
    FROM r{n_merges}"""
    )


# trained merge tables, one per (sf_dir, n_merges) per process — the
# same offline-artifact contract as the IVF centroids: training cost
# is paid once (bench warm-up), the row times the ENCODE scan.
_BPE_MERGE_FIXTURE: dict[tuple[str, int], list] = {}


def _bpe_merges(spark: SparkSession, sf_dir: str, n_merges: int) -> list:
    from ..operators.text import bpe_train

    key = (sf_dir, n_merges)
    if key not in _BPE_MERGE_FIXTURE:
        _BPE_MERGE_FIXTURE[key] = bpe_train(
            load_table(spark, sf_dir, "documents"), n_merges=n_merges
        )
    return _BPE_MERGE_FIXTURE[key]


@register("j9i_bpe_encode", oracle=_bpe_encode_oracle(4))
def j9i_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE with the trained merge table (§2.J9 — the apply side
    of the tokenizer j9h trains, and the family's first ORACLE-BEARING
    iterative row): four trained merges applied in order as chained
    greedy folds (operators/text.py:apply_bpe_merges — pure column
    expressions, scan-fused, no shuffle), reporting per-doc raw vs
    encoded token counts.  The oracle re-derives the merge table
    itself — four unrolled count/argmax/apply rounds in DuckDB — so
    training AND encoding are verified end-to-end cross-engine (see
    _bpe_encode_oracle).  Merge training is a session fixture (offline
    artifact, the IVF-centroid contract); the bench row times the
    encode scan."""
    from ..functions import ws_tokens
    from ..operators.text import apply_bpe_merges

    docs = load_table(spark, sf_dir, "documents")
    merges = _bpe_merges(spark, sf_dir, 4)
    toks = docs.select(
        "doc_id",
        F.size(ws_tokens(F.lower(F.trim(F.col("text"))))).cast("long").alias(
            "n_tokens_raw"
        ),
        ws_tokens(F.lower(F.trim(F.col("text")))).alias("t"),
    )
    encoded = apply_bpe_merges(toks, merges, col="t")
    # n_tokens_bpe referenced once; n_merged derived from the two size
    # ATTRIBUTES so the encode chain is never double-evaluated.
    sized = encoded.select(
        "doc_id", "n_tokens_raw", F.size("t").cast("long").alias("n_tokens_bpe")
    )
    return sized.withColumn(
        "n_merged", (F.col("n_tokens_raw") - F.col("n_tokens_bpe")).cast("long")
    )


@register("j5i_incremental_media_dedup", oracle=None)
def j5i_incremental_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental multimodal near-dup dedup, BATCH twin (§2.J5 × H —
    the image-dedup analog of j2m): the media corpus (documents
    wrapped as binary payloads, plus the j5f planted re-encoded twins)
    arrives in 3 waves (doc_id % 3); a row is dropped iff its 64-bit
    perceptual dHash is within Hamming 3 of an earlier-wave SURVIVOR
    or a smaller-id row of its own wave — first-ARRIVED survives.
    One dHash pass + pigeonhole-complete band pairs + the SHARED
    arrival-wave fold (operators/dedup.py:incremental_wave_fold, the
    exact set algebra j2m uses).  Rows-only by nature (the hash lives
    behind the Python decode boundary — the j5f contract); planted
    twin/cap/parity guarantees are pinned in tests/test_multimodal.py
    and the streaming twin's tests.  See
    operators/multimodal.py:incremental_media_dedup."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_binary_payload(docs)
    twins = media.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.concat(
            F.lit(b"\x00"),
            F.expr("substring(payload, 2, length(payload) - 2)"),
            F.lit(b"\x00"),
        ).alias("payload"),
        "meta",
    )
    return multimodal.incremental_media_dedup(media.unionByName(twins))
