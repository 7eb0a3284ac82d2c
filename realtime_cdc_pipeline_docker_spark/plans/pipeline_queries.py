"""Training-data pipeline queries over `documents` (SURVEY §2.J
extensions): repetition quality signals, stratified source sampling,
sequence packing.  All pure DataFrame plans with exact DuckDB oracles —
no UDFs, no collect."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.sampling import pack_sequences, stratified_sample
from ..operators.text import repetition_signals
from .registry import register


@register(
    "j4f_repetition_signals",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS l FROM documents
    ), tok AS (
      SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok FROM t
    ), big AS (
      SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS bg
      FROM tok QUALIFY bg IS NOT NULL
    ), wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
       ws AS (SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS n,
                     COUNT(*) AS nd FROM wc GROUP BY 1),
       bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2),
       bs AS (SELECT doc_id, MAX(c) AS mxb FROM bc GROUP BY 1)
    SELECT ws.doc_id AS doc_id, n AS n_tokens,
           mx / n AS top_word_frac,
           (n - nd) / n AS dup_word_frac,
           CASE WHEN n > 1 THEN mxb / (n - 1) ELSE 0.0 END AS top_bigram_frac
    FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
    """,
)
def j4f_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (top-word / duplicate-word /
    top-bigram fractions) — see operators/text.py:repetition_signals
    for the plan-shape notes."""
    return repetition_signals(load_table(spark, sf_dir, "documents"))


@register(
    "j6a_stratified_sample",
    oracle="""
    SELECT doc_id, source, lang, n_chars
    FROM documents
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
          < 20 + (CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 3) * 20
    """,
)
def j6a_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix re-weighting: per-source Bernoulli rates (20/40/60 %
    here, derived from the source id — in production a quality-tier
    map) applied as a deterministic hash filter.  No shuffle, no
    state: the accept set is a pure function of (doc_id, source), so
    the sample is identical on every rerun and on any cluster layout —
    the property ``df.sample`` cannot give."""
    docs = load_table(spark, sf_dir, "documents")
    rate = 20 + (
        F.regexp_extract("source", r"([0-9]+)", 1).cast("long") % 3
    ) * 20
    return stratified_sample(docs, rate).select("doc_id", "source", "lang", "n_chars")


@register(
    "j6b_sequence_packing",
    oracle=r"""
    WITH d AS (
      SELECT source, doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
      FROM documents
    ), binned AS (
      SELECT source, doc_id, n_tok,
             CAST((SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id)
                   - n_tok) // 512 AS BIGINT) AS seq_id
      FROM d
    )
    SELECT source, seq_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
           CAST(SUM(n_tok) AS BIGINT) / 512.0 AS fill_ratio
    FROM binned GROUP BY 1, 2
    """,
)
def j6b_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing plan: documents binned into 512-token
    sequences per source in deterministic doc_id order — one window +
    one aggregate, both keyed on source (see
    operators/sampling.py:pack_sequences)."""
    return pack_sequences(load_table(spark, sf_dir, "documents"), ctx_tokens=512)


@register(
    "j6c_corpus_filter_stats",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ), wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
       ws AS (SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS n,
                     COUNT(*) AS nd FROM wc GROUP BY 1),
       q AS (
      SELECT doc_id,
             least(len(string_split_regex(trim(text), '\s+')) / 100.0, 1.0) * 0.5
               + length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                 / length(text) * 0.5 AS quality
      FROM documents
    ), flags AS (
      SELECT d.source,
             CASE WHEN ws.n >= 20 AND q.quality >= 0.55
                   AND ws.mx / ws.n <= 0.12
                   AND (ws.n - ws.nd) / ws.n <= 0.75
                  THEN 1 ELSE 0 END AS keep
      FROM documents d JOIN ws ON d.doc_id = ws.doc_id
                       JOIN q  ON d.doc_id = q.doc_id
    )
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(keep) AS BIGINT) AS n_kept,
           CAST(SUM(keep) AS BIGINT) * 1.0 / COUNT(*) AS kept_frac
    FROM flags GROUP BY source
    """,
)
def j6c_corpus_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation gate: length + composite quality +
    repetition thresholds (the j4c/j4f signals composed), reported as
    per-source survival stats — the yield dashboard a corpus run
    watches.  All three signal computations key on doc_id, so the
    joins are co-partitioned with the signal aggregates; only
    per-source counters leave the final stage.  Every gate compares
    doubles derived from exact integer counts — engine-identical."""
    from ..operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    rep = repetition_signals(docs)
    qual = docs.select("doc_id", quality_score().alias("quality"))
    keep = (
        (F.col("n_tokens") >= 20)
        & (F.col("quality") >= 0.55)
        & (F.col("top_word_frac") <= 0.12)
        & (F.col("dup_word_frac") <= 0.75)
    )
    return (
        docs.select("doc_id", "source")
        .join(rep, "doc_id")
        .join(qual, "doc_id")
        .withColumn("keep", keep.cast("long"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("keep").alias("n_kept"))
        .withColumn("kept_frac", F.col("n_kept") * F.lit(1.0) / F.col("n_docs"))
    )


def _curated_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared curated-corpus subplan: exact dedup (min-id per
    normalized-text digest) → curation gates (length, composite
    quality, repetition) → stratified source sampling — the chain both
    j7 (packing yield) and j7b (shard manifest) report on.  Returns
    (source, doc_id, n_tok) survivors."""
    from ..operators.dedup import dedup_exact
    from ..operators.sampling import portable_row_hash
    from ..operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    base = docs.join(dedup_exact(docs).select("doc_id"), "doc_id", "left_semi")
    rep = repetition_signals(base)
    qual = base.select("doc_id", quality_score().alias("quality"))
    rate = 20 + (F.regexp_extract("source", r"([0-9]+)", 1).cast("long") % 3) * 20
    return (
        base.select("doc_id", "source")
        .join(rep, "doc_id")
        .join(qual, "doc_id")
        .filter(
            (F.col("n_tokens") >= 20)
            & (F.col("quality") >= 0.55)
            & (F.col("top_word_frac") <= 0.12)
            & (F.col("dup_word_frac") <= 0.75)
            & (portable_row_hash("doc_id") < rate)
        )
        .select("source", "doc_id", F.col("n_tokens").alias("n_tok"))
    )


@register(
    "j7_corpus_pipeline_e2e",
    oracle=r"""
    WITH dedup AS (
      SELECT MIN(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
    ), base AS (
      SELECT d.* FROM documents d JOIN dedup USING (doc_id)
    ), tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM base
    ), wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
       ws AS (SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS n,
                     COUNT(*) AS nd FROM wc GROUP BY 1),
       kept AS (
      SELECT b.source, b.doc_id, ws.n AS n_tok
      FROM base b JOIN ws ON b.doc_id = ws.doc_id
      WHERE ws.n >= 20
        AND least(len(string_split_regex(trim(b.text), '\s+')) / 100.0, 1.0) * 0.5
            + length(regexp_replace(b.text, '[^A-Za-z]', '', 'g'))
              / length(b.text) * 0.5 >= 0.55
        AND ws.mx / ws.n <= 0.12
        AND (ws.n - ws.nd) / ws.n <= 0.75
        AND CAST('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
            < 20 + (CAST(regexp_extract(b.source, '([0-9]+)', 1) AS BIGINT) % 3) * 20
    ), binned AS (
      SELECT source, doc_id, n_tok,
             (SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) - n_tok)
               // 512 AS seq_id
      FROM kept
    )
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(MAX(seq_id) + 1 AS BIGINT) AS n_seqs
    FROM binned GROUP BY source
    """,
)
def j7_corpus_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship training-data pipeline, end to end in ONE declarative
    plan: exact dedup (min-id per normalized-text digest) → curation
    gates (length, composite quality, repetition) → stratified source
    sampling (deterministic hash rates) → context-window packing →
    per-source yield report (docs, tokens, packed sequences).

    Catalyst sees the whole chain, so column pruning reaches the scan
    and the doc_id-keyed stages (dedup semi-join, signal joins) share
    partitionings.  Stage costs at 100 TB: two text passes (digest +
    tokenize), both map-side combined; the sample filter is free; the
    packing window shuffles only (source, doc_id, n_tok) triplets of
    survivors."""
    kept = _curated_kept(spark, sf_dir)
    binned = kept.withColumn(
        "seq_id", F.expr("(sum(n_tok) over (partition by source order by doc_id) - n_tok) div 512")
    )
    return binned.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        (F.max("seq_id") + 1).alias("n_seqs"),
    )


@register(
    "j6d_corpus_shuffle",
    oracle=r"""
    WITH h AS (
      SELECT doc_id,
             md5('shuf:' || CAST(doc_id AS VARCHAR)) AS hex,
             CAST('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 15)
                  AS BIGINT) % 32 AS shard
      FROM documents
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY hex, doc_id)
                AS BIGINT) AS pos_in_shard
    FROM h
    """,
)
def j6d_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle (J6): every doc assigned a
    (shard, pos_in_shard) from an engine-portable md5 permutation — the
    pre-training example-order randomization, rerun-stable by
    construction (see operators/sampling.py:shuffle_corpus)."""
    from ..operators.sampling import shuffle_corpus

    docs = load_table(spark, sf_dir, "documents")
    return shuffle_corpus(docs, num_shards=32).select("doc_id", "shard", "pos_in_shard")


@register(
    "j6e_quality_quantile_filter",
    oracle=r"""
    WITH q AS (
      SELECT doc_id, source,
             least(len(string_split_regex(trim(text), '\s+')) / 100.0, 1.0) * 0.5
               + length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                 / length(text) * 0.5 AS quality
      FROM documents
    )
    SELECT doc_id, source, quality, pct_rank FROM (
      SELECT doc_id, source, quality,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY quality ASC, doc_id ASC) AS pct_rank
      FROM q
    ) WHERE pct_rank >= 0.25
    """,
)
def j6e_quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile gate (J6): drop each source's bottom quality
    quartile by RANK, not by value threshold — exact integer arithmetic
    ((rank-1)/(n-1)), so no floating-point quantile boundary can flip a
    row across engines (see operators/sampling.py:quantile_filter)."""
    from ..operators.sampling import quantile_filter
    from ..operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("doc_id", "source", quality_score().alias("quality"))
    return quantile_filter(q, "quality", keep_top=0.75)


@register(
    "j7b_shard_manifest",
    oracle=r"""
    WITH dedup AS (
      SELECT MIN(doc_id) AS doc_id
      FROM documents
      GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
    ), base AS (
      SELECT d.* FROM documents d JOIN dedup USING (doc_id)
    ), tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM base
    ), wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
       ws AS (SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS n,
                     COUNT(*) AS nd FROM wc GROUP BY 1),
       kept AS (
      SELECT b.source, b.doc_id, ws.n AS n_tok
      FROM base b JOIN ws ON b.doc_id = ws.doc_id
      WHERE ws.n >= 20
        AND least(len(string_split_regex(trim(b.text), '\s+')) / 100.0, 1.0) * 0.5
            + length(regexp_replace(b.text, '[^A-Za-z]', '', 'g'))
              / length(b.text) * 0.5 >= 0.55
        AND ws.mx / ws.n <= 0.12
        AND (ws.n - ws.nd) / ws.n <= 0.75
        AND CAST('0x' || substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
            < 20 + (CAST(regexp_extract(b.source, '([0-9]+)', 1) AS BIGINT) % 3) * 20
    )
    SELECT CAST(CAST('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 15)
                AS BIGINT) % 32 AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT source) AS n_sources
    FROM kept GROUP BY 1
    """,
)
def j7b_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's last mile: the curated corpus (same dedup → gates
    → sample chain as j7) routed through the deterministic global
    shuffle into 32 loader shards, reported as the shard manifest a
    training job consumes (docs, tokens, source mix per shard).  The
    interesting property is what the manifest shows: md5 sharding mixes
    every source into every shard at near-uniform token counts — the
    anti-curriculum guarantee — while remaining fully rerun-stable."""
    from ..operators.sampling import shuffle_corpus

    kept = _curated_kept(spark, sf_dir)
    return (
        shuffle_corpus(kept, num_shards=32)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.count_distinct("source").alias("n_sources"),
        )
    )


@register(
    "h8_stream_corpus_ingest",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ), wc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
       ws AS (SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS n
              FROM wc GROUP BY 1),
       kept AS (
      SELECT d.doc_id, d.source, d.lang,
             md5(regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g')) AS digest
      FROM documents d JOIN ws ON d.doc_id = ws.doc_id
      WHERE ws.n >= 20
        AND least(len(string_split_regex(trim(d.text), '\s+')) / 100.0, 1.0) * 0.5
            + length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))
              / length(d.text) * 0.5 >= 0.55
        AND ws.mx / ws.n <= 0.12
    ), keepers AS (
      SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY digest
    )
    SELECT k.doc_id, k.source, k.lang, k.digest
    FROM kept k JOIN keepers USING (doc_id)
    """,
)
def h8_stream_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingestion (§2.H × §2.J): the documents fixture
    replayed as a parquet file stream through the stateless curation
    gates (HOF repetition recompute — no shuffle in the micro-batch
    plan) into the digest-deduped curated log; stream == batch golden
    == this SQL oracle.  The oracle's MIN(doc_id)-per-digest keeper is
    safe under ANY micro-batch split: the sink admits only strictly
    lower doc_ids for logged digests and the read-back collapses to
    the global min, so keeper identity is arrival-order-free (no
    single-batch assumption).  Redelivery/restart/out-of-order
    idempotence tested in tests/test_streaming_ingest.py."""
    from ..streaming.ingest import run_corpus_ingest_stream
    from .cdc_queries import _work_dir

    work = _work_dir("corpus_ingest", sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(8).write.mode("overwrite").parquet(f"{work}/src")
    log = run_corpus_ingest_stream(
        spark, f"{work}/src", f"{work}/log", f"{work}/ckpt"
    )
    return log.select("doc_id", "source", "lang", "digest")


@register(
    "j6f_token_budget_mixture",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
             md5('mix:' || CAST(doc_id AS VARCHAR)) AS hex
      FROM documents
    ), ordered AS (
      SELECT doc_id, source, n_tok,
             CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY hex, doc_id)
                  - n_tok AS BIGINT) AS cum_tok
      FROM d
    )
    SELECT doc_id, source, n_tok, cum_tok
    FROM ordered
    WHERE cum_tok < 2000 + (CAST(regexp_extract(source, '([0-9]+)', 1) AS BIGINT) % 3) * 3000
    """,
)
def j6f_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted epoch mixture (J6): each source contributes
    documents in deterministic md5 order until its token budget fills
    (2k/5k/8k tokens here, derived from the source id — in production
    the domain-weight table).  See
    operators/sampling.py:token_budget_mixture."""
    from ..operators.sampling import token_budget_mixture

    docs = load_table(spark, sf_dir, "documents")
    budget = 2000 + (
        F.regexp_extract("source", r"([0-9]+)", 1).cast("long") % 3
    ) * 3000
    return token_budget_mixture(docs, budget).select(
        "doc_id", "source", "n_tok", "cum_tok"
    )


@register(
    "j6g_leakage_safe_split",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, source,
             md5('split:' || md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
               AS h
      FROM documents
    ), b AS (
      SELECT doc_id, source,
             CAST(CAST('0x' || substr(h, 1, 15) AS BIGINT) % 100 AS BIGINT) AS bucket
      FROM d
    )
    SELECT doc_id, source,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def j6g_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-aware train/val/test split (J6): the bucket is an md5 of
    the normalized-text DIGEST, so byte-equal documents land in the
    same split whatever their doc_ids — the id-keyed alternative leaks
    every exact-duplicate pair across the train/eval boundary.
    Shuffle-free pure projection; see
    operators/sampling.py:leakage_safe_split (90/5/5 here)."""
    from ..operators.sampling import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    return leakage_safe_split(docs, train_pct=90, val_pct=5).select(
        "doc_id", "source", "split"
    )


@register(
    "j6h_chunk_overlap",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ), c AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(generate_series(
               0, CAST((greatest(len(toks) - 64, 0) + 47) // 48 AS BIGINT)
             )) AS chunk_no
      FROM t
    )
    SELECT doc_id, CAST(chunk_no AS INT) AS chunk_no,
           CAST(len(list_slice(toks, chunk_no * 48 + 1,
                               least(chunk_no * 48 + 64, n))) AS BIGINT)
             AS n_tokens,
           md5(array_to_string(list_slice(toks, chunk_no * 48 + 1,
                                          least(chunk_no * 48 + 64, n)), ' '))
             AS chunk_hash
    FROM c
    """,
)
def j6h_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (J6): 64-token chunks at
    stride 48 (16 tokens of overlap) — the document → model-input step
    of RAG / context-window prep.  Scan → generate → project, no
    Exchange (plan-asserted in tests/test_sampling.py); chunk_hash is
    the engine-portable md5 chunk identity for downstream chunk-level
    dedup.  See operators/sampling.py:chunk_documents."""
    from ..operators.sampling import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, stride=48)


@register(
    "j6i_chunk_dedup_stats",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ), c AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(generate_series(
               0, CAST((greatest(len(toks) - 64, 0) + 47) // 48 AS BIGINT)
             )) AS chunk_no
      FROM t
    ), chunks AS (
      SELECT doc_id, CAST(chunk_no AS INT) AS chunk_no,
             md5(array_to_string(list_slice(toks, chunk_no * 48 + 1,
                                            least(chunk_no * 48 + 64, n)), ' '))
               AS chunk_hash
      FROM c
    ), ranked AS (
      SELECT doc_id, chunk_no,
             row_number() OVER (PARTITION BY chunk_hash
                                ORDER BY doc_id, chunk_no) AS rn
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
    FROM ranked GROUP BY doc_id
    """,
)
def j6i_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity dedup report (J6): how much of each document
    is boilerplate already seen elsewhere in the corpus — whole-doc
    dedup misses a page whose middle third is a shared template; the
    64-token chunk identity (j6h) catches it.  A chunk is a duplicate
    when another chunk with the same md5 identity precedes it in
    (doc_id, chunk_no) order — the same min-keeper convention as j1.
    One shuffle on chunk_hash (32-char keys, never chunk text), one
    doc-keyed aggregate; both map-side combinable at 100 TB."""
    from pyspark.sql import Window

    from ..operators.sampling import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_tokens=64, stride=48)
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_no")
    return (
        chunks.withColumn("rn", F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_chunks"),
        )
    )


# path of the exported-and-corrupted text corpus, one per (sf_dir,
# kind) per process — see _corrupted_corpus.
_CORRUPT_CORPUS: dict[tuple[str, str], str] = {}


def _corrupted_corpus(spark: SparkSession, sf_dir: str, kind: str) -> str:
    """Session fixture for the b12/b13 source roundtrips: export the
    fixture table in the interchange format and plant three malformed
    lines, ONCE per process per sf_dir (VERDICT r7 #6 — the bench rows
    previously re-ran the export every sample, timing the fixture
    write instead of the read+quarantine path under test).  Uses the
    ``_work_dir`` pid-suffix/reaping scheme; reset-on-entry only fires
    on the first build in this process, after which the memo serves
    the immutable corpus."""
    from ..sources.corpus import write_csv, write_jsonl
    from .cdc_queries import _work_dir

    key = (sf_dir, kind)
    if key in _CORRUPT_CORPUS:
        return _CORRUPT_CORPUS[key]
    path = f"{_work_dir(kind, sf_dir)}/docs"
    if kind == "b12_jsonl":
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
        write_jsonl(docs, path)
        garbage = [("{ not json",), ('{"doc_id": "also bad"',), ("}{",)]
    else:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        )
        write_csv(orders, path)
        garbage = [
            ("this line is not csv at all",),
            ("x,y,z,not_a_double,not_a_ts,w",),
            ("99999999999999999999999999,1,a,2.5,1995-01-01T00:00:00.000,b",),
        ]
    spark.createDataFrame(garbage, ["value"]).coalesce(1).write.mode(
        "append"
    ).format("text").save(path)
    _CORRUPT_CORPUS[key] = path
    return path


@register(
    "b12_jsonl_source_roundtrip",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM documents
    """,
)
def b12_jsonl_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL corpus source end-to-end (§2.A extension): export the
    documents table as line-delimited JSON, plant three malformed lines
    in the directory, read it back through sources/corpus.py with the
    explicit schema + corrupt-record quarantine, and return the good
    rows.  The oracle is the original parquet relation — parity proves
    (a) the JSON writer/reader round-trips every value exactly and
    (b) the quarantine removes precisely the garbage (a PERMISSIVE read
    without the corrupt filter would surface 3 extra all-NULL rows and
    go red).  The export + corrupt planting is a SESSION FIXTURE
    (written once per process per sf_dir via ``_corrupted_corpus``,
    VERDICT r7 #6: the bench row times the READ+quarantine path —
    the operator under test — not the fixture write)."""
    from ..sources.corpus import read_jsonl

    path = _corrupted_corpus(spark, sf_dir, "b12_jsonl")
    good, quarantine = read_jsonl(spark, path)
    # The quarantine channel must hold exactly the planted garbage: the
    # gate is a broadcast scalar predicate (lazy — no driver-side count
    # at construction time), so a mis-parse on either side empties the
    # result and the oracle comparison goes red.
    qn = quarantine.agg(F.count(F.lit(1)).alias("qn"))
    return good.crossJoin(F.broadcast(qn)).where(F.col("qn") == 3).drop("qn")


@register(
    "h9_stream_dedup_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(event_id) AS min_event_id,
           MAX(event_id) AS max_event_id
    FROM events
    GROUP BY event_type
    """,
)
def h9_stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-scoped streaming dedup (§2.H × Spark-native state):
    the events fixture delivered THREE times into a file stream (full,
    full again, plus a half re-redelivery — an aggressive at-least-once
    source), deduped by dropDuplicatesWithinWatermark("event_id") into
    a parquet sink.  The oracle aggregates the fixture once; parity
    proves every duplicate delivery was dropped.  See
    streaming/ingest.py:run_event_dedup_stream for the state-bound
    argument."""
    from ..streaming.ingest import run_event_dedup_stream
    from .cdc_queries import _work_dir

    work = _work_dir("event_dedup", sf_dir)
    # Watermarks require TIMESTAMP (with local TZ); the fixture's ts is
    # NTZ.  Session TZ is pinned UTC, so the cast is value-identical.
    events = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    events.write.mode("overwrite").parquet(f"{work}/src")
    events.write.mode("append").parquet(f"{work}/src")
    events.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(
        f"{work}/src"
    )
    deduped = run_event_dedup_stream(
        spark, f"{work}/src", f"{work}/sink", f"{work}/ckpt"
    )
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


@register(
    "j6j_exact_k_sample",
    oracle="""
    SELECT doc_id, source, lang, n_chars
    FROM (
      SELECT doc_id, source, lang, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('ek:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rnk
      FROM documents
    ) WHERE rnk <= 7
    """,
)
def j6j_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k per-source uniform sample (J6): the 7 smallest
    md5-hash rows per source — a deterministic distributed reservoir.
    WindowGroupLimit truncates each stratum's sort at k map-side; the
    plan never globally sorts a stratum.  See
    operators/sampling.py:exact_k_sample."""
    from ..operators.sampling import exact_k_sample

    docs = load_table(spark, sf_dir, "documents")
    return exact_k_sample(docs, k=7).select("doc_id", "source", "lang", "n_chars")


@register(
    "b13_csv_source_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders
    """,
)
def b13_csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source end-to-end (§2.A extension, the b12 contract applied
    to the other interchange format): export orders as headerless CSV,
    plant three malformed lines (wrong shape, wrong types, overflow
    BIGINT), read back through sources/corpus.py:read_csv with the
    explicit schema + corrupt-record quarantine, and return the good
    rows.  Parity vs the parquet relation proves the writer/reader
    round-trips every value exactly — including shortest-form doubles
    and ISO timestamps — AND that quarantine removes precisely the
    garbage.  The planted-count gate is the same lazy broadcast scalar
    predicate as b12; the export + planting is the same session
    fixture (``_corrupted_corpus``) so the bench row times the read
    path."""
    from ..sources.corpus import ORDERS_CSV_SCHEMA, read_csv

    path = _corrupted_corpus(spark, sf_dir, "b13_csv")
    good, quarantine = read_csv(spark, path, ORDERS_CSV_SCHEMA)
    qn = quarantine.agg(F.count(F.lit(1)).alias("qn"))
    return good.crossJoin(F.broadcast(qn)).where(F.col("qn") == 3).drop("qn")


@register(
    "b14_schema_evolution_log",
    oracle="""
    SELECT o_orderkey AS id, o_totalprice AS total_amount,
           CASE WHEN o_orderkey % 2 = 0 THEN o_orderstatus
                ELSE CAST(NULL AS VARCHAR) END AS channel
    FROM orders
    """,
)
def b14_schema_evolution_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution on the append log (§2.A/B extension):
    a CDC source gains a column mid-stream (the Debezium reality —
    upstream DDL adds ``channel``), so the parquet log holds files of
    BOTH shapes.  Wave 1 (odd keys) lands without the column, wave 2
    (even keys) with it; reading back with ``mergeSchema`` must widen
    wave-1 rows to NULL channel and lose nothing — the oracle states
    exactly that relation.  At scale this is the no-rewrite contract:
    old files are never touched when the schema grows; schema
    reconciliation happens at read (footer-merge only, no data pass)."""
    import os

    from .cdc_queries import _work_dir

    work = _work_dir("schema_evo", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    wave1 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("total_amount"),
    )
    wave2 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("total_amount"),
        F.col("o_orderstatus").alias("channel"),
    )
    log = os.path.join(work, "log")
    wave1.write.mode("append").parquet(log)
    wave2.write.mode("append").parquet(log)
    return spark.read.option("mergeSchema", "true").parquet(log).select(
        "id", "total_amount", "channel"
    )


@register(
    "b17_binaryfile_source",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def b17_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-file ingestion (§2.A extension — the REAL first hop of
    the multimodal pipeline, SURVEY §2.J5): every document's UTF-8
    bytes are written as one file on disk, read back through Spark's
    ``binaryFile`` source (whole-file binary ``content`` + path/length
    metadata columns), and reduced to driver-safe fields — the doc id
    parsed from the filename, the byte length, and the md5 of the raw
    bytes.  Parity against DuckDB's ``md5(text)``/``octet_length``
    (both hash UTF-8 bytes) proves the files round-tripped
    bit-exactly.  At scale this source is how image/audio corpora land
    as binary columns (operators/multimodal.py takes over from there);
    listing parallelizes across executors and each file is one row —
    no decode, no Python."""
    import os

    from .cdc_queries import _work_dir

    work = _work_dir("binfiles", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    (
        docs.select(
            F.concat(F.lit(f"{work}/files/doc_"), F.col("doc_id"), F.lit(".txt"))
            .alias("path"),
            F.col("text").cast("binary").alias("content"),
        )
        .repartition(8)
        .foreachPartition(_write_binary_partition)
    )
    read = spark.read.format("binaryFile").load(f"{work}/files")
    return read.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.txt$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


def _write_binary_partition(rows) -> None:
    """Executor-side writer for b17: one file per row (the shape a
    crawler or media fetcher leaves on shared storage).  Plain module
    function so Spark pickles a reference, not a closure."""
    import os

    for row in rows:
        os.makedirs(os.path.dirname(row["path"]), exist_ok=True)
        with open(row["path"], "wb") as f:
            f.write(bytes(row["content"]))


@register(
    "j6k_dupcount_weighted_sample",
    oracle="""
    WITH k AS (
      SELECT min(doc_id) AS doc_id, COUNT(*) AS dup_count
      FROM documents
      GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
    )
    SELECT doc_id, dup_count FROM k
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000
          < least(1000, 300 * dup_count)
    """,
)
def j6k_dupcount_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-count-weighted keeper sampling (§2.J6 extension — the
    post-dedup re-weighting pass): exact-dedup keepers are sampled with
    probability min(1, 0.3·dup_count), so heavily-duplicated content
    keeps its pre-dedup prevalence in the training mix instead of being
    flattened to one vote.  The weight IS the dedup by-product
    (dup_count from j1's aggregate); the filter is the engine-portable
    md5 hash in [0,1000) every sampler here uses — deterministic,
    rerun-stable, no extra shuffle beyond the dedup aggregate itself.
    See operators/sampling.py:dupcount_weighted_sample."""
    from ..operators.dedup import dedup_exact
    from ..operators.sampling import dupcount_weighted_sample

    keepers = dedup_exact(load_table(spark, sf_dir, "documents"))
    return dupcount_weighted_sample(keepers)


@register(
    "j7c_dataset_card",
    oracle=r"""
    WITH per AS (
      SELECT lang, source, n_chars,
             len(string_split_regex(trim(text), '\s+')) AS n_toks,
             regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
      FROM documents
    ), tot AS (SELECT COUNT(*) AS total_docs FROM per)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           COUNT(DISTINCT source) AS n_sources,
           COUNT(DISTINCT norm) AS n_unique_texts,
           CAST(ROUND(1000000 * CAST(COUNT(*) AS DOUBLE)
                      / (SELECT total_docs FROM tot), 0) AS BIGINT)
             AS doc_share_ppm
    FROM per GROUP BY lang
    """,
)
def j7c_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics (J7 extension — the per-language summary
    a training-data release ships: volume, token mass, source breadth,
    dedup headroom, mix share).  One scan computes every per-row
    feature (token count, normalized-text digest); one aggregate per
    lang; the corpus total for the mix share is a 1-row broadcast, not
    a second scan of the data (the per-lang counts re-aggregate to it).
    Distinct-source/text counts are map-side partial-distinct at scale."""
    from ..functions import token_count
    from ..operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        "source",
        "n_chars",
        token_count("text").alias("n_toks"),
        F.sha2(normalize_text("text"), 256).alias("norm"),
    )
    by_lang = per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("norm").alias("n_unique_texts"),
    )
    total = by_lang.agg(F.sum("n_docs").cast("double").alias("total_docs"))
    return by_lang.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_sources",
        "n_unique_texts",
        F.round(F.lit(1_000_000) * F.col("n_docs") / F.col("total_docs"), 0)
        .cast("long")
        .alias("doc_share_ppm"),
    )


@register(
    "j6l_negative_sampling",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS corpus_n FROM documents),
    a AS (SELECT doc_id FROM documents WHERE doc_id % 53 = 0),
    cand AS (
      SELECT a.doc_id, i.neg_ix, n.corpus_n
      FROM a, n, (SELECT unnest(generate_series(0, 3)) AS neg_ix) i
    ), h AS (
      SELECT doc_id, neg_ix,
             CAST('0x' || substr(md5('neg:' || CAST(doc_id AS VARCHAR)
                                     || ':' || CAST(neg_ix AS VARCHAR)),
                                 1, 15) AS BIGINT) % corpus_n AS neg_id
      FROM cand
    )
    SELECT h.doc_id, h.neg_ix, h.neg_id,
           d.source AS neg_source, d.lang AS neg_lang
    FROM h JOIN documents d ON d.doc_id = h.neg_id
    WHERE h.neg_id <> h.doc_id
    """,
)
def j6l_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive-pair training
    (J6 extension): each anchor document draws 4 pseudo-random negatives
    from the corpus WITHOUT a cross join — the negative's position is
    pure hash arithmetic (the engine-portable md5 construction) modulo
    the corpus size, then a single equi-join fetches the negative's
    metadata.  Self-collisions are dropped deterministically on both
    engines.  The corpus size rides in as a broadcast 1-row aggregate
    (scalar-subquery shape), and the anchors×negatives side is the
    small, broadcast side of the fetch join — the corpus is scanned,
    never shuffled.  At scale the id-domain join generalizes to the
    md5-permutation position index the shuffle/shard family already
    maintains (operators/sampling.py:shuffle_corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count(F.lit(1)).alias("corpus_n"))
    anchors = docs.filter(F.col("doc_id") % 53 == 0).select("doc_id")
    cand = anchors.crossJoin(F.broadcast(n)).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("neg_ix"),
        "corpus_n",
    )
    hashed = cand.select(
        "doc_id",
        F.col("neg_ix").cast("long").alias("neg_ix"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("neg:"),
                            F.col("doc_id").cast("string"),
                            F.lit(":"),
                            F.col("neg_ix").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % F.col("corpus_n")
        ).alias("neg_id"),
    ).filter(F.col("neg_id") != F.col("doc_id"))
    negs = docs.select(
        F.col("doc_id").alias("neg_id"),
        F.col("source").alias("neg_source"),
        F.col("lang").alias("neg_lang"),
    )
    return F.broadcast(hashed).join(negs, "neg_id").select(
        "doc_id", "neg_ix", "neg_id", "neg_source", "neg_lang"
    )


@register(
    "b19_orc_source_roundtrip",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM documents
    WHERE lang = 'en' AND n_chars >= 64
    """,
)
def b19_orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC corpus source end-to-end (§2.A extension, completing the
    interchange-format matrix: parquet b15, JSONL b12, CSV b13, raw
    binary b17, ORC here): export the documents table as ORC, read it
    back through sources/corpus.py with the explicit schema and a
    filter the vectorized ORC reader pushes to stripe statistics
    (``PushedFilters`` on lang/n_chars — asserted in
    tests/test_corpus_source.py), and return the selected rows.  The
    oracle is the original parquet relation under the same predicate —
    parity proves the ORC writer/reader round-trips every value
    (including full UTF-8 text bodies) exactly.  Per-process work dir
    (reset + reaped by _work_dir)."""
    from pyspark.sql import types as T

    from ..sources.corpus import read_orc, write_orc
    from .cdc_queries import _work_dir

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = f"{_work_dir('b19_orc', sf_dir)}/docs"
    write_orc(docs, path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    return read_orc(spark, path, schema).filter(
        (F.col("lang") == "en") & (F.col("n_chars") >= 64)
    )


@register(
    "j7d_release_diff",
    oracle="""
    WITH old AS (
      SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 7 <> 0
    ), new AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev]' ELSE text END)
               AS digest
      FROM documents WHERE doc_id % 5 <> 0
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.digest <> n.digest THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    """,
)
def j7d_release_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus release diffing (§2.J7 — the audit artifact between two
    dataset versions: what was added, removed, or edited): digest-level
    FULL OUTER JOIN between the previous release (fixture minus every
    7th doc) and the next one (fixture minus every 5th doc, every 11th
    text revised).  Diffing md5 digests instead of bodies keeps the
    shuffle rows 16 bytes wide regardless of document size — the only
    full-outer shape that works at 100 TB; body bytes never move.  The
    derived releases are deterministic functions of the fixture, so
    the oracle reconstructs them exactly."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.md5("text").alias("digest")
    )
    new = docs.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" [rev]"))
            ).otherwise(F.col("text"))
        ).alias("digest"),
    )
    o = old.select(F.col("doc_id").alias("o_id"), F.col("digest").alias("o_digest"))
    n = new.select(F.col("doc_id").alias("n_id"), F.col("digest").alias("n_digest"))
    joined = o.join(n, o["o_id"] == n["n_id"], "full_outer")
    return joined.select(
        F.coalesce(F.col("o_id"), F.col("n_id")).alias("doc_id"),
        F.when(F.col("o_id").isNull(), F.lit("added"))
        .when(F.col("n_id").isNull(), F.lit("removed"))
        .when(F.col("o_digest") != F.col("n_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


@register(
    "j6m_temperature_mixture",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
             md5('temp:' || CAST(doc_id AS VARCHAR)) AS hex
      FROM documents
    ), c AS (
      SELECT lang, CAST(floor(sqrt(SUM(n_tok))) AS BIGINT) AS w
      FROM d GROUP BY lang
    ), b AS (
      SELECT lang,
             CAST((50000 * w) // (SELECT SUM(w) FROM c) AS BIGINT)
               AS lang_budget
      FROM c
    ), o AS (
      SELECT doc_id, lang, n_tok,
             CAST(SUM(n_tok) OVER (PARTITION BY lang ORDER BY hex, doc_id)
                  - n_tok AS BIGINT) AS cum_tok
      FROM d
    )
    SELECT o.doc_id, o.lang, o.n_tok, o.cum_tok, b.lang_budget
    FROM o JOIN b USING (lang)
    WHERE o.cum_tok < b.lang_budget
    """,
)
def j6m_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced multilingual mixture (§2.J6 extension —
    the UNIMAX / temperature-sampling step every multilingual LLM run
    applies so head languages don't drown the tail): per-language
    token budgets ∝ c_l^(1/T) with T = 2, i.e. √(token count), then
    the deterministic md5-ordered budget fill of
    ``token_budget_mixture``.  Exactness: the only non-integer op is
    one correctly-rounded IEEE sqrt whose FLOOR both engines agree on
    (counts ≪ 2⁵²), and the budget split is integer division — so the
    selected set is bit-stable.  Shape: a 5-row budget table
    (aggregate → broadcast) and one md5-ordered window per language —
    same single shuffle as the plain mixture; the sqrt compresses the
    head (~10× between the largest and smallest language here),
    which is visible as near-equal lang_budget values."""
    from ..functions import token_count
    from ..operators.sampling import token_budget_mixture

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", token_count("text").cast("long").alias("n_tok"))
        .groupBy("lang")
        .agg(F.sum("n_tok").alias("c"))
        .select("lang", F.floor(F.sqrt("c")).cast("long").alias("w"))
    )
    total = counts.agg(F.sum("w").alias("sw"))
    budgets = counts.crossJoin(F.broadcast(total)).selectExpr(
        "lang", "div(50000 * w, sw) AS lang_budget"
    )
    mixed = token_budget_mixture(
        docs.join(F.broadcast(budgets), "lang"),
        F.col("lang_budget"),
        stratum_col="lang",
        salt="temp",
    )
    return mixed.select("doc_id", "lang", "n_tok", "cum_tok", "lang_budget")


from .events_queries import OHLC_ORACLE


@register("h13_stream_ohlc", oracle=OHLC_ORACLE)
def h13_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC bars (§2.H × e16): the events fixture through an
    append-mode watermarked window aggregate — each bar is published
    exactly once, when the watermark passes its window end.  A
    far-future sentinel event per type (4 h past max ts, planted in
    the SOURCE) advances the final watermark to max+2 h — STRICTLY
    past every real window end (≤ trunc(max)+1 h), so every real bar
    flushes even when max ts falls exactly on an hour boundary; the sentinel's own bar stays open in state and never
    reaches the sink, so the output needs no filtering.  The oracle
    is the BATCH OHLC relation over the raw fixture — parity proves
    the streaming incrementalization (min_by/max_by state merge
    across micro-batches, late-data folding by ordering key) is
    value-invisible.  See streaming/windows.py:ohlc_window_agg."""
    from ..streaming.windows import run_ohlc_stream
    from .cdc_queries import _work_dir

    work = _work_dir("stream_ohlc", sf_dir)
    key = ("ohlc", sf_dir)
    if key not in _STREAM_SRC:
        src = f"{_work_dir('stream_ohlc_src', sf_dir)}/src"
        events = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "event_type", "value"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        hi = events.agg(F.max("ts").alias("hi")).collect()[0]["hi"]
        sentinels = (
            events.select("event_type")
            .distinct()
            .select(
                F.lit(-1).cast("long").alias("event_id"),
                (F.lit(hi) + F.expr("INTERVAL 4 HOURS")).alias("ts"),
                "event_type",
                F.lit(0.0).alias("value"),
            )
        )
        events.unionByName(sentinels).repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        _STREAM_SRC[key] = src
    return run_ohlc_stream(
        spark, _STREAM_SRC[key], f"{work}/sink", f"{work}/ckpt"
    )


from .events_queries import SESSION_WINDOW_ORACLE  # noqa: E402


@register("h14_stream_sessions", oracle=SESSION_WINDOW_ORACLE)
def h14_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SESSION windows (§2.H × e2h): the events fixture
    through a watermarked append-mode ``session_window`` aggregate —
    the state-MERGING streaming operator (tumbling-window state only
    accumulates; session state grows, merges neighboring sessions as
    out-of-order events arrive within the watermark, and emits each
    session exactly once when the watermark passes its end).  A
    far-future sentinel event under user_id = -1 (4 h past max ts,
    planted in the SOURCE) advances the final watermark to max+2 h —
    strictly past every real session end (≤ max+30 min) — so every
    real session flushes; the sentinel's own session stays open in
    state and never reaches the sink, so the output needs no
    filtering.  The oracle is the BATCH gaps-and-islands session
    relation over the raw fixture (shared with e2h) — parity proves
    the streaming incrementalization (session-merge state folding,
    late-data placement by event time) is value-invisible.  See
    streaming/windows.py:session_window_agg."""
    from ..streaming.windows import run_session_stream
    from .cdc_queries import _work_dir

    work = _work_dir("stream_sessions", sf_dir)
    key = ("sessions", sf_dir)
    if key not in _STREAM_SRC:
        src = f"{_work_dir('stream_sessions_src', sf_dir)}/src"
        events = load_table(spark, sf_dir, "events").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        )
        hi = events.agg(F.max("ts").alias("hi")).collect()[0]["hi"]
        sentinel = spark.createDataFrame(
            [(-1,)], "user_id long"
        ).select("user_id", (F.lit(hi) + F.expr("INTERVAL 4 HOURS")).alias("ts"))
        events.unionByName(sentinel).repartition(4).write.mode(
            "overwrite"
        ).parquet(src)
        _STREAM_SRC[key] = src
    return run_session_stream(
        spark, _STREAM_SRC[key], f"{work}/sink", f"{work}/ckpt"
    )


@register(
    "b20_partitioned_source_pruning",
    oracle="""
    SELECT doc_id, text, source, n_chars, lang
    FROM documents
    WHERE lang IN ('en', 'de')
    """,
)
def b20_partitioned_source_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned source with PARTITION PRUNING (§2.A/F —
    the layout every 100 TB corpus actually sits in): the documents
    table written `partitionBy(lang)`, read back with a partition
    predicate.  The pruning is asserted where it matters — the scan
    must classify the lang predicate as a `PartitionFilters` entry
    (FileSourceStrategy prunes directories exactly when it does;
    `inputFiles()` resolves BEFORE pruning and cannot observe it —
    tests/test_corpus_source.py pins this, plus the two silent
    disablers: a non-partition predicate alone prunes nothing, and the
    partition column must be read back as its ORIGINAL type).  The
    oracle is the unpartitioned relation under the same predicate —
    parity also proves the partition column survives the
    directory-encoding roundtrip (values, not just rows).  Work dirs
    are per-process (`_work_dir` appends the pid and reaps dead
    siblings): bench and driver-sim run concurrently on the same
    sf_dir, and a shared overwrite path would let one session clobber
    the other's partitioned data mid-read."""
    from .cdc_queries import _work_dir

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", "n_chars", "lang"
    )
    path = f"{_work_dir('b20_part', sf_dir)}/docs"
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    back = spark.read.parquet(path).filter(F.col("lang").isin("en", "de"))
    # partitionBy turns lang into a directory key read back as string;
    # reorder + cast pins the original schema contract
    return back.select(
        "doc_id", "text", "source", "n_chars", F.col("lang").cast("string").alias("lang")
    )


from .similarity_queries import NEARDUP_WAVES_ORACLE  # noqa: E402

# Wave-source fixture memo: the 3 arrival-wave files are a pure
# function of (sf_dir), so they are written once per process (the
# CDC-envelope/IVF fixture pattern); the LOG and CHECKPOINT dirs stay
# under the reset-on-entry work dir so every run re-executes the whole
# incremental dedup.
_NEARDUP_SRC: dict[str, str] = {}

# Same pattern for the h13/h14 sentinel event sources: pure functions
# of (sf_dir), written once per process; the sink/checkpoint dirs stay
# under the reset-on-entry work dir so every run re-executes the
# streaming aggregation itself.
_STREAM_SRC: dict[tuple[str, str], str] = {}
_EMB_SRC: dict[str, str] = {}


def _batch_width(sf_dir: str) -> int:
    """Micro-batch shuffle width for the stream-query fixtures, scaled
    to the wave size: 4 at sf<=0.01 (~170-row batches — measured 6.8 →
    6.1 s for the h15 drain, where task-scheduling overhead dominates),
    the operator default 8 above that (the round-11 bench at sf0.1
    measured width 4 as a ~1.3x REGRESSION on h15/h20: ~1.7k-row
    batches want the width).  Production sizes this to batch rows /
    target rows-per-task — this helper is the fixture-scale stand-in."""
    import os

    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.removeprefix("sf"))
    except ValueError:
        return 8
    return 4 if sf <= 0.01 else 8


def _ensure_doc_waves(docs, sf_dir: str) -> None:
    """Write the shared 3-wave documents source (wave = doc_id % 3,
    one file per wave, strictly increasing pinned mtimes so the
    FileStreamSource's modification-time ordering — and hence every
    first-arrived-survives result — is deterministic, ADVICE r9) in
    ONE Spark job via ``write_arrival_waves``, memoized per process."""
    if sf_dir in _NEARDUP_SRC:
        return
    from ..streaming.ingest import write_arrival_waves
    from .cdc_queries import _work_dir

    src = f"{_work_dir('neardup_src', sf_dir)}/waves"
    write_arrival_waves(docs, src, F.col("doc_id") % 3, 3)
    _NEARDUP_SRC[sf_dir] = src


def _ensure_emb_waves(emb, sf_dir: str) -> None:
    """The embeddings twin of ``_ensure_doc_waves`` (wave = vec_id % 3)."""
    if sf_dir in _EMB_SRC:
        return
    from ..streaming.ingest import write_arrival_waves
    from .cdc_queries import _work_dir

    src = f"{_work_dir('emb_src', sf_dir)}/waves"
    write_arrival_waves(emb, src, F.col("vec_id") % 3, 3)
    _EMB_SRC[sf_dir] = src


@register("h15_stream_neardup_ingest", oracle=NEARDUP_WAVES_ORACLE)
def h15_stream_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental STREAMING near-dup corpus dedup (§2.H × J2 —
    VERDICT r8 #6, the composition a production 100 TB pipeline runs):
    the documents fixture arrives as 3 waves (doc_id % 3), one parquet
    file per wave, drained by ONE ``availableNow`` run rate-limited to
    ``maxFilesPerTrigger=1`` — three micro-batches in arrival order
    (the FileStreamSource's modification-time ordering; waves are
    written sequentially).  Each micro-batch is deduped against the
    AT-REST LSH signature index (bucket-pruned probe + exact-Jaccard
    verification) and against its own smaller-id peers, and survivors
    append themselves + their signatures to the index ledgers
    idempotently.  The oracle is the wave-unrolled exact-Jaccard
    relation (shared with the j2m batch twin) — streaming == batch
    twin == SQL, under the same first-arrived-survives semantics.
    Restart/redelivery (periodic-drain runs over a shared checkpoint)
    and stream==batch parity are pinned in
    tests/test_streaming_ingest.py.  See
    streaming/ingest.py:run_neardup_ingest_stream."""
    from ..streaming.ingest import run_neardup_ingest_stream
    from .cdc_queries import _work_dir

    work = _work_dir("neardup_ingest", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    _ensure_doc_waves(docs, sf_dir)
    surv = run_neardup_ingest_stream(
        spark,
        _NEARDUP_SRC[sf_dir],
        f"{work}/log",
        f"{work}/ckpt",
        max_files_per_trigger=1,
        batch_shuffle_partitions=_batch_width(sf_dir),
    )
    return (
        docs.select("doc_id", (F.col("doc_id") % 3).cast("long").alias("wave"))
        .join(surv.select("doc_id", F.lit(True).alias("survived")), "doc_id", "left")
        .select(
            "doc_id",
            "wave",
            F.coalesce("survived", F.lit(False)).alias("survived"),
        )
    )


from .similarity_queries import INCSUBSTR_WAVES_ORACLE  # noqa: E402


@register("h16_stream_substring_dedup", oracle=INCSUBSTR_WAVES_ORACLE)
def h16_stream_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental STREAMING substring dedup (§2.H × J2 — VERDICT r9
    #6, the ExactSubstr complement of h15): the documents fixture
    arrives as the same 3 mtime-pinned waves (doc_id % 3), drained by
    one ``availableNow`` run at ``maxFilesPerTrigger=1``.  Each
    micro-batch's 8-token passages are checked against the AT-REST
    gram ledger (gbucket-pruned semi-join probe) and against
    earlier-in-batch occurrences (one first-occurrence window over
    8-byte digests); repeated passages are CUT from the arriving copy,
    the cleaned row and the doc's ORIGINAL gram digests append
    idempotently, and redelivered documents are skipped whole via the
    dbucket-pruned doc_id probe.  Keep-first in (arrival, doc_id,
    position) order — streaming == batch twin (j2o) == SQL oracle on
    the cleaned TEXT itself.  Restart/redelivery parity pinned in
    tests/test_streaming_ingest.py.  See
    streaming/ingest.py:run_substring_dedup_stream."""
    from ..streaming.ingest import run_substring_dedup_stream
    from .cdc_queries import _work_dir

    work = _work_dir("substr_ingest", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    _ensure_doc_waves(docs, sf_dir)
    cleaned = run_substring_dedup_stream(
        spark,
        _NEARDUP_SRC[sf_dir],
        f"{work}/log",
        f"{work}/ckpt",
        k=8,
        max_files_per_trigger=1,
        batch_shuffle_partitions=_batch_width(sf_dir),
    )
    return (
        docs.select("doc_id", (F.col("doc_id") % 3).cast("long").alias("wave"))
        .join(cleaned, "doc_id")
        .select("doc_id", "wave", "n_tokens", "n_removed", "cleaned_text")
    )


@register(
    "h17_stream_decontaminate",
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
    ), flags AS (
      SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n
      FROM grams g JOIN bench USING (gram)
      GROUP BY g.doc_id
    )
    SELECT d.doc_id, f.doc_id IS NOT NULL AS quarantined,
           CAST(COALESCE(f.n, 0) AS BIGINT) AS n_contaminated_grams
    FROM documents d LEFT JOIN flags f USING (doc_id)
    """,
)
def h17_stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming decontamination gate (§2.H × J8): the documents
    fixture arrives as the 3 mtime-pinned waves; each micro-batch is
    checked against the eval suite's 5-gram set (every 101st doc
    standing in for a benchmark) BEFORE entering the corpus —
    contaminated rows land in the quarantine ledger with their
    offending-gram counts, clean rows pass through.  The gate is
    stateless per document (broadcast benchmark, j8's exchange-free
    corpus plan per batch), so the stream reproduces the batch j8
    relation row-for-row and the oracle is exactly j8's SQL extended
    with the pass/quarantine flag over ALL documents.  See
    streaming/ingest.py:run_decontaminate_stream."""
    from ..streaming.ingest import run_decontaminate_stream
    from .cdc_queries import _work_dir

    work = _work_dir("decon_ingest", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    _ensure_doc_waves(docs, sf_dir)
    bench = docs.filter(F.col("doc_id") % 101 == 0).select("text")
    return run_decontaminate_stream(
        spark,
        _NEARDUP_SRC[sf_dir],
        bench,
        f"{work}/log",
        f"{work}/ckpt",
        max_files_per_trigger=1,
    )


# The composed curation-pipeline relation (h23): h17's 5-gram
# contamination flag + h8's quality predicate, then the
# NEARDUP_WAVES fold (exact-Jaccard >= 0.5 pairs UNION digest-equal
# pairs) restricted to the gate-PASSING docs — stage N's ledger only
# ever sees rows that passed stages 1..N-1, which is exactly what
# this re-derives.  Multi-referenced CTEs are MATERIALIZED (DuckDB
# re-evaluates them per reference otherwise).
CURATION_PIPELINE_ORACLE = r"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ), bench_toks AS MATERIALIZED (
      SELECT t FROM toks WHERE doc_id % 101 = 0
    ), sizes AS (
      SELECT 5 AS m
      UNION
      SELECT len(t) AS m FROM bench_toks WHERE len(t) > 0 AND len(t) < 5
    ), grams AS (
      SELECT doc_id, array_to_string(list_slice(t, i, i + m - 1), ' ') AS gram
      FROM (SELECT doc_id, t, m, unnest(generate_series(1, len(t) - m + 1)) AS i
            FROM toks, sizes WHERE len(t) >= m)
    ), bgrams AS (
      SELECT DISTINCT array_to_string(list_slice(t, i, i + 4), ' ') AS gram
      FROM (SELECT t, unnest(generate_series(1, len(t) - 4)) AS i FROM bench_toks)
      UNION
      SELECT DISTINCT array_to_string(t, ' ') AS gram
      FROM bench_toks WHERE len(t) > 0 AND len(t) < 5
    ), quar AS MATERIALIZED (
      SELECT DISTINCT g.doc_id FROM grams g JOIN bgrams USING (gram)
    ), wc AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
      GROUP BY 1, 2
    ), ws AS (
      SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS n
      FROM wc GROUP BY 1
    ), qual AS MATERIALIZED (
      SELECT d.doc_id FROM documents d JOIN ws ON d.doc_id = ws.doc_id
      WHERE ws.n >= 20
        AND least(len(string_split_regex(trim(d.text), '\s+')) / 100.0, 1.0) * 0.5
            + length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))
              / length(d.text) * 0.5 >= 0.55
        AND ws.mx / ws.n <= 0.12
    ), q AS MATERIALIZED (
      SELECT d.doc_id, d.doc_id % 3 AS wave,
             lower(trim(regexp_replace(d.text, '\s+', ' ', 'g'))) AS t,
             md5(regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g')) AS dig
      FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM quar)
        AND d.doc_id IN (SELECT doc_id FROM qual)
    ), sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 5) AS s
      FROM (SELECT doc_id, t,
                   unnest(range(1, greatest(length(t)-4,1)+1)) AS i
            FROM q)
    ), sz AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    co AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ), jp AS MATERIALIZED (
      SELECT id_a, id_b FROM co
      JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (na.n + nb.n - inter) >= 0.5
      UNION
      SELECT a.doc_id, b.doc_id FROM q a
      JOIN q b ON a.dig = b.dig AND a.doc_id <> b.doc_id
    ), d AS MATERIALIZED (SELECT doc_id, wave FROM q),
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
    SELECT b.doc_id, CAST(b.doc_id % 3 AS BIGINT) AS wave,
           b.doc_id IN (SELECT doc_id FROM quar) AS quarantined,
           b.doc_id IN (SELECT doc_id FROM qual) AS passed_quality,
           b.doc_id IN (SELECT doc_id FROM s0
             UNION ALL SELECT doc_id FROM s1
             UNION ALL SELECT doc_id FROM s2) AS survived
    FROM documents b
"""


@register("h23_stream_curation_pipeline", oracle=CURATION_PIPELINE_ORACLE)
def h23_stream_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed streaming INGEST PIPELINE (§2.H integration row —
    VERDICT r11 #7): ONE stream drains the 3 mtime-pinned document
    waves through the production gate order — decontaminate (h17's
    5-gram benchmark check) → quality gates (h8's curation set) →
    exact dedup (normalized-digest keep-first, j1 under arrival
    order) → near-dup probe (h15's at-rest MinHash/LSH index) — into
    a single curated ledger, proving the gates compose without state
    interference: each stage's ledger only ever sees rows that passed
    the stages before it.  Oracle = the composed batch SQL (the h17
    gram relation + h8's quality predicate + the NEARDUP_WAVES fold
    restricted to gate-passing docs, digest pairs unioned in);
    stream == batch == SQL row-for-row, redelivery/replay pinned in
    tests/test_streaming_ingest.py.  See
    streaming/ingest.py:run_curation_pipeline_stream."""
    from ..streaming.ingest import run_curation_pipeline_stream
    from .cdc_queries import _work_dir

    work = _work_dir("curation_pipeline", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    _ensure_doc_waves(docs, sf_dir)
    bench = docs.filter(F.col("doc_id") % 101 == 0).select("text")
    out = run_curation_pipeline_stream(
        spark,
        _NEARDUP_SRC[sf_dir],
        bench,
        f"{work}/log",
        f"{work}/ckpt",
        max_files_per_trigger=1,
        batch_shuffle_partitions=_batch_width(sf_dir),
    )
    return (
        docs.select("doc_id", (F.col("doc_id") % 3).cast("long").alias("wave"))
        .join(out, "doc_id")
        .select("doc_id", "wave", "quarantined", "passed_quality", "survived")
    )


@register("j7e_curation_pipeline_twin", oracle=CURATION_PIPELINE_ORACLE)
def j7e_curation_pipeline_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline, BATCH twin (§2.J7 × J1/J8/J4/J2 —
    the j2m↔h15 twin-pair discipline applied to h23): gate flags
    corpus-wide, then ONE verified-Jaccard ∪ digest-equality pair
    table over the gate-passing docs feeds the shared arrival-wave
    fold.  Same oracle as h23; independent mechanism (global pair
    algebra vs per-batch ledger probes), so stream == twin == SQL is
    a three-way agreement.  See
    operators/dedup.py:incremental_curation_pipeline."""
    from ..operators.dedup import incremental_curation_pipeline

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    bench = docs.filter(F.col("doc_id") % 101 == 0).select("text")
    return incremental_curation_pipeline(docs, bench)


# h18's wave-source memo: pure function of sf_dir (embeddings in 3
# mtime-pinned waves), written once per process like _NEARDUP_SRC.
@register(
    "h18_stream_topk_maintenance",
    oracle="""
    SELECT query_id, neighbor_id, rnk FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                               CAST(q.embedding AS DOUBLE[])) DESC,
                        e.vec_id) AS BIGINT) AS rnk
      FROM embeddings e
      CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 10) q
      WHERE e.vec_id <> q.vec_id
    ) WHERE rnk <= 5
    """,
)
def h18_stream_topk_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous exact kNN maintenance (§2.H × J3): the embeddings
    fixture arrives as 3 mtime-pinned waves (vec_id % 3); each
    micro-batch is scored against the standing query set (vec_id <
    10) and only per-batch per-query top-5 rows enter the candidates
    ledger; the read-back folds the ledger to the global top-5 — by
    the containment invariant (a global winner is a winner in its own
    batch) this equals the j3 brute-force baseline over the whole
    corpus, so the oracle is exactly j3's exact-rank SQL.  Replay and
    redelivery collapse content-addressed in the read-back.  See
    streaming/ingest.py:run_topk_maintenance_stream."""
    from ..streaming.ingest import run_topk_maintenance_stream
    from .cdc_queries import _work_dir

    work = _work_dir("topk_ingest", sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    _ensure_emb_waves(emb, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return run_topk_maintenance_stream(
        spark,
        _EMB_SRC[sf_dir],
        queries,
        f"{work}/log",
        f"{work}/ckpt",
        k=5,
        max_files_per_trigger=1,
    ).select("query_id", "neighbor_id", "rnk")


@register("h19_stream_media_dedup", oracle=None)
def h19_stream_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental STREAMING multimodal near-dup ingest (§2.H × J5 —
    the image analog of h15): the documents fixture arrives as the 3
    mtime-pinned waves; each micro-batch is perceptual-dHashed
    (Arrow-batched mapInPandas, byte-grid stub for the decode), probed
    bucket-pruned against the AT-REST dHash band index with the
    Hamming verify INSIDE the probe join (the 8-byte fingerprint rides
    on every index row — no second ledger fetch), shadowed by
    smaller-id batch peers, and survivors append idempotently.
    First-arrived survives; redelivery re-verifies at Hamming 0 and
    drops.  Rows-only by nature (j5f contract); stream == batch twin
    (j5i) parity and redelivery absorption are pinned in
    tests/test_streaming_ingest.py.  See
    streaming/ingest.py:run_media_dedup_stream."""
    from ..streaming.ingest import run_media_dedup_stream
    from .cdc_queries import _work_dir

    work = _work_dir("media_ingest", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    _ensure_doc_waves(docs, sf_dir)
    surv = run_media_dedup_stream(
        spark,
        _NEARDUP_SRC[sf_dir],
        f"{work}/log",
        f"{work}/ckpt",
        max_files_per_trigger=1,
        batch_shuffle_partitions=_batch_width(sf_dir),
    )
    return (
        docs.select("doc_id", (F.col("doc_id") % 3).cast("long").alias("wave"))
        .join(surv.select("doc_id", F.lit(True).alias("survived")), "doc_id", "left")
        .select(
            "doc_id",
            "wave",
            F.coalesce("survived", F.lit(False)).alias("survived"),
        )
    )


@register("h20_stream_ivf_maintenance", oracle=None)
def h20_stream_ivf_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index MAINTENANCE (§2.J3 × H — VERDICT r10 #4,
    the streaming complement of the at-rest j3e/j3h layout: h18
    maintains query RESULTS, this maintains the INDEX): the embeddings
    fixture arrives as the 3 mtime-pinned waves; each micro-batch is
    assigned to the FROZEN j3-family centroid fixture
    (``centroid_ranks_expr`` — the ingest-computable literal form) and
    appended into the ``write_ivf_index`` cluster-partitioned layout,
    touching only the lists the batch ranks into.  (tag, batch)-keyed
    rows make replay/redelivery collapse in the read-back and in the
    query path's post-join distinct.  Returns the per-cluster growth
    table with the ``growth_skew_permille`` drift observable — the
    number that schedules a re-train.  Rows-only by nature (k-means
    float centroids, the documented IVF-family contract); index
    QUALITY stays oracle-checked through the j3q-composition test
    (maintained-index recall ≥ 0.8 vs the exact ground truth) and
    stream == batch-layout parity in tests/test_streaming_ingest.py.
    See streaming/ingest.py:run_ivf_maintenance_stream."""
    from ..operators.index_commit import init_index_root, is_index_root
    from ..streaming.ingest import run_ivf_maintenance_stream
    from .cdc_queries import _work_dir
    from .similarity_queries import _fixture_centroids

    work = _work_dir("ivf_maint", sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    _ensure_emb_waves(emb, sf_dir)
    centroids = _fixture_centroids(emb, sf_dir, "ivf", 16)
    # Maintain into a VERSIONED index root (operators/index_commit.py)
    # so the commit protocol's resolve path runs under the official
    # driver gate, not just in tests; init once per process (the
    # work dir is reset on first entry, reused after).
    root = f"{work}/index_root"
    if not is_index_root(spark, root):
        init_index_root(spark, root)
    return run_ivf_maintenance_stream(
        spark,
        _EMB_SRC[sf_dir],
        centroids,
        root,
        f"{work}/ckpt",
        max_files_per_trigger=1,
        batch_shuffle_partitions=_batch_width(sf_dir),
    )


_SEMDECON_SRC: dict[str, str] = {}

# The j8d relation (integer micro-unit quantization, cross-multiplied
# cosine gate, planted scaled copies of a benchmark slice) extended
# with the pass/quarantine flag over ALL corpus rows — the h17 oracle
# pattern applied to the embedding-space gate.  Multiply-referenced
# CTEs are MATERIALIZED (the round-11 NEARDUP_WAVES_ORACLE lesson:
# DuckDB inlines CTEs per reference).
SEMDECON_ORACLE = """
    WITH bench AS MATERIALIZED (
      SELECT vec_id AS bid, embedding FROM embeddings WHERE vec_id % 40 = 0
    ), corpus AS MATERIALIZED (
      SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id % 40 <> 0
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
      FROM embeddings WHERE vec_id % 120 = 0
    ), qc AS MATERIALIZED (
      SELECT cid, CAST(generate_subscripts(embedding, 1) AS INT) AS j,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS qv
      FROM corpus
    ), qb AS MATERIALIZED (
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
    ), agg AS (
      SELECT cid, COUNT(*) AS n, MIN(bid) AS fb FROM hits GROUP BY cid
    )
    SELECT c.cid AS vec_id,
           (a.cid IS NOT NULL) AS quarantined,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_bench_hits,
           CAST(a.fb AS BIGINT) AS first_bench_id
    FROM corpus c LEFT JOIN agg a ON a.cid = c.cid
    """


@register("h21_stream_semantic_decontaminate", oracle=SEMDECON_ORACLE)
def h21_stream_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SEMANTIC decontamination gate (§2.J8 × H — VERDICT
    r10 #5: the h17 gate-at-ingest pattern applied to the j8d
    embedding-space relation): the planted j8d corpus (benchmark =
    every 40th embedding, corpus = the rest + scale-2 copies of every
    120th — cosine exactly 1 with their benchmark twin) arrives as 3
    mtime-pinned waves (cid % 3); every micro-batch is gated against
    the broadcast benchmark with the integer cross-multiplied cosine
    test (micro-unit quantization — bit-equal in both engines, no
    float comparison), quarantined rows carrying their
    (n_bench_hits, first_bench_id) audit trail.  Stateless per vector,
    so stream == batch j8d == SQL oracle row-for-row, and
    replay/redelivery collapse in the read-back.  See
    streaming/ingest.py:run_semantic_decontaminate_stream."""
    from ..streaming.ingest import run_semantic_decontaminate_stream, write_arrival_waves
    from .cdc_queries import _work_dir

    work = _work_dir("semdecon_ingest", sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _SEMDECON_SRC:
        corpus = (
            emb.filter(F.col("vec_id") % 40 != 0)
            .select("vec_id", "embedding", "label")
            .unionByName(
                emb.filter(F.col("vec_id") % 120 == 0).select(
                    (F.col("vec_id") + 1_000_000).alias("vec_id"),
                    F.transform(
                        "embedding", lambda x: x * F.lit(2.0).cast("float")
                    ).alias("embedding"),
                    "label",
                )
            )
        )
        src = f"{_work_dir('semdecon_src', sf_dir)}/waves"
        write_arrival_waves(corpus, src, F.col("vec_id") % 3, 3)
        _SEMDECON_SRC[sf_dir] = src
    bench = emb.filter(F.col("vec_id") % 40 == 0).select("vec_id", "embedding")
    return run_semantic_decontaminate_stream(
        spark,
        _SEMDECON_SRC[sf_dir],
        bench,
        f"{work}/log",
        f"{work}/ckpt",
        max_files_per_trigger=1,
    )


@register("h22_stream_ivfpq_maintenance", oracle=None)
def h22_stream_ivfpq_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF-PQ index maintenance (§2.J3 × H — h20's
    contract applied to the layout the 100 TB query path actually
    reads, the ``write_ivfpq_index``/j3o cluster-partitioned parquet
    carrying m-byte PQ code arrays): the embeddings fixture arrives as
    the 3 mtime-pinned waves; each micro-batch is cluster-assigned
    against the FROZEN j3-family centroids AND PQ-coded against the
    FROZEN session codebook, appending only into the touched cluster
    directories.  (tag, batch)-keyed idempotence; per-cluster growth +
    ``growth_skew_permille`` drift observable.  Rows-only by the
    IVF-family contract; layout parity with the batch
    ``write_ivfpq_index`` build, redelivery absorption, and
    maintained-index ADC recall ≥ 0.8 vs exact truth are pinned in
    tests/test_streaming_ingest.py.  See
    streaming/ingest.py:run_ivfpq_maintenance_stream."""
    from ..operators.index_commit import init_index_root, is_index_root
    from ..streaming.ingest import run_ivfpq_maintenance_stream
    from .cdc_queries import _work_dir
    from .similarity_queries import _fixture_centroids, _fixture_codebook

    work = _work_dir("ivfpq_maint", sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    _ensure_emb_waves(emb, sf_dir)
    centroids = _fixture_centroids(emb, sf_dir, "ivf", 16)
    codebook = _fixture_codebook(spark, sf_dir)
    # Maintain into a VERSIONED index root, mirroring h20 (VERDICT r12
    # #3): the commit protocol's PQ path now runs under the official
    # driver gate too, not just in tests/test_index_commit.py.
    root = f"{work}/index_root"
    if not is_index_root(spark, root):
        init_index_root(spark, root)
    return run_ivfpq_maintenance_stream(
        spark,
        _EMB_SRC[sf_dir],
        centroids,
        codebook,
        root,
        f"{work}/ckpt",
        max_files_per_trigger=1,
        batch_shuffle_partitions=_batch_width(sf_dir),
    )
