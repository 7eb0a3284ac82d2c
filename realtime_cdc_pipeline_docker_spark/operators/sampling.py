"""Corpus-shaping operators for training-data pipelines: stratified
sampling and sequence packing.

Neither exists in the reference (its corpus is relational CDC rows);
both are core moves when the table is *documents* feeding an LLM run:
re-weight the source mix, then pack variable-length documents into
fixed context windows.

Scale design:

- ``stratified_sample`` is a PURE FILTER — the accept decision is a
  deterministic hash of the row key against a per-stratum rate, so it
  needs no shuffle, no per-stratum state, and no second pass.  At
  100 TB it runs at scan speed inside the parquet reader's codegen
  stage, and the same row set is accepted on every rerun (unlike
  ``df.sample``, whose seed interacts with partitioning).
- ``pack_sequences`` is ONE window (partition by stratum, order by the
  key) + one aggregate on the same key prefix — the minimal shuffle
  for an order-dependent packing.  The greedy bin rule assigns each
  document to the window its *exclusive* prefix-sum starts in, the
  standard streaming approximation of first-fit packing (a document
  straddling a boundary overflows its bin rather than splitting; bins
  stay within ``ctx + max_doc_tokens``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import token_count, ws_tokens


def portable_row_hash(col: Column | str, buckets: int = 100) -> Column:
    """Deterministic engine-portable bucket in [0, buckets): first 15
    hex chars of md5 parsed base-16 (same construction as
    ``operators.dedup.portable_token_hash``), mod buckets."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def stratified_sample(
    df: DataFrame,
    rate_pct: Column,
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff ``hash(key) % 100 < rate_pct`` — a per-stratum
    Bernoulli sample that is deterministic, rerun-stable, and
    shuffle-free.  ``rate_pct`` is a column (0-100), so the stratum
    rate can be any expression of the row (source, language, quality
    bucket...)."""
    return df.filter(portable_row_hash(key_col) < rate_pct)


def pack_sequences(
    df: DataFrame,
    ctx_tokens: int = 512,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    docs_per_shard: int | None = None,
) -> DataFrame:
    """Greedy sequence-packing plan: bin documents (in deterministic
    ``key_col`` order per stratum) into context windows of
    ``ctx_tokens``, returning one row per packed sequence with its
    document count, token total, and fill ratio.

    The bin index is ``exclusive_prefix_sum(tokens) div ctx`` — integer
    arithmetic end-to-end, so every engine agrees on bin boundaries.

    A single-column window partition means one Spark partition per
    stratum: with few/skewed strata that serializes the sort at scale.
    ``docs_per_shard`` bounds it — the window partitions by
    ``(stratum, key div docs_per_shard)``, so no partition exceeds
    ``docs_per_shard`` rows and a 100 TB stratum packs in parallel.
    The prefix sum resets per shard (at most one underfull trailing
    bin per shard — bounded waste for unbounded parallelism), and
    ``seq_id = shard * docs_per_shard + local_bin`` stays unique and
    deterministic because a bin holds at least one document."""
    tok = token_count(text_col).cast("long")
    base = df.select(stratum_col, key_col, tok.alias("n_tok"))
    if docs_per_shard is None:
        w = Window.partitionBy(stratum_col).orderBy(key_col)
        seq = F.expr(f"cum_excl div {ctx_tokens}")
    else:
        shard = F.expr(f"{key_col} div {docs_per_shard}")
        base = base.withColumn("__shard", shard)
        w = Window.partitionBy(stratum_col, "__shard").orderBy(key_col)
        seq = F.col("__shard") * docs_per_shard + F.expr(f"cum_excl div {ctx_tokens}")
    with_bin = (
        base.withColumn("cum_excl", F.sum("n_tok").over(w) - F.col("n_tok"))
        .withColumn("seq_id", seq)
    )
    return (
        with_bin.groupBy(stratum_col, "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("seq_tokens"),
        )
        .withColumn("fill_ratio", F.col("seq_tokens") / F.lit(float(ctx_tokens)))
    )


def shuffle_corpus(
    df: DataFrame,
    num_shards: int = 1024,
    key_col: str = "doc_id",
    salt: str = "shuf",
) -> DataFrame:
    """Deterministic global corpus shuffle: the example-order
    randomization every training run needs before sharding to data
    loaders.  Each row gets ``(shard, pos_in_shard)`` from an
    engine-portable md5 of ``salt:key`` — same permutation on every
    rerun, any cluster layout, any engine (unlike ``orderBy(rand())``,
    which is neither rerun- nor engine-stable).

    Scale shape: ONE shuffle (the window's hash partitioning on
    ``shard``), and each window partition holds ~|corpus|/num_shards
    rows — size num_shards so a shard fits an executor (100 TB / 1024
    shards ≈ 100 GB; use 64k shards there).  No global sort ever
    happens: ordering exists only *within* a shard, which is exactly
    the contract a sharded data loader consumes (shard files are read
    sequentially, shard assignment is the randomization).

    A different ``salt`` yields an independent permutation — reshuffle
    between epochs by changing it.
    """
    hexkey = F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(hexkey, 1, 15), 16, 10).cast("long"), F.lit(num_shards)
    )
    w = Window.partitionBy("shard").orderBy("__hex", key_col)
    return (
        df.withColumn("__hex", hexkey)
        .withColumn("shard", shard)
        .withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .drop("__hex")
    )


def quantile_filter(
    df: DataFrame,
    metric: Column | str,
    keep_top: float = 0.75,
    stratum_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum quantile gate: keep the top ``keep_top`` fraction of
    each stratum by ``metric`` (drop the bottom 1-keep_top quantile) —
    the "drop the worst quartile per source" curation move.

    Rank-based, not value-threshold-based: the cut is
    ``percent_rank() >= 1 - keep_top`` over (stratum, metric asc, key),
    which is exact integer arithmetic ((rank-1)/(n-1)) — identical in
    every engine, immune to the floating-point-threshold boundary flips
    a ``metric >= quantile_value`` filter suffers, and it needs no
    second pass to compute the quantile value first.  One window
    shuffle on the stratum; at 100 TB pre-aggregate or shard exactly
    as ``pack_sequences`` does if a stratum exceeds one executor.

    Returns the surviving rows with their ``pct_rank`` attached.
    """
    m = F.col(metric) if isinstance(metric, str) else metric
    w = Window.partitionBy(stratum_col).orderBy(m.asc(), F.col(key_col).asc())
    return (
        df.withColumn("pct_rank", F.percent_rank().over(w))
        .filter(F.col("pct_rank") >= F.lit(1.0 - keep_top))
    )


def token_budget_mixture(
    df: DataFrame,
    budget_tokens: Column | str,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
) -> DataFrame:
    """Token-budgeted mixture: take documents from each stratum in
    deterministic md5 order until that stratum's token budget fills —
    how an epoch mixture with domain weights is actually constructed
    (a *rate*-based sample can't hit a token target when document
    lengths differ by orders of magnitude across sources).

    ``budget_tokens`` is a column expression (so weights can derive
    from the stratum, a config join, or a total-budget split).  The
    document that straddles the budget boundary is included — same
    greedy overflow rule as ``pack_sequences``, so a budget is always
    reached exactly or exceeded by < one document, never starved.

    Scale shape: ONE window per stratum over (md5, key) — identical
    shuffle to ``shuffle_corpus``; the hash order makes the selection
    a uniform random-without-replacement draw that is rerun- and
    layout-stable, and changing ``salt`` redraws independently (fresh
    epoch).  Shard exactly as ``pack_sequences`` does if a stratum
    exceeds one executor.

    Returns survivors with ``n_tok`` and the exclusive running total
    ``cum_tok`` attached (cum_tok < budget is the acceptance rule).
    """
    budget = F.col(budget_tokens) if isinstance(budget_tokens, str) else budget_tokens
    hexkey = F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy("__hex", key_col)
    return (
        df.withColumn("__hex", hexkey)
        .withColumn("n_tok", token_count(text_col).cast("long"))
        .withColumn("cum_tok", F.sum("n_tok").over(w) - F.col("n_tok"))
        .filter(F.col("cum_tok") < budget)
        .drop("__hex")
    )


def leakage_safe_split(
    df: DataFrame,
    train_pct: int = 90,
    val_pct: int = 5,
    text_col: str = "text",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split keyed on CONTENT, not row id:
    the bucket is an md5 of the normalized-text digest, so byte-equal
    documents land in the SAME split whatever their ids — an id-keyed
    split leaks every exact duplicate pair across the train/eval
    boundary (the classic eval-contamination bug this operator exists
    to prevent; run near-dup keeper resolution upstream for fuzzier
    leakage).

    Shuffle-free: digest, bucket, and label are pure column
    expressions evaluated at scan speed — no shuffle, no state, and
    the same assignment on every rerun, any layout, any engine (the
    md5 construction matches ``portable_row_hash``).  ``salt`` redraws
    the whole split independently.

    Returns the input plus ``split`` ('train' | 'val' | 'test');
    remaining probability mass (100 - train - val) is 'test'.
    """
    if not (0 < train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError(f"bad split percentages: train={train_pct} val={val_pct}")
    digest = F.md5(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    )
    bucket = portable_row_hash(F.concat(F.lit(f"{salt}:"), digest))
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the document →
    model-input step of every RAG / context-window pipeline.  Chunk
    ``i`` covers tokens ``[1 + i*stride, 1 + i*stride + chunk_tokens)``
    (1-based); the last chunk may be short; a document shorter than one
    chunk yields exactly one chunk; ``stride < chunk_tokens`` gives
    ``chunk_tokens - stride`` tokens of overlap so no boundary context
    is lost.

    Shuffle-free: tokenization, the chunk-count arithmetic, the
    ``posexplode`` row expansion, and the per-chunk slice/hash are all
    row-local column expressions — the plan is scan → generate →
    project, no Exchange (plan-asserted in tests/test_sampling.py).
    At 100 TB this runs at scan speed and the output is written
    partitioned however the consumer shards.

    Returns ``(id_col, chunk_no, n_tokens, chunk_hash)`` where
    ``chunk_hash`` is the md5 of the space-joined chunk tokens — a
    compact, engine-portable identity for downstream chunk-level dedup.
    """
    if stride <= 0 or chunk_tokens <= 0 or stride > chunk_tokens:
        raise ValueError(f"bad chunking: chunk_tokens={chunk_tokens} stride={stride}")
    toks = ws_tokens(text_col)
    n = F.size(toks)
    # 1 + ceil(max(n - chunk, 0) / stride) chunks, in integer arithmetic
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - F.lit(chunk_tokens), F.lit(0)) + F.lit(stride - 1))
        / F.lit(stride)
    ).cast("int")
    chunk = F.slice(
        F.col("__toks"), F.col("chunk_no") * stride + 1, chunk_tokens
    )
    return (
        df.select(
            id_col,
            toks.alias("__toks"),
            F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_no", "__x"),
        )
        .select(
            id_col,
            F.col("chunk_no").cast("int").alias("chunk_no"),
            F.size(chunk).cast("long").alias("n_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
    )


def exact_k_sample(
    df: DataFrame,
    k: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "ek",
) -> DataFrame:
    """Exactly-k uniform sample per stratum, deterministic: keep the k
    rows with the smallest md5(salt:key) per stratum.

    Bernoulli sampling (``stratified_sample``) gives a *binomial* count
    per stratum — fine for rate control, wrong when a downstream
    contract needs exactly k rows (eval-set carving, per-domain probe
    sets, human-review batches).  The hash order is a uniform random
    permutation of each stratum, so the k smallest hashes are a uniform
    without-replacement draw — a distributed reservoir with none of the
    reservoir's sequential state.

    Scale shape: one hash-partitioned window per stratum; rank<=k is
    executed as WindowGroupLimit, which truncates each partition's sort
    at k map-side before the shuffle — the full stratum is never
    globally sorted, and the exchange carries at most k rows per
    stratum per map partition."""
    hexcol = F.md5(F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(hexcol.asc(), F.col(key_col).asc())
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def dupcount_weighted_sample(
    df: DataFrame,
    weight_col: str = "dup_count",
    key_col: str = "doc_id",
    rate_permille_per_dup: int = 300,
) -> DataFrame:
    """Duplicate-count-weighted keeper sampling: after exact dedup, a
    keeper that stood for ``w`` copies is kept with probability
    min(1, w·rate), so the sample's source distribution tracks the
    PRE-dedup corpus (plain uniform sampling of keepers under-represents
    everything that was heavily duplicated — usually the most popular
    content).  Deterministic hash filter in [0, 1000) — same
    engine-portable md5 construction as every sampler here, so the
    sample is rerun- and layout-stable; no shuffle, no state."""
    rate = F.least(
        F.lit(1000), F.lit(rate_permille_per_dup) * F.col(weight_col)
    )
    return df.filter(portable_row_hash(key_col, buckets=1000) < rate)


def quota_per_stratum(
    df: DataFrame,
    stratum_col: str = "source",
    k: int = 15,
    order_cols: Sequence[Column | str] = (),
) -> DataFrame:
    """Per-stratum quota enforcement (the domain-cap governance pass of
    corpus mixing: no single site/domain may exceed ``k`` documents):
    rank rows within each stratum by ``order_cols`` (best-first, with a
    deterministic tiebreak the caller includes) and keep the top ``k``.

    Scale shape: rank ≤ k over a partitioned window compiles to
    WindowGroupLimit — every shuffle partition discards beyond-quota
    rows BEFORE the exchange, so the shuffle carries at most
    |strata|·k rows per mapper, not the corpus.  Adds ``quota_rank``
    (1-based long)."""
    w = Window.partitionBy(stratum_col).orderBy(*order_cols)
    return df.withColumn("quota_rank", F.row_number().over(w).cast("long")).filter(
        F.col("quota_rank") <= k
    )
