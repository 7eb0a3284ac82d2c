"""Text-analysis operators (SURVEY §2.J4): language ID, quality scoring,
token counting, fingerprinting.  All pure column expressions (codegen);
each has an exact DuckDB oracle in plans/text_queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import regex_token_count, token_count, ws_tokens

# Tiny per-language marker lists for the n-gram/stopword heuristic.
# Frozen — the oracle SQL embeds the same lists.  Priority order breaks
# ties deterministically.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "que", "pour", "dans"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "für"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不", "人", "这"),
}
LANG_PRIORITY = ("en", "es", "fr", "de", "zh")


def _lower_tokens(text_col) -> Column:
    return F.transform(ws_tokens(text_col), lambda t: F.lower(t))


def lang_scores(text_col="text") -> dict[str, Column]:
    """Marker-hit count per language (int column each)."""
    toks = _lower_tokens(text_col)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text_col="text") -> Column:
    """Predicted language: argmax marker-hit count, 'und' if no hits.

    Ties resolve by LANG_PRIORITY order — deterministic, mirrored in SQL.
    """
    scores = lang_scores(text_col)
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in LANG_PRIORITY:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_score(text_col="text") -> Column:
    """Composite quality score in [0,1]:
    0.5·min(tokens/100, 1) + 0.5·alpha_char_ratio.

    Deterministic double arithmetic (int counts + IEEE division), so the
    oracle matches bit-exactly."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_tok = token_count(c)
    alpha_ratio = F.length(F.regexp_replace(c, "[^A-Za-z]", "")).cast("double") / F.length(c)
    return F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.5 + alpha_ratio * 0.5


def fingerprint(text_col="text") -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, collapsed whitespace).  Engine-portable (md5 everywhere)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


__all__ = [
    "LANG_MARKERS",
    "LANG_PRIORITY",
    "lang_id",
    "lang_scores",
    "quality_score",
    "fingerprint",
    "token_count",
    "regex_token_count",
    "repetition_signals",
]


def winnow_fingerprints(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    MOSS algorithm): hash every k-gram, slide a window of ``window``
    consecutive hashes, keep each window's minimum.  Guarantees any match
    of length ≥ window+k-1 shares a fingerprint, while storing only
    ~2/(window+1) of the hashes — the standard rolling-hash document
    fingerprint for plagiarism/overlap detection at corpus scale.

    Execution shape: positions explode off a ``sequence`` (codegen), the
    window minimum is a bounded ROWS frame per doc ordered by position —
    one shuffle on the doc id — and the distinct minima are the
    fingerprint set.  Returns (id, fingerprint) rows, one per distinct
    fingerprint.  (xxhash64 replaces the classic polynomial rolling hash:
    Spark evaluates it natively per substring, so the O(1)-update
    recurrence buys nothing while costing codegen.)"""
    from pyspark.sql import Window as W

    base = df.select(
        F.col(id_col).alias("id"),
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ").alias("t"),
    )
    grams = base.select(
        "id",
        "t",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("t") - (k - 1), F.lit(1)))
        ).alias("pos"),
    ).select("id", "pos", F.xxhash64(F.substring(F.col("t"), F.col("pos"), k)).alias("h"))
    w = W.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    return (
        grams.select("id", F.min("h").over(w).alias("fingerprint"))
        .distinct()
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition quality signals per document: the
    fraction of tokens taken by the most frequent word, the duplicate-
    word fraction, and the most-frequent-bigram fraction — the standard
    filters for boilerplate / degenerate repetition in web corpora
    (Rae et al. 2021, §A1.1 heuristics, public paper).

    Plan shape: explode → two (id, term) count aggregates → per-doc
    rollup — every aggregate keys on ``id_col`` first, so at scale the
    three stages share one hash partitioning of the corpus and the
    shuffle carries (id, term, count) partials, never raw text.  All
    ratios are bigint-over-bigint IEEE divisions: engine-exact."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    d = df.select(id_col, toks.alias("__toks"))
    words = d.select(id_col, F.explode("__toks").alias("tok"))
    wc = words.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    ws = wc.groupBy(id_col).agg(
        F.max("c").alias("mx"), F.sum("c").alias("n"), F.count(F.lit(1)).alias("nd")
    )
    bigrams = F.expr(
        "transform(slice(__toks, 1, size(__toks)-1),"
        " (x, i) -> concat(x, ' ', element_at(__toks, i + 2)))"
    )
    b = d.select(
        id_col,
        F.explode(
            F.when(F.size("__toks") > 1, bigrams).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    bc = b.groupBy(id_col, "bg").agg(F.count(F.lit(1)).alias("c"))
    bs = bc.groupBy(id_col).agg(F.max("c").alias("mxb"))
    return ws.join(bs, id_col, "left").select(
        id_col,
        F.col("n").alias("n_tokens"),
        (F.col("mx") / F.col("n")).alias("top_word_frac"),
        ((F.col("n") - F.col("nd")) / F.col("n")).alias("dup_word_frac"),
        F.when(F.col("n") > 1, F.col("mxb") / (F.col("n") - 1))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def vocab_topk(
    df: DataFrame,
    k: int = 20,
    by: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary: the ``k`` most frequent whitespace tokens per
    ``by`` group (per language here) — the counting pass under any
    BPE/unigram tokenizer training run and the fastest corpus-drift
    smoke check.

    Scale shape: explode → count is map-side combined (the shuffle
    carries (group, token, partial_count), never text bodies), and the
    rank-filter compiles to WindowGroupLimit, so each shuffle partition
    keeps only its local top-k before the final per-group selection.
    Deterministic tie-break: count desc, token asc.
    """
    toks = df.select(F.col(by), F.explode(ws_tokens(F.lower(F.trim(F.col(text_col))))).alias("tok"))
    counts = toks.groupBy(by, "tok").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(by).orderBy(F.col("n").desc(), F.col("tok").asc())
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(by, "tok", "n", "rnk")
    )


def top_terms_tf_rdf(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document characteristic terms: rank a doc's tokens by
    tf × reciprocal document frequency and keep the top ``k`` — the
    keyword-extraction pass used for corpus topic audits and
    cluster labeling.

    The weight is the integer ``(tf * 1_000_000) div df`` rather than
    the textbook ``tf·log(N/df)``: log damping would make the score a
    transcendental double whose last-ulp differences across engines
    (Java vs C99 ``log``) can flip rank ties — integer arithmetic is
    exact everywhere, and for a fixed tf the two weightings order
    terms identically (both are monotone decreasing in df).

    Scale shape: two map-side-combined counts (per-doc tf; distinct-doc
    df) joined on the term, then a WindowGroupLimit top-k per doc.  The
    df side is corpus-wide but only (term, count) wide; at 100 TB cap
    it with a min-df filter (hapaxes dominate the long tail and can
    never rank with tf ≥ 2 terms — here the fixture is small enough
    not to need it).
    """
    from ..catalog import track_persisted

    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(F.lower(F.trim(F.col(text_col))))).alias("tok")
    )
    # tf feeds BOTH dfreq and the scoring join; without a persist the
    # token explode + count subtree sits in the DAG twice and Spark
    # re-executes it (no cross-branch CSE) — at corpus scale that
    # doubles the dominant cost.  The caller releases via
    # catalog.release_persisted() once materialized.
    tf = track_persisted(
        toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf")).persist()
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "tok").withColumn(
        "score", F.expr("(tf * 1000000) div df")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "tok", "tf", "df", "score", "rnk")
    )


# ---------------------------------------------------------------------------
# PII redaction (§2.J4 extension).  A 100 TB pretraining corpus must be
# scrubbed of emails / phone numbers / IP addresses before training; the
# standard shape (e.g. BigScience ROOTS, Dolma) is a cascade of regex
# rewrites applied scan-side.  Patterns are frozen module constants and
# restricted to syntax that means the same thing in Java regex (Spark)
# and RE2 (DuckDB) — character classes, bounded repetition, \b — so the
# oracle runs the identical automaton.  Counting happens on the input of
# each redaction step (email count on raw text, phone count on the
# email-redacted text, ...) so count and rewrite always agree.
# ---------------------------------------------------------------------------

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Sequentially redact the PII pattern cascade from ``text_col``,
    adding one ``n_<kind>`` BIGINT match-count column per pattern and
    replacing the text with its redacted form.

    Pure row-local regexp expressions: whole-stage codegen, no shuffle,
    no Python — the redaction runs at parquet-scan speed, which is the
    only acceptable cost for an operator that must touch every byte of
    a 100 TB corpus.  Order matters and is part of the contract: emails
    are rewritten first so their host part can never be double-counted
    as a bare IPv4.
    """
    out = df
    cur = F.col(text_col)
    for kind, pat, repl in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", F.regexp_count(cur, F.lit(pat)).cast("long"))
        cur = F.regexp_replace(cur, pat, repl)
    return out.withColumn(text_col, cur)


def remove_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
    sep: str = " | ",
    min_df_frac: float = 0.2,
) -> DataFrame:
    """CCNet-style boilerplate line removal: drop lines that repeat
    across a large fraction of a group's documents (site headers,
    cookie banners, newsletter footers), keep unique content.

    A "line" is a ``sep``-delimited segment.  Per (group, line) the
    document frequency is counted; lines with
    ``df >= min_df_frac * group_doc_count`` are boilerplate.  Documents
    are reassembled from their kept lines in original order, with
    per-doc removed/kept counts for curation audits.

    Plan shape — the line stream (the 100 TB object) shuffles exactly
    ONCE:

    1. split + posexplode lines (scan-side generate, no exchange);
    2. line document-frequency: one hash aggregate keyed
       (group, line) — map-side combinable; group doc-counts are a
       second, doc-sized aggregate;
    3. the boilerplate set — lines over the threshold — is by
       construction SMALL (each survivor repeats in >= frac of a
       group's docs, so a group holds at most lines-per-doc / frac of
       them); lines are MARKED with a broadcast LEFT OUTER join — the
       full line stream never shuffles for the membership test;
    4. one aggregate keyed on the doc id does everything else:
       reassembly of the kept lines in original order
       (``sort_array(collect_list(struct(...)))`` → ``filter`` →
       ``array_join``, no window sort) AND the kept/removed counts —
       no separate totals aggregate, no doc-level join afterwards.

    Four shuffle exchanges total: two for the line document-frequency
    (Spark's exact-distinct aggregate is two-phase: (group, line, doc)
    then (group, line)), one doc-sized group count, one doc-keyed
    reassembly.  A filter-then-reassemble formulation would shuffle the
    line stream again and re-join per doc — marking first folds all of
    it into the one doc-keyed aggregate.  AQE handles skewed lines.
    """
    lines = df.select(
        F.col(id_col),
        F.col(group_col),
        # F.split takes a Java REGEX: \Q...\E quotes the separator so
        # "|" (alternation) and friends split literally.
        F.posexplode(F.split(F.col(text_col), f"\\Q{sep}\\E", -1)).alias(
            "__line_no", "__line"
        ),
    )
    # input contract: one row per document (a doc table, not a line
    # table), so the group size is a plain count — no distinct pass
    group_docs = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__group_docs")
    )
    line_df = lines.groupBy(group_col, "__line").agg(
        F.countDistinct(id_col).alias("__df")
    )
    boilerplate = (
        line_df.join(F.broadcast(group_docs), group_col)
        .filter(F.col("__df") >= F.col("__group_docs") * F.lit(min_df_frac))
        .select(group_col, "__line", F.lit(True).alias("__bp"))
    )
    marked = lines.join(
        F.broadcast(boilerplate), [group_col, "__line"], "left"
    )
    ordered = F.sort_array(
        F.collect_list(F.struct("__line_no", "__line", "__bp"))
    )
    kept_lines = F.filter(ordered, lambda s: s.getField("__bp").isNull())
    return marked.groupBy(id_col).agg(
        F.first(group_col).alias(group_col),
        F.array_join(
            F.transform(kept_lines, lambda s: s.getField("__line")), sep
        ).alias("clean_text"),
        F.sum(F.when(F.col("__bp").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_lines_kept"),
        F.sum(F.when(F.col("__bp").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_lines_removed"),
    )


def canonicalize_url(col: Column | str = "url") -> Column:
    """Canonical URL form for URL-level dedup (the Common-Crawl-style
    first dedup pass: one fetch survives per canonical URL).

    Rules, in order: drop the ``#fragment``; lowercase the
    scheme+authority (never the path — paths are case-sensitive); strip
    the scheme's OWN default port (``:80`` for http, ``:443`` for
    https — ``http://h:443`` is a distinct resource and survives);
    delete tracking query parameters (``utm_*``, ``fbclid``) wherever
    they sit in the query string — matches are anchored at a ``?``/``&``
    separator so a parameter merely *containing* ``utm_`` (e.g.
    ``xutm_source``) is untouched; drop a trailing ``/`` (also before
    ``?``).

    Pure regexp/concat column expression — scan-side whole-stage
    codegen, no shuffle, no Python.  Every pattern is written in the
    Java-regex ∩ RE2 common syntax (no lookaround, no backrefs) so the
    DuckDB oracle applies literally the same rules (with the ``'g'``
    flag — DuckDB replaces first-match-only by default, Java replaces
    all)."""
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, r"#.*$", "")
    head = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", 0)
    rest = u.substr(F.length(head) + F.lit(1), F.lit(1 << 30))
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(http://.*):80$", "$1")
    head = F.regexp_replace(head, r"^(https://.*):443$", "$1")
    # Anchored at the separator (kept via $1) so `xutm_source` never
    # matches; the inner + swallows RUNS of tracking params in one
    # match — a global replace resumes scanning the ORIGINAL string
    # after each match, so an unanchored-run second param would
    # otherwise survive.
    rest = F.regexp_replace(rest, r"([?&])((utm_[a-z]+|fbclid)=[^&#]*&)+", "$1")
    rest = F.regexp_replace(rest, r"[?&]((utm_[a-z]+|fbclid)=[^&#]*&?)+$", "")
    rest = F.regexp_replace(rest, r"\?$", "")
    rest = F.regexp_replace(rest, r"/\?", "?")
    rest = F.regexp_replace(rest, r"/$", "")
    return F.concat(head, rest)


def dedup_lines_within_doc(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", sep: str = " | "
) -> DataFrame:
    """Intra-document repetition removal: drop every line that already
    appeared EARLIER in the same document (first occurrence kept, order
    preserved), the in-document counterpart of cross-doc boilerplate
    removal (``remove_boilerplate``) — templated pages repeat their own
    nav blocks and disclaimers many times within one crawl record.

    Lines are ``sep``-separated (the fixture's literal separator —
    split on an escaped literal, not a regex).  Pure higher-order
    array expressions: split → positional filter (a line survives iff
    its index equals the index of its first occurrence) → rejoin.
    Per-row, shuffle-free, codegen; no explode, so no row expansion at
    any scale."""
    # \Q...\E-quoted literal: F.split takes a Java regex and the
    # default separator contains "|" (alternation) — same convention
    # as remove_boilerplate above.
    lines = F.split(F.col(text_col), f"\\Q{sep}\\E", -1)
    kept = F.filter(
        lines, lambda line, i: F.array_position(lines, line) == i + F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.array_join(kept, sep).alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_lines_removed"),
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """The inner scan of BPE tokenizer training: corpus-wide counts of
    ADJACENT symbol pairs, top-``k`` — each training iteration merges
    the most frequent pair and rescans; this operator is that scan as
    one Spark job (symbols here are whitespace words; after a merge the
    caller re-tokenizes and reruns — the loop is driver-side like every
    iterative-refinement trainer in this repo).

    Plan: tokens → one posexplode producing (left, right) adjacent
    pairs (position-based, no self-join) → map-side-combinable count →
    WindowGroupLimit-free global top-k via sort+limit on the tiny
    aggregated relation.  The explode pipelines with the scan; the only
    exchange is the pair-count aggregate."""
    toks = df.select(ws_tokens(F.lower(F.trim(F.col(text_col)))).alias("t")).filter(
        F.size("t") >= 2
    )
    pairs = toks.select(
        F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t"
    ).select(
        F.element_at("t", F.col("i").cast("int")).alias("left"),
        F.element_at("t", (F.col("i") + 1).cast("int")).alias("right"),
    )
    return (
        pairs.groupBy("left", "right")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            ),
        )
        .filter(F.col("rnk") <= k)
        .select("left", "right", "n", F.col("rnk").cast("long").alias("rnk"))
    )


# Frozen stopword list for the profile operator — like LANG_MARKERS, a
# versioned artifact of the pipeline (swap lists => re-profile), shared
# verbatim with the DuckDB oracle.
STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")


def stopword_stats(
    df: DataFrame,
    text_col: str = "text",
    by: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Corpus stopword profile: per ``by``-group document count, token
    count, stopword count, and the stopword ratio in exact parts-per-
    million — the function-word density signal quality filters cut on
    (machine-generated and keyword-stuffed text sits far from natural
    prose).

    Per-row work is a higher-order array filter against a 10-element
    literal (no join, no explode — the token array never leaves the
    row), then one map-side-combinable aggregate: a single exchange of
    |groups| rows however large the corpus.  The ratio divides the two
    exact integer sums once per GROUP, so it is reproducible bit-for-
    bit on any engine and partition order."""
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = ws_tokens(F.lower(F.col(text_col)))
    per_doc = df.select(
        *by,
        F.size(toks).cast("long").alias("__n"),
        F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
        .cast("long")
        .alias("__s"),
    )
    return per_doc.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__n").alias("n_tokens"),
        F.sum("__s").alias("n_stopwords"),
        F.round(F.lit(1_000_000) * F.sum("__s") / F.sum("__n"), 0)
        .cast("long")
        .alias("stop_ppm"),
    )


def unigram_nll(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", scale: int = 10_000
) -> DataFrame:
    """Unigram language-model scoring: build the corpus unigram model
    p(w) = count(w)/N, then score each document by its total and mean
    negative log-likelihood — the classic LM-perplexity quality signal
    (documents far above the corpus mean NLL are noise; far below are
    boilerplate).

    Numeric contract: ln is quantized ONCE PER DISTINCT COUNT at
    ``scale`` (floor(scale·ln(N/c)+0.5) — a per-vocab-entry integer),
    and document scores are INTEGER sums of those quanta, so the
    whole result is exact given the quantized model; engines only have
    to agree on ln to ~1e-9, far coarser than any libm difference.

    Plan: one token explode feeding BOTH sides — a vocab aggregate
    (|vocab| rows, broadcast back) and a per-doc aggregate; the corpus
    is scanned once, the model join is broadcast-hash, and the only
    full-size exchange is the doc_id aggregate."""
    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(F.lower(F.trim(F.col(text_col))))).alias("w")
    )
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").cast("double").alias("n_total"))
    model = vocab.crossJoin(F.broadcast(total)).select(
        "w",
        F.floor(F.lit(scale) * F.log(F.col("n_total") / F.col("c")) + F.lit(0.5))
        .cast("long")
        .alias("nll_fp"),
    )
    return (
        toks.join(F.broadcast(model), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("nll_fp").alias("sum_nll_fp"),
            F.round(F.sum("nll_fp") / F.count(F.lit(1)), 0)
            .cast("long")
            .alias("mean_nll_fp"),
        )
    )


def heavy_hitter_tokens(
    df: DataFrame,
    text_col: str = "text",
    threshold_denom: int = 1000,
    counters: int = 1024,
) -> DataFrame:
    """EXACT corpus heavy hitters: every token whose corpus frequency
    exceeds ``1/threshold_denom`` of all tokens, with its exact count.

    The naive plan — explode every token and ``groupBy(tok)`` — shuffles
    the full token stream and builds a hash table over the entire
    vocabulary, which at 100 TB means the shuffle IS the corpus.  This
    operator uses the classic two-pass sketch-then-verify shape instead:

    Pass 1 (candidates): a per-partition Misra-Gries summary with
      ``counters`` slots runs inside one arrow-batched ``mapInPandas``
      (each Arrow batch is folded in via exact ``value_counts`` and the
      mergeable-summaries reduction of Agarwal/Cormode et al.: pointwise
      sum, subtract the (k+1)-th largest, prune).  MG guarantees any
      token with partition count > partition_total/(counters+1) survives,
      and by pigeonhole any GLOBAL heavy hitter above total/threshold_denom
      is a partition heavy hitter somewhere (requires
      ``counters + 1 >= threshold_denom``, enforced) — so the union of
      partition candidates is a SUPERSET of the true answer, at most
      ``counters`` rows per partition regardless of vocabulary size.

    Pass 2 (verify): the token stream is re-scanned once and semi-joined
      against the BROADCAST candidate set (no shuffle of the stream),
      then only surviving tokens — bounded by counters × partitions, in
      practice ≈ threshold_denom rows — are exactly counted.  The result
      is exact, not approximate: the sketch only prunes, never answers.

    Two scans of the corpus by design (the second is the price of
    exactness; both are full-rate parquet scans with no wide exchange).
    """
    if counters + 1 < threshold_denom:
        raise ValueError(
            f"counters+1 ({counters + 1}) must be >= threshold_denom "
            f"({threshold_denom}) for the candidate superset guarantee"
        )
    toks_expr = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    toks = df.select(F.explode(toks_expr).alias("tok"))
    total_df = df.select(
        F.sum(F.size(toks_expr)).cast("long").alias("total_tokens")
    )

    k = counters

    def mg_partition(batches):
        import pandas as pd

        counts: dict[str, int] = {}
        for pdf in batches:
            for t, c in pdf["tok"].value_counts().items():
                counts[t] = counts.get(t, 0) + int(c)
            if len(counts) > k:
                sub = sorted(counts.values(), reverse=True)[k]
                for t in list(counts):
                    nc = counts[t] - sub
                    if nc > 0:
                        counts[t] = nc
                    else:
                        del counts[t]
        yield pd.DataFrame({"tok": list(counts)})

    candidates = toks.mapInPandas(mg_partition, "tok string").distinct()
    exact = (
        toks.join(F.broadcast(candidates), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        exact.crossJoin(F.broadcast(total_df))
        .filter(F.col("n") * F.lit(threshold_denom) > F.col("total_tokens"))
        .select(
            "tok",
            "n",
            "total_tokens",
            F.expr(
                "CAST(n * CAST(1000000 AS BIGINT) div total_tokens AS BIGINT)"
            ).alias("freq_ppm"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df_frac: float = 0.1,
    max_bucket_size: int = 10_000,
    min_cos_ppm: int = 250_000,
) -> DataFrame:
    """Sparse TF-IDF cosine document-pair similarity via an inverted
    index (the classic set-similarity join — no all-pairs product
    anywhere).  The lexical complement to the embedding-space family
    in operators/similarity.py: it finds templated / boilerplate /
    paraphrase-by-substitution pairs whose embeddings may diverge.

    Weights are the exact integer ``(tf * 1_000_000) div df`` of
    :func:`top_terms_tf_rdf` (log-free: engines agree bit-for-bit and
    the weighting is monotone in 1/df like the textbook tf·idf), so
    dot products and norms are exact BIGINT sums; the only float op is
    the final ``dot / sqrt(n2_a · n2_b)``, a single correctly-rounded
    IEEE expression both engines evaluate identically.

    Scale shape — two distinct bounds, deliberately separate:

    * **Relative df band** (semantic): candidates come only from
      tokens in ``min_df <= df <= floor(max_df_frac · n_docs)`` — the
      inverted-index stopword filter.  RELATIVE, not absolute, so the
      discrimination contract survives corpus growth (an absolute cap
      silently empties the index once every token's df outgrows it —
      measured on the 10x replication probe).
    * **Absolute bucket cap** (operational): token buckets above
      ``max_bucket_size`` docs are skipped, bounding per-token join
      fan-out at C(max_bucket_size, 2) at ANY corpus size.  Like the
      SymSpell/dHash families, completeness is conditional on this
      cap and the skips are observable: run
      :func:`oversized_token_buckets` with the same arguments — empty
      means the pair set is exactly the thresholded TF-IDF cosine
      relation.

    Norms still use ALL tokens, so the reported cosine is the true
    TF-IDF cosine, not a filtered approximation of the norm.  (BIGINT
    headroom: w <= tf*10^6/df, so norm terms stay far under 2^63 for
    any real text; a corpus with degenerate million-fold single-token
    repetition should cap tf at ingest — the repetition_signals gate
    already flags such documents.)  The tf relation is persisted once
    and feeds the norm aggregate and both join sides (no cross-branch
    CSE in Spark).  Join keys are 8-byte ``xxhash64`` token hashes,
    not token strings.
    """
    from ..catalog import track_persisted

    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(ws_tokens(F.lower(F.trim(F.col(text_col))))).alias("tok"),
    )
    n_docs = df.agg(
        F.floor(F.count(F.lit(1)) * F.lit(max_df_frac)).alias("max_df")
    )
    tf = toks.groupBy("doc", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = track_persisted(
        tf.join(dfreq, "tok")
        .withColumn("w", F.expr("(tf * 1000000) div df"))
        .persist()
    )
    norms = w.groupBy("doc").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    inv = (
        w.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.col("max_df"))
            & (F.col("df") <= max_bucket_size)
        )
        .select(F.xxhash64("tok").alias("tkey"), "doc", "w")
    )
    a = inv.select("tkey", F.col("doc").alias("doc_a"), F.col("w").alias("w_a"))
    b = inv.select("tkey", F.col("doc").alias("doc_b"), F.col("w").alias("w_b"))
    dots = (
        a.join(b, "tkey")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("w_a") * F.col("w_b")).alias("dot"))
    )
    cos_ppm = F.round(
        F.lit(1000000.0)
        * (
            F.col("dot").cast("double")
            / F.sqrt(F.col("n2_a").cast("double") * F.col("n2_b").cast("double"))
        ),
        0,
    ).cast("long")
    return (
        dots.join(norms.select(F.col("doc").alias("doc_a"), F.col("n2").alias("n2_a")), "doc_a")
        .join(norms.select(F.col("doc").alias("doc_b"), F.col("n2").alias("n2_b")), "doc_b")
        .withColumn("cos_ppm", cos_ppm)
        .filter(F.col("cos_ppm") >= F.lit(min_cos_ppm))
        .select("doc_a", "doc_b", "dot", "cos_ppm")
    )


def oversized_token_buckets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df_frac: float = 0.1,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Observability companion to :func:`tfidf_cosine_pairs`: the
    (tok, df) rows inside the relative df band whose buckets exceeded
    ``max_bucket_size`` and were therefore skipped.  Empty result ==
    the pair set is provably the full thresholded cosine relation."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(ws_tokens(F.lower(F.trim(F.col(text_col))))).alias("tok"),
    )
    n_docs = df.agg(
        F.floor(F.count(F.lit(1)) * F.lit(max_df_frac)).alias("max_df")
    )
    dfreq = (
        toks.groupBy("doc", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        dfreq.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.col("max_df"))
            & (F.col("df") > max_bucket_size)
        )
        .select("tok", "df")
    )

def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    scale: int = 10_000,
    k: int = 100,
) -> DataFrame:
    """Corpus collocations by pointwise mutual information — the
    classic phrase-mining pass (Mikolov et al.'s word2vec phrase
    builder uses exactly this score) for deciding which adjacent word
    pairs deserve a single vocabulary slot.

    ``pmi = ln( p(ab) / (p(a)·p(b)) )`` with p(ab) over the adjacent-
    pair stream and p(a) over the token stream; the j9d numeric
    contract applies — the single ``ln`` is quantized to integer
    micro-nats (``floor(scale·ln+0.5)``) on an argument both engines
    build with the identical IEEE expression tree, so results are
    exact given ~1e-9 libm agreement.

    Plan: one array-sized aggregate produces BOTH stream totals
    (broadcast scalars), the vocab is broadcast to the filtered pair
    relation (``min_count`` prunes the hapax tail BEFORE any join),
    and the global top-k ranks the tiny aggregated relation.  The
    corpus token arrays are scanned twice (unigram + pair explode) but
    never shuffled raw — both aggregates are map-side combined."""
    from ..catalog import track_persisted

    toks_arr = track_persisted(
        df.select(ws_tokens(F.lower(F.trim(F.col(text_col)))).alias("t")).persist()
    )
    totals = toks_arr.agg(
        F.sum(F.size("t")).cast("double").alias("n_uni"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).cast("double").alias("n_bi"),
    )
    uni = toks_arr.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).alias("c")
    )
    pairs = (
        toks_arr.filter(F.size("t") >= 2)
        .select(F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t")
        .select(
            F.element_at("t", F.col("i").cast("int")).alias("w1"),
            F.element_at("t", (F.col("i") + 1).cast("int")).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    scored = (
        pairs.join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))),
            "w2",
        )
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "pmi_fp",
            F.floor(
                F.lit(scale)
                * F.log(
                    (F.col("c_ab").cast("double") * F.col("n_uni") * F.col("n_uni"))
                    / (F.col("n_bi") * F.col("c_a") * F.col("c_b"))
                )
                + F.lit(0.5)
            ).cast("long"),
        )
    )
    return (
        scored.withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.desc("pmi_fp"), F.asc("w1"), F.asc("w2"))
            ),
        )
        .filter(F.col("rnk") <= k)
        .select("w1", "w2", "c_ab", "pmi_fp", F.col("rnk").cast("long").alias("rnk"))
    )


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 10_000,
) -> DataFrame:
    """Per-document character-entropy quality signal over the [a-z0-9]
    alphabet — the standard gibberish/blob detector (base64 dumps and
    key-mash score near the uniform ceiling ~ln 36; natural language
    sits well below; single-char runs near 0).

    Restricting to lowercase alphanumerics makes the char split
    engine-portable by construction (pure-ASCII regex on both sides —
    no UTF-16-vs-codepoint ambiguity), and the j9d quantization makes
    the sum exact: ``H·n·scale = Σ_ch c·floor(scale·ln(n/c)+0.5)`` is
    an integer both engines compute identically.

    Plan: explode → (doc, ch) count (map-side combined, ≤36 rows per
    doc out of the aggregate) → per-doc total via one window on the
    same doc partitioning → final doc aggregate.  No joins."""
    chars = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]"), F.lit(0))
        ).alias("ch"),
    )
    per = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(id_col)
    withn = per.withColumn("n", F.sum("c").over(w))
    term = F.floor(
        F.lit(scale) * F.log(F.col("n").cast("double") / F.col("c")) + F.lit(0.5)
    ).cast("long") * F.col("c")
    return (
        withn.withColumn("term", term)
        .groupBy(id_col)
        .agg(
            F.max("n").alias("n_alnum"),
            F.sum("term").alias("ent_fp_total"),
            F.round(F.sum("term") / F.max("n"), 0).cast("long").alias("mean_ent_fp"),
        )
    )


def _apply_merge(col: Column, left: str, right: str, joined: str) -> Column:
    """Greedy left-to-right, non-overlapping application of ONE BPE
    merge (left,right)→joined over a symbol array — as a single
    JVM-side ``aggregate`` fold (codegen'd; no explode, no Python).
    The accumulator carries (prev symbol, output array); the trailing
    prev is flushed and NULL slots filtered in the fold's FINISH
    lambda — flushing outside the aggregate read ``.out`` and
    ``.prev`` as two separate extracts of the same expression, which
    the projection does not common-subexpression-eliminate, so the
    whole fold ran TWICE (measured 2× on the j9h/j9i rows).  Symbols
    are never NULL (tokenizer output), so NULL is a safe empty
    sentinel."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.array().cast("array<string>").alias("out"),
    )

    def step(acc, x):
        is_pair = acc["prev"].eqNullSafe(F.lit(left)) & (x == F.lit(right))
        return F.when(
            is_pair,
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.concat(acc["out"], F.array(F.lit(joined))).alias("out"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.when(acc["prev"].isNull(), acc["out"])
                .otherwise(F.concat(acc["out"], F.array(acc["prev"])))
                .alias("out"),
            )
        )

    def finish(acc):
        return F.filter(
            F.concat(acc["out"], F.array(acc["prev"])),
            lambda x: x.isNotNull(),
        )

    return F.aggregate(col, init, step, finish)


def _apply_merge_disjoint(col: Column, left: str, right: str, joined: str) -> Column:
    """ONE merge with ``left != right`` — the common case, as a
    vectorized transform+filter instead of the sequential fold.

    Exactness: with left != right, two occurrences of the pair cannot
    overlap (an overlap would need the shared symbol to be both
    ``right`` and ``left``), and a candidate's left symbol can never
    have been consumed by an earlier occurrence in the same pass (it
    would have to be a ``right``), so greedy left-to-right
    non-overlapping == merge-every-occurrence — each position decides
    locally from its neighbors.  Pinned equivalent to the fold by
    test on random corpora.  NOTE: ``col`` is referenced three times
    (the transform target and two element_at lookups), so callers
    must pass an ATTRIBUTE (a materialized column), never a nested
    expression — see apply_bpe_merges' staged projections."""
    return F.filter(
        F.transform(
            col,
            lambda x, i: F.when(
                (x == F.lit(left))
                & (F.try_element_at(col, (i + 2).cast("int")) == F.lit(right)),
                F.lit(joined),
            )
            .when(
                (x == F.lit(right))
                & (i > 0)
                & (F.try_element_at(col, (i).cast("int")) == F.lit(left)),
                F.lit(None).cast("string"),
            )
            .otherwise(x),
        ),
        lambda y: y.isNotNull(),
    )


def apply_bpe_merges(df: DataFrame, merges: list, col: str = "t") -> DataFrame:
    """ENCODE with a trained merge table: apply every
    ``(iteration, left, right, count)`` row of :func:`bpe_train`'s
    output in training order over the token-array column ``col`` —
    the tokenizer APPLY side (no shuffle, no Python; at 100 TB this
    is a scan-side map, exactly a production tokenizer's merge-table
    broadcast).

    STAGED projections, one merge per Project node, on purpose:
    nesting the merge expressions composes them into one tree that
    re-evaluates every inner merge per reference (measured 20 s vs
    5.5 s for 4 merges at sf0.1); as separate stages each merge reads
    the previous stage's ATTRIBUTE, and CollapseProject declines to
    inline the non-cheap HOFs, so each pass runs exactly once.
    ``left != right`` merges (the common case) take the vectorized
    :func:`_apply_merge_disjoint`; self-merges keep the sequential
    greedy fold they require."""
    out = df
    for _it, left, right, _n in merges:
        joined = f"{left} {right}"
        applier = _apply_merge if left == right else _apply_merge_disjoint
        out = out.withColumn(col, applier(F.col(col), left, right, joined))
    return out


def bpe_round_plan(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The UNCHECKPOINTED per-round reduction of :func:`bpe_train` —
    explode adjacent positions → map-side-combined pair count →
    deterministic argmax — straight off the tokenized corpus, for plan
    audits: ``bpe_train``'s own per-round input is a
    ``localCheckpoint``-ed table whose truncated lineage hides this
    shape from ``explain`` (VERDICT r7 #2).  Must stay structurally
    identical to the loop body in :func:`bpe_train`."""
    from ..functions import ws_tokens

    cur = df.select(ws_tokens(F.lower(F.trim(F.col(text_col)))).alias("t"))
    return (
        cur.filter(F.size("t") >= 2)
        .select(F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t")
        .select(
            F.element_at("t", F.col("i").cast("int")).alias("left"),
            F.element_at("t", (F.col("i") + 1).cast("int")).alias("right"),
        )
        .groupBy("left", "right")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
        .limit(1)
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 5,
    min_count: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Iterative BPE merge training (word-level symbols, the j9c
    convention): each round counts adjacent symbol pairs corpus-wide,
    promotes the most frequent pair to a single symbol (deterministic
    tiebreak: count desc, then lexicographic), rewrites the corpus
    with :func:`_apply_merge`, and repeats — the actual tokenizer-
    training loop, distributed the way every iterative-refinement
    operator in this repo is (k-means, connected components): the
    per-round REDUCTION is a full Spark job, only the argmax row (a
    bounded driver value, like the centroid table) crosses to the
    driver, and each round ends in ``localCheckpoint`` so lineage
    doesn't stack across iterations.

    Returns the merge table [(iteration, left, right, count), ...] —
    the artifact a tokenizer ships.  Stops early when no pair reaches
    ``min_count``.  Scale shape per round: one explode →
    map-side-combined pair count → TakeOrdered(1); the rewrite is a
    codegen'd array fold, no shuffle."""
    from ..functions import ws_tokens

    cur = df.select(
        ws_tokens(F.lower(F.trim(F.col(text_col)))).alias("t")
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for it in range(n_merges):
        pairs = (
            cur.filter(F.size("t") >= 2)
            .select(F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"), "t")
            .select(
                F.element_at("t", F.col("i").cast("int")).alias("left"),
                F.element_at("t", (F.col("i") + 1).cast("int")).alias("right"),
            )
            .groupBy("left", "right")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["n"] < min_count:
            break
        left, right, n = pairs[0]["left"], pairs[0]["right"], pairs[0]["n"]
        joined = f"{left} {right}"
        merges.append((it, left, right, n))
        # vectorized pass when left != right (greedy == merge-all, see
        # _apply_merge_disjoint); the input is a checkpointed attribute,
        # so its triple reference is free.  Self-merges keep the fold.
        applier = _apply_merge if left == right else _apply_merge_disjoint
        cur = cur.select(
            applier(F.col("t"), left, right, joined).alias("t")
        ).localCheckpoint()
    return merges


def gopher_signals(text_col: str = "text") -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", §A1.1 repetition/quality filters —
    the standard pre-training corpus gate) as EXACT integer signals:

    - word count bounds,
    - mean word length bounds (cross-multiplied, no division),
    - fraction of words containing an alphabetic character,
    - fraction of lines that are bullets / end in an ellipsis,
    - symbol-to-word ratio ('#' chars + '...' occurrences).

    Every signal is an integer count and every threshold a
    cross-multiplied integer comparison, so both engines agree
    bit-for-bit; the composite ``passes_gopher`` is the conjunction.
    Pure codegen column expressions — no shuffle, no UDF; at 100 TB
    this is a scan-side filter that fuses into whatever reads the
    corpus."""
    c = F.col(text_col)
    toks = ws_tokens(c)
    lines = F.split(c, "\n", -1)
    n_words = F.size(toks).cast("long")
    word_chars = F.length(F.regexp_replace(c, r"\s", "")).cast("long")
    alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[A-Za-z]"))
    ).cast("long")
    n_lines = F.size(lines).cast("long")
    bullet_lines = F.size(
        F.filter(
            lines,
            lambda ln: F.trim(ln).startswith("-") | F.trim(ln).startswith("*"),
        )
    ).cast("long")
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).endswith("..."))
    ).cast("long")
    n_ellipsis = (
        (F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.", ""))) / F.lit(3)
    ).cast("long")
    n_hash = (F.length(c) - F.length(F.regexp_replace(c, "#", ""))).cast("long")
    sym_chars = (n_hash + n_ellipsis).cast("long")
    sig = {
        "n_words": n_words,
        "word_chars": word_chars,
        "alpha_words": alpha_words,
        "n_lines": n_lines,
        "bullet_lines": bullet_lines,
        "ellipsis_lines": ellipsis_lines,
        "sym_chars": sym_chars,
    }
    rules = {
        "r_word_count": (n_words >= 50) & (n_words <= 100000),
        "r_mean_word_len": (word_chars >= 3 * n_words)
        & (word_chars <= 10 * n_words),
        "r_alpha_ratio": alpha_words * 10 >= n_words * 8,
        "r_bullet_ratio": bullet_lines * 10 <= n_lines * 9,
        "r_ellipsis_ratio": ellipsis_lines * 10 <= n_lines * 3,
        "r_symbol_ratio": sym_chars * 10 <= n_words,
    }
    passes = None
    for r in rules.values():
        passes = r if passes is None else (passes & r)
    return {**sig, **rules, "passes_gopher": passes}


def hashed_linear_score(
    text_col: str = "text",
    buckets: int = 4096,
    weight_mod: int = 7,
    weight_shift: int = 3,
):
    """fastText-style hashed-feature linear scoring as pure column
    expressions (the j4n query body, shared with its hand-computed
    unit test): lowercase whitespace tokens hash into ``buckets``
    md5-prefix feature buckets, each bucket carries the integer weight
    w(b) = b mod ``weight_mod`` − ``weight_shift`` (a broadcast weight
    array from a trained model in production), and the document score
    is the array-fold weight sum.  Returns (n_feats, score) columns —
    shuffle-free, UDF-free, exact integers."""
    toks = F.transform(ws_tokens(F.col(text_col)), lambda t: F.lower(t))
    b = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        % buckets,
    )
    score = F.aggregate(
        F.transform(b, lambda x: x % weight_mod - weight_shift),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return F.size(toks).cast("long"), score
