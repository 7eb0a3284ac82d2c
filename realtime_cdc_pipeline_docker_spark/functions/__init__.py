"""Scalar / higher-order function helpers.

Everything here is built from ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen eligible) — no Python UDFs.  That is the difference
between an operator that survives 100 TB and one that doesn't: a
row-at-a-time Python UDF serializes every row across the JVM/Python
boundary; these expressions stay inside Tungsten codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Oracle-stable aggregation
# ---------------------------------------------------------------------------


def fixed_units(col: Column | str, scale: int = 2) -> Column:
    """Convert a fixed-point-valued double to exact integer units (long).

    The fixture money/value columns are 2- or 4-decimal fixed-point
    stored as doubles.  Doubles summed in different partition orders
    differ in final ulps, which breaks exact-hash comparison against any
    oracle (and makes re-runs non-reproducible at scale).
    ``round(x * 10^scale) :: bigint`` recovers the exact integer payload
    (the stored double is within ~1e-9 of it, so every engine rounds to
    the same integer); integer sums are exact and order-independent, and
    map-side partial aggregation still applies.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(10**scale), 0).cast("long")


def fixed_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent exact sum of a fixed-point double column → double."""
    return F.sum(fixed_units(col, scale)) / F.lit(float(10**scale))


def fixed_avg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent average of a fixed-point double column → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(fixed_units(col, scale)) / F.lit(float(10**scale)) / F.count(c)


def revenue_units(price_col: str = "l_extendedprice", disc_col: str = "l_discount") -> Column:
    """``price * (1 - discount)`` in exact 1e-4 integer units (long).

    price is 2-dec cents, discount is 2-dec percent points, so
    ``cents * (100 - pts)`` is an exact bigint — divide the final sum by
    1e4 to get dollars.
    """
    return fixed_units(price_col, 2) * (F.lit(100) - fixed_units(disc_col, 2))


# ---------------------------------------------------------------------------
# Timezone-independent epoch extraction
# ---------------------------------------------------------------------------
# The fixture timestamp columns read as TIMESTAMP_NTZ (naive wall-clock;
# the nanos-as-long fixtures of earlier rounds read as plain TIMESTAMP).
# ``unix_millis``/``unix_timestamp``/``cast(double)`` either reject NTZ
# outright (Spark 4) or interpret it in the session timezone — both
# wrong for an engine whose oracle (DuckDB ``epoch()``) treats naive
# timestamps as UTC.  These helpers dispatch on the column's DataType and
# stay exact integers (no double round-trip), JVM-side and codegen-able.

_TS_TYPES = ("timestamp", "timestamp_ntz")


def epoch_us(col: Column | str, dtype) -> Column:
    """Exact epoch microseconds (bigint) of a timestamp column.

    ``dtype`` is the column's ``DataType`` (so struct fields and lag/window
    expressions — where no DataFrame is at hand — work too).  NTZ is read
    as naive-UTC via ``timestampdiff`` from an NTZ epoch literal, which no
    session-timezone setting can shift; LTZ uses ``unix_micros`` (already
    an absolute instant)."""
    c = F.col(col) if isinstance(col, str) else col
    name = dtype.typeName()
    if name == "timestamp_ntz":
        return F.timestamp_diff(
            "MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), c
        )
    if name == "timestamp":
        return F.unix_micros(c)
    raise TypeError(f"epoch_us expects a timestamp column, got {name}")


def epoch_ms(col: Column | str, dtype) -> Column:
    """Exact epoch milliseconds (bigint); see ``epoch_us``."""
    return F.floor(epoch_us(col, dtype) / F.lit(1000)).cast("long")


def is_timestamp_type(dtype) -> bool:
    return dtype.typeName() in _TS_TYPES


# ---------------------------------------------------------------------------
# Vector algebra over array<float/double> columns (higher-order functions)
# ---------------------------------------------------------------------------


def vec_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns, accumulated in double.

    ``zip_with`` + ``aggregate`` run inside codegen over the array —
    no explode, no shuffle, no Python.  Sequential fold keeps the
    summation order deterministic for a given array.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: Column | str) -> Column:
    """L2 norm of an array column (double)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def vec_cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity between two array columns (double)."""
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))


def vec_normalize(a: Column | str) -> Column:
    """Unit-normalize an array column (array<double>).

    Pre-normalizing embeddings once turns every downstream cosine into a
    bare dot product — at 100 TB you normalize at ingest, not per query.
    """
    a = F.col(a) if isinstance(a, str) else a
    n = vec_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


# ---------------------------------------------------------------------------
# Text primitives (shared by dedup / text-analysis operators)
# ---------------------------------------------------------------------------

# BPE-ish word/number/punct tokenizer pattern (kept in sync with the
# DuckDB oracle SQL in plans/).
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Small English stopword list for the language-ID heuristic and quality
# scoring.  Frozen: oracle SQL embeds the same list.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that", "be", "are",
)


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokenization (trim first so no empty edge tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (int)."""
    return F.size(ws_tokens(col))


def regex_token_count(col: Column | str) -> Column:
    """BPE-ish token count: words / numbers / single punctuation marks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_PATTERN), F.lit(0)))


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of whitespace tokens that are English stopwords (double)."""
    toks = F.transform(ws_tokens(col), lambda t: F.lower(t))
    hits = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return hits.cast("double") / F.size(toks)


def bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` once and pass it to ``fn`` as a bound variable.

    Catalyst re-evaluates an expression referenced inside a higher-order
    lambda for every array element (no CSE across the lambda boundary).
    Wrapping the expression in a single-element array and ``transform``-ing
    binds it to a lambda variable, forcing single evaluation — turns
    O(len·cost(expr)) into O(len + cost(expr)).  Measured 10×+ on
    shingling (regexp normalize re-run per shingle otherwise).
    """
    return F.get(F.transform(F.array(expr), fn), 0)


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct character k-shingles of a string (array<string>).

    Built with sequence+transform (codegen) — the standard MinHash
    preprocessing step.  Lowercased, whitespace-collapsed first so
    formatting differences don't defeat near-dup detection; the
    normalized string is bound once (see ``bind``), not recomputed per
    shingle.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.array_distinct(
        bind(
            norm,
            lambda s: F.when(
                F.length(s) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.length(s) - (k - 1)),
                    lambda i: F.substring(s, i, k),
                ),
            ).otherwise(F.array(s)),
        )
    )


def _affine_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic odd multipliers / offsets for the MinHash family,
    derived from SHA-256 so they are stable across runs and machines."""
    import hashlib

    params = []
    for i in range(num_hashes):
        d = hashlib.sha256(f"minhash:{i}".encode()).digest()
        a = (int.from_bytes(d[:4], "little") | 1) & 0x7FFFFFFF  # odd, 31-bit
        b = int.from_bytes(d[4:8], "little") & 0x7FFFFFFF
        params.append((a, b))
    return params


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: array of ``num_hashes`` minima over the shingle
    set under an affine hash family.

    Each shingle is string-hashed ONCE (xxhash64, masked to 31 bits);
    the family members are ``(a_i·h + b_i) mod (2^31-1)`` — universal
    hashing; the prime modulus is load-bearing (without it the affine map
    is monotonic in h and every member collapses to a function of
    min(h)).  All minima are tracked in a single fold over the shingle
    array.  31-bit operands keep products < 2^62 so ANSI overflow
    checking never trips.

    NOTE: this expression form evaluates its lambdas interpreted (no
    codegen for higher-order functions) — fine for ad-hoc use on arrays
    already in hand; the bulk path is ``operators.dedup``'s explode +
    hash-aggregate formulation of the same family, which is ~30× faster.
    """
    params = _affine_params(num_hashes)
    prime = F.lit((1 << 31) - 1)
    base = F.transform(shingles, lambda s: F.xxhash64(s).bitwiseAND(F.lit(0x7FFFFFFF)))
    init = F.array(*[F.lit(1 << 62).cast("long") for _ in range(num_hashes)])
    return F.aggregate(
        base,
        init,
        lambda acc, h: F.array(
            *[
                F.least(acc[i], (h * F.lit(a) + F.lit(b)) % prime)
                for i, (a, b) in enumerate(params)
            ]
        ),
    )


def simhash_votes(tokens: Column) -> Column:
    """Per-bit SimHash votes of a token array: 64-slot int array where
    slot j is the sum over tokens of ±1 for bit j of the token's
    xxhash64.  A fold over the token array — pure codegen, no explode.
    (Bit positions are unrolled in Python: Spark's shift functions take
    literal shift amounts only.)"""

    def bits(t: Column) -> Column:
        h = F.xxhash64(t)
        return F.array(
            *[
                F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                    F.lit(-1)
                )
                for j in range(64)
            ]
        )

    return F.aggregate(
        tokens,
        F.array_repeat(F.lit(0), 64),
        lambda acc, t: F.zip_with(acc, bits(t), lambda a, b: a + b),
    )


def simhash_from_votes(votes: Column | str) -> Column:
    """Collapse a 64-slot vote array to the 64-bit SimHash long.

    Materialize the votes with ``withColumn`` first — this references
    the vote column 64 times, so inlining the full fold expression here
    would blow up the plan.
    """
    v = F.col(votes) if isinstance(votes, str) else votes
    sig = F.lit(0).cast("long")
    for j in range(64):
        sig = sig.bitwiseOR(
            F.when(v[j] > 0, F.lit(1 << j if j < 63 else -(1 << 63)).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two 64-bit longs (popcount of XOR)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# URI scalar family (§2.G extension) — the URL-analytics scalars every
# crawl-derived corpus needs (scheme/host/port/path/param/TLD).  All
# patterns live in the Java-regex ∩ RE2 common syntax so the DuckDB
# oracle applies literally the same rules (see URI_PATTERNS); pure
# regexp_extract chains — scan-side codegen, no shuffle, no Python.
# ---------------------------------------------------------------------------

URI_PATTERNS = {
    "scheme": r"^([A-Za-z][A-Za-z0-9+.\-]*)://",
    "authority": r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)",
    "host_of_authority": r"^(?:[^@]*@)?([^:]*)",
    "port_of_authority": r":([0-9]+)$",
    "path": r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)",
    "tld_of_host": r"\.([A-Za-z0-9\-]+)$",
}


def uri_scheme(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, URI_PATTERNS["scheme"], 1)


def uri_authority(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, URI_PATTERNS["authority"], 1)


def uri_host(col: Column | str) -> Column:
    return F.regexp_extract(uri_authority(col), URI_PATTERNS["host_of_authority"], 1)


def uri_port(col: Column | str) -> Column:
    """Explicit port as int, NULL when absent (ANSI-safe: the empty
    no-match string is nulled before the cast)."""
    p = F.regexp_extract(uri_authority(col), URI_PATTERNS["port_of_authority"], 1)
    return F.nullif(p, F.lit("")).cast("int")


def uri_path(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, URI_PATTERNS["path"], 1)


def uri_query_param(col: Column | str, name: str) -> Column:
    """Value of query parameter ``name`` (first occurrence), NULL when
    absent.  ``name`` must be a plain identifier (it is spliced into
    the pattern)."""
    c = F.col(col) if isinstance(col, str) else col
    v = F.regexp_extract(c, rf"[?&]{name}=([^&#]*)", 1)
    return F.nullif(v, F.lit(""))


def uri_tld(col: Column | str) -> Column:
    return F.nullif(
        F.regexp_extract(uri_host(col), URI_PATTERNS["tld_of_host"], 1), F.lit("")
    )


def uri_path_depth(col: Column | str) -> Column:
    """Number of path segments: count of '/' in the path (the fixture
    convention: no trailing slash double-counting — '' depth 0)."""
    p = uri_path(col)
    return (F.length(p) - F.length(F.regexp_replace(p, "/", ""))).cast("long")
