"""Round-5 late-batch operators: ORC roundtrip (b19), sparse TF-IDF
cosine pairs (j3l), rolling z-score anomalies (e15), bitwise aggregates
(g9), interval coalescing (k5).  Each also carries an exact DuckDB
oracle in plans/ — these tests pin the semantic contracts the oracle
comparison can't see (planted shapes, caps, plan properties).
"""

from __future__ import annotations

import datetime

import pyspark.sql.types as T
from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.operators.text import tfidf_cosine_pairs
from realtime_cdc_pipeline_docker_spark.sources.corpus import read_orc, write_orc


def test_orc_roundtrip_exact(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    rows = [
        (1, 'quotes " and \\ backslash and \n newline', "en", 33),
        (2, "unicode: café 中文 🙂", "zh", 10),
        (3, None, None, None),  # NULLs round-trip as NULLs
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path, schema)
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_orc_read_pushes_filters_to_scan(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("lang", T.StringType())]
    )
    df = spark.createDataFrame([(i, "en" if i % 2 else "de") for i in range(100)], schema)
    path = str(tmp_path / "orc")
    write_orc(df, path)
    plan = (
        read_orc(spark, path, schema)
        .filter(F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "EqualTo(lang,en)" in plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tfidf_planted_neardup_pair_scores_highest(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon theta"),  # near-copy of 1
        (3, "omega psi chi phi upsilon tau"),
        (4, "alpha omega unrelated words entirely different"),
    ]
    out = tfidf_cosine_pairs(
        _docs(spark, rows), min_df=2, max_df_frac=1.0, min_cos_ppm=0
    ).collect()
    best = max(out, key=lambda r: r["cos_ppm"])
    assert (best["doc_a"], best["doc_b"]) == (1, 2)
    # identical-pair ceiling: cosine of a doc with itself is exactly 1
    dup = tfidf_cosine_pairs(
        _docs(spark, [(1, "x y z"), (2, "x y z")]), min_df=2, max_df_frac=1.0, min_cos_ppm=0
    ).collect()
    assert len(dup) == 1 and dup[0]["cos_ppm"] == 1_000_000


def test_tfidf_relative_band_blocks_stopword_fanout(spark):
    # 'the' appears in every doc (df=4 > floor(0.75*4)=3) -> generates
    # NO candidate pairs; docs sharing only banded-out tokens never
    # pair.  The band is RELATIVE, so the same corpus replicated keeps
    # the same discrimination (see scripts/scale_probe.py "tfidf").
    rows = [
        (1, "the aardvark"),
        (2, "the bobcat"),
        (3, "the caiman"),
        (4, "the dingo"),
    ]
    out = tfidf_cosine_pairs(
        _docs(spark, rows), min_df=2, max_df_frac=0.75, min_cos_ppm=0
    ).collect()
    assert out == []


def test_tfidf_bucket_cap_skips_are_observable(spark):
    from realtime_cdc_pipeline_docker_spark.operators.text import (
        oversized_token_buckets,
    )

    # 'dup' is in-band (df=3 of 6 docs = 0.5) but its bucket exceeds
    # the cap of 2 -> skipped, observable; with the default cap the
    # pairs exist and the skip report is empty.
    rows = [(i, "dup filler%d" % i) for i in range(3)] + [
        (10 + i, "solo%d other%d" % (i, i)) for i in range(3)
    ]
    kw = dict(min_df=2, max_df_frac=0.5, min_cos_ppm=0)
    assert tfidf_cosine_pairs(_docs(spark, rows), **kw).count() == 3  # C(3,2)
    assert oversized_token_buckets(_docs(spark, rows), **{k: v for k, v in kw.items() if k != "min_cos_ppm"}).count() == 0
    capped = tfidf_cosine_pairs(_docs(spark, rows), max_bucket_size=2, **kw)
    assert capped.count() == 0
    over = oversized_token_buckets(
        _docs(spark, rows), max_bucket_size=2, min_df=2, max_df_frac=0.5
    )
    assert [tuple(r) for r in over.collect()] == [("dup", 3)]


def _events(spark, rows):
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _zscore(df):
    """The e15 predicate, parameterized over any events-shaped frame."""
    from pyspark.sql import Window

    from realtime_cdc_pipeline_docker_spark.functions import fixed_units

    ev = df.select("event_id", "user_id", "ts", fixed_units("value", 4).alias("v_u"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-20, -1)
    s = ev.select(
        "event_id",
        "v_u",
        F.count("v_u").over(w).alias("n"),
        F.coalesce(F.sum("v_u").over(w), F.lit(0)).cast("long").alias("s1"),
        F.coalesce(F.sum(F.col("v_u") * F.col("v_u")).over(w), F.lit(0))
        .cast("long")
        .alias("s2"),
    )
    n, v, s1, s2 = F.col("n"), F.col("v_u"), F.col("s1"), F.col("s2")
    dev = n * v - s1
    return s.filter(
        (n >= 8) & (dev * dev * (n - 1) > F.lit(9) * n * (n * s2 - s1 * s1))
    )


def test_zscore_flags_planted_spike_only(spark):
    t0 = datetime.datetime(2024, 1, 1)
    # gentle noise via a deterministic +/- pattern, then one huge spike
    rows = [
        (i, 7, t0 + datetime.timedelta(minutes=i), 100.0 + (1.0 if i % 2 else -1.0))
        for i in range(20)
    ] + [(99, 7, t0 + datetime.timedelta(minutes=30), 500.0)]
    got = _zscore(_events(spark, rows)).select("event_id").collect()
    assert [r["event_id"] for r in got] == [99]


def test_zscore_constant_series_never_flags(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i, 1, t0 + datetime.timedelta(minutes=i), 42.0) for i in range(30)]
    assert _zscore(_events(spark, rows)).count() == 0


def test_bitxor_reconciles_equal_multisets(spark):
    # the g9 use case: two replicas of a keyset XOR to the same digest,
    # and a single missing key flips it.
    a = spark.range(0, 1000).select(F.col("id"))
    b = spark.range(0, 1000).select(F.col("id"))
    xa = a.agg(F.expr("bit_xor(id)").alias("x")).collect()[0]["x"]
    xb = b.agg(F.expr("bit_xor(id)").alias("x")).collect()[0]["x"]
    assert xa == xb
    xc = (
        spark.range(0, 999)
        .agg(F.expr("bit_xor(id)").alias("x"))
        .collect()[0]["x"]
    )
    assert xc != xa


def test_interval_coalesce_swallow_and_chain(spark):
    """k5 semantics on crafted shapes: a chain of overlapping windows is
    ONE island; a long interval swallows later short ones (the case
    lag(end) gets wrong); disjoint windows split."""
    from realtime_cdc_pipeline_docker_spark.plans.registry import REGISTRY

    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, uid, minutes):
        return (eid, t0 + datetime.timedelta(minutes=minutes), uid, "error", 1.0, "{}")

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    rows = [
        # user 1: chain 0-60, 30-90, 80-140 -> one island of 3
        ev(1, 1, 0), ev(2, 1, 30), ev(3, 1, 80),
        # user 1: disjoint at 300 -> second island
        ev(4, 1, 300),
        # user 2: long-first swallow — 0-60 covers 10-70? no: both 1h
        # windows; 0-60 then 50-110 then a gap, then 200-260
        ev(5, 2, 0), ev(6, 2, 50), ev(7, 2, 200),
    ]
    df = spark.createDataFrame(rows, schema)
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = REGISTRY["k5_interval_coalesce"].fn(spark, d).collect()
    got = {
        (r["user_id"], r["island"]): (r["n_incidents"], r["island_start"], r["island_end"])
        for r in out
    }
    assert got[(1, 0)] == (3, t0, t0 + datetime.timedelta(minutes=140))
    assert got[(1, 1)][0] == 1
    assert got[(2, 0)][0] == 2 and got[(2, 1)][0] == 1
    assert len(got) == 4


def test_char_entropy_uniform_ceiling_and_constant_floor(spark):
    import math

    from realtime_cdc_pipeline_docker_spark.operators.text import char_entropy

    docs = spark.createDataFrame(
        [
            (1, "abcd" * 25),      # uniform over 4 symbols -> exactly ln(4)
            (2, "aaaaaaaaaa"),     # single symbol -> exactly 0
            (3, "!!! ??? ..."),    # no [a-z0-9] at all -> no row
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    q_ln4 = math.floor(10_000 * math.log(4) + 0.5)
    assert got[1]["n_alnum"] == 100
    assert got[1]["ent_fp_total"] == q_ln4 * 100
    assert got[1]["mean_ent_fp"] == q_ln4  # ~13863 micro-nats = ln 4
    assert got[2]["ent_fp_total"] == 0 and got[2]["mean_ent_fp"] == 0
    assert 3 not in got


def test_bigram_pmi_collocation_beats_independent_pair(spark):
    from realtime_cdc_pipeline_docker_spark.operators.text import bigram_pmi

    # 'hong kong' always co-occurs; filler words are frequent and
    # independent.  Both clear the min-count bar.
    rows = [(i, "hong kong visit " + ("the of " * 10)) for i in range(10)]
    out = bigram_pmi(spark.createDataFrame(rows, ["doc_id", "text"]), min_count=5)
    by_pair = {(r["w1"], r["w2"]): r["pmi_fp"] for r in out.collect()}
    assert by_pair[("hong", "kong")] > by_pair[("the", "of")]
    # perfect collocation: p(ab)=c/N_bi, p(a)=p(b)=c/N_uni -> pmi > 0;
    # 'of the' (independent, high-frequency) sits near/below 0
    assert by_pair[("hong", "kong")] > 0


def test_try_arithmetic_overflow_family_nulls_not_aborts(spark):
    """The g10 overflow cases DuckDB 1.0 cannot twin (no TRY() wrapper,
    raises on BIGINT overflow): Spark's try_add/try_multiply must
    return NULL, never abort, alongside the oracle-covered cases."""
    row = (
        spark.range(1)
        .select(
            F.try_add(F.lit(9223372036854775807), F.lit(1)).alias("ov_add"),
            F.try_multiply(F.lit(2**62), F.lit(4)).alias("ov_mul"),
            F.try_divide(F.lit(1), F.lit(0)).alias("div0"),
            F.expr("try_cast('not a number' AS INT)").alias("bad_cast"),
            F.try_add(F.lit(40), F.lit(2)).alias("fine"),
        )
        .collect()[0]
    )
    assert row["ov_add"] is None
    assert row["ov_mul"] is None
    assert row["div0"] is None
    assert row["bad_cast"] is None
    assert row["fine"] == 42


def test_builtin_corr_agrees_with_integer_exact_formulation(spark):
    """c26 derives Pearson r from exact integer power sums; the
    built-in corr (co-moment recurrence, order-dependent ulps) must
    agree to ~1e-12 — pinning that the exact formulation computes the
    same statistic, just deterministically."""
    import math

    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.plans.registry import REGISTRY

    sf = "/root/testdata/sf0.001"
    got = REGISTRY["c26_corr_regression"].fn(spark, sf).collect()[0]
    li = load_table(spark, sf, "lineitem").select(
        (F.round(F.col("l_extendedprice") * 100, 0)).alias("x"),
        (F.round(F.col("l_quantity"), 0)).alias("y"),
    )
    builtin = li.agg(F.corr("x", "y").alias("r")).collect()[0]["r"]
    assert math.isclose(got["corr_ppm"] / 1e6, builtin, abs_tol=1e-6)


def _bpe_model(texts, n_merges, min_count=2):
    """Independent pure-Python BPE: adjacent pair counts, argmax with
    (count desc, lexicographic) tiebreak, greedy left-to-right
    non-overlapping apply."""
    corpora = [t.lower().split() for t in texts]
    merges = []
    for it in range(n_merges):
        counts = {}
        for toks in corpora:
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((it, a, b, n))
        j = f"{a} {b}"
        new = []
        for toks in corpora:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(j)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new.append(out)
        corpora = new
    return merges


def test_bpe_train_matches_python_model(spark):
    from realtime_cdc_pipeline_docker_spark.operators.text import bpe_train

    texts = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a cat and the cat sat",
        "aaa aaa aaa aaa",  # self-pair: greedy non-overlap semantics
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    assert bpe_train(df, n_merges=6) == _bpe_model(texts, 6)


def test_bpe_train_stops_below_min_count(spark):
    from realtime_cdc_pipeline_docker_spark.operators.text import bpe_train

    df = spark.createDataFrame(
        [(1, "x y"), (2, "p q"), (3, "r s")], ["doc_id", "text"]
    )
    # every pair occurs once < min_count=2 -> zero merges
    assert bpe_train(df, n_merges=3) == []


def test_bpe_round_plan_matches_first_merge(spark):
    """bpe_round_plan is the audit companion for j9h (VERDICT r7 #2):
    it must stay structurally identical to bpe_train's loop body, so
    its argmax row equals round 0's promoted merge — and its plan is
    NOT checkpoint-truncated (that's its entire purpose)."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "scripts"))
    from plan_audit import formatted_plan

    from realtime_cdc_pipeline_docker_spark.operators.text import (
        bpe_round_plan,
        bpe_train,
    )

    texts = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a cat and the cat sat",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    top = bpe_round_plan(df).collect()[0]
    first = bpe_train(df, n_merges=1)[0]
    assert (first[1], first[2], first[3]) == (top["left"], top["right"], top["n"])
    # the round plan keeps the full reduction visible to explain —
    # unlike bpe_train's checkpoint-truncated per-round state.
    assert "HashAggregate" in formatted_plan(bpe_round_plan(df))


def test_apply_merge_disjoint_equals_fold(spark):
    """_apply_merge_disjoint (vectorized, left != right) must be
    byte-identical to the sequential greedy fold on adversarial
    shapes: chained occurrences (l r l r), l-runs before r, candidates
    at array edges, and tokens equal to the joined symbol."""
    from pyspark.sql import functions as F

    from realtime_cdc_pipeline_docker_spark.operators.text import (
        _apply_merge,
        _apply_merge_disjoint,
    )

    cases = [
        "a b a b a b",
        "a a a b b b a b",
        "b a b a b a",
        "a b",
        "b a",
        "a",
        "x y z",
        "a b x a b a a b b",
        "a b a b a b a b a b a b",
    ]
    df = spark.createDataFrame(
        [(i, t.split(" ")) for i, t in enumerate(cases)], ["i", "t"]
    )
    out = df.select(
        "i",
        _apply_merge(F.col("t"), "a", "b", "a b").alias("fold"),
        _apply_merge_disjoint(F.col("t"), "a", "b", "a b").alias("vec"),
    ).collect()
    for r in out:
        assert r["fold"] == r["vec"], (r["i"], r["fold"], r["vec"])
