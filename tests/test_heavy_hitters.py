"""Misra-Gries exact heavy hitters (operators/text.py:heavy_hitter_tokens).

The two-pass sketch-then-verify plan must return EXACTLY the naive
GROUP-BY answer — the sketch prunes candidates, it never answers.  These
tests force the MG reduction path with tiny counter budgets and verify
exactness against the brute-force count on adversarial distributions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.operators.text import heavy_hitter_tokens


def _naive(df, denom):
    toks = df.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    )
    total = toks.count()
    return {
        (r["tok"], r["n"])
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * denom > total)
        .collect()
    }


def _result_set(df):
    return {(r["tok"], r["n"]) for r in df.collect()}


def test_exact_vs_naive_skewed(spark):
    # One dominant token, a mid-frequency band, and a long unique tail
    # far wider than the counter budget — the MG prune MUST fire and the
    # answer must still be exact.
    rows = (
        [("hot " * 50,)] * 20  # 1000 occurrences of 'hot'
        + [(f"warm{i % 7} cold{i}",) for i in range(600)]  # tail of uniques
    )
    df = spark.createDataFrame(rows, "text string").repartition(4)
    out = heavy_hitter_tokens(df, threshold_denom=50, counters=64)
    assert _result_set(out) == _naive(df, 50)


def test_exact_vs_naive_uniform_no_hitters(spark):
    # All tokens unique: no heavy hitters; the verify pass must not
    # promote sketch survivors into answers.
    df = spark.createDataFrame(
        [(f"u{i} v{i} w{i}",) for i in range(400)], "text string"
    ).repartition(8)
    out = heavy_hitter_tokens(df, threshold_denom=100, counters=128)
    assert _result_set(out) == set() == _naive(df, 100)


def test_counts_and_ppm_are_exact(spark):
    df = spark.createDataFrame(
        [("a a a a b",)] * 10 + [("c d",)] * 5, "text string"
    ).repartition(3)
    out = {r["tok"]: r for r in heavy_hitter_tokens(
        df, threshold_denom=10, counters=16
    ).collect()}
    # 60 tokens total: a=40, b=10, c=5, d=5; threshold n*10 > 60 → n > 6.
    assert set(out) == {"a", "b"}
    assert out["a"]["n"] == 40 and out["b"]["n"] == 10
    assert out["a"]["total_tokens"] == 60
    assert out["a"]["freq_ppm"] == 40 * 1_000_000 // 60
    assert out["b"]["freq_ppm"] == 10 * 1_000_000 // 60


def test_counter_budget_guard():
    with pytest.raises(ValueError, match="candidate superset"):
        heavy_hitter_tokens(None, threshold_denom=1000, counters=64)
