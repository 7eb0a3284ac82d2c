"""Hand-verified edge cases for the late round-5 operators — inputs the
documents/events fixtures don't necessarily contain (empty text,
bullet-only docs, single-window VAD islands, partial EWMA windows).
The oracle-parity tests cover the fixture distribution; these pin the
boundary semantics explicitly.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_gopher_signals_hand_cases(spark):
    from realtime_cdc_pipeline_docker_spark.operators.text import gopher_signals

    rows = [
        (1, "plain words only here"),                   # 4 words, no lines
        (2, "- a\n- b\n- c"),                           # all bullet lines
        (3, "ends with dots...\nmore..."),              # ellipsis lines
        (4, "## ## ##"),                                # symbol-heavy
        (5, " x "),                                     # whitespace edges
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = gopher_signals("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[c.alias(n) for n, c in sig.items()]
        ).collect()
    }
    r1 = out[1]
    assert (r1["n_words"], r1["n_lines"], r1["bullet_lines"]) == (4, 1, 0)
    assert not r1["r_word_count"]  # 4 < 50
    r2 = out[2]
    assert (r2["n_lines"], r2["bullet_lines"]) == (3, 3)
    assert not r2["r_bullet_ratio"]  # 3*10 > 3*9
    r3 = out[3]
    assert r3["ellipsis_lines"] == 2 and not r3["r_ellipsis_ratio"]
    # '...' also counts toward symbol chars: 2 occurrences
    assert r3["sym_chars"] == 2
    r4 = out[4]
    assert r4["sym_chars"] == 6 and not r4["r_symbol_ratio"]
    assert r4["alpha_words"] == 0 and not r4["r_alpha_ratio"]
    r5 = out[5]
    assert (r5["n_words"], r5["word_chars"]) == (1, 1)


def test_vad_segments_islands_and_silence(spark):
    from realtime_cdc_pipeline_docker_spark.operators.multimodal import vad_segments

    # windows: (doc, win_no, win_start, win_len, energy); threshold 96/byte
    rows = [
        # doc 1: active runs [0,1] and [3] — two segments
        (1, 0, 0, 16, 16 * 100),
        (1, 1, 16, 16, 16 * 100),
        (1, 2, 32, 16, 16 * 10),
        (1, 3, 48, 8, 8 * 100),
        # doc 2: all silent — no output rows
        (2, 0, 0, 16, 0),
        (2, 1, 16, 16, 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, win_no int, win_start long, win_len long, energy long"
    )
    out = sorted(
        map(tuple, vad_segments(df).select(
            "doc_id", "seg_start", "seg_end", "n_windows", "total_energy"
        ).collect())
    )
    assert out == [
        (1, 0, 32, 2, 3200),
        (1, 48, 56, 1, 800),
    ]


def test_ewma_partial_window_renormalizes(spark, sf_dir):
    """First event of a user: denom == 128 exactly; ewma == value."""
    from realtime_cdc_pipeline_docker_spark import plans

    out = plans.REGISTRY["e17_ewma_smoothing"].fn(spark, sf_dir)
    w = (
        out.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy("ts", "event_id")
            ),
        )
        .filter("rn = 1")
        .filter("denom <> 128")
        .count()
    )
    assert w == 0


def test_temperature_mixture_budgets_sum_and_compress(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark import plans

    out = plans.REGISTRY["j6m_temperature_mixture"].fn(spark, sf_dir)
    budgets = {
        r["lang"]: r["lang_budget"]
        for r in out.select("lang", "lang_budget").distinct().collect()
    }
    # integer split: total ≤ 50000, within |langs| of it
    assert 50000 - len(budgets) <= sum(budgets.values()) <= 50000
    # per-language fill: cum_tok stays under the budget (acceptance rule)
    assert out.filter("cum_tok >= lang_budget").count() == 0


def test_linear_classifier_score_is_sum_of_token_weights(spark):
    """Exercises the REAL query body (operators/text.py:
    hashed_linear_score — the same expression j4n registers) against a
    hand-computed python sum."""
    import hashlib

    from realtime_cdc_pipeline_docker_spark.operators.text import (
        hashed_linear_score,
    )

    def weight(tok: str) -> int:
        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 4096
        return b % 7 - 3

    text = "The quick brown fox JUMPED over the lazy dog"
    expected = sum(weight(t.lower()) for t in text.split())
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_feats, score = hashed_linear_score("text")
    row = df.select(n_feats.alias("n"), score.alias("s")).collect()[0]
    assert (row["n"], row["s"]) == (9, expected)


def test_rolling_active_users_window_edges(spark):
    """A user active on day D contributes to D..D+6 only, and only data
    days appear — exercising the REAL query body
    (events_queries.rolling_active_users, which e19 registers)."""
    import datetime as dt

    from realtime_cdc_pipeline_docker_spark.plans.events_queries import (
        rolling_active_users,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 10)),
        (1, dt.datetime(2024, 1, 10, 10)),  # gap > 7 days: never overlaps
        (2, dt.datetime(2024, 1, 5, 10)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        str(r["target_day"]): r["mau7"]
        for r in rolling_active_users(ev).collect()
    }
    # day 5: user1 (active Jan 1, within 7) + user2 = 2
    # day 10: user1 (Jan 10) + user2 (Jan 5, still within 7) = 2;
    # user1's Jan-1 activity expired (> 6 days old) and is not
    # double-counted with their Jan-10 one
    assert out == {"2024-01-01": 1, "2024-01-05": 2, "2024-01-10": 2}


def test_c27_window_percentiles_equal_builtin_percentile_disc(spark, sf_dir):
    """The cume_dist/min formulation c27 ships IS percentile_disc: the
    built-in WITHIN GROUP aggregate returns identical values (the
    query avoids the built-in only because its state buffers every
    group value — see the c27 docstring)."""
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.functions import fixed_units
    from realtime_cdc_pipeline_docker_spark import plans

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        fixed_units("l_extendedprice").alias("price_c2"),
    )
    builtin = {
        r["rf"]: (r["p25"], r["p50"], r["p75"], r["p90"])
        for r in li.groupBy("rf")
        .agg(
            *[
                F.expr(
                    f"CAST(percentile_disc({p}) WITHIN GROUP"
                    f" (ORDER BY price_c2) AS BIGINT)"
                ).alias(f"p{int(p * 100)}")
                for p in (0.25, 0.5, 0.75, 0.9)
            ]
        )
        .collect()
    }
    ours = {
        r["rf"]: (r["p25_c2"], r["p50_c2"], r["p75_c2"], r["p90_c2"])
        for r in plans.REGISTRY["c27_exact_quantiles_mode"].fn(spark, sf_dir).collect()
    }
    assert builtin == ours
