"""Planted-duplicate tests for the dedup operator family (SURVEY §2.J1/J2).

Oracle-style SQL can't express LSH candidate generation, so these tests
verify the semantics directly: plant known exact/near/unrelated document
groups, assert every planted pair is found and no unrelated pair is.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE_A = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the old oak tree "
    "as morning light spreads across the quiet garden"
)
BASE_B = (
    "stock prices rallied sharply on tuesday as investors weighed fresh "
    "inflation data against central bank guidance and corporate earnings "
    "that broadly exceeded consensus estimates for the third quarter"
)


def _docs(spark):
    rows = [
        (1, BASE_A),
        (2, BASE_A + " tonight"),            # near-dup of 1 (tiny suffix edit)
        (3, "  The Quick Brown Fox jumps over the lazy dog while the cat watches "
            "from the warm windowsill and the birds sing in the old oak tree "
            "as morning light spreads across the quiet garden  "),  # exact dup of 1 modulo case/ws
        (4, BASE_B),
        (5, BASE_B.replace("tuesday", "wednesday")),  # near-dup of 4
        (6, "completely different text about deep sea creatures and the "
            "bioluminescent organisms that inhabit the midnight zone far "
            "below the reach of sunlight in the open ocean"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_dedup_exact_collapses_normalized(spark):
    out = dedup_exact(_docs(spark)).orderBy("doc_id").collect()
    # 1 and 3 are the same normalized text -> keeper id 1, dup_count 2
    by_id = {r["doc_id"]: r["dup_count"] for r in out}
    assert by_id[1] == 2
    assert 3 not in by_id
    assert by_id[2] == 1 and by_id[4] == 1


def test_minhash_finds_planted_neardups(spark):
    got = _pairs(minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.5))
    assert (1, 2) in got and (4, 5) in got  # planted near-dups
    assert (1, 3) in got                     # exact dup is jaccard 1
    assert not any(6 in p for p in got)      # unrelated doc pairs with nothing
    assert not any((a in (1, 2, 3)) and (b in (4, 5)) for a, b in got)


def test_minhash_jaccard_values_exact(spark):
    rows = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(_docs(spark)).collect()
    }
    assert rows[(1, 3)] == pytest.approx(1.0)      # identical normalized text
    assert 0.8 < rows[(1, 2)] < 1.0                # suffix edit: high but < 1


def test_simhash_finds_exact_and_near(spark):
    got = _pairs(simhash_pairs(_docs(spark), max_hamming=3))
    assert (1, 3) in got  # identical token multiset -> hamming 0
    assert not any(6 in p for p in got)


def test_ngram_jaccard_planted(spark):
    got = _pairs(ngram_jaccard_pairs(_docs(spark), jaccard_threshold=0.5))
    assert (1, 3) in got and (1, 2) in got and (4, 5) in got
    assert not any(6 in p for p in got)


def test_minhash_bucket_cap_drops_degenerate_megacluster(spark):
    """A 1000-doc identical-text cluster (web boilerplate shape) puts
    1000 docs in one bucket per band — quadratic candidates.  The cap
    must drop those buckets (bounding the join) while normal near-dup
    pairs outside the cluster are still found."""
    degenerate = [(100 + i, BASE_A) for i in range(1000)]
    normal = [(1, BASE_B), (2, BASE_B.replace("tuesday", "wednesday"))]
    docs = spark.createDataFrame(normal + degenerate, ["doc_id", "text"])
    pairs = _pairs(minhash_lsh_pairs(docs, max_bucket_size=100))
    assert (1, 2) in pairs
    assert not any(a >= 100 and b >= 100 for a, b in pairs)


def test_minhash_bucket_cap_inactive_on_sane_corpus(spark):
    """Default cap (1000) must not change results on non-degenerate data."""
    capped = _pairs(minhash_lsh_pairs(_docs(spark)))
    uncapped = _pairs(minhash_lsh_pairs(_docs(spark), max_bucket_size=None))
    assert capped == uncapped and len(capped) > 0


def test_simhash_bucket_cap_drops_degenerate_megacluster(spark):
    degenerate = [(100 + i, BASE_A) for i in range(500)]
    docs = spark.createDataFrame(degenerate, ["doc_id", "text"])
    assert simhash_pairs(docs, max_bucket_size=100).count() == 0
    assert simhash_pairs(docs, max_bucket_size=None).count() == 500 * 499 // 2


def test_ngram_stop_gram_cap_prevents_boilerplate_pairing(spark):
    """Docs similar ONLY through a shared boilerplate tail: every
    boilerplate gram has df=50, so with the cap the grams drop from the
    index, the join has no co-occurrences, and nothing pairs — the
    uncapped run pairs everything (the quadratic blowup the cap kills)."""
    boiler = (
        "all rights reserved contact the licensing department for terms "
        "and conditions of reuse redistribution or archival in any form"
    )
    rows = [(i, f"doc number {i} " + boiler) for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    assert ngram_jaccard_pairs(docs, max_gram_df=None).count() == 50 * 49 // 2
    assert ngram_jaccard_pairs(docs, max_gram_df=10).count() == 0


def test_minhash_on_fixture_is_symmetric_and_thresholded(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = minhash_lsh_pairs(docs).collect()
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert 0.5 <= r["jaccard"] <= 1.0


def test_connected_components_chains_and_islands(spark):
    from realtime_cdc_pipeline_docker_spark.operators.dedup import connected_components

    # chain 1-2-3-4-5-6 (diameter 5), pair {10,11}, singleton edge {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (20, 21)],
        ["id_a", "id_b"],
    )
    got = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_raises_when_not_converged(spark):
    """A chain with diameter > max_iters must RAISE, not silently emit
    labels that split one component into several keepers."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 15)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=2)
    # with enough rounds the same chain converges to one component
    got = {r["component"] for r in connected_components(chain, max_iters=20).collect()}
    assert got == {1}


def test_dedup_keepers_end_to_end(spark):
    from realtime_cdc_pipeline_docker_spark.operators.dedup import dedup_keepers

    docs = _docs(spark)
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    out = {r["doc_id"]: (r["keeper"], r["is_keeper"]) for r in
           dedup_keepers(docs, pairs).collect()}
    # component {1,2,3} keeps 1; {4,5} keeps 4; 6 keeps itself
    assert out[1] == (1, True) and out[2] == (1, False) and out[3] == (1, False)
    assert out[4] == (4, True) and out[5] == (4, False)
    assert out[6] == (6, True)
    # exactly one keeper per component
    keepers = {k for k, (kp, is_k) in out.items() if is_k}
    assert keepers == {1, 4, 6}


def test_winnowing_shared_region_shares_fingerprints(spark):
    from realtime_cdc_pipeline_docker_spark.operators.text import winnow_fingerprints

    shared = "this exact sentence appears verbatim in both documents"
    docs = spark.createDataFrame(
        [
            (1, "prefix one before. " + shared + " and then a unique tail here"),
            (2, "a totally different opening line. " + shared + " closing words"),
            (3, "nothing in common with the others at all whatsoever today"),
        ],
        ["doc_id", "text"],
    )
    fp = winnow_fingerprints(docs)
    a = {r["fingerprint"] for r in fp.filter("id = 1").collect()}
    b = {r["fingerprint"] for r in fp.filter("id = 2").collect()}
    c = {r["fingerprint"] for r in fp.filter("id = 3").collect()}
    # the guarantee: a shared region of length >= window+k-1 shares >=1 fingerprint
    assert len(a & b) >= 3
    # density: winnowing keeps far fewer than all k-gram hashes
    n_grams_1 = len(docs.filter("doc_id = 1").collect()[0]["text"]) - 4
    assert len(a) < n_grams_1 / 2
    # unrelated doc shares (near) nothing
    assert len(a & c) == 0 and len(b & c) == 0


def test_winnowing_is_deterministic(spark):
    from realtime_cdc_pipeline_docker_spark.operators.text import winnow_fingerprints

    docs = _docs(spark)
    a = sorted(map(tuple, winnow_fingerprints(docs).collect()))
    b = sorted(map(tuple, winnow_fingerprints(docs).collect()))
    assert a == b and len(a) > 0


def test_cc_rounds_bounded_on_10x_replicated_corpus(spark, sf_dir):
    """Scale probe (VERDICT r1 #5): replicate every fixture document 10x
    (9 extra copies at shifted ids) and run the full j2e pipeline shape —
    minhash pairs -> connected components.  Replicas form 10-cliques
    fused with the fixture's own near-dup chains; min-label propagation
    must still converge in <= 3 rounds (+1 round to observe quiescence),
    and every replica's keeper must be its origin's component min."""
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        connected_components,
        dedup_keepers,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs
    for r in range(1, 10):
        corpus = corpus.unionByName(
            docs.select(
                (F.col("doc_id") + 1_000_000 * r).alias("doc_id"), "text"
            )
        )
    pairs = minhash_lsh_pairs(corpus, jaccard_threshold=0.5)
    stats = {}
    comp = connected_components(pairs, stats=stats).persist()
    assert stats["rounds"] <= 4, stats
    # every replica is labeled, and with the same component as its origin
    n_replicated = comp.filter(F.col("id") >= 1_000_000).count()
    assert n_replicated == 9 * docs.count()
    origin = comp.filter(F.col("id") < 1_000_000).withColumnRenamed(
        "component", "origin_component"
    )
    mismatch = (
        comp.filter(F.col("id") >= 1_000_000)
        .withColumn("origin_id", F.col("id") % 1_000_000)
        .join(origin.withColumnRenamed("id", "origin_id"), "origin_id")
        .filter(F.col("component") != F.col("origin_component"))
        .count()
    )
    assert mismatch == 0
    # keeper decision on the replicated corpus: keepers are original ids
    keepers = dedup_keepers(corpus, pairs).filter("is_keeper")
    assert keepers.filter(F.col("keeper") >= 1_000_000).count() == 0
    comp.unpersist()


# ---------------------------------------------------------------------------
# decontaminate (benchmark n-gram decontamination)
# ---------------------------------------------------------------------------


def _decon_inputs(spark):
    corpus = spark.createDataFrame(
        [
            (1, BASE_A),                                   # contains bench gram
            (2, "  The QUICK   brown fox Jumps over the lazy cat entirely "
                "unrelated tail words here padding the document out"),  # case/ws-normalized overlap
            (3, BASE_B),                                   # clean
            (4, "alpha beta gamma delta"),                 # short corpus doc (3<4 toks<5)
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string"
    )
    return corpus, bench


def test_decontaminate_normalization_and_threshold(spark):
    from realtime_cdc_pipeline_docker_spark.operators.dedup import decontaminate

    corpus, bench = _decon_inputs(spark)
    got = {r["doc_id"]: r["n_contaminated_grams"]
           for r in decontaminate(corpus, bench, n=5).collect()}
    # bench text has 9 tokens -> 5 five-grams; doc 1 contains all of them,
    # doc 2 (case/whitespace differences normalized away) the first 4 —
    # its "cat" breaks the fifth gram "jumps over the lazy dog".
    assert got == {1: 5, 2: 4}
    # distinct counting: a doc repeating one bench gram twice counts it once
    rep = spark.createDataFrame(
        [(9, "the quick brown fox jumps xx the quick brown fox jumps")],
        "doc_id long, text string",
    )
    got = decontaminate(rep, bench, n=5).collect()
    assert [(r["doc_id"], r["n_contaminated_grams"]) for r in got] == [(9, 1)]
    # min_overlaps filters below-threshold docs
    got = {r["doc_id"] for r in decontaminate(corpus, bench, n=5, min_overlaps=5).collect()}
    assert got == {1}


def test_decontaminate_short_benchmark_docs(spark):
    from realtime_cdc_pipeline_docker_spark.operators.dedup import decontaminate

    corpus, _ = _decon_inputs(spark)
    bench = spark.createDataFrame(
        [
            ("beta gamma",),          # 2-gram: inside corpus doc 4
            ("quiet garden",),        # 2-gram: tail of doc 1
            ("zz yy xx",),            # 3-gram: nowhere
        ],
        "text string",
    )
    got = {r["doc_id"]: r["n_contaminated_grams"]
           for r in decontaminate(corpus, bench, n=5).collect()}
    assert got == {1: 1, 4: 1}
    # benchmark side never needs an id column (only text); corpus id col is configurable
    renamed = corpus.withColumnRenamed("doc_id", "docid")
    got = {r["docid"] for r in decontaminate(renamed, bench, n=5, id_col="docid").collect()}
    assert got == {1, 4}


def test_decontaminate_corpus_side_shuffle_free(spark):
    """The docstring's 100 TB claim, held by the plan: below the
    BroadcastHashJoin the corpus gram stream must have NO exchange
    (the round-2 advice caught a pre-join .distinct() shuffling every
    corpus gram).  In the top-down plan printout, nodes under the join
    print after it — assert no hashpartitioning exchange there."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import decontaminate

    corpus, bench = _decon_inputs(spark)
    plan = decontaminate(corpus, bench, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # Children print streamed-side first: the corpus subtree is the text
    # between the join and the build side's BroadcastExchange (the tiny
    # benchmark side legitimately distincts inside the broadcast).
    corpus_subtree = plan.split("BroadcastHashJoin", 1)[1].split("BroadcastExchange", 1)[0]
    assert "Exchange hashpartitioning" not in corpus_subtree, corpus_subtree


def test_contamination_report_planted_attribution(spark):
    from realtime_cdc_pipeline_docker_spark.operators.dedup import contamination_report

    shared = "alpha beta gamma delta epsilon"  # exactly one 5-gram
    corpus = spark.createDataFrame(
        [
            (1, f"{shared} and some unrelated tail here"),
            (2, f"prefix words {shared}"),
            (3, "completely different text with no overlap at all friend"),
            (100, shared),  # the bench doc itself, present in the corpus
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, shared)], "bench_id long, text string")
    rows = contamination_report(corpus, bench).collect()
    assert len(rows) == 1
    r = rows[0]
    # Docs 1 and 2 share the gram; doc 100 (self) is excluded; doc 3 clean.
    assert (r["bench_id"], r["n_contaminated_docs"], r["n_shared_grams"]) == (100, 2, 1)


def test_contamination_report_corpus_subtree_shuffle_free(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.dedup import contamination_report

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    plan = (
        contamination_report(docs, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Broadcast join on the gram key; the only exchange is the final
    # groupBy on bench_id over contaminated evidence.
    assert "BroadcastHashJoin" in plan
    join_pos = plan.index("BroadcastHashJoin")
    corpus_subtree = plan[join_pos:].split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in corpus_subtree


def test_fuzzy_neardup_catches_all_edit1_kinds(spark):
    from realtime_cdc_pipeline_docker_spark.operators.dedup import fuzzy_neardup_pairs

    rows = [
        (1, "warehouse"),
        (2, "warehouze"),   # substitution
        (3, "warehouses"),  # insertion
        (4, "warehous"),    # deletion
        (5, "warehoze"),    # distance 2 from 1 — must NOT pair with 1
        (6, "completely different"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_neardup_pairs(df, "name", "id").collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (1, 4) in pairs
    assert (1, 5) not in pairs
    assert not any(6 in p for p in pairs)
    # (2,4): warehouze vs warehous = distance 2 -> absent; (4,5) dist 2 absent
    assert (2, 4) not in pairs


def test_fuzzy_neardup_bucket_cap_is_observable(spark):
    from realtime_cdc_pipeline_docker_spark.operators.dedup import fuzzy_neardup_pairs

    # Ten identical strings: every variant bucket has size 10; with a
    # cap below that, pairing is skipped entirely (explicit filter, not
    # silent truncation of some pairs).
    df = spark.createDataFrame([(i, "same") for i in range(10)], "id long, name string")
    assert fuzzy_neardup_pairs(df, "name", "id").count() == 45
    assert fuzzy_neardup_pairs(df, "name", "id", max_bucket_size=5).count() == 0


def test_fuzzy_neardup_skipped_buckets_are_reported(spark, sf_dir):
    """ADVICE r4: exactness is conditional on the cap — the companion
    report names every skipped bucket, and an empty report certifies
    the pair run was the full distance-<=1 set."""
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        oversized_variant_buckets,
    )

    # Degenerate fixture: the capped run above skipped ALL pairs, and
    # the report says exactly which buckets ("same" + its 4 deletion
    # variants, 10 members each) were responsible.
    df = spark.createDataFrame([(i, "same") for i in range(10)], "id long, name string")
    dropped = oversized_variant_buckets(df, "name", "id", max_bucket_size=5).collect()
    assert {r["v"] for r in dropped} == {"same", "ame", "sme", "sae", "sam"}
    assert all(r["n_members"] == 10 for r in dropped)
    # The j2g fixture (customer names at default cap): empty report ->
    # the full value-parity oracle in plans/text_queries.py is sound.
    cust = load_table(spark, sf_dir, "customer")
    assert oversized_variant_buckets(cust, "c_name", "c_custkey").count() == 0


def test_pair_set_eval_counts_and_ppm(spark):
    from realtime_cdc_pipeline_docker_spark.operators.dedup import pair_set_eval

    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 8)], "id_a long, id_b long"
    )
    pred = spark.createDataFrame(
        # two hits (one duplicated — must dedup), one miss, one FP
        [(1, 2), (1, 2), (3, 4), (9, 10)], "id_a long, id_b long"
    )
    row = pair_set_eval(truth, pred).collect()[0]
    assert (row["n_true"], row["n_pred"], row["n_hit"]) == (4, 3, 2)
    assert row["precision_ppm"] == 666667  # round(2/3 * 1e6)
    assert row["recall_ppm"] == 500000


def test_j2h_planted_twin_recall_is_total(spark, sf_dir):
    """The registered eval harness recovers EVERY planted twin pair at
    fixture scale (recall_ppm = 1e6) — the deterministic bar a config
    change must clear."""
    from realtime_cdc_pipeline_docker_spark import plans

    row = plans.REGISTRY["j2h_dedup_eval_pr"].fn(spark, sf_dir).collect()[0]
    assert row["recall_ppm"] == 1_000_000
    assert row["n_hit"] == row["n_true"] > 0
    assert row["precision_ppm"] >= 800_000  # organic near-dups stay bounded


def test_chunk_level_dedup_shared_passage_and_insertion_invariance(spark):
    """The content-defined property: a passage shared by two globally
    different documents produces a chunk with n_docs = 2, and
    PREPENDING text to a document leaves every chunk after the first
    boundary intact (fixed-size chunking would shift them all)."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import chunk_level_dedup

    passage = (
        "the quarterly revenue figures exceeded expectations across all "
        "regions with particularly strong growth in the commercial segment "
        "driven by renewed enterprise demand and favorable currency moves"
    )
    rows = [
        (1, "intro about weather patterns " + passage + " closing remarks here"),
        (2, "totally different opening sentence material " + passage),
        (3, "unrelated document about maritime navigation and tides"),
    ]
    out = chunk_level_dedup(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    shared = out.filter("n_docs >= 2").collect()
    assert shared, "shared passage produced no cross-doc chunk"
    assert any(r["n_occurrences"] >= 2 for r in shared)

    # insertion invariance: doc 1 vs doc 1 with a prepended paragraph
    # share most chunk digests (all after the first boundary).
    base = chunk_level_dedup(
        spark.createDataFrame([rows[0]], "doc_id long, text string")
    ).select("chunk_digest").collect()
    shifted = chunk_level_dedup(
        spark.createDataFrame(
            [(9, "a freshly inserted preamble paragraph goes here now " + rows[0][1])],
            "doc_id long, text string",
        )
    ).select("chunk_digest").collect()
    b = {r[0] for r in base}
    s = {r[0] for r in shifted}
    assert len(b & s) >= len(b) - 2  # only the chunk spanning the head changes


def test_lsh_band_sweep_monotone_and_finds_twins(spark, sf_dir):
    """More, shorter bands loosen the S-curve: candidates and verified
    counts are monotone non-decreasing in the band count; a planted
    near-identical twin is verified at EVERY layout (its Jaccard ~1
    collides in some band with probability ~1 at all three)."""
    from pyspark.sql import functions as F

    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.dedup import lsh_band_sweep

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    n_twins = twins.count()
    corpus = docs.unionByName(twins)
    rows = {
        r["bands"]: r
        for r in lsh_band_sweep(corpus, band_options=(4, 8, 16)).collect()
    }
    assert set(rows) == {4, 8, 16}
    for b, r in rows.items():
        assert r["rows_per_band"] == 32 // b
        # every layout must at least recover the planted twins
        assert r["n_verified"] >= n_twins
        assert 0 <= r["precision_ppm"] <= 1_000_000
        # no bucket hits the cap on this fixture — the precondition for
        # the superset/monotonicity guarantee below (a capped bucket at
        # a finer layout may drop pairs that survived at a coarser one)
        assert r["oversized_buckets"] == 0
    assert rows[4]["n_candidates"] <= rows[8]["n_candidates"] <= rows[16]["n_candidates"]
    assert rows[4]["n_verified"] <= rows[8]["n_verified"] <= rows[16]["n_verified"]


def test_lsh_band_sweep_oversized_buckets_observable(spark):
    """On a degenerate corpus (many identical docs → one dense bucket),
    the per-layout oversized_buckets column reports the capped buckets
    instead of silently breaking the superset claim."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import lsh_band_sweep

    corpus = spark.createDataFrame(
        [(i, "the same exact degenerate document text repeated verbatim")
         for i in range(40)]
        + [(100 + i, f"unique filler document number {i} with its own words")
           for i in range(5)],
        "doc_id long, text string",
    )
    rows = {
        r["bands"]: r
        for r in lsh_band_sweep(
            corpus, band_options=(4, 16), max_bucket_size=10
        ).collect()
    }
    # every band of the 40-clone group exceeds the cap of 10
    assert rows[4]["oversized_buckets"] >= 4
    assert rows[16]["oversized_buckets"] >= 16
    # and with no cap, the column is 0 and the clones all verify
    unc = {
        r["bands"]: r
        for r in lsh_band_sweep(
            corpus, band_options=(4, 16), max_bucket_size=None
        ).collect()
    }
    assert unc[4]["oversized_buckets"] == 0
    assert unc[4]["n_verified"] >= 40 * 39 // 2


def test_lsh_band_sweep_sample_contract(spark, sf_dir):
    """VERDICT r9 #4: the sweep's corpus-sample contract is executable
    — sample_fraction keeps a deterministic salted-hash subset,
    max_docs hard-caps the swept set, and every output row carries the
    sampled_docs witness column."""
    from pyspark.sql import functions as F

    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.dedup import lsh_band_sweep

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    # full-corpus opt-out is explicit and reports every doc
    full = lsh_band_sweep(
        docs, band_options=(8,), sample_fraction=1.0, max_docs=None
    ).collect()[0]
    assert full["sampled_docs"] == n_docs

    # fractional sample: deterministic (two runs identical), a strict
    # subset of the corpus, and roughly the requested fraction
    a = lsh_band_sweep(docs, band_options=(8,), sample_fraction=0.4).collect()[0]
    b = lsh_band_sweep(docs, band_options=(8,), sample_fraction=0.4).collect()[0]
    assert a["sampled_docs"] == b["sampled_docs"]
    assert 0 < a["sampled_docs"] < n_docs
    assert abs(a["sampled_docs"] / n_docs - 0.4) < 0.15
    assert (a["n_candidates"], a["n_verified"]) == (
        b["n_candidates"],
        b["n_verified"],
    )

    # the hard cap binds regardless of fraction, and is itself
    # deterministic (smallest salted id-hash)
    capped = lsh_band_sweep(
        docs, band_options=(8,), sample_fraction=1.0, max_docs=100
    ).collect()[0]
    assert capped["sampled_docs"] == 100

    # bad fractions fail fast
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lsh_band_sweep(docs, sample_fraction=0.0)
    with _pytest.raises(ValueError):
        lsh_band_sweep(docs, sample_fraction=1.5)


def test_minhash_pairs_unchanged_by_fingerprint_refactor(spark, sf_dir):
    """The minhash_fingerprints/_band_candidates factoring is pure code
    motion: the operator's pair set on the fixture is identical to the
    j2 oracle expectations (spot-pin: deterministic pair count and a
    planted twin)."""
    from pyspark.sql import functions as F

    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = docs.orderBy("doc_id").limit(1).collect()[0]
    twin = spark.createDataFrame(
        [(777_777, src["text"])], "doc_id long, text string"
    )
    pairs = minhash_lsh_pairs(docs.unionByName(twin))
    exact = pairs.filter(
        (F.col("id_a") == src["doc_id"]) & (F.col("id_b") == 777_777)
    ).collect()
    # the byte-identical planted pair is found at jaccard exactly 1
    # (other organic near-dups of the source doc may also pair with it)
    assert len(exact) == 1 and exact[0]["jaccard"] == 1.0


def test_band_candidate_generation_is_join_free(spark, sf_dir):
    """The r6 j2 bench bimodality was an AQE build-side flip on the old
    bucket SELF-join (both sides' estimates at the 10 MiB broadcast
    threshold edge) — pair generation is now a bucket-local group-by
    with in-memory combination expansion, which has ONE plan shape at
    every scale.  Pin it: with the cap disabled the candidate subtree
    must contain no join node at all; with the cap enabled the only
    join is the ok-bucket prefilter (which bounds the collect_list
    buffer).  The same contract covers the simhash and n-gram families
    (rewritten identically) via their oracle-parity rows."""
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        _band_candidates,
        minhash_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp = minhash_fingerprints(docs)

    def plan(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    uncapped = plan(_band_candidates(fp, 8, 4, None))
    assert "Join" not in uncapped
    capped = plan(_band_candidates(fp, 8, 4, 1000))
    import re

    joins = re.findall(r"\(\d+\) (\w*Join\w*)", capped)
    assert len(joins) <= 1, joins  # only the ok-bucket prefilter join


def test_maximal_repeat_spans_planted_variable_lengths(spark):
    """j2k (VERDICT r7 #5): planted passages of DIFFERENT lengths must
    come back with their exact maximal repeat length and exact span —
    the variable-length semantics the fixed-k j2j cannot express.
    Filler tokens are globally unique so nothing else repeats."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        maximal_repeat_spans,
    )

    def filler(tag, n):
        return [f"u{tag}x{i}" for i in range(n)]

    p14 = [f"alpha{i}" for i in range(14)]   # exactly at threshold+2
    p23 = [f"beta{i}" for i in range(23)]
    p40 = [f"gamma{i}" for i in range(40)]   # clamps at cap=32
    docs = [
        (1, " ".join(filler("a", 5) + p14 + filler("b", 5))),
        (2, " ".join(filler("c", 3) + p14 + filler("d", 7))),
        (3, " ".join(filler("e", 6) + p23 + filler("f", 4))),
        (4, " ".join(filler("g", 2) + p23 + filler("h", 2))),
        (5, " ".join(filler("i", 4) + p40 + filler("j", 3))),
        (6, " ".join(filler("k", 8) + p40)),
        (7, " ".join(filler("m", 30))),      # no repeats at all
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {
        r["doc_id"]: r
        for r in maximal_repeat_spans(df, min_len=12, cap=32).collect()
    }
    assert 7 not in rows and len(rows) == 6
    # doc 1: p14 occupies tokens 6..19; max repeat = 14
    assert (rows[1]["span_start"], rows[1]["span_end"]) == (6, 19)
    assert rows[1]["max_repeat_len"] == 14
    # doc 2: p14 at 4..17
    assert (rows[2]["span_start"], rows[2]["span_end"]) == (4, 17)
    # doc 3: p23 at 7..29, exact length 23
    assert (rows[3]["span_start"], rows[3]["span_end"]) == (7, 29)
    assert rows[3]["max_repeat_len"] == 23
    # doc 5: p40 at 5..44, length clamped at cap=32
    assert (rows[5]["span_start"], rows[5]["span_end"]) == (5, 44)
    assert rows[5]["max_repeat_len"] == 32
    # doc 6: p40 at 9..48
    assert (rows[6]["span_start"], rows[6]["span_end"]) == (9, 48)
    assert rows[6]["max_repeat_len"] == 32


def test_maximal_repeat_spans_within_doc_and_overlap_union(spark):
    """Same-doc repeats count (the corpus-wide >=2 occurrences
    includes the own document), and overlapping variable-length
    intervals union into one span."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        maximal_repeat_spans,
    )

    rep = [f"r{i}" for i in range(15)]
    fil = [f"q{i}" for i in range(9)]
    text = " ".join(rep + fil + rep)  # same passage twice in ONE doc
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = maximal_repeat_spans(df, min_len=12, cap=32).collect()
    spans = sorted((r["span_start"], r["span_end"]) for r in rows)
    assert spans == [(1, 15), (25, 39)]
    assert all(r["max_repeat_len"] == 15 for r in rows)


def test_suffix_order_replen_distributed_equals_naive(spark):
    """The range-partitioned + boundary-stitched neighbor-LCP
    (_suffix_order_replen) must return exactly the naive
    single-partition global-window form on a corpus small enough that
    EVERY partition boundary cuts between near-identical suffixes —
    the case the boundary table exists for."""
    from pyspark.sql import functions as F

    from realtime_cdc_pipeline_docker_spark.functions import ws_tokens
    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        _suffix_order_replen,
        _suffix_order_replen_naive,
    )

    rep = " ".join(f"r{i}" for i in range(20))
    docs = [(i, f"u{i}a u{i}b " + rep + f" u{i}c") for i in range(30)] + [
        (100 + i, " ".join(f"w{i}x{j}" for j in range(25))) for i in range(10)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    toks = df.select(
        F.col("doc_id").alias("id"),
        ws_tokens(F.lower(F.trim(F.col("text")))).alias("toks"),
    ).filter(F.size("toks") >= 12)
    sfx = (
        toks.select(
            "id",
            F.explode(F.sequence(F.lit(1), F.size("toks") - 11)).alias("pos"),
            "toks",
        )
        .select("id", "pos", F.slice("toks", F.col("pos"), 32).alias("s"))
        .withColumn("sk", F.concat_ws(" ", "s"))
    )
    dist = sorted(map(tuple, _suffix_order_replen(sfx).collect()))
    naive = sorted(map(tuple, _suffix_order_replen_naive(sfx).collect()))
    assert dist == naive and dist
    # the shared 20-token repeat is found at full length
    assert max(r[2] for r in dist) == 20


def test_suffix_order_range_exchange_reused(spark):
    """Both consumers of the range-partitioned suffix table (the
    lag/lead table and the boundary table) must observe the SAME
    RangePartitioner boundaries.  ADVICE r8: relying on exchange reuse
    left that invariant implicit — this pins it: the FINAL adaptive
    plan must materialize the range exchange once and serve the second
    consumer a ReusedExchange of it.  (Backstop even without reuse:
    RangePartitioner's reservoir sampling is seeded per partition
    index, so identical input gives identical boundaries — but reuse
    is what we actually run on.)"""
    import re

    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        maximal_repeat_spans,
    )

    rep = " ".join(f"r{i}" for i in range(20))
    df = spark.createDataFrame(
        [(i, f"u{i}a u{i}b " + rep + f" u{i}c") for i in range(30)],
        ["doc_id", "text"],
    )
    out = maximal_repeat_spans(df, min_len=12, cap=32)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    materialized = len(re.findall(r"\+- Exchange rangepartitioning", final))
    reused = len(
        re.findall(r"ReusedExchange \[[^\]]*\], Exchange rangepartitioning", final)
    )
    assert materialized == 1, f"range exchange compiled {materialized}× — boundary\
 stitching would read differently-sampled partitions:\n{final[:3000]}"
    assert reused >= 1, f"no ReusedExchange of the range exchange:\n{final[:3000]}"


def _py_maximal_repeat_spans(docs, min_len=12, cap=32):
    """Independent pure-Python model of maximal_repeat_spans: brute
    force every suffix pair's common prefix (capped), threshold,
    union the per-doc intervals.  O(n²·cap) — fine for tiny corpora."""
    import re

    toked = {
        d: re.split(r"\s+", t.lower().strip()) if t.strip() else []
        for d, t in docs
    }
    toked = {d: t for d, t in toked.items() if len(t) >= min_len}
    sfx = [
        (d, p, tuple(t[p - 1 : p - 1 + cap]))
        for d, t in toked.items()
        for p in range(1, len(t) - min_len + 2)
    ]

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    spans = {}
    for i, (d, p, s) in enumerate(sfx):
        best = 0
        for j, (d2, p2, s2) in enumerate(sfx):
            if i != j:
                best = max(best, lcp(s, s2))
        if best >= min_len:
            spans.setdefault(d, []).append((p, p + best - 1, best))
    out = []
    for d, ivs in spans.items():
        ivs.sort()
        cur_s, cur_e, mx, n = ivs[0][0], ivs[0][1], ivs[0][2], 1
        for p, e, r in ivs[1:]:
            if p <= cur_e + 1:
                cur_e, mx, n = max(cur_e, e), max(mx, r), n + 1
            else:
                out.append((d, cur_s, cur_e, mx, n))
                cur_s, cur_e, mx, n = p, e, r, 1
        out.append((d, cur_s, cur_e, mx, n))
    return sorted(out)


def test_maximal_repeat_spans_matches_python_model_random(spark):
    """Property check against the independent O(n²) model on
    adversarial small corpora: shared prefixes/suffixes, repeats at
    doc edges, overlapping repeats, a repeat longer than cap, and a
    deterministic pseudo-random corpus built from a tiny alphabet so
    accidental repeats occur naturally."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        maximal_repeat_spans,
    )

    rep = [f"r{i}" for i in range(14)]
    long_rep = [f"L{i}" for i in range(40)]
    # 3-letter alphabet => plenty of natural >=4-token repeats at min_len=4
    rand = lambda seed, n: [
        "abc"[(seed * 7 + i * i * 31 + i) % 3] for i in range(n)
    ]
    docs = [
        (1, " ".join(rep + ["x1", "x2"] + rep)),          # twice in one doc
        (2, " ".join(["y1"] + rep)),                      # repeat at doc end
        (3, " ".join(long_rep)),                          # > cap, whole doc
        (4, " ".join(["z1", "z2"] + long_rep + ["z3"])),
        (5, " ".join(rand(1, 30))),
        (6, " ".join(rand(2, 25))),
        (7, " ".join(rand(3, 20))),
        (8, "short doc"),
    ]
    for min_len, cap in ((4, 8), (6, 32), (12, 32)):
        got = sorted(
            map(
                tuple,
                maximal_repeat_spans(
                    spark.createDataFrame(docs, ["doc_id", "text"]),
                    min_len=min_len,
                    cap=cap,
                ).collect(),
            )
        )
        want = _py_maximal_repeat_spans(docs, min_len=min_len, cap=cap)
        assert got == want, (min_len, cap, got, want)


def test_apply_substring_dedup_cuts_exact_spans(spark):
    """The APPLY step must cut exactly the marked spans: a shared
    passage disappears from BOTH carriers (every occurrence — the
    ExactSubstr policy), unique text survives verbatim, a fully
    duplicated doc cleans to empty."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        apply_substring_dedup,
        maximal_repeat_spans,
    )

    rep = " ".join(f"r{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, "u1a u1b " + rep + " u1c"),
            (2, "u2a " + rep + " u2b u2c u2d"),
            (3, rep),           # fully duplicated content
            (4, rep),           # (its twin)
            (5, " ".join(f"w{j}" for j in range(25))),  # unique
        ],
        ["doc_id", "text"],
    )
    spans = maximal_repeat_spans(docs, min_len=12, cap=32)
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in apply_substring_dedup(docs, spans).collect()
    }
    assert out[1] == (23, 20, "u1a u1b u1c")
    assert out[2] == (24, 20, "u2a u2b u2c u2d")
    assert out[3] == (20, 20, "")
    assert out[4] == (20, 20, "")
    assert out[5][1] == 0 and out[5][2] == " ".join(f"w{j}" for j in range(25))


class TestIncrementalSubstringDedup:
    """Keep-first incremental substring dedup (j2o batch twin).

    Planted corpus, k=8, waves = doc_id % 3: passage P (10 tokens)
    first arrives in wave 0 at doc 3; every later occurrence — same
    wave higher id (doc 6), later wave SMALLER id (doc 1, the
    first-arrived-beats-min-keeper case) — is cut; a within-doc
    repeat (doc 9) keeps its first occurrence only; unique doc 2 is
    untouched."""

    def _fixture(self, spark):
        P = " ".join(f"p{i}" for i in range(10))
        Q = " ".join(f"q{i}" for i in range(10))
        mk = lambda pre, body, post: f"{pre} {body} {post}".strip()
        rows = [
            # wave 0, arrives first: P at token positions 6..15
            (3, mk(" ".join(f"a{i}" for i in range(5)), P,
                   " ".join(f"a{i}" for i in range(5, 10)))),
            # wave 0, same wave, higher id: P at 5..14 -> cut
            (6, mk(" ".join(f"b{i}" for i in range(4)), P,
                   " ".join(f"b{i}" for i in range(4, 8)))),
            # wave 1, SMALLER id than doc 3: P at 3..12 -> still cut
            (1, mk("c0 c1", P, " ".join(f"c{i}" for i in range(2, 8)))),
            # wave 2, unique -> untouched
            (2, " ".join(f"d{i}" for i in range(20))),
            # wave 0, within-doc repeat of Q: second occurrence cut
            (9, f"{Q} e0 e1 {Q}"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_planted_semantics(self, spark):
        from realtime_cdc_pipeline_docker_spark.operators.dedup import (
            incremental_substring_dedup,
        )

        out = {
            r["doc_id"]: r
            for r in incremental_substring_dedup(
                self._fixture(spark), n_waves=3, k=8
            ).collect()
        }
        assert len(out) == 5
        # first arrival of P survives intact
        assert out[3]["n_removed"] == 0
        assert out[3]["n_tokens"] == 20
        # same-wave higher id: P's grams (pos 5,6,7) cover [5,14]
        assert out[6]["n_removed"] == 10
        assert "p0" not in out[6]["cleaned_text"].split()
        assert out[6]["cleaned_text"].split() == (
            [f"b{i}" for i in range(4)] + [f"b{i}" for i in range(4, 8)]
        )
        # later wave, smaller id: still cut (first-ARRIVED, not min-id)
        assert out[1]["n_removed"] == 10
        assert "p0" not in out[1]["cleaned_text"].split()
        # unique doc untouched
        assert out[2]["n_removed"] == 0
        assert out[2]["cleaned_text"].split() == [f"d{i}" for i in range(20)]
        # within-doc repeat: first Q stays, second Q cut
        assert out[9]["n_removed"] == 10
        assert out[9]["cleaned_text"].split() == (
            [f"q{i}" for i in range(10)] + ["e0", "e1"]
        )

    def test_short_docs_pass_through(self, spark):
        from realtime_cdc_pipeline_docker_spark.operators.dedup import (
            incremental_substring_dedup,
        )

        docs = spark.createDataFrame(
            [(0, "only three tokens"), (1, "only three tokens")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in incremental_substring_dedup(docs, k=8).collect()
        }
        # below k tokens: no grams, nothing to cut — even exact copies
        assert out[0]["n_removed"] == 0 and out[1]["n_removed"] == 0
        assert out[1]["cleaned_text"] == "only three tokens"


def _py_incremental_substring(docs, n_waves=3, k=8):
    """Independent O(total²) Python model of the keep-first relation:
    a k-gram occurrence is cut iff some earlier occurrence exists in
    (wave, doc_id, pos) order; coverage = union of [p, p+k-1]; docs
    contribute ORIGINAL grams regardless of cuts."""
    toks = {
        d: text.lower().strip().split() for d, text in docs
    }
    occs = []  # (wave, doc_id, pos, gram)
    for d, _ in docs:
        t = toks[d]
        for p in range(len(t) - k + 1):
            occs.append((d % n_waves, d, p + 1, " ".join(t[p : p + k])))
    first = {}
    for w, d, p, g in sorted(occs):
        first.setdefault(g, (w, d, p))
    out = {}
    for d, _ in docs:
        t = toks[d]
        cut = set()
        for p in range(len(t) - k + 1):
            g = " ".join(t[p : p + k])
            if first[g] != (d % n_waves, d, p + 1):
                cut.update(range(p + 1, p + k + 1))
        kept = [tok for i, tok in enumerate(t, 1) if i not in cut]
        out[d] = (
            d % n_waves,
            len(t),
            len(t) - len(kept),
            " ".join(kept),
        )
    return out


def test_incremental_substring_matches_python_model_random(spark):
    """Property check against the independent model on adversarial
    corpora: cross-wave repeats in both id directions, within-doc
    repeats, overlapping repeats, sub-k docs, and a tiny-alphabet
    pseudo-random corpus where k-gram collisions occur naturally."""
    from realtime_cdc_pipeline_docker_spark.operators.dedup import (
        incremental_substring_dedup,
    )

    rep = [f"r{i}" for i in range(12)]
    rand = lambda seed, n: [
        "ab"[(seed * 7 + i * i * 31 + i) % 2] for i in range(n)
    ]
    docs = [
        (3, " ".join(["a1", "a2"] + rep + ["a3"])),        # wave 0, first
        (6, " ".join(rep + ["b1", "b2"])),                 # wave 0, higher id
        (1, " ".join(["c1"] + rep)),                       # wave 1, SMALLER id
        (2, " ".join(rep + ["d1"] + rep)),                 # wave 2, within-doc too
        (4, " ".join(rand(1, 30))),                        # wave 1
        (5, " ".join(rand(2, 26))),                        # wave 2
        (9, " ".join(rand(1, 30))),                        # wave 0: exact dup of 4's text, EARLIER wave, higher id
        (7, "short doc"),                                  # sub-k
    ]
    for k in (4, 8):
        got = {
            r["doc_id"]: (r["wave"], r["n_tokens"], r["n_removed"], r["cleaned_text"])
            for r in incremental_substring_dedup(
                spark.createDataFrame(docs, ["doc_id", "text"]), n_waves=3, k=k
            ).collect()
        }
        want = _py_incremental_substring(docs, n_waves=3, k=k)
        assert got == want, (k, got, want)
