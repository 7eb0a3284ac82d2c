"""Similarity-search invariants (SURVEY §2.J3).

Brute-force top-k has a SQL oracle in the registry; here we test the
properties the oracle can't see: ANN correctness on planted duplicates
(scale-invariance of hyperplane LSH makes them deterministic), agreement
between the ANN and exact paths, and bucket determinism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.catalog import load_table
from realtime_cdc_pipeline_docker_spark.operators.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    lsh_ann_topk,
)


def _corpus_with_planted(spark, sf_dir, n_planted=20, scale=2.0):
    """Fixture embeddings + positively-scaled copies of the first n ids.

    Scaling preserves direction: cosine(v, c·v) = 1 and every hyperplane
    sign agrees, so planted copies share their original's LSH bucket
    with probability 1 — ANN behavior on them is deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") < n_planted).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(scale)).cast("float")).alias(
            "embedding"
        ),
        "label",
    )
    return emb.unionByName(planted)


def test_brute_force_rank1_is_planted_duplicate(spark, sf_dir):
    corpus = _corpus_with_planted(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in brute_force_topk(corpus, queries, k=1).collect()
    }
    assert top1 == {q: q + 1000000 for q in range(5)}


def test_ann_finds_planted_duplicate_always(spark, sf_dir):
    corpus = _corpus_with_planted(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_ann_topk(corpus, queries, k=5)
    rank1 = {r["query_id"]: r["neighbor_id"] for r in out.filter("rnk = 1").collect()}
    # same-bucket guarantee: the scaled copy is always rank 1 in ANN too
    assert rank1 == {q: q + 1000000 for q in range(5)}


def test_ann_results_subset_of_exact_scores(spark, sf_dir):
    """Every (query, neighbor, sim) the ANN returns must carry the same
    cosine the exact path computes — ANN may miss pairs, never mis-score."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ann = lsh_ann_topk(emb, queries, k=5).select("query_id", "neighbor_id", "sim")
    exact = brute_force_topk(emb, queries, k=10**9).select(
        "query_id", "neighbor_id", F.col("sim").alias("exact_sim")
    )
    joined = ann.join(exact, ["query_id", "neighbor_id"], "left").collect()
    assert len(joined) > 0
    for r in joined:
        assert r["exact_sim"] is not None
        assert r["sim"] == pytest.approx(r["exact_sim"], abs=1e-9)


def test_lsh_ann_recall_on_random_fixture(spark, sf_dir):
    """Multi-table + hamming-1 multi-probe must recover ≥0.8 of the
    exact top-5 even on the random fixture — the adversarial case where
    neighbors sit near 65° and a single sign-pattern table recalls
    almost nothing."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_ann_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


def test_neardup_pairs_exactly_planted(spark, sf_dir):
    corpus = _corpus_with_planted(spark, sf_dir, n_planted=20)
    got = {
        (r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(corpus, 0.9).collect()
    }
    assert got == {(q, q + 1000000) for q in range(20)}


def test_neardup_empty_on_random_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assert embedding_neardup_pairs(emb, threshold=0.9).count() == 0


def test_ivf_finds_planted_duplicate_always(spark, sf_dir):
    """Spherical assignment is scale-invariant, so a scaled copy shares
    its original's inverted list deterministically — IVF rank-1 must be
    the planted duplicate for every probed query."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import ivf_ann_topk

    corpus = _corpus_with_planted(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_ann_topk(corpus, queries, k=3)
    rank1 = {r["query_id"]: r["neighbor_id"] for r in out.filter("rnk = 1").collect()}
    assert rank1 == {q: q + 1000000 for q in range(5)}


def test_ivf_recall_meets_lsh_bar_on_fixture(spark, sf_dir):
    """At the defaults (boundary replication assign=2, nprobe=6 of 16
    data-adapted cells), IVF must clear the SAME recall@5 ≥ 0.8 bar the
    LSH path is held to, even on near-orthogonal random vectors — the
    hardest case (measured 0.91; single-assignment managed only
    0.71)."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import ivf_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_ann_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


def test_ivf_index_layout_prunes_and_matches_inmemory(spark, sf_dir, tmp_path):
    """The materialized IVF layout must (a) return the identical
    relation to the in-memory ivf_ann_topk under the same centroids,
    and (b) reach the probed lists via PartitionFilters on the scan —
    the filesystem, not a runtime filter, enforces 'touch nprobe
    lists' at 100 TB."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_index_topk,
        train_ivf_centroids,
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = train_ivf_centroids(emb)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, path, cents, assign=2)

    from_index = ivf_index_topk(spark, path, queries, cents, k=5, nprobe=4)
    in_memory = ivf_ann_topk(
        emb, queries, k=5, nprobe=4, assign=2, centroids=cents
    )
    a = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in from_index.collect()}
    b = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in in_memory.collect()}
    assert a == b and a

    probe = spark.read.parquet(path).filter(F.col("cluster").isin([0, 1]))
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    part = plan.split("PartitionFilters", 1)
    assert len(part) == 2 and "cluster" in part[1].split("]", 1)[0]
    import glob

    assert len(glob.glob(f"{path}/cluster=*/")) >= 8  # real multi-list layout


def test_quantize_embeddings_roundtrip_and_edges(spark):
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        quantize_embeddings,
    )

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),   # zero vector
        (3, [-2.0, 2.0, 1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = quantize_embeddings(df)
    got = {(r["vec_id"], r["pos"]): r for r in out.collect()}
    # Max component hits the extreme level exactly.
    assert got[(1, 0)]["q"] == 127
    assert got[(3, 0)]["q"] == -127 and got[(3, 1)]["q"] == 127
    # Zero vector -> all-zero codes, scale 0, no NaN.
    assert all(got[(2, p)]["q"] == 0 for p in range(4))
    # Dequantization error bound: |q/127*scale - x| <= scale/254 + eps.
    for (vid, pos), r in got.items():
        x = rows[vid - 1][1][pos]
        scale = r["scale"]
        if scale:
            assert abs(r["q"] / 127 * scale - x) <= scale / 254 + 1e-6


def test_random_projection_matches_numpy_reference(spark, sf_dir):
    """Independent recompute: quantize to micro-units then multiply by
    the md5 sign matrix in numpy — integer-exact, so equality is =="""
    import numpy as np

    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        projection_signs,
        random_projection,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    got = {
        r["vec_id"]: r["proj_micro"]
        for r in random_projection(emb, out_dims=16, in_dims=64).collect()
    }
    signs = np.array(projection_signs(16, 64), dtype=np.int64)
    for r in emb.collect():
        q = np.array(
            [round(float(x) * 1_000_000) for x in r["embedding"]], dtype=np.int64
        )
        assert got[r["vec_id"]] == list(signs @ q), r["vec_id"]


def test_random_projection_layout_independent(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        random_projection,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = random_projection(emb).select("vec_id", "proj_micro").collect()
    b = (
        random_projection(emb.repartition(13))
        .select("vec_id", "proj_micro")
        .collect()
    )
    assert sorted(map(tuple, ((r[0], tuple(r[1])) for r in a))) == sorted(
        map(tuple, ((r[0], tuple(r[1])) for r in b))
    )


def test_random_projection_shuffle_and_python_free(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        random_projection,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = random_projection(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_semantic_dedup_drops_planted_scaled_duplicates(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
        "label",
    )
    both = emb.unionByName(planted)
    survivors = semantic_dedup(both, n_clusters=16, threshold=0.999)
    ids = {r["vec_id"] for r in survivors.collect()}
    n_planted = planted.count()
    assert n_planted > 0
    # Every scaled duplicate is dominated by its (lower-id) original...
    assert not any(i >= 1_000_000 for i in ids)
    # ...and every original survives (originals are mutually non-dup
    # at this threshold on the random fixture).
    assert len(ids) == emb.count()


def test_semantic_dedup_deterministic_and_capped(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    a = {r["vec_id"] for r in semantic_dedup(emb).collect()}
    b = {r["vec_id"] for r in semantic_dedup(emb).collect()}
    assert a == b
    # Degenerate-cluster cap: with an absurdly low cap every cluster is
    # oversized, pairing is skipped, and all rows survive (observable).
    capped = semantic_dedup(emb, max_cluster_size=1).collect()
    assert all(r["oversized"] for r in capped)
    assert len(capped) == emb.count()


def test_mmr_demotes_planted_duplicate_of_top_hit(spark):
    """Plain top-2 admits an exact duplicate of the best hit; MMR's
    diversity penalty pushes it out of the early ranks."""
    import random

    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    rng = random.Random(7)
    dim = 16
    vecs = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(1, 40)]
    q = [(0, vecs[0][1])]  # query = vec 1's direction -> vec 1 is top hit
    dup = [(100, [2.0 * x for x in vecs[0][1]])]  # scaled duplicate of top hit
    corpus = spark.createDataFrame(
        vecs + dup, "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(q, "query_id long, embedding array<double>")
    cands = brute_force_topk(corpus, queries, k=10).select(
        "query_id", F.col("neighbor_id").alias("vec_id"), F.col("sim").alias("score")
    ).join(corpus, "vec_id")
    plain_top2 = {
        r["vec_id"]
        for r in brute_force_topk(corpus, queries, k=2).select(
            F.col("neighbor_id").alias("vec_id")
        ).collect()
    }
    assert plain_top2 == {1, 100}  # duplicate crowds the plain ranking
    mmr = mmr_rerank(cands, k=3, lam=0.5).orderBy("mmr_rank").collect()
    picked = [r["vec_id"] for r in mmr]
    assert picked[0] in (1, 100)  # relevance still wins rank 1
    assert {1, 100} - set(picked[:2])  # but its duplicate is demoted
    # Determinism across runs.
    again = [r["vec_id"] for r in mmr_rerank(cands, k=3, lam=0.5)
             .orderBy("mmr_rank").collect()]
    assert picked == again


def test_mmr_emits_exactly_k_per_query(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = brute_force_topk(emb, queries, k=12).select(
        "query_id", F.col("neighbor_id").alias("vec_id"), F.col("sim").alias("score")
    ).join(emb.select("vec_id", "embedding"), "vec_id")
    out = mmr_rerank(cands, k=4).groupBy("query_id").count().collect()
    assert all(r["count"] == 4 for r in out) and len(out) == queries.count()


def test_mmr_respects_caller_id_types(spark):
    """ADVICE r4: the output schema derives key/id types from the input
    — string query/doc ids must round-trip, not crash on a hardcoded
    `long`."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import mmr_rerank

    cands = spark.createDataFrame(
        [
            ("q1", f"doc{i}", [float(i), 1.0 - i / 10.0], 1.0 - i / 10.0)
            for i in range(6)
        ],
        "query_id string, vec_id string, embedding array<double>, score double",
    )
    out = mmr_rerank(cands, k=3)
    assert dict(out.dtypes)["query_id"] == "string"
    assert dict(out.dtypes)["vec_id"] == "string"
    rows = out.orderBy("mmr_rank").collect()
    assert len(rows) == 3 and rows[0]["vec_id"].startswith("doc")


def test_pq_assign_exact_and_shuffle_free(spark, sf_dir):
    """PQ assignment: every (vec, subspace) gets exactly one code in
    range; the assigned code is verifiably the argmin over the
    codebook (checked in numpy); the plan has no exchange and no
    Python."""
    import numpy as np

    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        pq_assign,
        seed_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = seed_codebook(emb, k=4)
    out = pq_assign(emb, cb, m=8)
    n_vecs = emb.count()
    assert out.count() == n_vecs * 8
    assert out.groupBy("vec_id").count().filter(F.col("count") != 8).count() == 0
    assert out.filter((F.col("code") < 0) | (F.col("code") >= 4)).count() == 0

    # numpy referee on a handful of vectors
    sample = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
              for r in emb.filter(F.col("vec_id") < 20).collect()}
    got = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in out.filter(F.col("vec_id") < 20).collect()
    }
    cbm = [np.array(v, dtype=np.float64) for v in cb]
    for vid, v in sample.items():
        for m in range(8):
            s = slice(m * 8, m * 8 + 8)
            d2 = [float(((v[s] - c[s]) ** 2).sum()) for c in cbm]
            best = min(range(4), key=lambda c: (d2[c], c))
            assert got[(vid, m)] == best, (vid, m)

    plan = pq_assign(emb, cb, m=8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan and "Join" not in plan


def test_seed_codebook_is_bounded_and_deterministic(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.similarity import seed_codebook

    emb = load_table(spark, sf_dir, "embeddings")
    cb1 = seed_codebook(emb, k=4)
    cb2 = seed_codebook(emb, k=4)
    assert cb1 == cb2 and len(cb1) == 4 and len(cb1[0]) == 64


def test_ivfpq_finds_planted_duplicate_always(spark, sf_dir):
    """A positively-scaled copy normalizes to the SAME unit vector →
    same cluster, same PQ codes, ADC distance equal to the original's
    and exact rerank puts it at rank 1 deterministically."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import ivfpq_adc_topk

    corpus = _corpus_with_planted(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivfpq_adc_topk(corpus, queries, k=3)
    rank1 = {r["query_id"]: r["neighbor_id"] for r in out.filter("rnk = 1").collect()}
    assert rank1 == {q: q + 1000000 for q in range(5)}


def test_ivfpq_recall_meets_bar_on_fixture(spark, sf_dir):
    """The full IVF-PQ-ADC-rerank pipeline must clear the same
    recall@5 >= 0.8 bar as the LSH and plain-IVF paths on the
    adversarial random fixture."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import ivfpq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivfpq_adc_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, recall


def test_pq_codes_array_matches_assign_rows(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table as lt
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        pq_assign,
        pq_codes,
        seed_codebook,
    )

    emb = lt(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    cb = seed_codebook(emb, k=4)
    rows = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in pq_assign(emb, cb, m=8).collect()
    }
    arrs = {r["vec_id"]: list(r["codes"]) for r in pq_codes(emb, cb, m=8).collect()}
    for (vid, sub), code in rows.items():
        assert arrs[vid][sub] == code


def test_mrl_truncation_recall_monotone_and_exact_at_full_width(spark, sf_dir):
    from pyspark.sql import functions as F

    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        mrl_truncation_eval,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    full_dim = len(emb.select("embedding").first()[0])
    rows = {
        r["dim"]: r
        for r in mrl_truncation_eval(
            emb, F.col("vec_id") % 25 == 0, dims=(full_dim, 16, 4)
        ).collect()
    }
    assert rows[full_dim]["recall_ppm"] == 1_000_000  # self-check
    # truncation LOSES information vs the full width (strictly, on
    # this fixture); note recall is NOT guaranteed monotone between
    # two truncated widths — a short prefix can rank a true neighbor
    # luckily — so the contract is full-width exactness + loss below
    for d in (16, 4):
        assert 0 < rows[d]["recall_ppm"] < 1_000_000
    assert all(r["n_queries"] > 0 for r in rows.values())
    # an empty query sample is a caller bug, reported as such — not an
    # ANSI div-by-zero from deep inside the recall arithmetic
    import pytest

    with pytest.raises(ValueError, match="no rows"):
        mrl_truncation_eval(emb, F.lit(False), dims=(4,))


def test_ivfpq_index_layout_matches_inmemory_and_carries_codes(
    spark, sf_dir, tmp_path
):
    """write_ivfpq_index + ivfpq_index_topk must return the identical
    relation to the in-memory ivfpq_adc_topk under the same
    centroids/codebook (the j3o ↔ j3k equivalence the driver's
    rows-only check can't see), and the at-rest layout must carry the
    m-byte PQ codes in cluster-partitioned directories — the storage
    property that lets a 100 TB probe rank candidates without reading
    their vectors."""
    import glob

    from realtime_cdc_pipeline_docker_spark.functions import vec_normalize
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        ivfpq_adc_topk,
        ivfpq_index_topk,
        seed_codebook,
        train_ivf_centroids,
        write_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = train_ivf_centroids(emb)
    normed = emb.select("vec_id", vec_normalize("embedding").alias("embedding"))
    cb = seed_codebook(normed, k=16)
    path = str(tmp_path / "ivfpq_index")
    write_ivfpq_index(emb, path, cents, cb)

    from_index = ivfpq_index_topk(spark, path, queries, cents, cb, k=5)
    in_memory = ivfpq_adc_topk(emb, queries, k=5, centroids=cents, codebook=cb)
    a = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in from_index.collect()}
    b = {(r["query_id"], r["neighbor_id"], r["rnk"]) for r in in_memory.collect()}
    assert a == b and a

    assert len(glob.glob(f"{path}/cluster=*/")) >= 8  # real multi-list layout
    stored = spark.read.parquet(path)
    assert "codes" in stored.columns  # ADC ranks on codes, not vectors


def test_semantic_dedup_pretrained_centroids_match_trained(spark, sf_dir):
    """semantic_dedup(centroids=...) is the fixture-separated form the
    j2f bench row times (k-means training is an offline cost, VERDICT
    r6 #4): with the same deterministic centroid set it must return
    byte-identical keepers to the self-training form."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        semantic_dedup,
        train_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, n_centroids=8)
    trained = semantic_dedup(emb, n_clusters=8, threshold=0.999)
    fixture = semantic_dedup(
        emb, n_clusters=8, threshold=0.999, centroids=cents
    )
    a = sorted(map(tuple, trained.collect()))
    b = sorted(map(tuple, fixture.collect()))
    assert a == b and a


def test_table_assignment_matches_literal_expression(spark, sf_dir):
    """assign_clusters_table (broadcast component table, O(1) codegen)
    must assign every fixture vector to the same cluster as the
    literal nearest_centroid_expr form it replaced inside
    semantic_dedup — including the highest-index tiebreak."""
    from realtime_cdc_pipeline_docker_spark.functions import vec_normalize
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        assign_clusters_table,
        nearest_centroid_expr,
        train_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_ivf_centroids(emb, n_centroids=16)
    normed = emb.select(
        F.col("vec_id").alias("id"), vec_normalize("embedding").alias("v")
    )
    literal = {
        r["id"]: r["cluster"]
        for r in normed.withColumn(
            "cluster", nearest_centroid_expr("v", cents)
        ).collect()
    }
    table = {
        r["id"]: r["cluster"]
        for r in assign_clusters_table(normed, cents).collect()
    }
    assert literal == table and literal


def test_arrow_assignment_bitexact_vs_expression(spark, sf_dir):
    """Round-13 optimization pin: the Arrow/NumPy assignment twins
    (assign_ivf_arrow, ivfpq_indexed_arrow) must reproduce the
    literal-expression forms ROW-FOR-ROW — same clusters (incl. rank
    order and ties) and same PQ codes — because they replicate the
    expressions' exact IEEE-754 op sequence (the bit-exactness
    contract in operators/similarity.py).  Null and wrong-length
    vectors drop on both paths (the explode-over-null behavior)."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        _ivfpq_indexed_expr,
        assign_ivf_arrow,
        centroid_ranks_expr,
        ivfpq_indexed_arrow,
        seed_codebook,
        train_ivf_centroids,
    )
    from realtime_cdc_pipeline_docker_spark.functions import vec_normalize

    emb = load_table(spark, sf_dir, "embeddings")
    nan = float("nan")
    bad = spark.createDataFrame(
        [(10_000_001, None, 0), (10_000_003, [nan] * 64, 0)],
        "vec_id bigint, embedding array<float>, label int",
    )
    # wrong-LENGTH vectors only exercise the cluster path: the PQ
    # expression form raises (ANSI element_at) on them — out of the
    # fixture contract; the arrow form treats them like null.
    short = spark.createDataFrame(
        [(10_000_002, [1.0, 2.0], 0)],
        "vec_id bigint, embedding array<float>, label int",
    )
    mixed = emb.unionByName(bad)
    cents = train_ivf_centroids(emb, n_centroids=16)

    cluster_in = mixed.unionByName(short)
    expr_rows = sorted(
        (r["vec_id"], r["c"])
        for r in cluster_in.withColumn(
            "c", F.explode(F.slice(centroid_ranks_expr("embedding", cents), 1, 2))
        )
        .select("vec_id", "c")
        .collect()
    )
    arrow_rows = sorted(
        (r["vec_id"], r["c"])
        for r in assign_ivf_arrow(cluster_in, cents, 2, "embedding", "c")
        .select("vec_id", "c")
        .collect()
    )
    assert expr_rows == arrow_rows and expr_rows

    normed = emb.select("vec_id", vec_normalize("embedding").alias("embedding"))
    codebook = seed_codebook(normed, k=16)
    expr_pq = sorted(
        (r["vec_id"], r["__cluster"], tuple(r["codes"]))
        for r in _ivfpq_indexed_expr(
            mixed, cents, codebook, 8, 2, "vec_id", "embedding"
        ).collect()
    )
    arrow_pq = sorted(
        (r["vec_id"], r["__cluster"], tuple(r["codes"]))
        for r in ivfpq_indexed_arrow(
            mixed, cents, codebook, 8, 2, "vec_id", "embedding"
        ).collect()
    )
    assert expr_pq == arrow_pq and expr_pq


def test_assignment_and_dedup_keep_unassignable_vectors(spark, sf_dir):
    """Rows whose embedding is null or empty must not vanish:
    assign_clusters_table returns them with a NULL cluster (the same
    value nearest_centroid_expr evaluates to on them), and
    semantic_dedup passes them through as survivors instead of losing
    them at the cluster-key join (ADVICE r7)."""
    from realtime_cdc_pipeline_docker_spark.functions import vec_normalize
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        assign_clusters_table,
        semantic_dedup,
        train_ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    bad = spark.createDataFrame(
        [(10_000_001, None), (10_000_002, [])],
        "vec_id bigint, embedding array<float>",
    )
    mixed = emb.select("vec_id", "embedding").unionByName(bad)

    cents = train_ivf_centroids(emb, n_centroids=8)
    normed = mixed.select(
        F.col("vec_id").alias("id"), vec_normalize("embedding").alias("v")
    )
    assigned = {
        r["id"]: r["cluster"]
        for r in assign_clusters_table(normed, cents).collect()
    }
    assert assigned[10_000_001] is None and assigned[10_000_002] is None
    assert len(assigned) == mixed.count()

    keepers = semantic_dedup(mixed, threshold=0.999, centroids=cents)
    kept = {r["vec_id"]: r for r in keepers.collect()}
    assert 10_000_001 in kept and 10_000_002 in kept
    assert kept[10_000_001]["cluster"] is None
    assert not kept[10_000_001]["oversized"]


def test_semantic_gate_arrow_bitexact(spark, sf_dir):
    """Round-14 optimization pin: semantic_gate_hits_arrow (one
    MapInArrow int64-matmul pass) must reproduce the
    crossJoin(broadcast) + DECIMAL(38,0) expression gate ROW-FOR-ROW —
    everything in the gate is exact integer arithmetic, so the only
    risks are overflow (guarded: magnitude-checked matmul with an
    arbitrary-precision fallback) and the float64 comparison band
    (border pairs re-decided in Python ints).  Exercised on (a) the
    j8d fixture relation including its planted cosine-1 copies and
    (b) crafted integer vectors sitting EXACTLY on the threshold
    (dot²·10⁶ == t²·nc2·nb2 — the border-fallback path), just above,
    just below, negative-dot, zero, null, wrong-length and
    null-element rows."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        semantic_gate_hits_arrow,
    )
    from realtime_cdc_pipeline_docker_spark.plans.similarity_queries import (
        _semantic_hits_expr,
    )

    def both(corpus, bench):
        expr = sorted(
            (r["vec_id"], r["n_bench_hits"], r["first_bench_id"])
            for r in _semantic_hits_expr(corpus, bench, 900).collect()
        )
        arrow = sorted(
            (r["cid"], r["n_bench_hits"], r["first_bench_id"])
            for r in semantic_gate_hits_arrow(
                corpus, bench.collect(), 900, id_col="cid"
            ).collect()
        )
        return expr, arrow

    # (a) the j8d fixture relation (quantized through the same JVM
    # expressions the declared query uses)
    emb = load_table(spark, sf_dir, "embeddings")
    q = lambda c: F.transform(  # noqa: E731
        c, lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
    )
    isum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    bench = (
        emb.filter(F.col("vec_id") % 40 == 0)
        .select(F.col("vec_id").alias("bid"), q(F.col("embedding")).alias("qb"))
        .withColumn("nb2", isum(F.zip_with("qb", "qb", lambda a, b: a * b)))
    )
    corpus = (
        emb.filter(F.col("vec_id") % 40 != 0)
        .select(F.col("vec_id").alias("cid"), F.col("embedding"))
        .unionByName(
            emb.filter(F.col("vec_id") % 120 == 0).select(
                (F.col("vec_id") + 1_000_000).alias("cid"),
                F.transform(
                    "embedding", lambda x: x * F.lit(2.0).cast("float")
                ).alias("embedding"),
            )
        )
        .select("cid", q(F.col("embedding")).alias("qc"))
        .withColumn("nc2", isum(F.zip_with("qc", "qc", lambda a, b: a * b)))
    )
    expr, arrow = both(corpus, bench)
    assert expr == arrow and expr  # planted copies guarantee hits

    # (b) crafted exact-threshold integers.  qb=(3,0,0,0), nb2=9;
    # qc=(9,3,3,1), nc2=100, dot=27: dot²·10⁶ = 729e6 == 810000·100·9
    # — EXACT tie, must hit (>=) through the border fallback.
    rows = [
        (1, [9, 3, 3, 1]),      # exact tie -> hit
        (2, [9, 3, 3, 2]),      # nc2=103 -> just below -> no hit
        (3, [9, 3, 3, 0]),      # nc2=99  -> just above -> hit
        (4, [-9, -3, -3, -1]),  # dot = -27 -> no hit (dot > 0 gate)
        (5, [0, 0, 0, 0]),      # dot = 0 -> no hit
        (6, None),              # null vector -> no hit
        (7, [1, 2]),            # wrong length -> null dot -> no hit
        (8, [6, 2, 2, 9999]),   # big tail, dot=18: below -> no hit
        (9, [300, 0, 0, 0]),    # scaled copy, cosine 1 -> hit
    ]
    corpus2 = spark.createDataFrame(
        rows, "cid long, qc array<long>"
    ).withColumn("nc2", isum(F.zip_with("qc", "qc", lambda a, b: a * b)))
    bench2 = spark.createDataFrame(
        [(100, [3, 0, 0, 0]), (200, [0, 3, 0, 0])],
        "bid long, qb array<long>",
    ).withColumn("nb2", isum(F.zip_with("qb", "qb", lambda a, b: a * b)))
    expr2, arrow2 = both(corpus2, bench2)
    assert expr2 == arrow2
    hit_ids = {t[0] for t in arrow2}
    assert 1 in hit_ids and 3 in hit_ids and 9 in hit_ids
    assert {2, 4, 5, 6, 7, 8}.isdisjoint(hit_ids)

    # null-ELEMENT row: null dot on the expression path -> no hit on
    # either (built separately: createDataFrame infers the None slot)
    corpus3 = spark.createDataFrame(
        [(10, [9, None, 3, 1])], "cid long, qc array<long>"
    ).withColumn("nc2", isum(F.zip_with("qc", "qc", lambda a, b: a * b)))
    expr3, arrow3 = both(corpus3, bench2)
    assert expr3 == arrow3 == []

    # empty benchmark -> empty result on both paths
    expr4, arrow4 = both(corpus2, bench2.filter(F.lit(False)))
    assert expr4 == arrow4 == []


def test_arrow_assignment_hardening(spark, sf_dir):
    """ADVICE r13 pins: (1) assign > n_centroids clamps to the
    slice(ranks, 1, assign) semantics instead of a NumPy broadcast
    error; (2) the PQ arrow path RAISES on wrong-length vectors (the
    expression form's ANSI element_at behavior) instead of silently
    indexing them under clusters [0..assign) with all-zero codes; (3)
    dim not divisible by m is an assertion, never a silent tail
    truncation."""
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        assign_ivf_arrow,
        centroid_ranks_expr,
        ivfpq_indexed_arrow,
        seed_codebook,
        train_ivf_centroids,
    )
    from realtime_cdc_pipeline_docker_spark.functions import vec_normalize

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    cents = train_ivf_centroids(emb, n_centroids=4)

    # (1) assign=9 > 4 centroids: expression slice yields all 4 ranks
    expr_rows = sorted(
        (r["vec_id"], r["c"])
        for r in emb.withColumn(
            "c", F.explode(F.slice(centroid_ranks_expr("embedding", cents), 1, 9))
        ).select("vec_id", "c").collect()
    )
    arrow_rows = sorted(
        (r["vec_id"], r["c"])
        for r in assign_ivf_arrow(emb, cents, 9, "embedding", "c")
        .select("vec_id", "c")
        .collect()
    )
    assert expr_rows == arrow_rows and expr_rows

    normed = emb.select("vec_id", vec_normalize("embedding").alias("embedding"))
    codebook = seed_codebook(normed, k=8)

    # (2) wrong-length vector -> the PQ arrow path fails the job
    bad = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(
            [(10_000_009, [1.0, 2.0])], "vec_id bigint, embedding array<float>"
        )
    )
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception) as exc:
        ivfpq_indexed_arrow(bad, cents, codebook, 8, 2, "vec_id", "embedding").collect()
    assert "length" in str(exc.value) or isinstance(exc.value, Py4JJavaError)

    # (3) dim % m != 0 -> loud assert at build time
    with _pytest.raises(AssertionError):
        ivfpq_indexed_arrow(emb, cents, codebook, 7, 2, "vec_id", "embedding")
