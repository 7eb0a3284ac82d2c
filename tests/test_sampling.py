"""Property tests for corpus-shaping operators (operators/sampling.py,
operators/text.py:repetition_signals) — determinism, mass conservation,
planted-value checks.  Oracle parity runs in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.catalog import load_table
from realtime_cdc_pipeline_docker_spark.operators.sampling import (
    pack_sequences,
    stratified_sample,
)
from realtime_cdc_pipeline_docker_spark.operators.text import repetition_signals

SF = "/root/testdata/sf0.01"


def test_stratified_sample_deterministic_and_bounded(spark):
    docs = load_table(spark, SF, "documents")
    rate = F.lit(30)
    a = sorted(r.doc_id for r in stratified_sample(docs, rate).select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in stratified_sample(docs.repartition(7), rate).select("doc_id").collect()
    )
    assert a == b and 0 < len(a) < docs.count()
    assert stratified_sample(docs, F.lit(0)).count() == 0
    assert stratified_sample(docs, F.lit(100)).count() == docs.count()


def test_pack_sequences_conserves_tokens(spark):
    docs = load_table(spark, SF, "documents")
    packed = pack_sequences(docs, ctx_tokens=512)
    total_packed = packed.agg(
        F.sum("seq_tokens").alias("t"), F.sum("n_docs").alias("d")
    ).first()
    total_docs = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")).cast("long")).alias("t"),
        F.count(F.lit(1)).alias("d"),
    ).first()
    assert total_packed.t == total_docs.t and total_packed.d == total_docs.d
    # greedy overflow bound: every bin except a stratum's last holds
    # >= ctx - max_doc_tokens... weaker invariant checked exactly:
    # bins are dense 0..max per source
    per_src = packed.groupBy("source").agg(
        F.min("seq_id").alias("lo"), F.max("seq_id").alias("hi"), F.count(F.lit(1)).alias("n")
    )
    bad = per_src.filter((F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)).count()
    assert bad == 0


def test_repetition_signals_planted(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y"), (3, "w")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    r1 = rows[1]
    assert r1.n_tokens == 4
    assert r1.top_word_frac == 3 / 4
    assert r1.dup_word_frac == 2 / 4  # 4 tokens, 2 distinct
    assert r1.top_bigram_frac == 2 / 3  # "a a" twice of 3 bigrams
    assert rows[2].top_bigram_frac == 1 / 1
    r3 = rows[3]  # single token: no bigrams, no division blowup
    assert r3.n_tokens == 1 and r3.top_bigram_frac == 0.0


def test_pack_sequences_overflow_bounded(spark):
    """Greedy prefix-sum packing bound: a bin's token total never
    exceeds ctx + (max doc tokens in its stratum) — the straddling
    document overflows its bin, nothing else joins it."""
    import random

    rng = random.Random(7)
    rows = [
        (f"s{i % 3}", i, "w " * rng.randint(1, 300))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
    packed = pack_sequences(df, ctx_tokens=256)
    max_doc = (
        df.select(
            "source", F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("t")
        )
        .groupBy("source")
        .agg(F.max("t").alias("mx"))
    )
    viol = (
        packed.join(max_doc, "source")
        .filter(F.col("seq_tokens") > 256 + F.col("mx"))
        .count()
    )
    assert viol == 0


def test_pack_sequences_sharded_scales_and_conserves(spark):
    """docs_per_shard bounds the window partition size without losing
    tokens or determinism; seq_ids stay unique per stratum."""
    docs = load_table(spark, SF, "documents")
    packed = pack_sequences(docs, ctx_tokens=512, docs_per_shard=50)
    plain = pack_sequences(docs, ctx_tokens=512)
    for df in (packed, plain):
        t = df.agg(F.sum("seq_tokens").alias("t"), F.sum("n_docs").alias("d")).first()
        assert t.d == docs.count()
    assert (
        packed.agg(F.sum("seq_tokens")).first()[0]
        == plain.agg(F.sum("seq_tokens")).first()[0]
    )
    # unique (source, seq_id)
    assert packed.groupBy("source", "seq_id").count().filter("count > 1").count() == 0
    # every shard contributes at most docs_per_shard docs per bin range
    assert packed.filter(F.col("n_docs") > 50).count() == 0
    # rerun determinism under a different layout
    again = pack_sequences(docs.repartition(13), ctx_tokens=512, docs_per_shard=50)
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_shuffle_corpus_deterministic_and_balanced(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.operators.sampling import shuffle_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    out = shuffle_corpus(docs, num_shards=16)
    rows = out.select("doc_id", "shard", "pos_in_shard").collect()
    assert len(rows) == n
    # a permutation: every doc exactly once, positions contiguous per shard
    assert len({r["doc_id"] for r in rows}) == n
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    assert set(by_shard) <= set(range(16))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # md5 balance: no shard more than 3x the mean at fixture sizes
    assert max(len(v) for v in by_shard.values()) <= 3 * (n // 16 + 1)
    # rerun under a different layout → identical permutation
    again = shuffle_corpus(docs.repartition(7), num_shards=16)
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, again.select("doc_id", "shard", "pos_in_shard").collect())
    )
    # a different salt gives a different permutation
    other = shuffle_corpus(docs, num_shards=16, salt="epoch2")
    diff = (
        out.select("doc_id", "shard")
        .join(other.select("doc_id", F.col("shard").alias("s2")), "doc_id")
        .filter("shard != s2")
        .count()
    )
    assert diff > 0


def test_quantile_filter_keeps_exact_rank_fraction(spark):
    from realtime_cdc_pipeline_docker_spark.operators.sampling import quantile_filter

    rows = [(s, i, float((i * 37) % 101)) for s in ("a", "b") for i in range(100)]
    df = spark.createDataFrame(rows, "source string, doc_id long, quality double")
    kept = quantile_filter(df, "quality", keep_top=0.75)
    per = {r["source"]: r["count"] for r in kept.groupBy("source").count().collect()}
    # percent_rank >= 0.25 over 100 rows (ranks 0/99..99/99) keeps ranks 25..99
    assert per == {"a": 75, "b": 75}
    # the dropped quarter is exactly the lowest-quality rows per stratum
    dropped = df.join(kept.select("source", "doc_id"), ["source", "doc_id"], "left_anti")
    max_dropped = dropped.groupBy("source").agg(F.max("quality").alias("m")).collect()
    min_kept = kept.groupBy("source").agg(F.min("quality").alias("m")).collect()
    assert all(
        d["m"] < k["m"]
        for d in max_dropped for k in min_kept if True
    )


def test_vocab_topk_plan_uses_window_group_limit(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.operators.text import vocab_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = vocab_topk(docs, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_token_budget_mixture_fills_each_budget(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.operators.sampling import token_budget_mixture

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = token_budget_mixture(docs, F.lit(1000)).persist()
    per = {
        r["source"]: (r["tok"], r["mx"])
        for r in out.groupBy("source")
        .agg(
            F.sum("n_tok").alias("tok"),
            F.max(F.col("cum_tok") + F.col("n_tok")).alias("mx"),
        )
        .collect()
    }
    total_by_source = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t"))
        .collect()
    }
    for src, (tok, _mx) in per.items():
        if total_by_source[src] >= 1000:
            # budget reached, overflow bounded by one straddling doc:
            # every selected doc's exclusive prefix is < budget
            assert tok >= 1000
            assert out.filter(
                (F.col("source") == src) & (F.col("cum_tok") >= 1000)
            ).count() == 0
        else:
            assert tok == total_by_source[src]  # small stratum: take all
    # rerun under a different layout → identical selection
    again = token_budget_mixture(docs.repartition(7), F.lit(1000))
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # a different salt draws a different subset (budgets unchanged)
    other = token_budget_mixture(docs, F.lit(1000), salt="epoch2")
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in other.collect()}
    assert a != b
    out.unpersist()


def test_leakage_safe_split_colocates_duplicate_content(spark):
    """Byte-equal (after normalization) documents must land in the SAME
    split regardless of doc_id — the whole point of content-keyed
    splitting — and the assignment must be rerun-stable."""
    from realtime_cdc_pipeline_docker_spark.operators.sampling import leakage_safe_split

    rows = []
    for i in range(200):
        text = f"document body number {i} with several tokens of content"
        rows.append((i, text))
        rows.append((i + 10_000, "  " + text.upper() + "  "))  # normalized dup
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(df).select("doc_id", "split").collect()
    split_of = {r["doc_id"]: r["split"] for r in out}
    for i in range(200):
        assert split_of[i] == split_of[i + 10_000], i
    again = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(df).select("doc_id", "split").collect()
    }
    assert split_of == again
    assert {"train", "val", "test"} >= set(split_of.values())
    assert sum(s == "train" for s in split_of.values()) > 250  # ~90% of 400


def test_leakage_safe_split_plan_shuffle_free(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.operators.sampling import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents")
    plan = leakage_safe_split(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_documents_covers_every_token_with_overlap(spark):
    """Chunk windows must tile the document: first chunk starts at
    token 1, consecutive chunks advance by stride (overlap =
    chunk - stride), the last chunk reaches the final token, and a
    short document yields exactly one chunk."""
    from realtime_cdc_pipeline_docker_spark.operators.sampling import chunk_documents

    rows = [
        (1, " ".join(f"t{i}" for i in range(200))),   # multi-chunk
        (2, " ".join(f"u{i}" for i in range(64))),    # exactly one window
        (3, "just five little tokens here"),          # shorter than chunk
        (4, " ".join(f"v{i}" for i in range(65))),    # one token over
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=64, stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, n in ((1, 200), (2, 64), (3, 5), (4, 65)):
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_no"])
        expected = 1 + max(0, -(-(n - 64) // 48))
        assert len(chunks) == expected, (doc_id, len(chunks))
        assert chunks[0]["chunk_no"] == 0
        # every chunk except possibly the last is full; token coverage
        # is contiguous: start of chunk i is i*stride+1 (1-based), so
        # the last chunk must reach token n
        for i, c in enumerate(chunks[:-1]):
            assert c["n_tokens"] == 64, (doc_id, i)
        last = chunks[-1]
        assert last["chunk_no"] * 48 + last["n_tokens"] == n, doc_id
    # chunk identity: same text -> same hash, distinct text -> distinct
    hashes = [r["chunk_hash"] for r in by_doc[1]]
    assert len(set(hashes)) == len(hashes)


def test_chunk_documents_plan_shuffle_free(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.operators.sampling import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_exact_k_sample_properties(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.sampling import exact_k_sample

    docs = load_table(spark, sf_dir, "documents")
    out = exact_k_sample(docs, k=5)
    per = {r["source"]: r["n"] for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    sizes = {r["source"]: r["n"] for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    # Exactly k where the stratum has >= k rows, else the whole stratum.
    for src, n in per.items():
        assert n == min(5, sizes[src])
    # Deterministic: a rerun yields the identical id set.
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in exact_k_sample(docs, k=5).collect())
    assert a == b
    # Salt redraws the sample.
    c = sorted(r["doc_id"] for r in exact_k_sample(docs, k=5, salt="other").collect())
    assert a != c


def test_exact_k_sample_uses_window_group_limit(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.sampling import exact_k_sample

    docs = load_table(spark, sf_dir, "documents")
    plan = exact_k_sample(docs, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_quota_per_stratum_caps_and_ranks(spark):
    from realtime_cdc_pipeline_docker_spark.operators.sampling import quota_per_stratum

    docs = load_table(spark, SF, "documents").select("doc_id", "source", "n_chars")
    out = quota_per_stratum(
        docs, "source", 5, order_cols=(F.col("n_chars").desc(), F.col("doc_id"))
    )
    per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert all(v <= 5 for v in per.values()) and len(per) == 20
    # best-first: every kept doc is >= the stratum's dropped max rank
    kept = out.filter(F.col("source") == "src1").orderBy("quota_rank").collect()
    sizes = [r["n_chars"] for r in kept]
    assert sizes == sorted(sizes, reverse=True)
    # deterministic across runs
    again = quota_per_stratum(
        docs, "source", 5, order_cols=(F.col("n_chars").desc(), F.col("doc_id"))
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_quota_per_stratum_plans_window_group_limit(spark):
    from realtime_cdc_pipeline_docker_spark.operators.sampling import quota_per_stratum

    docs = load_table(spark, SF, "documents").select("doc_id", "source", "n_chars")
    plan = (
        quota_per_stratum(
            docs, "source", 5, order_cols=(F.col("n_chars").desc(), F.col("doc_id"))
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan  # beyond-quota rows die before the exchange


def test_dupcount_weighted_sample_weights_and_determinism(spark):
    from realtime_cdc_pipeline_docker_spark.operators.sampling import (
        dupcount_weighted_sample,
    )

    df = spark.createDataFrame(
        [(i, 1 if i < 1000 else 4) for i in range(1200)],
        "doc_id long, dup_count long",
    )
    out = dupcount_weighted_sample(df, rate_permille_per_dup=300)
    n_w1 = out.filter(F.col("dup_count") == 1).count()
    n_w4 = out.filter(F.col("dup_count") == 4).count()
    # weight 1 -> ~30% of 1000; weight 4 -> min(1, 1.2) = ALL 200
    assert 240 <= n_w1 <= 360
    assert n_w4 == 200
    again = dupcount_weighted_sample(df, rate_permille_per_dup=300)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
