"""Scale probes for the corpus operator families.

Replicates the fixture documents at 1x and 10x (replica copies at
shifted ids) and prints one JSON line per (probe, scale):

- ``keeper``: minhash LSH pairing + connected components + keeper
  decision (j2e shape).  Claim: CC rounds stay bounded (near-dup
  graphs are shallow) and wall-time grows ~linearly — the
  banded-bucket candidate generation, not an all-pairs term, dominates.
- ``shuffle``: deterministic md5 global shuffle (j6d shape).  Claim:
  per-shard row counts stay balanced and wall-time ~linear (one
  shuffle, no global sort).
- ``decon``: benchmark decontamination (j8 shape) against a fixed
  benchmark slice.  Claim: corpus side scales linearly — the
  benchmark gram set is broadcast, so 10x corpus ≈ 10x map work and
  the flagged-doc count scales with the replicas.
- ``chunk``: overlapping token-window chunking (j6h shape).  Claim:
  zero-exchange generate/project, wall-time ~linear in tokens.
- ``exact_k``: per-stratum reservoir (j6j shape).  Claim: output stays
  k x strata at every scale; the WindowGroupLimit exchange carries
  O(k x strata x map partitions), so wall-time ~linear.
- ``bpe``: iterative BPE merge training at fixed rounds (j9h shape).
  Claim: per-round cost is one map-side-combined pair count plus a
  codegen'd rewrite — wall-time ~linear in tokens.

- ``index_growth``: a FIXED probe batch against a 1x/10x AT-REST
  near-dup index ledger (h15 shape, VERDICT r9 #5).  Claim: per-batch
  cost tracks the batch (bucket-pruned probe + dbucket-pruned
  fingerprint fetch), not the ledger — probe-batch wall-time ~flat as
  the index grows.
- ``gram_ledger_growth``: the same fixed-batch axis for the
  incremental substring dedup (h16 shape).  Claim: the gbucket-pruned
  semi-join probe keeps probe-batch wall ~flat as the gram ledger
  grows 10x.
- ``curation_ledger_growth``: the same fixed-batch axis for the
  composed curation pipeline's ledgers (h23 shape, VERDICT r12 #1 —
  the last unbounded-state surface without a growth measurement).
  Claim: all three survivor-ledger probes (gbucket digest, bucket
  band index, dbucket curated-hs fetch) are bucket-pruned, so
  probe-batch wall ~flat as the at-rest ledgers grow 10x.

- ``snapshot_merge_growth``: a FIXED scattered change batch against a
  1x/10x snapshot table (operators/snapshot.py), under BOTH physical
  merge strategies.  Claim: MOR merge is ~flat (O(batch) delta
  append); COW merge of a scattered batch ~tracks table size (it
  rewrites every touched bucket) — the printed contrast is the
  reason both modes exist.  Compaction timed with visible-state
  parity.

Usage: python scripts/scale_probe.py [sf_dir] [scales...]
       python scripts/scale_probe.py [sf_dir] compaction
       python scripts/scale_probe.py [sf_dir] curation
       python scripts/scale_probe.py [sf_dir] snapshot
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.catalog import load_table, release_persisted
from realtime_cdc_pipeline_docker_spark.operators.dedup import (
    connected_components,
    decontaminate,
    dedup_keepers,
    minhash_lsh_pairs,
)
from realtime_cdc_pipeline_docker_spark.operators.sampling import (
    chunk_documents,
    exact_k_sample,
    shuffle_corpus,
)
from realtime_cdc_pipeline_docker_spark.session import get_session


def replicate(docs, scale: int):
    corpus = docs
    for r in range(1, scale):
        corpus = corpus.unionByName(
            docs.select((F.col("doc_id") + 1_000_000 * r).alias("doc_id"), "text")
        )
    return corpus


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if "compaction" in sys.argv[2:]:
        spark = get_session(app="scale-probe")
        probe_ledger_compaction(spark, sf_dir)
        return 0
    if "curation" in sys.argv[2:]:
        spark = get_session(app="scale-probe")
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        probe_curation_growth(spark, docs, [1, 10])
        probe_curation_compaction(spark, sf_dir)
        return 0
    if "snapshot" in sys.argv[2:]:
        spark = get_session(app="scale-probe")
        probe_snapshot_merge(spark, sf_dir, [1, 10])
        return 0
    scales = [int(s) for s in sys.argv[2:]] or [1, 10]
    spark = get_session(app="scale-probe")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    for scale in scales:
        corpus = replicate(docs, scale).persist()
        n_docs = corpus.count()  # materialize before the clock starts

        t0 = time.time()
        pairs = minhash_lsh_pairs(corpus, jaccard_threshold=0.5).persist()
        n_pairs = pairs.count()
        stats: dict = {}
        comp = connected_components(pairs, stats=stats)
        n_keep = dedup_keepers(corpus, pairs).filter("is_keeper").count()
        print(
            json.dumps(
                {
                    "probe": "keeper",
                    "scale": scale,
                    "n_docs": n_docs,
                    "n_pairs": n_pairs,
                    "cc_rounds": stats["rounds"],
                    "n_keepers": n_keep,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )
        pairs.unpersist()
        del comp

        # incremental: wave-ordered near-dup dedup (j2m/h15 shape —
        # replica copies land at shifted ids, so each replica wave
        # near-dups its original and the survivor count stays ~constant
        # while the corpus scales).  Claim: one LSH pass + n_waves
        # anti-joins over the pair table — wall-time ~linear, never a
        # per-wave corpus rescan.
        from realtime_cdc_pipeline_docker_spark.operators.dedup import (
            incremental_neardup_dedup,
        )

        t0 = time.time()
        inc = incremental_neardup_dedup(corpus).persist()
        n_inc_surv = inc.filter("survived").count()
        release_persisted()
        print(
            json.dumps(
                {
                    "probe": "incremental",
                    "scale": scale,
                    "n_docs": n_docs,
                    "n_survivors": n_inc_surv,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )
        inc.unpersist()

        t0 = time.time()
        sharded = shuffle_corpus(corpus, num_shards=64).groupBy("shard").count()
        szs = [r["count"] for r in sharded.collect()]
        print(
            json.dumps(
                {
                    "probe": "shuffle",
                    "scale": scale,
                    "n_docs": n_docs,
                    "shards": len(szs),
                    "max_over_mean": round(max(szs) / (sum(szs) / len(szs)), 3),
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )

        t0 = time.time()
        bench = docs.filter(F.col("doc_id") % 101 == 0).select("text")
        flagged = decontaminate(corpus, bench).count()
        release_persisted()
        print(
            json.dumps(
                {
                    "probe": "decon",
                    "scale": scale,
                    "n_docs": n_docs,
                    "n_flagged": flagged,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )

        # chunk: overlapping-window chunking (j6h shape).  Claim: pure
        # generate/project — rows out scale with tokens in, wall-time
        # ~linear, zero exchanges at any scale.
        t0 = time.time()
        n_chunks = chunk_documents(corpus).count()
        print(
            json.dumps(
                {
                    "probe": "chunk",
                    "scale": scale,
                    "n_docs": n_docs,
                    "n_chunks": n_chunks,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )

        # exact-k: per-stratum reservoir (j6j shape).  Claim: output is
        # k per stratum at EVERY scale (scale-invariant contract) and
        # wall-time ~linear — WindowGroupLimit truncates map-side, so
        # the exchange carries O(k x strata x map partitions), not rows.
        t0 = time.time()
        strat = corpus.withColumn("source", (F.col("doc_id") % 20).cast("string"))
        n_sample = exact_k_sample(strat, k=7).count()
        print(
            json.dumps(
                {
                    "probe": "exact_k",
                    "scale": scale,
                    "n_docs": n_docs,
                    "n_sample": n_sample,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )
        # fuzzy: SymSpell deletion-neighborhood pairs (j2g shape) over
        # replicated customer names (double-digit replica prefixes keep
        # replicas at edit distance >= 2 from each other, so the
        # distance-1 structure replicates without cross-replica pairs).
        # Claim: candidate generation is a linear explode — pairs and
        # wall-time scale ~linearly, never quadratically.
        from realtime_cdc_pipeline_docker_spark.operators.dedup import (
            fuzzy_neardup_pairs,
        )

        cust = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("id"), F.col("c_name").alias("name")
        )
        fuzz = cust
        for r in range(1, scale):
            fuzz = fuzz.unionByName(
                cust.select(
                    (F.col("id") + 1_000_000 * r).alias("id"),
                    F.concat(F.lit(f"{r}{r}#"), F.col("name")).alias("name"),
                )
            )
        fuzz = fuzz.persist()
        n_names = fuzz.count()
        t0 = time.time()
        n_fuzzy = fuzzy_neardup_pairs(fuzz, "name", "id").count()
        print(
            json.dumps(
                {
                    "probe": "fuzzy",
                    "scale": scale,
                    "n_names": n_names,
                    "n_pairs": n_fuzzy,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )
        fuzz.unpersist()

        # semantic: SemDeDup cluster-local pairing (j2f shape) over
        # replicated embeddings (replicas at shifted ids keep their
        # direction, so every replica lands in its original's cluster
        # and is cosine-1 DOMINATED by it — survivors stay constant at
        # 10x, the semantic contract).  Claim: pairing stays
        # CLUSTER-LOCAL — wall-time tracks sum(cluster_size²) within
        # the cap, so 10x data with the cap engaged grows ~linearly,
        # never all-pairs; dropped-oversized counts are observable.
        from realtime_cdc_pipeline_docker_spark.operators.similarity import (
            semantic_dedup,
        )

        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        sem = emb
        for r in range(1, scale):
            sem = sem.unionByName(
                emb.select(
                    (F.col("vec_id") + 1_000_000 * r).alias("vec_id"), "embedding"
                )
            )
        sem = sem.persist()
        n_vecs = sem.count()
        t0 = time.time()
        out = semantic_dedup(sem, id_col="vec_id").persist()
        n_rows = out.count()
        n_oversized = out.filter("oversized").count()
        release_persisted()
        print(
            json.dumps(
                {
                    "probe": "semantic",
                    "scale": scale,
                    "n_vecs": n_vecs,
                    "n_survivors": n_rows,
                    "n_in_oversized_clusters": n_oversized,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )
        out.unpersist()
        sem.unpersist()

        # mmr: per-query MMR re-rank (j3i shape) over a candidate pool
        # whose QUERY count scales (pool size fixed at N=20 — the
        # production contract: retrieval bounds the pool, MMR cost is
        # queries x N x k).  Claim: Arrow group count scales linearly,
        # per-group work is constant -> wall-time ~linear.
        from realtime_cdc_pipeline_docker_spark.operators.similarity import (
            brute_force_topk,
            mmr_rerank,
        )

        queries = sem.filter(F.col("vec_id") % 25 == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        cands = (
            brute_force_topk(emb, queries, k=20)
            .select(
                "query_id",
                F.col("neighbor_id").alias("vec_id"),
                F.col("sim").alias("score"),
            )
            .join(emb, "vec_id")
            .persist()
        )
        n_cands = cands.count()
        t0 = time.time()
        n_picked = mmr_rerank(cands, k=5).count()
        print(
            json.dumps(
                {
                    "probe": "mmr",
                    "scale": scale,
                    "n_queries": n_cands // 20,
                    "n_picked": n_picked,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )
        cands.unpersist()

        # tfidf: inverted-index cosine pairs (j3l shape).  The df band
        # is RELATIVE (df <= 10% of docs), so replication preserves the
        # 1x discrimination structure exactly (every df scales by 10
        # and so does the band edge — an earlier ABSOLUTE band emptied
        # the index at 10x, the bug this probe caught); the absolute
        # bucket cap bounds per-token join fan-out.  Claim: pairs grow
        # with the TRUE near-dup pair count (replication is
        # quadratic in replicas by construction — same as the keeper
        # probe) while wall-time stays bounded by the cap, and the
        # skipped buckets are observable (oversized_token_buckets).
        from realtime_cdc_pipeline_docker_spark.operators.text import (
            tfidf_cosine_pairs,
        )

        t0 = time.time()
        n_tfidf = tfidf_cosine_pairs(corpus).count()
        release_persisted()
        print(
            json.dumps(
                {
                    "probe": "tfidf",
                    "scale": scale,
                    "n_docs": n_docs,
                    "n_pairs": n_tfidf,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )

        # pagerank: integer PageRank over the customer↔supplier trade
        # graph (e18 shape), replicated as DISJOINT copies (node ids
        # offset per replica).  Claim: iteration count is fixed by
        # contract (not data), the cached partitioned edge table is
        # built once, and per-round cost tracks |edges| — so wall time
        # grows ~linearly and NEVER with rounds×quadratic terms.
        from realtime_cdc_pipeline_docker_spark.operators.graph import (
            integer_pagerank,
        )

        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
        orders_t = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        cs = li.join(orders_t, li["l_orderkey"] == orders_t["o_orderkey"]).select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        base_edges = cs.unionByName(
            cs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        g = base_edges
        for r in range(1, scale):
            off = 10_000_000 * r
            g = g.unionByName(
                base_edges.select(
                    (F.col("src") + off).alias("src"),
                    (F.col("dst") + off).alias("dst"),
                )
            )
        g = g.persist()
        n_edges = g.count()
        t0 = time.time()
        ranks = integer_pagerank(g, n_iter=10)
        n_nodes = ranks.count()
        release_persisted()
        print(
            json.dumps(
                {
                    "probe": "pagerank",
                    "scale": scale,
                    "n_edges": n_edges,
                    "n_nodes": n_nodes,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )
        g.unpersist()

        # bpe: iterative BPE merge training (j9h shape) at FIXED merge
        # rounds (the training contract: rounds are a hyper-parameter,
        # not data-driven).  Claim: each round is one explode →
        # map-side-combined pair count → TakeOrdered(1) plus a
        # codegen'd array-fold rewrite — all ~linear in tokens — and
        # localCheckpoint keeps lineage flat across rounds, so
        # wall-time at 10x corpus grows ~linearly, never with
        # rounds×data² terms (VERDICT r5 #7 / r6 #5: j9h is a top-5
        # bench cost with a previously unmeasured growth curve).
        from realtime_cdc_pipeline_docker_spark.operators.text import bpe_train

        t0 = time.time()
        merges = bpe_train(corpus, n_merges=5)
        release_persisted()
        print(
            json.dumps(
                {
                    "probe": "bpe",
                    "scale": scale,
                    "n_docs": n_docs,
                    "n_merges": len(merges),
                    "top_merge_count": merges[0][3] if merges else 0,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )

        # j2k shape: variable-length maximal-repeat spans.  Claim:
        # wall-time ~linear — one suffix-order sort (cap-bounded row
        # width) + neighbor LCP + per-doc interval union.  Replicas
        # make every document an exact whole-doc repeat of its twins,
        # so coverage correctly jumps to ~every doc with one
        # doc-spanning island (n_spans ≈ n_docs at 10×) — the
        # expected semantics, while wall-time tracks the suffix count.
        from realtime_cdc_pipeline_docker_spark.operators.dedup import (
            maximal_repeat_spans,
        )

        t0 = time.time()
        spans = maximal_repeat_spans(corpus).persist()
        n_spans = spans.count()
        docs_with = spans.select("doc_id").distinct().count()
        spans.unpersist()
        release_persisted()
        print(
            json.dumps(
                {
                    "probe": "substring",
                    "scale": scale,
                    "n_docs": n_docs,
                    "n_spans": n_spans,
                    "docs_with_spans": docs_with,
                    "sec": round(time.time() - t0, 2),
                }
            ),
            flush=True,
        )

        corpus.unpersist()

    probe_index_growth(spark, docs, scales)
    probe_gram_ledger_growth(spark, docs, scales)
    probe_curation_growth(spark, docs, scales)
    return 0


def probe_curation_growth(spark, docs, scales) -> None:
    """h23's version of the index_growth probe (VERDICT r12 #1): one
    FIXED probe batch against 1×/10× AT-REST curation ledgers.

    Growth axis: unlike h15's letter-rotation replicas (which the
    composed pipeline's QUALITY gates would reject — rotation destroys
    stopword/quality structure), the build corpus is a 1×/10× slice of
    REAL fixture documents (rank-ordered by doc_id), so gate pass
    rates are natural and all three survivor ledgers genuinely grow
    ~10×.  The fixed probe batch holds the build constant: 200 exact
    re-texts of build docs at fresh ids (each runs the full gate
    stack, then HITS the gbucket-pruned digest probe and drops) + 200
    held-out documents never ingested at any scale (each runs the
    whole pipeline and mostly appends).  The benchmark is a fixed
    held-out slice so the decontamination gate's broadcast side is
    scale-invariant.  Claim: probe-batch wall ~flat from 1× to 10×
    ledgers — per-batch cost tracks the BATCH, the 100 TB contract."""
    import shutil
    import tempfile

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_curation_pipeline_stream,
        write_arrival_wave,
    )

    ids = sorted(r[0] for r in docs.select("doc_id").collect())
    per_scale = min(400, (len(ids) - 440) // max(scales))
    if per_scale < 40:
        # real-document slices (not replicas — the quality gates reject
        # rotated text) need a table ≥ ~10×40+440 rows: use sf0.1
        print(
            json.dumps(
                {
                    "probe": "curation_ledger_growth",
                    "skipped": f"fixture has {len(ids)} docs; needs >=840 "
                    "(run against sf0.1)",
                }
            ),
            flush=True,
        )
        return
    base = docs.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("probe")
    ).withColumn("n_chars", F.length("text").cast("long"))
    # held-out regions (top of the id range): fresh probe docs + bench
    fresh_lo, fresh_hi = ids[-440], ids[-240]
    bench = base.filter(F.col("doc_id") >= ids[-40]).select("text")
    probe_dup = (
        base.filter(F.col("doc_id") <= ids[199])
        .withColumn("doc_id", F.col("doc_id") + 50_000_000)
    )
    probe_new = (
        base.filter(
            (F.col("doc_id") >= fresh_lo) & (F.col("doc_id") < fresh_hi)
        )
        .limit(200)
        .withColumn("doc_id", F.col("doc_id") + 60_000_000)
    )
    probe_batch = probe_dup.unionByName(probe_new).persist()
    probe_batch.count()

    for scale in scales:
        work = tempfile.mkdtemp(prefix=f"curation_growth_{scale}x_")
        try:
            build = base.filter(F.col("doc_id") <= ids[per_scale * scale - 1])
            src, log = f"{work}/src", f"{work}/log"
            write_arrival_wave(build, src, 0)
            run_curation_pipeline_stream(
                spark, src, bench, log, f"{work}/ckpt", index_buckets=32
            )
            ledger_rows = {
                sub: spark.read.parquet(f"{log}/{sub}").count()
                for sub in ("curated", "index", "digests")
            }

            write_arrival_wave(probe_batch, src, 1)
            t0 = time.time()
            out = run_curation_pipeline_stream(
                spark, src, bench, log, f"{work}/ckpt", index_buckets=32
            )
            sec = round(time.time() - t0, 2)
            probe_surv = out.filter(
                (F.col("doc_id") >= 50_000_000) & F.col("survived")
            ).count()
            print(
                json.dumps(
                    {
                        "probe": "curation_ledger_growth",
                        "scale": scale,
                        "curated_rows": ledger_rows["curated"],
                        "index_rows": ledger_rows["index"],
                        "digest_rows": ledger_rows["digests"],
                        "probe_batch_docs": 400,
                        "probe_survivors": probe_surv,
                        "probe_batch_sec": sec,
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    probe_batch.unpersist()


def probe_curation_compaction(spark, sf_dir: str, n_batches: int = 8) -> None:
    """VERDICT r12 #1's second row: ``compact_curation_ledgers`` after
    ``n_batches`` micro-batches PLUS a full wiped-checkpoint replay
    (every ledger row duplicated, one file per ledger per batch) —
    files/rows must fold and the stream's read-back relation
    (doc_id, quarantined, passed_quality, survived) must be IDENTICAL
    before and after (post-compaction parity, the
    h15/h16/ivfpq-probe methodology)."""
    import shutil
    import tempfile

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_curation_ledgers,
        run_curation_pipeline_stream,
        write_arrival_wave,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("probe")
    ).withColumn("n_chars", F.length("text").cast("long"))
    bench = docs.filter(F.col("doc_id") % 101 == 0).select("text")

    def read_back(log):
        audit = spark.read.parquet(f"{log}/audit").dropDuplicates(["doc_id"])
        accepted = (
            spark.read.parquet(f"{log}/curated").select("doc_id").distinct()
        )
        return sorted(
            (r["doc_id"], r["quarantined"], r["passed_quality"], r["__s"])
            for r in audit.join(
                accepted.withColumn("__s", F.lit(True)), "doc_id", "left"
            ).fillna({"__s": False}).collect()
        )

    work = tempfile.mkdtemp(prefix="curation_compaction_")
    try:
        src, log = f"{work}/src", f"{work}/log"
        for b in range(n_batches):
            write_arrival_wave(
                docs.filter(F.col("doc_id") % n_batches == b), src, b
            )
        for ckpt_round in range(2):  # 2nd run = wiped-checkpoint replay
            shutil.rmtree(f"{work}/ckpt", ignore_errors=True)
            run_curation_pipeline_stream(
                spark, src, bench, log, f"{work}/ckpt",
                max_files_per_trigger=1,
            )
        files_before = {
            sub: len(spark.read.parquet(f"{log}/{sub}").inputFiles())
            for sub in ("curated", "index", "digests", "audit")
        }
        t0 = time.time()
        relation_before = read_back(log)
        fold_before = round(time.time() - t0, 2)
        stats = compact_curation_ledgers(spark, log)
        t0 = time.time()
        relation_after = read_back(log)
        fold_after = round(time.time() - t0, 2)
        print(
            json.dumps(
                {
                    "probe": "curation_ledger_compaction",
                    "n_batches": n_batches,
                    "files_before": files_before,
                    "files_after": {
                        sub: stats[sub]["files_after"] for sub in stats
                    },
                    "rows_before": {
                        sub: stats[sub]["rows_before"] for sub in stats
                    },
                    "rows_after": {
                        sub: stats[sub]["rows_after"] for sub in stats
                    },
                    "fold_sec_before": fold_before,
                    "fold_sec_after": fold_after,
                    "read_back_parity": relation_before == relation_after,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_gram_ledger_growth(spark, docs, scales) -> None:
    """h16's version of the index_growth probe: a FIXED probe batch
    against a 1×/10× AT-REST gram ledger (run_substring_dedup_stream).
    Build with per-replica letter rotation (mutually-distinct grams →
    the ledger really is ``scale``× larger), then drain one fixed
    batch — 200 exact re-texts (every gram hits, whole doc cut) + 200
    rotated fresh docs (every gram misses, doc passes intact) — and
    clock only that drain.  Claim: the gbucket-pruned semi-join probe
    keeps probe-batch wall ~flat as the ledger grows."""
    import shutil
    import tempfile

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_substring_dedup_stream,
        write_arrival_wave,
    )

    alphabet = "abcdefghijklmnopqrstuvwxyz"
    base = docs.select("doc_id", "text").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("probe")).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    probe_dup = (
        base.orderBy("doc_id")
        .limit(200)
        .withColumn("doc_id", F.col("doc_id") + 50_000_000)
    )
    probe_new = (
        base.orderBy("doc_id")
        .limit(200)
        .withColumn("doc_id", F.col("doc_id") + 60_000_000)
        .withColumn(
            "text", F.translate("text", alphabet, alphabet[13:] + alphabet[:13])
        )
    )
    probe_batch = probe_dup.unionByName(probe_new).persist()
    probe_batch.count()

    for scale in scales:
        work = tempfile.mkdtemp(prefix=f"gram_growth_{scale}x_")
        try:
            corpus = base
            for r in range(1, scale):
                rot = alphabet[r % 25 + 1 :] + alphabet[: r % 25 + 1]
                corpus = corpus.unionByName(
                    base.withColumn(
                        "doc_id", F.col("doc_id") + 1_000_000 * r
                    ).withColumn("text", F.translate("text", alphabet, rot))
                )
            src = f"{work}/src"
            log = f"{work}/log"
            write_arrival_wave(corpus, src, 0)
            run_substring_dedup_stream(
                spark, src, log, f"{work}/ckpt", ledger_buckets=32
            )
            gram_rows = spark.read.parquet(f"{log}/grams").count()

            write_arrival_wave(probe_batch, src, 1)
            t0 = time.time()
            out = run_substring_dedup_stream(
                spark, src, log, f"{work}/ckpt", ledger_buckets=32
            )
            sec = round(time.time() - t0, 2)
            n_cut = out.filter("n_removed > 0").count()
            print(
                json.dumps(
                    {
                        "probe": "gram_ledger_growth",
                        "scale": scale,
                        "gram_rows": gram_rows,
                        "probe_batch_docs": 400,
                        "docs_cut_total": n_cut,
                        "probe_batch_sec": sec,
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    probe_batch.unpersist()


def probe_index_growth(spark, docs, scales) -> None:
    """h15's 100 TB claim, measured on the axis that actually grows:
    the AT-REST INDEX (VERDICT r9 #5).  The per-scale loop above grows
    the INCOMING corpus; a production ingest instead holds batch size
    ~fixed while the at-rest ledgers grow without bound — per-batch
    cost must track the BATCH (bucket-pruned probe + dbucket-pruned
    fingerprint fetch), not the ledger.

    Build: ingest a ``scale``× corpus of mutually-distinct documents
    (per-replica letter-rotation keeps replicas from near-dupping
    their originals, so the index really is ``scale``× larger), then
    deliver one FIXED probe batch — near-dups of indexed docs plus
    fresh docs — and time only that batch's drain.  Claim: probe-batch
    wall-time ~flat from 1× to 10× index."""
    import shutil
    import tempfile

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        run_neardup_ingest_stream,
        write_arrival_wave,
    )

    alphabet = "abcdefghijklmnopqrstuvwxyz"
    base = docs.select("doc_id", "text").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("probe")).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    # Fixed probe batch: 200 exact re-texts of indexed docs at new ids
    # (each must probe, verify at Jaccard 1.0, and drop) + 200 fresh
    # letter-rotated docs (each must probe, miss, and append).
    probe_dup = (
        base.orderBy("doc_id")
        .limit(200)
        .withColumn("doc_id", F.col("doc_id") + 50_000_000)
    )
    probe_new = (
        base.orderBy("doc_id")
        .limit(200)
        .withColumn("doc_id", F.col("doc_id") + 60_000_000)
        .withColumn(
            "text", F.translate("text", alphabet, alphabet[13:] + alphabet[:13])
        )
        .withColumn("source", F.lit("fresh"))
    )
    probe_batch = probe_dup.unionByName(probe_new).persist()
    probe_batch.count()

    for scale in scales:
        work = tempfile.mkdtemp(prefix=f"idx_growth_{scale}x_")
        try:
            corpus = base
            for r in range(1, scale):
                rot = alphabet[r % 25 + 1 :] + alphabet[: r % 25 + 1]
                corpus = corpus.unionByName(
                    base.withColumn(
                        "doc_id", F.col("doc_id") + 1_000_000 * r
                    ).withColumn("text", F.translate("text", alphabet, rot))
                )
            src = f"{work}/src"
            log = f"{work}/log"
            write_arrival_wave(corpus, src, 0)
            run_neardup_ingest_stream(
                spark, src, log, f"{work}/ckpt_build", index_buckets=32
            )
            idx_rows = spark.read.parquet(f"{log}/index").count()

            write_arrival_wave(probe_batch, src, 1)
            t0 = time.time()
            out = run_neardup_ingest_stream(
                spark, src, log, f"{work}/ckpt_build", index_buckets=32
            )
            # Clock stops at drain completion: the claim is per-BATCH
            # cost vs index size; the read-back count below scans the
            # whole (deliberately corpus-sized) docs ledger.
            sec = round(time.time() - t0, 2)
            n_surv = out.count()
            print(
                json.dumps(
                    {
                        "probe": "index_growth",
                        "scale": scale,
                        "index_rows": idx_rows,
                        "probe_batch_docs": 400,
                        "survivors_total": n_surv,
                        "probe_batch_sec": sec,
                    }
                ),
                flush=True,
            )
        finally:
            shutil.rmtree(work, ignore_errors=True)
    probe_batch.unpersist()




def probe_ledger_compaction(spark, sf_dir: str, n_batches: int = 24) -> None:
    """VERDICT r10 #2's probe row: read-back cost of the h18
    candidates ledger and the h19 media ledgers, before and after
    compaction, after ``n_batches`` micro-batches have appended.

    h18's ledger grows |queries|×k rows per batch regardless of batch
    size; ``compact_topk_ledger`` resets it to |queries|×k TOTAL (the
    containment theorem makes that exact), so read-back work is flat
    over the stream's life instead of linear in drained batches.  The
    media compactor folds replay/append duplicates and the per-batch
    file sprawl the same way ``compact_neardup_ledgers`` does.

    Invoke: ``python scripts/scale_probe.py <sf_dir> compaction``."""
    import shutil
    import tempfile

    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_media_ledgers,
        compact_topk_ledger,
        run_media_dedup_stream,
        run_topk_maintenance_stream,
        write_arrival_wave,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    work = tempfile.mkdtemp(prefix="topk_compaction_")
    try:
        src, log = f"{work}/src", f"{work}/log"
        for b in range(n_batches):
            write_arrival_wave(
                emb.filter(F.col("vec_id") % n_batches == b), src, b
            )
        run_topk_maintenance_stream(
            spark, src, queries, log, f"{work}/ckpt",
            k=5, max_files_per_trigger=1,
        )
        led = spark.read.parquet(log)
        rows_before, files_before = led.count(), len(led.inputFiles())
        t0 = time.time()
        spark.read.parquet(log).dropDuplicates(
            ["query_id", "neighbor_id"]
        ).count()
        fold_before = round(time.time() - t0, 2)
        stats = compact_topk_ledger(spark, log, k=5)
        t0 = time.time()
        spark.read.parquet(log).dropDuplicates(
            ["query_id", "neighbor_id"]
        ).count()
        fold_after = round(time.time() - t0, 2)
        print(
            json.dumps(
                {
                    "probe": "topk_ledger_compaction",
                    "n_batches": n_batches,
                    "rows_before": rows_before,
                    "rows_after": stats["rows_after"],
                    "files_before": files_before,
                    "files_after": stats["files_after"],
                    "fold_sec_before": fold_before,
                    "fold_sec_after": fold_after,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("probe")
    ).withColumn("n_chars", F.length("text").cast("long"))
    work = tempfile.mkdtemp(prefix="media_compaction_")
    try:
        src, log = f"{work}/src", f"{work}/log"
        for b in range(n_batches):
            write_arrival_wave(
                docs.filter(F.col("doc_id") % n_batches == b), src, b
            )
        run_media_dedup_stream(
            spark, src, log, f"{work}/ckpt", max_files_per_trigger=1
        )
        led = spark.read.parquet(f"{log}/index")
        rows_before, files_before = led.count(), len(led.inputFiles())
        stats = compact_media_ledgers(spark, log)
        led = spark.read.parquet(f"{log}/index")
        print(
            json.dumps(
                {
                    "probe": "media_ledger_compaction",
                    "n_batches": n_batches,
                    "index_rows_before": rows_before,
                    "index_rows_after": led.count(),
                    "index_files_before": files_before,
                    "index_files_after": stats["index"]["files_after"],
                    "docs_files_before": stats["docs"]["files_before"],
                    "docs_files_after": stats["docs"]["files_after"],
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # VERDICT r11 #3's probe row: the maintained IVF-PQ layout after
    # n_batches appends PLUS a full wiped-checkpoint replay (every row
    # duplicated) — compact_index_layout must fold the duplicates and
    # the per-batch file sprawl while the ADC read-back stays flat.
    from realtime_cdc_pipeline_docker_spark.operators.similarity import (
        seed_codebook,
        train_ivf_centroids,
    )
    from realtime_cdc_pipeline_docker_spark.functions import vec_normalize
    from realtime_cdc_pipeline_docker_spark.streaming.ingest import (
        compact_index_layout,
        run_ivfpq_maintenance_stream,
    )

    centroids = train_ivf_centroids(emb, n_centroids=16)
    codebook = seed_codebook(
        emb.select("vec_id", vec_normalize("embedding").alias("embedding")),
        k=16,
    )
    work = tempfile.mkdtemp(prefix="ivfpq_compaction_")
    try:
        src, idx = f"{work}/src", f"{work}/index"
        for b in range(n_batches):
            write_arrival_wave(
                emb.filter(F.col("vec_id") % n_batches == b), src, b
            )
        for ckpt in (f"{work}/ckpt", f"{work}/ckpt"):  # 2nd run = wiped replay
            shutil.rmtree(ckpt, ignore_errors=True)
            run_ivfpq_maintenance_stream(
                spark, src, centroids, codebook, idx, ckpt,
                max_files_per_trigger=1,
            )
        led = spark.read.parquet(idx)
        rows_before, files_before = led.count(), len(led.inputFiles())
        t0 = time.time()
        spark.read.parquet(idx).dropDuplicates(["cluster", "vec_id"]).count()
        fold_before = round(time.time() - t0, 2)
        stats = compact_index_layout(spark, idx)
        t0 = time.time()
        spark.read.parquet(idx).dropDuplicates(["cluster", "vec_id"]).count()
        fold_after = round(time.time() - t0, 2)
        print(
            json.dumps(
                {
                    "probe": "ivfpq_index_compaction",
                    "n_batches": n_batches,
                    "rows_before": rows_before,
                    "rows_after": stats["rows_after"],
                    "files_before": files_before,
                    "files_after": stats["files_after"],
                    "fold_sec_before": fold_before,
                    "fold_sec_after": fold_after,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)




def probe_snapshot_merge(spark, sf_dir: str, scales) -> None:
    """The snapshot table's growth axis (operators/snapshot.py): what a
    FIXED narrow change batch costs against a 1x vs 10x table, under
    each physical merge strategy.

    Expectations, stated before the numbers: MOR merge appends
    O(batch) delta files — ~flat across table scale.  COW merge of a
    SCATTERED batch touches ~every hash bucket and therefore rewrites
    ~the whole table — cost ~tracks table size.  That contrast is the
    reason both modes exist; the probe prints it instead of asserting
    it away.  Compaction (the MOR maintenance cost) is also timed,
    with a visible-state parity check before/after.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from realtime_cdc_pipeline_docker_spark.catalog import load_table as _lt
    from realtime_cdc_pipeline_docker_spark.operators.snapshot import (
        compact_snapshot_deltas,
        init_snapshot_table,
        merge_apply,
        read_snapshot,
    )

    orders = _lt(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    )
    base_max = orders.agg(F.max("id")).collect()[0][0]
    work = tempfile.mkdtemp(prefix="snapshot_probe_")
    try:
        for scale in scales:
            big = orders
            for r in range(1, scale):
                big = big.unionByName(
                    orders.select(
                        (F.col("id") + 10_000_000 * r).alias("id"),
                        "status",
                        "total",
                    )
                )
            bootstrap = big.select(
                "id",
                "status",
                "total",
                F.lit(1).cast("bigint").alias("v"),
                F.lit("c").alias("op"),
            )
            # Fixed probe batch at EVERY scale: 1000 updates + 500
            # deletes of base-range keys (present at all scales) + 500
            # inserts of fresh keys -- scattered, so COW must touch
            # ~every bucket.
            upd = orders.filter(F.col("id") % 15 == 1).limit(1000).select(
                "id", F.lit("P").alias("status"),
                (F.col("total") + 1).alias("total"),
                F.lit(2).cast("bigint").alias("v"), F.lit("u").alias("op"))
            dele = orders.filter(F.col("id") % 15 == 2).limit(500).select(
                "id", "status", "total",
                F.lit(2).cast("bigint").alias("v"), F.lit("d").alias("op"))
            ins = orders.filter(F.col("id") % 15 == 3).limit(500).select(
                (F.col("id") + 777_000_000).alias("id"), "status", "total",
                F.lit(2).cast("bigint").alias("v"), F.lit("c").alias("op"))
            batch = upd.unionByName(dele).unionByName(ins).persist()
            n_batch = batch.count()

            for mode in ("mor", "cow"):
                root = f"{work}/tbl_{scale}_{mode}"
                init_snapshot_table(
                    spark, root, key_cols=["id"], version_col="v",
                    num_buckets=32,
                )
                t0 = time.time()
                merge_apply(spark, root, bootstrap)
                t_boot = time.time() - t0

                t0 = time.time()
                new_live = merge_apply(spark, root, batch, mode=mode)
                t_merge = time.time() - t0
                # write amplification, in DATA: rows physically written
                # by the probe merge's version (COW: every touched
                # bucket's rewrite ~= the table for a scattered batch;
                # MOR: the batch).  At fixture scale the SECONDS are
                # job-overhead-bound and hide this term -- the rewritten
                # row count is the honest scale observable.
                vname = new_live.rstrip("/").rsplit("/", 1)[-1]
                rewritten = spark.read.parquet(f"{root}/data/{vname}").count()

                t0 = time.time()
                n_visible = read_snapshot(spark, root).count()
                t_read = time.time() - t0

                row = {
                    "probe": "snapshot_merge_growth",
                    "scale": scale,
                    "mode": mode,
                    "batch_rows": n_batch,
                    "bootstrap_sec": round(t_boot, 2),
                    "merge_sec": round(t_merge, 2),
                    "rows_rewritten": rewritten,
                    "read_sec": round(t_read, 2),
                    "visible_rows": n_visible,
                }
                if mode == "mor":
                    state_before = n_visible
                    t0 = time.time()
                    stats = compact_snapshot_deltas(spark, root)
                    row["compact_sec"] = round(time.time() - t0, 2)
                    t0 = time.time()
                    n_after = read_snapshot(spark, root).count()
                    row["read_after_compact_sec"] = round(time.time() - t0, 2)
                    row["compact_parity"] = bool(n_after == state_before)
                    row["compacted_buckets"] = stats["compacted_buckets"]
                print(json.dumps(row), flush=True)
            batch.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
