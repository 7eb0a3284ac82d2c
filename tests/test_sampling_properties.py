"""Property-based tests for the corpus-shaping operators (SURVEY §5.4
model): hypothesis drives arbitrary small corpora against independent
Python models of the shuffle permutation and the quantile gate.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_cdc_pipeline_docker_spark.operators.sampling import (
    quantile_filter,
    shuffle_corpus,
)

ids_strategy = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40, unique=True
)


def model_shuffle(ids, num_shards, salt):
    """Independent model of shuffle_corpus: md5('salt:id'), shard from
    the first 15 hex chars mod num_shards, per-shard positions in
    (hex, id) order."""
    rows = []
    for i in ids:
        hx = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
        rows.append((int(hx[:15], 16) % num_shards, hx, i))
    out = {}
    for shard in {r[0] for r in rows}:
        members = sorted((hx, i) for s, hx, i in rows if s == shard)
        for pos, (_, i) in enumerate(members, start=1):
            out[i] = (shard, pos)
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(ids=ids_strategy, num_shards=st.sampled_from([1, 3, 16]))
def test_shuffle_corpus_matches_model(spark, ids, num_shards):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["shard"], r["pos_in_shard"])
        for r in shuffle_corpus(df, num_shards=num_shards).collect()
    }
    assert got == model_shuffle(ids, num_shards, "shuf")


rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),               # strata
        st.integers(min_value=0, max_value=500),   # key
        st.integers(min_value=0, max_value=9),     # metric (dense ties)
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: (t[0], t[1]),
)


def model_quantile(rows, keep_top):
    """Independent model: percent_rank = (rank-1)/(n-1) over
    (metric, key) per stratum; keep >= 1-keep_top; single-row strata
    have percent_rank 0 and always survive only if 1-keep_top <= 0 is
    False -> 0 >= 1-keep_top."""
    out = set()
    for s in {r[0] for r in rows}:
        members = sorted((m, k) for (st_, k, m) in rows if st_ == s)
        n = len(members)
        for idx, (_, k) in enumerate(members):
            pr = 0.0 if n == 1 else idx / (n - 1)
            if pr >= 1.0 - keep_top:
                out.add((s, k))
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy, keep_top=st.sampled_from([0.25, 0.5, 0.75, 1.0]))
def test_quantile_filter_matches_model(spark, rows, keep_top):
    df = spark.createDataFrame(
        [(s, k, float(m)) for s, k, m in rows],
        "source string, doc_id long, quality double",
    )
    got = {
        (r["source"], r["doc_id"])
        for r in quantile_filter(df, "quality", keep_top=keep_top).collect()
    }
    assert got == model_quantile(rows, keep_top)
