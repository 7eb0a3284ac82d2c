"""Property-based tests for the incremental (arrival-wave) dedup
relations (SURVEY §5.4 applied to the round-9..11 surface).

The planted-corpus tests pin hand-written cases; here hypothesis
drives arbitrary small corpora / pair graphs against independent
pure-Python models of the documented semantics:

- ``incremental_wave_fold`` (shared by j2m text near-dup and j5i media
  near-dup): dropped iff paired with an earlier-wave SURVIVOR or a
  smaller-id SAME-wave peer (peers shadow regardless of their own
  fate); first-ARRIVED survives.
- ``incremental_substring_dedup`` (j2o, the h16 batch twin): a k-token
  passage is cut iff some occurrence exists earlier in (wave, doc_id,
  pos) order, documents contributing their ORIGINAL gram streams
  regardless of cuts (the non-cascading ledger contract).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_cdc_pipeline_docker_spark.operators.dedup import (
    incremental_substring_dedup,
    incremental_wave_fold,
)

N_WAVES = 3

# Pair graphs over a small id space: dense enough that earlier-wave
# suppression, same-wave shadowing, and "dropped doc still shadows"
# all occur routinely.
pairs_strategy = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=8),
    ).filter(lambda p: p[0] < p[1]),
    max_size=16,
)


def model_wave_fold(ids: list[int], pairs: set[tuple[int, int]]) -> dict[int, bool]:
    """Sequential-by-wave reference model of first-arrived-survives."""
    wave = {i: i % N_WAVES for i in ids}
    adj: dict[int, set[int]] = {i: set() for i in ids}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    survivors: set[int] = set()
    out: dict[int, bool] = {}
    for w in range(N_WAVES):
        for i in sorted(x for x in ids if wave[x] == w):
            dropped = any(
                (p in survivors and wave[p] < w) or (wave[p] == w and p < i)
                for p in adj[i]
            )
            out[i] = not dropped
            if not dropped:
                survivors.add(i)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=pairs_strategy)
def test_wave_fold_matches_model(spark, pairs):
    ids = list(range(9))
    docs = spark.createDataFrame(
        [(i, i % N_WAVES) for i in ids], "doc_id long, wave long"
    )
    pair_df = spark.createDataFrame(
        sorted(pairs) or [(-1, -2)], "id_a long, id_b long"
    )
    if not pairs:
        pair_df = pair_df.filter("id_a >= 0")
    got = {
        r["doc_id"]: r["survived"]
        for r in incremental_wave_fold(docs, pair_df, N_WAVES).collect()
    }
    assert got == model_wave_fold(ids, pairs)


# Tiny token alphabet + short docs: heavy gram collisions across and
# within documents, so cross-wave cuts, same-wave shadowing, and
# within-doc repeats all occur.
K = 3
corpus_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=10
    ),
    min_size=1,
    max_size=6,
)


def model_substring(token_lists: list[list[str]]) -> dict[int, tuple[int, int, str]]:
    """Reference model: global first-occurrence over (wave, doc_id,
    pos) of the ORIGINAL gram streams, then per-doc cut of the union
    of [p, p + K - 1] over hit positions."""
    docs = {i: toks for i, toks in enumerate(token_lists)}
    occs = []  # (wave, doc_id, pos, gram)
    for i, toks in docs.items():
        for p in range(len(toks) - K + 1):
            occs.append((i % N_WAVES, i, p + 1, tuple(toks[p : p + K])))
    seen: set[tuple[str, ...]] = set()
    hits: dict[int, list[int]] = {i: [] for i in docs}
    for w, i, p, g in sorted(occs):
        if g in seen:
            hits[i].append(p)
        else:
            seen.add(g)
    out = {}
    for i, toks in docs.items():
        covered = set()
        for p in hits[i]:
            covered.update(range(p, p + K))
        kept = [t for j, t in enumerate(toks, start=1) if j not in covered]
        out[i] = (len(toks), len(toks) - len(kept), " ".join(kept))
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(token_lists=corpus_strategy)
def test_incremental_substring_matches_model(spark, token_lists):
    corpus = spark.createDataFrame(
        [
            (i, " ".join(toks), "en", "t", 0)
            for i, toks in enumerate(token_lists)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in incremental_substring_dedup(
            corpus, n_waves=N_WAVES, k=K
        ).collect()
    }
    assert got == model_substring(token_lists)
