"""Semantics tests for the integer PageRank operator (operators/graph.py).

The e18 oracle replays the operator's own recurrence in DuckDB, which
verifies cross-engine determinism but not that the recurrence IS
PageRank.  These tests pin the semantics independently: a hand python
model, known structural orderings, and the mass-conservation bound.
"""

from __future__ import annotations

from realtime_cdc_pipeline_docker_spark.operators.graph import (
    TOTAL_MASS,
    integer_pagerank,
)


def model_pagerank(edges, n_iter=10, damping_pct=85):
    """Independent dict-based model of the documented recurrence
    (self-loops added, integer divisions, damping mix)."""
    e = set(edges)
    nodes = {s for s, _ in e} | {d for _, d in e}
    e |= {(v, v) for v in nodes}
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    n = len(nodes)
    r0 = TOTAL_MASS // n
    base = (100 - damping_pct) * r0
    ranks = {v: r0 for v in nodes}
    for _ in range(n_iter):
        incoming = {v: 0 for v in nodes}
        for s, d in e:
            incoming[d] += ranks[s] // deg[s]
        ranks = {v: (base + damping_pct * incoming[v]) // 100 for v in nodes}
    return ranks


def run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["rank_u"] for r in integer_pagerank(df, **kw).collect()
    }


def test_matches_python_model_on_irregular_graph(spark):
    edges = [
        (1, 2), (2, 1), (3, 1), (4, 1), (5, 1),   # 1 is a hub
        (2, 3), (3, 4), (4, 5),                   # a chain
        (6, 1), (1, 6), (6, 6),                   # explicit self-loop dup
    ]
    assert run(spark, edges) == model_pagerank(edges)


def test_star_center_outranks_leaves(spark):
    edges = [(i, 0) for i in range(1, 8)] + [(0, i) for i in range(1, 8)]
    ranks = run(spark, edges)
    center = ranks[0]
    assert all(center > ranks[i] for i in range(1, 8))
    # leaves are symmetric → identical ranks
    assert len({ranks[i] for i in range(1, 8)}) == 1


def test_mass_conserved_within_truncation_bound(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 2)]
    ranks = run(spark, edges, n_iter=10)
    total = sum(ranks.values())
    # each node loses < deg ulps per division round plus the final /100;
    # bound generously: 100 units per node per iteration
    assert abs(total - TOTAL_MASS) < 100 * len(ranks) * 10


def test_no_damping_fixpoint_is_uniform_on_regular_graph(spark):
    # 4-cycle (+self-loops) is 2-regular: the uniform vector is the
    # exact fixpoint, so ranks stay equal at any damping
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
    ranks = run(spark, edges, n_iter=3, damping_pct=100)
    assert len(set(ranks.values())) == 1


def test_pagerank_audit_sees_through_checkpoint(spark, sf_dir):
    """plan_audit companion surface (VERDICT r7 #2): the query's own
    plan IS checkpoint-truncated (bare Scan ExistingRDD — the detector
    must say so), while pagerank_round_plan exposes the real
    per-iteration shape: a broadcast rank⋈edge join and the
    per-destination aggregate's exchange."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent / "scripts"))
    from plan_audit import audit, formatted_plan, is_truncated

    from realtime_cdc_pipeline_docker_spark.operators.graph import (
        integer_pagerank,
        pagerank_round_plan,
    )

    from pyspark.sql import functions as F

    # spark.range, not createDataFrame: a local-list source itself
    # plans as Scan ExistingRDD and would false-positive the detector.
    edges = spark.range(12).select(
        (F.col("id") % 4).alias("src"), ((F.col("id") + 1) % 4).alias("dst")
    )
    final = integer_pagerank(edges, n_iter=2)
    assert is_truncated(formatted_plan(final))

    inner = audit(formatted_plan(pagerank_round_plan(edges)))
    assert not inner["truncated"]
    assert inner["exchanges"] >= 1
    assert any("BroadcastHashJoin" in j for j in inner["joins"])
    assert inner["python"] == "no"
