"""Iterative graph analytics in exact integer arithmetic (SURVEY §2
extension — the fixpoint-iteration pattern beyond connected components,
reference has no analog; companion to operators/dedup.py:connected_components).

PageRank's textbook form is a float recurrence, which is
partition-order-dependent at the ulp level and therefore neither
rerun-stable nor cross-engine verifiable.  This module runs the SAME
recurrence in scaled integers: ranks are micro-mass units summing to
~10¹², per-edge contributions are integer divisions, and the damping
mix is a cross-multiplied integer expression — every iteration is
bit-deterministic on any cluster layout, and an independent engine
(DuckDB, unrolled CTEs) reproduces it exactly.  The truncation the
integer divisions introduce is bounded by (out-degree · iterations)
ulps of 10⁻¹² mass per node — noise far below any ranking decision,
and identical everywhere.

Scale shape: one distinct-edge shuffle up front, then per iteration a
rank⋈degree join (rank table is O(nodes), co-partitioned by key reuse),
an edge⋈contribution join (shuffles O(edges) longs — the unavoidable
term), and a map-side-combinable sum per destination.  ``localCheckpoint``
truncates lineage each round, exactly the connected-components pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import track_persisted

TOTAL_MASS = 1_000_000_000_000  # 10^12 micro-mass units


def integer_pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Deterministic damped PageRank over a directed edge list.

    Every node present as a source or destination gets an implicit
    SELF-LOOP: it guarantees out-degree ≥ 1 (no dangling-mass special
    case) and keeps the node set closed, at the cost of each node
    retaining d/(deg) of its own mass — a defined, documented variant
    (the self-loop is part of the recurrence both engines state).

    Recurrence (all integer):
        r₀        = TOTAL_MASS div N
        contrib_u = r_u div deg_u              (per out-edge)
        r'_v      = ((100-d)·r₀ + d·Σ contrib) div 100

    Returns (node, rank_u) — micro-mass longs.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    loops = nodes.select(
        F.col("node").alias("src"), F.col("node").alias("dst")
    )
    full = e.unionByName(loops).distinct()
    # Fold the source degree INTO the edge table and hash-partition it
    # by src ONCE, cached: each iteration is then a single
    # edges⋈ranks join (re-using the cached layout — InMemoryTableScan
    # preserves outputPartitioning, so only the O(nodes) rank table
    # moves) plus one map-side-combined sum per destination.  The
    # per-edge division recomputes rank div deg once per out-edge —
    # a codegen'd long division, cheaper than a second join carrying
    # a materialized contribution table every round.
    deg = full.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Registered with the session's persist tracker instead of
    # unpersisted here: every checkpoint below is LAZY, so nothing in
    # this function materializes the cache — an in-function unpersist
    # would fire before first use and silently rebuild the edge
    # subtree once per iteration (measured 2.8× on the full query).
    # The caller's release_persisted() frees it after the action.
    full_deg = full.join(deg, "src").repartition("src").persist()
    track_persisted(full_deg)
    n = deg.count()  # == |nodes|: every node self-loops
    r0 = TOTAL_MASS // n
    base = (100 - damping_pct) * r0

    ranks = deg.select(
        F.col("src").alias("node"), F.lit(r0).cast("long").alias("rank_u")
    ).localCheckpoint(eager=False)
    for i in range(n_iter):
        # The rank table is O(nodes) — broadcast it so the cached edge
        # partitions are probed in place (no per-round sort/shuffle of
        # the edges, which SortMergeJoin would redo every iteration).
        # Above the broadcast threshold (billion-node graphs), drop
        # the hint: both sides hash-partition on src and the cached
        # edge layout still re-uses, paying only the rank shuffle.
        incoming = (
            full_deg.join(
                F.broadcast(ranks.withColumnRenamed("node", "src")), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.expr("div(rank_u, deg)")).alias("incoming"))
        )
        ranks = incoming.select(
            F.col("dst").alias("node"),
            F.expr(f"div({base} + {damping_pct} * incoming, 100)")
            .cast("long")
            .alias("rank_u"),
        )
        # Truncate lineage every second round: halves the fixed
        # per-job cost while keeping the uncheckpointed chain short.
        if i % 2 == 1 or i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def pagerank_oracle_sql(edges_cte: str, n_iter: int = 10, damping_pct: int = 85) -> str:
    """DuckDB twin of ``integer_pagerank``: the same integer recurrence
    with the iteration UNROLLED into chained CTEs (recursive CTEs
    disallow the per-step aggregate).  ``edges_cte`` must be a SQL
    relation with columns (src BIGINT, dst BIGINT) — duplicates fine,
    self-loops added here, mirroring the operator."""
    parts = [
        f"WITH raw_edges AS ({edges_cte})",
        """e AS (SELECT DISTINCT src, dst FROM raw_edges),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    full_e AS (SELECT src, dst FROM e UNION
               SELECT node, node FROM nodes),
    deg AS (SELECT src, COUNT(*) AS deg FROM full_e GROUP BY src),
    params AS (SELECT (1000000000000 // COUNT(*)) AS r0 FROM nodes),
    r0 AS (SELECT src AS node, (SELECT r0 FROM params) AS rank_u FROM deg)""",
    ]
    prev = "r0"
    for i in range(1, n_iter + 1):
        parts.append(
            f"""r{i} AS (
      SELECT f.dst AS node,
             CAST(({100 - damping_pct} * (SELECT r0 FROM params)
                   + {damping_pct} * SUM(r.rank_u // d.deg)) // 100 AS BIGINT)
               AS rank_u
      FROM full_e f
      JOIN {prev} r ON r.node = f.src
      JOIN deg d ON d.src = f.src
      GROUP BY f.dst)"""
        )
        prev = f"r{i}"
    head = ",\n    ".join(parts)
    return f"{head}\n    SELECT node, rank_u FROM {prev}"
