"""Join decompositions the optimizer won't do for you.

Spark plans an OR-of-equalities join condition (`a.k1 = b.k1 OR
a.k2 = b.k2`) as BroadcastNestedLoopJoin — O(|A|·|B|) comparisons,
the single most common accidental scale-killer in entity-resolution
workloads (match on email OR phone; join on current-key OR legacy-key).
The fix is algebraic, not physical, so it belongs to the engine:

    J_or = J_1  ∪  σ(¬match_1)(J_2)  ∪  σ(¬match_1 ∧ ¬match_2)(J_3) …

Every branch is a plain hash-shuffle equi-join on its own key; the
exclusion residuals (null-safe, so NULL keys route correctly) make the
union exact — each qualifying pair is produced by exactly ONE branch,
the first whose key matches.  N branches cost N shuffles of the inputs,
vs the nested-loop's |A|·|B| — at 100 TB that is the difference between
a job and no job.  tests/test_or_join.py proves the naive form plans a
nested loop while this one stays broadcast/sort-merge hash joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def or_equi_join(
    left: DataFrame,
    right: DataFrame,
    key_pairs: Sequence[tuple[str, str]],
) -> DataFrame:
    """Inner join on ``OR(left[l] == right[r] for l, r in key_pairs)``,
    decomposed into one equi-join per key pair.  Column names must be
    disjoint across the two inputs (the result carries all of them)."""
    assert key_pairs, "need at least one key pair"
    branches = []
    for i, (l, r) in enumerate(key_pairs):
        cond = left[l] == right[r]
        for pl, pr in key_pairs[:i]:
            # Exclusion = "the earlier equality was NOT TRUE".  NOT
            # eqNullSafe would be wrong here: a NULL==NULL earlier key
            # never matched in branch i (SQL equality is null-rejecting)
            # but eqNullSafe calls it equal and would drop the pair.
            cond = cond & F.coalesce(
                ~(left[pl] == right[pr]), F.lit(True)
            )
        branches.append(left.join(right, cond, "inner"))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out
