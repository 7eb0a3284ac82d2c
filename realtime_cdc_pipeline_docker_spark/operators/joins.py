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


def null_skew_left_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
) -> DataFrame:
    """LEFT join that routes NULL-keyed fact rows AROUND the join.

    A nullable FK never matches (SQL equality is null-rejecting), yet a
    shuffle join still hashes every NULL-keyed row to ONE reducer —
    with optional FKs at 30-50 % NULL, that single partition carries
    half the fact table and the stage runs at straggler speed.  AQE's
    skew splitter can dilute it after the fact; the algebraic fix is to
    never shuffle those rows at all:

        fact ⟕ dim  =  σ(k IS NOT NULL)(fact) ⟕ dim
                        ∪  σ(k IS NULL)(fact) × {NULL dim columns}

    The NULL branch is a pure scan-side projection (no exchange — the
    plan shows the join subtree only under the NOT NULL filter), and
    the union is exact: a NULL key contributes exactly its unmatched
    row in both forms.  Result columns = fact columns + dim columns,
    like a plain left join with disjoint names."""
    matched = fact.filter(F.col(fact_key).isNotNull()).join(
        dim, F.col(fact_key) == dim[dim_key], "left"
    )
    nulls = fact.filter(F.col(fact_key).isNull()).select(
        "*", *[F.lit(None).cast(f.dataType).alias(f.name) for f in dim.schema.fields]
    )
    return matched.unionByName(nulls)
