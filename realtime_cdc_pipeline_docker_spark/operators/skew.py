"""Skew-mitigation operators (SURVEY §4 / BASELINE north star: "skewed
keys → salting or AQE skew-join").

AQE handles skewed *sort-merge joins* automatically
(``spark.sql.adaptive.skewJoin``) by splitting oversized partitions.
Two shapes it does NOT fix, provided here:

- **Non-algebraic aggregation under hot keys** (``collect_list``,
  ``collect_set``, exact ``count_distinct`` re-expressed as two-phase):
  partial aggregation can't shrink these map-side, so one hot key lands
  its entire payload on one reducer.  ``salted_collect_agg`` splits each
  key across ``n_salts`` reducers and merges the per-salt results in a
  second, tiny aggregate.
- **Hot-key broadcast-side blowup**: when the build side is small but a
  handful of probe keys dominate, ``salted_join`` replicates the build
  side per salt so the probe side spreads hot keys over n_salts tasks
  without any skew detection machinery.

Both are pure DataFrame transforms: deterministic salts (hash of a
unique column, not rand()), so results are reproducible and retries are
safe — a requirement for checkpointed streaming jobs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_cols: Sequence[str], n_salts: int) -> DataFrame:
    """Deterministic salt column in [0, n_salts) from unique columns."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in unique_cols]), F.lit(n_salts))
    )


def salted_collect_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    collect_col: str,
    unique_cols: Sequence[str],
    n_salts: int = 16,
    result_col: str = "items",
) -> DataFrame:
    """collect_set per key, skew-safe: phase 1 collects per (key, salt)
    across ``n_salts`` reducers; phase 2 flattens the ≤n_salts partial
    arrays per key.  The second shuffle moves one row per (key, salt) —
    no reducer ever sees a whole hot key's raw rows."""
    salted = with_salt(df, unique_cols, n_salts)
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        F.collect_set(collect_col).alias("__part")
    )
    return (
        phase1.groupBy(*key_cols)
        .agg(F.array_distinct(F.flatten(F.collect_list("__part"))).alias(result_col))
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    n_salts: int = 8,
    probe_unique_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Inner equi-join that spreads hot probe keys over ``n_salts``
    tasks: the probe side gets a deterministic salt, the (small) build
    side is replicated once per salt value, and the join keys on
    (key, salt).  Output equals ``probe.join(build, on)`` exactly.

    The salt must NOT be a function of the join key alone — every row of
    a hot key would hash to one salt and nothing would spread.  Callers
    pass ``probe_unique_cols`` (columns that vary within a key); without
    them the salt is derived from ALL probe columns, which spreads any
    hot key whose rows differ anywhere (rows identical in every column
    still co-locate — they carry no distinguishing bits to salt on)."""
    if probe_unique_cols is not None and list(probe_unique_cols) == [on]:
        raise ValueError(
            "probe_unique_cols=[join key] derives the salt from the key itself, "
            "so a hot key maps to ONE salt and the join spreads nothing; pass "
            "columns that vary within a key, or omit to salt on all columns"
        )
    probe_u = probe_unique_cols or probe.columns
    p = with_salt(probe, probe_u, n_salts)
    b = build.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return p.join(b, [on, "__salt"]).drop("__salt")
