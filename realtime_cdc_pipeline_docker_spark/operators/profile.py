"""Single-pass table profiling (data-quality surface).

The reference pipeline has no data-quality stage at all — a schema
change or a NULL-ridden delivery flows straight into the mart
(reference cdc_processor.py appends whatever decodes).  A 100 TB
ingest needs the opposite: a cheap profile of every landed table —
row/null/distinct counts and value ranges per column — to gate
downstream jobs and drive partition statistics.

Plan shape: ONE aggregation pass over the table computes every
column's metrics (count / non-null count / approx-free distinct /
min / max side by side in the same hash aggregate), then an in-memory
``stack`` unpivots the single result row into the tall
``(column_name, metric...)`` relation.  N columns cost one scan and
one exchange, not N scans — the difference between a profile you run
on every delivery and one you run never.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) into a tall relation:
    ``(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)``
    with min/max rendered as strings so heterogeneous column types
    share one schema.  Callers with doubles/timestamps should project
    them to exact integer units first (``functions.fixed_units`` /
    epoch micros) — string-rendering floats is engine-dependent and
    this operator refuses to guess."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nn`, `{c}__nd`, `{c}__mn`, `{c}__mx`" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, __nn, n_distinct, min_value, max_value)"
        ),
        F.col("__n_rows").alias("n_rows"),
    ).select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def histogram(
    df: DataFrame,
    value_col,
    lo: int,
    hi: int,
    nbuckets: int,
) -> DataFrame:
    """Equi-width histogram over an exact-integer value column — the
    distribution summary behind partition-balance checks and
    ClickHouse's ``histogram()`` aggregate, in exact arithmetic.

    ``value_col`` must be (or cast to) integer units (cents, micros —
    see ``functions.fixed_units``): bucket membership computed on
    floats would put boundary values in engine-dependent buckets.
    Buckets are ``[lo + i*w, lo + (i+1)*w)`` with ``w = (hi-lo)/
    nbuckets`` (caller guarantees divisibility — asserted); values
    outside ``[lo, hi)`` clamp into the edge buckets, so the histogram
    partitions the input (``SUM(n_rows) == COUNT(*)`` always).

    Plan: one scan → one map-side-combinable hash aggregate on at most
    ``nbuckets`` groups — profile-cheap at any scale, no sort, no
    second pass for bounds (they are caller-declared, which is what
    makes the result layout-stable across deliveries)."""
    assert (hi - lo) % nbuckets == 0, "pick bounds divisible by nbuckets"
    w = (hi - lo) // nbuckets
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    # Integral `div`, never float `/` + floor: a 64-bit value above
    # 2^53 would round in double space and can cross a bucket boundary.
    # Clamping first makes the dividend non-negative, so truncating
    # `div` equals floor division.
    x = F.least(F.greatest(v - F.lit(lo), F.lit(0)), F.lit(hi - lo - 1)).cast("long")
    return (
        df.select(x.alias("__x"), v.alias("__v"))
        .select(F.expr(f"__x div {w}").alias("bucket_no"), "__v")
        .groupBy("bucket_no")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__v").alias("sum_value"),
        )
        .select(
            "bucket_no",
            (F.lit(lo) + F.col("bucket_no") * w).alias("bucket_lo"),
            (F.lit(lo) + (F.col("bucket_no") + 1) * w).alias("bucket_hi"),
            "n_rows",
            "sum_value",
        )
    )
