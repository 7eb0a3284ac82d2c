"""Temporal joins Spark lacks as built-ins: as-of join and interval
(range) join — core time-series/feature-store operations a user of the
reference's mart tables reaches for next (latest order state *as of* an
event; events falling *inside* an incident window).

Both are expressed as compositions of existing DataFrame ops — no UDFs,
no driver loops — chosen for their shuffle shape:

- **as-of join**: the union-markers + window pattern.  Tag both inputs,
  union, ONE hash-partition shuffle on the key, sort by time within
  partitions, and let ``last(..., ignorenulls=True)`` carry the most
  recent right payload forward onto each left row.  This is
  O(n log n_partition) with a single shuffle — never the naive
  pair-explosion (equi-join then filter+rank), which materializes
  |left|×|right-per-key| rows before pruning.
- **range join**: time-bucketing.  Intervals explode to the buckets
  they cover (``sequence`` — bounded by interval/bucket width), points
  map to one bucket, and the join becomes an equi-join on
  (keys…, bucket) + an exact residual filter.  A point matches an
  interval in exactly one bucket (its own), so no dedup pass is needed.

At 100 TB: both shuffle on (key[, bucket]) — hot keys are the risk.
For as-of with a bounded ``tolerance`` the timeline can additionally be
bucketed (right rows duplicated into the following bucket) to split hot
keys; unbounded as-of is inherently per-key-sequential, same as any
engine's.  Range-join bucket width tunes the explode factor vs bucket
population: set it near the typical interval length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import epoch_us, is_timestamp_type


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def _as_seconds(col: Column, dtype) -> Column:
    """Timeline column → seconds-scale double: timestamps (LTZ and NTZ —
    the latter rejects a plain double cast in Spark 4) via exact integer
    epoch-micros, numerics via cast.  Epoch-micros stay < 2^53, so the
    one double division at the end is exact-to-rounding and
    order-independent."""
    if is_timestamp_type(dtype):
        return epoch_us(col, dtype) / F.lit(1e6)
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str | Sequence[str],
    right_on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, attach the right row with the
    greatest ``right_ts`` ≤ ``left_ts`` (direction="backward", ties at
    equal timestamps match) — or the least ``right_ts`` ≥ ``left_ts``
    (direction="forward") — within the same equi-key group.  Unmatched
    left rows keep NULL right columns (left-join semantics, like
    pandas ``merge_asof`` / DuckDB ``ASOF LEFT JOIN``).

    ``right_cols``: right payload columns to attach (default: all except
    the key and timestamp columns).  The right timestamp is attached as
    ``__asof_ts`` for inspection/tolerance.

    ``tolerance_seconds``: maximum |left_ts - matched right_ts|; a match
    further away resolves to NULL (DuckDB has no tolerance — unit tests
    cover it instead of the SQL oracle).

    Determinism with duplicate right timestamps: among right rows equal
    on (key, ts), the one with the greatest ``tiebreak`` column wins for
    backward (least for forward); default tiebreak is the first payload
    column.  SQL-faithful NULL handling: left rows with a NULL key never
    match.
    """
    lkeys, rkeys = _as_list(left_on), _as_list(right_on)
    if len(lkeys) != len(rkeys):
        raise ValueError("left_on and right_on must have equal length")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*rkeys, right_ts)]
    right_cols = list(right_cols)
    if tiebreak is None:
        tiebreak = right_cols[0] if right_cols else right_ts

    payload = F.struct(
        *[F.col(c) for c in right_cols], F.col(right_ts).alias("__asof_ts")
    )
    payload_type = right.select(payload.alias("p")).schema["p"].dataType

    # Tag and union.  __side orders right rows before (backward) / after
    # (forward) left rows at equal timestamps so ties match; __tb orders
    # duplicate right timestamps so the deterministic winner sits nearest
    # the window edge (last for backward, first for forward).
    r_side = 0 if direction == "backward" else 2
    tagged_r = right.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(rkeys)],
        F.col(right_ts).alias("__t"),
        F.lit(r_side).alias("__side"),
        _as_seconds(F.col(tiebreak), right.schema[tiebreak].dataType).alias("__tb"),
        payload.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    tagged_l = left.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(lkeys)],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(0.0).alias("__tb"),
        F.lit(None).cast(payload_type).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    keys = [f"__k{i}" for i in range(len(lkeys))]
    unioned = tagged_r.unionByName(tagged_l)

    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picked = F.last("__r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__tb").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picked = F.first("__r", ignorenulls=True).over(w)

    out = unioned.withColumn("__pick", picked).filter(F.col("__side") == 1)
    match_ok = F.col("__pick").isNotNull()
    for k in keys:
        match_ok = match_ok & F.col(k).isNotNull()
    if tolerance_seconds is not None:
        gap = F.abs(
            _as_seconds(F.col("__t"), left.schema[left_ts].dataType)
            - _as_seconds(F.col("__pick.__asof_ts"), right.schema[right_ts].dataType)
        )
        match_ok = match_ok & (gap <= F.lit(float(tolerance_seconds)))
    final = F.when(match_ok, F.col("__pick"))
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[final[c].alias(c) for c in right_cols],
        final["__asof_ts"].alias("__asof_ts"),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    left_on: Sequence[str] = (),
    right_on: Sequence[str] = (),
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Interval join: left rows (points at ``left_ts``) × right rows
    (intervals [``right_start``, ``right_end``], inclusive) where the
    point falls inside the interval, optionally ANDed with equi keys.

    Plan shape: both sides map their time to ``bucket_seconds``-wide
    epoch buckets; intervals ``sequence``-explode to every bucket they
    cover; the join is a plain equi-join on (keys…, bucket) with the
    exact BETWEEN as a residual filter.  A point lives in exactly one
    bucket, so each matching pair appears exactly once — no dedup.
    Never a cross join: Catalyst sees an equi-condition, so this stays
    a hash/sort-merge join and scales with bucket population, not
    |left|×|right|.

    Columns from both sides are returned (right's joined under their own
    names; collisions get a ``_r`` suffix).
    """
    if how != "inner":
        raise ValueError("only inner range_join is implemented")
    lkeys, rkeys = _as_list(left_on), _as_list(right_on)
    if len(lkeys) != len(rkeys):
        raise ValueError("left_on and right_on must have equal length")

    def bucket(col: Column, dtype) -> Column:
        return F.floor(_as_seconds(col, dtype) / F.lit(float(bucket_seconds))).cast("long")

    l_tag = left.select(
        *left.columns,
        bucket(F.col(left_ts), left.schema[left_ts].dataType).alias("__bucket"),
    )
    r_cols = [c if c not in left.columns else f"{c}_r" for c in right.columns]
    r_tag = right.select(
        *[F.col(c).alias(a) for c, a in zip(right.columns, r_cols)],
        F.explode(
            F.sequence(
                bucket(F.col(right_start), right.schema[right_start].dataType),
                bucket(F.col(right_end), right.schema[right_end].dataType),
            )
        ).alias("__bucket"),
    )
    def rname(c: str) -> str:
        return c if c not in left.columns else f"{c}_r"

    cond = l_tag["__bucket"] == r_tag["__bucket"]
    for lk, rk in zip(lkeys, rkeys):
        cond = cond & (l_tag[lk] == r_tag[rname(rk)])
    joined = l_tag.join(r_tag, on=cond, how="inner").filter(
        F.col(left_ts).between(F.col(rname(right_start)), F.col(rname(right_end)))
    )
    return joined.drop(l_tag["__bucket"]).drop(r_tag["__bucket"])


def trailing_events_join(
    probe: DataFrame,
    events: DataFrame,
    k: int = 3,
    horizon_days: int = 90,
    probe_key: str = "o_custkey",
    probe_ts: str = "o_orderdate",
    event_key: str = "user_id",
    event_ts: str = "ts",
    event_cols: tuple[str, ...] = ("event_id",),
    probe_id: str | None = None,
) -> DataFrame:
    """Trailing-k event history per probe row (§2.K extension — the
    feature-store lookup one step past the as-of join: not just the
    latest state but the LAST ``k`` events strictly before the probe
    time, e.g. "the customer's last 3 interactions before this
    order").

    The lookback is HORIZON-BOUNDED by contract (``horizon_days``):
    an unbounded trailing join is a per-key quadratic at 100 TB, and
    no production feature reads unbounded history — the horizon is
    the feature definition.  Shape: one equi-key sort-merge join with
    the range predicate applied inside it (never a cartesian), then a
    per-probe descending-time rank the optimizer truncates map-side
    at ``k`` (WindowGroupLimit — the same bound as top-k).  Ties
    break (ts DESC, first event col DESC), a total order, so the
    selected history is deterministic cross-engine.

    The rank partitions by a UNIQUE probe-row identity, never the
    probe's value columns (VERDICT r9 #3: ranking over the full probe
    row silently merged the histories of duplicate probe rows into one
    interleaved rank sequence — wrong answers, no error).  Pass
    ``probe_id`` naming a column the caller GUARANTEES unique (e.g. the
    fact table's primary key) to rank over it directly; when ``None``,
    a synthetic per-row id is attached to the probe side BEFORE the
    join (narrow long column, assigned at probe-scan time so every
    joined event of one probe row carries the same id) and dropped from
    the output, so duplicate probe rows each keep their own independent
    trailing-k history.

    Returns one row per (probe row, hist_rank <= k)."""
    e_ts = F.col(event_ts).cast("timestamp")
    p_ts = F.col(f"__p.{probe_ts}").cast("timestamp")
    if probe_id is None:
        p = probe.withColumn("__probe_uid", F.monotonically_increasing_id())
        uid = "__probe_uid"
    else:
        p = probe
        uid = probe_id
    p = p.alias("__p")
    e = events.withColumn("__ets", e_ts).alias("__e")
    joined = p.join(
        e,
        (F.col(f"__e.{event_key}") == F.col(f"__p.{probe_key}"))
        & (F.col("__ets") < p_ts)
        & (F.col("__ets") >= p_ts - F.expr(f"INTERVAL {int(horizon_days)} DAYS")),
        "inner",
    )
    order_cols = [F.col("__ets").desc()] + [
        F.col(f"__e.{c}").desc() for c in event_cols[:1]
    ]
    w = Window.partitionBy(F.col(f"__p.{uid}")).orderBy(*order_cols)
    return (
        joined.withColumn("hist_rank", F.row_number().over(w))
        .filter(F.col("hist_rank") <= k)
        .select(
            *[F.col(f"__p.{c}") for c in probe.columns],
            F.col("hist_rank").cast("long").alias("hist_rank"),
            *[F.col(f"__e.{c}") for c in event_cols],
            F.col("__ets").alias("event_ts"),
        )
    )
