"""Mart sink tests: partition pruning, key clustering, layered appends +
compaction equivalence (SURVEY §2.A2 / §2.F2 / §4 partition pruning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.operators.collapse import compact, latest_state
from realtime_cdc_pipeline_docker_spark.sinks import (
    compact_mart_partitions,
    read_mart,
    write_mart,
)
from realtime_cdc_pipeline_docker_spark.sources.cdc import (
    ORDERS_PAYLOAD_SCHEMA,
    decode_envelope,
    synth_orders_envelope,
)


def _decoded(spark, sf_dir):
    return decode_envelope(
        synth_orders_envelope(spark, sf_dir), ORDERS_PAYLOAD_SCHEMA
    ).withColumn("order_month", F.date_format("order_date", "yyyy-MM"))


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    mart = str(tmp_path / "mart")
    write_mart(_decoded(spark, sf_dir), mart, partition_cols=("order_month",))
    df = read_mart(spark, mart)
    months = [r[0] for r in df.select("order_month").distinct().collect()]
    one = sorted(months)[0]
    q = df.filter(F.col("order_month") == one)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # directory-level pruning: the partition predicate is a PartitionFilter,
    # not a data filter evaluated per row
    assert "PartitionFilters: [isnotnull(order_month" in plan
    assert q.count() > 0


def test_clustering_orders_rows_within_files(spark, sf_dir, tmp_path):
    mart = str(tmp_path / "mart")
    write_mart(_decoded(spark, sf_dir), mart, cluster_cols=("id",))
    import glob

    files = glob.glob(mart + "/*.parquet")
    assert files
    for f in files[:4]:
        ids = [r[0] for r in spark.read.parquet(f).select("id").collect()]
        assert ids == sorted(ids)


def test_layered_appends_collapse_to_same_state(spark, sf_dir, tmp_path):
    """Append → compact → append more → collapse == collapse of the full
    uncompacted log (compaction is transparent to readers)."""
    mart1 = str(tmp_path / "layered")
    mart2 = str(tmp_path / "compacted")
    decoded = _decoded(spark, sf_dir).drop("order_month")
    inserts = decoded.filter(F.col("op") == "c")
    rest = decoded.filter(F.col("op") != "c")

    # layered: everything appended, never compacted
    write_mart(inserts, mart1)
    write_mart(rest, mart1)

    # compacted: inserts written, compacted, then the rest appended
    write_mart(inserts, mart2)
    compacted = compact(read_mart(spark, mart2), key_cols=("id",))
    write_mart(compacted, mart2 + "_base", mode="overwrite")
    write_mart(rest, mart2 + "_base")

    a = latest_state(read_mart(spark, mart1), key_cols=("id",))
    b = latest_state(read_mart(spark, mart2 + "_base"), key_cols=("id",))
    cols = ["id", "status", "total_amount", "ts_ms"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_incremental_compaction_rewrites_only_touched_partitions(spark, sf_dir, tmp_path):
    """The incremental background merge: after appends touching a subset
    of partitions, compacting just that subset (1) preserves the
    merge-on-read state exactly — including keys whose older versions
    live in untouched partitions — and (2) leaves untouched partition
    files byte-identical."""
    import glob

    def partition_bytes(mart, month):
        return {
            f: open(f, "rb").read()
            for f in sorted(glob.glob(f"{mart}/order_month={month}/*.parquet"))
        }

    mart = str(tmp_path / "mart")
    log_copy = str(tmp_path / "log_copy")
    decoded = _decoded(spark, sf_dir)
    months = sorted(
        r[0] for r in decoded.select("order_month").distinct().collect()
    )
    assert len(months) >= 4
    untouched_months, touched_months = months[:2], months[2:]

    # base load: everything; then a second append wave touching only the
    # later months (their UPDATE/DELETE rows re-delivered = new versions
    # layered on top)
    write_mart(decoded, mart, partition_cols=("order_month",))
    wave2 = decoded.filter(
        (F.col("order_month").isin(touched_months)) & (F.col("op") != "c")
    )
    write_mart(wave2, mart, partition_cols=("order_month",))
    write_mart(read_mart(spark, mart), log_copy)  # uncompacted reference

    before = {m: partition_bytes(mart, m) for m in untouched_months}
    compact_mart_partitions(
        spark, mart, touched_months, "order_month", key_cols=("id",)
    )
    after = {m: partition_bytes(mart, m) for m in untouched_months}
    assert before == after  # untouched partitions byte-identical

    # compaction really shrank the touched partitions (dominated versions gone)
    full = read_mart(spark, log_copy)
    compacted_log = read_mart(spark, mart)
    n_touched_before = full.filter(F.col("order_month").isin(touched_months)).count()
    n_touched_after = compacted_log.filter(
        F.col("order_month").isin(touched_months)
    ).count()
    assert n_touched_after < n_touched_before

    cols = ["id", "status", "total_amount", "ts_ms"]
    a = latest_state(full, key_cols=("id",)).select(cols)
    b = latest_state(compacted_log, key_cols=("id",)).select(cols)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_streaming_pipeline_into_partitioned_mart(spark, sf_dir, tmp_path):
    """End-to-end integration: envelope stream → decode → partitioned,
    clustered mart log → collapse == the e1 golden state (orders with
    key%10!=0 at their final version)."""
    from realtime_cdc_pipeline_docker_spark.sources.cdc import synth_orders_envelope
    from realtime_cdc_pipeline_docker_spark.streaming.pipeline import run_cdc_stream

    src = str(tmp_path / "src")
    env = synth_orders_envelope(spark, sf_dir)
    env.coalesce(2).write.mode("overwrite").json(src)

    log = run_cdc_stream(
        spark,
        src,
        str(tmp_path / "mart"),
        str(tmp_path / "ckpt"),
        ORDERS_PAYLOAD_SCHEMA,
        partition_cols=("op",),  # deterministic low-cardinality partition
        cluster_cols=("id",),
    )
    # partition directories exist (pruned reads)
    import os

    assert sorted(
        d for d in os.listdir(str(tmp_path / "mart")) if d.startswith("op=")
    ) == ["op=c", "op=d", "op=u"]

    state = latest_state(log, key_cols=("id",))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = orders.filter(F.col("o_orderkey") % 10 != 0).count()
    assert state.count() == expected


def test_zorder_layout_shrinks_file_bounding_boxes(spark, tmp_path):
    """Every Z-ordered file covers a small rectangle of (x, y) space, so
    a min/max skipping index prunes on EITHER column; a single-column
    sort layout serves only its leading column."""
    import os

    from realtime_cdc_pipeline_docker_spark.sinks.mart import write_zordered

    n, side = 65536, 256  # 256x256 grid, one row per cell
    df = spark.range(n).select(
        (F.col("id") % side).alias("x"), (F.col("id") / side).cast("long").alias("y")
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zpath, cols=("x", "y"), los=(0, 0), his=(side, side),
                   num_buckets=16, bits=8)
    # Comparison layout: clustered on x alone.
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    def extents(path, col):
        out = []
        for d in os.listdir(path):
            full = os.path.join(path, d)
            if d.endswith(".parquet") or (os.path.isdir(full) and "=" in d):
                part = spark.read.parquet(full)
                mn, mx = part.agg(F.min(col), F.max(col)).first()
                out.append(mx - mn + 1)
        return out

    zx, zy = extents(zpath, "x"), extents(zpath, "y")
    # 16 aligned buckets over a 256x256 grid = sixteen EXACT 64x64
    # quadrants: every bucket's bbox is 64 in BOTH dimensions.
    assert len(zx) == 16
    assert all(e == side // 4 for e in zx)
    assert all(e == side // 4 for e in zy)
    # The sort layout serves x but every file spans ALL of y.
    assert max(extents(spath, "x")) <= side // 2
    assert max(extents(spath, "y")) == side


def test_zorder_key_is_codegen_integer_arith(spark):
    from realtime_cdc_pipeline_docker_spark.sinks.mart import zorder_key

    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 3).alias("b")
    )
    out = df.select(zorder_key(("a", "b"), (0, 0), (100, 300), bits=4).alias("z"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    # Interleaving: a=1,b=0 and a=0,b=1 map to adjacent-but-distinct keys.
    vals = df.filter("id < 2").select(
        zorder_key(("a", "b"), (0, 0), (16, 48), bits=4).alias("z")
    ).collect()
    assert len({r["z"] for r in vals}) == 2


def test_dynamic_partition_pruning_on_partitioned_mart(spark, tmp_path):
    """A partitioned mart joined to a filtered dimension prunes fact
    partitions at RUNTIME (DPP): the dim-side filter becomes a
    partition predicate on the fact scan.  Two conditions this test
    pins because both silently disable DPP: the dim filter must be a
    LIKELY-SELECTIVE predicate (an equality — a bare boolean attribute
    does not qualify for Spark's isLikelySelective), and the fact must
    be large enough to be the STREAMED side (a broadcast-able fact is
    itself the build side and nothing prunes it)."""
    fact_path, dim_path = str(tmp_path / "fact"), str(tmp_path / "dim")
    months = [f"1995-{m:02d}" for m in range(1, 13)]
    spark.range(2_000_000).select(
        F.col("id"),
        F.element_at(
            F.array(*[F.lit(m) for m in months]),
            (F.col("id") % 12 + 1).cast("int"),
        ).alias("month"),
        (F.col("id") % 100).alias("amount"),
    ).write.partitionBy("month").parquet(fact_path)
    spark.createDataFrame(
        [(m, "Q1" if m < "1995-04" else "rest") for m in months],
        "month string, quarter string",
    ).write.parquet(dim_path)
    facts = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path)
    joined = facts.join(dim.filter(F.col("quarter") == "Q1"), "month").agg(
        F.sum("amount").alias("total")
    )
    opt = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in opt.lower()
    joined.collect()
    final = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in final.lower()
