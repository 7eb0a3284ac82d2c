"""Skew-operator equivalence tests: salted forms must return exactly the
unsalted results (salting changes the execution shape, never the answer)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.catalog import load_table
from realtime_cdc_pipeline_docker_spark.operators.skew import (
    salted_collect_agg,
    salted_join,
)


def _skewed(spark):
    """90% of rows share one hot key."""
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_collect_matches_plain(spark):
    df = _skewed(spark)
    salted = salted_collect_agg(df, ["k"], "v", unique_cols=["v"], n_salts=16)
    plain = df.groupBy("k").agg(F.collect_set("v").alias("items"))
    a = {r["k"]: sorted(r["items"]) for r in salted.collect()}
    b = {r["k"]: sorted(r["items"]) for r in plain.collect()}
    assert a == b
    assert len(a[0]) == 9000  # the hot key really is hot


def test_salted_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # fabricate skew: all odd orderkeys collapse onto one hot key
    probe = li.withColumn(
        "k", F.when(F.col("l_orderkey") % 2 == 1, F.lit(1)).otherwise(F.col("l_orderkey"))
    )
    build = (
        probe.select("k").distinct().withColumn("tag", F.concat(F.lit("t"), F.col("k")))
    )
    salted = salted_join(probe, build, "k", n_salts=8, probe_unique_cols=["l_orderkey", "l_partkey"])
    plain = probe.join(build, "k")
    cols = ["k", "l_orderkey", "l_partkey", "tag"]
    assert salted.count() == plain.count()
    assert sorted(map(tuple, salted.select(cols).collect())) == sorted(
        map(tuple, plain.select(cols).collect())
    )


def test_salted_join_default_salt_spreads_hot_key(spark):
    """Without explicit unique cols the salt derives from ALL probe
    columns — a hot key whose rows differ in any column must spread
    across multiple salts (the bug fixed here: salting on the join key
    alone put every hot-key row in one salt)."""
    from realtime_cdc_pipeline_docker_spark.operators.skew import with_salt

    df = _skewed(spark)
    build = df.select("k").distinct().withColumn("tag", F.concat(F.lit("t"), F.col("k")))
    salted = salted_join(df, build, "k", n_salts=8)
    plain = df.join(build, "k")
    assert sorted(map(tuple, salted.select("k", "v", "tag").collect())) == sorted(
        map(tuple, plain.select("k", "v", "tag").collect())
    )
    # the hot key's rows occupy every salt value, not one
    n_salts_hot = (
        with_salt(df, df.columns, 8).filter("k = 0").select("__salt").distinct().count()
    )
    assert n_salts_hot == 8


def test_salted_join_rejects_key_only_salt(spark):
    df = _skewed(spark)
    build = df.select("k").distinct()
    with pytest.raises(ValueError, match="hot key"):
        salted_join(df, build, "k", probe_unique_cols=["k"])
