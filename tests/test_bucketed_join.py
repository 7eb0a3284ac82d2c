"""Bucketed-table co-located joins (sinks/mart.py:write_bucketed):
same-key same-count bucketed tables must join with zero Exchange."""

from __future__ import annotations

import pytest

from realtime_cdc_pipeline_docker_spark.catalog import load_table
from realtime_cdc_pipeline_docker_spark.sinks.mart import write_bucketed


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], num_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        num_buckets=8,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    a, b = bucketed_tables
    # Force the join to be key-partitioned (not broadcast) so the test
    # exercises the co-location, exactly the big-fact x big-fact case.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(a).join(spark.table(b), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        # (A per-task Sort remains: Spark 3+ ignores write-time sortBy
        # ordering at read unless the legacy bucketedTableScan flag is
        # set.  The network shuffle — the cost that matters at 100 TB —
        # is gone; the in-task sort is local and spill-bounded.)
        # Same result as the plain path-scan join.
        expected = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "lineitem").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                "o_orderkey",
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_single_table_agg_avoids_shuffle(spark, bucketed_tables):
    a, _ = bucketed_tables
    plan = (
        spark.table(a)
        .groupBy("o_orderkey")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Aggregation on the bucket key reuses the write-time partitioning.
    assert "Exchange" not in plan, plan
