"""Physical-plan assertions — the scale contract (SURVEY §4).

Correctness tests prove the queries compute the right rows; these prove
they compute them the way a 100 TB run needs: filters and projections
reach the parquet reader, small dimensions broadcast instead of
shuffling the fact table, window+groupBy chains reuse one partitioning,
and hot paths stay inside whole-stage codegen.
"""

from __future__ import annotations

import re

import pytest

from realtime_cdc_pipeline_docker_spark import plans


def _formatted(spark, name, sf_dir):
    df = plans.REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _formatted(spark, "b09_filter_eq", sf_dir)
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]" in plan
    # column pruning: only the 4 projected columns are read
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and sorted(c.split(":")[0] for c in m.group(1).split(",")) == [
        "l_linenumber",
        "l_orderkey",
        "l_quantity",
        "l_returnflag",
    ]


@pytest.mark.parametrize(
    "name",
    [
        "flagship_revenue_report",
        "d1_join_inner_fk",
        "d2_d3_join_three_way",
        "d6_join_star_snowflake",
        "d8_tpch_q3_shape",
        "d9_tpch_q5_shape",
        "d10_tpch_q10_shape",
        "d12_tpch_q7_shape",
        "d17_tpch_q8_shape",
        "d18_tpch_q9_shape",
    ],
)
def test_fact_dim_joins_broadcast(spark, sf_dir, name):
    """No shuffle of the fact table for dimension joins: every join in
    these plans is a BroadcastHashJoin (dims are orders of magnitude
    smaller than lineitem at every sf)."""
    plan = _formatted(spark, name, sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_sessionization_single_shuffle(spark, sf_dir):
    """The lag() window and the groupBy both key on user_id — Catalyst
    must plan ONE exchange, reusing the window's partitioning for the
    aggregate."""
    plan = _formatted(spark, "e2d_sessionization", sf_dir)
    assert plan.count("+- Exchange") == 1


def test_aggregates_partial_before_shuffle(spark, sf_dir):
    """Map-side combine: the flagship aggregate runs partial_sum before
    its exchange, so the shuffle carries group partials, not rows."""
    plan = _formatted(spark, "flagship_revenue_report", sf_dir)
    assert re.search(r"partial_sum", plan)
    exchange_pos = plan.index("Exchange")
    assert plan.index("partial_sum") > exchange_pos  # formatted: details after tree


def test_no_python_udfs_in_relational_paths(spark, sf_dir):
    """Every §2.B-§2.G query stays JVM-side: no BatchEvalPython /
    ArrowEvalPython nodes (Python is reserved for §2.J5 media decode)."""
    for name in sorted(plans.REGISTRY):
        if name.startswith(("b", "c", "d", "e", "f", "g", "flagship", "h4")):
            plan = _formatted(spark, name, sf_dir)
            assert "EvalPython" not in plan, name


def test_plan_audit_python_detector_three_states(spark, sf_dir):
    """VERDICT r4 #2: the audit's Python column must distinguish
    row-at-a-time (banned), arrow-batched (sanctioned applyInPandas /
    mapInPandas custom operators), and none — `"EvalPython" in plan`
    reported j3i/j5 as Python-free.  Pins the detector itself against
    live plans of all three kinds."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "plan_audit",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts", "plan_audit.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    assert mod.python_mode(_formatted(spark, "j3i_mmr_rerank", sf_dir)) == "arrow-batched"
    assert mod.python_mode(_formatted(spark, "j5b_multimodal_features", sf_dir)) == "arrow-batched"
    assert mod.python_mode(_formatted(spark, "flagship_revenue_report", sf_dir)) == "no"

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType())  # deliberately row-at-a-time
    df = spark.range(10).select(slow("id").alias("y"))
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert mod.python_mode(plan) == "row-at-a-time"


def test_exists_shapes_plan_semi_and_anti_joins(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS must compile to LeftSemi/LeftAnti
    hash joins (each outer row tested once), never a nested-loop or a
    join-then-distinct."""
    q4 = _formatted(spark, "d14_tpch_q4_shape", sf_dir)
    assert "LeftSemi" in q4 and "NestedLoop" not in q4
    q22 = _formatted(spark, "d16_tpch_q22_shape", sf_dir)
    assert "BroadcastHashJoin LeftAnti" in q22
    # the only nested-loop allowed is the 1-row scalar-aggregate broadcast
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", q22)) <= 1
    # Q21: double EXISTS against the fact itself — semi AND anti, both
    # equi on l_orderkey (the non-equi lateness stays a join residual)
    q21 = _formatted(spark, "d23_tpch_q21_shape", sf_dir)
    assert "LeftSemi" in q21 and "LeftAnti" in q21 and "NestedLoop" not in q21


def test_topn_window_uses_limit_pushdown(spark, sf_dir):
    """rank<=k window filters plan a WindowGroupLimit (partial top-k
    before the shuffle) rather than ranking every row."""
    plan = _formatted(spark, "e2a_window_topn", sf_dir)
    assert "WindowGroupLimit" in plan


def test_salted_agg_plans_two_exchanges_only(spark, sf_dir):
    """c18's two-phase salted aggregation: exactly the (key, salt) and
    (key) exchanges — salting must not introduce extra shuffles, and
    both phases keep partial (map-side) aggregation."""
    plan = _formatted(spark, "c18_salted_skew_agg", sf_dir)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert "EvalPython" not in plan


def test_posexplode_plans_no_shuffle(spark, sf_dir):
    """b11 is a pure per-row expansion: scan → generate, no exchange
    (the 1→N lateral view must never repartition)."""
    plan = _formatted(spark, "b11_posexplode_embedding", sf_dir)
    assert "Exchange" not in plan
    assert "Generate" in plan


def test_ivm_join_broadcasts_dim_deltas_single_agg_exchange(spark, sf_dir):
    plan = _formatted(spark, "c22_ivm_join_report", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # Fact-side deltas never hash-shuffle; the only hash exchange is the
    # final segment aggregate.
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_distinct_to_date_single_exchange(spark, sf_dir):
    plan = _formatted(spark, "e2i_distinct_to_date", sf_dir)
    # Both windows hash on user_id alone: one exchange, two sorts.
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "EvalPython" not in plan


def test_window_funnel_single_window_exchange(spark, sf_dir):
    plan = _formatted(spark, "e10_window_funnel", sf_dir)
    # Three chained conditional-min windows + per-user dedup all reuse
    # ONE user_id hash exchange; the only other exchange is the tiny
    # final level histogram.
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2
    assert "EvalPython" not in plan


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """Catalyst's runtime row-level filtering (InjectRuntimeFilter): a
    selective dim filter on the creation side of a SHUFFLE join builds
    a bloom filter at runtime and applies `might_contain` to the fact
    side BEFORE the exchange — at 100 TB this is what keeps a
    non-broadcastable selective join from shuffling the whole fact
    table.  Broadcast joins don't need it (the filter rides the
    broadcast), so broadcasting is disabled to exercise the path."""
    from pyspark.sql import functions as F

    from realtime_cdc_pipeline_docker_spark.catalog import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prior = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "bloom_filter_agg" in plan  # built from the filtered dim
        assert "might_contain" in plan  # applied to the fact scan side
        # and the filtered rows are still exactly right
        got = {r["o_orderpriority"]: r["n"] for r in j.collect()}
        want = (
            li.join(orders.hint("broadcast"), li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert got == {r["o_orderpriority"]: r["n"] for r in want}
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
