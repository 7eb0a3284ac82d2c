"""OR-equi-join decomposition and sketch-merge properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.catalog import load_table
from realtime_cdc_pipeline_docker_spark.operators.joins import or_equi_join


def test_or_join_matches_naive_and_produces_each_pair_once(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200), (3, 30, 100), (4, None, 300)],
        "lid int, k1 int, k2 int",
    )
    right = spark.createDataFrame(
        [(1, 10, 999), (2, 99, 100), (3, 10, 100), (4, None, 300)],
        "rid int, rk1 int, rk2 int",
    )
    naive = left.join(
        right, (left.k1 == right.rk1) | (left.k2 == right.rk2), "inner"
    ).select("lid", "rid")
    ours = or_equi_join(left, right, [("k1", "rk1"), ("k2", "rk2")]).select(
        "lid", "rid"
    )
    naive_pairs = sorted(map(tuple, naive.collect()))
    our_pairs = sorted(map(tuple, ours.collect()))
    assert our_pairs == naive_pairs
    # No pair duplicated: row (3,.) matches rid=3 on BOTH keys -> once.
    assert len(our_pairs) == len(set(our_pairs))


def test_or_join_plans_hash_joins_not_nested_loop(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", (F.col("o_orderkey") % 997).alias("o_legacy")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", (F.col("c_custkey") % 997).alias("c_legacy")
    )
    naive_plan = (
        orders.join(
            customer,
            (orders.o_custkey == customer.c_custkey)
            | (orders.o_legacy == customer.c_legacy),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in naive_plan  # the trap is real
    ours_plan = (
        or_equi_join(
            orders, customer, [("o_custkey", "c_custkey"), ("o_legacy", "c_legacy")]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in ours_plan and "Cartesian" not in ours_plan


def test_hll_merge_of_partials_equals_direct_sketch(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    est_merged = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).first()["e"]
    est_direct = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("e")
    ).first()["e"]
    exact = orders.select("o_custkey").distinct().count()
    assert est_merged == est_direct  # merge exactness, not approximation
    assert abs(est_direct - exact) / exact < 0.05


def test_null_skew_left_join_matches_plain_left_join(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.joins import null_skew_left_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 < 2, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("cust_fk"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    got = null_skew_left_join(orders, cust, "cust_fk", "c_custkey")
    want = orders.join(cust, orders["cust_fk"] == cust["c_custkey"], "left")
    cols = ["o_orderkey", "cust_fk", "c_custkey", "c_name"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )
    # NULL-keyed rows keep NULL dim columns, and there are plenty of them
    n_null = got.filter(F.col("cust_fk").isNull()).count()
    assert n_null == orders.filter(F.col("cust_fk").isNull()).count() > 0
    assert got.filter(F.col("cust_fk").isNull() & F.col("c_name").isNotNull()).count() == 0


def test_null_skew_left_join_null_branch_avoids_the_join(spark, sf_dir):
    """The NULL branch must be a scan-side projection: in the union's
    second child there is no join and no exchange — those rows never
    shuffle, which is the whole point at scale."""
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.joins import null_skew_left_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 < 2, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("cust_fk"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plan = (
        null_skew_left_join(orders, cust, "cust_fk", "c_custkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Union" in plan
    null_branch = plan.split("Union")[-1].split(":- ")[-1]
    tail = null_branch.split("+- ")[-1] if "+- " in null_branch else null_branch
    assert "Join" not in tail and "Exchange" not in tail


def test_null_skew_left_join_property_random_frames(spark):
    """Hypothesis-style sweep without hypothesis overhead: several
    seeded random fact/dim shapes (all-null keys, no-null keys, keys
    with no dim match, duplicate dim keys absent by construction) —
    the decomposition must equal the plain left join exactly."""
    import random

    from realtime_cdc_pipeline_docker_spark.operators.joins import null_skew_left_join

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        fact = [
            (i, rng.choice([None, rng.randint(0, 12)]))
            for i in range(200)
        ]
        dim = [(k, f"d{k}") for k in range(0, 10)]  # keys 10-12 unmatched
        f = spark.createDataFrame(fact, "fid long, k long")
        d = spark.createDataFrame(dim, "dk long, name string")
        got = sorted(
            map(tuple, null_skew_left_join(f, d, "k", "dk").select(
                "fid", "k", "dk", "name").collect())
        )
        want = sorted(
            map(tuple, f.join(d, f["k"] == d["dk"], "left").select(
                "fid", "k", "dk", "name").collect())
        )
        assert got == want
    # degenerate edges: every key null / no key null
    all_null = spark.createDataFrame([(i, None) for i in range(5)], "fid long, k long")
    d = spark.createDataFrame([(1, "x")], "dk long, name string")
    assert null_skew_left_join(all_null, d, "k", "dk").count() == 5
    no_null = spark.createDataFrame([(i, 1) for i in range(5)], "fid long, k long")
    out = null_skew_left_join(no_null, d, "k", "dk")
    assert out.filter(F.col("name") == "x").count() == 5
