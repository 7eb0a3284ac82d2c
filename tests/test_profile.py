"""Table profiling operator: single-pass metrics, tall output."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_cdc_pipeline_docker_spark.operators.profile import profile


def test_profile_metrics_exact(spark):
    rows = [(1, "a"), (2, "a"), (3, None), (None, "b"), (2, "c")]
    df = spark.createDataFrame(rows, "k int, s string")
    out = {r["column_name"]: r for r in profile(df).collect()}
    assert set(out) == {"k", "s"}
    k = out["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (5, 1, 3)
    assert (k["min_value"], k["max_value"]) == ("1", "3")
    s = out["s"]
    assert (s["n_rows"], s["n_nulls"], s["n_distinct"]) == (5, 1, 3)
    assert (s["min_value"], s["max_value"]) == ("a", "c")


def test_profile_is_single_scan(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    plan = profile(orders)._jdf.queryExecution().executedPlan().toString()
    # One parquet scan feeds every column's metrics.
    assert plan.count("Scan parquet") == 1


def test_histogram_partitions_input_and_clamps(spark):
    from realtime_cdc_pipeline_docker_spark.operators.profile import histogram

    # Values straddle lo, hi, and the exact bucket boundary at 10.
    rows = [(-5,), (0,), (9,), (10,), (19,), (20,), (99,)]
    df = spark.createDataFrame(rows, "v long")
    out = {r["bucket_no"]: r for r in histogram(df, "v", 0, 20, 2).collect()}
    # -5 and 0 clamp/fall into bucket 0; 10, 19 in bucket 1; 20, 99 clamp to 1.
    assert out[0]["n_rows"] == 3 and out[0]["sum_value"] == -5 + 0 + 9
    assert out[1]["n_rows"] == 4 and out[1]["sum_value"] == 10 + 19 + 20 + 99
    assert out[0]["bucket_lo"] == 0 and out[0]["bucket_hi"] == 10
    assert out[1]["bucket_lo"] == 10 and out[1]["bucket_hi"] == 20
    # The histogram partitions the input: no row lost, no row doubled.
    assert sum(r["n_rows"] for r in out.values()) == len(rows)


def test_histogram_single_aggregate_exchange(spark, sf_dir):
    from realtime_cdc_pipeline_docker_spark.catalog import load_table
    from realtime_cdc_pipeline_docker_spark.operators.profile import histogram

    orders = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    plan = (
        histogram(orders, "cents", 0, 50_000_000, 20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") <= 1  # one partial->final agg shuffle
    assert "Python" not in plan
