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
