"""Every oracle-backed query must match DuckDB exactly at sf0.001 —
the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from realtime_cdc_pipeline_docker_spark import plans

from .oracle_harness import assert_parity

ORACLE_QUERIES = sorted(n for n, s in plans.REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in plans.REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, name):
    spec = plans.REGISTRY[name]
    assert_parity(spec.fn(spark, sf_dir), spec.oracle, sf_dir, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = plans.REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_oracle_output_types_pandas_safe(sf_dir):
    """Every oracle's DuckDB output schema must survive pandas conversion
    unchanged — the driver hashes pandas values, and e.g. HUGEINT
    (SUM(BIGINT)) silently becomes float64 there while matching Spark's
    int64 under fetchall().  Spark-free scan of all 90 oracles in one go."""
    from .oracle_harness import _PANDAS_SAFE_TYPES, run_oracle  # noqa: F401

    import duckdb

    from realtime_cdc_pipeline_docker_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    offenders = {}
    for name, spec in plans.REGISTRY.items():
        if not spec.oracle:
            continue
        rel = con.sql(spec.oracle)
        bad = [
            (c, str(ty))
            for c, ty in zip(rel.columns, rel.types)
            if str(ty) not in _PANDAS_SAFE_TYPES
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"pandas-unsafe oracle output types: {offenders}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert e.queries().keys() >= set(ORACLE_QUERIES)
    assert set(e.oracle_sql().keys()) == set(ORACLE_QUERIES)
