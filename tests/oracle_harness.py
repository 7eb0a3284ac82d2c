"""Local emulation of the driver's correctness gate: run each registered
query in Spark AND its DuckDB oracle on the same parquet, compare
row count + per-column Python types + order-insensitive exact values.

Uses Spark ``collect()`` and DuckDB ``fetchall()`` (not pandas) so both
sides yield native Python values — DATE → datetime.date, TIMESTAMP →
datetime.datetime — exactly the representations a driver comparing
collected rows sees.
"""

from __future__ import annotations

import duckdb

from realtime_cdc_pipeline_docker_spark.catalog import TABLES


# DuckDB output types whose pandas conversion round-trips losslessly to
# what Spark's toPandas() produces for the same logical type.  HUGEINT
# (DuckDB's SUM(BIGINT) result) is deliberately NOT here: pandas renders
# it float64, which hash-mismatches Spark's int64 even when fetchall()
# values are identical Python ints — the exact failure mode behind the
# d15_tpch_q18_shape red row in CORRECTNESS_r02.  Oracles must CAST such
# sums back to BIGINT.  BLOB and LIST types ("...[]") are NOT here
# either: the driver canonicalizes via pandas ``sort_values``, which
# raises ``unhashable type: 'bytearray'/'list'`` on object columns of
# bytes/lists — the exact failure behind the j5b/j5c/j5d red rows in
# CORRECTNESS_r03.  Registered queries must hex() binary and
# posexplode/join arrays at the query boundary.
_PANDAS_SAFE_TYPES = frozenset(
    {"BIGINT", "BOOLEAN", "DATE", "DOUBLE", "FLOAT", "INTEGER", "TIMESTAMP", "VARCHAR"}
)


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    rel = con.sql(sql)
    unsafe = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) not in _PANDAS_SAFE_TYPES
    ]
    assert not unsafe, (
        f"oracle emits pandas-unsafe DuckDB types {unsafe}; "
        "CAST scalars (e.g. AS BIGINT), hex() binary, and posexplode/join "
        "arrays so the driver's pandas-side canonicalizer can sort and hash"
    )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _cell(v) -> str:
    v = _norm(v)
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return type(v).__name__ + ":" + v.isoformat()
    return type(v).__name__ + ":" + str(v)


def canon(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_cell(row[i]) for i in order) for row in rows)


def col_types(cols: list[str], rows: list[tuple]) -> dict[str, set[str]]:
    out: dict[str, set[str]] = {c: set() for c in cols}
    for row in rows:
        for c, v in zip(cols, row):
            v = _norm(v)
            if v is not None:
                out[c].add(type(v).__name__)
    return out


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, name: str = "?") -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(row) for row in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column names differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count {len(s_rows)} != oracle {len(o_rows)}"
    )
    st, ot = col_types(s_cols, s_rows), col_types(o_cols, o_rows)
    for c in s_cols:
        assert st[c] == ot[c], (
            f"{name}: column {c!r} python types differ: spark={st[c]} oracle={ot[c]}"
        )
    g, w = canon(s_cols, s_rows), canon(o_cols, o_rows)
    if g != w:
        diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
        only_g = [r for r in g if r not in set(w)][:3]
        raise AssertionError(
            f"{name}: value mismatch; paired diffs (spark, oracle): {diffs}; "
            f"spark-only rows: {only_g}"
        )
