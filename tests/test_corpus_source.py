"""JSONL corpus source: schema-enforced read, corrupt-record quarantine,
exact write/read roundtrip (sources/corpus.py)."""

from __future__ import annotations

import datetime

import pyspark.sql.types as T

from realtime_cdc_pipeline_docker_spark.sources.corpus import (
    DOCUMENTS_SCHEMA,
    read_jsonl,
    write_jsonl,
)


def test_jsonl_roundtrip_exact(spark, tmp_path):
    rows = [
        (1, 'text with "quotes" and \\ backslash', "en", "s1", 33),
        (2, "unicode: café 中文", "zh", "s2", 10),
        (3, None, None, None, None),  # nullable fields survive
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    path = str(tmp_path / "corpus")
    write_jsonl(df, path)
    good, quarantine = read_jsonl(spark, path)
    assert quarantine.count() == 0
    got = sorted((r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
                 for r in good.collect())
    # Row 3 is all-NULL: JSON writers drop null fields, so it reads back
    # as an empty object — still a valid (all-NULL) row, not quarantine.
    assert got == sorted(rows, key=lambda r: (r[0] is None, r[0]))
    assert good.schema == DOCUMENTS_SCHEMA


def test_jsonl_quarantine_catches_garbage(spark, tmp_path):
    df = spark.createDataFrame([(1, "ok", "en", "s", 2)], DOCUMENTS_SCHEMA)
    path = str(tmp_path / "corpus")
    write_jsonl(df, path)
    bad_lines = ["{ not json", "[1,2,3", "}{"]
    spark.createDataFrame([(line,) for line in bad_lines], ["value"]) \
        .coalesce(1).write.mode("append").format("text").save(path)
    good, quarantine = read_jsonl(spark, path)
    assert good.count() == 1
    qs = sorted(r["raw_line"] for r in quarantine.collect())
    assert qs == sorted(bad_lines)


def test_jsonl_type_mismatch_quarantined_not_nulled(spark, tmp_path):
    """A syntactically-valid line whose doc_id is a string must land in
    quarantine (FAILFAST would kill the job; silent NULL would corrupt
    the corpus)."""
    df = spark.createDataFrame([(1, "ok", "en", "s", 2)], DOCUMENTS_SCHEMA)
    path = str(tmp_path / "corpus")
    write_jsonl(df, path)
    spark.createDataFrame(
        [('{"doc_id": "seven", "text": "x", "lang": "en", "source": "s", "n_chars": 1}',)],
        ["value"],
    ).coalesce(1).write.mode("append").format("text").save(path)
    good, quarantine = read_jsonl(spark, path)
    assert good.count() == 1
    assert quarantine.count() == 1
    assert good.schema[0].dataType == T.LongType()


def test_csv_roundtrip_exact(spark, tmp_path):
    from realtime_cdc_pipeline_docker_spark.sources.corpus import (
        ORDERS_CSV_SCHEMA,
        read_csv,
        write_csv,
    )

    path = str(tmp_path / "csv")
    rows = [
        (1, 10, "O", 123.45, datetime.datetime(1995, 3, 1, 12, 30, 0), "1-URGENT"),
        (2, 20, "F", 0.1, datetime.datetime(1996, 1, 1), "5-LOW"),
        (3, None, None, None, None, None),  # NULLs survive CSV
    ]
    df = spark.createDataFrame(rows, ORDERS_CSV_SCHEMA)
    write_csv(df, path)
    good, quarantine = read_csv(spark, path, ORDERS_CSV_SCHEMA)
    assert quarantine.count() == 0
    got = sorted(tuple(r) for r in good.collect())
    assert got == sorted(tuple(r) for r in df.collect())


def test_csv_quarantine_catches_garbage_not_nulls(spark, tmp_path):
    from realtime_cdc_pipeline_docker_spark.sources.corpus import (
        ORDERS_CSV_SCHEMA,
        read_csv,
        write_csv,
    )

    path = str(tmp_path / "csv")
    df = spark.createDataFrame(
        [(1, 10, "O", 1.0, datetime.datetime(1995, 1, 1), "p")], ORDERS_CSV_SCHEMA
    )
    write_csv(df, path)
    garbage = spark.createDataFrame(
        [("utter garbage",), ("1,2,a,not_a_double,also_not_a_ts,x",)], ["value"]
    )
    garbage.coalesce(1).write.mode("append").format("text").save(path)
    good, quarantine = read_csv(spark, path, ORDERS_CSV_SCHEMA)
    assert good.count() == 1
    # Quarantine holds the raw offending lines, verbatim.
    qlines = {r["raw_line"] for r in quarantine.collect()}
    assert qlines == {"utter garbage", "1,2,a,not_a_double,also_not_a_ts,x"}


def test_partitioned_source_prunes_directories(spark, sf_dir, tmp_path):
    """b20's scale contract: the lang predicate must reach the scan as
    a PartitionFilter (FileSourceStrategy prunes directories exactly
    when it classifies the predicate there — inputFiles() is resolved
    BEFORE pruning and cannot observe it), the scan must read only
    the two matching partitions' files (executed-scan file count),
    and the partition column round-trips its values."""
    from pyspark.sql import functions as F

    from realtime_cdc_pipeline_docker_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    path = str(tmp_path / "part")
    docs.write.partitionBy("lang").parquet(path)
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert len(langs) > 2

    def scan_plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    pruned = spark.read.parquet(path).filter(F.col("lang").isin("en", "de"))
    plan = scan_plan(pruned)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "lang" in pf[0] and " IN " in pf[0], pf
    assert "en" in pf[0] and "de" in pf[0], pf

    # the unfiltered read touches every partition directory
    touched_all = {
        f.split("lang=")[1].split("/")[0]
        for f in spark.read.parquet(path).inputFiles()
    }
    assert touched_all == langs

    # a non-partition predicate must NOT be classified as a partition
    # filter (empty/omitted PartitionFilters line)
    unpruned = spark.read.parquet(path).filter(F.col("n_chars") >= 0)
    pf2 = [l for l in scan_plan(unpruned).splitlines() if "PartitionFilters" in l]
    assert not pf2 or "lang" not in pf2[0], pf2

    # value roundtrip through the directory encoding
    back = {
        (r["doc_id"], r["lang"])
        for r in spark.read.parquet(path).select("doc_id", "lang").collect()
    }
    orig = {(r["doc_id"], r["lang"]) for r in docs.select("doc_id", "lang").collect()}
    assert back == orig
