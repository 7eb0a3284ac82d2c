"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference CDC pipeline
(``HowardZeng123/realtime-cdc-pipeline-docker``).

The reference composes Postgres → Debezium → Kafka → Spark Structured
Streaming → ClickHouse ``ReplacingMergeTree`` (see SURVEY.md).  This
package re-expresses every piece of that query surface Spark-first:

- ``session``    — SparkSession builder (AQE, UTC, sane shuffle sizing)
- ``catalog``    — parquet table loader / temp-view registration
- ``functions``  — vector / text scalar helpers built on pyspark.sql.functions
- ``operators``  — latest-state collapse (ReplacingMergeTree semantics),
                   dedup family, similarity search, text analysis, multimodal
- ``sources``    — Debezium-envelope CDC decode (two-phase ``from_json``)
- ``streaming``  — Structured Streaming CDC pipeline (foreachBatch upsert)
- ``plans``      — the query library registered in ``__spark_entry__.py``

Everything is DataFrame/Catalyst-first: no RDDs, no row-at-a-time Python
UDFs in hot paths; Pandas UDFs only where built-ins cannot express the
semantics (multimodal decode stubs).
"""

__version__ = "0.1.0"
