"""Custom stateful streaming operator via ``transformWithState`` v2
(SURVEY §2.H × the brief's "custom stateful operators" clause).

``applyInPandasWithState`` (streaming/windows.py sessionizer) is the
v1 arbitrary-state API; Spark 4's v2 — ``transformWithStateInPandas``
with a ``StatefulProcessor`` — is the production successor: typed,
named state slots (value/list/map), optional TTL, timers, and a hard
requirement on the RocksDB state store provider (state lives on local
disk, not the JVM heap — the only shape that survives billions of
in-flight keys; see tests/test_streaming_ingest.py for the provider
contract on the dedup stream).

The demo operator is a per-key running aggregate that is NOT
expressible as a built-in windowed agg: count + exact fixed-point sum
+ the top-2 multiset values, maintained incrementally across
micro-batches in a single ValueState slot.  Every per-batch emission
carries the monotone ``n_events``, so the latest emission per key IS
the full-stream aggregate — which gives the operator an exact batch
oracle despite arbitrary micro-batch splits (the associativity
argument: count/sum/top-2 of a multiset are order- and
partition-independent).

ENVIRONMENT GATE (the Kafka/Pillow pattern): the v2 API's Python
state server speaks protobuf, and ``google.protobuf`` is not
installed in this container — ``run_running_topk_stream`` raises a
clear error up front when it's missing instead of crashing the
streaming worker mid-query.  The processor's accumulation contract is
unit-tested directly (no Spark needed — it's plain Python over Arrow
batches), and the e2e twin runs wherever protobuf exists; the tested
custom-stateful path in THIS container remains the v1
``applyInPandasWithState`` sessionizer (streaming/windows.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from ..functions import fixed_units

_AGG_SCHEMA = "n BIGINT, total BIGINT, top1 BIGINT, top2 BIGINT"
OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_u BIGINT, top1_u BIGINT, top2_u BIGINT"
)
_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


class RunningTopKProcessor(StatefulProcessor):
    """Per-key ValueState holding (count, fixed-point sum, top-2
    multiset values); one output row per key per batch with the
    running totals.  Top-2 keeps DUPLICATE values (multiset
    semantics), matching the oracle's row_number-over-desc rule."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", _AGG_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._agg.exists():
            n, total, top1, top2 = self._agg.get()
        else:
            n, total, top1, top2 = 0, 0, None, None
        for pdf in rows:
            for v in pdf["v_u"]:
                v = int(v)
                n += 1
                total += v
                if top1 is None or v > top1:
                    top2, top1 = top1, v
                elif top2 is None or v > top2:
                    top2 = v
        self._agg.update((n, total, top1, top2))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "total_u": [total],
                "top1_u": [top1],
                "top2_u": [top2],
            }
        )

    def close(self) -> None:
        pass


def run_running_topk_stream(
    spark: SparkSession,
    src_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    files_per_trigger: int = 1,
) -> DataFrame:
    """Run the custom stateful aggregate over a file stream and return
    the FINAL per-key state: the latest (max ``n_events``) emission per
    key from the append sink.  ``files_per_trigger=1`` forces one
    micro-batch per source file, so the state genuinely carries across
    batches (a single-batch run would never exercise restore).

    ``transformWithState`` requires the RocksDB provider; it is pinned
    here for the stream's own session rather than globally."""
    try:
        import google.protobuf  # noqa: F401, PLC0415
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf (the v2 "
            "state-server protocol); not installed in this container — see "
            "the module docstring for the tested v1 alternative"
        ) from exc
    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)
    try:
        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", files_per_trigger)
            .parquet(src_dir)
        )
        prepped = stream.select("user_id", fixed_units("value", 4).alias("v_u"))
        out = prepped.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningTopKProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
        (
            out.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)
    sunk = spark.read.parquet(sink_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sunk.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
