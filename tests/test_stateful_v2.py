"""transformWithState v2 custom stateful operator
(streaming/stateful.py): the processor's accumulation contract is
plain Python over Arrow batches, so it is tested directly with a fake
state handle — no Spark, no protobuf.  The e2e stream twin runs only
where ``google.protobuf`` exists (the v2 state-server protocol needs
it; this container lacks it — the Kafka/Pillow gate pattern)."""

from __future__ import annotations

import pandas as pd
import pytest

from realtime_cdc_pipeline_docker_spark.streaming.stateful import (
    RunningTopKProcessor,
)


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())


def _run_batches(batches):
    """Drive the processor exactly as the runtime does: one
    handleInputRows call per (key, micro-batch)."""
    proc = RunningTopKProcessor()
    proc.init(_FakeHandle())
    emissions = []
    for pdf in batches:
        out = list(proc.handleInputRows((7,), iter([pdf]), None))
        assert len(out) == 1
        emissions.append(out[0].iloc[0].to_dict())
    proc.close()
    return emissions


def test_state_carries_across_microbatches_and_emissions_are_monotone():
    e = _run_batches(
        [
            pd.DataFrame({"v_u": [100, 50]}),
            pd.DataFrame({"v_u": [300]}),
            pd.DataFrame({"v_u": [200, 300]}),
        ]
    )
    assert [x["n_events"] for x in e] == [2, 3, 5]  # monotone: last = total
    final = e[-1]
    assert final["total_u"] == 950
    # multiset top-2: duplicate 300s occupy BOTH slots
    assert (final["top1_u"], final["top2_u"]) == (300, 300)


def test_final_state_is_split_invariant():
    vals = [5, 9, 1, 9, 3, 7, 2]
    one = _run_batches([pd.DataFrame({"v_u": vals})])[-1]
    many = _run_batches([pd.DataFrame({"v_u": [v]}) for v in vals])[-1]
    assert one == many  # any micro-batch split converges to the same state


def test_single_event_key_has_null_top2():
    e = _run_batches([pd.DataFrame({"v_u": [42]})])[-1]
    assert e["top1_u"] == 42 and e["top2_u"] is None


def test_stream_runner_requires_protobuf_or_runs_end_to_end(spark, tmp_path):
    """Where protobuf exists: full e2e parity against the batch oracle.
    Where it doesn't (this container): the runner must fail FAST with
    the documented ImportError, not crash the streaming worker."""
    import datetime

    from pyspark.sql import functions as F

    from realtime_cdc_pipeline_docker_spark.streaming.stateful import (
        run_running_topk_stream,
    )

    try:
        import google.protobuf  # noqa: F401

        has_protobuf = True
    except ImportError:
        has_protobuf = False

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0, i % 3, "click", float(i) + 0.5, "{}") for i in range(30)
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).repartition(4).write.parquet(src)

    if not has_protobuf:
        with pytest.raises(ImportError, match="protobuf"):
            run_running_topk_stream(
                spark, src, str(tmp_path / "sink"), str(tmp_path / "ckpt")
            )
        return

    out = run_running_topk_stream(
        spark, src, str(tmp_path / "sink"), str(tmp_path / "ckpt")
    )
    batch = (
        spark.read.parquet(src)
        .select("user_id", (F.round(F.col("value") * 10000, 0)).cast("long").alias("v"))
        .groupBy("user_id")
        .agg(F.count("v").alias("n_events"), F.sum("v").alias("total_u"))
    )
    got = {r["user_id"]: r for r in out.collect()}
    want = {r["user_id"]: r for r in batch.collect()}
    assert set(got) == set(want)
    for uid in want:
        assert got[uid]["n_events"] == want[uid]["n_events"]
        assert got[uid]["total_u"] == want[uid]["total_u"]
