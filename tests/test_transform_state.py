"""transformWithStateInPandas sessionization — environment-probed.

With protobuf present (any real cluster), the parity test streams the
same two-chunk feed as test_stateful.py and asserts the new-API operator
emits the identical closed sessions as the batch window form. In this
container (no protobuf, installs out of scope) the probe documents the
limitation and asserts the operator fails FAST with the documented
message instead of dying inside the JVM state server.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sdg_big_data_spark.streaming import transform_state
from tests.test_stateful import _batch_sessions, session_events  # noqa: F401


def test_processor_logic_matches_batch_semantics():
    """The StatefulProcessor's transition logic is plain Python — unit-test
    it directly (no stream, no protobuf): feed two chunks through a fake
    value-state and compare closed sessions to hand-computed truth."""
    proc = transform_state.make_session_processor(gap_s=3600)

    class FakeState:
        def __init__(self):
            self.val = None

        def exists(self):
            return self.val is not None

        def get(self):
            return self.val

        def update(self, v):
            self.val = v

    class FakeHandle:
        def getValueState(self, name, schema):
            return FakeState()

    import pandas as pd

    proc.init(FakeHandle())
    t0 = 1_700_000_000
    chunk1 = pd.DataFrame(
        {
            "t": [t0, t0 + 600, t0 + 1200],
            "event_id": [0, 1, 2],
            "value": [1.0, 1.0, 1.0],
        }
    )
    # 2h gap then a second session; split across calls mid-session
    chunk2 = pd.DataFrame(
        {
            "t": [t0 + 2 * 3600 + 1200, t0 + 2 * 3600 + 1800],
            "event_id": [3, 4],
            "value": [2.0, 2.0],
        }
    )
    out1 = list(proc.handleInputRows((7,), iter([chunk1]), None))
    out2 = list(proc.handleInputRows((7,), iter([chunk2]), None))
    assert out1 == []  # session still open after chunk 1
    assert len(out2) == 1
    row = out2[0].iloc[0]
    assert (
        row["user_id"],
        row["t_start"],
        row["t_end"],
        row["duration"],
        row["n_events"],
        row["total_value"],
    ) == (7, t0, t0 + 1200, 1200, 3, 3.0)
    # open state holds session B
    assert proc._sess.get()[:2] == (t0 + 2 * 3600 + 1200, t0 + 2 * 3600 + 1800)


@pytest.mark.skipif(
    transform_state.protobuf_available(),
    reason="protobuf present — the real parity path below runs instead",
)
def test_tws_unavailable_is_documented(spark, session_events):  # noqa: F811
    with pytest.raises(NotImplementedError, match="protobuf"):
        transform_state.streaming_sessionize_tws(session_events)


@pytest.mark.skipif(
    not transform_state.protobuf_available(),
    reason="no protobuf in this container (documented environment limitation)",
)
def test_tws_sessionize_matches_batch(spark, session_events, tmp_path):  # noqa: F811
    import time as _time

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    cut = 1_700_000_000 + 2 * 3600 + 5 * 600 + 600
    session_events.where(F.col("t") < cut).coalesce(1).write.parquet(src + "/p1")
    _time.sleep(1.1)
    session_events.where(F.col("t") >= cut).coalesce(1).write.parquet(src + "/p2")

    stream = (
        spark.readStream.schema(session_events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    out = transform_state.streaming_sessionize_tws(stream, gap_s=3600)
    q = (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", dst)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(dst)
    batch = _batch_sessions(session_events)
    first = batch.where(F.col("sid") == 0).drop("sid")
    got_rows = sorted(map(tuple, got.select(*first.columns).collect()))
    exp_rows = sorted(map(tuple, first.collect()))
    assert got_rows == exp_rows
