"""New-generation stateful streaming — ``transformWithStateInPandas``.

Spark 4's successor to ``applyInPandasWithState`` (SPARK-46815): state is
declared as named, schema-typed variables on a ``StatefulProcessor``
(value/list/map state, optional TTL, event-/processing-time timers)
instead of one opaque tuple, and the runtime requires the RocksDB state
store provider, whose changelog checkpointing is the 100 TB-of-stream
state story (state size bounded by RocksDB spill, not executor heap).

This module carries the engine's gap-sessionization semantics (the same
contract as ``stateful.streaming_sessionize``; batch form
``g_sessionize``) onto the new API.

ENVIRONMENT LIMITATION (probed, not assumed): the
``transformWithStateInPandas`` Python worker speaks a protobuf protocol
to the JVM state server and therefore imports ``google.protobuf`` at
query start. This container has no ``protobuf`` package and installs are
out of scope, so the query crashes at initialization
(``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE: ImportError:
cannot import name 'descriptor' from 'google.protobuf'``). The operator
therefore probes for protobuf up front and fails fast with a message
pointing here; ``tests/test_transform_state.py`` probes the environment
at test time and will flip to exercising the real stream-vs-batch parity
run when protobuf is present (any real cluster: protobuf is a standard
PySpark extra). ``applyInPandasWithState`` (``stateful.py``) remains the
fully-exercised stateful path in this container.

Reference parity: the stop-detection/sessionization state machine is
`gps-analytics/src/wbgps/wbgps/analysis.py:137` ff.; incremental cadence
`append_pipeline.py:38`.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

from ..functions.timeutil import epoch_seconds

SESSION_SCHEMA = (
    "user_id long, t_start long, t_end long, duration long, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = "start long, last long, n long, v double"

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def protobuf_available() -> bool:
    """Probe for the worker-side dependency the new API needs."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def make_session_processor(gap_s: int = 3600):
    """Build the gap-sessionization ``StatefulProcessor``.

    Constructed lazily (class defined inside) so importing this module
    never touches the streaming/protobuf machinery — mirrors how the
    Delta writer keeps the unavailable format import-safe.

    State design: ONE value-state tuple per active user (start, last,
    count, value sum) — never the events; with RocksDB + changelog
    checkpointing the state store scales to the active-key set. Closed
    sessions are emitted with the exact batch shape so stream and batch
    results are directly comparable (same contract as
    ``stateful.streaming_sessionize``).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class GapSessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._sess = handle.getValueState("session", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            pdfs = [pdf for pdf in rows]
            batch = pd.concat(pdfs, ignore_index=True).sort_values(
                ["t", "event_id"], kind="mergesort"
            )
            if self._sess.exists():
                start, last, n, v = self._sess.get()
            else:
                start = last = None
                n, v = 0, 0.0

            closed = []
            for t, val in zip(batch["t"].to_numpy(), batch["value"].to_numpy()):
                t = int(t)
                if start is None:
                    start, last, n, v = t, t, 1, float(val)
                elif t - last > gap_s:
                    closed.append((start, last, last - start, n, v))
                    start, last, n, v = t, t, 1, float(val)
                else:
                    last, n, v = t, n + 1, v + float(val)

            self._sess.update((start, last, n, v))
            if closed:
                out = pd.DataFrame(
                    closed,
                    columns=["t_start", "t_end", "duration", "n_events", "total_value"],
                )
                out.insert(0, "user_id", user_id)
                yield out

        def close(self) -> None:
            pass

    return GapSessionProcessor()


def streaming_sessionize_tws(events: DataFrame, gap_s: int = 3600) -> DataFrame:
    """Gap sessionization on the ``transformWithStateInPandas`` API.

    Same input/output contract as ``stateful.streaming_sessionize``:
    streaming (user_id, ts, event_id, value) in, CLOSED sessions out,
    in-order per-key arrival across micro-batches assumed (the
    incremental-append feed shape).

    Requires the RocksDB state store provider — the caller's session must
    set ``spark.sql.streaming.stateStore.providerClass`` to
    :data:`ROCKSDB_PROVIDER` (this function sets it if unset, since the
    new API refuses the default HDFS-backed provider).
    """
    if not protobuf_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package for its "
            "worker<->state-server protocol, which this environment lacks "
            "(see sdg_big_data_spark/streaming/transform_state.py module "
            "docstring). Use stateful.streaming_sessionize "
            "(applyInPandasWithState) — identical semantics."
        )
    spark = events.sparkSession
    if "RocksDB" not in (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    ):
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )

    src = events.select(
        "user_id",
        epoch_seconds("ts").alias("t"),
        "event_id",
        "value",
    )
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_session_processor(gap_s),
        outputStructType=SESSION_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
