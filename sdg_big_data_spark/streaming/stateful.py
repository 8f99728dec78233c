"""Custom stateful streaming operator — ``applyInPandasWithState``.

The engine's representative arbitrary-state operator: streaming gap-based
sessionization (the relational core of stop detection F2, batch form
``g_sessionize``). Per user, an open session accumulates events until a
gap > ``gap_s`` arrives (or the event-time timeout fires); closed
sessions are emitted with the same shape as the batch operator, so
stream and batch results are directly comparable.

State design at 100 TB-of-stream: state is ONE small tuple per active
user (start, last, count, value sum) — not the events themselves; the
processing-time timeout evicts idle users, so state size tracks active
users, not history. This is the ``applyInPandasWithState`` pattern the
built-in ``session_window`` cannot express when the per-session
aggregate needs custom transition logic (running medoids, conditional
accumulators, model state, ...).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.timeutil import epoch_seconds

SESSION_SCHEMA = (
    "user_id long, t_start long, t_end long, duration long, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = "start long, last long, n long, v double"


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_s: int,
    timeout: bool,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, v = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "t_start": [start],
                "t_end": [last],
                "duration": [last - start],
                "n_events": [n],
                "total_value": [v],
            }
        )
        return

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["t", "event_id"], kind="mergesort"
    )
    if state.exists:
        start, last, n, v = state.get
    else:
        start = last = None
        n, v = 0, 0.0

    closed = []
    for t, val in zip(rows["t"].to_numpy(), rows["value"].to_numpy()):
        t = int(t)
        if start is None:
            start, last, n, v = t, t, 1, float(val)
        elif t - last > gap_s:
            closed.append((start, last, last - start, n, v))
            start, last, n, v = t, t, 1, float(val)
        else:
            last, n, v = t, n + 1, v + float(val)

    state.update((start, last, n, v))
    if timeout:
        state.setTimeoutDuration(gap_s * 1000)
    if closed:
        out = pd.DataFrame(
            closed, columns=["t_start", "t_end", "duration", "n_events", "total_value"]
        )
        out.insert(0, "user_id", user_id)
        yield out


def streaming_sessionize(
    events: DataFrame, gap_s: int = 3600, idle_timeout: bool = False
) -> DataFrame:
    """Stateful gap sessionization over a streaming (user_id, ts,
    event_id, value) frame. Emits CLOSED sessions.

    ``idle_timeout=True`` adds a processing-time timeout that flushes
    open sessions after ``gap_s`` of wall-clock silence — use it for
    continuous deployments. Leave False under ``availableNow`` batch
    drains: a registered timeout keeps scheduling micro-batches after
    the input is exhausted, so the query never terminates (open sessions
    simply stay in state for the next run, which is also the semantics
    the incremental-append protocol expects).

    Assumes per-key micro-batch arrival is time-ordered ACROSS batches
    (within a batch the operator sorts). That holds for append-only
    time-partitioned feeds; genuinely late data needs an event-time
    buffer in state (hold events until watermark) — same trade the
    reference makes with its 2-day overlap rewind instead."""
    import pyspark.sql.functions as F

    src = events.select(
        "user_id",
        epoch_seconds("ts").alias("t"),
        "event_id",
        "value",
    )

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_s, idle_timeout)

    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )
