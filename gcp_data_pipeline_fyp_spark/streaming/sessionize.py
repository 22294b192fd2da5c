"""Custom stateful streaming operator: gap-based sessionization.

The batch engine answers sessionization with lag/sum windows
(queries_analytics.q_sessionize_events, DuckDB-checked). Under
Structured Streaming those windows don't exist — per-key state does.
This is the `applyInPandasWithState` rendering: state per user carries
(last event ts, current session ordinal), sessions close when the gap
exceeds `gap` seconds OR the state times out, and every event is
emitted with its session id. Batch-vs-stream equivalence is asserted
in tests/test_streaming_state.py by feeding the same rows in two
micro-batches and comparing against the batch window query.

Scale notes: state is O(active keys), partitioned by the grouping key
across executors; the timeout bounds it to keys active within the
horizon. This is the template for any custom stateful operator the
reference lacks (SURVEY.md §2.5 — the engine generalizes the
reference's batch-only surface).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, event_id long, ts timestamp, session_id long"
STATE_SCHEMA = "last_ts double, session_id long"


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: float = 1800.0,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # close the open session but KEEP the counter: removing state
        # would restart later events at session_id 1, colliding with
        # already-emitted ids. last_ts=-1 marks "no open session".
        if state.exists:
            _lt, sid = state.get
            state.update((-1.0, int(sid)))
            state.setTimeoutDuration(24 * 3600 * 1000)
        return
    if state.exists:
        last_ts, session_id = state.get
        if last_ts is not None and last_ts < 0:
            last_ts = None  # timed out earlier: next event opens a new session
    else:
        last_ts, session_id = None, 0
    frames = []
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        # Vectorized gap check: only the first row compares against the
        # carried state; every other row compares against its
        # predecessor in this batch, so a shift + cumsum is exact.
        t = pdf["ts"].values.astype("datetime64[ns]").astype("int64") / 1e9
        prev = np.empty_like(t)
        prev[0] = last_ts if last_ts is not None else -np.inf
        prev[1:] = t[:-1]
        out_sessions = session_id + np.cumsum((t - prev) > gap_seconds)
        if len(t):
            last_ts = float(t[-1])
            session_id = int(out_sessions[-1])
        frames.append(
            pd.DataFrame(
                {
                    "user_id": user_id,
                    "event_id": pdf["event_id"].values,
                    "ts": pdf["ts"].values,
                    "session_id": out_sessions,
                }
            )
        )
    if last_ts is not None:
        state.update((float(last_ts), int(session_id)))
        state.setTimeoutDuration(int(gap_seconds * 2 * 1000))
    yield from frames


def sessionize_stream(
    events: DataFrame,
    gap_seconds: float = 1800.0,
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Assign gap-based session ids per key over a (streaming) DataFrame."""

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_seconds)

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
