"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

No reference-parity item (the reference has no streaming, SURVEY.md
§2.9) — this is the engine's example of an operator Structured
Streaming's built-ins cannot express: per-user sessions that close
after ``gap`` seconds of inactivity, emitted only when they close.
State = (session start, last event ts, count, value sum) per user;
timeouts drive emission, watermark bounds state.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start timestamp, session_end timestamp, "
                  "n_events long, total_value double")
STATE_SCHEMA = "start long, last long, n long, total double"


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-sessionize a stream of (user_id, ts, value). Emits one row
    per CLOSED session (a session closes when no event arrives for
    ``gap_seconds``, enforced by event-time timeout)."""
    gap_ms = gap_seconds * 1000

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user,
                "session_start": pd.Timestamp(start, unit="ms"),
                "session_end": pd.Timestamp(last, unit="ms"),
                "n_events": n, "total_value": total,
            }])
            return
        rows = pd.concat(list(pdfs)).sort_values(ts_col, kind="stable")
        ts_ms = rows[ts_col].astype("int64") // 1_000_000
        vals = rows[value_col].astype("float64")
        closed = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = int(ts_ms.iloc[0])
            n, total = 0, 0.0
        for t, v in zip(ts_ms, vals):
            t = int(t)
            if t - last > gap_ms:
                closed.append((user, pd.Timestamp(start, unit="ms"),
                               pd.Timestamp(last, unit="ms"), n, total))
                start, n, total = t, 0, 0.0
            last = t
            n += 1
            total += float(v)
        state.update((start, last, n, total))
        state.setTimeoutTimestamp(last + gap_ms)
        if closed:
            yield pd.DataFrame(closed, columns=[
                "user_id", "session_start", "session_end", "n_events", "total_value"])

    return (events.withWatermark(ts_col, watermark)
            .groupBy(user_col)
            .applyInPandasWithState(fn, SESSION_SCHEMA, STATE_SCHEMA,
                                    "update", GroupStateTimeout.EventTimeTimeout))
