"""Stream-stream interval join — the remaining canonical Structured
Streaming operator next to windowed aggregation, delivery dedup, and
stateful sessionization (streaming/ingest.py, sessionize.py).

The attribution shape: events on one stream (clicks) match events on
another stream (views) for the same key within a bounded time window.
Spark executes it with BOTH sides buffered in watermark-bounded state;
the explicit time-range predicate is what lets the engine expire
state — an equi-join without it would buffer both streams forever,
which is exactly the shape that cannot run at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_ts_col: str,
    right_ts_col: str,
    lookback_seconds: int = 1800,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` events to ``left`` events arriving in
    [left_ts - lookback, left_ts] under event-time watermarks on both
    sides. ``on`` is the equi-key condition (callers rename columns so
    the two sides never share a name — streaming self-joins from one
    source otherwise hit ambiguous-column resolution). Timestamp
    columns must already be TIMESTAMP (see loader.normalize_event_ts).

    State contract: each side buffers only rows younger than
    watermark + lookback relative to the global event-time frontier —
    the range predicate below is the state-cleanup condition Spark
    derives bounds from, not merely a filter. Late rows beyond the
    watermark are dropped, the same lateness contract as the windowed
    aggregates. ``how`` extends to 'left_outer' (emitted on state
    expiry) with identical bounds."""
    if lookback_seconds < 0:
        raise ValueError(
            f"lookback_seconds must be non-negative, got {lookback_seconds}")
    lw = left.withWatermark(left_ts_col, watermark)
    rw = right.withWatermark(right_ts_col, watermark)
    lts, rts = F.col(left_ts_col), F.col(right_ts_col)
    cond = (on
            & (rts >= lts - F.expr(f"INTERVAL {lookback_seconds} SECONDS"))
            & (rts <= lts))
    return lw.join(rw, cond, how)
