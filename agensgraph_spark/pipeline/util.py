"""Shared scale guards for the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default ceiling for an explicit broadcast hint. Spark's own
# autoBroadcastJoinThreshold defaults to 10 MB; we allow more because
# these are deliberate dimension-side broadcasts, but stay far under
# executor/driver memory so a corpus-sized side can never OOM the
# driver. Past the ceiling we return the frame unhinted and let AQE
# pick the join strategy from runtime statistics.
BROADCAST_LIMIT_BYTES = 64 << 20


def maybe_broadcast(
    df: DataFrame,
    est_row_bytes: float,
    n_rows: int | None = None,
    limit_bytes: int = BROADCAST_LIMIT_BYTES,
) -> DataFrame:
    """Broadcast-hint ``df`` only when ``n_rows * est_row_bytes`` fits
    under ``limit_bytes``. ``n_rows`` is counted if not supplied —
    callers that already materialized (persisted) the frame should pass
    the known count to keep this free."""
    if n_rows is None:
        n_rows = df.count()
    if n_rows * est_row_bytes <= limit_bytes:
        return F.broadcast(df)
    return df
