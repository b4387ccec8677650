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

def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the big side gets a random salt in
    [0, salt), the small side is replicated ``salt`` times, and the
    join key becomes (key, salt) — a single hot key's rows then spread
    over ``salt`` reducer partitions instead of one straggler task.

    AQE's skew-join split (on by default in our sessions) handles most
    skew at runtime; explicit salting is for the cases AQE cannot fix —
    a hot key inside an aggregation-feeding join, or a first-stage
    shuffle whose skew AQE only discovers after the straggler ran.
    Replication on the small side makes every salt value a valid
    partner, so results are exactly the unsalted join's — but ONLY for
    join types that never emit unmatched small-side rows: a right/full
    outer join would surface each replicated small-side row ``salt``
    times. The salt is seeded so task retries re-derive the same value.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched "
            "small-side rows (replicated salt copies) — use the plain "
            "join for right/full outer")
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = salted_big.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")
