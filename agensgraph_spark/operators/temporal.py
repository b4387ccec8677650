"""Temporal joins — as-of and range joins, the time-series operators a
feature-engineering or event-correlation pipeline needs and Spark has
no built-in form of.

Both are pure DataFrame compositions (no UDFs, no mapInPandas):

- ``asof_join`` uses the union+window formulation: both sides are
  unioned on the (by, time) axis and the latest right payload is
  carried forward with ``last(ignoreNulls)`` over a running window —
  ONE shuffle on the by-key, no self-join, no per-row search. This is
  the standard distributed as-of shape; a naive non-equi join would be
  a cartesian per key.
- ``range_join`` equi-joins on coarse time bins (ranges explode into
  the bins they cover; points land in exactly one bin) and then
  applies the exact containment filter — turning the O(|L|x|R|)
  inequality join into a bin-partitioned equi-join. Each qualifying
  pair appears exactly once (the point's bin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = (),
    tolerance_sec: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    right.on <= left.on (inclusive) and equal ``by`` keys, as a struct
    column ``matched`` (NULL when no right row precedes). With
    ``tolerance_sec``, matches older than the tolerance are nulled.
    ``direction="forward"`` flips the search: the EARLIEST right row
    with right.on >= left.on (the "next reading" join).
    Ties on (by, on) within the right side resolve by the right
    payload's struct order (deterministic, documented). Without ``by``
    the window is a single partition — fine for dimension-sized right
    tables, not for corpus-scale ones."""
    lcols = list(left.columns)
    rpayload = [c for c in right.columns if c != on and c not in by]
    ltype = T.StructType([left.schema[c] for c in lcols])
    rtype = T.StructType([right.schema[c] for c in [on] + rpayload])
    l = left.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast(rtype).alias("_r"))
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias("_t"),
        F.lit(0).alias("_side"),  # right rows sort first at equal time
        F.lit(None).cast(ltype).alias("_l"),
        F.struct(F.col(on), *[F.col(c) for c in rpayload]).alias("_r"))
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward, got {direction!r}")
    u = l.unionByName(r)
    # forward = the same running-last trick over REVERSED time order
    torder = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (Window.partitionBy(*[F.col(c) for c in by])
         .orderBy(torder, F.col("_side").asc(), F.col("_r").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = F.last("_r", ignorenulls=True).over(w)
    out = (u.withColumn("_m", matched)
           .filter(F.col("_side") == 1))
    if tolerance_sec is not None:
        gap = (F.col("_t").cast("double") - F.col("_m")[on].cast("double"))
        if direction == "forward":
            gap = -gap
        out = out.withColumn(
            "_m", F.when(gap <= F.lit(float(tolerance_sec)), F.col("_m")))
    return out.select(*[F.col(f"_l.{c}").alias(c) for c in lcols],
                      F.col("_m").alias("matched"))


def _bin(col: Column, width_sec: float) -> Column:
    return F.floor(col.cast("timestamp").cast("double") / F.lit(float(width_sec)))


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    by: tuple[str, ...] = (),
    bin_sec: float = 3600.0,
    how: str = "inner",
) -> DataFrame:
    """Join left rows whose ``point`` falls inside a right row's
    [start, end] (inclusive). ``bin_sec`` should be on the order of the
    typical range length: too fine explodes ranges into many bins, too
    coarse packs unrelated rows into one bin — either degrades toward
    the cartesian the binning avoids. Returns left.* + right.*."""
    if how != "inner":
        raise ValueError("range_join supports inner joins only")
    lb = left.withColumn("_bin", _bin(F.col(point), bin_sec))
    rb = right.withColumn(
        "_bin", F.explode(F.sequence(_bin(F.col(start), bin_sec),
                                     _bin(F.col(end), bin_sec))))
    j = lb.join(rb, [*by, "_bin"]).filter(
        (F.col(point) >= F.col(start)) & (F.col(point) <= F.col(end)))
    return j.drop("_bin")


def assign_sessions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    bucket_seconds: "int | None" = None,
) -> DataFrame:
    """Gaps-and-islands sessionization (the batch analog of
    streaming/ `session_window`): a new session starts whenever the
    gap to the user's previous event exceeds ``gap_seconds``; the
    returned frame is the input plus a 1-based ``session_seq`` per
    user (cumulative sum of boundary flags — the classic two-window
    formulation).

    ONE shuffle on the user key; both windows share the partitioning,
    and a downstream per-(user, session) aggregate reuses it too
    (hash-clustering on the user key already co-locates every
    (user, session_seq) group — Catalyst inserts no second exchange).
    Session assignment is deterministic even under timestamp ties:
    a zero delta can never exceed the positive gap, so tie order
    cannot move a boundary.

    The gap compares at FULL timestamp precision — exact integer
    microseconds via timestampdiff(MICROSECOND), which accepts both
    TIMESTAMP and TIMESTAMP_NTZ (a double cast does not): a 1800.5s
    gap splits at gap=1800. unix_timestamp() truncates to whole
    seconds, which would silently diverge from both the streaming
    sibling (streaming/sessionize.py compares epoch milliseconds) and
    ms-precision SQL oracles on sub-second gaps.

    ``bucket_seconds`` (opt-in) is the SKEW-SAFE configuration: a
    per-user window puts the whole hottest user in ONE task — on a
    bot-heavy event log at 100 TB that task sorts a two-digit share of
    the corpus alone. With a bucket width, the event-level work runs
    within (user, time-bucket) partitions instead: within-bucket
    boundaries come from the same lag comparison, the first event of
    each bucket compares against the previous NON-EMPTY bucket's last
    timestamp (a per-bucket mini-frame — one row per (user, bucket) —
    carries it), and ``session_seq`` adds the bucket's exclusive
    running boundary count to the within-bucket cumulative sum. Output
    is IDENTICAL to the default mode for any bucket width: consecutive
    event pairs are exactly within-bucket pairs plus adjacent
    cross-bucket pairs, and zero-delta ties still cannot split. Cost:
    the big data takes one (user, bucket) exchange reused by window,
    aggregate, and join (plan-asserted); only the narrow per-bucket
    frame is windowed per user. Pick a width well above the gap so
    cross-bucket boundaries stay rare (e.g. a day for a 30-min gap)."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    gap_us = int(gap_seconds) * 1_000_000
    ts = F.col(ts_col)
    if bucket_seconds is None:
        w = Window.partitionBy(user_col).orderBy(ts.asc())
        prev = F.lag(ts).over(w)
        new_sess = F.when(
            prev.isNull()
            | (F.timestamp_diff("MICROSECOND", prev, ts) > gap_us),
            F.lit(1)).otherwise(F.lit(0))
        cum = Window.partitionBy(user_col).orderBy(ts.asc()) \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return (df.withColumn("_new", new_sess)
                .withColumn("session_seq", F.sum("_new").over(cum))
                .drop("_new"))

    if bucket_seconds <= 0:
        raise ValueError(
            f"bucket_seconds must be positive, got {bucket_seconds}")
    # whole-second bucketing is fine: bucket EDGES only route events to
    # tasks — every gap comparison below stays exact microseconds.
    #
    # Decomposition: a bucket's full boundary flags are (first event:
    # cross-bucket flag) + (others: within-bucket flag), so
    #   session_seq(e) = base(bucket) + first_flag(bucket)
    #                    + cumsum of WITHIN-bucket flags up to e
    # where base is the user's exclusive running boundary count over
    # previous buckets. Everything cross-bucket lives on the per-bucket
    # MINI-frame (one narrow row per non-empty (user, bucket)); the
    # event level needs only within-bucket lag + cumsum, both on the
    # one (user, bucket) exchange. The mini-frame branch re-reads the
    # source column-pruned to (user, ts) — at 100 TB that narrow second
    # scan beats materializing the full-width frame just to share one.
    bucket = F.floor(F.unix_timestamp(ts) / F.lit(int(bucket_seconds)))
    w_b = Window.partitionBy(user_col, "_b").orderBy(ts.asc())
    prev_in = F.lag(ts).over(w_b)
    # within-bucket flag only: the bucket's first event is handled by
    # the mini-frame's cross-bucket first_flag. "First row of the
    # bucket" is detected by lag over a LITERAL, not by prev_in being
    # NULL — in the NULL-ts bucket every prev VALUE is NULL, and the
    # default mode flags each such row as a new session (prev.isNull()
    # is true for a NULL ts value), so the bucketed mode must too or
    # the documented cross-mode identity breaks on >=2 NULL-ts rows
    # per user (round-13 ADVICE).
    first_in = F.lag(F.lit(1)).over(w_b).isNull()
    new_in = F.when(
        ~first_in
        & (prev_in.isNull()
           | (F.timestamp_diff("MICROSECOND", prev_in, ts) > gap_us)),
        F.lit(1)).otherwise(F.lit(0))

    w_mini = Window.partitionBy(user_col, "_b").orderBy(F.col("_ts").asc())
    mini_prev = F.lag("_ts").over(w_mini)
    mini_first = F.lag(F.lit(1)).over(w_mini).isNull()
    mini = (df.select(F.col(user_col), ts.alias("_ts"))
            .withColumn("_b", F.floor(
                F.unix_timestamp(F.col("_ts"))
                / F.lit(int(bucket_seconds))).cast("long"))
            # same first-row-vs-NULL-value distinction as new_in above
            .withColumn("_new_in", F.when(
                ~mini_first
                & (mini_prev.isNull()
                   | (F.timestamp_diff("MICROSECOND", mini_prev,
                                       F.col("_ts")) > gap_us)),
                F.lit(1)).otherwise(F.lit(0)))
            # reuses the (user, bucket) exchange of its own window
            .groupBy(user_col, "_b")
            .agg(F.min("_ts").alias("_first"), F.max("_ts").alias("_last"),
                 F.sum("_new_in").alias("_cnt_in")))
    w_u = Window.partitionBy(user_col).orderBy(F.col("_b").asc())
    prev_last = F.lag("_last").over(w_u)
    first_flag = F.when(
        prev_last.isNull()
        | (F.timestamp_diff("MICROSECOND", prev_last, F.col("_first"))
           > gap_us),
        F.lit(1)).otherwise(F.lit(0))
    w_excl = Window.partitionBy(user_col).orderBy(F.col("_b").asc()) \
        .rowsBetween(Window.unboundedPreceding, -1)
    mini = (mini.withColumn("_ff", first_flag)
            .withColumn("_base", F.coalesce(
                F.sum(F.col("_cnt_in") + F.col("_ff")).over(w_excl),
                F.lit(0)))
            .select(F.col(user_col).alias("_mu"), F.col("_b").alias("_mb"),
                    "_ff", "_base"))

    cum_in = Window.partitionBy(user_col, "_b").orderBy(ts.asc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # NULL-SAFE join keys: windows and groupBy both treat a NULL user
    # or NULL ts (null bucket) as its own group — an equality join
    # would silently DROP those rows while the single-window mode keeps
    # them; the modes must stay row-for-row identical
    out = (df.withColumn("_b", bucket.cast("long"))
           .withColumn("_cum_in", F.sum(new_in).over(cum_in))
           .join(mini, F.col(user_col).eqNullSafe(F.col("_mu"))
                 & F.col("_b").eqNullSafe(F.col("_mb")))
           .withColumn("session_seq",
                       F.col("_base") + F.col("_ff") + F.col("_cum_in")))
    return out.select(*df.columns, "session_seq")
