"""Window frame extensions Spark lacks natively: the GROUPS frame mode
and the EXCLUDE clause (reference: gram.y:14728 opt_frame_clause /
opt_window_exclusion_clause).

GROUPS BETWEEN n PRECEDING AND m FOLLOWING is RANGE over the
dense_rank of the ORDER key — peer groups collapse to consecutive
integers, so a rank-range of n spans exactly n peer groups. EXCLUDE
has two execution strategies, chosen by the aggregate:

- invertible aggregates (sum / count / avg): frame aggregate minus the
  excluded contribution (own row or peer group) — O(1) extra state per
  row, frame-size independent, the right shape for wide frames;
- everything else (min / max / collect_list): collect
  (peer-rank, row-id, value) structs over the frame, FILTER by the
  exclusion predicate, aggregate the survivor array — O(frame) memory
  per row, for bounded frames.

Exactness against PostgreSQL semantics is proven by the DuckDB-native
GROUPS/EXCLUDE oracles (workload.py: sql_window_groups,
sql_window_exclude, sql_window_exclude_minmax) and
tests/test_windows.py, which replays this module's output against
DuckDB's native EXCLUDE on the same rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_EXCLUDES = ("no others", "current row", "group", "ties")
_INVERTIBLE = ("sum", "count", "avg")
_GENERAL = ("min", "max", "collect_list")


def groups_window_agg(
    df: DataFrame,
    value_col: str,
    partition_by: "list[str]",
    order_by: "list[str]",
    agg: str = "sum",
    preceding: int = 1,
    following: int = 1,
    exclude: str = "no others",
    frame_mode: str = "groups",
    out_col: str = "w",
) -> DataFrame:
    """``agg(value) OVER (PARTITION BY ... ORDER BY ... <frame_mode>
    BETWEEN preceding PRECEDING AND following FOLLOWING EXCLUDE
    <exclude>)`` — returns ``df`` plus the ``out_col`` column.

    ``frame_mode``: 'groups' (peer-group units, the mode Spark lacks)
    or 'rows' (physical rows). ``exclude``: 'no others' |
    'current row' | 'group' | 'ties'. ``agg``: sum, count, avg
    (subtraction strategy) or min, max, collect_list (collect-filter
    strategy). Empty post-exclusion frames yield NULL (0 for count,
    empty array for collect_list) — SQL aggregate-over-empty rules.
    NULL values: the helper aggregates them the way the underlying
    Spark aggregate does (ignored by sum/avg/min/max, kept by
    collect_list? — no: Spark's collect_list drops NULLs, matching
    PostgreSQL's array_agg(...) FILTER (WHERE v IS NOT NULL) shape;
    pass a pre-coalesced column if NULL retention matters)."""
    if exclude not in _EXCLUDES:
        raise ValueError(f"exclude must be one of {_EXCLUDES}, got {exclude!r}")
    if frame_mode not in ("groups", "rows"):
        raise ValueError(f"frame_mode must be 'groups' or 'rows', got {frame_mode!r}")
    if agg not in _INVERTIBLE + _GENERAL:
        raise ValueError(
            f"agg must be one of {_INVERTIBLE + _GENERAL}, got {agg!r}")

    v = F.col(value_col)
    pcols = [F.col(c) for c in partition_by]
    ocols = [F.col(c) for c in order_by]
    # peer-group rank (GROUPS unit) + a per-row identity for exclusion
    rank_w = Window.partitionBy(*pcols).orderBy(*ocols)
    df = (df.withColumn("__dr", F.dense_rank().over(rank_w))
            .withColumn("__rid", F.row_number().over(rank_w)))
    if frame_mode == "groups":
        frame_w = (Window.partitionBy(*pcols).orderBy("__dr")
                   .rangeBetween(-preceding, following))
    else:
        frame_w = (Window.partitionBy(*pcols).orderBy("__dr", "__rid")
                   .rowsBetween(-preceding, following))

    # In ROWS mode the physical frame can cut a peer group in half, but
    # the subtraction strategy's group window always spans the WHOLE
    # peer group — it would over-subtract rows outside the frame. Only
    # GROUPS mode (frame boundaries are peer-group boundaries) and
    # EXCLUDE CURRENT ROW (the row is always inside its own frame) are
    # safe for subtraction; rows+group/ties must use the frame-exact
    # collect-filter strategy.
    subtraction_ok = frame_mode == "groups" or exclude == "current row"
    if agg in _INVERTIBLE and exclude != "no others" and subtraction_ok:
        out = _invertible(df, v, pcols, frame_w, agg, exclude, out_col)
    elif exclude == "no others":
        fn = {"sum": F.sum, "count": F.count, "avg": F.avg,
              "min": F.min, "max": F.max,
              "collect_list": F.collect_list}[agg]
        out = df.withColumn(out_col, fn(v).over(frame_w))
    else:
        out = _collect_filter(df, v, frame_w, agg, exclude, out_col)
    return out.drop("__dr", "__rid")


def _invertible(df: DataFrame, v: Column, pcols, frame_w, agg: str,
                exclude: str, out_col: str) -> DataFrame:
    """Subtraction strategy: frame aggregate minus the excluded
    contribution. O(1) per row — use for wide frames."""
    group_w = Window.partitionBy(*(pcols + [F.col("__dr")]))
    fsum, fcnt = F.sum(v).over(frame_w), F.count(v).over(frame_w)
    gsum, gcnt = F.sum(v).over(group_w), F.count(v).over(group_w)
    if exclude == "current row":
        esum = F.when(v.isNotNull(), v).otherwise(F.lit(0))
        ecnt = v.isNotNull().cast("long")
    elif exclude == "group":
        esum, ecnt = gsum, gcnt
    else:  # ties: peers minus the row itself
        esum = gsum - F.when(v.isNotNull(), v).otherwise(F.lit(0))
        ecnt = gcnt - v.isNotNull().cast("long")
    surv = fcnt - ecnt
    s = F.coalesce(fsum, F.lit(0)) - F.coalesce(esum, F.lit(0))
    if agg == "count":
        return df.withColumn(out_col, surv)
    col = F.when(surv > 0, s if agg == "sum" else s / surv)
    return df.withColumn(out_col, col)


def _collect_filter(df: DataFrame, v: Column, frame_w, agg: str,
                    exclude: str, out_col: str) -> DataFrame:
    """General strategy: collect (peer-rank, row-id, value) structs
    over the frame, filter by the exclusion predicate, aggregate the
    survivor array. O(frame) per row — use for bounded frames; works
    for any array-expressible aggregate."""
    fr = F.collect_list(F.struct(
        F.col("__dr").alias("xdr"), F.col("__rid").alias("xrid"),
        v.alias("v"))).over(frame_w)
    dr, rid = F.col("__dr"), F.col("__rid")
    pred = {
        "current row": lambda x: x["xrid"] != rid,
        "group": lambda x: x["xdr"] != dr,
        "ties": lambda x: (x["xdr"] != dr) | (x["xrid"] == rid),
    }[exclude]
    vals = F.transform(F.filter(fr, pred), lambda x: x["v"])
    col = {
        "min": F.array_min(vals),
        "max": F.array_max(vals),
        "collect_list": F.filter(vals, lambda x: x.isNotNull()),
        "sum": F.when(F.size(vals) > 0, F.aggregate(
            vals, F.lit(None).cast("double"),
            lambda acc, x: F.coalesce(acc + x, x, acc))),
        "count": F.size(F.filter(vals, lambda x: x.isNotNull())).cast("long"),
    }
    nn = F.size(F.filter(vals, lambda x: x.isNotNull())).cast("long")
    col["avg"] = F.when(nn > 0, col["sum"] / nn)
    col = col.get(agg)
    if col is None:
        raise ValueError(f"unsupported agg {agg!r} for collect strategy")
    return df.withColumn(out_col, col)
