"""GROUPS-frame + EXCLUDE window emulation (operators/windows.py)
replayed against DuckDB's NATIVE `GROUPS BETWEEN ... EXCLUDE ...`
(reference: gram.y:14728) on the same rows — both execution
strategies (invertible subtraction and collect-filter-aggregate)."""

import duckdb
import pytest

from agensgraph_spark.operators.windows import groups_window_agg

ROWS = [  # (grp, ord-key with TIES, value)
    ("a", 1, 10.0), ("a", 1, 12.0), ("a", 2, 7.0), ("a", 3, 7.0),
    ("a", 3, 1.0), ("a", 4, 30.0),
    ("b", 1, 5.0), ("b", 2, 5.0), ("b", 2, 5.0),
    ("c", 9, 2.0),
]


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(ROWS, "g string, k int, v double") \
        .localCheckpoint()


def duck(agg, exclude):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, k INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", ROWS)
    ex = "" if exclude == "no others" else f" EXCLUDE {exclude.upper()}"
    # this DuckDB lacks GROUPS mode — RANGE over dense_rank is the
    # exact equivalence (peer groups collapse to consecutive ints),
    # with EXCLUDE still native
    rows = con.execute(f"""
        WITH t2 AS (SELECT g, k, v,
                    DENSE_RANK() OVER (PARTITION BY g ORDER BY k) AS dr
                    FROM t)
        SELECT g, k, v, {agg}(v) OVER (PARTITION BY g ORDER BY dr
            RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING{ex}) AS w
        FROM t2 ORDER BY g, k, v
    """).fetchall()
    con.close()
    return rows


def norm(x):
    if isinstance(x, float):
        return round(x, 9)
    if isinstance(x, list):
        return sorted(x)
    return x


@pytest.mark.parametrize("agg", ["sum", "count", "avg", "min", "max"])
@pytest.mark.parametrize("exclude", ["no others", "current row", "group", "ties"])
def test_groups_exclude_matches_duckdb_native(sdf, agg, exclude):
    got = groups_window_agg(sdf, "v", ["g"], ["k"], agg=agg,
                            exclude=exclude).orderBy("g", "k", "v").collect()
    want = duck(agg, exclude)
    assert len(got) == len(want)
    for gr, wr in zip([tuple(r) for r in got], want):
        assert gr[:3] == wr[:3]
        assert norm(gr[3]) == norm(wr[3]), (agg, exclude, gr, wr)


def test_collect_list_exclude(sdf):
    """collect_list has no DuckDB twin with identical NULL handling —
    pin it by hand: frame = 1 group either side, EXCLUDE GROUP keeps
    only the neighbor groups' values."""
    got = {(r["g"], r["k"], r["v"]): sorted(r["w"]) for r in
           groups_window_agg(sdf, "v", ["g"], ["k"], agg="collect_list",
                             exclude="group").collect()}
    assert got[("a", 2, 7.0)] == [1.0, 7.0, 10.0, 12.0]   # groups 1 and 3
    assert got[("a", 1, 10.0)] == [7.0]                    # group 2 only
    assert got[("c", 9, 2.0)] == []                        # lone group


STRADDLE = [  # k=2 rows have distinct v: each its own (k, v) peer group
    ("a", 1, 1.0), ("a", 2, 10.0), ("a", 2, 20.0), ("a", 2, 40.0),
    ("a", 3, 100.0),
]
TIE_STRADDLE = [  # a (k, v)-equal peer group of THREE rows, frame ±1:
    ("a", 1, 1.0),  # the edge 7.0 rows see only 2 of their 3 peers in
    ("a", 2, 7.0), ("a", 2, 7.0), ("a", 2, 7.0),  # frame — subtraction
    ("a", 3, 9.0),  # over the whole peer group would over-subtract
]


def duck_rows(agg, exclude, rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, k INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    ex = "" if exclude == "no others" else f" EXCLUDE {exclude.upper()}"
    # ORDER BY k, v makes the physical row order deterministic on both
    # sides; peers (for EXCLUDE GROUP/TIES) are (k, v)-equal rows
    out = con.execute(f"""
        SELECT g, k, v, {agg}(v) OVER (PARTITION BY g ORDER BY k, v
            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING{ex}) AS w
        FROM t ORDER BY g, k, v
    """).fetchall()
    con.close()
    return out


@pytest.mark.parametrize("agg", ["sum", "count", "avg", "min", "max"])
@pytest.mark.parametrize("exclude", ["current row", "group", "ties"])
@pytest.mark.parametrize("data", [ROWS, STRADDLE, TIE_STRADDLE])
def test_rows_exclude_matches_duckdb_native(spark, agg, exclude, data):
    """ROWS-mode EXCLUDE vs DuckDB native — the STRADDLE data pins the
    case where a peer group extends beyond the physical frame, which
    the subtraction strategy over-subtracts (it must route through
    collect-filter)."""
    sdf2 = spark.createDataFrame(data, "g string, k int, v double")
    got = groups_window_agg(sdf2, "v", ["g"], ["k", "v"], agg=agg,
                            preceding=1, following=1, exclude=exclude,
                            frame_mode="rows").collect()
    want = duck_rows(agg, exclude, data)
    # identical (g, k, v) tie rows are physically interchangeable, so
    # the engines may attach the straddled-frame results to different
    # tie rows — compare the (g, k, v, w) MULTISET, not row order
    key = lambda t: (t[0], t[1], t[2], t[3] is None, t[3] or 0)
    gset = sorted(((r[0], r[1], r[2], norm(r[3])) for r in got), key=key)
    wset = sorted(((r[0], r[1], r[2], norm(r[3])) for r in want), key=key)
    assert gset == wset, (agg, exclude, gset, wset)


def test_rows_mode_exclude_current(sdf):
    """frame_mode='rows': physical 1-row neighborhood, EXCLUDE CURRENT
    ROW leaves exactly the two neighbors' values."""
    out = groups_window_agg(sdf, "v", ["g"], ["k"], agg="sum",
                            preceding=1, following=1,
                            exclude="current row", frame_mode="rows")
    got = {(r["g"], r["k"], r["v"]): r["w"] for r in out.collect()}
    # partition c has a single row: empty exclusion frame -> NULL
    assert got[("c", 9, 2.0)] is None
