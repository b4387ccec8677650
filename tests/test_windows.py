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


def test_rows_mode_exclude_current(sdf):
    """frame_mode='rows': physical 1-row neighborhood, EXCLUDE CURRENT
    ROW leaves exactly the two neighbors' values."""
    out = groups_window_agg(sdf, "v", ["g"], ["k"], agg="sum",
                            preceding=1, following=1,
                            exclude="current row", frame_mode="rows")
    got = {(r["g"], r["k"], r["v"]): r["w"] for r in out.collect()}
    # partition c has a single row: empty exclusion frame -> NULL
    assert got[("c", 9, 2.0)] is None
