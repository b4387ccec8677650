"""Seeded random-expression differential: Cypher a_expr surface vs
DuckDB (PostgreSQL-semantics oracle).

The round-8 a_expr additions (LIKE/ILIKE, BETWEEN [SYMMETRIC],
IS [NOT] DISTINCT FROM, IS [NOT] TRUE/FALSE/UNKNOWN) grew the
coercion/three-valued-logic surface faster than hand-written pins can
cover, so this module generates N>=600 random expressions over typed
property columns (ints, bools, strings — each with NULLs), compiles
every one BOTH ways (our Cypher compiler -> Spark; textual SQL ->
DuckDB), and requires value-identical results row by row.

Scope: the common a_expr subset whose semantics the reference
(PostgreSQL), Spark, and DuckDB all define identically — arithmetic
(+,-,*), every comparison, AND/OR/NOT 3VL, IS NULL, IS [NOT] DISTINCT
FROM, IS TRUE/FALSE/UNKNOWN (expanded for DuckDB, which lacks the
predicate), BETWEEN [SYMMETRIC] (expanded to its standard OR form),
LIKE/ILIKE, IN lists with NULLs, CASE, coalesce. Division/modulo are
excluded (div-by-zero error behavior is engine-specific), as are
float comparisons (ulp).
"""

from __future__ import annotations

import random

import duckdb
import pytest

N_CASES = 960
BATCH = 20
SEED = 20260815

ROWS = [
    # (id, i1,   i2,   b1,    s1,    s2)
    (1, 0, 1, True, "a", "b"),
    (2, 1, 1, False, "ab", "ab"),
    (3, -2, None, None, None, "x"),
    (4, 5, -5, True, "abc", "a%c"),
    (5, None, 2, None, "%", ""),
    (6, 3, None, False, "_x", "Ab"),
    (7, -1, 4, True, "", "AB"),
    (8, None, 0, None, None, None),
]


@pytest.fixture(scope="module")
def fz_eng(spark):
    from agensgraph_spark.cypher import CypherEngine
    eng = CypherEngine(spark)
    eng.cypher("CREATE GRAPH fuzz")
    eng.cypher("CREATE VLABEL fz")
    for (i, i1, i2, b1, s1, s2) in ROWS:
        props = [f"rid: {i}"]
        for k, v in (("i1", i1), ("i2", i2)):
            if v is not None:
                props.append(f"{k}: {v}")
        if b1 is not None:
            props.append(f"b1: {str(b1).lower()}")
        for k, v in (("s1", s1), ("s2", s2)):
            if v is not None:
                props.append(f"{k}: '{v}'")
        eng.cypher("CREATE (:fz {" + ", ".join(props) + "})")
    return eng


@pytest.fixture(scope="module")
def fz_duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE fz (id INT, i1 BIGINT, i2 BIGINT, "
                "b1 BOOLEAN, s1 VARCHAR, s2 VARCHAR)")
    con.executemany("INSERT INTO fz VALUES (?, ?, ?, ?, ?, ?)", ROWS)
    return con


class Gen:
    """Each production returns (cypher_text, duckdb_sql_text)."""

    def __init__(self, rng: random.Random):
        self.r = rng

    # ---- int-valued ----
    def int_atom(self):
        c = self.r.choice(["col", "col", "lit"])
        if c == "col":
            name = self.r.choice(["i1", "i2"])
            return f"d.{name}", name
        v = self.r.randint(-5, 9)
        return (f"({v})", f"({v})") if v < 0 else (str(v), str(v))

    def int_expr(self, depth=0):
        if depth >= 2 or self.r.random() < 0.4:
            return self.int_atom()
        op = self.r.choice(["+", "-", "*"])
        a_c, a_s = self.int_expr(depth + 1)
        b_c, b_s = self.int_expr(depth + 1)
        return f"({a_c} {op} {b_c})", f"({a_s} {op} {b_s})"

    # ---- string-valued ----
    def str_atom(self):
        if self.r.random() < 0.6:
            name = self.r.choice(["s1", "s2"])
            return f"d.{name}", name
        v = self.r.choice(["a", "ab", "Ab", "", "x"])
        return f"'{v}'", f"'{v}'"

    def str_expr(self, depth=0):
        if depth >= 2 or self.r.random() < 0.5:
            return self.str_atom()
        kind = self.r.choice(["concat", "case_fn", "trim", "reverse",
                              "substring", "replace"])
        a_c, a_s = self.str_expr(depth + 1)
        if kind == "concat":
            b_c, b_s = self.str_expr(depth + 1)
            # Cypher + is string concat; SQL standard is || (both
            # NULL-propagating, unlike DuckDB's concat())
            return f"({a_c} + {b_c})", f"({a_s} || {b_s})"
        if kind == "case_fn":
            fn = self.r.choice([("toUpper", "UPPER"), ("toLower", "LOWER")])
            return f"{fn[0]}({a_c})", f"{fn[1]}({a_s})"
        if kind == "trim":
            return f"trim({a_c})", f"TRIM({a_s})"
        if kind == "reverse":
            return f"reverse({a_c})", f"REVERSE({a_s})"
        if kind == "substring":
            # Cypher substring is 0-based, SQL substr 1-based
            start = self.r.randint(0, 3)
            ln = self.r.randint(0, 3)
            return (f"substring({a_c}, {start}, {ln})",
                    f"SUBSTR({a_s}, {start + 1}, {ln})")
        b_c, b_s = self.str_atom()
        return (f"replace({a_c}, 'a', {b_c})",
                f"REPLACE({a_s}, 'a', {b_s})")

    # ---- bool-valued ----
    def bool_atom(self):
        kind = self.r.choice(
            ["col", "cmp", "null", "distinct", "between", "like", "inlist"])
        if kind == "col":
            return "d.b1", "b1"
        if kind == "cmp":
            op = self.r.choice(["=", "<>", "<", "<=", ">", ">="])
            a_c, a_s = self.int_expr()
            b_c, b_s = self.int_expr()
            return f"({a_c} {op} {b_c})", f"({a_s} {op} {b_s})"
        if kind == "null":
            neg = self.r.random() < 0.5
            t_c, t_s = self.r.choice([self.int_atom, self.str_atom,
                                      lambda: ("d.b1", "b1")])()
            word = "IS NOT NULL" if neg else "IS NULL"
            return f"({t_c} {word})", f"({t_s} {word})"
        if kind == "distinct":
            neg = "NOT " if self.r.random() < 0.5 else ""
            fam = self.r.choice([self.int_atom, self.str_atom])
            a_c, a_s = fam()
            b_c, b_s = fam()
            return (f"({a_c} IS {neg}DISTINCT FROM {b_c})",
                    f"({a_s} IS {neg}DISTINCT FROM {b_s})")
        if kind == "between":
            sym = self.r.random() < 0.5
            neg = "NOT " if self.r.random() < 0.3 else ""
            x_c, x_s = self.int_atom()
            a_c, a_s = self.int_atom()
            b_c, b_s = self.int_atom()
            if sym:
                # DuckDB lacks SYMMETRIC: expand to the SQL-standard OR
                # form PostgreSQL defines it as
                cy = f"({x_c} {neg}BETWEEN SYMMETRIC {a_c} AND {b_c})"
                core = (f"(({x_s} >= {a_s} AND {x_s} <= {b_s}) OR "
                        f"({x_s} >= {b_s} AND {x_s} <= {a_s}))")
                sql = f"(NOT {core})" if neg else core
                return cy, sql
            return (f"({x_c} {neg}BETWEEN {a_c} AND {b_c})",
                    f"({x_s} {neg}BETWEEN {a_s} AND {b_s})")
        if kind == "like":
            op = self.r.choice(["LIKE", "NOT LIKE", "ILIKE", "NOT ILIKE"])
            s_c, s_s = self.str_atom()
            pat = self.r.choice(["a%", "%b", "_", "%", "ab", "", "%a_", "A%"])
            return f"({s_c} {op} '{pat}')", f"({s_s} {op} '{pat}')"
        # inlist: 3VL IN over int lists with NULLs
        x_c, x_s = self.int_atom()
        items = [self.r.choice(["1", "2", "5", "-2", "0", "null"])
                 for _ in range(self.r.randint(1, 4))]
        cy = f"({x_c} IN [{', '.join(items)}])"
        sql = f"({x_s} IN ({', '.join('NULL' if i == 'null' else i for i in items)}))"
        return cy, sql

    def bool_expr(self, depth=0):
        if depth >= 2 or self.r.random() < 0.45:
            return self.bool_atom()
        kind = self.r.choice(["and", "or", "not", "istruth"])
        if kind == "not":
            a_c, a_s = self.bool_expr(depth + 1)
            return f"(NOT {a_c})", f"(NOT {a_s})"
        if kind == "istruth":
            a_c, a_s = self.bool_expr(depth + 1)
            neg = self.r.random() < 0.4
            word = self.r.choice(["TRUE", "FALSE", "UNKNOWN"])
            cy = f"({a_c} IS {'NOT ' if neg else ''}{word})"
            # DuckDB lacks IS [NOT] TRUE/FALSE/UNKNOWN: expand
            if word == "TRUE":
                core = f"COALESCE({a_s}, FALSE)"
            elif word == "FALSE":
                core = f"COALESCE(NOT {a_s}, FALSE)"
            else:
                core = f"({a_s} IS NULL)"
            return cy, (f"(NOT {core})" if neg else f"({core})")
        op = kind.upper()
        a_c, a_s = self.bool_expr(depth + 1)
        b_c, b_s = self.bool_expr(depth + 1)
        return f"({a_c} {op} {b_c})", f"({a_s} {op} {b_s})"

    # ---- date/timestamp-valued (round-11 expansion) ----
    DATES = ["2024-01-15", "2024-02-29", "2023-12-31", "2000-03-01",
             "1997-06-15"]
    TSS = ["2024-01-15 13:07:09", "2023-12-31 23:59:59",
           "2024-02-29 00:30:00"]

    def date_expr(self, depth=0):
        d = self.r.choice(self.DATES)
        base = (f"to_date('{d}')", f"DATE '{d}'")
        if depth >= 1 or self.r.random() < 0.45:
            return base
        # date +/- int days (columns included: NULL-propagating both
        # ways; engine casts the Cypher BIGINT day count to INT)
        i_c, i_s = self.int_expr(depth=1)
        fn, op = self.r.choice([("date_add", "+"), ("date_sub", "-")])
        a_c, a_s = self.date_expr(depth + 1)
        return (f"{fn}({a_c}, {i_c})",
                f"({a_s} {op} CAST({i_s} AS INTEGER))")

    # ---- list-valued (round-11 expansion) ----
    def list_expr(self, depth=0):
        kind = self.r.choice(["lit", "lit", "range", "tail", "slice"])
        if kind == "lit" or depth >= 2:
            items = [self.r.choice([self.int_atom, self.int_atom,
                                    lambda: ("null", "NULL")])()
                     for _ in range(self.r.randint(1, 4))]
            return (f"[{', '.join(c for c, _ in items)}]",
                    f"[{', '.join(s for _, s in items)}]")
        if kind == "range":
            # Cypher range() is INCLUSIVE; direction mismatch -> [],
            # NULL bound -> NULL — both matching generate_series
            a_c, a_s = self.int_atom()
            b_c, b_s = self.int_atom()
            return (f"range({a_c}, {b_c})",
                    f"generate_series({a_s}, {b_s})")
        a_c, a_s = self.list_expr(depth + 1)
        if kind == "tail":
            # tail = [1..n]: 0-based lo=1 -> 1-based 2, through the end
            return (f"tail({a_c})",
                    f"list_slice({a_s}, 2, 2147483647)")
        # constant-bound slice: 0-based hi-exclusive -> DuckDB 1-based
        # inclusive (lo>=0: +1; hi>=0: unchanged; negatives: lo as-is,
        # hi-1) — the full [-6,6)^2 translation matrix is validated
        # against list_slice
        lo = self.r.randint(-4, 4)
        hi = self.r.randint(-4, 4)
        lo_d = lo + 1 if lo >= 0 else lo
        hi_d = hi if hi >= 0 else hi - 1
        return (f"({a_c}[{lo}..{hi}])",
                f"list_slice({a_s}, {lo_d}, {hi_d})")

    # ---- top-level scalar (what a case projects) ----
    def scalar(self):
        kind = self.r.choice(["bool", "bool", "int", "str", "strlen",
                              "case", "coalesce",
                              # round-11 temporal/list expansion
                              "date", "datestr", "datediff", "datepart",
                              "epoch", "list", "listsize", "listidx",
                              "listhead"])
        if kind == "date":
            return self.date_expr()
        if kind == "datestr":
            a_c, a_s = self.date_expr()
            return f"toString({a_c})", f"CAST({a_s} AS VARCHAR)"
        if kind == "datediff":
            a_c, a_s = self.date_expr()
            b_c, b_s = self.date_expr()
            return f"datediff({a_c}, {b_c})", f"({a_s} - {b_s})"
        if kind == "datepart":
            fld_cy, fld_sql = self.r.choice(
                [("year", "year"), ("month", "month"),
                 ("dayofmonth", "day"), ("dayofyear", "dayofyear"),
                 ("quarter", "quarter"), ("weekofyear", "weekofyear")])
            a_c, a_s = self.date_expr()
            return (f"{fld_cy}({a_c})",
                    f"CAST(date_part('{fld_sql}', {a_s}) AS BIGINT)")
        if kind == "epoch":
            t = self.r.choice(self.TSS)
            return (f"unix_timestamp(to_timestamp('{t}'))",
                    f"CAST(epoch(TIMESTAMP '{t}') AS BIGINT)")
        if kind == "list":
            return self.list_expr()
        if kind == "listsize":
            a_c, a_s = self.list_expr()
            return f"size({a_c})", f"len({a_s})"
        if kind == "listidx":
            # Cypher 0-based with negative wrap; out-of-range/NULL -> NULL
            a_c, a_s = self.list_expr()
            if self.r.random() < 0.6:
                i = self.r.randint(-5, 5)
                i_d = i + 1 if i >= 0 else i
                return f"({a_c}[{i}])", f"({a_s}[{i_d}])"
            i_c, i_s = self.int_atom()
            return (f"({a_c}[{i_c}])",
                    f"({a_s}[CASE WHEN {i_s} >= 0 THEN {i_s} + 1 "
                    f"ELSE {i_s} END])")
        if kind == "listhead":
            fn_cy, idx = self.r.choice([("head", "1"), ("last", "-1")])
            a_c, a_s = self.list_expr()
            return f"{fn_cy}({a_c})", f"({a_s}[{idx}])"
        if kind == "bool":
            return self.bool_expr()
        if kind == "int":
            return self.int_expr()
        if kind == "str":
            return self.str_expr()
        if kind == "strlen":
            a_c, a_s = self.str_expr()
            return f"size({a_c})", f"LENGTH({a_s})"
        if kind == "case":
            c_c, c_s = self.bool_expr()
            t_c, t_s = self.int_expr()
            e_c, e_s = self.int_expr()
            if self.r.random() < 0.3:  # no ELSE -> NULL
                return (f"(CASE WHEN {c_c} THEN {t_c} END)",
                        f"(CASE WHEN {c_s} THEN {t_s} END)")
            return (f"(CASE WHEN {c_c} THEN {t_c} ELSE {e_c} END)",
                    f"(CASE WHEN {c_s} THEN {t_s} ELSE {e_s} END)")
        a_c, a_s = self.int_atom()
        b_c, b_s = self.int_atom()
        return f"coalesce({a_c}, {b_c})", f"COALESCE({a_s}, {b_s})"


def _norm(v):
    import datetime
    if isinstance(v, bool) or v is None or isinstance(v, str):
        return v
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return int(v)


def test_expr_fuzz_differential(fz_eng, fz_duck):
    rng = random.Random(SEED)
    gen = Gen(rng)
    cases = [gen.scalar() for _ in range(N_CASES)]
    failures = []
    for start in range(0, len(cases), BATCH):
        chunk = cases[start:start + BATCH]
        cy_items = ", ".join(
            f"{c} AS c{start + k}" for k, (c, _) in enumerate(chunk))
        sql_items = ", ".join(
            f"{s} AS c{start + k}" for k, (_, s) in enumerate(chunk))
        got_rows = fz_eng.cypher(
            f"MATCH (d:fz) RETURN d.rid AS rid, {cy_items} ORDER BY rid"
        ).collect()
        want_rows = fz_duck.execute(
            f"SELECT id AS rid, {sql_items} FROM fz ORDER BY rid").fetchall()
        assert len(got_rows) == len(want_rows) == len(ROWS)
        for k, (cy, sql) in enumerate(chunk):
            col = f"c{start + k}"
            got = [_norm(r[col]) for r in got_rows]
            want = [_norm(w[k + 1]) for w in want_rows]
            if got != want:
                failures.append((start + k, cy, sql, got, want))
    msg = "\n".join(
        f"case {i}: CY {cy!r} vs SQL {sql!r}\n  spark={g}\n  duck ={w}"
        for i, cy, sql, g, w in failures[:10])
    assert not failures, f"{len(failures)}/{N_CASES} diverged:\n{msg}"
