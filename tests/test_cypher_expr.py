"""Expression-semantics parity with the reference corpus
(cypher_expr.sql: coercion matrix, literals, lists/maps, CASE, IN,
truthiness; cypher_substring.sql: 0-based substring)."""

import pytest

from agensgraph_spark.catalog import GraphCatalog
from agensgraph_spark.cypher.compiler import CypherEngine
from agensgraph_spark.graph import Graph


@pytest.fixture(scope="module")
def eng(spark):
    return CypherEngine(spark, Graph(GraphCatalog("x")))


def one(eng, expr: str):
    df = eng.cypher(f"RETURN {expr} AS v")
    return df.collect()[0]["v"]


# --- arithmetic coercion matrix (cypher_expr.sql:52-128, jsonb_add
# semantics cypher_ops.c:25-125) ---

@pytest.mark.parametrize("expr,expected", [
    ("'1' + '1'", "11"),       # string + string → concat
    ("'1' + 1", "11"),         # string + number → concat
    ("1 + '1'", "11"),         # number + string → concat
    ("1 + 1", 2),
    ("1 - 1", 0),
    ("2 * 2", 4),
    ("2 / 2", 1),              # integer division stays integral
    ("5 / 2", 2),
    ("2 % 2", 0),
    ("7 % 3", 1),
    ("2 ^ 2", 4.0),            # power is double (numeric_power)
    ("-1", -1),
    ("3.5 + 1", 4.5),
    ("5.0 / 2", 2.5),          # float division
])
def test_arithmetic(eng, expr, expected):
    assert one(eng, expr) == expected


def test_list_concat(eng):
    assert one(eng, "[1, 2] + [3]") == [1, 2, 3]
    assert one(eng, "[1, 2] + 3") == [1, 2, 3]


# --- literals (cypher_expr.sql:13-24) ---

def test_int_bounds(eng):
    assert one(eng, "9223372036854775807") == (1 << 63) - 1
    assert one(eng, "-9223372036854775808") == -(1 << 63)


def test_bool_null(eng):
    df = eng.cypher("RETURN true AS t, false AS f, null AS n")
    r = df.collect()[0]
    assert r["t"] is True and r["f"] is False and r["n"] is None


def test_list_and_map_literals(eng):
    assert one(eng, "[7, 1, 2][1]") == 1
    assert one(eng, "{i: 7, s: 'x'}.i") == 7
    assert one(eng, "size([1, 2, 3])") == 3


# --- slices / negative indexing (cypher_expr.sql property access) ---

@pytest.mark.parametrize("expr,expected", [
    ("[0, 1, 2, 3][1..3]", [1, 2]),
    ("[0, 1, 2, 3][-2]", 2),
    ("[0, 1, 2, 3][..2]", [0, 1]),
    ("[0, 1, 2, 3][2..]", [2, 3]),
    ("head([5, 6])", 5),
    ("last([5, 6])", 6),
    ("tail([5, 6, 7])", [6, 7]),
    ("head([])", None),
])
def test_list_ops(eng, expr, expected):
    assert one(eng, expr) == expected


# --- 0-based substring (cypher_substring.sql; adjust rule
# parse_cypher_expr.c:929-962) ---

@pytest.mark.parametrize("expr,expected", [
    ("substring('123', 0, 1)", "1"),
    ("substring('123', 1, 1)", "2"),
    ("substring('123', 2, 1)", "3"),
    ("substring('123', 0)", "123"),
    ("substring('123', 1)", "23"),
    ("substring('123', 2)", "3"),
    ("substring('123', 3)", ""),
])
def test_substring_zero_based(eng, expr, expected):
    assert one(eng, expr) == expected


# --- string operators (cypher_dml.sql:1163-1203) ---

@pytest.mark.parametrize("expr,expected", [
    ("'abcdef' STARTS WITH 'abc'", True),
    ("'abcdef' ENDS WITH 'def'", True),
    ("'abcdef' CONTAINS 'cd'", True),
    ("'abcdef' =~ 'a.*f'", True),
    ("'abcdef' =~ 'a.*e'", False),  # regex is anchored
    ("toUpper('ab')", "AB"),
    ("toLower('AB')", "ab"),
    ("reverse('abc')", "cba"),
    ("replace('aXbXc', 'X', '-')", "a-b-c"),
    ("left('abcdef', 2)", "ab"),
    ("right('abcdef', 2)", "ef"),
    ("trim('  a  ')", "a"),
    ("split('a,b,c', ',')", ["a", "b", "c"]),
])
def test_string_ops(eng, expr, expected):
    assert one(eng, expr) == expected


# --- CASE / IN / null predicates (cypher_expr.sql:190-270) ---

def test_case_simple_and_searched(eng):
    assert one(eng, "CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' ELSE 'c' END") == "b"
    assert one(eng, "CASE WHEN 1 > 2 THEN 'x' ELSE 'y' END") == "y"


def test_in_and_null(eng):
    assert one(eng, "2 IN [1, 2, 3]") is True
    assert one(eng, "5 IN [1, 2, 3]") is False
    assert one(eng, "null IS NULL") is True
    assert one(eng, "1 IS NOT NULL") is True


def test_coalesce_and_casts(eng):
    assert one(eng, "coalesce(null, 'x')") == "x"
    assert one(eng, "toInteger('42')") == 42
    assert one(eng, "toFloat('2.5')") == 2.5
    assert one(eng, "toBoolean('true')") is True
    assert one(eng, "toString(42)") == "42"


# --- math functions (cypher_funcs.c:238-541; log→ln alias
# parse_cypher_expr.c:894) ---

@pytest.mark.parametrize("expr,expected", [
    ("abs(-3)", 3),
    ("sign(-7)", -1.0),
    ("floor(2.7)", 2.0),
    ("ceil(2.1)", 3.0),
    ("round(2.5)", 3.0),
    ("sqrt(9)", 3.0),
    ("exp(0)", 1.0),
    ("log(exp(1))", 1.0),      # Cypher log == natural log
    ("log10(100)", 2.0),
])
def test_math(eng, expr, expected):
    got = one(eng, expr)
    assert got == pytest.approx(expected)


def test_range_fn(eng):
    assert one(eng, "range(1, 5)") == [1, 2, 3, 4, 5]
    assert one(eng, "range(0, 10, 3)") == [0, 3, 6, 9]
    # direction mismatch -> [] even at BIGINT extremes: the mismatch
    # test compares signs, never (end-start)*step, which would overflow
    # under ANSI where Neo4j just returns the empty list
    assert one(eng, "range(9223372036854775807, "
                    "-9223372036854775808, 2)") == []
    assert one(eng, "range(-9223372036854775808, "
                    "9223372036854775807, -3)") == []


# --- hybrid SQL <-> Cypher (reference: cypher_dml.sql:26,50-52) ---

def test_sql_scalar_subquery_in_cypher(eng, spark):
    spark.range(5).selectExpr("id AS v").createOrReplaceTempView("t_hybrid")
    assert one(eng, "1 + (SELECT max(v) FROM t_hybrid)") == 5


def test_sql_subquery_in_create(eng, spark):
    spark.range(7).createOrReplaceTempView("t_hybrid2")
    eng.cypher("CREATE (:cfg {n: (SELECT count(*) FROM t_hybrid2)})")
    assert one(eng, "1") == 1  # engine still healthy
    got = eng.cypher("MATCH (c:cfg) RETURN c.n AS n").collect()
    assert [r["n"] for r in got] == [7]


def test_in_sublink_three_valued_nulls(eng, spark):
    """`x IN (subquery)` keeps SQL's three-valued semantics when the
    subquery produces NULLs (ANY_SUBLINK): TRUE when found, NULL when a
    NULL could hide the match (item NULL over a non-empty set, or item
    missing from a set containing NULL), FALSE only when verifiably
    absent. The hoist carries a has_null flag because collect_list
    drops NULLs. Items here are EXPRESSIONS (not bare prop columns) so
    the collected-array path is exercised, not the native SQL IN."""
    spark.sql("SELECT * FROM VALUES (1), (2), (CAST(NULL AS INT)) t(v)") \
        .createOrReplaceTempView("t_in_nulls")
    spark.sql("SELECT * FROM VALUES (1), (2) t(v)") \
        .createOrReplaceTempView("t_in_plain")
    spark.range(0).selectExpr("id AS v").createOrReplaceTempView("t_in_empty")
    assert one(eng, "(1 + 0) IN (SELECT v FROM t_in_nulls)") is True
    assert one(eng, "(9 + 0) IN (SELECT v FROM t_in_nulls)") is None
    assert one(eng, "(9 + 0) IN (SELECT v FROM t_in_plain)") is False
    assert one(eng, "(null + 0) IN (SELECT v FROM t_in_plain)") is None
    assert one(eng, "(null + 0) IN (SELECT v FROM t_in_empty)") is False
    assert one(eng, "(9 + 0) IN (SELECT v FROM t_in_empty)") is False
    # NOT IN flips through the same three-valued logic
    assert one(eng, "NOT (9 + 0) IN (SELECT v FROM t_in_nulls)") is None
    assert one(eng, "NOT (9 + 0) IN (SELECT v FROM t_in_plain)") is True


def test_cypher_view_consumed_by_sql(eng, spark):
    eng.cypher("CREATE (:kv {k: 'a', v: 1}), (:kv {k: 'b', v: 2})")
    eng.register_cypher_view("kv_view", "MATCH (x:kv) RETURN x.k AS k, x.v AS v")
    rows = spark.sql("SELECT k, v FROM kv_view ORDER BY k").collect()
    assert [(r["k"], r["v"]) for r in rows] == [("a", 1), ("b", 2)]


# --- user functions (reference: CREATE FUNCTION, SURVEY.md §2.10) ---

def test_register_python_udf(eng):
    eng.register_function("shout", lambda s: (s or "") + "!", "string")
    assert one(eng, "shout('hi')") == "hi!"


def test_register_pandas_udf(eng):
    import pandas as pd

    def double_it(s: pd.Series) -> pd.Series:
        return s * 2

    eng.register_function("double_it", double_it, "long", pandas=True)
    eng.cypher("CREATE (:num {v: 21})")
    got = eng.cypher("MATCH (n:num) RETURN double_it(n.v) AS d").collect()
    assert [r["d"] for r in got] == [42]


def test_registered_udaf_grouped(engine):
    """CREATE AGGREGATE analog: a pandas GROUPED_AGG UDAF participates
    in Cypher aggregation like a built-in (reference:
    src/backend/commands/aggregatecmds.c)."""
    import numpy as np
    engine.register_aggregate("p90", lambda v: float(np.percentile(v, 90)))
    got = engine.cypher(
        "MATCH (o:orders) RETURN o.o_orderstatus AS st, p90(o.o_totalprice) AS p "
        "ORDER BY st")
    out = got.collect()
    assert len(out) == 3
    assert all(r["p"] > 0 for r in out)


def test_prepare_positional_params(engine):
    """PREPARE/EXECUTE with $n (reference: cypher_expr.sql:30-38)."""
    q = engine.prepare(
        "MATCH (o:orders) WHERE o.o_orderkey < $1 AND o.o_totalprice > $2 "
        "RETURN count(*) AS n")
    n_small = q(100, 0.0).collect()[0]["n"]
    n_big = q(1000, 0.0).collect()[0]["n"]
    assert 0 < n_small < n_big


def test_explain_returns_plan(engine):
    """EXPLAIN CypherStmt (reference: gram.y:11021)."""
    plan = engine.explain(
        "MATCH (c:customer)-[:placed]->(o:orders) RETURN c.c_custkey AS k")
    assert "Physical Plan" in plan and "parquet" in plan.lower()


def test_nested_json_property_access(spark, engine):
    """CypherAccessExpr jsonb traversal (reference:
    execExprInterp.c:1882): dot chains and string-bracket access over
    JSON document columns, arbitrarily deep."""
    import json
    spark.createDataFrame(
        [(1, '{"a": {"b": 7}, "tags": ["x", "y"]}')],
        "i long, doc string").createOrReplaceTempView("njdoc")
    df = engine.cypher(
        "LOAD FROM njdoc AS d "
        "RETURN d.i AS i, toInteger(d.doc.a.b) AS ab, "
        "d['doc']['a'] AS aobj, d.doc.tags[1] AS tag1")
    r = df.collect()[0]
    assert r["i"] == 1 and r["ab"] == 7
    assert json.loads(r["aobj"]) == {"b": 7}
    assert r["tag1"] == "y"


def test_explain_write_does_not_mutate(engine, spark):
    """EXPLAIN of a write statement must not commit the mutation
    (docstring contract; was a bug: the old path ran the write)."""
    before = engine.cypher("MATCH (n:nation) RETURN count(*) AS n").collect()[0]["n"]
    plan = engine.explain("MATCH (n:nation) WHERE n.n_nationkey = 0 SET n.flag = 1")
    assert "Physical Plan" in plan
    after = engine.cypher("MATCH (n:nation) RETURN count(*) AS n").collect()[0]["n"]
    assert after == before
    got = engine.cypher(
        "MATCH (n:nation) WHERE n.n_nationkey = 0 RETURN n.flag AS f").collect()
    assert got[0]["f"] is None  # SET not applied


def test_register_table_function_functionscan(engine):
    """Real Python UDTF as a FROM-clause table function, standalone and
    LATERAL-correlated (reference FunctionScan, nodeFunctionscan.c)."""
    class Divisors:
        def eval(self, n: int):
            for d in range(1, n + 1):
                if n % d == 0:
                    yield (d,)

    engine.register_table_function("divisors", Divisors, "d int")
    rows = engine.sql("SELECT d FROM divisors(12) ORDER BY d").collect()
    assert [r["d"] for r in rows] == [1, 2, 3, 4, 6, 12]
    lat = engine.sql(
        "SELECT t.n, count(*) AS nd FROM VALUES (6), (9) AS t(n), "
        "LATERAL divisors(t.n) GROUP BY t.n ORDER BY t.n").collect()
    assert [(r["n"], r["nd"]) for r in lat] == [(6, 4), (9, 3)]


def test_register_procedure_cypher_inside(spark):
    """Driver-side procedures composing Cypher — the PL/pgSQL-with-
    Cypher analog (cypher_plpgsql.sql udf_param/udf_var/udf_if)."""
    from agensgraph_spark.cypher.compiler import CypherEngine
    eng = CypherEngine(spark)
    eng.cypher("CREATE GRAPH plpg")
    eng.cypher("CREATE (:v {id: 1, refs: [2, 3, 4]}), (:v {id: 2})")

    def small_refs(e, vid):
        # parameterized MATCH + list comprehension, result INTO a value
        rows = e.cypher(
            "MATCH (n:v) WHERE n.id = $1 "
            "RETURN [x IN n.refs WHERE x < 3] AS l", {"1": vid}).collect()
        return rows[0]["l"]

    def props_of(e, vid):
        rows = e.cypher("MATCH (n:v) WHERE n.id = $1 RETURN n.id AS i",
                        {"1": vid}).collect()
        return rows[0]["i"]

    def exists_branch(e, vid):
        # IF ... THEN control flow around a query (udf_if)
        n = e.cypher("MATCH (n:v) WHERE n.id = $1 RETURN count(*) AS c",
                     {"1": vid}).collect()[0]["c"]
        return "found" if n > 0 else "missing"

    eng.register_procedure("small_refs", small_refs)
    eng.register_procedure("props_of", props_of)
    eng.register_procedure("exists_branch", exists_branch)
    assert eng.call("small_refs", 1) == [2]
    assert eng.call("props_of", 2) == 2
    assert eng.call("exists_branch", 1) == "found"
    assert eng.call("exists_branch", 99) == "missing"


def test_aggregate_surface_regression(spark):
    """Locks the ordered-set / distinct / stddev aggregate aliases
    (reference cypher aggregate library, cypher_funcs.c)."""
    from agensgraph_spark.cypher.compiler import CypherEngine
    eng = CypherEngine(spark)
    eng.cypher("CREATE GRAPH aggsurf")
    eng.cypher("CREATE ({v: 1}), ({v: 2}), ({v: 2}), ({v: 3})")
    r = eng.cypher(
        "MATCH (n) RETURN collect(DISTINCT n.v) AS c, "
        "percentileCont(n.v, 0.5) AS pc, percentileDisc(n.v, 0.5) AS pd, "
        "round(stDev(n.v) * 1000000) AS sdev_micro, "
        "round(stDevP(n.v) * 1000000) AS sdevp_micro, "
        "count(DISTINCT n.v) AS cd").collect()[0]
    assert sorted(r["c"]) == [1, 2, 3]
    assert r["pc"] == 2.0 and r["pd"] == 2
    assert (r["sdev_micro"], r["sdevp_micro"]) == (816497, 707107)
    assert r["cd"] == 3


def test_id_of_start_end_node(spark):
    """id(startNode(r)) / id(endNode(r)) are the endpoint graphids —
    id() over a graphid-returning call is the identity, not a struct
    field extraction."""
    from agensgraph_spark.cypher.compiler import CypherEngine
    eng = CypherEngine(spark)
    eng.cypher("CREATE GRAPH idnodes")
    eng.cypher("CREATE ({n: 1})-[:e]->({n: 2})")
    r = eng.cypher(
        "MATCH (a)-[r]->(b) RETURN id(startNode(r)) = id(a) AS s, "
        "id(endNode(r)) = id(b) AS e").collect()[0]
    assert (r["s"], r["e"]) == (True, True)


def test_keys_over_map_literal(spark):
    """keys({object literal}) lists the object's keys (reference
    jsonb_object_keys); entities keep their property-map path."""
    from agensgraph_spark.cypher.compiler import CypherEngine
    eng = CypherEngine(spark)
    eng.cypher("CREATE GRAPH keysmap")
    r = eng.cypher("RETURN keys({a: 1, b: 2}) AS k").collect()[0]
    assert sorted(r["k"]) == ["a", "b"]


def test_pg_cast_syntax_and_bigint_literals(eng):
    """expr::type casts (cypher_expr.sql:88-100) — ::jsonb identity,
    ::bool = jsonb truthiness (empty -> false, non-empty -> true, NOT
    a text parse), scalar casts — and out-of-int8 integer literals
    promote to exact decimals (cypher_expr.sql:27)."""
    r = one(eng, "[''::jsonb::bool, 0::jsonb::bool, false::jsonb::bool, "
                 "[]::bool, {}::bool]")
    assert r == [False] * 5
    r = one(eng, "['s'::jsonb::bool, 1::jsonb::bool, true::jsonb::bool, "
                 "[0]::bool, {p: 0}::bool]")
    assert r == [True] * 5
    assert one(eng, "'42'::int + 1") == 43
    # ::int8 = jsonb_int8 -> numeric_int8 (jsonb.c:2036-2045): rounds
    # half away from zero — unlike toInteger(), which truncates
    assert one(eng, "1.9::int") == 2
    assert one(eng, "-1.9::int") == -2
    assert one(eng, "0.5::int") == 1
    assert one(eng, "toInteger(1.9)") == 1
    assert one(eng, "toInteger(-1.9)") == -1
    # int64-exact: values above 2^53 must survive ::int unchanged
    big = (1 << 61) + 12345
    assert one(eng, f"{big}::int") == big
    assert one(eng, f"toInteger({big})") == big
    assert one(eng, f"'{big}'::int") == big
    assert one(eng, "7::text") == "7"
    # jsonb::text is the jsonb SERIALIZATION (cypher_expr.out:62-66):
    # strings come back JSON-quoted and escaped
    assert one(eng, "'\"'::text") == '"\\""'
    assert one(eng, "'\\\\'::text") == '"\\\\"'
    assert one(eng, "'\\n'::text") == '"\\n"'
    assert one(eng, "'\\t'::text") == '"\\t"'
    assert one(eng, "[1, 2]::text") == "[1,2]"
    assert one(eng, "null::text") is None
    assert one(eng, "3::float / 2") == 1.5
    lo, hi = -(1 << 63) - 1, (1 << 63)
    got = eng.cypher(f"RETURN {lo} AS lo, {hi} AS hi").collect()[0]
    assert int(got["lo"]) == lo and int(got["hi"]) == hi


# --- PostgreSQL pattern operators in Cypher a_exprs (gram.y:13560-13640) ---

@pytest.fixture(scope="module")
def like_eng(spark):
    from agensgraph_spark.cypher import CypherEngine
    eng = CypherEngine(spark)
    eng.cypher("CREATE GRAPH likeops")
    eng.cypher("UNWIND ['cold widget', 'blue rod', 'LARGE BOLT', "
               "'50% off', null] AS t CREATE (:lk {t: t})")
    return eng


def _lk(eng, cond):
    return sorted(r["x"] for r in eng.cypher(
        f"MATCH (d:lk) WHERE {cond} RETURN d.t AS x").collect())


def test_cypher_like_ilike(like_eng):
    assert _lk(like_eng, "d.t LIKE '%widget'") == ["cold widget"]
    assert _lk(like_eng, "d.t ILIKE 'large%'") == ["LARGE BOLT"]
    # case-sensitive: only the capital-O row survives NOT LIKE '%o%'
    assert _lk(like_eng, "d.t NOT LIKE '%o%'") == ["LARGE BOLT"]
    assert _lk(like_eng, "d.t LIKE '50#% %' ESCAPE '#'") == ["50% off"]
    # ESCAPE '' disables escaping (like.c): '%' is a plain wildcard,
    # backslash is a literal character
    assert _lk(like_eng, "d.t LIKE '50% %' ESCAPE ''") == ["50% off"]
    assert _lk(like_eng, "d.t ILIKE 'LARGE%' ESCAPE ''") == ["LARGE BOLT"]


def test_cypher_similar_to(like_eng):
    assert _lk(like_eng, "d.t SIMILAR TO '%(widget|rod)'") == \
        ["blue rod", "cold widget"]
    assert _lk(like_eng, "d.t SIMILAR TO 'bl_e [a-z]+'") == ["blue rod"]
    # every non-null row contains o or O; NULL stays NULL (filtered)
    assert _lk(like_eng, "d.t NOT SIMILAR TO '%(o|O)%'") == []


def test_cypher_like_keywords_still_identifiers(like_eng):
    # 'to'/'escape'/'like' remain valid property names (ident() accepts
    # keywords) — the new reserved-word set must not break property
    # access
    like_eng.cypher("CREATE (:lkp {to: 1, escape: 2, like: 3})")
    got = like_eng.cypher(
        "MATCH (n:lkp) RETURN n.to AS a, n.escape AS b, n.like AS c"
    ).collect()
    assert [tuple(r) for r in got] == [(1, 2, 3)]


def test_cypher_between(like_eng):
    eng = like_eng
    eng.cypher("UNWIND [1, 5, 10, null] AS v CREATE (:btw {v: v})")

    def q(c):
        rows = eng.cypher(f"MATCH (b:btw) WHERE {c} RETURN b.v AS x").collect()
        return sorted((None if r["x"] is None else int(r["x"]) for r in rows),
                      key=lambda x: (x is None, x))
    assert q("toInteger(b.v) BETWEEN 2 AND 9") == [5]
    assert q("toInteger(b.v) NOT BETWEEN 2 AND 9") == [1, 10]
    # SYMMETRIC swaps the bounds when reversed (gram.y a_expr)
    assert q("toInteger(b.v) BETWEEN SYMMETRIC 9 AND 2") == [5]


def test_cypher_is_distinct_from(like_eng):
    eng = like_eng

    def q(c):
        rows = eng.cypher(f"MATCH (b:btw) WHERE {c} RETURN b.v AS x").collect()
        return sorted((None if r["x"] is None else int(r["x"]) for r in rows),
                      key=lambda x: (x is None, x))
    # NULL IS DISTINCT FROM 5 is TRUE (not NULL) — the whole point
    assert q("toInteger(b.v) IS DISTINCT FROM 5") == [1, 10, None]
    assert q("b.v IS NOT DISTINCT FROM null") == [None]
    assert q("b.v IS DISTINCT FROM null") == [1, 5, 10]


def test_cypher_boolean_test(eng):
    # gram.y BooleanTest: null-safe IS TRUE/FALSE; IS UNKNOWN = IS NULL
    assert one(eng, "(1 > 0) IS TRUE") is True
    assert one(eng, "(null > 0) IS TRUE") is False
    assert one(eng, "(null > 0) IS NOT TRUE") is True
    assert one(eng, "(1 > 2) IS FALSE") is True
    assert one(eng, "(null > 0) IS FALSE") is False
    assert one(eng, "(null > 0) IS UNKNOWN") is True
    assert one(eng, "(1 > 0) IS NOT UNKNOWN") is True


def test_to_char_reachable_from_cypher(spark):
    """PG formatting functions callable from the query dialect, like
    the reference's Cypher reaches PG functions: to_char dispatches on
    the argument type (temporal template vs numeric digit picture),
    age/make_date compose (reference: formatting.c, timestamp.c,
    date.c)."""
    from agensgraph_spark.cypher import CypherEngine
    eng = CypherEngine(spark)
    r = eng.cypher(
        "RETURN to_char(to_timestamp('2024-02-05 13:07:09'), "
        "'FMDay, DD \"of\" FMMonth YYYY HH12:MI am') AS t, "
        "to_char(485.7, 'FM9G999D00') AS n, "
        "to_char(-1485, '9G999') AS m, "
        "toString(make_date(2024, 2, 29)) AS d, "
        "toString(datediff(to_date('2024-02-05'), "
        "make_date(2024, 1, 1))) AS dd").collect()[0]
    assert r["t"] == "Monday, 05 of February 2024 01:07 pm"
    assert r["n"] == "485.70"
    assert r["m"] == "-1,485"
    assert r["d"] == "2024-02-29"
    assert r["dd"] == "35"


def test_try_parse_and_longtail_tokens_reachable_from_cypher(spark):
    """r12 surface through the dialect: lax try_to_timestamp/try_to_date
    (NULL on malformed, non-padded digits tolerated) and the long-tail
    to_char tokens (RM, IYYY, J, CC, SSSS, TZ/OF, Y,YYY)."""
    from agensgraph_spark.cypher import CypherEngine
    eng = CypherEngine(spark)
    r = eng.cypher(
        "RETURN toString(try_to_timestamp('2000-1-5 3:7:9', "
        "'YYYY-MM-DD HH24:MI:SS')) AS a, "
        "try_to_date('garbage', 'YYYY-MM-DD') AS b, "
        "toString(try_to_date('5 Dec 2000', 'DD Mon YYYY')) AS c, "
        "to_char(to_timestamp('2024-02-05 13:07:09'), "
        "'RM IYYY J CC SSSS TZ OF Y,YYY') AS d").collect()[0]
    assert r["a"] == "2000-01-05 03:07:09"
    assert r["b"] is None
    assert r["c"] == "2000-12-05"
    assert r["d"] == "II   2024 2460346 21 47229 UTC +00 2,024"


def test_to_char_cypher_requires_literal_pattern(spark):
    from agensgraph_spark.cypher import CypherEngine
    eng = CypherEngine(spark)
    import pytest as _pytest
    with _pytest.raises(NotImplementedError, match="pattern literal"):
        eng.cypher("RETURN to_char(1, trim('999')) AS x")
