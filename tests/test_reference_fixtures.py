"""Reference regression fixtures (FIXTURES.md §1-6), built through the
engine's own DDL + write path, running the reference corpus's semantic
checks (cypher_dml.sql, cypher_shortestpath.sql, cypher_eager.sql,
cypher_expr.sql, cypher_func.sql)."""

import pytest

from agensgraph_spark.cypher.compiler import CypherEngine


@pytest.fixture
def eng(spark):
    e = CypherEngine(spark)
    e.cypher("CREATE GRAPH fixture")
    return e


# --- §1 agens graph (cypher_dml.sql:46-104) ---

def test_agens_graph_dml(eng, spark):
    eng.cypher("CREATE (:repo {name: 'agens-graph', year: 2016})")
    eng.cypher("CREATE (:repo {name: 'agens-graph-jdbc', year: 2016})")
    eng.cypher("CREATE (:repo {name: 'agens-graph-docs', year: 2016})")
    eng.cypher("MATCH (a:repo {name: 'agens-graph'}), (b:repo {name: 'agens-graph-jdbc'}) "
               "CREATE (a)-[:lib {lang: 'java'}]->(b)")
    eng.cypher("MATCH (a:repo {name: 'agens-graph'}), (b:repo {name: 'agens-graph-docs'}) "
               "CREATE (a)-[:doc {lang: 'en'}]->(b)")
    got = eng.cypher("MATCH (a)-[l:lib]->(b) RETURN a.name AS an, l.lang AS lang, b.name AS bn").collect()
    assert [(r["an"], r["lang"], r["bn"]) for r in got] == \
        [("agens-graph", "java", "agens-graph-jdbc")]

    # SQL ↔ Cypher interop: property from a SQL scalar subquery
    spark.createDataFrame([(1996, "PostgreSQL"), (2016, "Graph")],
                          "year int, event string").createOrReplaceTempView("history")
    eng.cypher("CREATE (:rel {name: 'agens-graph-v2', "
               "year: (SELECT year FROM history WHERE event = 'Graph')})")
    assert eng.cypher("MATCH (r:rel) RETURN r.year AS y").collect()[0]["y"] == 2016


# --- §2 sp graph: chain 1→2→...→6 (cypher_shortestpath.sql:26-32) ---

def test_shortestpath_chain(eng):
    eng.cypher("CREATE VLABEL person")
    eng.cypher("CREATE ELABEL knows")
    for i in range(1, 7):
        eng.cypher(f"CREATE (:person {{id: {i}}})")
    for i in range(1, 6):
        eng.cypher(f"MATCH (a:person {{id: {i}}}), (b:person {{id: {i + 1}}}) "
                   "CREATE (a)-[:knows]->(b)")
    df = eng.cypher("MATCH (s:person {id: 1}), (t:person {id: 6}) "
                    "MATCH p = shortestpath((s)-[:knows*..10]->(t)) RETURN length(p) AS hops")
    assert [r["hops"] for r in df.collect()] == [5]
    # no path in the reverse direction
    back = eng.cypher("MATCH (s:person {id: 6}), (t:person {id: 1}) "
                      "MATCH p = shortestpath((s)-[:knows*..10]->(t)) RETURN length(p) AS hops")
    assert back.count() == 0


def test_allshortestpaths_diamond(eng):
    eng.cypher("CREATE (:dv {id: 1})")
    eng.cypher("CREATE (:dv {id: 2})")
    eng.cypher("CREATE (:dv {id: 3})")
    eng.cypher("CREATE (:dv {id: 4})")
    for a, b in [(1, 2), (1, 3), (2, 4), (3, 4)]:
        eng.cypher(f"MATCH (x:dv {{id: {a}}}), (y:dv {{id: {b}}}) CREATE (x)-[:de]->(y)")
    df = eng.cypher("MATCH (s:dv {id: 1}), (t:dv {id: 4}) "
                    "MATCH p = allshortestpaths((s)-[:de*..5]->(t)) RETURN length(p) AS hops")
    hops = [r["hops"] for r in df.collect()]
    assert hops == [2, 2]  # both diamond sides


# --- §3 dijkstra graph: cheapest ≠ fewest hops
# (cypher_shortestpath.sql:77-140) ---

@pytest.fixture
def weighted(eng):
    for i in range(1, 5):
        eng.cypher(f"CREATE (:wv {{id: {i}}})")

    def edge(a, b, w):
        eng.cypher(f"MATCH (x:wv {{id: {a}}}), (y:wv {{id: {b}}}) "
                   f"CREATE (x)-[:we {{weight: {w}}}]->(y)")
    edge(1, 4, 10.0)              # direct but expensive
    edge(1, 2, 1.0); edge(2, 4, 1.5)   # two hops, cheapest (2.5)
    edge(1, 3, 2.0); edge(3, 4, 2.0)   # two hops, mid (4.0)
    return eng


def test_dijkstra_cheapest_not_fewest(weighted):
    df = weighted.cypher(
        "MATCH (s:wv {id: 1}), (t:wv {id: 4}) "
        "MATCH p = dijkstra((s)-[e:we]->(t), e.weight, w) "
        "RETURN length(p) AS hops, w AS wt")
    rows = df.collect()
    assert [(r["hops"], r["wt"]) for r in rows] == [(2, 2.5)]


def test_dijkstra_limit_k_paths(weighted):
    df = weighted.cypher(
        "MATCH (s:wv {id: 1}), (t:wv {id: 4}) "
        "MATCH p = dijkstra((s)-[e:we]->(t), e.weight, w LIMIT 3) "
        "RETURN length(p) AS hops, w AS wt ORDER BY wt")
    rows = [(r["hops"], r["wt"]) for r in df.collect()]
    assert rows == [(2, 2.5), (2, 4.0), (1, 10.0)]


def test_dijkstra_reextends_improved_paths(eng):
    # regression: a cheaper path found to an already-reached vertex must be
    # re-extended (1->2 direct costs 10, but 1->3->2 costs 2; the best
    # 1->4 path goes through the improved 2 and costs 3, not 11)
    for i in range(1, 5):
        eng.cypher(f"CREATE (:rv {{id: {i}}})")

    def edge(a, b, w):
        eng.cypher(f"MATCH (x:rv {{id: {a}}}), (y:rv {{id: {b}}}) "
                   f"CREATE (x)-[:re {{weight: {w}}}]->(y)")
    edge(1, 2, 10.0); edge(1, 3, 1.0); edge(3, 2, 1.0); edge(2, 4, 1.0)
    df = eng.cypher(
        "MATCH (s:rv {id: 1}), (t:rv {id: 4}) "
        "MATCH p = dijkstra((s)-[e:re]->(t), e.weight, w) "
        "RETURN length(p) AS hops, w AS wt")
    assert [(r["hops"], r["wt"]) for r in df.collect()] == [(3, 3.0)]


def test_dijkstra_edge_qual(weighted):
    # third-positional qual filters the edge relation before relaxation
    # (reference form: dijkstra(chain, weight, qual),
    # cypher_shortestpath.sql:139)
    df = weighted.cypher(
        "MATCH (s:wv {id: 1}), (t:wv {id: 4}) "
        "MATCH p = dijkstra((s)-[e:we]->(t), e.weight, e.weight > 1.8, w) "
        "RETURN length(p) AS hops, w AS wt")
    rows = [(r["hops"], r["wt"]) for r in df.collect()]
    assert rows == [(2, 4.0)]


# --- §4 eager_graph: v3 INHERITS (v2) scans + write interactions
# (cypher_eager.sql:9-15) ---

def test_eager_inheritance_writes(eng):
    eng.cypher("CREATE VLABEL v1")
    eng.cypher("CREATE VLABEL v2")
    eng.cypher("CREATE VLABEL v3 INHERITS (v2)")
    for i in (1, 2, 3):
        eng.cypher(f"CREATE (:v1 {{no: {i}}})")
    # CREATE from MATCH: one v3 row per v1 row
    eng.cypher("MATCH (a:v1) CREATE (:v3 {no: a.no + 10})")
    # v2 scan must see v3 rows (label-hierarchy scan)
    assert eng.cypher("MATCH (x:v2) RETURN x").count() == 3
    # SET through the parent label updates child rows
    eng.cypher("MATCH (x:v2) SET x.flag = true")
    assert eng.cypher("MATCH (x:v3) WHERE x.flag RETURN x").count() == 3
    # DELETE through the parent clears children
    eng.cypher("MATCH (x:v2) DELETE x")
    assert eng.cypher("MATCH (x:v2) RETURN x").count() == 0


# --- §5 v0 nested-property fixture (cypher_expr.sql:204-217) ---

def test_nested_property_access(eng):
    eng.cypher("CREATE (:v0 {o: {i: 7, s: 'str', t: true}, l: [4, 5, 6]})")
    df = eng.cypher("MATCH (n:v0) RETURN n.o.i AS oi, n.o.s AS os, n.l[1] AS l1, size(n.l) AS ln")
    r = df.collect()[0]
    assert (r["oi"], r["os"], r["l1"], r["ln"]) == (7, "str", 5, 3)


# --- §6 labels_dag: multi-parent ancestor closure (cypher_func.sql:17-96) ---

def test_labels_multi_parent_dag(eng):
    eng.cypher("CREATE VLABEL b")
    eng.cypher("CREATE VLABEL c")
    eng.cypher("CREATE VLABEL d INHERITS (b, c)")
    eng.cypher("CREATE (:d {name: 'x'})")
    labels = eng.cypher("MATCH (n:d) RETURN labels(n) AS l").collect()[0]["l"]
    assert labels[0] == "d" and set(labels) == {"d", "b", "c"}
    # scans through either parent see the d row
    assert eng.cypher("MATCH (n:b) RETURN n").count() == 1
    assert eng.cypher("MATCH (n:c) RETURN n").count() == 1


# --- substring semantics (cypher_substring.sql, AG246) ---

def test_substring_matrix(eng):
    """Cypher substring is 0-based; a negative start clips the WINDOW
    (reference expected outputs, cypher_substring.sql)."""
    cases2 = {-1: "123", 0: "123", 1: "23", 2: "3", 3: ""}
    cases3 = {-1: "", 0: "1", 1: "2", 2: "3", 3: ""}
    for start, exp in cases2.items():
        got = eng.cypher(f"RETURN substring('123', {start}) AS s").collect()[0]["s"]
        assert got == exp, (start, got, exp)
    for start, exp in cases3.items():
        got = eng.cypher(f"RETURN substring('123', {start}, 1) AS s").collect()[0]["s"]
        assert got == exp, (start, got, exp)
    # hybrid: SQL scalar subquery inside Cypher substring
    got = eng.cypher(
        "RETURN substring((SELECT substring('12345', 2, 3)), 1, 1) AS s").collect()[0]["s"]
    assert got == "3"


# --- non-varlen shortestpath = exactly one hop (cypher_shortestpath2.sql
# "No Labels": the unforked chain matches only adjacent pairs) ---

def test_shortestpath_nonvarlen_is_single_hop(eng):
    eng.cypher("CREATE VLABEL s2")
    eng.cypher("CREATE ELABEL e2")
    for i in range(1, 6):
        eng.cypher(f"CREATE (:s2 {{id: {i}}})")
    for i in range(1, 5):
        eng.cypher(f"MATCH (a:s2 {{id: {i}}}), (b:s2 {{id: {i+1}}}) "
                   "CREATE (a)-[:e2]->(b)")
    df = eng.cypher("MATCH (a:s2), (c:s2) "
                    "MATCH shortestpath((a)-[:e2]->(c)) "
                    "RETURN a.id AS a, c.id AS c ORDER BY a, c")
    got = [(r["a"], r["c"]) for r in df.collect()]
    assert got == [(1, 2), (2, 3), (3, 4), (4, 5)]  # adjacent only


# --- weighted dijkstra graph (cypher_shortestpath.sql:76-213) ---

_DIJ_EDGES = [(0, 4, 3), (0, 1, 7), (0, 5, 10), (4, 6, 5), (4, 3, 11),
              (4, 1, 2), (1, 3, 10), (1, 2, 4), (1, 5, 6), (5, 3, 9),
              (6, 3, 4), (2, 3, 2)]


def _dij_graph(eng):
    eng.cypher("CREATE VLABEL dv2")
    eng.cypher("CREATE ELABEL de2")
    for i in range(7):
        eng.cypher(f"CREATE (:dv2 {{id: {i}}})")
    for a, b, w in _DIJ_EDGES:
        eng.cypher(f"MATCH (x:dv2 {{id: {a}}}), (y:dv2 {{id: {b}}}) "
                   f"CREATE (x)-[:de2 {{weight: {w}}}]->(y)")


def _path_ids(eng, row):
    return row


def test_dijkstra_reference_graph(eng):
    """Non-varlen dijkstra relaxes to arbitrary depth (nodeDijkstra.c):
    cheapest 0->3 is 0,4,1,2,3 with weight 11 (reference expected
    output, cypher_shortestpath.out:178-184); with an e.weight >= 5
    qual only 0,1,3 (weight 17, cypher_shortestpath.out:219-224). The
    id projection goes through nodes(p) composites — the id PROPERTY
    wins over the graphid attribute (parse_cypher_expr.c:980-995)."""
    _dij_graph(eng)
    df = eng.cypher(
        "MATCH (v1:dv2 {id: 0}), (v2:dv2 {id: 3}) "
        "MATCH p = dijkstra((v1)-[e:de2]->(v2), e.weight, w) "
        "RETURN array_join([x IN nodes(p) | x.id], ',') AS ids, w AS wt")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["ids"] == "0,4,1,2,3" and rows[0]["wt"] == 11.0

    df = eng.cypher(
        "MATCH (v1:dv2 {id: 0}), (v2:dv2 {id: 3}) "
        "MATCH p = dijkstra((v1)-[e:de2]->(v2), e.weight, e.weight >= 5, w) "
        "RETURN array_join([x IN nodes(p) | x.id], ',') AS ids, w AS wt")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["ids"] == "0,1,3" and rows[0]["wt"] == 17.0


# --- varlen rel vars ARE edge lists (cypher_dml2.sql AGV2-26/29) ---

def test_quantifier_over_rel_array(eng):
    """all(x IN r WHERE x.id IS NULL): property access on the edge
    composites; the property-less edge matches, the one with an id
    property does not (cypher_dml2.out:41-48)."""
    eng.cypher("CREATE VLABEL dv1")
    eng.cypher("CREATE ELABEL de1")
    eng.cypher("CREATE (a:dv1 {id: 1}) CREATE (b:dv1 {id: 2}) "
               "CREATE (a)-[r:de1 {text: 'text'}]->(b)")
    eng.cypher("CREATE (a:dv1 {id: 3}) CREATE (b:dv1 {id: 4}) "
               "CREATE (a)-[r:de1 {id: 5, text: 'text'}]->(b)")
    n = eng.cypher(
        "MATCH p = (n1)-[r:de1*1..1]->(n2) "
        "WHERE all(x IN r WHERE x.id IS NULL) "
        "RETURN count(*) AS n").collect()[0]["n"]
    assert n == 1
    n2 = eng.cypher(
        "MATCH p = (n1)-[r:de1*1..1]->(n2) "
        "WHERE all(x IN r WHERE x.text IS NOT NULL) "
        "RETURN count(*) AS n").collect()[0]["n"]
    assert n2 == 2


def test_head_tail_last_over_rel_array(eng):
    """head/tail/last over a varlen rel var (cypher_dml2.out AGV2-26):
    elements are edge composites in traversal order."""
    eng.cypher("CREATE VLABEL hv")
    eng.cypher("CREATE ELABEL he")
    for i in range(4):
        eng.cypher(f"CREATE (:hv {{id: {i}}})")
    for i in range(3):
        eng.cypher(f"MATCH (a:hv {{id: {i}}}), (b:hv {{id: {i+1}}}) "
                   f"CREATE (a)-[:he {{val: {i + 1}}}]->(b)")
    df = eng.cypher(
        "MATCH (n:hv {id: 0})-[e:he*3..3]->(m) "
        "RETURN head(e).val AS h, last(e).val AS l, size(tail(e)) AS nt")
    r = df.collect()[0]
    assert (r["h"], r["l"], r["nt"]) == ("1", "3", 2)  # jsonb strings


def test_quantifiers_over_nodes_composites(eng):
    """all/none over nodes(p) with property access
    (cypher_dml2.sql:77-119 person graph)."""
    eng.cypher("CREATE (a:person2 {name: 'Alice', age: 51}), "
               "(c:person2 {name: 'Charlie', age: 53}), "
               "(d:person2 {name: 'Bob', age: 25}), "
               "(e:person2 {name: 'Daniel', age: 54}), "
               "(a)-[:knows2]->(c), (a)-[:knows2]->(d), "
               "(c)-[:knows2]->(e), (d)-[:knows2]->(e)")
    # all(: only the path through Charlie keeps every age > 30
    df = eng.cypher(
        "MATCH p = (a)-[:knows2*1..3]->(b) "
        "WHERE a.name = 'Alice' AND b.name = 'Daniel' "
        "AND all(x IN nodes(p) WHERE toInteger(x.age) > 30) "
        "RETURN array_join([x IN nodes(p) | x.age], ',') AS ages")
    assert [r["ages"] for r in df.collect()] == ["51,53,54"]
    # none(: exclude paths touching Bob (age 25)
    df2 = eng.cypher(
        "MATCH p = (a)-[:knows2*1..3]->(b) "
        "WHERE a.name = 'Alice' "
        "AND none(x IN nodes(p) WHERE toInteger(x.age) = 25) "
        "RETURN count(*) AS n")
    assert df2.collect()[0]["n"] == 2  # Alice->Charlie, Alice->Charlie->Daniel


def test_isempty_forms(eng):
    """isEmpty over string property and properties() map
    (cypher_dml2.sql:96-118)."""
    eng.cypher("CREATE (:ie {name: 'x', eyes: ''}), (:ie {name: 'y', eyes: 'blue'})")
    got = eng.cypher("MATCH (n:ie) WHERE isEmpty(n.eyes) RETURN n.name AS nm").collect()
    assert [r["nm"] for r in got] == ["x"]
    got2 = eng.cypher(
        "MATCH (n:ie) WHERE NOT isEmpty(properties(n)) RETURN count(*) AS n").collect()
    assert got2[0]["n"] == 2


def test_labels_complex_dag_exact_order(eng):
    """The 10-label diamond-inheritance DAG from cypher_func.sql:96-118;
    labels() must reproduce the reference's exact closure order
    (cypher_func.out: nearest-first BFS over parents)."""
    eng.cypher("CREATE VLABEL la")
    eng.cypher("CREATE VLABEL lb")
    eng.cypher("CREATE VLABEL lc INHERITS (la)")
    eng.cypher("CREATE VLABEL ld INHERITS (la, lb)")
    eng.cypher("CREATE VLABEL le INHERITS (ld)")
    eng.cypher("CREATE VLABEL lf INHERITS (la)")
    eng.cypher("CREATE VLABEL lg INHERITS (le, lf)")
    eng.cypher("CREATE VLABEL lh INHERITS (lc, lg)")
    eng.cypher("CREATE VLABEL li INHERITS (lg)")
    eng.cypher("CREATE VLABEL lj INHERITS (lh, li)")
    for n in "abcdefghij":
        eng.cypher(f"CREATE (:l{n} {{name: '{n}'}})")
    got = {r["nm"]: r["ls"] for r in eng.cypher(
        "MATCH (n) WHERE n.name IS NOT NULL "
        "RETURN n.name AS nm, labels(n) AS ls").collect()}
    exp = {
        "a": ["la"], "b": ["lb"], "c": ["lc", "la"],
        "d": ["ld", "la", "lb"], "e": ["le", "ld", "la", "lb"],
        "f": ["lf", "la"],
        "g": ["lg", "le", "lf", "ld", "la", "lb"],
        "h": ["lh", "lc", "lg", "la", "le", "lf", "ld", "lb"],
        "i": ["li", "lg", "le", "lf", "ld", "la", "lb"],
        "j": ["lj", "lh", "li", "lc", "lg", "la", "le", "lf", "ld", "lb"],
    }
    assert got == exp


def test_log_is_natural_log(eng):
    """AG249: Cypher log() == ln(), log10() is base 10
    (cypher_func.sql:124-147)."""
    import math
    r = eng.cypher("RETURN log(10) AS l, ln(10) AS n, log10(10) AS t").collect()[0]
    assert abs(r["l"] - math.log(10)) < 1e-12
    assert r["l"] == r["n"]
    assert abs(r["t"] - 1.0) < 1e-12


# --- VLE hop-range matrix on the 9-chain (cypher_dml.sql:281-344) ---

@pytest.fixture
def time_chain(eng):
    eng.cypher("CREATE VLABEL time")
    eng.cypher("CREATE ELABEL goes")
    for i in range(1, 10):
        eng.cypher(f"CREATE (:time {{sec: {i}}})")
    for i in range(1, 9):
        eng.cypher(f"MATCH (a:time {{sec: {i}}}), (b:time {{sec: {i+1}}}) "
                   "CREATE (a)-[:goes]->(b)")
    return eng


def _vle(eng, spec):
    df = eng.cypher(
        f"MATCH (a:time)-[x:goes{spec}]->(b:time) "
        "RETURN a.sec AS a, length(x) AS x, b.sec AS b ORDER BY a, b")
    return [(r["a"], r["x"], r["b"]) for r in df.collect()]


def test_vle_hop_ranges(time_chain):
    eng = time_chain
    assert _vle(eng, "*3") == [(a, 3, a + 3) for a in range(1, 7)]
    # zero length: each vertex pairs with itself
    assert _vle(eng, "*0") == [(a, 0, a) for a in range(1, 10)]
    assert _vle(eng, "*0..1") == sorted(
        [(a, 0, a) for a in range(1, 10)] + [(a, 1, a + 1) for a in range(1, 9)],
        key=lambda t: (t[0], t[2]))
    assert _vle(eng, "*..1") == [(a, 1, a + 1) for a in range(1, 9)]
    assert _vle(eng, "*3..6") == sorted(
        [(a, n, a + n) for n in (3, 4, 5, 6) for a in range(1, 10 - n)],
        key=lambda t: (t[0], t[2]))


def test_vle_chained_segments(time_chain):
    """x*2 then y then z*2 — both the one-pattern and the chained-MATCH
    forms, and the fully reversed direction (cypher_dml.sql:318-341)."""
    eng = time_chain
    q1 = ("MATCH (a:time)-[x:goes*2]->(b:time)-[y:goes]->(c:time)-[z:goes*2]->(d:time) "
          "RETURN a.sec AS a, b.sec AS b, c.sec AS c, d.sec AS d ORDER BY a")
    q2 = ("MATCH (a:time)-[x:goes*2]->(b:time) MATCH (b)-[y:goes]->(c:time) "
          "MATCH (c)-[z:goes*2]->(d:time) "
          "RETURN a.sec AS a, b.sec AS b, c.sec AS c, d.sec AS d ORDER BY a")
    q3 = ("MATCH (d:time)<-[z:goes*2]-(c:time)<-[y:goes]-(b:time)<-[x:goes*2]-(a:time) "
          "RETURN a.sec AS a, b.sec AS b, c.sec AS c, d.sec AS d ORDER BY a")
    exp = [(a, a + 2, a + 3, a + 5) for a in range(1, 5)]
    for q in (q1, q2, q3):
        got = [(r["a"], r["b"], r["c"], r["d"]) for r in eng.cypher(q).collect()]
        assert got == exp, q


def test_vle_undirected_zero_to_two(time_chain):
    """39 rows exactly as the reference expects (cypher_dml.out): per
    vertex itself at 0 hops, neighbors at 1, distance-2 at 2 — NO
    bounce-backs (a 2-hop return would reuse the single connecting
    edge, which per-path edge-uniqueness forbids)."""
    got = _vle_undir(time_chain)
    exp = []
    for a in range(1, 10):
        exp.append((a, 0, a))
        for b in (a - 1, a + 1):
            if 1 <= b <= 9:
                exp.append((a, 1, b))
        for b in (a - 2, a + 2):
            if 1 <= b <= 9:
                exp.append((a, 2, b))
    assert sorted(got) == sorted(exp) and len(got) == 39


def _vle_undir(eng):
    df = eng.cypher(
        "MATCH (a:time)-[x:goes*0..2]-(b:time) "
        "RETURN a.sec AS a, length(x) AS x, b.sec AS b")
    return [(r["a"], r["x"], r["b"]) for r in df.collect()]


def test_varlen_create_rejected(eng):
    with pytest.raises(Exception):
        eng.cypher("CREATE (:t1 {sec: 9})-[:g1*1..2]->(:t1 {sec: 10})")


# --- edge uniqueness on an undirected 2-cycle (cypher_dml.sql:787-800) ---

def test_uniqueness_undirected_two_cycle(eng):
    eng.cypher("CREATE ELABEL rel")
    eng.cypher("CREATE (s:un {id: 1})-[:rel {p: 'a'}]->(:un {id: 2})"
               "-[:rel {p: 'b'}]->(s)")
    df = eng.cypher(
        "MATCH (s:un)-[r1:rel]-(m:un)-[r2:rel]-(x:un) "
        "RETURN s.id AS s, r1.p AS r1, m.id AS m, r2.p AS r2, x.id AS x "
        "ORDER BY s, r1, m, r2, x")
    got = [(r["s"], r["r1"], r["m"], r["r2"], r["x"]) for r in df.collect()]
    assert got == [(1, "a", 2, "b", 1), (1, "b", 2, "a", 1),
                   (2, "a", 1, "b", 2), (2, "b", 1, "a", 2)]


def test_vle_zero_length_path_composites(time_chain):
    """p over *0: nodes(p)[0] is the vertex composite, index 1 and the
    relationship list are NULL/absent (cypher_dml.out 'VLE with graph
    path')."""
    eng = time_chain
    df = eng.cypher(
        "MATCH p = (t:time)-[:goes*0]->(:time) "
        "RETURN properties(nodes(p)[0]) AS first, "
        "nodes(p)[1] IS NULL AS no_second, "
        "relationships(p)[0] IS NULL AS no_rel ORDER BY first")
    rows = df.collect()
    assert len(rows) == 9
    import json
    firsts = sorted(json.loads(r["first"])["sec"] for r in rows)
    assert firsts == list(range(1, 10))
    assert all(r["no_second"] and r["no_rel"] for r in rows)


# --- §7 vertex_labels: labels() ancestor closure ordering
#     (cypher_func.sql:1-123 / cypher_func.out:1-120) ---

def _mk_inherit_graph(eng, decls):
    for line in decls:
        eng.cypher(f"CREATE VLABEL {line}")
    for name in [d.split()[0] for d in decls]:
        eng.cypher(f"CREATE (:{name} {{name: '{name}'}})")
    # (per-label CREATEs are unavoidable: each targets a distinct label)
    df = eng.cypher("MATCH (n) RETURN n.name AS name, label(n) AS lbl, "
                    "array_join(labels(n), ',') AS lbls")
    return {r["name"]: (r["lbl"], r["lbls"]) for r in df.collect()}


def test_labels_simple(eng):
    """labels(n) = own label + BFS ancestor closure, each level ordered
    by labid (cypher_func.out:38-45: d INHERITS (b,c) → [d,b,c,a])."""
    got = _mk_inherit_graph(eng, ["a", "b", "c INHERITS (a)", "d INHERITS (b, c)"])
    assert got == {"a": ("a", "a"), "b": ("b", "b"),
                   "c": ("c", "c,a"), "d": ("d", "d,b,c,a")}


def test_labels_complex1(eng):
    """cypher_func.out complex test 1: multi-parent DAG; the creation
    (labid) order wins within a BFS level — l INHERITS (i,j,k,g) lists
    g first because g predates i,j,k."""
    got = _mk_inherit_graph(eng, [
        "a", "b INHERITS (a)", "c", "d", "e INHERITS (b, c)", "f", "g",
        "h INHERITS (d)", "i INHERITS (d)", "j INHERITS (d)",
        "k INHERITS (e, f, g)", "l INHERITS (i, j, k, g)"])
    assert got["b"] == ("b", "b,a")
    assert got["e"] == ("e", "e,b,c,a")
    assert got["k"] == ("k", "k,e,f,g,b,c,a")
    assert got["l"] == ("l", "l,g,i,j,k,d,e,f,b,c,a")


def test_labels_complex2(eng):
    """cypher_func.out complex test 2: an ancestor reachable at two
    depths sits at its NEAREST level only (a via c at level 2 beats a
    via f at level 3 for h)."""
    got = _mk_inherit_graph(eng, [
        "a", "b", "c INHERITS (a)", "d INHERITS (a, b)", "e INHERITS (d)",
        "f INHERITS (a)", "g INHERITS (e, f)", "h INHERITS (c, g)",
        "i INHERITS (g)", "j INHERITS (h, i)"])
    assert got["d"] == ("d", "d,a,b")
    assert got["g"] == ("g", "g,e,f,d,a,b")
    assert got["h"] == ("h", "h,c,g,a,e,f,d,b")
    assert got["i"] == ("i", "i,g,e,f,d,a,b")
    assert got["j"] == ("j", "j,h,i,c,g,a,e,f,d,b")


def test_log_is_natural_log(eng):
    """AG249 (cypher_func.sql:125-147): Cypher log() == ln(), log10 is
    decimal; radians() on a stored 0 property returns 0.0."""
    import math
    eng.cypher("CREATE VLABEL numbers")
    eng.cypher("CREATE (:numbers {string: '10', numeric: 10})")
    r = eng.cypher("MATCH (u:numbers) RETURN log(u.numeric) AS lg, "
                   "ln(u.numeric) AS lnv, log10(u.numeric) AS l10").collect()[0]
    assert r["lg"] == pytest.approx(math.log(10))
    assert r["lnv"] == pytest.approx(math.log(10))
    assert r["l10"] == pytest.approx(1.0)
    r2 = eng.cypher("RETURN log(10) AS lg, log10(10) AS l10").collect()[0]
    assert r2["lg"] == pytest.approx(math.log(10))
    assert r2["l10"] == pytest.approx(1.0)
    eng.cypher("CREATE (:numbers {name: 'arc 0', degree: 0})")
    r3 = eng.cypher("MATCH (v:numbers) WHERE v.degree IS NOT NULL "
                    "RETURN radians(v.degree) AS rad").collect()
    assert [x["rad"] for x in r3] == [0.0]


# --- §8 expression-position pathfind + both-arrow direction
#     (cypher_shortestpath2.sql:298-339) ---

@pytest.fixture
def sp_chain(eng):
    """Unforked chain 1→2→3 plus orphan 9 (cypher_shortestpath2.sql
    'Unforked'/'Orphan' reduced)."""
    eng.cypher("UNWIND [1, 2, 3, 9] AS i CREATE (:n {id: i})")
    eng.cypher("UNWIND [[1, 2], [2, 3]] AS ab "
               "MATCH (x:n), (y:n) WHERE x.id = ab[0] AND y.id = ab[1] "
               "CREATE (x)-[:e]->(y)")
    return eng


def test_pathfind_expression_position(sp_chain):
    """RETURN shortestpath((a)-[...]->(b)) preserves outer cardinality:
    unreachable pairs yield NULL, reachable ones the path value
    (cypher_shortestpath2.out:334-336 — all 4 o-pair rows survive)."""
    df = sp_chain.cypher(
        "MATCH (a:n), (b:n) WHERE a.id IN [1, 9] AND b.id IN [3, 9] "
        "RETURN a.id AS aid, b.id AS bid, "
        "length(shortestpath((a)-[:e*]->(b))) AS hops, "
        "size(nodes(shortestpath((a)-[:e*]->(b)))) AS nv, "
        "shortestpath((a)-[:e*]->(b)) IS NULL AS nopath "
        "ORDER BY aid, bid")
    got = [(r["aid"], r["bid"], r["hops"], r["nv"], r["nopath"])
           for r in df.collect()]
    assert got == [(1, 3, 2, 3, False), (1, 9, None, None, True),
                   (9, 3, None, None, True), (9, 9, None, None, True)]


def test_pathfind_expression_nonvarlen_one_hop(sp_chain):
    """Non-varlen shortestpath((a)-[:e]->(b)) in expression position is
    EXACTLY one hop: only adjacent pairs get a path
    (cypher_shortestpath2.out:334 — all NULL for orphan o-pairs)."""
    df = sp_chain.cypher(
        "MATCH (a:n), (b:n) WHERE a.id <= 3 AND b.id <= 3 "
        "RETURN a.id AS aid, b.id AS bid, "
        "length(shortestpath((a)-[:e]->(b))) AS hops ORDER BY aid, bid")
    got = {(r["aid"], r["bid"]): r["hops"] for r in df.collect()}
    assert len(got) == 9
    assert got[(1, 2)] == 1 and got[(2, 3)] == 1
    assert got[(1, 3)] is None and got[(1, 1)] is None


def test_allshortestpaths_expression_position(eng):
    """allshortestpaths in expression position returns the ARRAY of
    tied paths per row (PostgreSQL array-of-graphpath output,
    cypher_shortestpath2.out:337-339); NULL when unreachable."""
    # diamond: 1→2→4, 1→3→4 (two tied 2-hop paths)
    eng.cypher("UNWIND [1, 2, 3, 4] AS i CREATE (:d {id: i})")
    eng.cypher("UNWIND [[1, 2], [1, 3], [2, 4], [3, 4]] AS ab "
               "MATCH (x:d), (y:d) WHERE x.id = ab[0] AND y.id = ab[1] "
               "CREATE (x)-[:e]->(y)")
    df = eng.cypher(
        "MATCH (a:d {id: 1}), (b:d) WHERE b.id IN [4, 1] "
        "RETURN b.id AS bid, size(allshortestpaths((a)-[:e*]->(b))) AS np "
        "ORDER BY bid")
    got = [(r["bid"], r["np"]) for r in df.collect()]
    assert got == [(1, None), (4, 2)]


def test_both_arrow_is_undirected(sp_chain):
    """<-[..]-> collapses to an undirected pattern: the reference ORs
    both direction bits then resets to DIR_NONE (gram.y:18670-18675);
    <-[:e*]-> therefore matches the same rows as -[:e*]-."""
    undir = sp_chain.cypher(
        "MATCH (a:n {id: 3}), (b:n {id: 1}) "
        "MATCH p = shortestpath((a)<-[:e*1..]->(b)) RETURN length(p) AS l")
    assert [r["l"] for r in undir.collect()] == [2]
    dash = sp_chain.cypher(
        "MATCH (a:n {id: 3}), (b:n {id: 1}) "
        "MATCH p = shortestpath((a)-[:e*1..]-(b)) RETURN length(p) AS l")
    assert [r["l"] for r in dash.collect()] == [2]


def test_shortestpath_zero_hop(eng):
    """*0.. zero-length semantics (cypher_shortestpath2.sql:298-305):
    same-vertex pairs get a zero-length path; distinct unconnected
    pairs get none; *1.. never matches same-vertex without a cycle."""
    eng.cypher("CREATE ELABEL e")
    eng.cypher("UNWIND [1, 2] AS i CREATE (:o {id: i})")
    z = eng.cypher("MATCH (a:o {id: 1}), (b:o {id: 1}) "
                   "MATCH p = shortestpath((a)-[:e*0..]->(b)) "
                   "RETURN length(p) AS l")
    assert [r["l"] for r in z.collect()] == [0]
    n1 = eng.cypher("MATCH (a:o {id: 1}), (b:o {id: 1}) "
                    "MATCH p = shortestpath((a)-[:e*1..]->(b)) "
                    "RETURN length(p) AS l")
    assert n1.count() == 0
    n2 = eng.cypher("MATCH (a:o {id: 1}), (b:o {id: 2}) "
                    "MATCH p = shortestpath((a)-[:e*0..]->(b)) "
                    "RETURN length(p) AS l")
    assert n2.count() == 0
    # expression position, same semantics via NULL
    e0 = eng.cypher("MATCH (a:o), (b:o) "
                    "RETURN a.id AS x, b.id AS y, "
                    "length(shortestpath((a)-[:e*0..]->(b))) AS l ORDER BY x, y")
    got = [(r["x"], r["y"], r["l"]) for r in e0.collect()]
    assert got == [(1, 1, 0), (1, 2, None), (2, 1, None), (2, 2, 0)]


def test_match_prop_map_pipeline_correlation(eng):
    """A MATCH prop map may reference outer pipeline variables
    (`UNWIND ... AS i MATCH (x:n {id: i})`) — the reference evaluates
    property constraints with the full query scope visible; the engine
    lifts them to pipeline filters (Catalyst plans the equality as an
    equi-join, not a filtered cartesian)."""
    eng.cypher("UNWIND [1, 2, 3] AS i CREATE (:pm {id: i, sq: i * i})")
    df = eng.cypher("UNWIND [1, 3] AS want "
                    "MATCH (x:pm {id: want}) RETURN x.sq AS sq ORDER BY sq")
    assert [r["sq"] for r in df.collect()] == [1, 9]
    # correlation against an earlier MATCH binding
    df2 = eng.cypher("MATCH (a:pm {id: 1}) MATCH (b:pm {id: a.id + 1}) "
                     "RETURN b.sq AS sq")
    assert [r["sq"] for r in df2.collect()] == [4]


# --- §9 ag_graphmeta view parity (graphmeta.sql, graphmeta.out) ---

def test_graphmeta_view_dml_sequence(eng):
    """Replays graphmeta.sql's DML sequence and checks the
    ag_graphmeta_view analog after every step against graphmeta.out's
    expected tables. Our stats derive from the live edge frames (always
    consistent) instead of incremental counters; transactions and
    savepoints are n/a by design (batch snapshots)."""
    def view():
        return [tuple(r) for r in
                eng.graph.graphmeta_view().orderBy("start", "edge", "end").collect()]

    eng.cypher("CREATE (:human)-[:know]->(:human {age: 1})")
    eng.cypher("MERGE (:human)-[:know]->(:human {age: 2})")  # no match → create
    eng.cypher("MERGE (:human)-[:know]->(:human {age: 3})")
    eng.cypher("CREATE (:dog)-[:follow]->(:human)")
    eng.cypher("CREATE (:dog)-[:likes]->(:dog)")
    assert view() == [("dog", "follow", "human", 1), ("dog", "likes", "dog", 1),
                      ("human", "know", "human", 3)]  # graphmeta.out:13-18

    for _ in range(3):
        eng.cypher("CREATE (:human)-[:know]->(:human)-[:follow]->(:human)"
                   "-[:hate]->(:human)-[:love]->(:human)")
    assert view() == [("dog", "follow", "human", 1), ("dog", "likes", "dog", 1),
                      ("human", "follow", "human", 3), ("human", "hate", "human", 3),
                      ("human", "know", "human", 6), ("human", "love", "human", 3)]

    eng.cypher("CREATE (:human)-[:know]->(:human)-[:know]->(:human)"
               "-[:know]->(:human)-[:know]->(:human)")
    assert ("human", "know", "human", 10) in view()  # graphmeta.out:40-46

    eng.cypher("MATCH (a)-[r:love]->(b) DELETE r")
    got = view()
    assert not any(t[1] == "love" for t in got)  # graphmeta.out:50-58
    assert ("human", "know", "human", 10) in got

    eng.cypher("DROP ELABEL hate CASCADE")
    assert not any(t[1] == "hate" for t in view())  # graphmeta.out:62-69

    eng.cypher("DROP VLABEL human CASCADE")
    assert view() == [("dog", "likes", "dog", 1)]  # graphmeta.out:73-77


# --- §10 eager-plan write sequences (cypher_eager.sql / cypher_eager.out) ---

@pytest.fixture
def eager_graph(eng):
    for v in ("v1", "v2"):
        eng.cypher(f"CREATE VLABEL {v}")
    eng.cypher("CREATE VLABEL v3 INHERITS (v2)")
    eng.cypher("UNWIND [1, 2, 3] AS i CREATE (:v1 {no: i})")
    return eng


def _v2view(eng):
    return [tuple(r) for r in eng.cypher(
        "MATCH (a:v2) RETURN label(a) AS l, a.no AS no ORDER BY l, no").collect()]


def test_eager_create_create(eager_graph):
    """cypher_eager.out:24-37: later CREATE clauses see earlier ones'
    input cardinality, not their outputs."""
    eng = eager_graph
    eng.cypher("MATCH (a:v1) CREATE (b:v3 {no: a.no}) CREATE (c:v2 {no: a.no + 2})")
    assert _v2view(eng) == [("v2", 3), ("v2", 4), ("v2", 5),
                            ("v3", 1), ("v3", 2), ("v3", 3)]


def test_eager_create_set_copyprops(eager_graph):
    """cypher_eager.out:56-71: `(:v3 =properties(a))` copies a's map;
    the trailing SET mutates the SOURCE rows only — the copies keep the
    pre-SET values (eager materialization)."""
    eng = eager_graph
    eng.cypher("MATCH (a:v1) CREATE (:v2 =properties(a))")
    eng.cypher("MATCH (a:v2) CREATE (:v3 =properties(a)) SET a.no = a.no + 1")
    assert _v2view(eng) == [("v2", 2), ("v2", 3), ("v2", 4),
                            ("v3", 1), ("v3", 2), ("v3", 3)]


def test_eager_create_delete(eager_graph):
    """cypher_eager.out:74-86: CREATE copies survive the DELETE of
    their source rows within the same statement."""
    eng = eager_graph
    eng.cypher("MATCH (a:v1) CREATE (:v2 =properties(a))")
    eng.cypher("MATCH (a:v2) CREATE (:v3 =properties(a)) DELETE a")
    assert _v2view(eng) == [("v3", 1), ("v3", 2), ("v3", 3)]


def test_eager_merge_create(eager_graph):
    """cypher_eager.out:89-103."""
    eng = eager_graph
    eng.cypher("MATCH (a:v1) MERGE (b:v2 {no: a.no}) CREATE (c:v3 {no: a.no + 2})")
    assert _v2view(eng) == [("v2", 1), ("v2", 2), ("v2", 3),
                            ("v3", 3), ("v3", 4), ("v3", 5)]


def test_eager_merge_merge_inheritance_visibility(eager_graph):
    """cypher_eager.out:106-124: the second MERGE's match scans v2's
    inheritance subtree INCLUDING rows the first MERGE just created —
    (c:v2 {no: 3}) matches the new v3:3, so only v2:4 and v2:5 appear."""
    eng = eager_graph
    eng.cypher("MATCH (a:v1) MERGE (b:v3 {no: a.no}) MERGE (c:v2 {no: a.no + 2})")
    assert _v2view(eng) == [("v2", 4), ("v2", 5),
                            ("v3", 1), ("v3", 2), ("v3", 3)]


def test_eager_merge_set_merge_sequential_batch_refuses(eager_graph):
    """Formerly a strict xfail (batch-once SET silently diverged from
    the reference's per-input-row accumulation, cypher_eager.out:
    144-156). r12: the self-referential accumulation shape is detected
    at compile time (writes._merge_accumulates, the assign_query_eager
    analog, parse_graph.c:5641) and batch mode refuses LOUDLY, naming
    the sequential_merge_rows opt-in — no silent wrong answer."""
    eng = eager_graph
    with pytest.raises(Exception, match="sequential_merge_rows"):
        eng.cypher("MATCH (:v1) MERGE (a:v2 {no: 1}) "
                   "ON MATCH SET a.cnt = a.cnt + 1 ON CREATE SET a.cnt = 0 "
                   "MERGE (b:v2 {cnt: 2}) RETURN a = b AS eq").collect()


def test_merge_non_accumulating_set_stays_batch(eager_graph):
    """Constant / outer-var SETs are NOT the accumulation shape: the
    detector must not force (or refuse) batch MERGE for them even over
    multi-row input."""
    eng = eager_graph
    eng.cypher("MATCH (x:v1) MERGE (a:v2 {no: x.no}) "
               "ON MATCH SET a.seen = true ON CREATE SET a.src = x.no")
    got = eng.cypher(
        "MATCH (a:v2) RETURN a.no AS no ORDER BY no").toPandas()
    assert list(got["no"]) == [1, 2, 3]


def test_merge_accumulating_distinct_keys_stays_batch(eager_graph):
    """The accumulation shape with per-row DISTINCT probe keys is NOT
    refused: no two rows can touch the same merged entity, so each
    entity's SET applies once under both batch and row-at-a-time
    execution — refusing would be a false positive on a query class
    that was never divergent."""
    eng = eager_graph
    eng.cypher("MATCH (x:v1) MERGE (a:v2 {no: x.no}) "
               "ON MATCH SET a.cnt = a.cnt + 1 ON CREATE SET a.cnt = 0")
    got = eng.cypher("MATCH (a:v2) RETURN a.no AS no, a.cnt AS cnt "
                     "ORDER BY no").toPandas()
    assert list(got["no"]) == [1, 2, 3]
    assert list(got["cnt"]) == [0, 0, 0]


def test_merge_whole_entity_read_refuses(eager_graph):
    """A bare-variable read inside a function (keys(a)/properties(a))
    reads the entity's current state just like a property chain — the
    detector must flag it on a shared (constant-key) element."""
    eng = eager_graph
    with pytest.raises(Exception, match="sequential_merge_rows"):
        eng.cypher("MATCH (:v1) MERGE (a:v2 {no: 1}) "
                   "ON MATCH SET a.k = size(keys(a)) "
                   "ON CREATE SET a.k = 0").collect()


def test_eager_merge_set_merge_sequential_optin(spark):
    """Same fixture as the strict xfail above, under the opt-in
    sequential fold (engine.sequential_merge_rows): per-input-row
    accumulation — ON MATCH SET cnt = cnt + 1 counts the two earlier
    input rows of the SAME statement, so the second MERGE's
    {cnt: 2} probe matches node a for every row
    (cypher_eager.out:144-156)."""
    from agensgraph_spark.cypher import CypherEngine
    eng = CypherEngine(spark, sequential_merge_rows=64)
    eng.cypher("CREATE GRAPH seqmerge")
    for v in ("v1", "v2"):
        eng.cypher(f"CREATE VLABEL {v}")
    eng.cypher("UNWIND [1, 2, 3] AS i CREATE (:v1 {no: i})")
    out = eng.cypher("MATCH (:v1) MERGE (a:v2 {no: 1}) "
                     "ON MATCH SET a.cnt = a.cnt + 1 ON CREATE SET a.cnt = 0 "
                     "MERGE (b:v2 {cnt: 2}) RETURN a = b AS eq")
    assert [r["eq"] for r in out.collect()] == [True, True, True]
    # the accumulated property is visible post-statement
    got = eng.cypher("MATCH (n:v2) RETURN toInteger(n.cnt) AS c").collect()
    assert [r["c"] for r in got] == [2]


def test_sequential_merge_respects_pipeline_row_order(spark):
    """The per-row fold must consume input rows in PIPELINE order even
    when the frame is multi-partition (the collected rows are sorted by
    a monotonic row index): ON MATCH SET n.last = i is order-sensitive
    — the surviving value must come from the LAST input row."""
    from agensgraph_spark.cypher import CypherEngine
    eng = CypherEngine(spark, sequential_merge_rows=64)
    eng.cypher("CREATE GRAPH seqorder")
    eng.cypher("CREATE VLABEL v3")
    # spread the UNWIND over several partitions so naive collect order
    # could diverge from pipeline order
    eng.cypher("UNWIND range(1, 12) AS i "
               "MERGE (n:v3 {no: 1}) "
               "ON CREATE SET n.last = i ON MATCH SET n.last = i")
    got = eng.cypher("MATCH (n:v3) RETURN toInteger(n.last) AS l").collect()
    assert [r["l"] for r in got] == [12]


def test_pathfind_expression_composites(sp_chain):
    """Composites project through nodes()/relationships() of an
    EXPRESSION-position shortestpath (ids(nodes(shortestpath(...))) in
    cypher_shortestpath2.sql:344-347); NULL rows stay NULL."""
    df = sp_chain.cypher(
        "MATCH (a:n {id: 1}), (b:n) WHERE b.id IN [3, 9] "
        "RETURN b.id AS bid, "
        "array_join([x IN nodes(shortestpath((a)-[:e*]->(b))) "
        "| toString(x.id)], ',') AS ids "
        "ORDER BY bid")
    assert [(r["bid"], r["ids"]) for r in df.collect()] == \
        [(3, "1,2,3"), (9, None)]


def test_graphid_literal_comparison(eng, spark):
    """'labid.locid' string/float literals coerce to graphid against an
    id-valued side (cypher_dml.sql:1204-1218; graphid_in graph.h)."""
    eng.cypher("CREATE ()")
    eng.cypher("CREATE ()")
    def c(cond):
        return eng.cypher(f"MATCH (n) WHERE {cond} RETURN count(*) AS c") \
                  .collect()[0]["c"]
    assert c("id(n) = '1.1'") == 1
    assert c("id(n) > 1.1") == 1
    assert c("id(n) <= 1.2") == 2
    assert c("id(n) <> 1.1") == 1


def test_implicit_load_whole_row(eng, spark):
    """LOAD FROM table AS r CREATE (=r): the row's columns become the
    vertex's property map (cypher_dml.sql:1221-1232 implicit load)."""
    spark.createDataFrame([(1, "one"), (2, "two")], "id int, name string") \
         .createOrReplaceTempView("ext_rows")
    eng.cypher("LOAD FROM ext_rows AS r CREATE (:loaded =r)")
    got = [tuple(r) for r in eng.cypher(
        "MATCH (n:loaded) RETURN n.id AS i, n.name AS nm ORDER BY i").collect()]
    assert got == [(1, "one"), (2, "two")]


# --- §11 SET micro-semantics (cypher_dml.sql:824-965 / cypher_dml.out) ---

def test_set_sequential_visibility(eng):
    """Within one SET list AND across SET clauses, later assignments
    read earlier ones (cypher_dml.out: SET a.age = 11, a.age = a.age+1
    → 12; the swap form does NOT swap — both end at 2)."""
    eng.cypher("CREATE (:t1 {age: 10})")
    eng.cypher("MATCH (a:t1) SET a.age = 11, a.age = a.age + 1")
    assert eng.cypher("MATCH (a:t1) RETURN a.age AS x").collect()[0]["x"] == 12

    eng.cypher("CREATE (:t2 {age: 10})")
    eng.cypher("MATCH (a:t2) SET a.age = 11 SET a.age = a.age + 1")
    assert eng.cypher("MATCH (a:t2) RETURN a.age AS x").collect()[0]["x"] == 12

    eng.cypher("CREATE (:t3 {age: 1})-[:rel]->(:t3 {age: 2})")
    eng.cypher("MATCH (a:t3)-[]->(b:t3) "
               "SET a.age = a.age + 1, b.age = a.age + b.age")
    assert sorted(r["x"] for r in eng.cypher(
        "MATCH (n:t3) RETURN n.age AS x").collect()) == [2, 4]

    eng.cypher("CREATE (:t4 {val: 1})-[:rel]->(:t4 {val: 2})")
    eng.cypher("MATCH (a:t4)-[]->(b:t4) SET a.val = b.val, b.val = a.val")
    assert sorted(r["x"] for r in eng.cypher(
        "MATCH (n:t4) RETURN n.val AS x").collect()) == [2, 2]


def test_set_error_parity(eng):
    """cypher_dml.out error cases: SET map to NULL and += on a single
    property are rejected."""
    eng.cypher("CREATE (:te {name: 'x'})")
    for q in ["MATCH (a:te) SET a = NULL",
              "MATCH (a:te) SET a += NULL",
              "MATCH (a:te) SET a.name += 'someone'"]:
        with pytest.raises(ValueError):
            eng.cypher(q)


def test_null_property_semantics(eng):
    """cypher_dml.out 'working with NULL': a NULL-valued property is
    absent from properties(), a {k: NULL} prop-map match yields no
    rows, IS NULL reads the missing key, SET k = NULL removes it."""
    import json
    eng.cypher("CREATE VLABEL person")
    eng.cypher("CREATE (:person {name: 'bitnine', age: NULL})")
    p = eng.cypher("MATCH (a:person {name: 'bitnine'}) "
                   "RETURN properties(a) AS a").collect()[0]["a"]
    assert json.loads(p) == {"name": "bitnine"}
    assert eng.cypher("MATCH (a:person {age: NULL}) RETURN a").count() == 0
    assert eng.cypher("MATCH (a:person) WHERE a.age IS NULL RETURN a").count() == 1
    eng.cypher("CREATE (:person {name: 'agens', key1: 1, key2: 2})")
    eng.cypher("MATCH (a:person {name: 'agens'}) SET a.key1 = NULL")
    p2 = eng.cypher("MATCH (a:person {name: 'agens'}) "
                    "RETURN properties(a) AS p").collect()[0]["p"]
    assert json.loads(p2) == {"name": "agens", "key2": 2}


def test_delete_null_object_noop(eng):
    """DELETE of a NULL entity (unmatched OPTIONAL MATCH) is a no-op,
    and repeating it stays a no-op (cypher_dml.sql:670-682)."""
    eng.cypher("CREATE ({name: 'agensgraph'})-[:made_by]->({name: 'bitnine'})")
    for _ in range(2):
        eng.cypher("MATCH (a {name: 'agensgraph'}), (g {name: 'bitnine'}) "
                   "OPTIONAL MATCH (a)-[r:made_by]-(g) DELETE r")
    assert eng.cypher("MATCH (n) RETURN n").count() == 2
    assert eng.cypher("MATCH ()-[r]->() RETURN r").count() == 0


def test_delete_entity_expressions(eng):
    """DETACH DELETE accepts entity-valued expressions — an indexed
    path vertex and end_vertex(edge) (cypher_dml.sql:658-662; indexing
    is Cypher 0-based here vs the out-file's SQL 1-based arrays)."""
    eng.cypher("CREATE (:repo {name: 'a'})-[:lib]->(:repo {name: 'b'})")
    eng.cypher("CREATE (:repo {name: 'c'})-[:doc]->(:repo {name: 'd'})")
    eng.cypher("MATCH p=()-[:lib]->() DETACH DELETE (vertices(p))[0]")
    assert [r["n"] for r in eng.cypher(
        "MATCH (x:repo) RETURN x.name AS n ORDER BY n").collect()] == ["b", "c", "d"]
    eng.cypher("MATCH ()-[a:doc]->() DETACH DELETE end_vertex(a)")
    assert [r["n"] for r in eng.cypher(
        "MATCH (x:repo) RETURN x.name AS n ORDER BY n").collect()] == ["b", "c"]
    assert eng.cypher("MATCH ()-[r]->() RETURN r").count() == 0


def test_merge_unspecified_direction(eng):
    """cypher_dml.out 'unspecified direction': undirected MERGE matches
    EITHER orientation; the create branch instantiates left→right
    (startnode = left endpoint)."""
    eng.cypher("CREATE (:m {id: 2}), (:m {id: 1})")
    eng.cypher("MATCH (a:m {id: 2}), (b:m {id: 1}) MERGE (a)-[r:e1]-(b)")
    got = [tuple(r) for r in eng.cypher(
        "MATCH (x:m)-[:e1]->(y:m) RETURN x.id AS s, y.id AS e").collect()]
    assert got == [(2, 1)]
    # reversed endpoints MATCH the existing edge — no second create
    eng.cypher("MATCH (a:m {id: 1}), (b:m {id: 2}) MERGE (a)-[r:e1]-(b)")
    assert eng.cypher("MATCH ()-[r:e1]->() RETURN r").count() == 1


def test_unnest_srf(eng):
    """unnest() as a Cypher SRF (cypher_dml.sql:1242 SRF block):
    expands an array into rows; unnest(nodes(p)).k projects a property
    through the expansion (access pushed inside the array — Spark
    allows one generator per projection, top-level only)."""
    eng.cypher("CREATE (:sv {id: 1})-[:se]->(:sv {id: 2})")
    out = eng.cypher("MATCH p=(:sv)-[:se]->(:sv) "
                     "RETURN toInteger(unnest(nodes(p)).id) AS i")
    assert sorted(r["i"] for r in out.collect()) == [1, 2]
    out2 = eng.cypher("RETURN unnest([10, 20, 30]) AS x")
    assert sorted(r["x"] for r in out2.collect()) == [10, 20, 30]


def test_vle_parenthesized_pattern_limits(eng):
    """AG-254 (cypher_dml.sql:1375-1410): parenthesized path patterns
    `((u)-[*0..3]->(v))` with LIMIT over VLE — the reference's crash
    regression; row-set sizes 22 (*0..3) and 18 (*..3) on the
    5-edge asterisk graph."""
    eng.cypher("CREATE (:vx {name: 'A'}), (:vx {name: 'B'}), "
               "(:vx {name: 'Q'}), (:vx {name: 'X'})")
    for s, t in [("A", "B"), ("Q", "A"), ("B", "Q"), ("A", "X"), ("X", "B")]:
        eng.cypher(f"MATCH (s:vx {{name: '{s}'}}), (t:vx {{name: '{t}'}}) "
                   "MERGE (s)-[:ed]->(t)")
    q22 = "MATCH p=((u:vx)-[:ed*0..3]->(v:vx)) RETURN p"
    q18 = "MATCH p=((u:vx)-[:ed*..3]->(v:vx)) RETURN p"
    assert eng.cypher(q22).count() == 22
    assert eng.cypher(q18).count() == 18
    for lim in (0, 1, 4, 5):
        assert eng.cypher(f"{q22} LIMIT {lim}").count() == min(lim, 22)
        assert eng.cypher(f"{q18} LIMIT {lim}").count() == min(lim, 18)
    assert eng.cypher("MATCH p=((u:vx {name: 'A'})-[:ed*]->(v:vx {name: 'B'})) "
                      "RETURN p LIMIT 4").count() == 4


def test_unwind_structured_params(eng):
    """PREPARE t(_jsonb) AS UNWIND $1 ... (cypher_dml.sql:1369-1371):
    list-of-map parameters become struct/array literals; chained
    UNWINDs drill into nested arrays."""
    run = eng.prepare("UNWIND $1 AS i UNWIND i.a AS j UNWIND j AS k RETURN k")
    rows = run([{"a": [[1, 2], [3, 4]]}, {"a": [[5, 6], [7, 8]]}]).collect()
    assert sorted(r["k"] for r in rows) == [1, 2, 3, 4, 5, 6, 7, 8]


def test_vle_tree_expansion_ag154(eng):
    """AG-154/CS-34 (cypher_dml.sql:512-537): unbounded VLE over a
    3-level tree returns every path prefix regardless of scan strategy
    — lengths 1×1, 2×3, 3×7."""
    eng.cypher("CREATE ({id: 1})-[:rel]->({id: 11})")
    for parent, kids in [(11, (111, 112, 113)), (111, (1111, 1112, 1113)),
                         (112, (1121, 1122)), (113, (1131, 1132))]:
        for k in kids:
            eng.cypher(f"MATCH (a {{id: {parent}}}) CREATE (a)-[:rel]->({{id: {k}}})")
    out = eng.cypher("MATCH ({id: 1})-[r:rel*]->() "
                     "RETURN length(r) AS len ORDER BY len")
    assert [r["len"] for r in out.collect()] == [1] + [2] * 3 + [3] * 7


def test_vle_mixed_elabels_ag216(eng):
    """AG-216/216a (cypher_dml.sql:540-561): untyped VLE crosses edge
    labels; *3 over the e1/e2/e3 tree yields all 8 leaf paths."""
    eng.cypher("CREATE (:w1)-[:f]->(:w2)-[:f]->(:w3)")
    assert eng.cypher("MATCH p=(:w1)-[*]->(:w3) RETURN p").count() == 1
    eng.cypher("CREATE (n:x1)-[:e1]->(:x2 {lv: 1}), (n)-[:e1]->(:x2 {lv: 1})")
    eng.cypher("MATCH (n:x2) WHERE n.lv = 1 "
               "CREATE (n)-[:e2]->(:x2 {lv: 2}), (n)-[:e2]->(:x2 {lv: 2})")
    eng.cypher("MATCH (n:x2 {lv: 2}) CREATE (n)-[:e3]->(:x3), (n)-[:e3]->(:x3)")
    assert eng.cypher("MATCH p=(:x1)-[*3]->() RETURN p").count() == 8


def test_match_only_modifier_matrix(eng):
    """MATCH ONLY (cypher_dml.sql:173-219): trailing ONLY excludes the
    inheritance subtree for vertices AND edges; bare ONLY without a
    label is the reference's error (gram.y:18643-18651)."""
    eng.cypher("CREATE VLABEL ol1")
    eng.cypher("CREATE VLABEL ol2 INHERITS (ol1)")
    eng.cypher("CREATE VLABEL ol3 INHERITS (ol2)")
    eng.cypher("CREATE ELABEL oe1")
    eng.cypher("CREATE ELABEL oe2 INHERITS (oe1)")
    for i in (1, 2, 3):
        eng.cypher(f"CREATE (:ol{i} {{id: {i}}})")
    eng.cypher("MATCH (a {id: 1}), (b {id: 2}) CREATE (a)-[:oe1]->(b)")
    eng.cypher("MATCH (a {id: 1}), (b {id: 3}) CREATE (a)-[:oe2]->(b)")

    def ids(q):
        return sorted(r["i"] for r in eng.cypher(q).collect())
    assert ids("MATCH (n:ol1) RETURN n.id AS i") == [1, 2, 3]
    assert ids("MATCH (n:ol2) RETURN n.id AS i") == [2, 3]
    assert ids("MATCH (n:ol1 ONLY) RETURN n.id AS i") == [1]
    assert ids("MATCH (n:ol2 ONLY) RETURN n.id AS i") == [2]
    assert eng.cypher("MATCH ()-[r:oe1]->() RETURN r").count() == 2
    assert eng.cypher("MATCH ()-[r:oe1 ONLY]->() RETURN r").count() == 1
    for bad in ["MATCH (n ONLY) RETURN n", "MATCH ()-[r ONLY]->() RETURN r"]:
        with pytest.raises(Exception, match="ONLY must have one label"):
            eng.cypher(bad)


def test_delete_multi_victim_variants(eng):
    """AG-160/AG-138/AG-2/AG-159 delete shapes (cypher_dml.sql:689-784):
    sequential DELETE clauses, mixed vertex+edge victims in one clause,
    DELETE of a path variable, and repeated DELETE of the same var all
    leave an empty graph."""
    def counts():
        return (eng.cypher("MATCH () RETURN count(*) AS c").collect()[0]["c"],
                eng.cypher("MATCH ()-[]->() RETURN count(*) AS c").collect()[0]["c"])
    eng.cypher("CREATE ({name: 'l'})-[:AG160]->({name: 'r'})")
    eng.cypher("MATCH (a)-[r:AG160]->(b) DELETE r DELETE a, b")
    assert counts() == (0, 0)
    eng.cypher("CREATE ()-[:rel]->()-[:rel]->()")
    eng.cypher("MATCH (a)-[r:rel]->(b) DELETE a, b, r")
    assert counts() == (0, 0)
    eng.cypher("CREATE ()-[:rel]->()-[:rel]->()")
    eng.cypher("MATCH p = ()-[:rel]->() DELETE p")
    assert counts() == (0, 0)
    eng.cypher("CREATE (:v1)")
    eng.cypher("MATCH (a:v1) DELETE a DETACH DELETE a DELETE a")
    assert counts() == (0, 0)


def test_path_composites_in_write_contexts(eng):
    """nodes(p)/relationships(p) yield FULL composites in write-clause
    expressions too (makeGraphpathDatum graph.c:1259) — property access
    through nodes(p)[i].prop works as a SET value and as a DELETE
    victim selector, both for bound plain paths and VLE paths (whose
    vid arrays exclude the seed vertex)."""
    eng.cypher("CREATE (:wp {name: 'a'})-[:wr {w: 'five'}]->"
               "(:wp {name: 'b'})-[:wr {w: 'six'}]->(:wp {name: 'c'})")
    eng.cypher("MATCH p = (x:wp {name: 'a'})-[:wr]->(:wp) "
               "SET x.copied = nodes(p)[1].name + '/' + relationships(p)[0].w")
    got = eng.cypher("MATCH (x:wp {name: 'a'}) RETURN x.copied AS c").collect()
    assert [r["c"] for r in got] == ["b/five"]
    # VLE path: seed-inclusive composite order holds in write context
    eng.cypher("MATCH p = (x:wp {name: 'a'})-[:wr*2..2]->(:wp) "
               "SET x.far = nodes(p)[2].name")
    got = eng.cypher("MATCH (x:wp {name: 'a'}) RETURN x.far AS f").collect()
    assert [r["f"] for r in got] == ["c"]
    # DELETE victim selected through the composite
    eng.cypher("MATCH p = (:wp {name: 'b'})-[:wr]->(:wp) "
               "DETACH DELETE nodes(p)[1]")
    names = {r["n"] for r in eng.cypher("MATCH (x:wp) RETURN x.name AS n").collect()}
    assert names == {"a", "b"}


def test_optional_match_first_clause_null_row(eng):
    """OPTIONAL MATCH as the FIRST clause yields one all-NULL row when
    nothing matches (cypher_dml.out:241-281), and the NULL binding
    flows through WITH and later MATCH clauses."""
    eng.cypher("CREATE (:person {name: 'someone'})-[:knows]->"
               "(:person {name: 'somebody'})")
    r1 = eng.cypher("OPTIONAL MATCH (n:person {name: 'unknown'}) "
                    "RETURN n.name AS nm").collect()
    assert [t["nm"] for t in r1] == [None]
    r2 = eng.cypher("OPTIONAL MATCH (n:person {name: 'unknown'}) "
                    "WITH n MATCH (m:person {name: 'someone'}) "
                    "RETURN n.name AS nn, m.name AS mn").collect()
    assert [(t["nn"], t["mn"]) for t in r2] == [(None, "someone")]
    r3 = eng.cypher("OPTIONAL MATCH (n:person) RETURN n.name AS nm "
                    "ORDER BY nm").collect()
    assert [t["nm"] for t in r3] == ["somebody", "someone"]


def test_empty_list_property_heterogeneous(eng):
    """AGV2/isEmpty fixtures (cypher_dml2.sql:94-113): an empty-list
    literal must coexist with typed list properties of other rows —
    jsonb arrays are heterogeneous; the empty literal stays untyped
    until the frame pins it."""
    eng.cypher("CREATE (:p {name: 'a', liked_colors: ['red'], eyes: ''}), "
               "(:p {name: 'b', liked_colors: []})")
    r = eng.cypher("MATCH (n:p) WHERE NOT isEmpty(n.liked_colors) "
                   "RETURN n.name AS x").collect()
    assert [t["x"] for t in r] == ["a"]
    r2 = eng.cypher("MATCH (n:p) WHERE isEmpty(n.eyes) RETURN n.name AS x").collect()
    assert [t["x"] for t in r2] == ["a"]
    eng.cypher("CREATE (:q {xs: []})")
    eng.cypher("CREATE (:q {xs: [1, 2]})")
    got = sorted(str(t["xs"]) for t in
                 eng.cypher("MATCH (n:q) RETURN n.xs AS xs").collect())
    assert got == ["[1, 2]", "[]"] or got == ["['1', '2']", "[]"]


def test_merge_with_match_merge_chain_589(eng):
    """#589 (cypher_dml2.sql:201-219): read clauses may follow update
    clauses — MERGE → WITH → MATCH → MERGE builds the edge."""
    eng.cypher("CREATE (n:another {id: 593})")
    eng.cypher("MERGE (n:main {id: 593}) ON CREATE SET n.id = 593 "
               "WITH n MATCH (g:another) WHERE g.id = 593 "
               "MERGE (g)-[:main2]->(n)")
    assert eng.cypher("MATCH ()-[e:main2]->() RETURN e").count() == 1
    assert [r["i"] for r in eng.cypher(
        "MATCH (g:main) RETURN g.id AS i").collect()] == [593]


def test_self_loop_pattern_599(eng):
    """#599 (cypher_dml2.sql:223-239): a repeated variable pattern
    (a)-[]-(a) matches the self-loop in both orientations — 2 rows."""
    eng.cypher("CREATE (:sl {id: 9})")
    eng.cypher("MATCH (s:sl {id: 9}) CREATE (s)-[:e1]->(s)")
    assert [r["i"] for r in eng.cypher(
        "MATCH (a:sl)-[]-(a) RETURN a.id AS i").collect()] == [9, 9]


# --- path composites in EVERY expression position (graph.c:1259) ---
# The bare-id fallback in _f_nodes/_f_relationships is gone: any
# context the materializer misses now raises instead of silently
# returning id arrays. These pin the once-uncovered contexts.

def test_unwind_nodes_composites(eng):
    eng.cypher("CREATE (:uw {id: 1})-[:uwe {w: 5}]->(:uw {id: 2})")
    rows = eng.cypher("MATCH p = (:uw)-[:uwe]->(:uw) "
                      "UNWIND nodes(p) AS n RETURN n.id AS i").collect()
    assert sorted(r["i"] for r in rows) == ["1", "2"]
    rels = eng.cypher("MATCH p = (:uw)-[:uwe]->(:uw) "
                      "UNWIND relationships(p) AS r "
                      "RETURN r.w AS w").collect()
    assert [r["w"] for r in rels] == ["5"]


def test_create_prop_from_path_composites(eng):
    eng.cypher("CREATE (:cpa {id: 3})-[:cpe]->(:cpa {id: 4})")
    eng.cypher("MATCH p = (:cpa)-[:cpe]->(:cpa) "
               "CREATE (:cpsum {ids: [x IN nodes(p) | x.id]})")
    got = eng.cypher("MATCH (s:cpsum) RETURN s.ids AS ids").collect()
    assert [list(r["ids"]) for r in got] == [["3", "4"]]


def test_merge_prop_from_path_composites(eng):
    eng.cypher("CREATE (:mpa {id: 7})-[:mpe]->(:mpa {id: 8})")
    eng.cypher("MATCH p = (:mpa)-[:mpe]->(:mpa) "
               "MERGE (:mpk {first: head([x IN nodes(p) | x.id])})")
    got = eng.cypher("MATCH (s:mpk) RETURN s.first AS f").collect()
    assert [r["f"] for r in got] == ["7"]


# --- cypher_plpgsql.sql: the Cypher-semantic content of the UDF
# regression file (the plpgsql control flow itself is n/a — no
# procedures engine — but every Cypher statement it wraps must behave
# identically when driven directly) ---

def test_comprehension_iterator_shadows_parameter(eng):
    """cypher_plpgsql.sql:23-33 (expected .out: [2]): the list
    comprehension's iterator variable `id` SHADOWS the outer `id`
    parameter inside the brackets while the WHERE outside still sees
    the parameter."""
    eng.cypher("CREATE (:shv {id: 1, refs: [2, 3, 4]}), (:shv {id: 2})")
    r = eng.cypher(
        "MATCH (n:shv) WHERE n.id = $id "
        "RETURN [id IN n.refs WHERE id < 3] AS r",
        params={"id": 1}).collect()
    assert [list(x["r"]) for x in r] == [[2]]
    # parameter-as-plain-variable binding (udf_var, .out: {"id": 2})
    r2 = eng.cypher("MATCH (n:shv) WHERE n.id = $i "
                    "RETURN n.id AS i", params={"i": 2}).collect()
    assert [x["i"] for x in r2] == [2]


def test_undirected_merge_on_create_on_match(eng):
    """cypher_plpgsql.sql:99-124 (udf_graphwrite, .out:127 'friend6'):
    undirected MERGE (a)-[r]-(b) with ON CREATE / ON MATCH — first run
    creates the edge (created=true), second run matches it in either
    orientation (matched=true, created nulled)."""
    eng.cypher("CREATE (:gw {name: 'Becky'}), (:gw {name: 'Emil'})")
    one = ("MATCH (a:gw {name: 'Becky'}), (b:gw {name: 'Emil'}) "
           "MERGE (a)-[r:knows {name: 'friend6'}]-(b) "
           "ON CREATE SET r.created = true, r.matched = null "
           "ON MATCH SET r.matched = true, r.created = null "
           "RETURN r.name AS rn, r.created AS c, r.matched AS m")
    first = eng.cypher(one).collect()
    assert [(x["rn"], x["c"], x["m"]) for x in first] == \
        [("friend6", True, None)]
    second = eng.cypher(one).collect()
    assert [(x["rn"], x["c"], x["m"]) for x in second] == \
        [("friend6", None, True)]


def test_anonymous_endpoints_then_optional_match_507(eng):
    """cypher_plpgsql.sql:135-152 (github #507, .out:188): CREATE with
    an incoming edge from an anonymous node, a second CREATE minting an
    unbound target from a matched source, then MATCH + OPTIONAL MATCH
    returning all four entities non-NULL."""
    eng.cypher("CREATE (x:v507 {id: 'v1'})<-[r:rel]-()")
    eng.cypher("MATCH (x:v507) CREATE (x)-[r2:rel]->(x2)")
    r = eng.cypher(
        "MATCH (x:v507 {id: 'v1'})<-[r:rel]-() "
        "OPTIONAL MATCH (x)-[r2:rel]->(x2) "
        "RETURN x.id AS xid, type(r) AS rt, "
        "id(x2) IS NOT NULL AS has_x2, type(r2) AS r2t").collect()
    assert [(x["xid"], x["rt"], x["has_x2"], x["r2t"]) for x in r] == \
        [("v1", "rel", True, "rel")]


def test_unquoted_identifier_case_folding(eng):
    """PG scanner parity (scan.l downcase_identifier): unquoted
    identifiers — labels, reltypes, property keys, variables — fold to
    lowercase; backtick-quoted identifiers preserve case (the analog
    of PG's double quotes). Pinned by the reference's own expected
    output: cypher_dml2.out:134-143 shows exists((n)-[:MARRIED]->())
    finding the edge created as :married (Bob t, everyone else f)."""
    eng.cypher("CREATE (a:CFPerson {Name: 'Bob'}), (f:CFPerson {Name: 'Eskil'}), "
               "(a)-[:married]->(f)")
    # label, key, and variable all folded: CFPerson == cfperson
    r = eng.cypher("MATCH (N:cfperson) WHERE N.name IS NOT NULL "
                   "RETURN n.name AS name, "
                   "exists((n)-[:MARRIED]->()) AS is_married "
                   "ORDER BY name").collect()
    assert [(x["name"], x["is_married"]) for x in r] == \
        [("Bob", True), ("Eskil", False)]
    # backticks preserve case: `CS` is a DIFFERENT label from cs, and
    # a backtick-quoted property key keeps its spelling. (Divergence,
    # documented: two keys differing ONLY by case on the same label —
    # PG's "Key" vs key — collide in Spark's case-insensitive column
    # resolver, so that corner raises AMBIGUOUS_REFERENCE instead of
    # coexisting.)
    eng.cypher("CREATE (:`CS` {`Key`: 1})")
    got = eng.cypher("MATCH (m:`CS`) RETURN m.`Key` AS a").collect()
    assert [x["a"] for x in got] == [1]
    import pytest as _pt
    with _pt.raises(Exception, match="does not exist"):
        eng.cypher("MATCH (m:cs) RETURN m").collect()
