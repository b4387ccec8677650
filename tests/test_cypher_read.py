"""Read-query tests against the TPC-H graph at sf0.001, cross-checked
with handwritten DataFrame/SQL equivalents (the differential strategy
from SURVEY.md §5)."""

from pyspark.sql import functions as F


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_one_hop_filter(engine, spark):
    got = engine.cypher(
        "MATCH (c:customer)-[:placed]->(o:orders) WHERE o.o_totalprice > 450000 "
        "RETURN c.c_custkey AS ckey, o.o_orderkey AS okey ORDER BY okey"
    )
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    exp = (cust.join(orders, cust.c_custkey == orders.o_custkey)
           .filter(F.col("o_totalprice") > 450000)
           .select(F.col("c_custkey").alias("ckey"), F.col("o_orderkey").alias("okey"))
           .orderBy("okey"))
    assert rows(got) == rows(exp)


def test_two_hop_agg(engine, spark):
    got = engine.cypher(
        "MATCH (c:customer)-[:placed]->(o:orders)-[:contains]->(p:part) "
        "RETURN c.c_custkey AS ckey, count(*) AS n ORDER BY ckey"
    )
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    exp = (cust.join(orders, cust.c_custkey == orders.o_custkey)
           .join(li, orders.o_orderkey == li.l_orderkey)
           .groupBy(F.col("c_custkey").alias("ckey")).agg(F.count(F.lit(1)).alias("n"))
           .orderBy("ckey"))
    assert rows(got) == rows(exp)


def test_optional_match_counts_nulls(engine, spark):
    got = engine.cypher(
        "MATCH (c:customer) OPTIONAL MATCH (c)-[:placed]->(o:orders) "
        "RETURN c.c_custkey AS ckey, count(o) AS n ORDER BY ckey"
    )
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    exp = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
           .groupBy(F.col("c_custkey").alias("ckey")).agg(F.count("o_orderkey").alias("n"))
           .orderBy("ckey"))
    assert rows(got) == rows(exp)


def test_vle_depths(engine):
    got = engine.cypher(
        "MATCH (c:customer {c_custkey: 1})-[e:in_nation|in_region*1..2]->(x) "
        "RETURN length(e) AS hops ORDER BY hops"
    )
    # custkey 1 → its nation (1 hop) → that nation's region (2 hops)
    assert [r.hops for r in got.collect()] == [1, 2]


def test_undirected_edge(engine):
    got = engine.cypher(
        "MATCH (n:nation {n_nationkey: 0})-[:in_region]-(x) RETURN x.id AS xid"
    )
    # undirected sees the region (outgoing) only — no incoming in_region to a nation
    assert got.count() == 1


def test_shortestpath_two_hops(engine):
    got = engine.cypher(
        "MATCH (c:customer {c_custkey: 1}), (r:region) "
        "MATCH p = shortestpath((c)-[:in_nation|in_region*..4]->(r)) "
        "RETURN length(p) AS hops"
    )
    assert [r.hops for r in got.collect()] == [2]


def test_distinct_union(engine):
    got = engine.cypher(
        "MATCH (n:nation) RETURN n.n_name AS name UNION MATCH (n:nation) RETURN n.n_name AS name"
    )
    assert got.count() == 25


def test_mixed_union_union_all_chain(engine):
    # (a UNION b) UNION ALL c — the trailing ALL branch keeps its
    # duplicate (reference: gram.y:17089-17094, left-assoc set ops)
    got = engine.cypher("RETURN 1 AS x UNION RETURN 1 AS x UNION ALL RETURN 1 AS x")
    assert got.count() == 2
    got2 = engine.cypher("RETURN 1 AS x UNION ALL RETURN 1 AS x UNION RETURN 1 AS x")
    assert got2.count() == 1


def test_intersect_except(engine):
    """Statement-level INTERSECT / EXCEPT [ALL] (reference:
    gram.y:17089-17094): set semantics, bag (ALL) multiplicity, and
    INTERSECT binding tighter than UNION/EXCEPT."""
    rows = engine.cypher(
        "MATCH (c:customer) WHERE c.c_custkey <= 20 RETURN c.c_custkey AS k "
        "INTERSECT MATCH (c:customer) WHERE c.c_custkey >= 15 RETURN c.c_custkey AS k"
    ).collect()
    assert sorted(r["k"] for r in rows) == [15, 16, 17, 18, 19, 20]
    rows = engine.cypher(
        "MATCH (c:customer) WHERE c.c_custkey <= 10 RETURN c.c_custkey AS k "
        "EXCEPT MATCH (c:customer) WHERE c.c_custkey <= 7 RETURN c.c_custkey AS k"
    ).collect()
    assert sorted(r["k"] for r in rows) == [8, 9, 10]
    # ALL variants keep multiplicity: {1,1,2} ∩all {1,1} = {1,1};
    # {1,1,2} \all {1} = {1,2}
    dup = ("UNWIND [1,1,2] AS x RETURN x INTERSECT ALL "
           "UNWIND [1,1] AS x RETURN x")
    assert sorted(r["x"] for r in engine.cypher(dup).collect()) == [1, 1]
    dup2 = ("UNWIND [1,1,2] AS x RETURN x EXCEPT ALL UNWIND [1] AS x RETURN x")
    assert sorted(r["x"] for r in engine.cypher(dup2).collect()) == [1, 2]
    # non-ALL EXCEPT dedups the survivors
    dup3 = ("UNWIND [1,1,2] AS x RETURN x EXCEPT UNWIND [3] AS x RETURN x")
    assert sorted(r["x"] for r in engine.cypher(dup3).collect()) == [1, 2]
    # precedence: a UNION b INTERSECT c == a UNION (b INTERSECT c)
    prec = ("RETURN 9 AS x UNION UNWIND [1,2] AS x RETURN x "
            "INTERSECT UNWIND [2,3] AS x RETURN x")
    assert sorted(r["x"] for r in engine.cypher(prec).collect()) == [2, 9]
    # NULLs compare equal in set ops (SQL set-op semantics)
    nl = ("RETURN null AS x INTERSECT RETURN null AS x")
    got = engine.cypher(nl).collect()
    assert len(got) == 1 and got[0]["x"] is None
    # column mismatch is an error
    import pytest as _pytest
    with _pytest.raises(Exception, match="different columns"):
        engine.cypher("RETURN 1 AS a INTERSECT RETURN 1 AS b").collect()


def test_with_where_pipeline(engine):
    got = engine.cypher(
        "MATCH (c:customer)-[:placed]->(o:orders) "
        "WITH c, count(o) AS n WHERE n >= 10 "
        "RETURN c.c_custkey AS ckey, n ORDER BY n DESC, ckey LIMIT 5"
    )
    out = got.collect()
    assert len(out) == 5
    assert all(r.n >= 10 for r in out)
    assert out[0].n >= out[-1].n


def test_unwind_expressions(engine):
    got = engine.cypher("UNWIND range(1, 5) AS x WITH x WHERE x % 2 = 1 RETURN x * x AS sq ORDER BY sq")
    assert [r.sq for r in got.collect()] == [1, 9, 25]


def test_edge_uniqueness(engine):
    # two edges in one MATCH must differ (reference: addQualUniqueEdges)
    got = engine.cypher(
        "MATCH (a:nation {n_nationkey: 0})-[e1:in_region]->(r)<-[e2:in_region]-(b:nation) "
        "RETURN count(*) AS n"
    )
    n_same_region = engine.cypher(
        "MATCH (a:nation {n_nationkey: 0})-[:in_region]->(r) MATCH (b:nation)-[:in_region]->(r) "
        "RETURN count(*) AS n"
    )
    assert got.collect()[0].n == n_same_region.collect()[0].n - 1  # excludes e1 = e2


def test_entity_functions(engine):
    got = engine.cypher(
        "MATCH (c:customer {c_custkey: 1})-[e:in_nation]->(n:nation) "
        "RETURN id(c) AS cid, label(c) AS clabel, type(e) AS et, start(e) AS s, properties(n) AS props"
    )
    r = got.collect()[0]
    assert r.clabel == "customer" and r.et == "in_nation"
    assert r.s == r.cid
    assert '"n_nationkey"' in r.props


def test_string_predicates(engine):
    got = engine.cypher(
        "MATCH (p:part) WHERE p.p_name STARTS WITH 'a' AND p.p_name CONTAINS 'e' "
        "RETURN count(*) AS n"
    )
    exp = engine.cypher(
        "MATCH (p:part) WHERE p.p_name =~ 'a.*e.*' RETURN count(*) AS n"
    )
    assert got.collect()[0].n == exp.collect()[0].n


def test_collect_and_list_ops(engine):
    got = engine.cypher(
        "MATCH (r:region)<-[:in_region]-(n:nation) "
        "WITH r, collect(n.n_name) AS names "
        "RETURN r.r_name AS rname, size(names) AS n ORDER BY rname"
    )
    out = got.collect()
    assert sum(r.n for r in out) == 25
    assert len(out) == 5


def test_case_in_null(engine):
    got = engine.cypher(
        "MATCH (o:orders) RETURN CASE WHEN o.o_totalprice > 250000 THEN 'big' ELSE 'small' END AS bucket, "
        "count(*) AS n ORDER BY bucket"
    )
    out = got.collect()
    assert [r.bucket for r in out] == ["big", "small"]


def test_size_pattern_in_return(engine, spark):
    got = engine.cypher(
        "MATCH (n:nation) RETURN n.n_name AS name, "
        "size((n)<-[:in_nation]-()) AS members ORDER BY name")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    supp = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
    nat = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    per_nation = (cust.groupBy(F.col("c_nationkey").alias("nk")).count()
                  .unionByName(supp.groupBy(F.col("s_nationkey").alias("nk")).count())
                  .groupBy("nk").agg(F.sum("count").alias("members")))
    exp = (nat.join(per_nation, nat.n_nationkey == F.col("nk"), "left")
           .select(F.col("n_name").alias("name"),
                   F.coalesce(F.col("members"), F.lit(0)).alias("members"))
           .orderBy("name"))
    assert rows(got) == rows(exp)


def test_bare_arrow_pattern_in_expression(engine):
    # regression (ADVICE r10): '-->' lexes as '-' + '->'; the pattern
    # lookahead must accept the trailing '->' or bare-arrow patterns in
    # expression position raise ParseError.
    got = engine.cypher(
        "MATCH (n:nation) WHERE (n)-->() RETURN count(*) AS n")
    assert rows(got) == [(25,)]
    got = engine.cypher(
        "MATCH (n:nation) RETURN size((n)-->()) AS deg ORDER BY deg LIMIT 1")
    assert rows(got) == [(1,)]
    # and '(expr) - expr' must still parse as subtraction
    got = engine.cypher(
        "MATCH (a:nation) RETURN (a.n_nationkey + 1) - 2 AS k "
        "ORDER BY k LIMIT 1")
    assert rows(got) == [(-1,)]


def test_exists_pattern_inside_or(engine):
    # non-top-level pattern predicate: hoisted match-count column, not
    # the semi-join fast path
    got = engine.cypher(
        "MATCH (r:region) WHERE r.r_name = 'NOPE' OR exists((r)<-[:in_region]-()) "
        "RETURN count(*) AS n")
    assert rows(got) == [(5,)]


def test_correlated_scalar_subquery_in_return(engine, spark):
    from agensgraph_spark.loader import register_tables
    register_tables(spark, "/root/testdata/sf0.001", only=("lineitem",))
    got = engine.cypher(
        "MATCH (o:orders) WHERE o.o_orderkey < 100 "
        "RETURN o.o_orderkey AS okey, "
        "(SELECT count(*) FROM lineitem WHERE l_orderkey = o.o_orderkey) AS n "
        "ORDER BY okey")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    per = li.groupBy(F.col("l_orderkey").alias("k")).count()
    exp = (orders.filter(F.col("o_orderkey") < 100)
           .join(per, orders.o_orderkey == F.col("k"), "left")
           .select(F.col("o_orderkey").alias("okey"),
                   F.coalesce(F.col("count"), F.lit(0)).alias("n"))
           .orderBy("okey"))
    assert rows(got) == rows(exp)


def test_unwind_null_yields_no_rows(engine):
    """Reference SRF semantics: UNWIND NULL emits nothing (the jsonb
    SRF over NULL input yields zero rows); UNWIND of a scalar errors."""
    import pytest
    assert engine.cypher("UNWIND NULL AS x RETURN x").collect() == []
    assert engine.cypher("UNWIND [] AS x RETURN x").collect() == []
    with pytest.raises(Exception):
        engine.cypher("UNWIND 7 AS x RETURN x").collect()


def test_order_by_nulls_placement(engine, spark):
    """NULLS FIRST/LAST (gram.y:18957 opt_nulls_order), and the
    PostgreSQL DEFAULT placement — nulls last ascending, nulls first
    descending (the opposite of Spark's default, so it must be
    written explicitly by the compiler)."""
    from agensgraph_spark.catalog import GraphCatalog
    from agensgraph_spark.cypher.compiler import CypherEngine
    from agensgraph_spark.graph import Graph
    eng = CypherEngine(spark, Graph(GraphCatalog("nulls")))
    eng.cypher("CREATE (:t {a: 1, s: 'x'}), (:t {a: 2}), (:t {a: 3, s: 'b'})")

    def run(q):
        return [r["a"] for r in eng.cypher(q).collect()]
    base = "MATCH (n:t) RETURN n.a AS a ORDER BY n.s"
    assert run(base) == [3, 1, 2]                      # default asc: nulls last
    assert run(base + " DESC") == [2, 1, 3]            # default desc: nulls first
    assert run(base + " ASC NULLS FIRST") == [2, 3, 1]
    assert run(base + " DESC NULLS LAST") == [1, 3, 2]
    # LIMIT rides the explicit placement
    assert run(base + " NULLS FIRST LIMIT 1") == [2]


def test_skip_limit_constant_expressions(engine, spark):
    """SKIP/LIMIT accept stable integer expressions (gram.y
    cypher_skip_opt/limit_opt take a_expr): arithmetic over literals
    and parameters folds driver-side; column references stay errors."""
    import pytest
    from agensgraph_spark.catalog import GraphCatalog
    from agensgraph_spark.cypher.compiler import CypherEngine
    from agensgraph_spark.graph import Graph
    eng = CypherEngine(spark, Graph(GraphCatalog("sklm")))
    eng.cypher("UNWIND range(1, 10) AS x CREATE (:n {k: x})")
    q = "MATCH (n:n) RETURN n.k AS k ORDER BY k SKIP 1 + 1 LIMIT 2 * 2"
    assert [r["k"] for r in eng.cypher(q).collect()] == [3, 4, 5, 6]
    q2 = "MATCH (n:n) RETURN n.k AS k ORDER BY k SKIP $s LIMIT $l - 1"
    assert [r["k"] for r in eng.cypher(q2, {"s": 8, "l": 3}).collect()] == [9, 10]
    with pytest.raises(ValueError, match="constant integer"):
        eng.cypher("MATCH (n:n) RETURN n.k AS k LIMIT n.k")
