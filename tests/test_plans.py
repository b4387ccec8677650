"""Plan-quality assertions: the compiled plans must keep the shapes
that survive a 100 TB scale-up — pushed filters, pruned columns,
broadcast of bounded sides, no cartesian products on the hot paths."""

import re

import pytest
from pyspark.sql import functions as F

from agensgraph_spark.cypher.compiler import CypherEngine
from agensgraph_spark.loader import build_tpch_graph

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def eng(spark):
    return CypherEngine(spark, build_tpch_graph(spark, SF))


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_property_filter_reaches_parquet_scan(eng):
    df = eng.cypher("MATCH (r:region) WHERE r.r_name = 'ASIA' RETURN r.r_regionkey AS k")
    plan = physical(df)
    assert "EqualTo(r_name,ASIA)" in plan  # pushed into the Parquet scan


def test_column_pruning(eng):
    df = eng.cypher("MATCH (p:part) RETURN p.p_partkey AS k")
    plan = physical(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert any(s == "p_partkey:bigint" for s in schemas), schemas


def test_multi_hop_uses_broadcast_joins(eng):
    df = eng.cypher(
        "MATCH (s:supplier)-[:in_nation]->(n:nation)-[:in_region]->(r:region) "
        "WHERE r.r_name = 'ASIA' RETURN s.s_suppkey AS skey")
    plan = physical(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_pattern_join_no_vertex_scan_for_anonymous_endpoint(eng):
    # (c:customer)-[:placed]->() must not scan the orders label at all
    df = eng.cypher("MATCH (c:customer)-[:placed]->() RETURN c.c_custkey AS k")
    plan = physical(df)
    assert "o_orderkey" not in plan  # future-vertex deferral: edge dst is enough


def test_agg_is_partial_then_final(eng):
    df = eng.cypher("MATCH (c:customer) RETURN c.c_mktsegment AS seg, count(*) AS n")
    plan = physical(df)
    # two-phase hash aggregate (map-side partial combine before shuffle)
    assert plan.count("HashAggregate") >= 2


def test_edge_scan_prunes_unused_union_branch(eng, spark):
    # in_nation unions customer+supplier edge sources; a supplier-anchored
    # pattern pushes a labid range on src that lands on the underlying
    # key columns of both branches
    df = eng.cypher("MATCH (s:supplier)-[:in_nation]->(n:nation) RETURN s.s_suppkey AS k")
    plan = physical(df)
    # the customer branch's scan must carry a pushed filter on c_custkey
    # (derived from the graphid range) or be filtered before its join
    assert "Filter" in plan
    rows = df.count()
    sup = spark.read.parquet(f"{SF}/supplier.parquet").count()
    assert rows == sup
