"""Snapshot persistence round-trip and edge statistics."""

from pyspark.sql import functions as F

from agensgraph_spark.catalog import GraphCatalog
from agensgraph_spark.cypher.compiler import CypherEngine
from agensgraph_spark.graph import Graph
from agensgraph_spark.loader import build_tpch_graph


def test_write_read_snapshot_roundtrip(spark, tmp_path):
    eng = CypherEngine(spark, Graph(GraphCatalog("snap")))
    eng.cypher("CREATE (:person {name: 'ana'})-[:knows {w: 1}]->(:person {name: 'bob'})")
    eng.graph.write_snapshot(str(tmp_path), partitions=2)

    g2 = Graph.read_snapshot(spark, str(tmp_path), "snap")
    assert set(g2.catalog.labels) == {"person", "knows"}
    eng2 = CypherEngine(spark, g2)
    got = sorted(r["n"] for r in eng2.cypher("MATCH (p:person) RETURN p.name AS n").collect())
    assert got == ["ana", "bob"]
    edge = eng2.cypher("MATCH (a)-[k:knows]->(b) RETURN a.name AS an, b.name AS bn, k.w AS w").collect()
    assert [(r["an"], r["bn"], r["w"]) for r in edge] == [("ana", "bob", 1)]


def test_edge_stats_graphmeta(spark):
    g = build_tpch_graph(spark, "/root/testdata/sf0.001")
    stats = {(r["edge_label"], r["start_labid"], r["end_labid"]): r["edgecount"]
             for r in g.edge_stats().collect()}
    n_orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").count()
    n_cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    assert stats[("placed", 1, 4)] == n_orders
    assert stats[("in_nation", 1, 5)] == n_cust
    assert stats[("in_region", 5, 6)] == 25


def test_versioned_snapshots_time_travel(spark, tmp_path):
    """Immutable versioned snapshots: the MVCC-visibility batch analog —
    a later write never disturbs an earlier version's readers."""
    import pytest
    eng = CypherEngine(spark, Graph(GraphCatalog("tt")))
    eng.cypher("CREATE (:person {name: 'ana'})")
    eng.graph.write_snapshot(str(tmp_path), partitions=1, version="v1")
    eng.cypher("CREATE (:person {name: 'bob'})")
    eng.graph.write_snapshot(str(tmp_path), partitions=1, version="v2")

    assert Graph.snapshot_versions(str(tmp_path), "tt") == ["v1", "v2"]
    g1 = Graph.read_snapshot(spark, str(tmp_path), "tt", version="v1")
    g2 = Graph.read_snapshot(spark, str(tmp_path), "tt", version="latest")
    n1 = CypherEngine(spark, g1).cypher(
        "MATCH (p:person) RETURN count(*) AS n").collect()[0]["n"]
    n2 = CypherEngine(spark, g2).cypher(
        "MATCH (p:person) RETURN count(*) AS n").collect()[0]["n"]
    assert (n1, n2) == (1, 2)
    with pytest.raises(FileNotFoundError):
        Graph.read_snapshot(spark, str(tmp_path), "tt", version="nope")

    # versions are immutable: a duplicate write raises; an explicit
    # overwrite_version=True replaces it deliberately
    eng.cypher("CREATE (:person {name: 'cyn'})")
    with pytest.raises(ValueError, match="immutable"):
        eng.graph.write_snapshot(str(tmp_path), partitions=1, version="v2")
    g2b = Graph.read_snapshot(spark, str(tmp_path), "tt", version="v2")
    assert CypherEngine(spark, g2b).cypher(
        "MATCH (p:person) RETURN count(*) AS n").collect()[0]["n"] == 2
    eng.graph.write_snapshot(str(tmp_path), partitions=1, version="v2",
                             overwrite_version=True)
    assert Graph.snapshot_versions(str(tmp_path), "tt") == ["v1", "v2"]
    g2c = Graph.read_snapshot(spark, str(tmp_path), "tt", version="v2")
    assert CypherEngine(spark, g2c).cypher(
        "MATCH (p:person) RETURN count(*) AS n").collect()[0]["n"] == 3


def test_label_frames_round_trip_orc_and_json(spark, tmp_path):
    """Foreign-format round trips (§2.1 sources/sinks beyond Parquet/
    CSV): ORC and JSON label exports re-read losslessly. JDBC uses the
    same DataFrameReader surface but needs a live server, so these two
    stand in for the generic source path."""
    eng = CypherEngine(spark, Graph(GraphCatalog("fmt")))
    eng.cypher("CREATE (:person {name: 'ana', age: 31}), (:person {name: 'bob', age: 25})")
    df = eng.graph.label_df("person")
    for fmt in ("orc", "json"):
        path = f"{tmp_path}/person_{fmt}"
        df.write.format(fmt).save(path)
        back = spark.read.format(fmt).schema(df.schema).load(path)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
