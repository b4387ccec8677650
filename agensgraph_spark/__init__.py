"""agensgraph_spark — a PySpark-native property-graph + analytics engine.

A from-scratch re-expression of the capability surface of
bitnine-oss/agensgraph (openCypher property graphs inside a full SQL
engine) as an idiomatic Spark library:

- Property graphs are collections of label DataFrames (columnar Parquet),
  one per vertex/edge label, sharing base schemas (SURVEY.md §1.5).
- Cypher queries compile clause-by-clause into DataFrame transformations
  (mirroring the reference's clause-chaining design,
  reference: src/backend/parser/analyze.c:3540 transformCypherClause),
  so Catalyst performs all relational optimization.
- Iterative path operators (variable-length edges, shortest paths,
  Dijkstra) are driver-side loops of DataFrame joins — the one part
  Catalyst cannot express (reference: src/backend/executor/execGraphVle.c,
  nodeShortestpath.c, nodeDijkstra.c).
- Graph writes are snapshot-producing batch operations (immutable
  snapshots replace MVCC; reference: src/backend/executor/nodeModifyGraph.c).
"""

from agensgraph_spark.graphid import make_graphid, graphid_labid, graphid_locid
from agensgraph_spark.catalog import GraphCatalog
from agensgraph_spark.graph import Graph
from agensgraph_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "GraphCatalog",
    "get_spark",
    "make_graphid",
    "graphid_labid",
    "graphid_locid",
]
