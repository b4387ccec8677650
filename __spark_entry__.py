"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-hop graph query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full declared workload
(graph/Cypher, relational SQL, and pipeline operators) — definitions
live in ``agensgraph_spark.workload``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from agensgraph_spark import workload


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: 2-hop Cypher MATCH with aggregation over the
    property graph derived from /root/testdata/sf0.001."""
    eng = workload._engine(spark, "/root/testdata/sf0.001")
    return eng.cypher(
        "MATCH (c:customer)-[:placed]->(o:orders)-[x:contains]->(p:part) "
        "RETURN c.c_mktsegment AS seg, count(*) AS n_items, "
        "round(sum(x.l_quantity), 2) AS total_qty "
        "ORDER BY n_items DESC"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.all_queries()


def oracle_sql() -> dict[str, str]:
    return workload.all_oracles()
