import pytest

from agensgraph_spark import get_spark
from agensgraph_spark.cypher.compiler import CypherEngine
from agensgraph_spark.loader import build_tpch_graph

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("agensgraph-tests")


@pytest.fixture(scope="session")
def tpch_graph(spark):
    return build_tpch_graph(spark, SF_DIR)


@pytest.fixture(scope="session")
def engine(spark, tpch_graph):
    return CypherEngine(spark, tpch_graph)
