"""Cypher front-end: lexer → recursive-descent parser → clause AST →
DataFrame compiler.

Mirrors the reference's single-pipeline design (parse → analyze →
plan; reference: src/backend/parser/gram.y:17070 CypherStmt,
analyze.c:3476 transformCypherStmt) but targets DataFrames: each clause
folds over its predecessor's DataFrame exactly as the reference wraps
each clause's predecessor in a subquery RTE
(src/include/nodes/parsenodes.h:3854-3866).
"""

from agensgraph_spark.cypher.parser import parse_cypher
from agensgraph_spark.cypher.compiler import CypherEngine

__all__ = ["parse_cypher", "CypherEngine"]
