"""Cypher AST node definitions (plain dataclasses).

Shapes follow the reference's raw parse nodes (reference:
src/include/nodes/parsenodes.h:3839-3948 CypherClause family,
src/include/nodes/primnodes.h:1586-1634 Cypher expression nodes) but
carry only what the DataFrame compiler needs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


# ---------- expressions ----------

class Expr:
    pass


@dataclass
class Lit(Expr):
    value: Any  # int | float | str | bool | None


@dataclass
class ListLit(Expr):
    items: list[Expr]


@dataclass
class MapLit(Expr):
    items: list[tuple[str, Expr]]


@dataclass
class Param(Expr):
    name: str


@dataclass
class Var(Expr):
    name: str


@dataclass
class Prop(Expr):
    """n.key (possibly chained: n.o.i handled by nesting Prop)."""
    base: Expr
    key: str


@dataclass
class Index(Expr):
    """l[i] — subscript; negative indices allowed (Cypher semantics)."""
    base: Expr
    index: Expr


@dataclass
class Slice(Expr):
    """l[a..b] — list slice, 0-based, end-exclusive, negatives allowed."""
    base: Expr
    lo: Optional[Expr]
    hi: Optional[Expr]


@dataclass
class BinOp(Expr):
    op: str  # + - * / % ^
    left: Expr
    right: Expr


@dataclass
class Cast(Expr):
    """PostgreSQL-style ``expr::type`` cast (reference accepts it in
    Cypher expressions — cypher_expr.sql:88-100 ::bool/::jsonb/::text
    matrices)."""
    operand: Expr
    type_name: str


@dataclass
class UnaryOp(Expr):
    op: str  # - +
    operand: Expr


@dataclass
class Cmp(Expr):
    op: str  # = <> < > <= >=
    left: Expr
    right: Expr


@dataclass
class BoolOp(Expr):
    op: str  # and | or | xor
    args: list[Expr]


@dataclass
class Not(Expr):
    operand: Expr


@dataclass
class IsNull(Expr):
    operand: Expr
    negated: bool = False


@dataclass
class DistinctFrom(Expr):
    """a IS [NOT] DISTINCT FROM b — null-safe comparison
    (gram.y a_expr; negated=True is IS NOT DISTINCT FROM)."""
    left: Expr
    right: Expr
    negated: bool = False


@dataclass
class InList(Expr):
    item: Expr
    container: Expr


@dataclass
class StringOp(Expr):
    # starts_with | ends_with | contains | regex
    # | [not_]like | [not_]ilike | [not_]similar (gram.y:13560-13640:
    # LIKE/ILIKE/SIMILAR TO [ESCAPE] are a_expr productions, so the
    # reference accepts them inside Cypher expressions too)
    op: str
    left: Expr
    right: Expr
    escape: "Expr | None" = None


@dataclass
class FuncCall(Expr):
    name: str  # lowercase
    args: list[Expr]
    distinct: bool = False
    star: bool = False  # count(*)


@dataclass
class Case(Expr):
    operand: Optional[Expr]
    whens: list[tuple[Expr, Expr]]
    default: Optional[Expr]


@dataclass
class ListComp(Expr):
    """[x IN list WHERE pred | expr]"""
    var: str
    source: Expr
    where: Optional[Expr]
    projection: Optional[Expr]


@dataclass
class Quantifier(Expr):
    """ALL/ANY/NONE/SINGLE (x IN list WHERE pred)"""
    kind: str
    var: str
    source: Expr
    where: Expr


@dataclass
class PatternPred(Expr):
    """EXISTS((a)-[:T]->(b)) / pattern as boolean predicate."""
    pattern: "PathPattern"
    kind: str = "exists"  # exists | size


@dataclass
class ScalarSubquery(Expr):
    """SQL scalar subquery embedded in a Cypher expression (hybrid).
    ``collect_set`` marks IN-SubLink position (set membership): the
    hoist collects the subquery's rows into an array column."""
    sql: str
    collect_set: bool = False


@dataclass
class PathFindExpr(Expr):
    """shortestpath()/allshortestpaths() in EXPRESSION position over
    already-bound endpoints (cypher_shortestpath2.sql:334-339): yields
    the path value (or NULL) per outer row, preserving cardinality —
    allshortestpaths yields the array of tied paths."""
    pattern: "PathPattern"


# ---------- patterns ----------

@dataclass
class NodePat:
    var: Optional[str]
    labels: list[str]
    props: Optional[MapLit]
    only: bool = False


@dataclass
class RelPat:
    var: Optional[str]
    types: list[str]
    direction: str  # 'out' | 'in' | 'undir'
    props: Optional[MapLit] = None
    minhops: Optional[int] = None  # None = fixed single hop
    maxhops: Optional[int] = None
    varlen: bool = False
    only: bool = False


@dataclass
class PathPattern:
    var: Optional[str]
    elements: list  # alternating NodePat, RelPat, NodePat, ...
    kind: str = "plain"  # plain | shortestpath | allshortestpaths | dijkstra
    weight: Optional[Expr] = None       # dijkstra
    weight_var: Optional[str] = None    # dijkstra(..., w)
    qual: Optional[Expr] = None         # dijkstra WHERE
    limit: Optional[Expr] = None        # dijkstra LIMIT n


# ---------- clauses ----------

class Clause:
    pass


@dataclass
class SortItem:
    expr: Expr
    asc: bool = True
    nulls: "str | None" = None  # "first" | "last" | None = PG default


@dataclass
class ReturnItem:
    expr: Expr
    alias: Optional[str]


@dataclass
class Match(Clause):
    patterns: list[PathPattern]
    optional: bool = False
    where: Optional[Expr] = None


@dataclass
class Unwind(Clause):
    expr: Expr
    alias: str


@dataclass
class Projection(Clause):
    """WITH / RETURN (reference: CypherProjection, parsenodes.h:3889)."""
    items: list[ReturnItem]
    kind: str = "return"  # return | with
    distinct: bool = False
    order: list[SortItem] = field(default_factory=list)
    skip: Optional[Expr] = None
    limit: Optional[Expr] = None
    where: Optional[Expr] = None  # WITH ... WHERE
    star: bool = False


@dataclass
class Create(Clause):
    patterns: list[PathPattern]


@dataclass
class SetItem:
    target: Expr       # Prop(Var, key) or Var for whole-properties set
    value: Optional[Expr]
    op: str = "set"    # set | add (+=) | remove


@dataclass
class SetClause(Clause):
    items: list[SetItem]


@dataclass
class RemoveClause(Clause):
    items: list[SetItem]


@dataclass
class Delete(Clause):
    exprs: list[Expr]
    detach: bool = False


@dataclass
class Merge(Clause):
    pattern: PathPattern
    on_create: list[SetItem] = field(default_factory=list)
    on_match: list[SetItem] = field(default_factory=list)


@dataclass
class LoadClause(Clause):
    """LOAD FROM table AS var (reference: parsenodes.h:3938 CypherLoadClause)."""
    table: str
    alias: str


@dataclass
class Query:
    clauses: list[Clause]


@dataclass
class SetOp:
    """Statement-level set operation (reference: gram.y:17089-17094 —
    CypherStmt UNION/INTERSECT/EXCEPT set_quantifier CypherStmt).
    INTERSECT binds tighter than UNION/EXCEPT; same-level ops associate
    left (PostgreSQL set-op precedence)."""
    op: str    # "union" | "intersect" | "except"
    all: bool
    left: "Query | SetOp"
    right: "Query | SetOp"

    @property
    def leaves(self) -> "list[Query]":
        out: list[Query] = []
        for side in (self.left, self.right):
            out.extend(side.leaves if isinstance(side, SetOp) else [side])
        return out
