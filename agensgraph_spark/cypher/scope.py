"""Variable scope / binding model for the DataFrame compiler.

Each Cypher variable binds to a family of flat columns in the pipeline
DataFrame, prefixed ``{var}__``:

- vertex var a:  a__id, a__label, a__{prop}...
- edge var e:    e__id, e__start, e__end, e__label, e__{prop}...
- value var x:   single column x (scalar/array/struct from WITH/UNWIND)
- path var p:    p__vids (array<long>), p__eids (array<long>), p__len
                 (+ p__weight for dijkstra)

Flat columns (not nested structs) keep every property access a plain
column reference — Parquet pushdown and whole-stage codegen apply
untouched. The reference's analog is the composite-attribute projection
that turns id(v) into v.id (reference: src/backend/parser/
parse_cypher_expr.c:980-995).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Binding:
    var: str
    kind: str  # 'vertex' | 'edge' | 'value' | 'path'
    labels: list[str] = field(default_factory=list)  # candidate concrete labels
    props: list[str] = field(default_factory=list)   # property column suffixes
    # a varlen REL variable (-[r:T*]->) binds as 'path' for column
    # layout, but in expression position it IS the edge list
    # (reference: cypher_dml2.sql AGV2-26/29 — head(e), all(x IN r ...))
    rel_array: bool = False

    def cols(self) -> list[str]:
        p = self.var
        if self.kind == "vertex":
            return [f"{p}__id", f"{p}__label"] + [f"{p}__{x}" for x in self.props]
        if self.kind == "edge":
            return [f"{p}__id", f"{p}__start", f"{p}__end", f"{p}__label"] + [f"{p}__{x}" for x in self.props]
        if self.kind == "path":
            base = [f"{p}__vids", f"{p}__eids", f"{p}__len"]
            return base + [f"{p}__weight" for _ in [0] if f"{p}__weight" in self.props]
        if self.kind == "row":
            return [f"{p}__{x}" for x in self.props]
        return [p]


class Scope:
    def __init__(self):
        self.bindings: dict[str, Binding] = {}
        self._anon = 0

    def bind(self, b: Binding) -> Binding:
        self.bindings[b.var] = b
        return b

    def get(self, var: str) -> Binding | None:
        return self.bindings.get(var)

    def require(self, var: str) -> Binding:
        b = self.bindings.get(var)
        if b is None:
            raise ValueError(f"variable {var!r} not defined")
        return b

    def fresh_anon(self) -> str:
        self._anon += 1
        return f"_a{self._anon}"

    def copy(self) -> "Scope":
        s = Scope()
        s.bindings = dict(self.bindings)
        s._anon = self._anon
        return s
