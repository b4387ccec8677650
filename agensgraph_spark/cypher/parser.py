"""Recursive-descent openCypher parser.

Grammar coverage mirrors the reference's Cypher grammar
(reference: src/backend/parser/gram.y:17070-18940 — CypherStmt,
cypher_clause_head/prev chaining, VLE ``*min..max``, shortestpath /
allshortestpaths / dijkstra productions at gram.y:18548-18622,
predicate forms at gram.y:18207-18340) restricted to the read/write
clause set the engine executes. Expression precedence follows Cypher:
OR < XOR < AND < NOT < comparison/predicates < +,- < *,/,% < ^ <
unary < subscript/property.
"""

from __future__ import annotations

from agensgraph_spark.cypher import ast as A
from agensgraph_spark.cypher.lexer import Token, tokenize


class ParseError(ValueError):
    pass


AGG_FUNCS = {"count", "sum", "avg", "min", "max", "collect", "stdev", "stdevp",
             "stddev", "stddev_samp", "stddev_pop", "percentilecont", "percentiledisc"}


class Parser:
    def __init__(self, toks: list[Token], src: str = ""):
        self.toks = toks
        self.src = src
        self.i = 0

    # ---- token helpers ----

    def peek(self, off: int = 0) -> Token:
        return self.toks[min(self.i + off, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def expect(self, kind: str) -> Token:
        t = self.peek()
        if t.kind != kind:
            raise ParseError(f"expected {kind!r}, got {t.kind!r} ({t.text!r}) at {t.pos}")
        return self.next()

    def accept(self, kind: str) -> Token | None:
        if self.peek().kind == kind:
            return self.next()
        return None

    def peek_kw(self, *words: str, off: int = 0) -> bool:
        t = self.peek(off)
        return t.kind == "KEYWORD" and t.lower() in words

    def accept_kw(self, *words: str) -> Token | None:
        if self.peek_kw(*words):
            return self.next()
        return None

    def expect_kw(self, word: str) -> Token:
        t = self.peek()
        if not (t.kind == "KEYWORD" and t.lower() == word):
            raise ParseError(f"expected {word.upper()}, got {t.text!r} at {t.pos}")
        return self.next()

    def ident(self) -> str:
        t = self.peek()
        if t.kind in ("IDENT", "KEYWORD"):
            self.next()
            return t.text
        raise ParseError(f"expected identifier, got {t.kind!r} at {t.pos}")

    # ---- top level ----

    def parse(self) -> "A.Query | A.SetOp":
        node = self._setop_chain()
        self.accept(";")
        if self.peek().kind != "EOF":
            t = self.peek()
            raise ParseError(f"trailing input at {t.pos}: {t.text!r}")
        return node

    def _setop_chain(self) -> "A.Query | A.SetOp":
        """UNION / EXCEPT level — left-associative over INTERSECT-bound
        operands (reference: gram.y:17089-17094 with PostgreSQL's
        %left precedence: INTERSECT binds tighter)."""
        node = self._intersect_chain()
        while True:
            if self.accept_kw("union"):
                op = "union"
            elif self.accept_kw("except"):
                op = "except"
            else:
                return node
            node = A.SetOp(op, bool(self.accept_kw("all")),
                           node, self._intersect_chain())

    def _intersect_chain(self) -> "A.Query | A.SetOp":
        node = self.parse_single_query()
        while self.accept_kw("intersect"):
            node = A.SetOp("intersect", bool(self.accept_kw("all")),
                           node, self.parse_single_query())
        return node

    def parse_single_query(self) -> A.Query:
        clauses: list[A.Clause] = []
        while True:
            t = self.peek()
            if t.kind != "KEYWORD":
                break
            kw = t.lower()
            if kw == "optional":
                self.next()
                self.expect_kw("match")
                clauses.append(self.parse_match(optional=True))
            elif kw == "match":
                self.next()
                clauses.append(self.parse_match(optional=False))
            elif kw == "unwind":
                self.next()
                e = self.parse_expr()
                self.expect_kw("as")
                clauses.append(A.Unwind(e, self.ident()))
            elif kw == "with":
                self.next()
                clauses.append(self.parse_projection("with"))
            elif kw == "return":
                self.next()
                clauses.append(self.parse_projection("return"))
            elif kw == "create":
                self.next()
                clauses.append(A.Create(self.parse_pattern_list()))
            elif kw == "merge":
                self.next()
                clauses.append(self.parse_merge())
            elif kw == "set":
                self.next()
                clauses.append(A.SetClause(self.parse_set_items()))
            elif kw == "remove":
                self.next()
                clauses.append(A.RemoveClause(self.parse_remove_items()))
            elif kw == "delete":
                self.next()
                clauses.append(A.Delete(self.parse_expr_list(), detach=False))
            elif kw == "detach":
                self.next()
                self.expect_kw("delete")
                clauses.append(A.Delete(self.parse_expr_list(), detach=True))
            elif kw == "load":
                self.next()
                self.expect_kw("from")
                table = self.ident()
                self.expect_kw("as")
                clauses.append(A.LoadClause(table, self.ident()))
            else:
                break
        if not clauses:
            t = self.peek()
            raise ParseError(f"expected a clause at {t.pos}, got {t.text!r}")
        return A.Query(clauses)

    # ---- clauses ----

    def parse_match(self, optional: bool) -> A.Match:
        patterns = self.parse_pattern_list()
        where = None
        if self.accept_kw("where"):
            where = self.parse_expr()
        return A.Match(patterns, optional=optional, where=where)

    def parse_projection(self, kind: str) -> A.Projection:
        distinct = bool(self.accept_kw("distinct"))
        star = False
        items: list[A.ReturnItem] = []
        if self.peek().kind == "*":
            self.next()
            star = True
            while self.accept(","):
                items.append(self.parse_return_item())
        else:
            items.append(self.parse_return_item())
            while self.accept(","):
                items.append(self.parse_return_item())
        order: list[A.SortItem] = []
        if self.accept_kw("order"):
            self.expect_kw("by")
            order.append(self.parse_sort_item())
            while self.accept(","):
                order.append(self.parse_sort_item())
        skip = self.parse_expr() if self.accept_kw("skip") else None
        limit = self.parse_expr() if self.accept_kw("limit") else None
        where = None
        if kind == "with" and self.accept_kw("where"):
            where = self.parse_expr()
        return A.Projection(items, kind=kind, distinct=distinct, order=order,
                            skip=skip, limit=limit, where=where, star=star)

    def parse_return_item(self) -> A.ReturnItem:
        e = self.parse_expr()
        alias = None
        if self.accept_kw("as"):
            alias = self.ident()
        return A.ReturnItem(e, alias)

    def parse_sort_item(self) -> A.SortItem:
        e = self.parse_expr()
        asc = True
        if self.accept_kw("desc", "descending"):
            asc = False
        else:
            self.accept_kw("asc", "ascending")
        # opt_nulls_order (reference: gram.y:18957-18967 cypher_sort_item)
        nulls = None
        t = self.peek()
        if t.kind in ("IDENT", "KEYWORD") and t.lower() == "nulls":
            self.next()
            t2 = self.peek()
            if t2.kind in ("IDENT", "KEYWORD") and t2.lower() in ("first", "last"):
                self.next()
                nulls = t2.lower()
            else:
                raise ParseError(
                    f"expected FIRST or LAST after NULLS at {t2.pos}")
        return A.SortItem(e, asc, nulls)

    def parse_expr_list(self) -> list[A.Expr]:
        out = [self.parse_expr()]
        while self.accept(","):
            out.append(self.parse_expr())
        return out

    def parse_merge(self) -> A.Merge:
        pattern = self.parse_path_pattern()
        on_create: list[A.SetItem] = []
        on_match: list[A.SetItem] = []
        while self.accept_kw("on"):
            which = self.next()
            if which.lower() == "create":
                self.expect_kw("set")
                on_create.extend(self.parse_set_items())
            elif which.lower() == "match":
                self.expect_kw("set")
                on_match.extend(self.parse_set_items())
            else:
                raise ParseError(f"expected CREATE or MATCH after ON at {which.pos}")
        return A.Merge(pattern, on_create=on_create, on_match=on_match)

    def parse_set_items(self) -> list[A.SetItem]:
        items = [self.parse_set_item()]
        while self.accept(","):
            items.append(self.parse_set_item())
        return items

    def parse_set_item(self) -> A.SetItem:
        target = self.parse_postfix()
        if self.accept("+="):
            return A.SetItem(target, self.parse_expr(), op="add")
        self.expect("=")
        return A.SetItem(target, self.parse_expr(), op="set")

    def parse_remove_items(self) -> list[A.SetItem]:
        items = [A.SetItem(self.parse_postfix(), None, op="remove")]
        while self.accept(","):
            items.append(A.SetItem(self.parse_postfix(), None, op="remove"))
        return items

    # ---- patterns ----

    def parse_pattern_list(self) -> list[A.PathPattern]:
        pats = [self.parse_path_pattern()]
        while self.accept(","):
            pats.append(self.parse_path_pattern())
        return pats

    def parse_path_pattern(self) -> A.PathPattern:
        var = None
        # "p = <pattern>" path binding
        if self.peek().kind == "IDENT" and self.peek(1).kind == "=":
            var = self.next().text
            self.next()
        t = self.peek()
        if t.kind == "IDENT" and t.lower() in ("shortestpath", "allshortestpaths", "dijkstra"):
            return self.parse_pathfind(t.lower(), var)
        return self.parse_plain_pattern(var)

    def parse_pathfind(self, kind: str, var: str | None) -> A.PathPattern:
        self.next()  # consume function word
        self.expect("(")
        inner = self.parse_plain_pattern(None)
        weight = weight_var = qual = limit = None
        if kind == "dijkstra":
            # reference forms (gram.y:18548-18622): dijkstra(chain, w),
            # dijkstra(chain, w, qual), dijkstra(chain, w, LIMIT n);
            # extension: a bare identifier third arg binds the path
            # weight to a variable
            self.expect(",")
            weight = self.parse_expr()
            if self.accept(","):
                if self.accept_kw("limit"):
                    limit = self.parse_expr()
                elif self.peek().kind == "IDENT" and (
                        self.peek(1).kind == ")" or self.peek(1).lower() in ("limit", "where")):
                    weight_var = self.ident()
                else:
                    qual = self.parse_expr()
                    if self.accept(","):
                        weight_var = self.ident()
            if self.accept_kw("where"):
                qual = self.parse_expr()
            if self.accept_kw("limit"):
                limit = self.parse_expr()
        self.expect(")")
        inner.var = var
        inner.kind = "shortestpath" if kind == "shortestpath" else (
            "allshortestpaths" if kind == "allshortestpaths" else "dijkstra")
        inner.weight, inner.weight_var, inner.qual, inner.limit = weight, weight_var, qual, limit
        return inner

    def parse_plain_pattern(self, var: str | None) -> A.PathPattern:
        # parenthesized path pattern `((u)-[..]->(v))` (reference
        # grammar nests cypher_path in parens; cypher_dml.sql:1394
        # AG-254 fixtures use this form). Backtrack if the outer paren
        # turns out to be a plain node.
        if self.peek().kind == "(" and self.peek(1).kind == "(":
            save = self.i
            self.next()
            try:
                elements: list = [self.parse_node()]
                while self.peek().kind in ("-", "<-"):
                    rel = self.parse_rel()
                    elements.append(rel)
                    elements.append(self.parse_node())
                self.expect(")")
                if len(elements) > 1:
                    # a rel chain may continue after the group
                    while self.peek().kind in ("-", "<-"):
                        rel = self.parse_rel()
                        elements.append(rel)
                        elements.append(self.parse_node())
                    return A.PathPattern(var, elements)
                self.i = save  # `((n))`-style: re-parse as a plain node
            except ParseError:
                self.i = save
        elements = [self.parse_node()]
        while self.peek().kind in ("-", "<-"):
            rel = self.parse_rel()
            node = self.parse_node()
            elements.append(rel)
            elements.append(node)
        return A.PathPattern(var, elements)

    def parse_node(self) -> A.NodePat:
        self.expect("(")
        var = None
        labels: list[str] = []
        props = None
        only = False
        t = self.peek()
        if t.kind == "IDENT" or (t.kind == "KEYWORD" and t.lower() not in ("only",) and self.peek(1).kind in (":", ")", "{")):
            var = self.ident()
        while self.accept(":"):
            if self.accept_kw("only"):
                only = True
            labels.append(self.ident())
        if self.peek().kind == "KEYWORD" and self.peek().lower() == "only":
            # canonical reference form: label BEFORE the modifier
            # (gram.y:18643-18651 — bare ONLY without a label errors)
            self.next()
            if not labels:
                raise ParseError("ONLY must have one label preceding it")
            only = True
        if self.peek().kind == "{":
            props = self.parse_map_literal()
        elif self.peek().kind == "PARAM":
            p = self.next()
            props = A.MapLit([("__param__", A.Param(p.text))])
        elif self.peek().kind == "=":
            # whole-map assignment `(:v2 =properties(a))` — the node's
            # property map IS the expression (cypher_eager.sql:48;
            # gram.y cypher_prop_map_opt '=' expression)
            self.next()
            props = A.MapLit([("__copy__", self.parse_expr())])
        self.expect(")")
        return A.NodePat(var, labels, props, only=only)

    def parse_rel(self) -> A.RelPat:
        left = self.next()  # '-' or '<-'
        direction = "in" if left.kind == "<-" else None
        var = None
        types: list[str] = []
        props = None
        minhops = maxhops = None
        varlen = False
        only = False
        if self.accept("["):
            t = self.peek()
            if t.kind in ("IDENT",) or (t.kind == "KEYWORD" and self.peek(1).kind in (":", "]", "*", "{")):
                if t.kind != "KEYWORD" or self.peek(1).kind in (":", "]", "*", "{"):
                    var = self.ident()
            if self.accept(":"):
                if self.accept_kw("only"):
                    only = True
                types.append(self.ident())
                while self.accept("|"):
                    self.accept(":")
                    types.append(self.ident())
            if self.peek().kind == "KEYWORD" and self.peek().lower() == "only":
                self.next()
                if not types:
                    raise ParseError("ONLY must have one label preceding it")
                only = True
            if self.accept("*"):
                varlen = True
                if self.peek().kind == "INT":
                    minhops = int(self.next().text)
                    if self.accept(".."):
                        maxhops = int(self.next().text) if self.peek().kind == "INT" else None
                    else:
                        maxhops = minhops  # *n = exactly n
                elif self.accept(".."):
                    minhops = 1
                    maxhops = int(self.next().text) if self.peek().kind == "INT" else None
                else:
                    minhops, maxhops = 1, None
            if self.peek().kind == "{":
                props = self.parse_map_literal()
            self.expect("]")
        right = self.next()
        if right.kind == "->":
            # <-[..]-> collapses to undirected: the reference ORs both
            # direction bits then resets to DIR_NONE (gram.y:18670-18675)
            direction = "undir" if direction == "in" else "out"
        elif right.kind == "-":
            direction = direction or "undir"
        else:
            raise ParseError(f"expected -> or - after relationship at {right.pos}")
        return A.RelPat(var, types, direction, props=props, minhops=minhops,
                        maxhops=maxhops, varlen=varlen, only=only)

    def parse_map_literal(self) -> A.MapLit:
        self.expect("{")
        items: list[tuple[str, A.Expr]] = []
        if self.peek().kind != "}":
            while True:
                key = self.map_key()
                self.expect(":")
                items.append((key, self.parse_expr()))
                if not self.accept(","):
                    break
        self.expect("}")
        return A.MapLit(items)

    def map_key(self) -> str:
        t = self.peek()
        if t.kind in ("IDENT", "KEYWORD", "STRING"):
            self.next()
            return t.text
        raise ParseError(f"expected map key at {t.pos}")

    # ---- expressions (precedence cascade) ----

    def parse_expr(self) -> A.Expr:
        return self.parse_or()

    def parse_or(self) -> A.Expr:
        left = self.parse_xor()
        if not self.peek_kw("or"):
            return left
        args = [left]
        while self.accept_kw("or"):
            args.append(self.parse_xor())
        return A.BoolOp("or", args)

    def parse_xor(self) -> A.Expr:
        left = self.parse_and()
        if not self.peek_kw("xor"):
            return left
        args = [left]
        while self.accept_kw("xor"):
            args.append(self.parse_and())
        return A.BoolOp("xor", args)

    def parse_and(self) -> A.Expr:
        left = self.parse_not()
        if not self.peek_kw("and"):
            return left
        args = [left]
        while self.accept_kw("and"):
            args.append(self.parse_not())
        return A.BoolOp("and", args)

    def parse_not(self) -> A.Expr:
        if self.accept_kw("not"):
            return A.Not(self.parse_not())
        return self.parse_comparison()

    CMP_OPS = ("=", "<>", "<", ">", "<=", ">=")

    def parse_comparison(self) -> A.Expr:
        left = self.parse_additive()
        # postfix predicates + (chained) comparisons
        parts: list[A.Expr] = []
        cur = left
        while True:
            t = self.peek()
            if t.kind in self.CMP_OPS:
                op = self.next().kind
                right = self.parse_additive()
                parts.append(A.Cmp(op, cur, right))
                cur = right
                continue
            if t.kind == "=~":
                self.next()
                parts.append(A.StringOp("regex", cur, self.parse_additive()))
                break
            if self.peek_kw("in"):
                self.next()
                parts.append(A.InList(cur, self.parse_additive()))
                break
            if self.peek_kw("starts"):
                self.next()
                self.expect_kw("with")
                parts.append(A.StringOp("starts_with", cur, self.parse_additive()))
                break
            if self.peek_kw("ends"):
                self.next()
                self.expect_kw("with")
                parts.append(A.StringOp("ends_with", cur, self.parse_additive()))
                break
            if self.peek_kw("contains"):
                self.next()
                parts.append(A.StringOp("contains", cur, self.parse_additive()))
                break
            # PostgreSQL a_expr pattern ops inside Cypher
            # (gram.y:13560-13640): [NOT] LIKE/ILIKE/SIMILAR TO
            # [ESCAPE e]
            neg = ""
            if self.peek_kw("not") and self.peek_kw(
                    "like", "ilike", "similar", "between", off=1):
                self.next()
                neg = "not_"
            if self.peek_kw("between"):
                # a [NOT] BETWEEN [SYMMETRIC] x AND y (gram.y a_expr):
                # desugared exactly as PostgreSQL does — three-valued
                # logic is preserved by the AND/OR composition
                self.next()
                sym = bool(self.accept_kw("symmetric"))
                if not sym:
                    self.accept_kw("asymmetric")
                lo = self.parse_additive()
                self.expect_kw("and")
                hi = self.parse_additive()
                rng: A.Expr = A.BoolOp(
                    "and", [A.Cmp(">=", cur, lo), A.Cmp("<=", cur, hi)])
                if sym:
                    rng = A.BoolOp("or", [rng, A.BoolOp(
                        "and", [A.Cmp(">=", cur, hi), A.Cmp("<=", cur, lo)])])
                parts.append(A.Not(rng) if neg else rng)
                break
            if self.peek_kw("like", "ilike"):
                op = self.next().lower()
                right = self.parse_additive()
                parts.append(A.StringOp(neg + op, cur, right,
                                        escape=self._parse_escape()))
                break
            if self.peek_kw("similar"):
                self.next()
                self.expect_kw("to")
                right = self.parse_additive()
                parts.append(A.StringOp(neg + "similar", cur, right,
                                        escape=self._parse_escape()))
                break
            if self.peek_kw("is"):
                self.next()
                neg_is = bool(self.accept_kw("not"))
                if self.accept_kw("distinct"):
                    self.expect_kw("from")
                    parts.append(A.DistinctFrom(
                        cur, self.parse_additive(), negated=neg_is))
                    break
                # IS [NOT] TRUE/FALSE (null-safe: NULL IS TRUE = false)
                # and IS [NOT] UNKNOWN (= IS NULL on booleans) —
                # gram.y a_expr BooleanTest productions
                if self.accept_kw("true"):
                    parts.append(A.DistinctFrom(
                        cur, A.Lit(True), negated=not neg_is))
                    break
                if self.accept_kw("false"):
                    parts.append(A.DistinctFrom(
                        cur, A.Lit(False), negated=not neg_is))
                    break
                if self.accept_kw("unknown"):
                    parts.append(A.IsNull(cur, negated=neg_is))
                    break
                self.expect_kw("null")
                parts.append(A.IsNull(cur, negated=neg_is))
                break
            break
        if not parts:
            return left
        if len(parts) == 1:
            return parts[0]
        return A.BoolOp("and", parts)

    def _parse_escape(self) -> "A.Expr | None":
        if self.accept_kw("escape"):
            return self.parse_additive()
        return None

    def parse_additive(self) -> A.Expr:
        left = self.parse_multiplicative()
        while True:
            t = self.peek()
            if t.kind in ("+", "-"):
                self.next()
                left = A.BinOp(t.kind, left, self.parse_multiplicative())
            elif t.kind == "||":
                self.next()
                left = A.BinOp("||", left, self.parse_multiplicative())
            else:
                return left

    def parse_multiplicative(self) -> A.Expr:
        left = self.parse_power()
        while self.peek().kind in ("*", "/", "%"):
            op = self.next().kind
            left = A.BinOp(op, left, self.parse_power())
        return left

    def parse_power(self) -> A.Expr:
        base = self.parse_unary()
        if self.peek().kind == "^":
            self.next()
            return A.BinOp("^", base, self.parse_power())  # right-assoc
        return base

    def parse_unary(self) -> A.Expr:
        t = self.peek()
        if t.kind == "-":
            self.next()
            operand = self.parse_unary()
            if isinstance(operand, A.Lit) and isinstance(operand.value, (int, float)):
                return A.Lit(-operand.value)
            return A.UnaryOp("-", operand)
        if t.kind == "+":
            self.next()
            return self.parse_unary()
        return self.parse_postfix()

    def parse_postfix(self) -> A.Expr:
        e = self.parse_atom()
        while True:
            t = self.peek()
            if t.kind == ".":
                self.next()
                e = A.Prop(e, self.ident())
            elif t.kind == "::":
                self.next()
                e = A.Cast(e, self.ident().lower())
            elif t.kind == "[":
                self.next()
                lo = None
                if self.peek().kind != ".." and self.peek().kind != "]":
                    lo = self.parse_expr()
                if self.accept(".."):
                    hi = None
                    if self.peek().kind != "]":
                        hi = self.parse_expr()
                    self.expect("]")
                    e = A.Slice(e, lo, hi)
                else:
                    self.expect("]")
                    if lo is None:
                        raise ParseError(f"empty subscript at {t.pos}")
                    e = A.Index(e, lo)
            else:
                return e

    def parse_atom(self) -> A.Expr:
        t = self.peek()
        if t.kind == "INT":
            self.next()
            return A.Lit(int(t.text))
        if t.kind == "FLOAT":
            self.next()
            return A.Lit(float(t.text))
        if t.kind == "STRING":
            self.next()
            return A.Lit(t.text)
        if t.kind == "PARAM":
            self.next()
            return A.Param(t.text)
        if t.kind == "KEYWORD":
            kw = t.lower()
            if kw == "null":
                self.next()
                return A.Lit(None)
            if kw == "true":
                self.next()
                return A.Lit(True)
            if kw == "false":
                self.next()
                return A.Lit(False)
            if kw == "case":
                return self.parse_case()
            if kw == "count" and self.peek(1).kind == "(":
                self.next()
                self.next()
                if self.peek().kind == "*":
                    self.next()
                    self.expect(")")
                    return A.FuncCall("count", [], star=True)
                distinct = bool(self.accept_kw("distinct"))
                arg = self.parse_expr()
                self.expect(")")
                return A.FuncCall("count", [arg], distinct=distinct)
            if kw in ("all", "any", "none", "single") and self.peek(1).kind == "(":
                self.next()
                self.next()
                var = self.ident()
                self.expect_kw("in")
                source = self.parse_expr()
                self.expect_kw("where")
                pred = self.parse_expr()
                self.expect(")")
                return A.Quantifier(kw, var, source, pred)
            if kw == "exists" and self.peek(1).kind == "(":
                self.next()
                self.next()
                if self.peek().kind == "(":
                    pat = self.parse_plain_pattern(None)
                    self.expect(")")
                    return A.PatternPred(pat, "exists")
                inner = self.parse_expr()
                self.expect(")")
                if isinstance(inner, A.Prop):
                    return A.IsNull(inner, negated=True)
                return A.FuncCall("exists", [inner])
            if kw == "not":
                self.next()
                return A.Not(self.parse_comparison())
            # keyword usable as function name or bare identifier
            if self.peek(1).kind == "(":
                return self.parse_func_call()
            self.next()
            return A.Var(t.text)
        if t.kind == "IDENT":
            if self.peek(1).kind == "(":
                low = t.lower()
                if low in ("shortestpath", "allshortestpaths"):
                    # expression-position pathfind returns the path value
                    # (NULL when unreachable), NOT a boolean
                    # (cypher_shortestpath2.sql:334-339)
                    pat = self.parse_pathfind(low, None)
                    return A.PathFindExpr(pat)
                if low == "dijkstra":
                    pat = self.parse_pathfind(low, None)
                    return A.PatternPred(pat, "exists")
                if low == "size" and self.peek(2).kind == "(":
                    # size((a)-[:T]->(b)) — pattern match count
                    # (reference: CSP_SIZE, parsenodes.h:3839-3851)
                    save = self.i
                    self.next()
                    self.next()
                    if self._looks_like_pattern():
                        pat = self.parse_plain_pattern(None)
                        self.expect(")")
                        return A.PatternPred(pat, "size")
                    self.i = save  # plain size(expr): re-parse as func call
                return self.parse_func_call()
            self.next()
            return A.Var(t.text)
        if t.kind == "(":
            # SQL scalar subquery in a Cypher expression (reference:
            # hybrid queries, cypher_dml.sql:50-52, cypher_expr.sql:262)
            if self.peek(1).kind in ("IDENT", "KEYWORD") and self.peek(1).lower() == "select":
                start = self.peek(1).pos
                self.next()
                depth = 1
                while depth:
                    tok = self.next()
                    if tok.kind == "EOF":
                        raise ParseError("unterminated SQL subquery")
                    if tok.kind == "(":
                        depth += 1
                    elif tok.kind == ")":
                        depth -= 1
                return A.ScalarSubquery(self.src[start:tok.pos])
            # pattern-as-predicate:  (a)-[:T]->(b)  — detect by lookahead
            if self._looks_like_pattern():
                pat = self.parse_plain_pattern(None)
                return A.PatternPred(pat, "exists")
            self.next()
            e = self.parse_expr()
            self.expect(")")
            return e
        if t.kind == "[":
            return self.parse_list_or_comprehension()
        if t.kind == "{":
            return self.parse_map_literal()
        raise ParseError(f"unexpected token {t.text!r} at {t.pos}")

    def _looks_like_pattern(self) -> bool:
        """At '(' — is this a path pattern like (a)-[...]->(b) or (a:L)?

        A bare '-' after the closing paren is NOT enough: '(a + b) - c'
        is subtraction (gram.y resolves the same ambiguity by
        precedence). After ')', a pattern continuation must be '<-',
        '-[', or '--(' — anything else is an arithmetic follower."""
        def kind(j: int) -> str:
            return self.toks[j].kind if j < len(self.toks) else "EOF"

        depth = 0
        j = self.i
        while j < len(self.toks):
            k = self.toks[j].kind
            if k == "(":
                depth += 1
            elif k == ")":
                depth -= 1
                if depth == 0:
                    nxt = kind(j + 1)
                    if nxt == "<-":
                        return True
                    if nxt != "-":
                        return False
                    nxt2 = kind(j + 2)
                    # '-->' lexes as '-' + '->' so a trailing '->' is a
                    # valid bare-arrow continuation: (a)-->(b).
                    return (
                        nxt2 in ("[", "->")
                        or (nxt2 == "-" and kind(j + 3) == "(")
                    )
            elif depth == 1 and k == ":" and j == self.i + 2:
                return True  # (x:Label ...
            elif depth >= 1 and k in (";", "EOF"):
                return False
            j += 1
        return False

    def parse_func_call(self) -> A.Expr:
        name = self.next().text
        self.expect("(")
        distinct = bool(self.accept_kw("distinct"))
        args: list[A.Expr] = []
        if self.peek().kind != ")":
            args.append(self.parse_expr())
            while self.accept(","):
                args.append(self.parse_expr())
        self.expect(")")
        return A.FuncCall(name.lower(), args, distinct=distinct)

    def parse_case(self) -> A.Expr:
        self.expect_kw("case")
        operand = None
        if not self.peek_kw("when"):
            operand = self.parse_expr()
        whens: list[tuple[A.Expr, A.Expr]] = []
        while self.accept_kw("when"):
            cond = self.parse_expr()
            self.expect_kw("then")
            whens.append((cond, self.parse_expr()))
        default = None
        if self.accept_kw("else"):
            default = self.parse_expr()
        self.expect_kw("end")
        return A.Case(operand, whens, default)

    def parse_list_or_comprehension(self) -> A.Expr:
        self.expect("[")
        if self.peek().kind == "]":
            self.next()
            return A.ListLit([])
        # lookahead for comprehension: IDENT IN ...
        if self.peek().kind in ("IDENT",) and self.peek_kw("in", off=1):
            var = self.next().text
            self.next()  # IN
            source = self.parse_expr()
            where = None
            proj = None
            if self.accept_kw("where"):
                where = self.parse_expr()
            if self.accept("|"):
                proj = self.parse_expr()
            self.expect("]")
            return A.ListComp(var, source, where, proj)
        items = [self.parse_expr()]
        while self.accept(","):
            items.append(self.parse_expr())
        self.expect("]")
        return A.ListLit(items)


def parse_cypher(text: str) -> "A.Query | A.SetOp":
    return Parser(tokenize(text), src=text).parse()
