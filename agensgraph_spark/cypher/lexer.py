"""Cypher tokenizer.

Hand-rolled (no parser-generator dependency). Token kinds: IDENT,
KEYWORD (case-insensitive match against KEYWORDS but original text
kept), INT, FLOAT, STRING, PARAM, punctuation/operators (kind == text).
Integers accept decimal, hex 0x…, octal 0o…/0… (reference grammar
accepts hex/octal literals; tests cypher_expr.sql).
"""

from __future__ import annotations

from dataclasses import dataclass

KEYWORDS = {
    "match", "optional", "where", "return", "with", "unwind", "as", "distinct",
    "order", "by", "asc", "ascending", "desc", "descending", "skip", "limit",
    "and", "or", "xor", "not", "in", "is", "null", "true", "false",
    "starts", "ends", "contains", "create", "merge", "set", "remove", "delete",
    "detach", "on", "union", "intersect", "except", "all", "any", "none",
    "single", "exists",
    "case", "when", "then", "else", "end", "count", "load", "from", "only",
    # PostgreSQL a_expr pattern operators (gram.y:13560-13640)
    "like", "ilike", "similar", "to", "escape",
    # PostgreSQL a_expr range / null-safe comparison
    "between", "symmetric", "asymmetric", "unknown",
}

TWO_CHAR = ("<=", ">=", "<>", "=~", "->", "<-", "+=", "..", "||", "::")
ONE_CHAR = "()[]{},:;.|=<>+-*/%^$"


@dataclass
class Token:
    kind: str   # IDENT KEYWORD INT FLOAT STRING PARAM or the op text
    text: str
    pos: int

    def lower(self) -> str:
        return self.text.lower()


class LexError(ValueError):
    pass


def tokenize(src: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            if j < 0:
                raise LexError(f"unterminated comment at {i}")
            i = j + 2
            continue
        if c in "'\"":
            quote, j, buf = c, i + 1, []
            while j < n:
                ch = src[j]
                if ch == "\\" and j + 1 < n:
                    nxt = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'", '"': '"'}.get(nxt, nxt))
                    j += 2
                    continue
                if ch == quote:
                    if j + 1 < n and src[j + 1] == quote:  # doubled quote escape
                        buf.append(quote)
                        j += 2
                        continue
                    break
                buf.append(ch)
                j += 1
            if j >= n:
                raise LexError(f"unterminated string at {i}")
            toks.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        if c == "`":
            j = src.find("`", i + 1)
            if j < 0:
                raise LexError(f"unterminated quoted identifier at {i}")
            toks.append(Token("IDENT", src[i + 1:j], i))
            i = j + 1
            continue
        if c.isdigit():
            j = i
            is_float = False
            if c == "0" and i + 1 < n and src[i + 1] in "xX":
                j = i + 2
                while j < n and (src[j].isdigit() or src[j] in "abcdefABCDEF"):
                    j += 1
                toks.append(Token("INT", str(int(src[i:j], 16)), i))
                i = j
                continue
            if c == "0" and i + 1 < n and src[i + 1] in "oO":
                j = i + 2
                while j < n and src[j] in "01234567":
                    j += 1
                toks.append(Token("INT", str(int(src[i + 2:j], 8)), i))
                i = j
                continue
            while j < n and src[j].isdigit():
                j += 1
            # '..' after a number is a range, not a decimal point
            if j < n and src[j] == "." and not (j + 1 < n and src[j + 1] == ".") and j + 1 < n and src[j + 1].isdigit():
                is_float = True
                j += 1
                while j < n and src[j].isdigit():
                    j += 1
            if j < n and src[j] in "eE":
                k = j + 1
                if k < n and src[k] in "+-":
                    k += 1
                if k < n and src[k].isdigit():
                    is_float = True
                    j = k
                    while j < n and src[j].isdigit():
                        j += 1
            txt = src[i:j]
            if not is_float and txt.startswith("0") and len(txt) > 1 and txt.isdigit():
                # leading-zero octal (PostgreSQL-ish); fall back to decimal on 8/9
                try:
                    txt = str(int(txt, 8))
                except ValueError:
                    pass
            toks.append(Token("FLOAT" if is_float else "INT", txt, i))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            text = src[i:j]
            kind = "KEYWORD" if text.lower() in KEYWORDS else "IDENT"
            if kind == "IDENT":
                # PG scanner parity: unquoted identifiers fold to
                # lowercase (scan.l downcase_identifier) — the
                # reference's own regression suite depends on it
                # (cypher_dml2.sql: exists((n)-[:MARRIED]->()) matches
                # the edge created as :married). Backtick-quoted
                # identifiers (above) preserve case, the analog of
                # PG's double-quoted idents.
                text = text.lower()
            toks.append(Token(kind, text, i))
            i = j
            continue
        if c == "$":
            j = i + 1
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            if j == i + 1:
                raise LexError(f"bad parameter at {i}")
            toks.append(Token("PARAM", src[i + 1:j], i))
            i = j
            continue
        two = src[i:i + 2]
        if two in TWO_CHAR:
            toks.append(Token(two, two, i))
            i += 2
            continue
        if c in ONE_CHAR:
            toks.append(Token(c, c, i))
            i += 1
            continue
        raise LexError(f"unexpected character {c!r} at {i}")
    toks.append(Token("EOF", "", n))
    return toks
