"""PostgreSQL-compatible SQL scalar helpers that Spark SQL lacks.

``SIMILAR TO`` and friends: Spark has LIKE and RLIKE but not the SQL
standard's SIMILAR TO pattern language (SQL regex: ``%``/``_``
wildcards plus POSIX-ish ``|``, ``*``, ``+``, ``?``, ``{m,n}``,
``(...)``, ``[...]``). PostgreSQL implements it by escaping the
pattern into a plain regex and delegating to the regex engine
(reference: src/backend/utils/adt/regexp.c:similar_escape_internal,
like.c for the LIKE fast path); ``similar_escape`` below is a
behavior-faithful reimplementation of that translation, and
``similar_to`` applies it through ``rlike`` — JVM-side regex, no UDF.

``regexp_match``: PostgreSQL's first-match capture-group array
(reference: regexp.c:regexp_match). Composed from ``rlike`` +
``regexp_extract`` per group — pure column expressions.

Divergences (documented, not silent):
- Escaped alphanumerics pass through as ``\\c`` in both engines, so
  POSIX-class escapes like ``\\d`` work; Java regex and PostgreSQL ARE
  agree on the common classes but not exotica (``\\m``/``\\y`` word
  boundaries are PostgreSQL-only).
- ``regexp_match`` yields '' (not NULL) for a group that did not
  participate in the match — Spark's regexp_extract has no
  participated-vs-empty distinction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["similar_escape", "similar_to", "regexp_match",
           "substring_similar"]


def similar_escape(pattern: str, escape: str | None = "\\",
                   _lazy_part1: bool = False) -> str:
    """Translate a SQL SIMILAR TO pattern into an anchored regex —
    the same state machine as the reference's
    regexp.c:similar_escape_internal (incl. the escape-double-quote
    part separators SUBSTRING(str SIMILAR pat ESCAPE e) uses).

    ``escape=None`` (SQL: ESCAPE '') disables the escape character.

    ``_lazy_part1``: PostgreSQL's engine propagates the ``{1,1}?``
    non-greediness into the whole part1 subexpression; Java's does
    not, so for SUBSTRING evaluation ``%`` before the first separator
    is emitted as lazy ``.*?`` (boolean-match-equivalent; only capture
    positions differ — which is the point). The default (reference-
    faithful) output is what the translation pins test against.
    """
    return _similar_escape(pattern, escape, _lazy_part1)[0]


def _similar_escape(pattern: str, escape: str | None = "\\",
                    _lazy_part1: bool = False) -> tuple[str, int]:
    """similar_escape plus the separator count (0 or 2) — SUBSTRING
    needs to know whether the pattern had escape-double-quote
    separators at all (regexp.c: 'With none, we act as though part1
    and part3 are empty' — the whole match is the answer)."""
    if escape is not None and len(escape) != 1:
        raise ValueError("escape string must be empty or one character")
    out: list[str] = ["^(?:"]
    afterescape = False
    incharclass = False
    nquotes = 0
    for c in pattern:
        if afterescape:
            if c == '"' and not incharclass:
                # SUBSTRING part separators: part1 non-greedy, part2
                # capturing + greedy, part3 non-capturing (regexp.c's
                # ^(?:part1){1,1}?(part2){1,1}(?:part3)$ expansion)
                if nquotes == 0:
                    out.append("){1,1}?(")
                elif nquotes == 1:
                    out.append("){1,1}(?:")
                else:
                    raise ValueError(
                        "SQL regular expression may not contain more "
                        "than two escape-double-quote separators")
                nquotes += 1
            else:
                out.append("\\" + c)
            afterescape = False
        elif escape is not None and c == escape:
            afterescape = True
        elif incharclass:
            if c == "\\":
                out.append("\\")
            out.append(c)
            if c == "]":
                incharclass = False
        elif c == "[":
            out.append(c)
            incharclass = True
        elif c == "%":
            out.append(".*?" if _lazy_part1 and nquotes == 0 else ".*")
        elif c == "_":
            out.append(".")
        elif c == "(":
            # non-capturing, so user parens don't shift SUBSTRING's
            # capture group
            out.append("(?:")
        elif c in "\\.^$":
            out.append("\\" + c)
        else:
            out.append(c)
    out.append(")$")
    return "".join(out), nquotes


def similar_to(col: Column | str, pattern: str,
               escape: str | None = "\\") -> Column:
    """``col SIMILAR TO pattern [ESCAPE escape]`` as a boolean column:
    pattern must match the ENTIRE string (the translation anchors it).
    JVM-side rlike — pushdown/codegen-friendly, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(similar_escape(pattern, escape))


def substring_similar(col: Column | str, pattern: str,
                      escape: str | None = "\\") -> Column:
    """SQL standard ``SUBSTRING(string SIMILAR pattern ESCAPE esc)``
    (PostgreSQL's three-argument substring): the part of the string
    matched by the capture group between the two escape-double-quote
    separators. NULL when the pattern does not match (regexp_extract
    returns '' on no-match, so the rlike guard restores NULL).

    Part1 ``%`` is emitted lazy (see similar_escape._lazy_part1):
    Java regex does not propagate PostgreSQL's subexpression
    non-greediness, and SQL requires part1 to match the SMALLEST
    prefix. Non-``%`` greedy constructs in part1 keep Java
    semantics — a documented divergence.

    A pattern with NO separators has no capture group — the reference
    acts as though part1/part3 are empty (regexp.c:729-733), i.e. the
    whole match is the answer: extract group 0."""
    c = F.col(col) if isinstance(col, str) else col
    rx, nquotes = _similar_escape(pattern, escape, _lazy_part1=True)
    return F.when(c.rlike(rx), F.regexp_extract(c, rx, 1 if nquotes else 0))


def _count_capture_groups(pattern: str) -> int:
    """Capturing groups counted LEXICALLY (unescaped ``(`` not followed
    by ``?``, outside char classes; Java named groups ``(?<name>...)``
    count too) — NOT by compiling with Python's ``re``: matching runs
    in Java regex, and a pattern valid in Java but not Python (e.g.
    possessive ``a*+``) must not fail at plan-construction time."""
    n, i, incls = 0, 0, False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if incls:
            if ch == "]":
                incls = False
        elif ch == "[":
            incls = True
        elif ch == "(":
            nxt = pattern[i + 1:i + 2]
            if nxt != "?":
                n += 1
            elif (pattern[i + 2:i + 3] == "<"
                  and pattern[i + 3:i + 4] not in ("=", "!")):
                n += 1  # (?<name>...) — capturing in Java
        i += 1
    return n


def regexp_match(col: Column | str, pattern: str) -> Column:
    """PostgreSQL ``regexp_match(string, pattern)``: NULL when the
    pattern does not match anywhere in the string, else the array of
    capture-group texts of the FIRST match (the whole match when the
    pattern has no groups)."""
    c = F.col(col) if isinstance(col, str) else col
    ngroups = _count_capture_groups(pattern)
    idxs = range(1, ngroups + 1) if ngroups else (0,)
    return F.when(
        c.rlike(pattern),
        F.array(*[F.regexp_extract(c, pattern, i) for i in idxs]))
