"""SIMILAR TO translation + regexp_match (agensgraph_spark.sqlfuncs).

The translator is pinned against the reference's documented expansion
(regexp.c:similar_escape_internal) and behavior-checked via Spark on
real rows; tests/test_oracle_parity_tail.py additionally replays the
sql_similar_to / sql_regexp_match workload rows against DuckDB."""

import pytest
from pyspark.sql import functions as F

from agensgraph_spark.sqlfuncs import (
    regexp_match, similar_escape, similar_to, substring_similar)


# --- pure translation pins (no Spark) ---

@pytest.mark.parametrize("pat,esc,expected", [
    ("abc", "\\", "^(?:abc)$"),
    ("%(b|d)%", "\\", "^(?:.*(?:b|d).*)$"),          # PG docs example
    ("bl_e%", "\\", "^(?:bl.e.*)$"),
    ("50\\%", "\\", "^(?:50\\%)$"),                   # escaped wildcard
    ("a.b^c$d", "\\", "^(?:a\\.b\\^c\\$d)$"),         # regex literals
    ("[%_]x", "\\", "^(?:[%_]x)$"),                   # class: no wildcards
    ("a[]]b", "\\", "^(?:a[]]b)$"),                   # ] first in class
    ("x\\d+", "\\", "^(?:x\\d+)$"),                   # POSIX class escape
    ("%#\"[a-z]+#\"", "#", "^(?:.*){1,1}?([a-z]+){1,1}(?:)$"),
    ("a%b", None, "^(?:a.*b)$"),                      # ESCAPE '' = none
    ("a|b{2}", "\\", "^(?:a|b{2})$"),                 # SQL regex passthru
])
def test_similar_escape_pins(pat, esc, expected):
    assert similar_escape(pat, esc) == expected


def test_similar_escape_errors():
    with pytest.raises(ValueError, match="one character"):
        similar_escape("a", "##")
    with pytest.raises(ValueError, match="two escape-double-quote"):
        similar_escape('#"a#"b#"c#"', "#")


# --- behavior on Spark rows ---

@pytest.fixture(scope="module")
def names(spark):
    rows = [(1, "cold widget"), (2, "blue rod"), (3, "large bolt"),
            (4, "bluee rod"), (5, "widget"), (6, "rod holder")]
    return spark.createDataFrame(rows, "id long, name string")


def test_similar_to_entire_string(names):
    # anchored: 'rod holder' contains 'rod' but doesn't END with it
    got = {r["id"] for r in
           names.filter(similar_to("name", "%(widget|rod)")).collect()}
    assert got == {1, 2, 4, 5}


def test_similar_to_underscore_and_class(names):
    got = {r["id"] for r in
           names.filter(similar_to("name", "bl_e [a-z]%")).collect()}
    assert got == {2}  # 'bluee' has two chars between bl and e


def test_substring_similar_last_word(names):
    rows = {r["id"]: r["w"] for r in names.select(
        "id", substring_similar("name", '%#"[a-z]+#"', "#").alias("w")
    ).collect()}
    assert rows[1] == "widget" and rows[3] == "bolt" and rows[6] == "holder"


def test_regexp_match_groups_and_null(names):
    rows = {r["id"]: r["m"] for r in names.select(
        "id", regexp_match("name", r"^(\w+) (\w+)$").alias("m")).collect()}
    assert rows[1] == ["cold", "widget"]
    assert rows[5] is None  # single word: no match -> NULL


def test_regexp_match_no_groups_whole_match(names):
    rows = {r["id"]: r["m"] for r in names.select(
        "id", regexp_match("name", r"b\w+").alias("m")).collect()}
    assert rows[2] == ["blue"] and rows[3] == ["bolt"]
    assert rows[1] is None


def test_substring_similar_no_separators_whole_match(spark):
    """A pattern with no escape-double-quote separators has no capture
    group; the reference acts as though part1/part3 are empty —
    SUBSTRING returns the whole match (regexp.c:729-733)."""
    df = spark.createDataFrame([("abcdef",), ("xyz",)], ["s"])
    got = {r["s"]: r["m"] for r in df.select(
        "s", substring_similar(F.col("s"), "abc%").alias("m")).collect()}
    assert got == {"abcdef": "abcdef", "xyz": None}
    # one separator: part3 acts empty — part2 runs to the end
    got1 = df.select(
        substring_similar(F.col("s"), 'ab\\"c%').alias("m")).collect()
    assert {r["m"] for r in got1} == {"cdef", None}


def test_regexp_match_java_only_pattern(spark):
    """Group counting is lexical, so a pattern valid in Java regex but
    not Python (possessive quantifier) must plan and match."""
    df = spark.createDataFrame([("aaab",), ("b",), ("c",)], ["s"])
    got = [r["m"] for r in df.select(
        regexp_match(F.col("s"), "(a*+)b").alias("m")).collect()]
    assert got == [["aaa"], [""], None]
    # named group (capturing in Java), lookbehind (not capturing)
    got2 = df.select(
        regexp_match(F.col("s"), "(?<as>a+)(?=b)").alias("m")).collect()
    assert [r["m"] for r in got2] == [["aaa"], None, None]
