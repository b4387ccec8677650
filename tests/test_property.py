"""Property-based tests (hypothesis) — randomized coverage beyond the
golden-file corpus. The reference relies on pg_regress goldens only
(SURVEY.md §5); randomized invariants are our addition, aimed at the
encode/decode and expression-coercion layers where off-by-one bugs
hide. Spark-backed properties batch all generated examples into ONE
DataFrame action per property so the suite stays fast."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from agensgraph_spark.graphid import (
    LABID_MAX,
    LOCID_MASK,
    graphid_col,
    graphid_labid,
    graphid_locid,
    graphid_range,
    labid_col,
    locid_col,
    make_graphid,
)

labids = st.integers(min_value=0, max_value=LABID_MAX)
locids = st.integers(min_value=0, max_value=LOCID_MASK)


@given(labids, locids)
def test_graphid_roundtrip(labid, locid):
    gid = make_graphid(labid, locid)
    assert graphid_labid(gid) == labid
    assert graphid_locid(gid) == locid


@given(labids, locids)
def test_graphid_within_label_range(labid, locid):
    lo, hi = graphid_range(labid)
    assert lo <= make_graphid(labid, locid) <= hi


@given(st.lists(st.tuples(labids, locids), min_size=1, max_size=50))
def test_graphid_order_is_label_major(pairs):
    # sorting by gid sorts by (labid, locid) — the invariant labid-range
    # pruning depends on
    gids = [make_graphid(a, b) for a, b in pairs]
    assert sorted(gids) == [make_graphid(a, b) for a, b in sorted(pairs)]


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(labids, locids), min_size=1, max_size=200))
def test_graphid_column_encode_matches_python(spark, pairs):
    # one Spark action for the whole example batch
    df = spark.createDataFrame(
        [(a, b) for a, b in pairs], schema="labid long, locid long")
    got = df.select(
        (F.col("labid") * F.lit(1 << 48) + F.col("locid")).alias("gid"),
    ).collect()
    exp = [make_graphid(a, b) for a, b in pairs]
    assert [r["gid"] for r in got] == exp


@settings(max_examples=3, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1),
                min_size=1, max_size=200))
def test_labid_locid_columns_match_python(spark, gids):
    df = spark.createDataFrame([(g,) for g in gids], schema="gid long")
    got = df.select(labid_col(F.col("gid")).alias("lab"),
                    locid_col(F.col("gid")).alias("loc")).collect()
    for r, g in zip(got, gids):
        assert r["lab"] == graphid_labid(g)
        assert r["loc"] == graphid_locid(g)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=60),
       st.integers(min_value=0, max_value=10),
       st.integers(min_value=0, max_value=10))
def test_cypher_substring_zero_based(engine, texts, start, length):
    """Cypher substring is 0-based (reference:
    parse_cypher_expr.c:929-962; cypher_substring.sql) — must equal
    Python's text[start:start+length] for ASCII-safe inputs."""
    texts = ["".join(ch for ch in t if ord(ch) < 128 and ch not in "'\\\"")
             for t in texts]
    rows = engine.cypher(
        "UNWIND $texts AS t RETURN substring(t, $s, $l) AS sub",
        params={"texts": texts, "s": start, "l": length}).collect()
    for r, t in zip(rows, texts):
        exp = t[start:start + length]
        assert (r["sub"] or "") == exp, (t, start, length)


# --- statement-level set operations (gram.y:17089-17094) ------------

@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(-5, 5), min_size=0, max_size=8),
       st.lists(st.integers(-5, 5), min_size=0, max_size=8),
       st.sampled_from(["union", "intersect", "except"]),
       st.booleans())
def test_setop_bag_semantics_match_python(spark, a, b, op, all_):
    """Cypher UNION/INTERSECT/EXCEPT [ALL] over arbitrary bags matches
    the SQL bag/set algebra computed in plain Python (multiset
    intersection/difference for ALL, set semantics otherwise)."""
    from collections import Counter

    from agensgraph_spark.cypher.compiler import CypherEngine
    eng = CypherEngine(spark)

    def leg(vals):
        if not vals:
            return "UNWIND [] AS q WITH q WHERE false RETURN 0 AS x"
        return f"UNWIND {list(vals)} AS x RETURN x"

    kw = op.upper() + (" ALL" if all_ else "")
    got = sorted(r["x"] for r in
                 eng.cypher(f"{leg(a)} {kw} {leg(b)}").collect())
    ca, cb = Counter(a), Counter(b)
    if op == "union":
        exp = a + b if all_ else sorted(set(a) | set(b))
    elif op == "intersect":
        exp = list((ca & cb).elements()) if all_ else sorted(set(a) & set(b))
    else:
        exp = list((ca - cb).elements()) if all_ else sorted(set(a) - set(b))
    assert got == sorted(exp)
