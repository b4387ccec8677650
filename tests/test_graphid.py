from agensgraph_spark.graphid import (
    graphid_labid,
    graphid_locid,
    graphid_range,
    make_graphid,
)


def test_roundtrip():
    gid = make_graphid(5, 123456789)
    assert graphid_labid(gid) == 5
    assert graphid_locid(gid) == 123456789


def test_range():
    lo, hi = graphid_range(3)
    assert graphid_labid(lo) == 3 and graphid_labid(hi) == 3
    assert graphid_locid(lo) == 0
    assert graphid_locid(hi) == (1 << 48) - 1


def test_ordering_by_label():
    # all ids of label 2 sort before all ids of label 3
    assert make_graphid(2, (1 << 48) - 1) < make_graphid(3, 0)
