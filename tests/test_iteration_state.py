"""Iteration-state hygiene for the path operators and cap visibility.

The loops in operators/paths.py are generational: each round retires
the superseded cached generation (GraphX-Pregel style), so a deep
search pins O(1) frames, not O(iterations). The caps (VLE hop clamp,
Dijkstra max_iters, LSH bucket drop) must WARN — the workload promises
no silent caps."""

import logging
import time

from pyspark.sql import functions as F

from agensgraph_spark.operators import paths as P
from agensgraph_spark.pipeline import dedup as D


def chain_edges(spark, n):
    return spark.createDataFrame(
        [(i, i + 1, 100 + i, 1.0) for i in range(n)],
        "src long, dst long, eid long, w double")


def n_cached(spark) -> int:
    """CacheManager entries (df.cache/persist) — the store that leaked
    a frame per iteration before generational retirement."""
    return spark._jsparkSession.sharedState().cacheManager().cachedData().size()


def test_dijkstra_bounded_cached_frames(spark):
    pairs = spark.createDataFrame([(0, 15)], "seed long, target long")
    before = n_cached(spark)
    out = P.dijkstra_paths(chain_edges(spark, 15), pairs)  # 15 relaxation rounds
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["len"] == 15 and rows[0]["weight"] == 15.0
    after = n_cached(spark)
    # final paths generation + endpoint pair set stay pinned; every
    # superseded generation and the edge pin must be gone
    assert after - before <= 3, (before, after)


def test_dijkstra_cached_frames_independent_of_depth(spark):
    deltas = []
    for n in (5, 12):
        pairs = spark.createDataFrame([(0, n)], "seed long, target long")
        before = n_cached(spark)
        P.dijkstra_paths(chain_edges(spark, n), pairs).collect()
        deltas.append(n_cached(spark) - before)
    assert deltas[1] - deltas[0] <= 1, deltas


def test_bfs_bounded_cached_frames(spark):
    pairs = spark.createDataFrame([(0, 10), (0, 7)], "seed long, target long")
    before = n_cached(spark)
    out = P.bfs_shortest(chain_edges(spark, 10), pairs, 1, 10)  # deep loop
    got = {(r["seed"], r["target"]): r["len"] for r in out.collect()}
    assert got == {(0, 10): 10, (0, 7): 7}
    after = n_cached(spark)
    # hits live in a checkpointed accumulator; frontier generations,
    # the pair set and the edge pin are all retired on exit
    assert after - before <= 1, (before, after)


def test_vle_result_survives_edge_unpersist(spark):
    seeds = spark.createDataFrame([(0,)], "seed long")
    out = P.vle_expand(chain_edges(spark, 6), seeds, 1, 6)
    assert out.count() == 6  # consumed after the edge pin was released


def test_vle_clamp_warns(spark, caplog):
    seeds = spark.createDataFrame([(0,)], "seed long")
    with caplog.at_level(logging.WARNING, logger="agensgraph_spark.operators.paths"):
        P.vle_expand(chain_edges(spark, 3), seeds, 1, 100)
    assert any("clamped" in r.getMessage() for r in caplog.records)


def test_dijkstra_max_iters_warns(spark, caplog):
    pairs = spark.createDataFrame([(0, 6)], "seed long, target long")
    with caplog.at_level(logging.WARNING, logger="agensgraph_spark.operators.paths"):
        out = P.dijkstra_paths(chain_edges(spark, 6), pairs, max_iters=3)
        out.collect()
    assert any("max_iters" in r.getMessage() for r in caplog.records)


def _dup_docs(spark):
    # four identical docs -> every band bucket has 4 members; with
    # max_bucket=2 all buckets are dropped and zero candidates emerge
    return spark.createDataFrame(
        [(i, "the same exact text in every copy of this document") for i in range(4)],
        "doc_id long, text string")


def _poll_records(caplog, needle, timeout=15.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if any(needle in r.getMessage() for r in caplog.records):
            return True
        time.sleep(0.2)
    return False


def test_lsh_dropped_bucket_warns(spark, caplog):
    """The in-band Observation warning (zero extra jobs). AQE drops
    observed metrics when 2+ shuffle stages sit above CollectMetrics
    (Spark 4.1 limitation, see dedup._warn_async) — assert the warning
    in the plan shape where Spark delivers it."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        with caplog.at_level(logging.WARNING, logger="agensgraph_spark.pipeline.dedup"):
            out = D.minhash_lsh_candidates(_dup_docs(spark), max_bucket=2,
                                           audit_cap=True)
            assert out.count() == 0
            assert _poll_records(caplog, "max_bucket")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_lsh_cap_audit_not_silent_under_aqe(spark, caplog):
    """Under AQE the watcher must still say SOMETHING: an info record
    pointing at the deterministic audit path."""
    with caplog.at_level(logging.INFO, logger="agensgraph_spark.pipeline.dedup"):
        out = D.minhash_lsh_candidates(_dup_docs(spark), max_bucket=2,
                                       audit_cap=True)
        assert out.count() == 0
        assert _poll_records(caplog, "lsh_skew_stats")


def test_lsh_cap_announced_by_default(spark, caplog):
    """With the counted audit off (default, hot path) the cap is still
    announced at build time — never silent."""
    with caplog.at_level(logging.INFO, logger="agensgraph_spark.pipeline.dedup"):
        D.minhash_lsh_candidates(_dup_docs(spark), max_bucket=2)
    assert any("skew cap" in r.getMessage() for r in caplog.records)


def test_lsh_skew_stats_counts_dropped(spark):
    row = D.lsh_skew_stats(_dup_docs(spark), max_bucket=2).collect()[0]
    assert row["n_dropped"] == 8  # every band's bucket holds all 4 docs
    assert row["max_bucket_size"] == 4
    row2 = D.lsh_skew_stats(_dup_docs(spark), max_bucket=10_000).collect()[0]
    assert row2["n_dropped"] == 0


def test_lsh_default_cap_keeps_buckets(spark):
    docs = spark.createDataFrame(
        [(i, "the same exact text in every copy of this document") for i in range(4)],
        "doc_id long, text string")
    assert D.minhash_lsh_candidates(docs).count() == 6  # all 4C2 pairs


def test_reliable_checkpoint_mode_matches_local(spark, tmp_path):
    """With spark.agensgraph.checkpointDir set, the iterative path
    operators truncate lineage via reliable DataFrame.checkpoint —
    results identical to the default localCheckpoint mode, and the
    checkpoint files actually land in the configured directory (the
    executor-loss survival story depends on them existing)."""
    import os
    edges = chain_edges(spark, 8)
    seeds = spark.createDataFrame([(0,)], "seed long")
    pairs = spark.createDataFrame([(0, 6)], "seed long, target long")

    def run_all():
        vle = sorted(tuple(r) for r in P.vle_expand(
            edges, seeds, 1, 7, checkpoint_every=2).select(
                "seed", "dst", "len").collect())
        bfs = sorted(tuple(r) for r in P.bfs_shortest(
            edges, pairs, 1, 7).select("seed", "target", "len").collect())
        dij = sorted(tuple(r) for r in P.dijkstra_paths(
            edges, pairs, max_iters=10).select(
                "seed", "target", "len", "weight").collect())
        return vle, bfs, dij

    base = run_all()
    ckdir = str(tmp_path / "reliable_ck")
    spark.conf.set("spark.agensgraph.checkpointDir", ckdir)
    try:
        reliable = run_all()
    finally:
        spark.conf.unset("spark.agensgraph.checkpointDir")
    assert reliable == base
    assert base[1] == [(0, 6, 6)]
    # reliable checkpoint files were written under the configured dir
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(ckdir) for f in fs]
    assert files, f"no checkpoint files under {ckdir}"
