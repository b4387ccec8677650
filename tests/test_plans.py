"""Plan-quality assertions: the compiled plans must keep the shapes
that survive a 100 TB scale-up — pushed filters, pruned columns,
broadcast of bounded sides, no cartesian products on the hot paths."""

import re

import pytest
from pyspark.sql import functions as F

from agensgraph_spark.cypher.compiler import CypherEngine
from agensgraph_spark.loader import build_tpch_graph

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def eng(spark):
    return CypherEngine(spark, build_tpch_graph(spark, SF))


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_property_filter_reaches_parquet_scan(eng):
    df = eng.cypher("MATCH (r:region) WHERE r.r_name = 'ASIA' RETURN r.r_regionkey AS k")
    plan = physical(df)
    assert "EqualTo(r_name,ASIA)" in plan  # pushed into the Parquet scan


def test_column_pruning(eng):
    df = eng.cypher("MATCH (p:part) RETURN p.p_partkey AS k")
    plan = physical(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert any(s == "p_partkey:bigint" for s in schemas), schemas


def test_multi_hop_uses_broadcast_joins(eng):
    df = eng.cypher(
        "MATCH (s:supplier)-[:in_nation]->(n:nation)-[:in_region]->(r:region) "
        "WHERE r.r_name = 'ASIA' RETURN s.s_suppkey AS skey")
    plan = physical(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_pattern_join_no_vertex_scan_for_anonymous_endpoint(eng):
    # (c:customer)-[:placed]->() must not scan the orders label at all
    df = eng.cypher("MATCH (c:customer)-[:placed]->() RETURN c.c_custkey AS k")
    plan = physical(df)
    assert "o_orderkey" not in plan  # future-vertex deferral: edge dst is enough


def test_agg_is_partial_then_final(eng):
    df = eng.cypher("MATCH (c:customer) RETURN c.c_mktsegment AS seg, count(*) AS n")
    plan = physical(df)
    # two-phase hash aggregate (map-side partial combine before shuffle)
    assert plan.count("HashAggregate") >= 2


def test_stats_flip_join_to_broadcast(spark):
    """collect_stats() drives the broadcast side of hop joins
    (ag_graphmeta-costing analog). With auto-broadcast disabled, only
    the stats-sourced hint can produce a BroadcastHashJoin — so the
    same query flips plan shape when stats exist."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = ("MATCH (c:customer)-[:in_nation]->(n:nation) "
             "RETURN c.c_custkey AS k, n.n_name AS nn")
        cold = CypherEngine(spark, build_tpch_graph(spark, SF))
        plan_no_stats = physical(cold.cypher(q))
        warm = CypherEngine(spark, build_tpch_graph(spark, SF))
        warm.graph.collect_stats()
        plan_stats = physical(warm.cypher(q))
        assert "BroadcastHashJoin" not in plan_no_stats
        assert "BroadcastHashJoin" in plan_stats
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pathfind_no_endpoint_cartesian(eng):
    """Disconnected pathfind endpoints must not cross-join the two wide
    vertex scans — the path operator runs on id-only pairs and results
    equi-join back to each endpoint scan separately."""
    df = eng.cypher(
        "MATCH (c:customer), (r:region) WHERE c.c_custkey < 50 "
        "MATCH p = shortestpath((c)-[:in_nation|in_region*..3]->(r)) "
        "RETURN c.c_custkey AS ckey, r.r_regionkey AS rkey, length(p) AS hops")
    plan = physical(df)
    # id-only seed×target cross products are fine; a cartesian/BNLJ over
    # the wide c_name/c_acctbal customer payload is the scale-killer
    import re as _re
    bad = [m for m in _re.finditer(r"(CartesianProduct|BroadcastNestedLoopJoin)[^\n]*", plan)
           if "c_name" in m.group(0) or "c_acctbal" in m.group(0)]
    assert not bad, bad


def test_sample_scan(eng, spark):
    """SampleScan parity (reference: nodeSamplescan.c:1, TABLESAMPLE):
    df.sample is the Spark primitive; fraction lands within tolerance
    and is reproducible for a fixed seed + partitioning."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n = orders.count()
    s1 = orders.sample(fraction=0.2, seed=7).count()
    s2 = orders.sample(fraction=0.2, seed=7).count()
    assert s1 == s2  # deterministic under a fixed seed
    assert 0.1 * n < s1 < 0.3 * n
    # SQL surface: TABLESAMPLE clause parses and executes
    orders.createOrReplaceTempView("__orders_sample_t")
    st = spark.sql("SELECT * FROM __orders_sample_t TABLESAMPLE (10 PERCENT)").count()
    assert 0 <= st < n


def test_bucketed_join_no_exchange(eng, spark):
    """Bucketed label snapshots joined on the bucket key must not
    shuffle either side — the co-located hop-join layout for 100 TB."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        eng.graph.write_bucketed(spark, buckets=8, prefix="pt")
        v = spark.table("pt_b_customer")
        e = spark.table("pt_b_placed")
        j = e.join(v, e.start == v.id)
        plan = physical(j)
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cypher_hop_join_on_bucketed_graph(eng, spark):
    """A Cypher 1-hop pattern over a bucketed graph joins
    edge.start ⋈ vertex.id without shuffling the co-located sides."""
    from agensgraph_spark.graph import Graph
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        eng.graph.write_bucketed(spark, buckets=8, prefix="pt2")
        g = Graph.read_bucketed(spark, eng.graph.catalog, prefix="pt2")
        beng = CypherEngine(spark, g)
        df = beng.cypher(
            "MATCH (c:customer)-[:placed]->() RETURN c.c_custkey AS k")
        plan = physical(df)
        # projection-only query over the bucketed pair: the whole plan
        # must be exchange-free
        assert "Exchange" not in plan, plan
        assert df.count() == spark.table("pt2_b_placed").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_edge_triple_stats_flip_fold_order(spark):
    """Multi-hop fold order consults the ag_graphmeta-style edge-triple
    cardinalities (reference: ag_graphmeta.h:30): a chain whose LAST hop
    is far more selective folds from the other end — and only when the
    stats exist. Results must be identical either way."""
    from agensgraph_spark.catalog import GraphCatalog
    from agensgraph_spark.cypher.compiler import QueryCompiler
    from agensgraph_spark.cypher.parser import parse_cypher
    from agensgraph_spark.graph import Graph
    from agensgraph_spark.graphid import make_graphid

    cat = GraphCatalog("skewg")
    cat.create_vlabel("a", labid=1, props={"k": "bigint"})
    cat.create_vlabel("b", labid=2, props={"k": "bigint"})
    cat.create_vlabel("c", labid=3, props={"k": "bigint"})
    cat.create_elabel("e_big", labid=17)
    cat.create_elabel("e_small", labid=18)
    g = Graph(cat)
    nb, nc = 20, 2
    g.set_label_df("a", spark.createDataFrame(
        [(make_graphid(1, i + 1), i) for i in range(100)], "id long, k long"))
    g.set_label_df("b", spark.createDataFrame(
        [(make_graphid(2, i + 1), i) for i in range(nb)], "id long, k long"))
    g.set_label_df("c", spark.createDataFrame(
        [(make_graphid(3, i + 1), i) for i in range(nc)], "id long, k long"))
    g.set_label_df("e_big", spark.createDataFrame(
        [(make_graphid(17, i + 1), make_graphid(1, i % 100 + 1), make_graphid(2, i % nb + 1))
         for i in range(400)], "id long, start long, end long"))
    g.set_label_df("e_small", spark.createDataFrame(
        [(make_graphid(18, i + 1), make_graphid(2, i + 1), make_graphid(3, i % nc + 1))
         for i in range(3)], "id long, start long, end long"))

    q = ("MATCH (x:a)-[:e_big]->(y:b)-[:e_small]->(z:c) "
         "RETURN x.k AS xk, z.k AS zk")
    part = parse_cypher(q)
    from agensgraph_spark.cypher.compiler import CypherEngine
    eng2 = CypherEngine(spark, g)

    qc_cold = QueryCompiler(eng2, {})
    df_cold = qc_cold.compile(part)
    assert qc_cold.fold_reversed is False  # no stats -> written order

    g.collect_edge_stats()
    part2 = parse_cypher(q)
    qc_warm = QueryCompiler(eng2, {})
    df_warm = qc_warm.compile(part2)
    assert qc_warm.fold_reversed is True  # e_small (3) << e_big (400)

    rows_cold = sorted((r["xk"], r["zk"]) for r in df_cold.collect())
    rows_warm = sorted((r["xk"], r["zk"]) for r in df_warm.collect())
    assert rows_cold == rows_warm and len(rows_warm) > 0


def test_edge_scan_prunes_unused_union_branch(eng, spark):
    # in_nation unions customer+supplier edge sources; a supplier-anchored
    # pattern pushes a labid range on src that lands on the underlying
    # key columns of both branches
    df = eng.cypher("MATCH (s:supplier)-[:in_nation]->(n:nation) RETURN s.s_suppkey AS k")
    plan = physical(df)
    # the customer branch's scan must carry a pushed filter on c_custkey
    # (derived from the graphid range) or be filtered before its join
    assert "Filter" in plan
    rows = df.count()
    sup = spark.read.parquet(f"{SF}/supplier.parquet").count()
    assert rows == sup


def test_lateral_topk_no_cartesian(spark):
    """sql_lateral_topk: Catalyst decorrelates the LATERAL dependent
    top-k into a ranked join — never a cartesian over customers."""
    from agensgraph_spark import workload
    df = workload.all_queries()["sql_lateral_topk"](spark, SF)
    plan = physical(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sp_expr_left_join_no_cartesian(spark):
    """cy_sp_expr: the expression-position shortestpath LEFT-joins the
    pathfind result back to the pipeline on ids — the only cross join
    is the endpoint id-pair SEED SET (narrow), never the wide rows."""
    from agensgraph_spark import workload
    df = workload.all_queries()["cy_sp_expr"](spark, SF)
    plan = physical(df)
    # wide-row products would surface as a cartesian over non-id columns
    for frag in re.findall(r"CartesianProduct.*", plan):
        assert "c_name" not in frag and "c_mktsegment" not in frag
    rows = df.count()
    # cardinality preserved: customers(<40) x 5 regions
    assert rows == spark.read.parquet(f"{SF}/customer.parquet") \
        .filter(F.col("c_custkey") < 40).count() * 5


def test_heuristic_filter_single_stage(spark):
    """The quality gate OPERATOR is a pure projection: no Exchange, no
    UDFs — map-only at any corpus scale. The workload ROW additionally
    spreads its single-split local scan (loader.spread_scan, a no-op on
    a many-file layout), so its plan carries exactly ONE hash exchange
    below the projection and still no Python."""
    from agensgraph_spark import workload
    from agensgraph_spark.pipeline import text as TX
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    op_plan = physical(TX.heuristic_filter(docs))
    assert "Exchange" not in op_plan
    assert "BatchEvalPython" not in op_plan and "ArrowEvalPython" not in op_plan
    row_plan = physical(workload.all_queries()["heuristic_filter"](spark, SF))
    assert len(re.findall(r"\bExchange hashpartitioning\(doc_id",
                          row_plan)) == 1, row_plan
    assert "BatchEvalPython" not in row_plan and "ArrowEvalPython" not in row_plan


def test_repetition_filter_single_stage(spark):
    """The intra-doc repetition gate is map-only even though it counts
    modal bigrams — the count is a sorted-run fold over the doc's own
    array, so no Exchange and no Python ever appears."""
    from agensgraph_spark import workload
    df = workload.all_queries()["repetition_filter"](spark, SF)
    plan = physical(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mix_sample_filter_pushed_to_scan(spark):
    """Deterministic sampling is a scan-level filter before the
    aggregate — the md5 predicate must not sit above a shuffle."""
    from agensgraph_spark import workload
    df = workload.all_queries()["mix_sample"](spark, SF)
    plan = physical(df)
    # exactly the aggregate's exchange, nothing else
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan


def test_range_join_no_cartesian(spark):
    """The binned range join must plan as an equi-join (hash or
    sort-merge) with the containment filter on top — a plain
    inequality join would be a nested-loop cartesian per key."""
    from agensgraph_spark import workload
    df = workload.all_queries()["range_join_events"](spark, SF)
    plan = physical(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_single_shuffle_per_side(spark):
    """The union+window as-of join shuffles each side once on the by
    key — no self-join, no per-row search."""
    from agensgraph_spark import workload
    df = workload.all_queries()["asof_join_events"](spark, SF)
    plan = physical(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # one window over the unioned stream; no join operators at all
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Window") >= 1


def test_quantize_embeddings_map_only(spark):
    from agensgraph_spark import workload
    df = workload.all_queries()["quantize_embeddings"](spark, SF)
    plan = physical(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_minhash_signatures_single_exchange_no_python(spark):
    """The signature stage is map-only after ONE spread repartition:
    exactly one Exchange (the explicit spread), zero Python eval nodes
    — the shape that keeps a 100-TB signature pass embarrassingly
    parallel."""
    from agensgraph_spark.pipeline import dedup as D
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for hash_fn in ("xxh64", "md5"):
        plan = physical(D.minhash_signatures(docs, hash_fn=hash_fn))
        assert plan.count("Exchange") == 1, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_connected_components_small_graph_broadcasts(spark):
    """The driver union-find path must join its edge-bounded label map
    to the node universe as a BROADCAST (the universe side can be
    arbitrarily large; shuffling it to serve a tiny map is the wrong
    plan)."""
    from agensgraph_spark.pipeline import dedup as D
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"])
    nodes = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    out = D.connected_components(pairs, nodes=nodes)
    # the output is localCheckpoint-materialized; assert on the labels
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 7, 8: 7, 9: 9}


def test_graphmeta_read_is_catalog_lookup(eng):
    """ag_graphmeta reads are catalog lookups in the reference (rows
    maintained by regather_graphmeta, graphmeta.c), not edge rescans.
    After collect_edge_stats() the edge_stats() plan must be a
    LocalRelation — zero file scans, zero exchanges — and any
    set_label_df must invalidate the cache so reads are never stale."""
    g = eng.graph
    g.collect_edge_stats()
    df = g.edge_stats()
    plan = physical(df)
    assert "FileScan" not in plan and "Scan parquet" not in plan, plan
    assert "Exchange" not in plan, plan
    cached = {tuple(r) for r in df.collect()}

    # invalidation: swapping a frame drops the cache -> distributed plan
    lbl = "in_region"
    old = g.frames[lbl]
    try:
        g.set_label_df(lbl, old.limit(3))
        assert g._edge_triples is None and g._label_counts is None
        fresh = {tuple(r) for r in
                 g.edge_stats().filter("edge_label = 'in_region'").collect()}
        assert fresh == {("in_region", 5, 6, 3)}
    finally:
        g.set_label_df(lbl, old)

    # recompute after restore matches the pre-invalidation catalog
    g.collect_edge_stats()
    assert {tuple(r) for r in g.edge_stats().collect()} == cached


def test_lm_perplexity_plan_shape(spark):
    """Bigram-LM scoring stays JVM-side and never goes quadratic: no
    Python eval nodes, no cartesian product — the vocab scalar enters
    as a broadcast-style 1-row join, bigram extraction is map-only."""
    from agensgraph_spark.loader import read_table
    from agensgraph_spark.pipeline import text as TX
    plan = physical(TX.lm_perplexity(read_table(spark, SF, "documents")))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_semantic_dedup_plan_shape(spark):
    """SemDeDup's pair join is confined WITHIN centroid clusters: no
    Python eval, no cartesian product, and the self-join keys on the
    cluster tag (corpus never crosses clusters wholesale)."""
    from agensgraph_spark.loader import read_table
    from agensgraph_spark.pipeline import similarity as S
    emb = read_table(spark, SF, "embeddings")
    plan = physical(S.semantic_dedup(emb, dim=64))
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    assert join_lines and any("cluster#" in ln for ln in join_lines), join_lines


def test_frame_sample_plan_is_metadata_only(spark):
    """Frame sampling reads only meta.n_frames: the plan must contain
    NO payload construction (no unhex/repeat expressions) and no
    Exchange below the explode — the pruned scan feeds the Generate
    directly (r9 regression: an unconditional synthesis repartition
    cost 2.5x on this metadata-only consumer)."""
    import __spark_entry__ as m
    plan = physical(m.queries()["mm_frame_sample"](spark, SF))
    low = plan.lower()
    assert "unhex" not in low and "repeat(" not in low, plan
    # nothing below the Generate but project/filter/scan (assert
    # membership first: .index on a missing node raises ValueError
    # without the plan dump)
    assert "Generate" in plan, plan
    below = plan[plan.index("Generate"):]
    assert "Exchange" not in below, plan
    # and the scan is pruned to the id column alone
    assert re.search(r"ReadSchema: struct<doc_id:bigint>", plan), plan


def test_synthesized_decode_plan_spreads_before_payload(spark):
    """Payload-consuming decode stages must construct payload bytes
    ABOVE the spread exchange (payload CPU runs on full parallelism)
    and must not re-shuffle the constructed bytes through a second
    exchange."""
    from agensgraph_spark.loader import read_table
    from agensgraph_spark.pipeline import multimodal as MM
    media = MM.synthesize_media(read_table(spark, SF, "documents"))
    stats = MM.video_stats(media)
    plan = physical(stats)
    # exactly one round-robin exchange, and the payload expressions
    # (unhex of the tiled hex body) sit above it
    rr = [m.start() for m in re.finditer(r"Exchange RoundRobinPartitioning", plan)]
    assert len(rr) == 1, plan
    first_unhex = plan.lower().index("unhex")
    assert first_unhex < rr[0], "payload built below the spread exchange"


def test_formatting_shims_stay_jvm_side(spark):
    """The PG formatting family (to_char templates + numeric pictures,
    to_date/to_timestamp/to_number, age) compiles to pure column
    expressions: no Python eval anywhere in the plan, and the events
    scan is pruned to the consumed columns."""
    import __spark_entry__ as m
    for row in ("sql_to_char", "sql_to_char_num", "sql_to_number",
                "sql_to_date_parse"):
        plan = physical(m.queries()[row](spark, SF))
        assert "EvalPython" not in plan, (row, plan)
        assert "CartesianProduct" not in plan, (row, plan)
    plan = physical(m.queries()["sql_to_char_num"](spark, SF))
    assert re.search(r"ReadSchema: struct<event_id:bigint,value:double>",
                     plan), plan


def test_semantic_dedup_cap_plan_shape(spark):
    """r14: the capped path runs on the Arrow engine — the plan is a
    straight pipe Scan -> MapInArrow(tag) -> ONE Exchange(cluster) ->
    Sort -> MapInArrow(score): no self-join, no window, no broadcast,
    and per-task memory bounded at max_cluster x dim (the head
    buffer). The EXACT (max_cluster=None) path keeps the distributed
    JVM self-join (no Python eval) so an unbounded hot cluster spills
    across tasks instead of one Python worker."""
    from agensgraph_spark.loader import read_table
    from agensgraph_spark.pipeline import similarity as S
    emb = read_table(spark, SF, "embeddings")
    capped = physical(S.semantic_dedup(emb, dim=64, max_cluster=100))
    uncapped = physical(S.semantic_dedup(emb, dim=64, max_cluster=None))
    # capped: exactly two Arrow stages, one exchange, and NO join of
    # any kind — the quadratic term never materializes as pairs
    assert capped.count("MapInArrow") == 2, capped
    assert "Join" not in capped and "Window" not in capped, capped

    def n_ex(p):
        return len(re.findall(r"\bExchange\b", p))
    assert n_ex(capped) == 1, capped
    # uncapped stays JVM-side: no Python eval, cluster-keyed join
    assert "MapInArrow" not in uncapped, uncapped
    assert "EvalPython" not in uncapped, uncapped
    assert "row_number" not in uncapped, uncapped
    # the capped output column is present in both shapes
    for p in (capped, uncapped):
        assert "capped" in p, p


def test_sessionize_single_exchange(spark):
    """Batch sessionization (workload `sessionize_events` shape): the
    two session windows AND the per-(user, session) aggregate must all
    reuse the one user-key exchange — hash-clustering on user_id
    already co-locates every (user_id, session_seq) group, so a second
    exchange would be pure waste at 100 TB."""
    from agensgraph_spark.operators.temporal import assign_sessions
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    s = assign_sessions(ev, "user_id", "ts", gap_seconds=1800)
    agg = (s.groupBy("user_id", "session_seq")
           .agg(F.count(F.lit(1)).alias("n")))
    plan = physical(agg)
    assert plan.count("Exchange") == 1, plan


def test_cap_per_group_two_phase_skew_shape(spark):
    """cap_per_group's production input is Zipf-skewed by construction
    (it IS the anti-domain-dominance pass), so the plan must be the
    two-phase shape: phase 1 ranks within (group, salt) — the hot
    group's sort splits across skew_buckets tasks — and phase 2
    exact-ranks the ≤ skew_buckets*k survivors. Both phases must keep
    the WindowGroupLimit Partial pushdown (map-side top-k pruning
    BEFORE each exchange), and the phase-1 exchange must key on the
    salt alongside the group."""
    from agensgraph_spark.pipeline.sampling import cap_per_group
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical(cap_per_group(docs, "source", 10))
    # phase-1 exchange partitions on (group, salt): salt is the second
    # hashpartitioning key (a projected pmod(xxhash64) column)
    assert re.search(r"Exchange hashpartitioning\(source#\d+, _w\d+#\d+L",
                     plan), plan
    assert "pmod(xxhash64" in plan, plan
    # both rank filters push down: 2 windows, 4 WindowGroupLimit nodes
    # (Partial + Final per phase) — the Partials bound every task's
    # sort buffer at k rows per key map-side
    assert plan.count("Window [row_number()") == 2, plan
    assert plan.count("WindowGroupLimit") == 4, plan
    assert plan.count(", Partial") == 2, plan
    assert "CartesianProduct" not in plan


def test_sessionize_bucketed_skew_shape(spark):
    """assign_sessions(bucket_seconds=...): the event-level work must
    partition on (user, bucket) — NEVER on the bare user key, which
    would put the hottest user in one task — with the per-user windows
    confined to the narrow per-bucket mini-frame (its scan pruned to
    (ts, user))."""
    from agensgraph_spark.operators.temporal import assign_sessions
    ev = spark.read.parquet(f"{SF}/events.parquet") \
        .select("user_id", "ts", "value")
    s = assign_sessions(ev, "user_id", "ts", gap_seconds=1800,
                        bucket_seconds=86400)
    plan = physical(s)
    # every event-level window partitions on (user, bucket): no Window
    # line may reference a bare user_id partition over the full-width
    # rows — the only per-user exchange is the mini-frame's (verified
    # by its position above the narrow scan)
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert any("_b#" in e for e in exchanges), exchanges
    # the mini-frame branch re-reads the source pruned to (ts, user) —
    # the full-width frame is scanned exactly once
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert sorted(schemas) == sorted(
        ["ts:timestamp_ntz,user_id:bigint,value:double",
         "ts:timestamp_ntz,user_id:bigint"]), schemas
    # bare-user exchanges carry only the mini-frame (bucket-level rows):
    # they must appear under a HashAggregate, never over raw events
    assert "CartesianProduct" not in plan


def test_dsir_model_join_is_broadcast(spark):
    """dsir_weights: the 256-row bucket model must broadcast back to
    the per-occurrence stream — a shuffle join keyed on a 256-value
    column would be pure skew at 100 TB."""
    from agensgraph_spark.pipeline.text import dsir_weights
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical(dsir_weights(docs, F.col("lang") == "en"))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_duplicate_spans_no_cartesian_single_doc_shuffle(spark):
    """duplicate_spans: gram detection and runs are key-partitioned
    joins/windows — no cartesian product anywhere, and the islands
    window + per-doc aggregate reuse one doc-key exchange."""
    from agensgraph_spark.pipeline.dedup import duplicate_spans
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = physical(duplicate_spans(docs, n=8))
    assert "CartesianProduct" not in plan
    # exchanges: gram-hash aggregate (2 stages of it), semi-join both
    # sides, islands window, per-doc aggregates — but the window's doc
    # partitioning must be REUSED by the groupBy(_id, _grp) aggregate:
    # no exchange may sit between the Window and the first aggregate
    import re as _re
    win_pos = plan.find("Window")
    assert win_pos != -1
    agg_after_win = plan[:win_pos]
    # the run-length aggregate appears above the window in the plan
    # dump; there must be no Exchange between them
    seg = agg_after_win[agg_after_win.rfind("HashAggregate"):]
    assert "Exchange" not in seg, seg


def test_ann_filtered_ivf_index_bounded_shape(spark):
    """Filtered vector search's 100 TB serving shape (ann_filtered_ivf):
    the metadata predicate must reach the corpus as a pre-scoring
    SEMI-join, scoring must be the IVF bucket join on the probed-list
    key — never a cartesian/brute |corpus|x|queries| pair join — and
    the query side must broadcast (it is query-set-sized)."""
    from agensgraph_spark.workload import all_queries
    df = all_queries()["ann_filtered_ivf"](spark, SF)
    plan = physical(df)
    assert "LeftSemi" in plan, plan                 # the pre-filter
    assert "CartesianProduct" not in plan, plan     # never brute pairs
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # scoring joins on the probed inverted-list key, query side
    # broadcast (one hash join keyed on _list)
    assert re.search(r"BroadcastHashJoin \[_list#\d+", plan), plan


def test_bm25_inverted_index_shape(spark):
    """bm25_topk must be the inverted-index join: the tiny query-term
    frame broadcasts (scoring touches only matched posting lists, not
    |corpus| x |queries|), the corpus-stats cross-join rides a
    BroadcastNestedLoopJoin over 1-row aggregates, and the per-query
    top-k keeps the WindowGroupLimit pushdown so no task sorts more
    than k rows per query map-side."""
    from agensgraph_spark.pipeline.retrieval import bm25_topk
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    qs = (docs.filter(F.col("doc_id") < 8)
          .select(F.col("doc_id").alias("query_id"),
                  F.col("text").alias("query_text")))
    plan = physical(bm25_topk(docs, qs, k=5))
    assert "BroadcastExchange" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the only nested-loop joins are the two 1-row stats cross-joins
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan


def test_cypher_plan_memo_lazy_only(spark):
    """The r14 compiled-plan memo (workload._cypher) may hand the same
    DataFrame back ONLY for pure-lazy compiles: a query whose compile
    runs Spark jobs (deep VLE expansion, shortestpath/dijkstra
    searches — they materialize frontier RDDs) must be rebuilt on
    every invocation, or re-invocations would skip the search itself
    (result caching, which the bench contract forbids)."""
    from agensgraph_spark import workload

    # lazy compiles: memoized (same object back). Includes depth<=3
    # VLE and the shallow shortestpath built on it since r14 (no edge
    # pin, zero compile jobs — the expansion recomputes from parquet
    # at every action).
    for text in (
        "MATCH (c:customer)-[:placed]->(o:orders) "
        "RETURN c.c_custkey AS ckey, count(*) AS n",
        "MATCH (c:customer)-[e:in_nation|in_region*1..2]->(x) "
        "WHERE c.c_custkey < 5 RETURN c.c_custkey AS ckey, "
        "length(e) AS hops, x.id AS xid",
        "MATCH (c:customer), (r:region) WHERE c.c_custkey < 5 "
        "MATCH p = shortestpath((c)-[:in_nation|in_region*..3]->(r)) "
        "RETURN c.c_custkey AS ckey, length(p) AS hops",
    ):
        f_lazy = workload._cypher(text)
        d1 = f_lazy(spark, SF)
        d2 = f_lazy(spark, SF)
        assert d1 is d2, text

    # eager compiles: never memoized (fresh frame each call) — the
    # dijkstra relaxation loop runs checkpoint/count jobs at compile,
    # so every invocation must redo the search
    for text in (
        "MATCH (o:orders), (t:part) WHERE o.o_orderkey < 3 "
        "MATCH p = dijkstra((o)-[x:contains]->(t), x.l_quantity, w) "
        "RETURN o.o_orderkey AS okey, t.p_partkey AS pkey, w AS wt",
    ):
        f_eager = workload._cypher(text)
        e1 = f_eager(spark, SF)
        e2 = f_eager(spark, SF)
        assert e1 is not e2, text


def test_spread_scan_conditional(spark):
    """loader.spread_scan (r14): a single-split local scan gains ONE
    hash exchange on the given key — and column pruning still reaches
    the parquet scan BELOW the exchange — while an input that already
    plans >= defaultParallelism partitions is returned UNCHANGED (the
    many-file production layout pays no exchange)."""
    from agensgraph_spark.loader import read_table, spread_scan

    ev = read_table(spark, SF, "events")
    out = spread_scan(ev, "event_id")
    plan = physical(out.select("event_id", "value"))
    assert "Exchange hashpartitioning(event_id" in plan, plan
    assert re.search(r"ReadSchema: struct<event_id:bigint,value:double>",
                     plan), plan
    # partition-count probe is memoized on the (memoized) scan object:
    # later spreads of the same table never re-plan the probe RDD
    assert getattr(ev, "_spread_scan_parts", None) is not None

    # an already-parallel frame passes through untouched (identity, not
    # merely equivalent: no exchange node is added)
    wide = spark.range(0, 1000)  # plans defaultParallelism partitions
    assert spread_scan(wide, "id") is wide
