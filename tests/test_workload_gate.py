"""Pins the correctness-gate selection policy (workload.PRIORITY_50).

The driver gates the FIRST 50 registry entries; this module fails CI
when the gate drifts away from the documented policy — size, risk-first
membership, family coverage, and registry resolvability."""

from agensgraph_spark import workload

HIGH_RISK = {
    # write roundtrips
    "cy_write_set_roundtrip", "cy_write_merge_roundtrip",
    # iterative path operators
    "cy_vle_reach", "cy_shortestpath", "cy_dijkstra",
    # fuzzy/probabilistic dedup + quality pipelines (dedup_semantic and
    # text_lm_perplexity seated in round 11, dsir_importance in round
    # 12 — trained-quantizer / corpus-trained-LM / two-distribution
    # bucket-model stages are where silent wrong answers hide)
    "dedup_minhash_lsh", "dedup_simhash", "dedup_cluster",
    "dedup_semantic", "text_lm_perplexity", "dsir_importance",
    # round-13 seats: span-level dedup (probabilistic, multi-stage,
    # newly Generate-quadratic-fixed) and the first analytics
    # recurrence beyond pagerank with a max-norm chained-CTE oracle
    "dedup_dup_spans", "graph_hits",
    # round-14 seat: fuzzy decontamination — probabilistic,
    # parity-encoded train/eval union through the minhash machinery
    # (displaced sql_events_hourly, whose computation shape stays
    # gated as stream_events_hourly's batch oracle)
    "fuzzy_decontaminate",
    # round-14 second-wave seats: SCC (new multi-round iterative
    # settle logic; displaced sql_json_props — JSON family keeps
    # cy_nested_props) and BM25 (new lexical-retrieval family, float
    # scoring near-tie ordering; displaced quality_score — text
    # family keeps text_stats + both trained rows)
    "graph_scc", "bm25_topk",
    # streaming-vs-batch and hybrid composition
    "stream_events_hourly", "hybrid_correlated_subquery",
}

FAMILY_REPRESENTATIVE = {
    "graph": "cy_match_1hop",
    "sql": "sql_tpch_q1",
    "window": "sql_window_rank",
    "dedup": "dedup_exact",
    "ann": "ann_cosine_topk",
    "text": "text_stats",
    "multimodal": "mm_frame_sample",
    "graph-stats": "graphmeta_edge_stats",
    "sampling": "mix_sample",
    "temporal": "asof_join_events",
    "analytics": "graph_pagerank",
    "e2e": "pipeline_curate_e2e",
    "retrieval": "bm25_topk",
}


def test_gate_is_exactly_50_and_resolvable():
    names = workload.PRIORITY_50
    assert len(names) == 50
    assert len(set(names)) == 50
    registry = workload.all_queries()
    missing = [n for n in names if n not in registry]
    assert not missing, missing
    # the gate IS the registry prefix the driver sees
    assert list(registry)[:50] == list(names)


def test_gate_keeps_high_risk_rows():
    gated = set(workload.PRIORITY_50)
    assert HIGH_RISK <= gated, HIGH_RISK - gated


def test_gate_keeps_family_representatives():
    gated = set(workload.PRIORITY_50)
    missing = {fam: rep for fam, rep in FAMILY_REPRESENTATIVE.items()
               if rep not in gated}
    assert not missing, missing


def test_every_gated_row_is_oracle_backed():
    oracles = workload.all_oracles()
    missing = [n for n in workload.PRIORITY_50 if n not in oracles]
    assert not missing, missing
