"""Iterative path operators: variable-length expansion, shortest paths,
Dijkstra.

The reference implements these as dedicated executor nodes —
depth-first VLE (reference: src/backend/executor/execGraphVle.c:329
ExecGraphVLEDFS), bidirectional-BFS shortest path
(nodeShortestpath.c:79, nodeHash2Side.c), and pairing-heap Dijkstra
(nodeDijkstra.c:338). A BFS frontier of joins yields the same *output
set* with distributed parallelism: each iteration is one shuffle join
of the frontier against the (direction-normalized) edge relation, with
per-path edge-uniqueness enforced by ``array_contains`` filters — the
DataFrame analog of the reference's per-path visited set.

Scale notes:
- the edge relation is reused every hop → callers should cache it;
- path-array columns grow O(depth); lineage is cut with
  ``localCheckpoint`` every ``checkpoint_every`` hops;
- frontiers are pruned per hop (shortest-path keeps only the cheapest
  row per (seed, vertex)), so frontier size is bounded by reachable
  vertices, not path count.

Edge input convention: a DataFrame with columns
``src, dst, eid`` (+ ``w`` for Dijkstra) — already direction-normalized
(undirected patterns pass the two-orientation union, reference:
genEdgeUnion parse_graph.c:2100).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_HOPS = 12


def _maybe_checkpoint(df: DataFrame, k: int, every: int | None) -> DataFrame:
    if every and k % every == 0:
        return df.localCheckpoint(eager=True)
    return df


BROADCAST_EDGE_LIMIT = 200_000
BROADCAST_FRONTIER_LIMIT = 100_000


def _pin_edges(edges: DataFrame) -> tuple[DataFrame, bool]:
    """Persist the edge relation: every hop re-joins it, and each
    iteration's isEmpty/cache action would otherwise re-run the whole
    scan lineage (label unions, graphid arithmetic) once per hop.
    MEMORY_AND_DISK so oversized edge sets spill instead of OOM.

    Returns (edges, small): when the persisted relation is small the
    caller broadcasts it into every hop join — the frontier then never
    shuffles on the join key, collapsing each hop to one narrow stage.
    (Counting is ~free: it is the action that materializes the
    persist.)"""
    from pyspark import StorageLevel
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    return edges, edges.count() <= BROADCAST_EDGE_LIMIT


def _hop_side(edges: DataFrame, small: bool) -> DataFrame:
    return F.broadcast(edges) if small else edges


def vle_expand(
    edges: DataFrame,
    seeds: DataFrame,
    min_hops: int,
    max_hops: int | None,
    unique_edges: bool = True,
    checkpoint_every: int | None = 6,
) -> DataFrame:
    """Variable-length edge expansion ``[:T*min..max]``.

    seeds: one column ``seed`` (distinct start vertex ids).
    Returns (seed, dst, eids array<long>, vids array<long>, len) for
    every path with len in [min_hops, max_hops]; vids includes interior
    + final vertices but not the seed. Zero-length rows (min_hops=0)
    pair each seed with itself and empty arrays.
    """
    if max_hops is None:
        max_hops = DEFAULT_MAX_HOPS
    max_hops = min(max_hops, DEFAULT_MAX_HOPS * 4)
    small = False
    if max_hops > 1:
        edges, small = _pin_edges(edges)

    frontier = seeds.select(
        F.col("seed"),
        F.col("seed").alias("cur"),
        F.array().cast("array<long>").alias("eids"),
        F.array().cast("array<long>").alias("vids"),
        F.lit(0).cast("long").alias("len"),
    )
    results = []
    if min_hops == 0:
        results.append(frontier.select("seed", F.col("cur").alias("dst"), "eids", "vids", "len"))

    for k in range(1, max_hops + 1):
        step = frontier.join(_hop_side(edges, small), frontier.cur == edges.src, "inner")
        if unique_edges:
            step = step.filter(~F.array_contains(F.col("eids"), F.col("eid")))
        frontier = step.select(
            "seed",
            F.col("dst").alias("cur"),
            F.concat(F.col("eids"), F.array(F.col("eid"))).alias("eids"),
            F.concat(F.col("vids"), F.array(F.col("dst"))).alias("vids"),
            F.lit(k).cast("long").alias("len"),
        )
        frontier = _maybe_checkpoint(frontier, k, checkpoint_every)
        if k >= min_hops:
            results.append(frontier.select("seed", F.col("cur").alias("dst"), "eids", "vids", "len"))
        # stop early once the frontier drains; the isEmpty probe is a
        # Spark job, so only pay for it when enough depth remains
        if k < max_hops and (max_hops - k > 2) and frontier.isEmpty():
            break

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def bfs_shortest(
    edges: DataFrame,
    pairs: DataFrame,
    min_hops: int,
    max_hops: int | None,
    all_paths: bool = False,
    checkpoint_every: int | None = 6,
) -> DataFrame:
    """Unweighted shortest path(s) between bound endpoint pairs.

    pairs: columns (seed, target) — distinct endpoint id pairs.
    Returns (seed, target, eids, vids, len): the first depth in
    [min_hops, max_hops] at which target is reached from seed;
    all_paths=False keeps one arbitrary shortest path (reference
    SHORTESTPATH), True keeps every shortest path (ALLSHORTESTPATHS).
    """
    if max_hops is None:
        max_hops = DEFAULT_MAX_HOPS
    if max_hops <= 3:
        # shallow bounded search: one VLE expansion + a single min-depth
        # selection beats per-hop visited-pruning (whose 2-3 shuffles
        # per hop dominate when the hop budget is this small; path
        # blowup is bounded by E^3)
        return _bfs_shortest_shallow(edges, pairs, min_hops, max_hops, all_paths)
    edges, small = _pin_edges(edges)
    pairs = pairs.select("seed", "target").distinct().cache()
    seeds = pairs.select("seed").distinct()

    frontier = seeds.select(
        F.col("seed"),
        F.col("seed").alias("cur"),
        F.array().cast("array<long>").alias("eids"),
        F.array().cast("array<long>").alias("vids"),
        F.lit(0).cast("long").alias("len"),
    )
    found_parts = []
    remaining = pairs
    visited = frontier.select("seed", "cur")  # vertices seen at depth <= k

    if min_hops == 0:
        hit0 = frontier.join(remaining, (frontier.seed == remaining.seed) & (frontier.cur == remaining.target)) \
                       .select(frontier.seed, F.col("cur").alias("target"), "eids", "vids", "len")
        found_parts.append(hit0)
        remaining = remaining.join(hit0.select("seed", "target"), ["seed", "target"], "left_anti")

    for k in range(1, max_hops + 1):
        step = frontier.join(_hop_side(edges, small), frontier.cur == edges.src, "inner") \
                       .filter(~F.array_contains(F.col("eids"), F.col("eid")))
        frontier = step.select(
            "seed",
            F.col("dst").alias("cur"),
            F.concat(F.col("eids"), F.array(F.col("eid"))).alias("eids"),
            F.concat(F.col("vids"), F.array(F.col("dst"))).alias("vids"),
            F.lit(k).cast("long").alias("len"),
        )
        # BFS pruning: a path reaching a vertex already seen at an
        # earlier depth cannot be (part of) a shortest path
        frontier = frontier.join(visited, ["seed", "cur"], "left_anti")
        if not all_paths:
            # one representative path per (seed, vertex)
            w = Window.partitionBy("seed", "cur").orderBy(F.col("eids").getItem(0))
            frontier = frontier.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
        frontier = _maybe_checkpoint(frontier, k, checkpoint_every).cache()
        visited = visited.unionByName(frontier.select("seed", "cur").distinct()).cache()

        hit = frontier.alias("f").join(
            remaining.alias("r"),
            (F.col("f.seed") == F.col("r.seed")) & (F.col("f.cur") == F.col("r.target")),
        ).select(F.col("f.seed").alias("seed"), F.col("f.cur").alias("target"), "eids", "vids", "len")
        found_parts.append(hit)
        remaining = remaining.join(hit.select("seed", "target").distinct(), ["seed", "target"], "left_anti")
        # early-exit checks are Spark actions (a full job each); for
        # tightly bounded searches the checks cost more than the hops
        # they might skip — only probe when the remaining depth is deep
        if k < max_hops and (max_hops - k > 2) and (remaining.isEmpty() or frontier.isEmpty()):
            break

    out = None
    for p in found_parts:
        out = p if out is None else out.unionByName(p)
    if out is None:
        return pairs.limit(0).select(
            F.col("seed"), F.col("target"),
            F.array().cast("array<long>").alias("eids"),
            F.array().cast("array<long>").alias("vids"),
            F.lit(0).cast("long").alias("len"),
        )
    if min_hops > 0:
        out = out.filter(F.col("len") >= min_hops)
    # keep only the minimal depth per pair (a pair found at depth k is
    # anti-joined out of `remaining`, but all_paths keeps every path of
    # that depth; later depths never re-add the pair)
    w = Window.partitionBy("seed", "target")
    out = out.withColumn("_min", F.min("len").over(w)).filter(F.col("len") == F.col("_min")).drop("_min")
    if not all_paths:
        w2 = Window.partitionBy("seed", "target").orderBy(F.col("len"))
        out = out.withColumn("_rn", F.row_number().over(w2)).filter(F.col("_rn") == 1).drop("_rn")
    return out


def _bfs_shortest_shallow(
    edges: DataFrame,
    pairs: DataFrame,
    min_hops: int,
    max_hops: int,
    all_paths: bool,
) -> DataFrame:
    pairs = pairs.select("seed", "target").distinct()
    exp = vle_expand(edges, pairs.select("seed").distinct(), min_hops, max_hops)
    hit = exp.join(pairs.withColumnRenamed("seed", "__s"),
                   (exp.seed == F.col("__s")) & (exp.dst == F.col("target")), "inner") \
             .select("seed", "target", "eids", "vids", "len")
    w = Window.partitionBy("seed", "target")
    hit = hit.withColumn("_min", F.min("len").over(w)).filter(F.col("len") == F.col("_min")).drop("_min")
    if not all_paths:
        w2 = Window.partitionBy("seed", "target").orderBy("len", F.col("eids").getItem(0))
        hit = hit.withColumn("_rn", F.row_number().over(w2)).filter(F.col("_rn") == 1).drop("_rn")
    return hit


def dijkstra_paths(
    edges: DataFrame,
    pairs: DataFrame,
    max_iters: int = 30,
    limit: int = 1,
    checkpoint_every: int | None = 5,
) -> DataFrame:
    """Cheapest path(s) by edge weight: Bellman-Ford-style iterative
    relaxation until no distance improves (reference: nodeDijkstra.c —
    a sequential pairing-heap; relaxation converges to the same result
    and distributes).

    edges: (src, dst, eid, w double). pairs: (seed, target).
    Returns (seed, target, eids, vids, len, weight) — up to ``limit``
    cheapest paths per pair, ordered by total weight.
    """
    # Edge pinning is deferred until the loop proves it will iterate:
    # for bounded searches that drain in one hop (a common dijkstra
    # shape — single-relation patterns), paying a full materialize+count
    # of the edge relation up front costs more than the two raw scans
    # the first round needs. From iteration 2 on, every hop re-joins the
    # relation and the persist pays for itself.
    small = False
    pinned = False
    pairs = pairs.select("seed", "target").distinct().cache()
    seeds = pairs.select("seed").distinct()

    # settled best paths per (seed, vertex); keep `limit` cheapest
    paths = seeds.select(
        F.col("seed"),
        F.col("seed").alias("cur"),
        F.array().cast("array<long>").alias("eids"),
        F.array().cast("array<long>").alias("vids"),
        F.lit(0).cast("long").alias("len"),
        F.lit(0.0).alias("weight"),
    ).cache()
    frontier = paths
    # frontier size is unknown until the loop's own count at the end of
    # each round — spending a dedicated job up front costs more than the
    # first-iteration broadcast hint could save, so iteration 1 leaves
    # the strategy to AQE and later rounds use the tracked count
    fcount: int | None = None

    for k in range(1, max_iters + 1):
        # two raw scans (hop 1 + hop 2's drain probe) are cheaper than
        # an eager materialize+count, so pinning starts at depth 3
        if k == 3 and not pinned:
            edges, small = _pin_edges(edges)
            pinned = True
        # whichever side is small drives the join strategy: tiny
        # frontier against a big edge relation → broadcast the frontier
        # (edges then never shuffle); small edges → broadcast edges
        if not small and fcount is not None and fcount <= BROADCAST_FRONTIER_LIMIT:
            fside = F.broadcast(frontier)
        else:
            fside = frontier
        step = fside.join(_hop_side(edges, small), frontier.cur == edges.src, "inner") \
                       .filter(~F.array_contains(F.col("eids"), F.col("eid"))) \
                       .select(
                           "seed",
                           F.col("dst").alias("cur"),
                           F.concat(F.col("eids"), F.array(F.col("eid"))).alias("eids"),
                           F.concat(F.col("vids"), F.array(F.col("dst"))).alias("vids"),
                           (F.col("len") + 1).alias("len"),
                           (F.col("weight") + F.col("w")).alias("weight"),
                       )
        # pin the hop join: isEmpty, the rank union, and the frontier
        # count below would otherwise each recompute it from scratch
        step = step.persist()
        if step.isEmpty():
            step.unpersist()
            break
        allp = paths.unionByName(step)
        w = Window.partitionBy("seed", "cur").orderBy(F.col("weight").asc(), F.col("len").asc())
        allp = allp.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= limit)
        new_paths = allp.drop("_rn")
        new_paths = _maybe_checkpoint(new_paths, k, checkpoint_every).cache()
        # frontier = rows changed this round (still candidates to extend).
        # Anti-join on full path identity (seed, cur, eids) — NOT just
        # (seed, cur): a cheaper path to an already-reached vertex must be
        # re-extended or downstream weights stay stale.
        frontier = new_paths.join(
            paths.select("seed", "cur", "eids"),
            ["seed", "cur", "eids"], "left_anti",
        ).cache()
        paths = new_paths
        fcount = frontier.count()
        if fcount == 0:
            break

    out = paths.join(pairs, (paths.seed == pairs.seed) & (paths.cur == pairs.target)) \
               .select(paths.seed, F.col("cur").alias("target"), "eids", "vids", "len", "weight") \
               .filter(F.col("len") > 0)
    w = Window.partitionBy("seed", "target").orderBy(F.col("weight").asc(), F.col("len").asc())
    return out.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= limit).drop("_rn")
