"""Graph analytics over edge frames — the algorithm layer a user of a
graph database expects next to pathfinding (the reference ships no
GDS-style library; these are extensions, like streaming).

Operators take a plain (src, dst) edge DataFrame — the compiler's edge
scans, a label snapshot, or any relational projection — so they compose
with both the Cypher layer and raw tables. All of them are expressed as
joins + aggregates (Catalyst-optimizable, AQE-broadcastable); pagerank's
fixed iteration count keeps the lineage shallow enough that no
checkpointing is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_stats(
    edges: DataFrame,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """Per-vertex (out_deg, in_deg). ``vertices`` (single ``id``
    column) widens the universe so isolated vertices report zeros.
    Two narrow aggregates + one outer join; at scale the shuffles
    carry (id, count) rows only."""
    out_d = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg"))
    in_d = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_deg"))
    base = out_d.join(in_d, "id", "full")
    if vertices is not None:
        base = vertices.select("id").distinct().join(base, "id", "left")
    return base.select(
        "id",
        F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
        F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"))


def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank: pr = (1-d) + d * sum(pr_src/out_deg)
    over incoming edges (the classic un-normalized formulation;
    dangling vertices simply stop contributing — documented
    simplification, same one most SQL formulations make). A fixed
    ``iters`` makes the result a deterministic closed-form join chain,
    so an external SQL oracle can replay it exactly; per iteration one
    (id, contribution) shuffle + one join — the edge relation itself
    is never re-shuffled when AQE broadcasts the (narrow) rank frame.
    Returns (id, pr double)."""
    verts = vertices.select("id").distinct()
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("_deg"))
    # (src, dst, src out-degree): static across iterations
    ed = edges.join(deg.withColumnRenamed("id", "src"), "src")
    pr = verts.select("id", F.lit(1.0).alias("pr"))
    for _ in range(iters):
        contrib = (ed.join(pr.withColumnRenamed("id", "src"), "src")
                   .groupBy(F.col("dst").alias("id"))
                   .agg(F.sum(F.col("pr") / F.col("_deg")).alias("_c")))
        pr = (verts.join(contrib, "id", "left")
              .select("id",
                      (F.lit(1.0 - damping)
                       + F.lit(damping) * F.coalesce("_c", F.lit(0.0))).alias("pr")))
    return pr
