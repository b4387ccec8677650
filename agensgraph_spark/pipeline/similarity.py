"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline — one (broadcast) join
  of the query set against the corpus, dot products via zip_with/
  aggregate (JVM-side), window top-k;
- LSH-bucketed ANN: random-hyperplane signatures shrink the candidate
  set; buckets join instead of cross product — the 100 TB path.

Hyperplanes are generated from a fixed seed so results are
deterministic run-to-run and cluster-layout-independent.
"""

from __future__ import annotations

import logging

import numpy as np
from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F

from agensgraph_spark.pipeline.dedup import _warn_async
from agensgraph_spark.pipeline.util import maybe_broadcast

log = logging.getLogger(__name__)


def matrix_lit(rows: "list[list[float]]") -> Column:
    """Nested array<array<double>> literal in ONE JVM call. ``F.lit``
    on a nested Python list crosses py4j once PER ELEMENT (a 16x64
    centroid matrix = ~2,100 round trips = ~2s of pure DRIVER time per
    query construction, measured via cProfile — the same disease
    `_sig_slots_sql` documents for the minhash projection). Rendering
    the matrix as SQL text and parsing it JVM-side makes it a single
    call. Exactness: Python's repr of a float is the shortest string
    that round-trips to the same double, and Spark's literal parser
    reads the 'D'-suffixed form back to exactly that double, so the
    resulting literal is bit-identical to the F.lit element path."""
    txt = ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in r) + ")"
        for r in rows)
    return F.expr(f"array({txt})")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow_max_queries: int = 10_000,
) -> DataFrame:
    """Exact top-k neighbors per query vector (query set is broadcast —
    the corpus is never shuffled). Excludes self-pairs. Ties broken by
    neighbor id for determinism.

    Fast path (r15, guide §4.2): the query set is a bounded serving
    batch by contract, so it is collected once and the |C| x |Q| score
    matrix runs as ONE BLAS matmul per Arrow batch with an in-batch
    partial top-k (exact (cos DESC, id ASC) tie rule — a per-batch
    top-k merged by the global window is exactly the global top-k).
    The JVM broadcast-join path (interpreted per-pair zip_with dots —
    measured ~0.7 s for 2000x20 pairs at sf0.1) remains for oversized
    query sets (``arrow_max_queries``, probed with a bounded limit,
    never a full count) and for non-numeric corpora it would not help.
    Degenerate inputs refuse loudly like every Arrow vector path here:
    NULL/ragged embeddings (`_list_mat`) and zero-norm vectors (0/0
    cosine) raise instead of silently producing NaN ranks."""
    n_q = len(queries.limit(arrow_max_queries + 1).select(id_col).collect())
    if 0 < n_q <= arrow_max_queries:
        return _brute_topk_arrow(corpus, queries, k, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).select("query_id", "qv", norm(F.col("qv")).alias("qn"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).select("neighbor_id", "cv", norm(F.col("cv")).alias("cn"))
    joined = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    scored = joined.select(
        "query_id", "neighbor_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos_sim"),
    )
    return _rank_topk(scored, k)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Global (cos DESC, neighbor ASC) top-k + display rounding — the
    shared tail of both brute paths."""
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round(F.col("cos_sim"), 6).alias("cos_sim"),
                    F.col("rank").cast("long").alias("rank")))


def _brute_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """BLAS scorer for `brute_cosine_topk`: per Arrow batch, one
    matmul against the collected query matrix and an exact in-batch
    partial top-k (at most |Q| x k rows leave each batch), then the
    same global window as the JVM path. Values are the same cosine
    doubles; per-batch selection cannot change the global top-k
    because selection and merge use the identical total order."""
    import pyarrow as pa

    qrows = queries.select(F.col(id_col), F.col(vec_col)
                           .cast("array<double>")).collect()
    q_ids = [r[0] for r in qrows]
    if any(i is None for i in q_ids):
        raise ValueError("brute_cosine_topk: NULL query id")
    Q = np.asarray([r[1] for r in qrows], dtype=np.float64)
    if Q.ndim != 2:
        raise ValueError("brute_cosine_topk: ragged/NULL query vectors")
    qn = np.sqrt(np.einsum("ij,ij->i", Q, Q))
    if (qn == 0).any():
        raise ValueError("brute_cosine_topk: zero-norm query vector")
    dim = Q.shape[1]
    QT = Q.T.copy()
    n_q = len(q_ids)

    base = corpus.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).cast("array<double>").alias("_v"))
    id_field = base.schema["neighbor_id"]
    q_field = queries.select(F.col(id_col).alias("query_id")) \
        .schema["query_id"]

    def score(batches):
        qi = np.asarray(q_ids)
        for b in batches:
            if b.num_rows == 0:
                continue
            ids = b.column(0)
            V = _list_mat(b.column(1), dim)
            cn = np.sqrt(np.einsum("ij,ij->i", V, V))
            if (cn == 0).any():
                raise ValueError(
                    "brute_cosine_topk: zero-norm corpus vector")
            S = (V @ QT) / np.outer(cn, qn)  # (rows, n_q)
            nid = ids.to_numpy(zero_copy_only=False)
            out_q, out_n, out_s = [], [], []
            for j in range(n_q):
                col = S[:, j]
                sel = np.flatnonzero(nid != qi[j])  # no self-pairs
                if sel.size == 0:
                    continue
                # exact (cos DESC, id ASC): stable lexsort, primary
                # key last
                order = sel[np.lexsort((nid[sel], -col[sel]))][:k]
                out_q.extend([q_ids[j]] * len(order))
                out_n.append(order)
                out_s.append(col[order])
            if not out_q:
                continue
            take = np.concatenate(out_n)
            yield pa.record_batch([
                pa.array(out_q),
                ids.take(pa.array(take)),
                pa.array(np.concatenate(out_s), type=pa.float64()),
            ], names=["query_id", "neighbor_id", "cos_sim"])

    import pyspark.sql.types as T
    out_schema = T.StructType([
        T.StructField("query_id", q_field.dataType),
        T.StructField("neighbor_id", id_field.dataType),
        T.StructField("cos_sim", T.DoubleType()),
    ])
    scored = base.mapInArrow(score, out_schema)
    return _rank_topk(scored, k)


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_id: int | None = None,
    n_rows: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos_sim ≥
    threshold). Exact over a bounded id range (the verification shape);
    at corpus scale, feed LSH-bucketed candidates (``lsh_cosine_topk``
    machinery) instead of the bounded self-join.

    No driver-side probes: the broadcast decision uses the caller's
    ``n_rows``/``dim`` when given, else the ``max_id`` bound (ids are
    non-negative and unique, so the filtered side holds at most
    ``max_id`` rows) with a conservative 1024-dim estimate. With no
    bound at all the hint is omitted and AQE picks the strategy from
    runtime statistics — an extra Spark job per call is never worth a
    hint AQE would choose anyway."""
    base = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v"))
    if max_id is not None:
        base = base.filter(F.col("_id") < max_id)
        if n_rows is None:
            n_rows = max_id
    # compute each row's norm ONCE, before the O(n²) join, and carry it
    # as a scalar column: per-pair work is then one dot + a divide
    # instead of dot + two array-norm traversals — higher-order array
    # expressions are interpreted (no codegen), so tripling the element
    # traffic inside the pair loop costs ~3x on the whole op. Same
    # expression values as cosine(va, vb): dot/(norm(a)*norm(b)).
    withn = base.select("_id", "_v", norm(F.col("_v")).alias("_n"))
    a = withn.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                     F.col("_n").alias("na"))
    b = withn.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                     F.col("_n").alias("nb"))
    if n_rows is not None:
        b = maybe_broadcast(b, (dim or 1024) * 8 + 32, n_rows=n_rows)
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (pairs.select("id_a", "id_b", cos.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane sign bits packed into ONE long (n_planes <= 52,
    guarded below — pow-based packing is exact only while 2^j fits a
    double's mantissa). The plane matrix is ONE
    nested-array literal — building it per-element (n_planes × dim
    Literal nodes) makes Catalyst analysis and whole-stage codegen the
    dominant cost, megabytes of generated code for a cheap kernel."""
    if len(planes) > 52:
        # pow-based bit packing is exact only while 2^j fits a double's
        # mantissa (j <= 52), and the single-long signature caps at 64
        # planes regardless — a silent wrong signature is worse than a
        # refusal (split into multiple <=52-bit words upstream if more
        # planes are ever needed)
        raise ValueError(
            f"lsh_signature: n_planes={len(planes)} exceeds the 52-plane "
            "single-long packing limit (2^j double exactness)")
    pm = matrix_lit(planes)
    dots = F.transform(pm, lambda p: dot(vec, p))
    idx = F.sequence(F.lit(0), F.lit(len(planes) - 1))
    # 2^j via pow (shiftleft needs a literal shift amount); exact for
    # j <= 52 in double arithmetic, enforced by the guard above
    bits = F.zip_with(dots, idx,
                      lambda d, j: (d > 0).cast("long") * F.pow(F.lit(2.0), j).cast("long"))
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, v: acc + v)


def unit_normalized(cents: "list[list[float]]") -> "list[list[float]]":
    """Row-normalize a centroid matrix to unit vectors (zero rows pass
    through unchanged). The dot-product quantizers in this module
    (``semantic_dedup``, ``ivf_cosine_topk``) assume unit centroids —
    trained centroids from ``train_ivf_centroids`` are per-cluster
    MEANS, so normalize them before use. Per-row argmax is unchanged
    relative to cosine against the raw means (dividing by the row norm
    is a per-row constant), which is what external oracles replay."""
    a = np.asarray(cents, dtype=float)
    n = np.linalg.norm(a, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return [[float(x) for x in c] for c in (a / n)]


def _resolve_cents(
    corpus: DataFrame,
    vec_col: str,
    n_lists: int,
    seed: int,
    dim: int | None,
    cents: "list[list[float]] | None",
) -> np.ndarray:
    """Caller-supplied (trained) centroids, else seeded random unit
    directions — the shared quantizer-default of ivf_cosine_topk /
    semantic_dedup / ivf_pq_topk."""
    if cents is not None:
        return np.asarray(cents, dtype=float)
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    cm = rng.standard_normal((n_lists, dim))
    cm /= np.linalg.norm(cm, axis=1, keepdims=True)
    return cm


def _centroid_tagged(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    cm: np.ndarray,
) -> DataFrame:
    """(_id, _v, _n, _list) frame: each row tagged with its nearest
    centroid by dot-product argmax; tie -> higher index (same order as
    ivf_cosine_topk's reverse(array_sort(struct(s, i)))). One narrow
    map-only pass — persistable with the snapshot at scale."""
    n_lists = len(cm)
    cmat = matrix_lit(cm)
    base = corpus.select(F.col(id_col).alias("_id"),
                         F.col(vec_col).cast("array<double>").alias("_v"))
    base = base.select("_id", "_v", norm(F.col("_v")).alias("_n"))
    sims = F.transform(cmat, lambda c: dot(F.col("_v"), c))
    idx = F.sequence(F.lit(0), F.lit(n_lists - 1))
    pairs = F.zip_with(sims, idx, lambda s, i: F.struct(s.alias("s"), i.alias("i")))
    return base.withColumn(
        "_list", F.reverse(F.array_sort(pairs)).getItem(0).getField("i"))



def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    dim: int | None = None,
    cents: "list[list[float]] | None" = None,
) -> DataFrame:
    """IVF-style ANN: a coarse quantizer partitions the corpus into
    ``n_lists`` inverted lists (nearest-centroid assignment); each query
    scans only its ``n_probe`` closest lists, then exact cosine re-ranks.

    Centroids are random unit directions from a fixed seed — a real
    deployment would k-means them, but assignment/probing mechanics
    (the part that must scale) are identical: one narrow pass to tag
    the corpus (the tag is persistable with the snapshot, so at 100 TB
    assignment is written once, not recomputed per query), a bucket
    join in place of the cross product.

    ``dim`` should be passed by callers that know the embedding width
    (it is a dataset constant) — the ``first()`` fallback costs one
    driver-side Spark job per call."""
    cents = _resolve_cents(corpus, vec_col, n_lists, seed, dim, cents)
    n_lists = len(cents)

    # r14: both tag passes run on the Arrow engine (numpy matmul
    # argmax/arg-top, guide §4.2) instead of the JVM interpreted
    # transform over a ~n_lists*dim-literal centroid array that rode
    # the plan once per side. Tie rule preserved exactly: score DESC,
    # then index DESC (the reverse(array_sort(struct(s, i))) order the
    # SQL oracle replays). Dividing by the row norm cannot change a
    # per-row argmax, so the tag skips it like the oracle does.
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c_tag = _centroid_tag_arrow(c, np.asarray(cents, dtype=float),
                                "neighbor_id", "cv", "cn", 1)
    q_tag = _centroid_tag_arrow(q, np.asarray(cents, dtype=float),
                                "query_id", "qv", "qn", n_probe)

    cand = c_tag.join(F.broadcast(q_tag), "_list") \
                .filter(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", F.round(F.col("cos_sim"), 6).alias("cos_sim"),
                    F.col("rank").cast("long").alias("rank")))


def _list_mat(col, dim: int) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow list<double> column —
    one flatten + reshape over the contiguous values buffer, no
    per-row Python. Nulls and ragged rows refuse loudly (the cosine
    math would silently misalign every following row)."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    if arr.null_count:
        raise ValueError("semantic_dedup: NULL embedding in corpus")
    flat_arr = arr.flatten()
    if flat_arr.null_count:
        # a null ELEMENT inside an embedding passes the top-level null
        # check and the length check, then silently becomes NaN in the
        # matmul — refuse it as loudly as a null row (r14 ADVICE)
        raise ValueError(
            "semantic_dedup: NULL element inside an embedding vector")
    flat = flat_arr.to_numpy(zero_copy_only=False)
    n = len(arr)
    if flat.shape[0] != n * dim:
        raise ValueError(
            f"semantic_dedup: ragged embeddings (got {flat.shape[0]} "
            f"values for {n} rows of dim {dim})")
    return flat.reshape(n, dim)


def _centroid_tag_arrow(
    base: DataFrame,
    cm: np.ndarray,
    id_name: str,
    vec_name: str,
    norm_name: str,
    topn: int,
) -> DataFrame:
    """(id, vec, norm, _list) via one Arrow pass: numpy matmul against
    the centroid matrix, arg-top with the score-DESC-then-index-DESC
    tie rule (identical to the JVM reverse(array_sort(struct(s, i)))
    and to the SQL oracle's ROW_NUMBER ordering). ``topn`` > 1 emits
    one row per probed list (the query-side explode). The centroid
    matrix ships in the task closure — it never rides the plan as a
    literal."""
    import pyarrow as pa

    from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                                   StructField, StructType)

    dim = cm.shape[1]
    n_lists = len(cm)
    cmT = np.ascontiguousarray(cm.T)
    id_type = base.schema[0].dataType
    schema = StructType([
        StructField(id_name, id_type),
        StructField(vec_name, ArrayType(DoubleType())),
        StructField(norm_name, DoubleType()),
        StructField("_list", IntegerType()),
    ])

    def go(it):
        for b in it:
            V = _list_mat(b.column(1), dim)
            nrm = np.sqrt(np.einsum("ij,ij->i", V, V))
            S = V @ cmT  # (rows, n_lists)
            if topn == 1:
                tags = (n_lists - 1
                        - S[:, ::-1].argmax(axis=1)).astype(np.int32)
                yield pa.record_batch(
                    [b.column(0), b.column(1),
                     pa.array(nrm, pa.float64()),
                     pa.array(tags, pa.int32())],
                    names=[id_name, vec_name, norm_name, "_list"])
            else:
                rows = len(nrm)
                # stable sort over the REVERSED columns: equal scores
                # keep the lower reversed index = higher original one
                order = np.argsort(-S[:, ::-1], axis=1,
                                   kind="stable")[:, :topn]
                tags = (n_lists - 1 - order).astype(np.int32)
                idx = pa.array(np.repeat(np.arange(rows), topn),
                               pa.int64())
                yield pa.record_batch(
                    [b.column(0).take(idx), b.column(1).take(idx),
                     pa.array(np.repeat(nrm, topn), pa.float64()),
                     pa.array(tags.reshape(-1), pa.int32())],
                    names=[id_name, vec_name, norm_name, "_list"])

    return base.mapInArrow(go, schema)


def _semantic_dedup_arrow(
    base: DataFrame,
    cm: np.ndarray,
    max_cluster: int,
) -> DataFrame:
    """Capped-mode scoring engine for ``semantic_dedup`` (r14): tag +
    within-cluster max-lower-cosine as two Arrow stages with the
    quadratic inner product handed to numpy/BLAS per batch (guide
    §4.2), replacing the JVM self-join + two windows. Plan shape:
    Scan -> MapInArrow(tag) -> ONE Exchange(cluster) -> Sort(cluster,
    id) -> MapInArrow(stream-score) — no self-join, no window, no
    broadcast, and the per-task state is bounded at max_cluster x dim
    doubles per active cluster (the head buffer), initialised once per
    task and carried across batches (guide §4.5). Emits (_id, cluster
    int, _mlc double, _rnb long) with _mlc NULL for rank-1 rows."""
    import pyarrow as pa

    from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                                   LongType, StructField, StructType)

    dim = cm.shape[1]
    n_lists = len(cm)
    cmT = np.ascontiguousarray(cm.T)  # (dim, n_lists) float64
    cap = int(max_cluster)
    id_type = base.schema[0].dataType

    tag_schema = StructType([
        StructField("_id", id_type),
        StructField("_v", ArrayType(DoubleType())),
        StructField("_list", IntegerType()),
    ])

    def tag_batches(it):
        for b in it:
            V = _list_mat(b.column(1), dim)
            sims = V @ cmT  # (n, n_lists)
            # tie -> HIGHER index (same rule as the JVM
            # reverse(array_sort(struct(s, i))) argmax): argmax over the
            # reversed columns picks the first max = highest original i
            tags = (n_lists - 1
                    - sims[:, ::-1].argmax(axis=1)).astype(np.int32)
            yield pa.record_batch(
                [b.column(0), b.column(1), pa.array(tags, pa.int32())],
                names=["_id", "_v", "_list"])

    out_schema = StructType([
        StructField("_id", id_type),
        StructField("cluster", IntegerType()),
        StructField("_mlc", DoubleType()),
        StructField("_rnb", LongType()),
    ])

    def score_batches(it):
        # streaming per-cluster state (input sorted by cluster, id):
        # head = the cap LOWEST-id vectors of the current cluster —
        # exactly the b-side of the ranked JVM join, so a row at
        # global rank r compares against head rows ranked
        # <= min(r-1, cap) and nothing else
        cur: int | None = None
        headM = np.empty((0, dim))
        headN = np.empty((0,))
        cnt = 0
        for b in it:
            lists = b.column(2).to_numpy(zero_copy_only=False)
            V = _list_mat(b.column(1), dim)
            rn = np.sqrt(np.einsum("ij,ij->i", V, V))
            if not rn.all():
                # 0/0 cosine: the JVM exact path yields NaN (keep=False
                # since NaN < tau is false) while NaN here would become
                # NULL through from_pandas=True (keep=True) — refuse
                # the degenerate vector loudly instead of letting the
                # two modes silently diverge (r14 ADVICE)
                raise ValueError(
                    "semantic_dedup: zero-norm embedding in corpus — "
                    "cosine is undefined (0/0); drop or repair "
                    "degenerate vectors upstream")
            m = len(lists)
            mlc = np.full(m, np.nan)
            rnb = np.empty(m, dtype=np.int64)
            idx = 0
            while idx < m:
                lv = int(lists[idx])
                end = idx + 1
                while end < m and lists[end] == lv:
                    end += 1
                if lv != cur:
                    cur, cnt = lv, 0
                    headM, headN = np.empty((0, dim)), np.empty((0,))
                seg = end - idx
                R, Rn = V[idx:end], rn[idx:end]
                need = max(0, min(cap - cnt, seg))
                H = np.vstack([headM, R[:need]]) if need else headM
                Hn = np.concatenate([headN, Rn[:need]]) if need else headN
                if len(H):
                    C = (H @ R.T) / (Hn[:, None] * Rn[None, :])
                    ii = np.arange(len(H))[:, None]
                    jj = np.arange(seg)[None, :]
                    C = np.where(ii < (cnt + jj), C, -np.inf)
                    best = C.max(axis=0)
                    has = np.minimum(cnt + np.arange(seg), len(H)) > 0
                    mlc[idx:end] = np.where(has, best, np.nan)
                rnb[idx:end] = cnt + 1 + np.arange(seg)
                headM, headN, cnt = H, Hn, cnt + seg
                idx = end
            yield pa.record_batch(
                [b.column(0), b.column(2),
                 pa.array(mlc, pa.float64(), from_pandas=True),
                 pa.array(rnb, pa.int64())],
                names=["_id", "cluster", "_mlc", "_rnb"])

    tagged = base.mapInArrow(tag_batches, tag_schema)
    part = (tagged.repartition("_list")
            .sortWithinPartitions("_list", "_id"))
    return part.mapInArrow(score_batches, out_schema)


def semantic_dedup(
    corpus: DataFrame,
    tau: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    dim: int | None = None,
    cents: "list[list[float]] | None" = None,
    max_cluster: "int | None" = None,
    audit_cap: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column:
    coarse-cluster every vector to its nearest centroid (the same
    seeded-unit-direction quantizer as ``ivf_cosine_topk``; pass
    ``cents`` for trained centroids — ``unit_normalized(
    train_ivf_centroids(...))`` is the production path, since the
    seeded random directions give unbalanced clusters on real
    non-isotropic embeddings), then WITHIN each cluster drop any
    item whose cosine to some lower-id cluster-mate reaches ``tau`` —
    the deterministic keep-lowest-id variant of the SemDeDup rule.

    Returns (vec_id, cluster, max_lower_cos, keep, capped): ``keep``
    marks the cluster-canonical survivors; ``max_lower_cos`` is NULL
    for the lowest id of its cluster; ``capped`` is True exactly for
    the rows whose ``max_lower_cos`` is only a LOWER bound under the
    ``max_cluster`` skew cap (rank > max_cluster + 1 within the
    cluster — a rank cap+1 row still sees all its lower-id mates) so
    downstream keep/drop pipelines can route them to a verify stage.

    Scale shape: one narrow tag pass (persistable with the snapshot),
    then a self-join confined within clusters — expected list size is
    corpus/n_lists, so raise ``n_lists`` with corpus size to keep the
    quadratic term bounded; the corpus never crosses clusters and is
    never broadcast.

    ``max_cluster`` is the skew guard (mirroring minhash's
    ``max_bucket``): the within-cluster term is quadratic, so ONE hot
    cluster — likely with the untrained default quantizer — silently
    degrades toward all-pairs. The default is None — exact semantics;
    callers OPT IN to the cap (production at corpus scale should pass
    one: the registry row passes 10_000 explicitly) rather than
    discovering that a >cap cluster silently changed results.
    With the cap, each row compares only
    against the ``max_cluster`` LOWEST-id members of its cluster,
    bounding the join at size x cap (linear in the hot cluster)
    instead of size². Rows inside the head keep exact semantics (all
    their lower-id mates are in the head); overflow rows get a lower
    bound of max_lower_cos — near-dup mass concentrates on the
    canonical low-id survivors, so the keep rule degrades gracefully.
    The cap is never silent: always announced via log; pass
    ``audit_cap=True`` to count capped rows inside the normal job
    (Observation — no extra Spark job) and WARN with the number, or
    run ``semdedup_skew_stats()`` for the deterministic audit."""
    cm = _resolve_cents(corpus, vec_col, n_lists, seed, dim, cents)
    if max_cluster is not None:
        # r14: the capped path runs on the Arrow engine — ONE cluster
        # exchange, a partition-local sort, and a streaming numpy
        # scorer whose state is bounded at max_cluster x dim doubles
        # (see _semantic_dedup_arrow; guide §4.2/§4.5). Output-
        # identical to the old ranked-join formulation: head rows keep
        # exact semantics, overflow rows lower-bound, `capped` flags
        # rank > max_cluster + 1. The EXACT (max_cluster=None) path
        # below stays on the distributed JVM self-join, which handles
        # an unbounded hot cluster by spilling across tasks instead of
        # holding it in one Python worker.
        base = corpus.select(F.col(id_col).alias("_id"),
                             F.col(vec_col).cast("array<double>").alias("_v"))
        scored = _semantic_dedup_arrow(base, cm, max_cluster)
        if audit_cap:
            obs = Observation()
            scored = scored.observe(
                obs, F.sum((F.col("_rnb") > max_cluster).cast("long"))
                .alias("capped_members"))
            _warn_async(obs, "capped_members",
                        "semantic_dedup: %s cluster member(s) beyond "
                        f"max_cluster={max_cluster} excluded from the "
                        "comparison head — a hot cluster (untrained "
                        "centroids?) only lower-bounds max_lower_cos "
                        "for its overflow rows")
        else:
            log.info(
                "semantic_dedup: skew cap max_cluster=%d active — "
                "overflow rows of a hot cluster compare only against "
                "the cluster head; pass audit_cap=True or run "
                "semdedup_skew_stats() to count them", max_cluster)
        # keep compares the UNROUNDED max (same as the JVM path, whose
        # filter also ran on the raw aggregate before rounding)
        return scored.select(
            F.col("_id").alias("vec_id"),
            F.col("cluster").cast("long").alias("cluster"),
            F.round("_mlc", 6).alias("max_lower_cos"),
            F.coalesce(F.col("_mlc") < tau, F.lit(True)).alias("keep"),
            (F.col("_rnb") > max_cluster + 1).alias("capped"))
    tagged = _centroid_tagged(corpus, id_col, vec_col, cm)

    a = tagged.select(F.col("_id").alias("vec_id"), F.col("_v").alias("va"),
                      F.col("_n").alias("na"), F.col("_list").alias("cluster"))
    b = tagged.select(F.col("_id").alias("_ib"), F.col("_v").alias("vb"),
                      F.col("_n").alias("nb"), F.col("_list").alias("cluster"))
    out = a.select("vec_id", "cluster", F.lit(False).alias("_capped"))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    lower = (a.join(b, "cluster").filter(F.col("_ib") < F.col("vec_id"))
              .groupBy("vec_id").agg(F.max(cos).alias("max_lower_cos")))
    return (out.join(lower, "vec_id", "left")
               .select("vec_id", F.col("cluster").cast("long").alias("cluster"),
                       F.round("max_lower_cos", 6).alias("max_lower_cos"),
                       (F.coalesce(F.col("max_lower_cos") < tau, F.lit(True)))
                       .alias("keep"),
                       F.col("_capped").alias("capped")))


def semdedup_skew_stats(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    seed: int = 42,
    dim: int | None = None,
    cents: "list[list[float]] | None" = None,
    max_cluster: int = 10_000,
) -> DataFrame:
    """Deterministic audit for semantic_dedup's cluster-skew cap
    (mirror of dedup.lsh_skew_stats): the cluster-size distribution
    the SAME quantizer parameters would induce, and how many clusters
    overflow ``max_cluster``. One aggregate job over the tag pass —
    run it before committing to a quantizer on a new corpus; a large
    ``max_cluster_size``/``sum_sq_sizes`` with the seeded default says
    train centroids (``train_ivf_centroids`` + ``unit_normalized``)
    or raise ``n_lists``. ``sum_sq_sizes`` is the uncapped pair-join
    row count — the actual quadratic cost driver."""
    cm = _resolve_cents(corpus, vec_col, n_lists, seed, dim, cents)
    tagged = _centroid_tagged(corpus, id_col, vec_col, cm)
    sizes = tagged.groupBy("_list").agg(F.count(F.lit(1)).alias("_n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum((F.col("_n") >= 2).cast("long")).alias("n_pairable"),
        F.sum((F.col("_n") > max_cluster).cast("long")).alias("n_over_cap"),
        F.max("_n").alias("max_cluster_size"),
        F.sum(F.col("_n") * F.col("_n")).alias("sum_sq_sizes"),
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates = rows sharing a full signature in
    any of ``n_tables`` hyperplane tables, then exact cosine re-rank.
    The bucket join replaces the cross product — candidate count is
    |bucket| not |corpus|."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv")) \
              .select("neighbor_id", "cv", norm(F.col("cv")).alias("cn"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv")) \
               .select("query_id", "qv", norm(F.col("qv")).alias("qn"))

    # all tables' signatures in ONE pass: (table, sig) via posexplode,
    # single equi-join on the pair — n_tables separate join branches
    # would multiply both the shuffle count and the (large) codegen of
    # the signature expressions by n_tables
    def all_sigs(vec: Column) -> Column:
        return F.array(*[
            lsh_signature(vec, _hyperplanes(dim, n_planes, seed=42 + t))
            for t in range(n_tables)])

    cb = c.select("neighbor_id", F.posexplode(all_sigs(F.col("cv"))).alias("_t", "sig"))
    qb = q.select("query_id", F.posexplode(all_sigs(F.col("qv"))).alias("_t", "sig"))
    cand = (cb.join(F.broadcast(qb), ["_t", "sig"])
            .select("query_id", "neighbor_id")
            .distinct().filter(F.col("query_id") != F.col("neighbor_id")))

    scored = (cand.join(q, "query_id").join(c, "neighbor_id")
              .select("query_id", "neighbor_id",
                      (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", F.round(F.col("cos_sim"), 6).alias("cos_sim"),
                    F.col("rank").cast("long").alias("rank")))


def quantize_embeddings(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the storage/serving
    format large training pipelines keep embeddings in (4x smaller,
    SIMD-friendly). scale = max(|x|)/127; q_i = floor(x_i * 127 /
    max|x|). floor, not round: floor over doubles is engine-exact,
    while SQL engines disagree on round-half behavior — the q/scale
    pair must reproduce bit-identically everywhere the corpus is read.
    Map-only column expressions; zero vectors quantize to zeros with
    scale 0."""
    v = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    q = F.when(amax > 0,
               F.transform(v, lambda x: F.floor(x * F.lit(127.0) / amax)
                           .cast("int"))) \
         .otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.select(
        F.col(id_col),
        (amax / F.lit(127.0)).alias("scale"),
        q.alias("q"),
    )


def neighbor_mean_embeddings(
    pairs: DataFrame,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = True,
    rounds: int = 1,
) -> DataFrame:
    """``rounds`` rounds of GNN-style feature propagation: each vertex's
    embedding becomes the element-wise mean over its (undirected)
    neighborhood — the smoothing/centroid step graph-ML pipelines and
    cluster-representative selection both use.

    Shape: posexplode to (id, pos, val) rows, one (id, pos) mean
    aggregate, re-assemble ordered arrays — the shuffle carries
    |edges| x dim scalar rows (linear; the standard distributed
    feature-propagation layout; blocked matmuls only win once the
    adjacency is cached dense). Unpaired vertices keep their own
    embedding when ``include_self``, else drop out. Returns
    (id, embedding array<double>)."""
    sym = pairs.select(F.col("id_a").alias("s"), F.col("id_b").alias("d")) \
               .unionByName(pairs.select(F.col("id_b").alias("s"),
                                         F.col("id_a").alias("d")))
    if include_self:
        ids = emb.select(F.col(id_col).alias("s"))
        sym = sym.unionByName(ids.select("s", F.col("s").alias("d")))
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    cur = emb.select(F.col(id_col).alias("d"),
                     F.col(vec_col).cast("array<double>").alias("_v"))
    for i in range(rounds):
        flat = (sym.join(cur, "d")
                .select("s", F.posexplode("_v").alias("pos", "val")))
        agg = flat.groupBy("s", "pos").agg(F.avg("val").alias("m"))
        cur = (agg.groupBy("s")
               .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"))
               .select(F.col("s").alias("d"), F.col("_pm.m").alias("_v")))
        if i + 1 < rounds:
            # truncate lineage between rounds (same rationale as the
            # other iterative operators; a couple of rounds is typical,
            # so eager checkpoints stay cheap)
            cur = cur.localCheckpoint()
    return cur.select(F.col("d").alias(id_col), F.col("_v").alias("embedding"))


def kmeans_update(
    emb: DataFrame,
    cents: "list[list[float]]",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd iteration over a fixed centroid matrix: cosine-argmax
    assignment (same tie rule as ivf_cosine_topk — score desc, index
    desc), then per-cluster element-wise mean. Returns (list_id,
    n_assigned, centroid array<double>) — feed the centroids back in to
    iterate; every step is a deterministic closed form an external SQL
    oracle can replay. Assignment is a map-only pass; the update
    shuffles (cluster, pos, val) scalar rows — linear in corpus x dim,
    the standard distributed k-means layout."""
    n_lists = len(cents)
    cm = matrix_lit(cents)
    v = F.col(vec_col).cast("array<double>")
    sims = F.transform(cm, lambda c: dot(v, c) / (norm(v) * norm(c)))
    idx = F.sequence(F.lit(0), F.lit(n_lists - 1))
    packed = F.zip_with(sims, idx, lambda s, i: F.struct(s.alias("s"), i.alias("i")))
    assign = F.reverse(F.array_sort(packed)).getItem(0).getField("i")
    tagged = emb.select(assign.alias("list_id"), v.alias("_v"))
    flat = tagged.select("list_id", F.posexplode("_v").alias("pos", "val"))
    agg = flat.groupBy("list_id", "pos").agg(
        F.avg("val").alias("m"), F.count(F.lit(1)).alias("n"))
    return (agg.groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("_pm"),
                 F.first("n").alias("n_assigned"))
            .select("list_id", F.col("n_assigned").cast("long").alias("n_assigned"),
                    F.col("_pm.m").alias("centroid")))


def train_ivf_centroids(
    emb: DataFrame,
    n_lists: int = 16,
    rounds: int = 3,
    seed: int = 42,
    dim: int | None = None,
    vec_col: str = "embedding",
) -> "list[list[float]]":
    """A few Lloyd rounds from seeded unit directions — the centroid
    matrix ``ivf_cosine_topk(cents=...)`` consumes. Only the
    n_lists x dim centroid matrix ever reaches the driver (collecting
    it is the point: it becomes a broadcast literal); each round is one
    distributed kmeans_update pass. Empty clusters keep their previous
    centroid, so the list count is stable round to round."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_lists, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    cents = [[float(x) for x in c] for c in cents]
    for _ in range(rounds):
        got = {r["list_id"]: list(r["centroid"])
               for r in kmeans_update(emb, cents, vec_col).collect()}
        cents = [got.get(i, cents[i]) for i in range(n_lists)]
    return cents


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-compressed ANN path: a d-dim
# float vector becomes m small codes (here m bytes), and search scores
# a candidate with m table lookups instead of a d-dim dot product.
# At 100 TB this is what makes the corpus fit serving memory (32x
# smaller at m=4, d=32, float32) and the scan bandwidth-bound instead
# of FLOP-bound; compose with the IVF router (ivf_cosine_topk's list
# tagging) so each query scans only its probed lists' codes.

def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "list[list[list[float]]]":
    """Deterministic PQ codebooks: the ``k`` lowest-id corpus vectors
    donate their subvectors, so an external SQL engine can re-derive
    the books and replay encode+search bit-exactly (the gate oracle
    does). Production would Lloyd-iterate each subspace (kmeans_update
    per subspace slice) — the encode/search mechanics, which are the
    part that must scale, are identical. Returns books[s][j] =
    subvector j of subspace s."""
    rows = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    vecs = [[float(x) for x in r[0]] for r in rows]
    if not vecs or len(vecs[0]) % m != 0:
        raise ValueError(f"embedding dim must be divisible by m={m}")
    d = len(vecs[0]) // m
    return [[v[s * d:(s + 1) * d] for v in vecs] for s in range(m)]


def _sq_l2(a: Column, b) -> Column:
    """Squared L2 distance, accumulated in fixed element order so every
    engine reproduces it bit-for-bit ((a-b)*(a-b), not pow)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                       F.lit(0.0), lambda acc, v: acc + v)


def pq_encode(
    df: DataFrame,
    books: "list[list[list[float]]]",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each subvector its nearest codebook entry (squared-L2,
    ties to the lowest code — struct array_min compares (dist, idx)
    lexicographically). Map-only column expressions over a codebook
    literal; the output (id, c0..c{m-1}) is the persistable compressed
    corpus — at scale it is written next to the snapshot once, not
    recomputed per query."""
    m = len(books)
    d = len(books[0][0])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cols = [F.col(id_col)]
    for s in range(m):
        sub = F.slice(v, s * d + 1, d)
        bs = matrix_lit(books[s])
        dists = F.transform(bs, lambda c: _sq_l2(sub, c))
        idx = F.sequence(F.lit(0), F.lit(len(books[s]) - 1))
        best = F.array_min(F.zip_with(
            dists, idx, lambda dd, i: F.struct(dd.alias("d"), i.alias("i"))))
        cols.append(best.getField("i").alias(f"c{s}"))
    return df.select(*cols)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: "list[list[list[float]]]",
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search: the corpus is scanned as
    codes; each query carries per-subspace lookup tables (distance of
    its subvector to every codebook entry), so a candidate's score is
    ``m`` array lookups — no d-dim arithmetic in the scan. The scan is
    a broadcast of the (tiny) query+LUT side over the code table; at
    100 TB route through IVF lists first so each query touches only
    its probed lists' codes. Returns (query_id, neighbor_id, approx
    squared L2 ``score``, rank) — ascending score, deterministic
    neighbor-id tiebreak."""
    m = len(books)
    d = len(books[0][0])
    enc = pq_encode(corpus, books, id_col, vec_col)
    qv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    lut_cols = []
    for s in range(m):
        sub = F.slice(qv, s * d + 1, d)
        bs = matrix_lit(books[s])
        lut_cols.append(F.transform(bs, lambda c: _sq_l2(sub, c)).alias(f"lut{s}"))
    q = queries.select(F.col(id_col).alias("query_id"), *lut_cols)
    score = None
    for s in range(m):
        term = F.element_at(F.col(f"lut{s}"), F.col(f"c{s}") + 1)
        score = term if score is None else score + term
    cand = (enc.withColumnRenamed(id_col, "neighbor_id")
            .crossJoin(F.broadcast(q))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", score.alias("score")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").asc(), F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round(F.col("score"), 6).alias("score"),
                    F.col("rank").cast("long").alias("rank")))


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: "list[list[list[float]]]",
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    dim: int | None = None,
    cents: "list[list[float]] | None" = None,
) -> DataFrame:
    """The composed 100-TB serving path: IVF routing x PQ codes. The
    coarse quantizer tags each corpus vector with one inverted list
    (same seeded centroids and DESC/idx-DESC tie order as
    ivf_cosine_topk, so the two stay oracle-interchangeable); each
    query probes its ``n_probe`` closest lists and ADC-scores ONLY
    those lists' PQ codes — m LUT lookups per candidate, never a d-dim
    product, and the scan volume is n_probe/n_lists of the corpus.
    Both the list tag and the codes are persistable with the snapshot:
    at scale the per-query cost is independent of corpus width.
    Returns (query_id, neighbor_id, score asc, rank)."""
    cents = _resolve_cents(corpus, vec_col, n_lists, seed, dim, cents)
    n_lists = len(cents)

    def centroid_sims(vec: Column) -> Column:
        cm = matrix_lit(cents)
        return F.transform(cm, lambda c: dot(vec, c) / norm(vec))

    def arg_top(sims: Column, n: int) -> Column:
        idx = F.sequence(F.lit(0), F.lit(n_lists - 1))
        pairs = F.zip_with(sims, idx, lambda s, i: F.struct(s.alias("s"), i.alias("i")))
        return F.slice(F.reverse(F.array_sort(pairs)), 1, n).getField("i")

    m = len(books)
    d = len(books[0][0])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    enc = (pq_encode(corpus, books, id_col, vec_col)
           .withColumnRenamed(id_col, "neighbor_id"))
    c_tag = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        arg_top(centroid_sims(v), 1).getItem(0).alias("_list"))
    coded = enc.join(c_tag, "neighbor_id")

    lut_cols = []
    for s in range(m):
        sub = F.slice(v, s * d + 1, d)
        bs = matrix_lit(books[s])
        lut_cols.append(F.transform(bs, lambda c: _sq_l2(sub, c)).alias(f"lut{s}"))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(arg_top(centroid_sims(v), n_probe)).alias("_list"),
        *lut_cols)

    score = None
    for s in range(m):
        term = F.element_at(F.col(f"lut{s}"), F.col(f"c{s}") + 1)
        score = term if score is None else score + term
    cand = (coded.join(F.broadcast(q), "_list")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", score.alias("score")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").asc(), F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round(F.col("score"), 6).alias("score"),
                    F.col("rank").cast("long").alias("rank")))
