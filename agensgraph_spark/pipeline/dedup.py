"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design for 100 TB:
- exact dedup is one hash-aggregate (map-side partial combine);
- MinHash signatures are per-row column expressions (no shuffle), the
  LSH banding join is the only shuffle — grouped by (band, band-hash),
  so candidate generation never goes quadratic;
- SimHash reduces to one explode + one aggregation;
- pairwise Jaccard verification runs only on LSH candidates (or an
  explicitly bounded id range), never on the full cross product.

Everything is built from `pyspark.sql.functions` (xxhash64, transform,
array ops) — deterministic, JVM-side, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from agensgraph_spark.pipeline.util import maybe_broadcast


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per identical key; report group
    size. One shuffle (hash aggregate)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def shingles(text: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of the lowercased text."""
    t = F.lower(text)
    n = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(k))))


def minhash_signature(text: Column, num_hashes: int = 32, k: int = 5) -> Column:
    """MinHash signature: per hash function i, min over shingles of
    xxhash64(shingle, i). Pure column expression — no shuffle."""
    sh = shingles(text, k)
    return F.array(*[
        F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(num_hashes)
    ])


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k: int = 5,
) -> DataFrame:
    """MinHash signatures via explode → hash → min-aggregate: each
    shingle is materialized once and hashed ``num_hashes`` times as flat
    row expressions (the inline array form re-evaluates the shingle
    array per hash function — catastrophic). The aggregation combines
    map-side, so the shuffle carries only per-doc partial minima.
    Returns (_id, h0..h{n-1}).

    The input is hash-repartitioned first: document corpora often
    arrive as few large files (one Parquet row-group = one task), and
    the shingle explode multiplies rows ~|text|×, so without the spread
    the whole corpus hashes inside a handful of tasks."""
    spread = df.sparkSession.sparkContext.defaultParallelism
    sh = (df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
            .repartition(spread, "_id")
            .select("_id", F.explode(shingles(F.col("_t"), k)).alias("_s")))
    return sh.groupBy("_id").agg(
        *[F.min(F.xxhash64(F.col("_s"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    min_est: float = 0.0,
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair. Returns (id_a, id_b, est_jaccard) with
    id_a < id_b, distinct.

    Pairs are generated from grouped band-buckets (collect (id, sig)
    per (band, hash), emit in-bucket combinations) rather than a
    self-join: the signature pipeline is computed once instead of
    twice, and the only shuffle is the bucket groupBy. ``max_bucket``
    caps degenerate buckets (e.g. an empty-string band) so one hot key
    cannot go quadratic — the standard LSH skew guard.

    ``est_jaccard`` is the signature-agreement estimate (what Spark
    ML's MinHashLSH thresholds on). Corpora with large near-duplicate
    clusters produce O(cluster²) candidates; pass ``min_est`` a notch
    under the final exact threshold so exact verification only runs on
    plausible pairs."""
    from pyspark import StorageLevel
    rows_per_band = num_hashes // bands
    # persist: the signature pipeline (shingle explode + 32-way hash
    # aggregate) feeds the banding AND both sides of the est join —
    # without pinning it, lazy evaluation re-runs it three times
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k) \
        .select("_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("_sig")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    banded = sig.select(
        "_id", "_sig",
        F.posexplode(F.array(*[
            F.xxhash64(F.concat_ws(",", *[
                F.element_at(F.col("_sig"), b * rows_per_band + r + 1).cast("string")
                for r in range(rows_per_band)]))
            for b in range(bands)
        ])).alias("_band", "_bhash"),
    )
    max_bucket = 10_000
    buckets = (banded.groupBy("_band", "_bhash")
               .agg(F.array_sort(F.collect_list("_id")).alias("_ids"))
               .filter((F.size("_ids") >= 2) & (F.size("_ids") <= max_bucket)))
    pair = F.explode(F.flatten(F.transform(
        F.col("_ids"),
        lambda x, i: F.transform(
            F.slice(F.col("_ids"), i + F.lit(2), F.size(F.col("_ids"))),
            lambda y: F.struct(x.alias("id_a"), y.alias("id_b"))),
    ))).alias("_p")
    pairs = (buckets.select(pair).select("_p.id_a", "_p.id_b").distinct()
             .repartition(df.sparkSession.sparkContext.defaultParallelism))
    # signature-agreement estimate, computed after the pair explode so
    # it distributes across pair rows instead of inside hot bucket tasks
    est = (F.aggregate(F.zip_with(F.col("_sa"), F.col("_sb"),
                                  lambda a, b: (a == b).cast("int")),
                       F.lit(0), lambda acc, v: acc + v)
           / F.lit(num_hashes)).alias("est_jaccard")
    # broadcast the signature table ONLY while it provably fits — at
    # corpus scale it is corpus-sized and an unconditional hint OOMs.
    # Size from the *source* row count: counting `sig` itself would
    # materialize the whole shingle+hash pipeline as a separate job,
    # while df.count() is a cheap (often metadata-only) scan
    n_docs = df.count()
    sig_row_bytes = num_hashes * 8 + 32
    sa = maybe_broadcast(
        sig.select(F.col("_id").alias("id_a"), F.col("_sig").alias("_sa")),
        sig_row_bytes, n_rows=n_docs)
    sb = maybe_broadcast(
        sig.select(F.col("_id").alias("id_b"), F.col("_sig").alias("_sb")),
        sig_row_bytes, n_rows=n_docs)
    out = (pairs.join(sa, "id_a").join(sb, "id_b")
           .select("id_a", "id_b", est))
    if min_est > 0:
        out = out.filter(F.col("est_jaccard") >= min_est)
    return out


def jaccard_char_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_id: int | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact character-set Jaccard over a bounded id range (the
    verification step of near-dup detection; at scale, feed LSH
    candidates instead of a range). Returns (id_a, id_b, inter, uni)
    as exact integers — callers derive the ratio."""
    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    if max_id is not None:
        base = base.filter(F.col("_id") < max_id)
    chars = base.select(
        "_id",
        F.array_distinct(F.split(F.lower(F.col("_t")), "")).alias("_chars"),
    ).select("_id", F.array_remove(F.col("_chars"), "").alias("_chars"))
    a = chars.select(F.col("_id").alias("id_a"), F.col("_chars").alias("ca"))
    b = chars.select(F.col("_id").alias("id_b"), F.col("_chars").alias("cb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect(F.col("ca"), F.col("cb"))).cast("long")
    uni = F.size(F.array_union(F.col("ca"), F.col("cb"))).cast("long")
    out = pairs.select("id_a", "id_b", inter.alias("inter"), uni.alias("uni"))
    if threshold > 0:
        out = out.filter(F.col("inter") >= F.col("uni") * threshold)
    return out


def ngram_jaccard_pairs(
    candidates: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    threshold: float = 0.5,
    broadcast_docs: bool | None = None,
) -> DataFrame:
    """Verify LSH candidate pairs with exact k-shingle Jaccard.

    The doc→shingle-set side is broadcast when it fits: candidate sets
    over clustered corpora run to O(cluster²) pairs, and shuffling a
    ~|text|-element array per pair side dwarfs the intersect cost
    itself. ``broadcast_docs=None`` (default) sizes the shingle table
    from one cheap (count, avg-length) aggregate and hints only under
    the limit — at corpus scale the table is corpus-sized and a forced
    broadcast would OOM, so big inputs fall through to AQE's choice."""
    spread = docs.sparkSession.sparkContext.defaultParallelism
    sh = (docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
              .repartition(spread, "_id")
              .select("_id", shingles(F.col("_t"), k).alias("_sh")))
    if broadcast_docs is None:
        st = docs.agg(F.count(F.lit(1)).alias("n"),
                      F.avg(F.length(F.col(text_col))).alias("len")).collect()[0]
        shingle_row_bytes = (st["len"] or 0.0) * (k + 16) + 48
        sh = maybe_broadcast(sh, shingle_row_bytes, n_rows=st["n"] or 0)
    elif broadcast_docs:
        sh = F.broadcast(sh)
    j = (candidates
         .join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sa")), "id_a")
         .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sb")), "id_b"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    uni = F.size(F.array_union(F.col("sa"), F.col("sb")))
    return (j.select("id_a", "id_b", (inter / uni).alias("jaccard"))
             .filter(F.col("jaccard") >= threshold))


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash near-duplicate pairs: docs within ``max_hamming`` bits.
    Banding (pigeonhole: two hashes within k bits agree exactly on at
    least one of k+1 bands) turns the quadratic scan into a bucket
    join; the hamming check is one JVM-side bit_count(xor)."""
    sig = simhash(df, text_col, id_col, bits).persist()
    width = bits // bands
    banded = sig.select(
        F.col(id_col).alias("_id"), F.col("simhash").alias("_h"),
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(F.lit((1 << width) - 1))
            for b in range(bands)
        ])).alias("_band", "_bkey"),
    )
    left = banded.select("_band", "_bkey", F.col("_id").alias("id_a"), F.col("_h").alias("ha"))
    right = banded.select("_band", "_bkey", F.col("_id").alias("id_b"), F.col("_h").alias("hb"))
    pairs = (left.join(right, ["_band", "_bkey"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
             .distinct())
    return pairs.filter(F.col("hamming") <= max_hamming)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """SimHash over whitespace tokens: bit j of the hash is the majority
    vote of bit j across token xxhash64s. One explode + one aggregate."""
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("_tok"),
    ).withColumn("_h", F.xxhash64(F.col("_tok")))
    bit_sums = toks.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(F.shiftrightunsigned(F.col("_h"), j).bitwiseAND(F.lit(1))).alias(f"_b{j}") for j in range(bits)],
    )
    sim = None
    for j in range(bits):
        bit = (F.col(f"_b{j}") * 2 > F.col("_n")).cast("long") * F.lit(1 << j)
        sim = bit if sim is None else sim + bit
    return bit_sums.select(F.col("_id").alias(id_col), sim.alias("simhash"))
