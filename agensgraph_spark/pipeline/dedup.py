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
    Returns (_id, h0..h{n-1})."""
    sh = df.select(F.col(id_col).alias("_id"), F.explode(shingles(F.col(text_col), k)).alias("_s"))
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
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair. Returns (id_a, id_b) with id_a < id_b, distinct."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k)
    banded = sig.select(
        "_id",
        F.posexplode(F.array(*[
            F.xxhash64(F.concat_ws(",", *[F.col(f"h{b * rows_per_band + r}").cast("string")
                                          for r in range(rows_per_band)]))
            for b in range(bands)
        ])).alias("_band", "_bhash"),
    )
    left = banded.select(F.col("_band").alias("band"), F.col("_bhash").alias("bhash"), F.col("_id").alias("id_a"))
    right = banded.select(F.col("_band").alias("band"), F.col("_bhash").alias("bhash"), F.col("_id").alias("id_b"))
    pairs = left.join(right, ["band", "bhash"]).filter(F.col("id_a") < F.col("id_b"))
    return pairs.select("id_a", "id_b").distinct()


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
) -> DataFrame:
    """Verify LSH candidate pairs with exact k-shingle Jaccard."""
    sh = docs.select(F.col(id_col).alias("_id"), shingles(F.col(text_col), k).alias("_sh"))
    j = (candidates
         .join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sa")), "id_a")
         .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sb")), "id_b"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    uni = F.size(F.array_union(F.col("sa"), F.col("sb")))
    return (j.select("id_a", "id_b", (inter / uni).alias("jaccard"))
             .filter(F.col("jaccard") >= threshold))


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
