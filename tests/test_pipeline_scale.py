"""Scale guards for pipeline operators: dimension-side broadcasts must
be size-conditional — an unconditional hint on a corpus-sized table
OOMs at 100 TB, so past the estimate limit the frame passes through
unhinted and AQE picks the strategy."""

from pyspark.sql import functions as F

from agensgraph_spark.pipeline import dedup as D
from agensgraph_spark.pipeline.util import maybe_broadcast

SF_DIR = "/root/testdata/sf0.001"


def test_maybe_broadcast_small_hints(spark):
    df = spark.range(10)
    assert maybe_broadcast(df, 100) is not df  # hinted copy


def test_maybe_broadcast_large_passes_through(spark):
    df = spark.range(10)
    # 10 rows x 10 MiB estimate > 64 MiB limit → unchanged frame
    assert maybe_broadcast(df, 10 << 20) is df


def test_maybe_broadcast_counts_when_unknown(spark):
    df = spark.range(1000)
    assert maybe_broadcast(df, 16) is not df


def test_ngram_jaccard_auto_matches_forced_broadcast(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    cand = D.minhash_lsh_candidates(docs).select("id_a", "id_b")
    auto = D.ngram_jaccard_pairs(cand, docs, threshold=0.3)
    forced = D.ngram_jaccard_pairs(cand, docs, threshold=0.3, broadcast_docs=True)
    a = sorted(tuple(r) for r in auto.collect())
    b = sorted(tuple(r) for r in forced.collect())
    assert a == b and len(a) > 0


def test_salted_join_matches_unsalted(spark):
    """Skew salting must be a pure physical rewrite: same rows out."""
    from agensgraph_spark.pipeline.util import salted_join
    from pyspark.sql import functions as F
    # skewed big side: 90% of rows share key 0
    big = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 50)
        .alias("k"), F.col("id").alias("v"))
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("w"))
    got = salted_join(big, small, "k").groupBy("k").count()
    exp = big.join(small, "k").groupBy("k").count()
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))
