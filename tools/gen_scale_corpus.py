"""One-off generator for the ~100x scale-probe corpus.

Upsamples /root/testdata/sf0.1 by UPSAMPLE disjoint replicas into
.scaledata/sf1 (sf1-equivalent: ~6M lineitem rows), so bench.py can add
a second empirical scale point (sf0.01 -> sf0.1 -> sf1 spans 100x).

Upsampling rules — chosen so each replica carries EXACTLY the original
workload and replicas don't interact except where real scale would add
density:

- fact tables: key columns offset by k * (max_key + 1) per replica —
  foreign keys stay consistent within a replica;
- dimension tables (nation, region): NOT scaled — shared by all
  replicas, exactly like a real 100 TB deployment still has 25 nations
  (graph hub vertices get 10x degree, which is the honest hard case);
- documents: per-replica VOCABULARY SUBSTITUTION — every token maps to
  a fresh random word of the SAME LENGTH (seeded per replica). Within
  a replica the substitution is a consistent bijection over words of
  identical lengths, so the near-dup structure (and therefore the
  per-replica dedup workload) is preserved; across replicas the token
  spaces share only chance character shingles, so candidate pairs
  scale linearly with data. Two rejected alternatives, both measured:
  plain permutation of the shared vocabulary keeps chance candidates
  quadratic (61x candidates at 10x data — a property of the fixture's
  31-word vocabulary, not of a real diverse corpus), and suffixing a
  constant copy digit onto every word collapses boundary-shingle
  entropy enough to fabricate ~700k fake near-dups per replica;
- events: timestamps shifted by k * (span + 1h) so sessions never
  merge across replicas; user/event ids offset;
- embeddings: vec_id offset, vectors reused (ANN cost depends on
  corpus size and dimension, not on the float values).

Deterministic: permutations come from random.Random(97 + k).
"""

from __future__ import annotations

import os
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UPSAMPLE = 10
SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scaledata", "sf1")

# key columns to offset per table: {table: {col: stride}}
_MAXK = {"c_custkey": 15000, "o_orderkey": 150000, "o_custkey": 15000,
         "l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000,
         "s_suppkey": 1000, "p_partkey": 20000,
         "doc_id": 5000, "vec_id": 2000,
         "event_id": 100000, "user_id": 2000}
_TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
           "lineitem", "documents", "embeddings", "events")


def _offset_copy(df: DataFrame, k: int) -> DataFrame:
    cols = []
    for c in df.columns:
        stride = _MAXK.get(c)
        cols.append((F.col(c) + F.lit(k * stride)).alias(c)
                    if stride is not None else F.col(c))
    return df.select(*cols)


def _permute_docs(df: DataFrame, k: int, vocab: list[str]) -> DataFrame:
    if k == 0:
        return df
    rng = random.Random(97 + k)
    target: list[str] = []
    seen = set(vocab)  # also avoid colliding with the original words
    for w in vocab:
        while True:
            cand = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                           for _ in range(max(len(w), 1)))
            if cand not in seen:
                seen.add(cand)
                target.append(cand)
                break
    mapping = F.create_map(*[F.lit(x) for pair in zip(vocab, target)
                             for x in pair])
    toks = F.split(F.col("text"), " ")
    text = F.array_join(
        F.transform(toks, lambda w: F.coalesce(mapping[w], w)), " ")
    return df.withColumn("text", text).withColumn(
        "n_chars", F.length("text").cast("long"))


def generate(spark: SparkSession, out_dir: str = DEFAULT_OUT,
             upsample: int = UPSAMPLE) -> str:
    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    vocab = sorted(r["w"] for r in docs.select(
        F.explode(F.split("text", " ")).alias("w")).distinct().collect())
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    span = ev.select((F.unix_timestamp(F.max("ts"))
                      - F.unix_timestamp(F.min("ts"))).alias("s")).first()["s"]

    for t in _TABLES:
        dst = f"{out_dir}/{t}.parquet"
        if os.path.exists(dst):
            continue
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t in ("region", "nation"):
            out = src  # shared dimensions — never scaled
        else:
            parts = []
            for k in range(upsample):
                c = _offset_copy(src, k)
                if t == "documents":
                    c = _permute_docs(c, k, vocab)
                if t == "events":
                    c = c.withColumn(
                        "ts", F.col("ts") + F.expr(f"INTERVAL {int(k * (span + 3600))} SECOND"))
                parts.append(c)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        # >=16 files so a full scan reaches local[32]'s parallelism —
        # an 8-file 100 MB table caps q1-style scans at 8 tasks and
        # fakes a supra-linear ratio vs the (16-file) true corpus
        out.coalesce(16).write.mode("overwrite").parquet(dst + ".tmp")
        os.rename(dst + ".tmp", dst)
    return out_dir


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from agensgraph_spark import get_spark
    spark = get_spark("gen-scale-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    print(generate(spark))
