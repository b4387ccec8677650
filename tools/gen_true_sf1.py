"""One-off generator for a GENUINE (non-replica) sf1 corpus.

The replica corpus (tools/gen_scale_corpus.py) preserves per-replica
workload structure — exactly right for dedup scale probes, but it gives
SQL/graph queries artificial key-distribution uniformity (every replica
is the same 25-nation star). This generator produces genuinely fresh
sf1-sized tables (~6M lineitem) from first principles, fully
distributed: spark.range + xxhash64-seeded column expressions, no
driver-side loops, no replication — the same shape a 100 TB generator
job would have.

Distributions mirror /root/testdata/sf0.1 (TPC-H-ish, TESTDATA.md):
same schemas, same domains (dates 1995..2001, 25 nations / 5 regions
shared dimensions, 1-7 lines per order, the documents vocabulary), with
all values drawn from hash-uniforms instead of copied. Documents get a
genuine near-dup structure: ~15% of docs re-render an earlier doc's
template with ~5% token perturbation — expressed as text(tmpl_id, j)
so no cross-row join is needed.

Deterministic: every value is a pure function of (row id, column salt).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
DEFAULT_OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".scaledata", "sf1_true")

SCALE = 10  # default: sf1 (vs sf0.1); generate(scale=100) -> sf10


def _u(col, salt: int):
    """Uniform double in [0, 1) as a pure function of (col, salt)."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1_000_000)) / 1_000_000.0


def _ui(col, salt: int, n):
    """Uniform integer in [0, n) as a pure function of (col, salt)."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(n))


def _pick(col, salt: int, values: list[str]):
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_ui(col, salt, len(values)) + 1).cast("int"))


def _day_ts(base: str, days):
    return F.timestamp_seconds(
        F.unix_timestamp(F.lit(base), "yyyy-MM-dd") + days * 86400)


def generate(spark: SparkSession, out_dir: str = DEFAULT_OUT,
             scale: int = SCALE) -> str:
    """Row counts and output file counts scale linearly with ``scale``
    (10 = sf1, 100 = sf10); every value stays a pure function of
    (row id, column salt), so a smaller corpus is NOT a prefix of a
    larger one only where counts enter a hash domain (keys, user ids,
    template ids) — exactly like re-running a real generator at a
    bigger scale factor."""
    N_CUST, N_SUPP, N_PART = 15000 * scale, 1000 * scale, 20000 * scale
    N_ORDERS, N_EVENTS = 150000 * scale, 100000 * scale
    N_DOCS, N_VECS = 5000 * scale, 2000 * scale
    fmul = max(1, scale // 10)
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, df: DataFrame, parts: int = 8) -> None:
        parts = parts * fmul if parts > 1 else parts
        dst = f"{out_dir}/{name}.parquet"
        if os.path.exists(dst):
            return
        df.coalesce(parts).write.mode("overwrite").parquet(dst + ".tmp")
        os.rename(dst + ".tmp", dst)

    # shared dimensions — identical at every scale, like real deployments
    for t in ("region", "nation"):
        write(t, spark.read.parquet(f"{SRC}/{t}.parquet"), 1)

    cid = F.col("id")
    write("customer", spark.range(N_CUST).select(
        cid.alias("c_custkey"),
        F.format_string("Customer#%09d", cid).alias("c_name"),
        _ui(cid, 1, 25).cast("int").alias("c_nationkey"),
        F.round(-1000 + _u(cid, 2) * 11000, 2).alias("c_acctbal"),
        _pick(cid, 3, ["BUILDING", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD",
                       "MACHINERY"]).alias("c_mktsegment")))

    write("supplier", spark.range(N_SUPP).select(
        cid.alias("s_suppkey"),
        F.format_string("Supplier#%09d", cid).alias("s_name"),
        _ui(cid, 4, 25).cast("int").alias("s_nationkey"),
        F.round(-1000 + _u(cid, 5) * 11000, 2).alias("s_acctbal")))

    adjectives = ["large", "hot", "blue", "small", "red", "green", "shiny",
                  "old", "new", "round"]
    nouns = ["ring", "bolt", "gear", "pipe", "plate", "wheel", "screw",
             "lens", "clip", "rod"]
    write("part", spark.range(N_PART).select(
        cid.alias("p_partkey"),
        F.concat(_pick(cid, 6, adjectives), F.lit(" "),
                 _pick(cid, 7, nouns)).alias("p_name"),
        F.concat(F.lit("Brand#"),
                 (_ui(cid, 8, 25) + 1).cast("string")).alias("p_brand"),
        _pick(cid, 9, ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO",
                       "MEDIUM"]).alias("p_type"),
        (_ui(cid, 10, 50) + 1).cast("int").alias("p_size"),
        F.round(900 + F.pmod(cid, F.lit(1000)) / 10.0, 2).alias("p_retailprice")))

    # orders: dates uniform over 1995-01-01 .. 2001-08-01 (2404 days)
    write("orders", spark.range(N_ORDERS).select(
        cid.alias("o_orderkey"),
        _ui(cid, 11, N_CUST).alias("o_custkey"),
        _pick(cid, 12, ["O", "P", "F"]).alias("o_orderstatus"),
        F.round(1000 + _u(cid, 13) * 499000, 2).alias("o_totalprice"),
        _day_ts("1995-01-01", _ui(cid, 14, 2405)).alias("o_orderdate"),
        _pick(cid, 15, ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                        "5-LOW"]).alias("o_orderpriority")), 8)

    # lineitem: 1-7 lines per order (avg 4 -> ~6M rows); shipdate lags
    # the order date by 1..120 days
    ok = F.col("l_orderkey")
    li = (spark.range(N_ORDERS)
          .select(cid.alias("l_orderkey"),
                  _day_ts("1995-01-01", _ui(cid, 14, 2405)).alias("_odate"),
                  F.explode(F.sequence(
                      F.lit(1), (_ui(cid, 16, 7) + 1).cast("int")))
                  .alias("l_linenumber")))
    ln = F.col("l_linenumber")
    qty = (F.pmod(F.xxhash64(ok, ln, F.lit(17)), F.lit(50)) + 1).cast("double")
    price_each = 900 + F.pmod(F.xxhash64(ok, ln, F.lit(18)), F.lit(1000)) / 10.0
    write("lineitem", li.select(
        ok,
        F.pmod(F.xxhash64(ok, ln, F.lit(19)), F.lit(N_PART)).alias("l_partkey"),
        F.pmod(F.xxhash64(ok, ln, F.lit(20)), F.lit(N_SUPP)).alias("l_suppkey"),
        ln.cast("int").alias("l_linenumber"),
        qty.alias("l_quantity"),
        F.round(qty * price_each, 2).alias("l_extendedprice"),
        (F.pmod(F.xxhash64(ok, ln, F.lit(21)), F.lit(11)) / 100.0).alias("l_discount"),
        (F.pmod(F.xxhash64(ok, ln, F.lit(22)), F.lit(9)) / 100.0).alias("l_tax"),
        _pick(F.xxhash64(ok, ln, F.lit(23)), 0, ["A", "N", "R"]).alias("l_returnflag"),
        _pick(F.xxhash64(ok, ln, F.lit(24)), 0, ["O", "F"]).alias("l_linestatus"),
        (F.col("_odate") + F.make_dt_interval(
            days=(F.pmod(F.xxhash64(ok, ln, F.lit(25)), F.lit(120)) + 1)
            .cast("int"))).alias("l_shipdate")), 16)

    # events: 30 days, 10x users, value uniform, tiny JSON props
    write("events", spark.range(N_EVENTS).select(
        cid.alias("event_id"),
        F.timestamp_seconds(
            F.unix_timestamp(F.lit("2024-01-01"), "yyyy-MM-dd")
            + _u(cid, 26) * 30 * 86400).alias("ts"),
        _ui(cid, 27, 1500 * scale).alias("user_id"),
        _pick(cid, 28, ["signup", "click", "error", "view", "purchase"])
        .alias("event_type"),
        F.round(_u(cid, 29) * 100, 3).alias("value"),
        F.format_string('{"k": %d}', _ui(cid, 30, 100)).alias("props")), 8)

    # documents: genuine near-dup structure — ~15% of docs re-render an
    # EARLIER doc's template (tmpl = hash of own id, so text(tmpl, j)
    # needs no join) with ~5% token perturbation. The vocabulary is a
    # 2000-word synthetic lexicon drawn Zipf-ish (u^1.7): the fixture's
    # 31-word vocabulary makes any two random docs share most of their
    # character shingles, which inflates LSH chance-candidates far
    # beyond what a real diverse corpus produces — a large skewed
    # vocabulary is the honest shape for scale measurement.
    import random as _random
    _rng = _random.Random(13)
    _seen: set[str] = set()
    vocab: list[str] = []
    while len(vocab) < 2000:
        w = "".join(_rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(_rng.randint(3, 9)))
        if w not in _seen:
            _seen.add(w)
            vocab.append(w)
    varr = F.array(*[F.lit(w) for w in vocab])
    is_dup = _u(cid, 31) < 0.15
    tmpl = F.when(is_dup, _ui(cid, 32, N_DOCS)).otherwise(cid)
    n_tok = (_ui(tmpl, 33, 46) + 15).cast("int")  # 15..60 tokens

    def _zipf_idx(col, salt: int):
        # floor(u^1.7 * V): mild Zipf skew toward low indices
        return (F.pow(_u(col, salt), F.lit(1.7)) * len(vocab)).cast("int")

    def tok(j):
        base = F.element_at(varr, _zipf_idx(F.xxhash64(tmpl, j), 34) + 1)
        perturbed = F.element_at(varr, _zipf_idx(F.xxhash64(cid, j), 35) + 1)
        flip = F.pmod(F.xxhash64(cid, j, F.lit(36)), F.lit(20)) == 0
        return F.when(is_dup & flip, perturbed).otherwise(base)

    text = F.array_join(F.transform(F.sequence(F.lit(1), n_tok), tok), " ")
    # lang mirrors the testdata mix (~44% en, rest split) — a constant
    # 'en' made every two-distribution operator (DSIR) degenerate to
    # log-weight 0 at scale, probing only half its pipeline
    lang_u = _u(cid, 38)
    lang = (F.when(lang_u < 0.44, "en").when(lang_u < 0.59, "zh")
            .when(lang_u < 0.73, "es").when(lang_u < 0.87, "de")
            .otherwise("fr"))
    write("documents", spark.range(N_DOCS).select(
        cid.alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        F.concat(F.lit("src"), _ui(cid, 37, 20).cast("string")).alias("source"),
        F.length(text).cast("long").alias("n_chars")), 8)

    write("embeddings", spark.range(N_VECS).select(
        cid.alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: ((F.pmod(F.xxhash64(cid, j, F.lit(38)),
                               F.lit(2_000_001)) - 1_000_000)
                       / 1_000_000.0)).cast("array<float>").alias("embedding"),
        _ui(cid, 39, 10).cast("int").alias("label")), 4)

    return out_dir


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from agensgraph_spark import get_spark
    spark = get_spark("gen-true-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    print(generate(spark))
