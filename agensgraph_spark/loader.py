"""Derive the TPC-H-ish property graph from the driver's Parquet tables.

Mapping per FIXTURES.md §7 (labids fixed: customer=1 supplier=2 part=3
orders=4 nation=5 region=6; placed=17 contains=18 supplies=19
in_nation=20 in_region=21; vertex locid = source primary key).

Edge locids are **deterministic key-packings** of the source rows, not
global sequences: `monotonically_increasing_id()` or row_number() over a
global window would either be partition-layout-dependent or force a
single-partition sort — neither survives a 1000-executor cluster. Key
packing is embarrassingly parallel and reproducible run-to-run:

- placed:    locid = o_orderkey                    (1 edge per order)
- contains:  locid = l_orderkey * 64 + l_linenumber (1 edge per lineitem)
- supplies:  locid = l_suppkey << 24 | l_partkey    (distinct pairs)
- in_nation: locid = key*2 (+1 for suppliers)       (customer|supplier)
- in_region: locid = n_nationkey

48 locid bits bound the scale: orderkey < 2^42, suppkey/partkey < 2^24.
At TPC-H sf100k (100 TB) orderkey tops out ~1.5e11 < 2^42 — fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from agensgraph_spark.catalog import GraphCatalog
from agensgraph_spark.graph import Graph
from agensgraph_spark.graphid import graphid_col

VLABIDS = {"customer": 1, "supplier": 2, "part": 3, "orders": 4, "nation": 5, "region": 6}
ELABIDS = {"placed": 17, "contains": 18, "supplies": 19, "in_nation": 20, "in_region": 21}

VPROPS = {
    "customer": {"c_custkey": "bigint", "c_name": "string", "c_acctbal": "double", "c_mktsegment": "string"},
    "supplier": {"s_suppkey": "bigint", "s_name": "string", "s_acctbal": "double"},
    "part": {"p_partkey": "bigint", "p_name": "string", "p_brand": "string", "p_type": "string", "p_retailprice": "double"},
    "orders": {"o_orderkey": "bigint", "o_orderdate": "timestamp", "o_totalprice": "double", "o_orderstatus": "string"},
    "nation": {"n_nationkey": "bigint", "n_name": "string"},
    "region": {"r_regionkey": "bigint", "r_name": "string"},
}
EPROPS = {
    "placed": {},
    "contains": {"l_quantity": "double", "l_extendedprice": "double", "l_discount": "double", "l_returnflag": "string"},
    "supplies": {},
    "in_nation": {},
    "in_region": {},
}

_VKEY = {
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_orderkey", "nation": "n_nationkey", "region": "r_regionkey",
}


# Per-session read memo — the moral equivalent of registering the
# tables once: every spark.read.parquet() call re-lists the path and
# re-reads footers for schema inference (a ~0.3s driver job), and the
# workload invokes read_table for the same (sf_dir, table) on every
# query build. DataFrames are immutable, so the memoized object is
# safe to share; the key carries the path's mtime so a regenerated
# dataset (the scale tooling rewriting a dir in-process) re-reads
# instead of serving a stale file listing. Weak-keyed on the session:
# a stopped/discarded session's entries go with it.
_READ_MEMO = None  # lazily a weakref.WeakKeyDictionary


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # TIMESTAMP→NTZ casts (normalize_event_ts) and date extraction render
    # through the session timezone; DuckDB oracles read the same files as
    # naive UTC wall-clock values. Pin the session to UTC so results from
    # arbitrary caller sessions (the driver's) match the oracle. This
    # guard is part of read_table's contract ("after this call the
    # session renders UTC") and affects EXECUTION of already-built
    # plans, so it runs on memo hits too — unlike nanosAsLong below,
    # which only matters when the file is actually (re-)read.
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    global _READ_MEMO
    if _READ_MEMO is None:
        import weakref
        _READ_MEMO = weakref.WeakKeyDictionary()
    import os as _os
    path = f"{sf_dir}/{name}.parquet"
    try:
        mt = _os.path.getmtime(path)
    except OSError:
        mt = 0.0
    cache = _READ_MEMO.get(spark)
    if cache is None:
        cache = _READ_MEMO[spark] = {}
    key = (sf_dir, name, mt)
    hit = cache.get(key)
    if hit is not None:
        return hit
    # events.parquet has shipped with TIMESTAMP(NANOS) in some generations,
    # which a plain Spark 4 session refuses to read (PARQUET_TYPE_ILLEGAL).
    # Set the legacy conf at runtime so *any* caller-provided session works,
    # not just our builder's (session.py sets it at build time; the driver's
    # session doesn't).
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events":
        df = df.withColumn("ts", normalize_event_ts(df.schema["ts"].dataType))
    if len(cache) >= 256:
        cache.clear()
    cache[key] = df
    return df


def spread_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Spread a narrow base-table scan across the session's cores
    before heavy per-row map work (guide §2: spread the work).

    A single-file, single-row-group parquet table plans exactly ONE
    non-empty input split, so everything up to the first exchange —
    formatting, tokenization, per-gram hashing — runs on one task no
    matter how many cores the session has (measured: the sf local
    tables are all 1 file / 1 row group). The fix is one hash exchange
    on a unique key, sized to ``defaultParallelism`` so it adapts to
    the session's core count rather than a constant.

    Scale contract: a NO-OP whenever the scan already plans at least
    the session's parallelism in partitions — the many-file production
    layout — so the exchange exists only where the input layout starves
    the cores. The partition probe (``df.rdd.getNumPartitions()``) is
    safe here because callers hand this function the bare ``read_table``
    scan (shuffle-free plan: the probe costs a file listing, never a
    stage execution — see pipeline.multimodal._spread for the AQE
    caveat on shuffled frames), and the count is memoized on the
    DataFrame object, which read_table itself memoizes per table.

    ``keys`` should be a unique/high-cardinality column (the table's
    primary key): hash spreading avoids round-robin's
    sort-before-repartition pass over the full row, which measurably
    costs on wide text rows. With no keys, falls back to round-robin.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    parts = getattr(df, "_spread_scan_parts", None)
    if parts is None:
        try:
            parts = df.rdd.getNumPartitions()
        except Exception:
            return df
        try:
            df._spread_scan_parts = parts
        except Exception:
            pass
    if parts >= target:
        return df
    if keys:
        return df.repartition(target, *keys)
    return df.repartition(target)


def normalize_event_ts(dt):
    """`ts` arrives as long nanos (nanosAsLong on a TIMESTAMP(NANOS) file)
    or as a timestamp type (micros file). Normalize to TIMESTAMP_NTZ: the
    wall-clock value is what the data means, DuckDB reads the same file as
    a naive timestamp, and NTZ keeps Spark↔oracle agreement independent of
    the driver session's timezone."""
    from pyspark.sql import types as T
    if isinstance(dt, T.LongType):
        # nano-precision longs carrying micro-precision values — exact
        return F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long")).cast("timestamp_ntz")
    if isinstance(dt, T.TimestampType):
        return F.col("ts").cast("timestamp_ntz")
    return F.col("ts")


def tpch_catalog() -> GraphCatalog:
    cat = GraphCatalog("tpch")
    for name, labid in VLABIDS.items():
        cat.create_vlabel(name, labid=labid, props=VPROPS[name])
    for name, labid in ELABIDS.items():
        cat.create_elabel(name, labid=labid, props=EPROPS[name])
    return cat


def build_tpch_graph(spark: SparkSession, sf_dir: str) -> Graph:
    """Lazy DataFrames end-to-end — nothing materializes until a query runs,
    so Catalyst prunes unused labels/columns out of each query's plan."""
    cat = tpch_catalog()
    g = Graph(cat)
    t = {name: read_table(spark, sf_dir, name) for name in
         ("customer", "supplier", "part", "orders", "nation", "region", "lineitem")}

    # vertices: id = labid<<48 | primary key; typed prop columns as-is
    for name, labid in VLABIDS.items():
        src = t[name]
        key = _VKEY[name]
        cols = [graphid_col(labid, F.col(key)).alias("id")]
        cols += [F.col(p).cast(dt).alias(p) for p, dt in VPROPS[name].items()]
        g.set_label_df(name, src.select(*cols))

    li, orders, cust, supp, nation = t["lineitem"], t["orders"], t["customer"], t["supplier"], t["nation"]

    placed = orders.select(
        graphid_col(ELABIDS["placed"], F.col("o_orderkey")).alias("id"),
        graphid_col(VLABIDS["customer"], F.col("o_custkey")).alias("start"),
        graphid_col(VLABIDS["orders"], F.col("o_orderkey")).alias("end"),
    )
    g.set_label_df("placed", placed)

    contains = li.select(
        graphid_col(ELABIDS["contains"], F.col("l_orderkey") * 64 + F.col("l_linenumber")).alias("id"),
        graphid_col(VLABIDS["orders"], F.col("l_orderkey")).alias("start"),
        graphid_col(VLABIDS["part"], F.col("l_partkey")).alias("end"),
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
        F.col("l_discount").cast("double").alias("l_discount"),
        F.col("l_returnflag").alias("l_returnflag"),
    )
    g.set_label_df("contains", contains)

    supplies = (
        li.select("l_suppkey", "l_partkey").distinct()
        .select(
            graphid_col(ELABIDS["supplies"], F.shiftleft(F.col("l_suppkey"), 24) + F.col("l_partkey")).alias("id"),
            graphid_col(VLABIDS["supplier"], F.col("l_suppkey")).alias("start"),
            graphid_col(VLABIDS["part"], F.col("l_partkey")).alias("end"),
        )
    )
    g.set_label_df("supplies", supplies)

    in_nation = (
        cust.select(
            graphid_col(ELABIDS["in_nation"], F.col("c_custkey") * 2).alias("id"),
            graphid_col(VLABIDS["customer"], F.col("c_custkey")).alias("start"),
            graphid_col(VLABIDS["nation"], F.col("c_nationkey")).alias("end"),
        )
        .unionByName(
            supp.select(
                graphid_col(ELABIDS["in_nation"], F.col("s_suppkey") * 2 + 1).alias("id"),
                graphid_col(VLABIDS["supplier"], F.col("s_suppkey")).alias("start"),
                graphid_col(VLABIDS["nation"], F.col("s_nationkey")).alias("end"),
            )
        )
    )
    g.set_label_df("in_nation", in_nation)

    in_region = nation.select(
        graphid_col(ELABIDS["in_region"], F.col("n_nationkey")).alias("id"),
        graphid_col(VLABIDS["nation"], F.col("n_nationkey")).alias("start"),
        graphid_col(VLABIDS["region"], F.col("n_regionkey")).alias("end"),
    )
    g.set_label_df("in_region", in_region)
    return g


ALL_TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings")


def register_tables(spark: SparkSession, sf_dir: str,
                    only: "tuple[str, ...] | None" = None,
                    lenient: bool = False) -> None:
    """Register the raw relational tables as temp views (SQL side of the
    hybrid engine — the reference runs full SQL beside Cypher).

    `only` restricts registration to the tables a query actually references,
    so a problem reading one table can never take down unrelated queries.
    `lenient` skips unreadable tables instead of raising — a query that
    doesn't touch the broken table still runs."""
    for name in (only if only is not None else ALL_TABLES):
        try:
            read_table(spark, sf_dir, name).createOrReplaceTempView(name)
        except Exception:
            if not lenient:
                raise
