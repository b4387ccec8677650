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

import logging
import threading

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def _warn_async(obs: Observation, metric: str, message: str) -> None:
    """Surface an observed metric as a warning once the query runs.
    The JVM-side ``Observation.getAsJava`` blocks until the first
    action touches the observed node — a daemon thread waits on it so
    the warning costs no extra Spark job and fires even though the
    operator is lazy. If the query never executes the thread parks
    harmlessly. The metric is read through the JVM ``getAsJava`` map:
    for some query shapes the Python-side ``Observation.get`` fails in
    row conversion (toPyRow asserts a schema the metrics row lacks).

    Known limitation (Spark 4.1, verified empirically): when AQE plans
    two or more shuffle stages ABOVE the CollectMetrics node, the
    completed query reports an EMPTY metrics map — the observation
    fires but the value is lost. The watcher then logs that the audit
    was unavailable instead of staying silent; ``lsh_skew_stats``
    is the deterministic audit path.
    """
    def _watch() -> None:
        try:
            jmap = obs._jo.getAsJava()
            if metric not in jmap:
                log.info(
                    "observed metric %s unavailable (AQE dropped "
                    "CollectMetrics above 2+ shuffle stages) — run "
                    "lsh_skew_stats() to audit the skew cap", metric)
                return
            v = jmap.get(metric)
            if v:
                log.warning(message, v)
        except Exception:  # pragma: no cover - session teardown races
            pass
    threading.Thread(target=_watch, daemon=True, name=f"obs-{metric}").start()



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


# Two interchangeable 64-bit-ish string hashes power every fuzzy-dedup
# operator below:
# - 'xxh64' (default): Spark's JVM-side xxhash64 — fastest, but no
#   other SQL engine can replay it;
# - 'md5': the first 15 hex chars of md5 as a 60-bit non-negative
#   long — a few times more expensive per shingle, but bit-exactly
#   reproducible in ANY SQL engine (DuckDB: CAST('0x'||substring(
#   md5(s),1,15) AS BIGINT)), so external oracles can replay the
#   whole MinHash/SimHash pipeline. Same pattern as text.fingerprint's
#   md5 fingerprints (README.md).
# Collision behavior is equivalent (60 vs 64 bits is immaterial at
# n²/2⁶⁰ rates); min-hash/banding statistics are unchanged.
def _str_hash(col: Column, hash_fn: str) -> Column:
    if hash_fn == "xxh64":
        return F.xxhash64(col)
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r} (expected 'xxh64' or 'md5')")


# SQL-string twins of the Column builders above. Constructing the
# signature projection through the Column API costs one py4j round trip
# per lambda/function node — ~0.5s of DRIVER time per invocation for
# the 32-slot projection (measured: 32 x array_min(transform(...)) =
# ~550ms plan construction, independent of data size). A single
# selectExpr ships the whole projection as text and parses it JVM-side
# in one call. Semantics are identical (same functions, same literal
# types — `L` suffixes pin longs).
def _str_hash_sql(s: str, hash_fn: str) -> str:
    if hash_fn == "xxh64":
        return f"xxhash64({s})"
    if hash_fn == "md5":
        return f"CAST(conv(substring(md5({s}), 1, 15), 16, 10) AS BIGINT)"
    raise ValueError(f"unknown hash_fn {hash_fn!r} (expected 'xxh64' or 'md5')")


def _shingles_sql(col: str, k: int) -> str:
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(length(lower({col})) - {k - 1}, 1)), "
        f"_i -> substring(lower({col}), _i, {k})))"
    )


def _shingle_hash_sql(col: str, k: int, hash_fn: str,
                      mod_prime: bool) -> str:
    """`transform(shingles, s -> hash(s))`, optionally reduced into the
    MinHash prime field, as one SQL expression string."""
    h = _str_hash_sql("_s", hash_fn)
    if mod_prime:
        h = f"pmod({h}, {_MH_PRIME}L)"
    return f"transform({_shingles_sql(col, k)}, _s -> {h})"


# MinHash slot derivation — one O(len) string hash per shingle, then a
# cheap per-slot derive on the resulting long (string hashing dominates
# signature cost, so this is a several-fold cut over num_hashes string
# hashes with the same collision guarantees). The derive differs by
# mode:
#
# - 'xxh64' (default): slot_i = min over shingles of
#   xxhash64(base_hash, i) — a fresh full-strength 8-byte hash per
#   slot. Effectively an independent random permutation per slot, so
#   the estimator stays unbiased even on tiny shingle universes.
# - 'md5' (portable): the affine 2-wise family
#   (a_i * (h mod p) + b_i) mod p over the Mersenne prime 2^31-1 (the
#   construction Spark ML's MinHashLSH uses; 31-bit coefficients so
#   every product fits a long under ANSI arithmetic), because external
#   SQL engines (the DuckDB oracle) can replay modular arithmetic but
#   not xxhash64. CAVEAT: 2-wise independence is NOT min-wise
#   independence — on corpora whose distinct-shingle universe is tiny
#   (templated synthetic text: ~2k shingles), the affine family's
#   est_jaccard can drift by a few points either way (measured here:
#   md5 -0.006, while the previous affine-over-xxh64 default drifted
#   +0.06 and inflated est>=0.3 candidates ~9x — the reason the
#   default path now uses the per-slot strong hash).
_MH_PRIME = (1 << 31) - 1


def _mh_params(num_hashes: int) -> "list[tuple[int, int]]":
    params = []
    x = 0x9E3779B9
    for _ in range(num_hashes):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        a = x % (_MH_PRIME - 1) + 1
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        b = x % _MH_PRIME
        params.append((a, b))
    return params


def _mh_derive(h: Column, a: int, b: int) -> Column:
    return F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MH_PRIME))


def _sig_slots_sql(src: str, num_hashes: int, hash_fn: str,
                   pre_reduced: bool) -> "list[str]":
    """Per-slot minhash SQL expressions over a hashed-shingle array
    column ``src``. xxh64 mode: a fresh strong hash per (value, slot)
    — min-wise independent in practice (see the family note above).
    md5 mode: the portable affine family; ``pre_reduced`` says whether
    ``src`` values are already in the prime field."""
    if hash_fn == "xxh64":
        return [f"array_min(transform({src}, _h -> xxhash64(_h, {i}L)))"
                for i in range(num_hashes)]
    inner = "_h" if pre_reduced else f"pmod(_h, {_MH_PRIME}L)"
    return [f"array_min(transform({src}, _h -> "
            f"pmod({inner} * {a}L + {b}L, {_MH_PRIME}L)))"
            for a, b in _mh_params(num_hashes)]


def minhash_signature(text: Column, num_hashes: int = 32, k: int = 5,
                      hash_fn: str = "xxh64") -> Column:
    """MinHash signature as a pure column expression — no shuffle.
    Slot derivation per the family note above (strong per-slot hash
    for xxh64, prime-field affine for portable md5)."""
    if hash_fn == "xxh64":
        sh = F.transform(shingles(text, k), lambda s: F.xxhash64(s))
        return F.array(*[
            F.array_min(F.transform(
                sh, lambda h: F.xxhash64(h, F.lit(i).cast("long"))))
            for i in range(num_hashes)
        ])
    sh = F.transform(shingles(text, k),
                     lambda s: F.pmod(_str_hash(s, hash_fn), F.lit(_MH_PRIME)))
    return F.array(*[
        F.array_min(F.transform(sh, lambda h: _mh_derive(h, a, b)))
        for a, b in _mh_params(num_hashes)
    ])


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k: int = 5,
    hash_fn: str = "xxh64",
) -> DataFrame:
    """MinHash signatures as pure per-row column expressions: the
    shingle array is string-hashed ONCE into an intermediate `_hs`
    projection, then every signature slot is an `array_min` over a
    cheap affine transform of `_hs`. Two stacked projections matter:
    CollapseProject declines to inline a non-cheap expression referenced
    ``num_hashes`` times, so `_hs` is evaluated once per row in codegen.

    No explode, no aggregation — the signature stage is map-only after
    one narrow (id, text) spread: document corpora often arrive as few
    Parquet files, and without the repartition the whole per-row hash
    work (and everything downstream) lands on a handful of tasks.
    Returns (_id, h0..h{n-1}).

    Built via selectExpr strings, not Column objects: the 32-slot
    projection costs ~0.5s of py4j chatter per invocation through the
    Column API and one JVM parse call as text (see _str_hash_sql)."""
    spread = df.sparkSession.sparkContext.defaultParallelism
    mod_prime = hash_fn == "md5"
    hs = (df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
            .repartition(spread, "_id")
            .selectExpr(
                "_id",
                f"{_shingle_hash_sql('_t', k, hash_fn, mod_prime=mod_prime)}"
                " AS _hs"))
    slots = _sig_slots_sql("_hs", num_hashes, hash_fn, pre_reduced=mod_prime)
    return hs.selectExpr(
        "_id", *[f"{s} AS h{i}" for i, s in enumerate(slots)])


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    min_est: float = 0.0,
    max_bucket: int = 10_000,
    audit_cap: bool = False,
    hash_fn: str = "xxh64",
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become a
    candidate pair. Returns (id_a, id_b, est_jaccard) with
    id_a < id_b, distinct.

    Pairs are generated from grouped band-buckets — collect
    (id, signature) per (band, hash), emit in-bucket combinations —
    rather than a self-join. Because the bucket payload carries both
    signatures, the agreement estimate ``est_jaccard`` (what Spark ML's
    MinHashLSH thresholds on) is computed INLINE at pair emission: no
    signature re-join, no broadcast, and the signature pipeline runs
    exactly once. The only shuffles are the bucket groupBy and the
    pair-dedup aggregate (narrow (long, long, double) rows).
    ``max_bucket`` caps degenerate buckets (e.g. an empty-string band)
    so one hot key cannot go quadratic — the standard LSH skew guard.

    Corpora with large near-duplicate clusters produce O(cluster²)
    candidates; pass ``min_est`` a notch under the final exact
    threshold so exact verification only runs on plausible pairs.

    Executes EAGERLY: the candidate set is materialized at call time
    (localCheckpoint) so the intermediate signature pin can be
    released instead of leaking for the session. Pass ``min_est``
    rather than composing a post-hoc filter, and note localCheckpoint
    storage does not survive executor loss (see README's fault-model
    note)."""
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k, hash_fn) \
        .select("_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("_sig"))
    pins: list[DataFrame] = []
    out = _candidates_from_sigs(sig, num_hashes, bands, min_est,
                                max_bucket, audit_cap, hash_fn, pins)
    # the candidate set is bounded (near-dups are rare at corpus
    # scale): materialize it eagerly so the intermediate signature pin
    # can be released instead of leaking for the session (paths.py's
    # pin discipline)
    out = out.localCheckpoint()
    for p in pins:
        p.unpersist(blocking=False)
    return out


def _candidates_from_sigs(
    sig: DataFrame,
    num_hashes: int,
    bands: int,
    min_est: float,
    max_bucket: int,
    audit_cap: bool,
    hash_fn: str = "xxh64",
    pins: "list[DataFrame] | None" = None,
) -> DataFrame:
    """Banding + in-bucket pair emission over a (_id, _sig) frame —
    the shared back half of ``minhash_lsh_candidates`` and
    ``minhash_neardup_pairs``.

    Buckets carry BARE ids: the band groupBy shuffles (band, bhash, id)
    rows and collect_list aggregates longs, not 32-slot signature
    structs — carrying the signatures into the buckets to compute the
    agreement estimate inline measured ~4x slower at sf0.1 (wide
    ObjectHashAggregate payload + a per-raw-pair zip_with allocation).
    The estimate is instead computed once per DISTINCT pair by joining
    the (tiny, persisted) signature frame back on both ids — est is a
    pair property, independent of which bucket surfaced the pair, so
    distinct-then-join equals the inline max(est) dedup exactly."""
    rows_per_band = num_hashes // bands
    # (id, num_hashes longs) — bounded at any corpus scale; serves the
    # banding branch and both est-join probes
    sig = sig.persist()
    if pins is not None:
        pins.append(sig)

    # Bucket key per band: the concatenated band slice xxhash64-folded
    # to a long — narrow shuffle rows in EVERY mode. Bucket keys never
    # reach the output; only the grouping they induce matters, and the
    # fold is injective modulo negligible collisions, so an external
    # oracle grouping by the RAW slice produces identical buckets →
    # identical member sets → identical pairs (md5-portable parity is
    # unaffected; asserted by the gate oracle and the md5 differential).
    def _band_key_sql(b: int) -> str:
        cat = ", ".join(
            f"CAST(element_at(_sig, {b * rows_per_band + r + 1}) AS STRING)"
            for r in range(rows_per_band))
        return f"xxhash64(concat_ws(',', {cat}))"

    keys = ", ".join(_band_key_sql(b) for b in range(bands))
    banded = sig.selectExpr(
        "_id", f"posexplode(array({keys})) AS (_band, _bhash)")
    grouped = (banded.groupBy("_band", "_bhash")
               .agg(F.array_sort(F.collect_list("_id")).alias("_ms"))
               .filter(F.size("_ms") >= 2))
    # The skew cap must never be SILENT. Two tiers:
    # - always: announce the active cap + the audit path (free,
    #   driver-side);
    # - audit_cap=True: count dropped buckets inside the normal job
    #   (CollectMetrics, no extra Spark job) and WARN with the number.
    #   Opt-in because CollectMetrics is a whole-stage-codegen barrier
    #   right where the wide signature rows feed the pair-explosion
    #   expression — measured ~2x on the banding stage at sf0.1.
    if audit_cap:
        obs = Observation()
        grouped = grouped.observe(
            obs, F.sum((F.size("_ms") > max_bucket).cast("long")).alias("dropped_buckets"))
        _warn_async(obs, "dropped_buckets",
                    "minhash_lsh_candidates: dropped %s bucket(s) larger than "
                    f"max_bucket={max_bucket} — a near-duplicate mega-cluster "
                    "may produce no candidate pairs")
    else:
        log.info(
            "minhash_lsh_candidates: skew cap max_bucket=%d active — "
            "oversized buckets are dropped; pass audit_cap=True or run "
            "lsh_skew_stats() to count them", max_bucket)
    buckets = grouped.filter(F.size("_ms") <= max_bucket)
    pair = F.explode(F.flatten(F.transform(
        F.col("_ms"),
        lambda x, i: F.transform(
            F.slice(F.col("_ms"), i + F.lit(2), F.size(F.col("_ms"))),
            lambda y: F.struct(x.alias("id_a"), y.alias("id_b"))),
    ))).alias("_p")
    # Near-exact duplicate clusters collide in EVERY band, producing
    # ``bands`` identical member-sets whose quadratic pair explosions
    # the final distinct would then have to dedup. Collapsing to
    # DISTINCT member-sets first (the arrays are sorted, so equality
    # is set equality) cuts the explosion by up to the band count on
    # template-heavy corpora and never changes the distinct pair set.
    pairs = (buckets.select("_ms").distinct()
             .select(pair)
             .select("_p.id_a", "_p.id_b")
             .distinct())
    matches = F.aggregate(
        F.zip_with("_siga", "_sigb", lambda a, b: (a == b).cast("int")),
        F.lit(0), lambda acc, v: acc + v)
    out = (pairs
           .join(sig.select(F.col("_id").alias("id_a"),
                            F.col("_sig").alias("_siga")), "id_a")
           .join(sig.select(F.col("_id").alias("id_b"),
                            F.col("_sig").alias("_sigb")), "id_b")
           .select("id_a", "id_b",
                   (matches / F.lit(num_hashes)).alias("est_jaccard")))
    if min_est > 0:
        out = out.filter(F.col("est_jaccard") >= min_est)
    return out


def minhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    min_est: float = 0.0,
    threshold: float = 0.5,
    max_bucket: int = 10_000,
    audit_cap: bool = False,
    hash_fn: str = "xxh64",
    reuse_hashes: bool = False,
) -> DataFrame:
    """Fused MinHash-LSH near-dup pipeline: candidate generation plus
    exact k-shingle verification. Returns (id_a, id_b, jaccard) with
    id_a < id_b and jaccard >= ``threshold`` — exactly the composition
    of ``minhash_lsh_candidates`` + ``ngram_jaccard_pairs`` with the
    same parameters (asserted by the pure-Python differential oracle in
    tests/test_differential_dedup.py), restructured for cost:

    - Union cardinality is ``|A|+|B|-|A∩B|`` over the (distinct)
      shingle-hash arrays — ``array_union`` materializes a
      corpus-width array per pair just to take its size, roughly
      doubling verify cost.
    - Signatures derive from the same hash family: pmod into the prime
      field is applied on top of the raw xxhash64 shingle hash, so the
      candidate set is bit-identical to ``minhash_lsh_candidates``.

    Scale shape: exactly two shingle-hash passes over the corpus — one
    map-only pass feeding the signature frame (persisted inside
    ``_candidates_from_sigs``: num_hashes longs per doc, bounded at any
    scale), and one CANDIDATE-BOUNDED pass feeding the verify join
    (persisted; at corpus scale candidates are rare, so re-hashing the
    few candidate docs beats pinning corpus-wide shingle sets).
    Banding shuffles narrow (band, bhash, id) rows, pair dedup
    shuffles (long, long) rows, and nothing is unconditionally
    broadcast — AQE picks broadcast sides from runtime sizes.

    ``reuse_hashes=True`` flips that trade: the hashed-shingle frame is
    persisted (MEMORY_AND_DISK, released at return) during the
    signature pass and the verify join reads it back, eliminating the
    second hash pass at the cost of pinning O(total distinct shingles)
    longs. Right for template-heavy corpora where candidates cover
    most documents (re-hashing would be a full pass anyway); wrong at
    sparse-candidate corpus scale, so the default stays False.

    Executes EAGERLY (localCheckpoint at return) so every pinned
    intermediate is released at call time — narrow the output with
    ``min_est``/``threshold``, not post-hoc filters."""
    spread = docs.sparkSession.sparkContext.defaultParallelism
    base = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))

    def hashed(frame: DataFrame) -> DataFrame:
        # repartition BEFORE hashing: document corpora often arrive as
        # a handful of parquet files, and hashed at scan width a few
        # tasks would do all the shingling work
        return (frame.repartition(spread, "_id")
                .selectExpr("_id",
                            f"{_shingle_hash_sql('_t', k, hash_fn, mod_prime=False)}"
                            " AS _sh"))

    pins: list[DataFrame] = []
    hs_full: DataFrame | None = None
    if reuse_hashes:
        from pyspark.storagelevel import StorageLevel
        hs_full = hashed(base).persist(StorageLevel.MEMORY_AND_DISK)
        pins.append(hs_full)
    slots = ", ".join(
        _sig_slots_sql("_sh", num_hashes, hash_fn, pre_reduced=False))
    sig = (hs_full if hs_full is not None else hashed(base)).selectExpr(
        "_id", f"array({slots}) AS _sig")
    cands = (_candidates_from_sigs(sig, num_hashes, bands, min_est,
                                   max_bucket, audit_cap, hash_fn, pins)
             .select("id_a", "id_b").persist())
    pins.append(cands)
    if hs_full is not None:
        # the signature pass already hashed (and pinned) every doc —
        # the verify joins below filter it to candidate ids on their
        # own (a separate semi-join prefilter pass measured ~0.9s of
        # pure overhead at sf0.1: it rewrites nothing the pair joins
        # don't already do)
        sh = hs_full
    else:
        # candidate-bounded second hash pass, persisted: one
        # computation serves both sides of the pair join
        ids = (cands.select(F.col("id_a").alias("_id"))
               .unionByName(cands.select(F.col("id_b").alias("_id")))
               .distinct())
        sh = hashed(base.join(ids, "_id", "left_semi")).persist()
        pins.append(sh)
    j = (cands
         .join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sa")), "id_a")
         .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sb")), "id_b"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    uni = F.size(F.col("sa")) + F.size(F.col("sb")) - inter
    out = (j.select("id_a", "id_b", (inter / uni).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))
    # near-dup output is bounded; materialize and release every pin so
    # repeated invocations don't accumulate pinned storage
    out = out.localCheckpoint()
    for p in pins:
        p.unpersist(blocking=False)
    return out


def fuzzy_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **mh_kwargs,
) -> DataFrame:
    """FUZZY benchmark decontamination — the near-duplicate complement
    of ``decontaminate_ngrams``'s exact 8-gram overlap: a train doc is
    contaminated when it is MinHash-near-dup to ANY eval doc, catching
    the light-paraphrase leaks exact n-gram containment misses
    (whitespace edits, a swapped sentence, re-tokenized quotes).

    Pure composition over the verified machinery: both corpora union
    into one frame with parity-encoded ids (train 2*id, eval 2*id+1 —
    requires numeric ids), ``minhash_neardup_pairs`` runs ONCE over
    the union with exactly its scale shape (banding, bucket caps,
    candidate-bounded verify), and only cross-parity pairs survive.
    Extra keyword args flow through to ``minhash_neardup_pairs``
    (threshold, bands, hash_fn, ...).

    At 100 TB the eval set is tiny next to train, so the union costs
    what train alone costs; every cross-corpus candidate comes out of
    the same banding shuffle (no train x eval join ever forms).

    Returns one row per TRAIN doc: (id, max_eval_jaccard double —
    NULL when clean, n_eval_matches long, contaminated boolean).

    The parity encoding halves the usable id space: ids must sit in
    (-2^62, 2^62) or 2*id(+1) would silently wrap in int64 — guarded
    by an in-expression raise (lazy branch, no extra job), so an
    out-of-range id fails the run loudly instead of colliding two
    documents."""
    lim = 1 << 62

    def _guarded(idc: Column) -> Column:
        idc = idc.cast("long")
        return F.when(
            (idc >= lim) | (idc <= -lim),
            F.raise_error(F.concat(
                F.lit("fuzzy_decontaminate: id "), idc.cast("string"),
                F.lit(" is outside (-2^62, 2^62) — the parity encoding "
                      "would overflow int64"))).cast("long")
        ).otherwise(idc)

    t = train.select((_guarded(F.col(id_col)) * 2).alias("_fid"),
                     F.col(text_col).alias("_ft"))
    e = eval_df.select((_guarded(F.col(id_col)) * 2 + 1).alias("_fid"),
                       F.col(text_col).alias("_ft"))
    pairs = minhash_neardup_pairs(t.unionByName(e), text_col="_ft",
                                  id_col="_fid", **mh_kwargs)
    cross = pairs.filter(
        F.pmod(F.col("id_a"), 2) != F.pmod(F.col("id_b"), 2))
    train_id = F.when(F.pmod(F.col("id_a"), 2) == 0, F.col("id_a")) \
        .otherwise(F.col("id_b"))
    # shiftright, NOT /2: Spark's / is double division, which silently
    # rounds ids above 2^53 (the guard test's 2^62-1 id would decode to
    # the wrong document); the encoded train id is even, so the
    # arithmetic shift is exact for the whole guarded range
    hits = (cross.select(F.shiftright(train_id, 1).alias(id_col),
                         "jaccard")
            .groupBy(id_col)
            .agg(F.max("jaccard").alias("max_eval_jaccard"),
                 F.count(F.lit(1)).alias("n_eval_matches")))
    return (train.select(id_col).join(hits, id_col, "left")
            .select(id_col, "max_eval_jaccard",
                    F.coalesce("n_eval_matches", F.lit(0)).cast("long")
                    .alias("n_eval_matches"),
                    F.col("n_eval_matches").isNotNull()
                    .alias("contaminated")))


def lsh_skew_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    max_bucket: int = 10_000,
    hash_fn: str = "xxh64",
) -> DataFrame:
    """Deterministic audit for the LSH skew cap: per-band bucket-size
    distribution and how many buckets ``minhash_lsh_candidates`` (same
    parameters) would drop. One aggregate job over the banding stream —
    run it when the in-band Observation warning was unavailable (AQE)
    or before committing to a parameter choice on a new corpus."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, k, hash_fn) \
        .select("_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("_sig"))

    def _band_key_sql(b: int) -> str:
        cat = ", ".join(
            f"CAST(element_at(_sig, {b * rows_per_band + r + 1}) AS STRING)"
            for r in range(rows_per_band))
        return f"xxhash64(concat_ws(',', {cat}))"

    keys = ", ".join(_band_key_sql(b) for b in range(bands))
    banded = sig.selectExpr(
        "_id", f"posexplode(array({keys})) AS (_band, _bhash)")
    sizes = banded.groupBy("_band", "_bhash").agg(F.count(F.lit(1)).alias("_n"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("_n") >= 2).cast("long")).alias("n_pairable"),
        F.sum((F.col("_n") > max_bucket).cast("long")).alias("n_dropped"),
        F.max("_n").alias("max_bucket_size"),
    )


def jaccard_char_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_id: int | None = None,
    threshold: float = 0.0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact character-set Jaccard over an explicitly BOUNDED scope
    (the verification step of near-dup detection): either an id range
    (``max_id``) or a candidate id frame (``candidates`` — one ``_id``/
    first column per doc, e.g. LSH bucket members). All-pairs on an
    unbounded corpus is a scale-killer, so the bound is REQUIRED — the
    function raises rather than silently planning a corpus² crossJoin.
    Returns (id_a, id_b, inter, uni) as exact integers — callers
    derive the ratio."""
    if max_id is None and candidates is None:
        raise ValueError(
            "jaccard_char_pairs is all-pairs within its scope; pass "
            "max_id=<bound> or candidates=<id frame> (at scale, feed "
            "LSH candidates — ngram_jaccard_pairs — instead)")
    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    if candidates is not None:
        cand_ids = candidates.select(
            F.col(candidates.columns[0]).alias("_id")).distinct()
        base = base.join(cand_ids, "_id", "left_semi")
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
    hash_fn: str = "xxh64",
) -> DataFrame:
    """Verify LSH candidate pairs with exact k-shingle Jaccard.

    Only documents that appear in a candidate pair ever get shingled:
    the doc table is first semi-joined to the candidate id set, so the
    corpus-sized side is never shuffled or broadcast wholesale. The id
    set and the reduced shingle table are both candidate-bounded — AQE
    sees their runtime sizes and broadcasts them on its own, which is
    exactly the scale-safe plan (a forced full-table broadcast OOMs at
    corpus scale; a full-table shuffle to serve a few thousand pairs is
    the opposite failure). ``broadcast_docs=True`` forces the hint on
    the (already reduced) shingle table for plan comparisons."""
    spread = docs.sparkSession.sparkContext.defaultParallelism
    ids = (candidates.select(F.col("id_a").alias("_id"))
           .unionByName(candidates.select(F.col("id_b").alias("_id")))
           .distinct())
    # shingle sets are compared as the configured hash_fn's longs
    # (xxhash64, or 60-bit md5-prefix in portable mode), not 5-char
    # strings: set sizes are preserved (collisions are ~n²/2⁶⁰+,
    # negligible) and long-array intersection is several times cheaper
    # than string-array
    sh = (docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
              .join(ids, "_id", "left_semi")
              .repartition(spread, "_id")
              .selectExpr("_id",
                          f"{_shingle_hash_sql('_t', k, hash_fn, mod_prime=False)}"
                          " AS _sh"))
    if broadcast_docs:
        sh = F.broadcast(sh)
    j = (candidates
         .join(sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sa")), "id_a")
         .join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sb")), "id_b"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    # |A∪B| = |A|+|B|-|A∩B| over the distinct shingle arrays:
    # array_union would materialize a corpus-width array per pair
    # just to take its size (~2x the verify stage's cost)
    uni = F.size(F.col("sa")) + F.size(F.col("sb")) - inter
    return (j.select("id_a", "id_b", (inter / uni).alias("jaccard"))
             .filter(F.col("jaccard") >= threshold))


def simhash_neardup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxh64",
) -> DataFrame:
    """SimHash near-duplicate pairs: docs within ``max_hamming`` bits.
    Banding (pigeonhole: two hashes within k bits agree exactly on at
    least one of k+1 bands) turns the quadratic scan into a bucket
    join; the hamming check is one JVM-side bit_count(xor).
    Executes EAGERLY (localCheckpoint at return) so the signature pin
    is released at call time — narrow via ``max_hamming``, not
    post-hoc filters."""
    sig = simhash(df, text_col, id_col, bits, hash_fn).persist()
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
    out = pairs.filter(F.col("hamming") <= max_hamming).localCheckpoint()
    sig.unpersist(blocking=False)
    return out


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 32, hash_fn: str = "xxh64") -> DataFrame:
    """SimHash over whitespace tokens: bit j of the hash is the majority
    vote of bit j across token hashes. One explode + one aggregate."""
    if hash_fn == "md5" and bits > 60:
        # the md5-prefix hash carries only 60 bits — higher signature
        # bits would be constant zero and silently underestimate
        # hamming distances
        raise ValueError("simhash: bits must be <= 60 when hash_fn='md5' "
                         "(the md5-prefix hash is 60-bit)")
    # SQL-string construction, same rationale as _str_hash_sql: the
    # 32 per-bit aggregates + 32-term majority expression cost ~0.8s
    # of py4j plan-construction per invocation through the Column API
    toks = df.selectExpr(
        f"`{id_col}` AS _id",
        f"explode(split(trim(lower(`{text_col}`)), '\\\\s+')) AS _tok",
    ).selectExpr("_id", f"{_str_hash_sql('_tok', hash_fn)} AS _h")
    bit_sums = toks.groupBy("_id").agg(
        F.expr("count(1)").alias("_n"),
        *[F.expr(f"sum(shiftrightunsigned(_h, {j}) & 1)").alias(f"_b{j}")
          for j in range(bits)],
    )
    terms = " + ".join(
        f"(CASE WHEN _b{j} * 2 > _n THEN {1 << j}L ELSE 0L END)"
        for j in range(bits))
    return bit_sums.selectExpr(f"_id AS `{id_col}`", f"({terms}) AS simhash")


def canonical_by_score(
    assignments: DataFrame,
    scores: DataFrame,
    id_col: str = "id",
    comp_col: str = "component",
    score_col: str = "score",
    require_scored: bool = False,
) -> DataFrame:
    """Quality-aware canonical selection: given cluster assignments
    (``connected_components`` output, or any (id, component) frame)
    and a per-id quality score, keep the HIGHEST-scoring member of
    each duplicate cluster instead of the arbitrary min-id one — the
    "keep the best copy" rule real curation pipelines apply (longest
    document, highest quality_score, lowest perplexity via a negated
    score). Ties break to the LOWEST id, so selection is total and
    deterministic.

    Skew-safe by construction: the per-cluster argmax is ONE hash
    aggregate — max(struct(score, -id)) — never a per-cluster sort
    window, so a degenerate giant cluster costs a partial-aggregated
    shuffle row, not a single-task sort. The one-row-per-cluster best
    frame then joins back (broadcast-sized at any realistic cluster
    count). Requires a numeric id (the tie-break negates it).

    JOIN SEMANTICS (explicit, not incidental): assignments INNER-join
    scores, so a cluster member with no score row is dropped from the
    output and can never be elected best — a cluster whose true best
    copy is unscored elects a different canonical with no signal.
    That is the right default when scores come from the same pipeline
    stage (every id has one); when they might not, pass
    ``require_scored=True`` to fail the run loudly on the first
    unscored member instead of silently dropping it.

    Returns (id, component, score, keep boolean, best_id)."""
    s = scores.select(F.col(id_col), F.col(score_col))
    if require_scored:
        sc = F.col(score_col)
        guarded = F.when(sc.isNull() & F.col(id_col).isNotNull(),
                         F.raise_error(F.concat(
                             F.lit("canonical_by_score: id "),
                             F.col(id_col).cast("string"),
                             F.lit(" has no score row "
                                   "(require_scored=True)")))
                         .cast(s.schema[score_col].dataType)
                         ).otherwise(sc)
        j = (assignments.select(F.col(id_col), F.col(comp_col))
             .join(s, id_col, "left")
             .select(id_col, comp_col, guarded.alias(score_col)))
    else:
        j = assignments.select(F.col(id_col), F.col(comp_col)).join(
            s, id_col)
    best = (j.groupBy(comp_col)
            .agg(F.max(F.struct(F.col(score_col).alias("_s"),
                                (-F.col(id_col)).alias("_nid"))).alias("_b"))
            .select(F.col(comp_col),
                    (-F.col("_b._nid")).alias("best_id")))
    return (j.join(best, comp_col)
            .select(id_col, comp_col, score_col,
                    (F.col(id_col) == F.col("best_id")).alias("keep"),
                    "best_id"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    nodes: DataFrame | None = None,
    max_iters: int = 50,
    driver_max_edges: int = 100_000,
) -> DataFrame:
    """Connected components of the undirected near-duplicate pair
    graph — the canonicalization step of fuzzy dedup: every doc in a
    component keeps the component's minimum id as its label, so
    "keep one representative per near-dup cluster" is a filter on
    ``id == component``.

    Min-label propagation: each round every node takes the minimum of
    its own label and its neighbors' labels, converging in
    O(component diameter) rounds — near-dup clusters are dense and
    shallow, so a handful of rounds closes them. Per round: one
    edge-to-label equi-join + min aggregate (both shuffles on narrow
    (long, long) rows) and a driver-side convergence count, the same
    iterate-persist-unpersist generational pattern as the path
    operators (operators/paths.py): the previous generation is
    unpersisted as soon as the next materializes, so at most two label
    frames are ever pinned. On the distributed path the symmetric edge
    list is persisted for the loop and released before returning, and
    the returned frame is localCheckpoint-materialized so it holds no
    reference to the pins; the driver fast path returns a lazy frame
    built purely from the driver-side label map.

    ``nodes`` (optional, single id column) widens the universe:
    unpaired ids come back as singleton components of themselves.
    Returns (id, component). Hitting ``max_iters`` before convergence
    WARNS and returns the partially-converged labels (no silent cap).

    Scale shape (two regimes, picked by the edge count the loop needs
    anyway): near-dup pair graphs are SPARSE at corpus scale — most
    docs are singletons and only paired docs need label propagation.
    When the raw pair list fits the driver (``driver_max_edges``,
    ~1.5 MB of longs at the default), the component labels are solved
    in one union-find pass over the collected pairs (duplicates and
    orientation are irrelevant to union-find, so the r14 fast path
    skips the symmetrize+distinct exchange AND the output checkpoint —
    the label map and endpoint universe live on the driver, so the
    returned plan is independent of the pair frame: two jobs total)
    and broadcast-joined back onto the (arbitrarily large,
    distributed) node universe — zero iterative rounds instead of
    O(log diameter) rounds of ~0.5 s scheduler overhead each. Above
    the threshold the distributed min-label + pointer-jumping loop
    below takes over; ``driver_max_edges=0`` forces it (the
    differential tests pin both paths against each other).
    """
    from pyspark.storagelevel import StorageLevel

    # r14: the RAW pair list gates the regime — not the symmetrized-
    # distinct edge set. The driver fast path needs neither symmetry
    # nor dedup (union-find is idempotent over duplicate and reversed
    # edges), so the distinct+symmetrize exchange happens only on the
    # distributed path. r15 (guide §5, r14 verdict item 6): the gate is
    # a bounded LIMIT probe, not a persist+count of the full frame —
    # at corpus scale persisting a huge pair frame (MEMORY_AND_DISK)
    # just to count it is material write amplification, while
    # limit(k+1).count() short-circuits as soon as k+1 rows exist and
    # returns exactly min(|pairs|, k+1), so the regime decision is
    # unchanged. Callers hand in already-materialized pair frames
    # (minhash/exact dedup outputs localCheckpoint eagerly), so the
    # probe and the fast path's collect never recompute a heavy plan.
    raw = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # fused probe+fetch (r15): limit(k+1).collect() ships at most k+1
    # narrow rows AND answers the regime question — len <= k means the
    # bounded fetch exhausted the frame, so the collected rows ARE the
    # complete pair set. The previous probe-then-collect pair ran the
    # (lazy, possibly expensive) pair-producing plan twice per call —
    # measured as a second full interpreted-cosine pair join in
    # dedup_cluster / dedup_keep_best.
    local = raw.limit(driver_max_edges + 1).collect()
    if len(local) <= driver_max_edges:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in local:
            ra, rb = find(row["src"]), find(row["dst"])
            if ra != rb:
                # min-id root keeps the min-label contract exactly
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        endpoints = {v for row in local for v in (row["src"], row["dst"])}
        labels = [(x, find(x)) for x in endpoints]
        spark = pairs.sparkSession
        # label map inherits the id type (graph ids are longs, doc keys
        # may be strings — Python min and F.least order both the same
        # way, so the min-label contract holds for either)
        import pyspark.sql.types as T
        id_dt = raw.schema["src"].dataType
        comp_schema = T.StructType([T.StructField("id", id_dt),
                                    T.StructField("component", id_dt)])
        comp = spark.createDataFrame(labels, comp_schema)
        # the endpoint universe is already on the driver — base builds
        # from the collected set, so the output plan never references
        # the pair frame and needs no checkpoint to outlive the pin
        base = comp.select("id")
        if nodes is not None:
            base = base.unionByName(nodes.toDF("id")).distinct()
        out = (base.join(F.broadcast(comp), "id", "left")
               .select("id", F.coalesce("component", "id").alias("component")))
        return out
    sym = raw.select("src", "dst")
    edges = (sym.unionByName(
                sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
             .distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    # size the loop's parallelism to the graph: the iteration cost on
    # small pair graphs is pure task-scheduling overhead, so a modest
    # graph must not run 32-task rounds; big graphs keep full width.
    # The count also materializes the edge pin for the loop.
    n_edges = edges.count()
    spread = pairs.sparkSession.sparkContext.defaultParallelism
    width = max(1, min(spread, n_edges // 50_000))
    edges = edges.repartition(width, "src")
    base = edges.select(F.col("src").alias("id")).distinct()
    if nodes is not None:
        base = base.unionByName(nodes.toDF("id")).distinct()
    # localCheckpoint (eager), not persist: the label frame feeds the
    # next generation TWICE (propagation join + label update), so an
    # un-truncated lineage doubles every round and the analyzer blows
    # up long before the executors do — checkpointing pins a
    # generation-sized RDD and keeps the plan constant-size (same
    # pattern as operators/paths.py)
    lab = (base.repartition(width, "id")
           .select("id", F.col("id").alias("component")).localCheckpoint())
    converged = False
    for _ in range(max_iters):
        # one min-label step + one pointer jump per materialized round
        # (wider rounds measured slower at sf0.1 — the bigger per-job
        # DAG outweighs the saved rounds)
        nbr = (edges
               .join(lab.select(F.col("id").alias("src"),
                                F.col("component").alias("_nc")), "src")
               .groupBy(F.col("dst").alias("id"))
               .agg(F.min("_nc").alias("_m")))
        # least() ignores NULLs, so unpaired nodes keep their label
        stepped = (lab.join(nbr, "id", "left")
                   .select("id", F.col("component").alias("_old"),
                           F.least("component", "_m").alias("component")))
        # pointer jump: component := label[component]. Labels are
        # always node ids of the same component and only ever
        # decrease, so shortcutting through the label table is safe
        # and turns O(diameter) convergence into O(log diameter) —
        # near-dup chains (doc A ~ B ~ C ~ ...) otherwise cost one
        # full round per link.
        jump = stepped.select(F.col("id").alias("_jid"),
                              F.col("component").alias("_jc"))
        # LAZY localCheckpoint: the convergence count below is the
        # round's first action, so it materializes the checkpoint AND
        # counts in ONE job — an eager checkpoint would pay a separate
        # job per round just to follow it with the count
        new = (stepped.join(jump, stepped.component == jump._jid, "left")
               .select("id", "_old",
                       F.least("component", "_jc").alias("component"))
               .localCheckpoint(eager=False))
        changed = new.filter(F.col("component") != F.col("_old")).count()
        lab = new  # superseded checkpoint storage is freed on GC
        if changed == 0:
            converged = True
            break
    if not converged:
        log.warning(
            "connected_components: max_iters=%d reached before "
            "convergence — labels of very long chains may not be fully "
            "propagated", max_iters)
    out = lab.select("id", "component").localCheckpoint()
    edges.unpersist(blocking=False)
    return out


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: for every training document, count
    distinct token n-grams it shares with ANY document of the eval
    corpus (the standard n-gram-collision check run before training).
    Returns (doc_id, n_grams, n_hits) — callers threshold n_hits (or
    the ratio) to drop contaminated docs.

    Grams are md5-prefix hashes of space-joined n-token windows —
    md5 (unlike xxhash64) exists in every SQL engine, so the whole
    check is externally replayable. The eval side reduces to a
    DISTINCT gram set (eval corpora are benchmark-sized — thousands of
    docs — so AQE broadcasts it); the training side streams one
    exploded gram row per token, never collecting anything wider than
    (doc_id, gram)."""

    def gram_stream(df: DataFrame) -> DataFrame:
        # positions-first extraction (see duplicate_spans): exploding
        # an inlined gram ARRAY makes GenerateExec re-evaluate the
        # whole build — with the md5 inside — once per output element,
        # quadratic in the per-doc window count (this operator read
        # 6.4s at sf0.1 before, ~1s after). The exploded child is the
        # cheap int sequence; slice+concat+md5 run once per gram after
        # the explode; per-doc distinct moves to a dropDuplicates
        # (linear shuffle instead of quadratic CPU).
        toked = df.select(
            F.col(id_col).alias("_id"),
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_t"))
        t = F.col("_t")
        # guard: sequence(1, 0) counts DOWN in Spark — docs shorter
        # than n tokens must yield an empty position list
        idx = F.when(F.size(t) >= n,
                     F.sequence(F.lit(1), F.size(t) - n + 1)) \
            .otherwise(F.array().cast("array<int>"))
        return (toked.select("_id", "_t", F.explode(idx).alias("_i"))
                .select("_id", F.substring(F.md5(F.concat_ws(
                    " ", F.slice(t, F.col("_i"), F.lit(n)))), 1, 16)
                    .alias("gram"))
                .dropDuplicates(["_id", "gram"]))

    ev = gram_stream(eval_df).select("gram").distinct()
    tr = gram_stream(train)
    n_grams = tr.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"))
    hits = (tr.join(ev, "gram", "left_semi")
            .groupBy("_id").agg(F.count(F.lit(1)).alias("n_hits")))
    base = train.select(F.col(id_col).alias("_id"))
    return (base.join(n_grams, "_id", "left").join(hits, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce("n_grams", F.lit(0)).cast("long")
                    .alias("n_grams"),
                    F.coalesce("n_hits", F.lit(0)).cast("long")
                    .alias("n_hits")))


def duplicate_spans(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicate-SPAN detection — the distributed
    approximation of exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", whose
    reference tool builds a suffix array): a token n-gram is
    *duplicated* when it occurs in more than one DISTINCT document;
    per document we report how many of its gram positions are
    duplicated and the longest CONSECUTIVE duplicated run converted to
    tokens (run + n - 1) — exactly the span a surgical dedup pass
    would cut instead of dropping the whole document. Within-doc
    repeats alone do not flag (cross-doc scope by design; pair with
    ``text.repetition_stats`` for intra-doc signals).

    Scale shape: positional gram extraction is map-only (one
    posexplode per doc); cross-doc detection is ONE hash aggregate on
    the gram key using min(doc) != max(doc) — no count-distinct, the
    shuffle carries (hash, two ids); the flagged set joins back
    LEFT SEMI on the same gram key; the runs are gaps-and-islands
    windows on the doc key (pos - row_number), one doc-key shuffle
    that the final per-doc aggregate reuses. A suffix array would be
    cheaper on one node; at 1000 executors this is three narrow
    shuffles and no global sort. Returns (id, n_grams, n_dup_grams,
    max_span_tokens), zeros for clean or short docs."""
    from pyspark.sql import Window
    # Positions-first extraction — the Generate-safe shape (measured
    # 20s -> ~1s on 5000 docs): GenerateExec re-evaluates an INLINED
    # child expression once per OUTPUT element, so exploding an array
    # that builds the windows (let alone hashes them) is quadratic in
    # the per-doc window count. Exploding the cheap integer sequence
    # instead keeps the re-evaluated child trivial; the token array
    # rides through the Generate as a regular column (evaluated once
    # per input row) and each slice+concat+md5 happens once per gram,
    # AFTER the explode.
    toked = df.select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_t"))
    t = F.col("_t")
    # sequence(1, 0) counts DOWN in Spark: short docs must yield an
    # empty position list, not junk windows (same guard as
    # ngram_overlap)
    idx = F.when(
        F.size(t) >= n,
        F.sequence(F.lit(1), F.size(t) - n + 1),
    ).otherwise(F.array().cast("array<int>"))
    pos = (toked.select("_id", "_t", F.explode(idx).alias("_i"))
           .select("_id", (F.col("_i") - 1).alias("pos"),
                   F.substring(F.md5(F.concat_ws(
                       " ", F.slice(t, F.col("_i"), F.lit(n)))), 1, 16)
                   .alias("h")))
    dup = (pos.groupBy("h")
           .agg((F.min("_id") != F.max("_id")).alias("_dup"))
           .filter("_dup").select("h"))
    marked = pos.join(dup, "h", "left_semi")
    w = Window.partitionBy("_id").orderBy("pos")
    runs = (marked
            .withColumn("_grp", F.col("pos") - F.row_number().over(w))
            .groupBy("_id", "_grp").agg(F.count(F.lit(1)).alias("_run")))
    per_doc = (runs.groupBy("_id")
               .agg(F.sum("_run").alias("n_dup"),
                    F.max("_run").alias("_maxrun")))
    # n_grams is arithmetic on the token count — never rebuild the
    # window array just to measure it
    base = toked.select(
        "_id", F.greatest(F.size(t) - n + 1, F.lit(0)).cast("long")
        .alias("n_grams"))
    return (base.join(per_doc, "_id", "left")
            .select(F.col("_id").alias(id_col), "n_grams",
                    F.coalesce("n_dup", F.lit(0)).cast("long")
                    .alias("n_dup_grams"),
                    F.coalesce(F.col("_maxrun") + F.lit(n - 1), F.lit(0))
                    .cast("long").alias("max_span_tokens")))
