"""Text analysis operators over a document table.

All pure `pyspark.sql.functions` column expressions (JVM-side,
whole-stage codegen) — no Python UDFs in any hot path. Each operator
is deterministic so a SQL oracle can replay it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# A deliberately simple, SQL-replayable stopword inventory per language.
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "und", "nicht"],
    "fr": ["le", "et", "les"],
}


def token_count(text: Column) -> Column:
    """Whitespace tokenization; empty/blank text counts 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0).cast("long")) \
            .otherwise(F.size(F.split(t, r"\s+")).cast("long"))


def substr_count(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring (length-difference trick —
    exact, engine-portable)."""
    return ((F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))) / len(needle)).cast("long")


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document counts: chars, tokens, punctuation, digits, 'the'."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        token_count(t).alias("n_tokens"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))).cast("long").alias("n_punct"),
        (F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))).cast("long").alias("n_digits"),
        substr_count(t, "the").alias("n_the"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality scoring: token/char shape signals, scaled to
    integer basis points to stay engine-exact (no float rounding drift)."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = token_count(t)
    mean_tok_len_x100 = F.when(n_tokens > 0, F.floor((n_chars - n_tokens + 1) * 100 / n_tokens).cast("long")).otherwise(F.lit(0))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_tok_len_x100.alias("mean_token_len_x100"),
        (n_tokens >= 10).cast("boolean").alias("len_ok"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """n-gram-marker language vote: count per-language stopword hits
    (substring occurrences with word boundaries approximated by spaces),
    pick argmax with 'unk' fallback."""
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {lang: sum_cols([substr_count(t, f" {w} ") for w in words])
              for lang, words in LANG_MARKERS.items()}
    best = None
    best_score = None
    for lang, score in scores.items():
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            swap = score > best_score
            best = F.when(swap, F.lit(lang)).otherwise(best)
            best_score = F.when(swap, score).otherwise(best_score)
    pred = F.when(best_score > 0, best).otherwise(F.lit("unk"))
    return df.select(F.col(id_col), pred.alias("lang_pred"), best_score.cast("long").alias("lang_hits"))


def sum_cols(cols: list[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


# GPT-style pre-tokenization classes: letter runs, digit runs, other
# non-space runs. RE2/Java-portable (no lookarounds) so the same
# pattern runs on Spark and any SQL oracle.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace split vs a BPE-ish pre-tokenizer
    regex (letter/digit/punctuation runs — the usual byte-pair
    pre-segmentation shape). Counts only; the id→token explode is
    `tokens()` below."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens_ws"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), F.lit(0))).cast("long").alias("n_tokens_bpe"),
    )


def tokens(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exploded (doc_id, pos, token) stream under the BPE-ish
    pre-tokenizer — the input shape for vocabulary building."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0)))
         .alias("pos", "token"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Winnowing rolling-hash document fingerprints (Schleimer/
    Wilkerson/Aiken, SIGMOD'03 — the MOSS scheme): hash every k-gram of
    the lowercased text, slide a window of ``window`` consecutive
    hashes, keep each window's minimum; the distinct selected hashes
    are the document's fingerprints. Guarantee: documents sharing any
    substring of length >= window + k - 1 share a fingerprint.

    Hashes are md5 prefixes compared lexicographically — identical in
    any engine, so a SQL oracle can replay the selection exactly. Pure
    column expressions (one map-side pass, no shuffle); returns a
    per-document summary (count / min / max fingerprint) — the join
    shape for fingerprint-based candidate generation is the same
    banding join the MinHash pipeline uses."""
    t = F.lower(F.col(text_col))
    n = F.length(t)
    grams = F.transform(F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
                        lambda i: t.substr(i, F.lit(k)))
    hs = F.transform(grams, lambda g: F.substring(F.md5(g.cast("binary")), 1, 16))
    # stacked projections: expressions referenced inside array lambdas
    # are NOT common-subexpression-eliminated across lambda boundaries —
    # inlining `hs` into the window transform would recompute the whole
    # k-gram hash array once PER WINDOW (O(n²) md5 calls per document;
    # measured 140s vs ~2s on the 500-doc sf0.01 corpus). Materializing
    # each stage as a column keeps every stage O(n) per row.
    staged = df.select(F.col(id_col), hs.alias("_hs"))
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_hs") - window + 1, F.lit(1))),
        lambda j: F.array_min(F.slice(F.col("_hs"), j, window)))
    staged = staged.select(F.col(id_col), F.array_distinct(wins).alias("_fps"))
    return staged.select(
        F.col(id_col),
        F.size("_fps").cast("long").alias("n_fingerprints"),
        F.array_min("_fps").alias("min_fp"),
        F.array_max("_fps").alias("max_fp"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprints: md5 (engine-portable) +
    xxhash64 (Spark-native 64-bit, used by dedup internals)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.md5(t.cast("binary")).alias("md5"),
        F.xxhash64(t).alias("xxh64"),
    )


def outlier_bounds_filter(
    df: DataFrame,
    value_col: str,
    by: tuple[str, ...] = (),
    lo: float = 0.05,
    hi: float = 0.95,
    decimals: int = 6,
    approx: bool = False,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Quantile-bounds outlier flagging — the per-language length
    filter every curation pipeline runs (drop the truncated fragments
    below p5 and the concatenation accidents above p95, computed
    WITHIN each language/stratum so a verbose language's normal docs
    don't read as outliers of a terse one).

    Two passes, both scale-shaped: one exact percentile aggregate per
    group (the bounds frame is group-count-sized), broadcast back, and
    a map-side keep flag. Bounds are rounded to ``decimals`` before
    the comparison — part of the determinism contract: exact
    percentiles interpolate in doubles, and an unrounded bound could
    flip a row that sits exactly on it between engines. Returns the
    input plus (lo_bound, hi_bound, keep boolean); filtering is the
    caller's `.filter("keep")`.

    Tiny strata caveat: interpolated quantiles of an n-row group sit
    strictly inside the value range for 0 < lo <= hi < 1 when n is
    small (two values at p10/p90 exclude BOTH) — filter strata below a
    size floor first if that's not the intent.

    ``approx=True`` swaps the exact percentile for ``approx_percentile``
    (Greenwald-Khanna sketch): the exact aggregate's buffer grows with
    DISTINCT VALUES per group — fine for bounded-cardinality values
    like document lengths, but a hazard for unbounded-cardinality
    columns (raw scores, durations in micros) at 100 TB, where the
    sketch's O(accuracy) buffer is the safe shape.
    ``approx_accuracy`` is Spark's accuracy knob: the rank error is at
    most 1/accuracy (default 10,000 -> 0.01% of rows may land on the
    wrong side of a bound). The sketch returns an OBSERVED value, not
    an interpolation, so tiny-strata behavior differs slightly from
    exact mode; exact stays the default and the oracle-replayed
    contract."""
    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError(f"need 0 <= lo <= hi <= 1, got {lo}, {hi}")
    if approx_accuracy <= 0:
        raise ValueError(f"approx_accuracy must be positive, "
                         f"got {approx_accuracy}")
    v = F.col(value_col).cast("double")
    if approx:
        pct = [F.approx_percentile(v, F.lit(float(q)),
                                   F.lit(int(approx_accuracy)))
               for q in (lo, hi)]
    else:
        pct = [F.percentile(v, F.lit(float(q))) for q in (lo, hi)]
    agg = df.groupBy(*[F.col(c) for c in by]).agg(
        F.round(pct[0], decimals).alias("lo_bound"),
        F.round(pct[1], decimals).alias("hi_bound"))
    if by:
        j = df.join(F.broadcast(agg), list(by))
    else:
        j = df.crossJoin(F.broadcast(agg))
    return j.withColumn(
        "keep", (v >= F.col("lo_bound")) & (v <= F.col("hi_bound")))


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical text cleanup — the normalization pass every corpus
    ingestion runs before hashing/dedup so that byte-level noise
    (stray control chars, NBSP vs space, runs of whitespace, ragged
    edges) doesn't defeat exact dedup or skew token counts:

    1. control chars (C0 + DEL) and zero-width/BOM marks -> dropped,
    2. unicode space separators (NBSP, en/em/thin space, ideographic
       space) -> ASCII space,
    3. whitespace runs (incl. tab/newline) -> one space,
    4. leading/trailing whitespace -> trimmed.

    Map-only pure column expressions, deterministic and SQL-replayable
    (every step is a regexp_replace an external engine reproduces).
    Returns (id, norm_text, changed boolean, n_chars_saved long) —
    `changed` lets a pipeline route untouched docs around a rewrite."""
    t = F.col(text_col)
    step = F.regexp_replace(t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f"
                               "\\u200b\\u200c\\u200d\\ufeff]", "")
    step = F.regexp_replace(
        step, "[\\u00a0\\u1680\\u2000-\\u200a\\u202f\\u205f\\u3000]", " ")
    step = F.trim(F.regexp_replace(step, "\\s+", " "))
    return df.select(
        F.col(id_col),
        step.alias("norm_text"),
        (step != t).alias("changed"),
        (F.length(t) - F.length(step)).cast("long").alias("n_chars_saved"))


def heuristic_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_ttr_bp: int = 2_000,
    max_digit_bp: int = 2_000,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher/C4-style document quality gate for training-data
    pipelines: length window, type-token ratio (repetition filter —
    'batch batch batch' collapses it), digit-character fraction, and
    boilerplate flags (brace => code/markup, 'lorem ipsum' =>
    placeholder). Ratios are integer basis points so the signals are
    engine-exact; the verdict and every signal are returned so the
    gate doubles as an audit table. Pure column expressions — map-only
    at any corpus scale, no shuffle, no UDFs."""
    t = F.col(text_col)
    trimmed = F.trim(t)
    toks = F.split(trimmed, r"\s+")
    n_tok = (F.when(F.length(trimmed) == 0, F.lit(0))
             .otherwise(F.size(toks))).cast("long")
    n_chars = F.length(t).cast("long")
    n_digits = (F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", ""))).cast("long")
    ttr_bp = (F.when(n_tok > 0,
                     F.floor(F.size(F.array_distinct(toks)).cast("long") * 10_000 / n_tok))
              .otherwise(F.lit(0))).cast("long")
    digit_bp = (F.when(n_chars > 0, F.floor(n_digits * 10_000 / n_chars))
                .otherwise(F.lit(0))).cast("long")
    has_brace = t.contains("{")
    has_lorem = F.lower(t).contains("lorem ipsum")
    keep = ((n_tok >= min_tokens) & (n_tok <= max_tokens)
            & (ttr_bp >= min_ttr_bp) & (digit_bp <= max_digit_bp)
            & ~has_brace & ~has_lorem)
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        n_tok.alias("n_tokens"),
        ttr_bp.alias("ttr_bp"),
        digit_bp.alias("digit_bp"),
        has_brace.alias("has_brace"),
        has_lorem.alias("has_lorem"),
        keep.alias("keep"),
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_bp: int = 3000,
    max_dup_line_char_bp: int = 3000,
    max_top_bigram_bp: int = 1800,
    max_dup_fivegram_bp: int = 3000,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style INTRA-document repetition signals — the standard
    training-data gate that catches boilerplate/listicle/generated
    pages exact- and fuzzy-dedup cannot (they compare across docs):

    - dup_line_bp:        duplicate-line fraction (occurrences beyond
                          each line's first)
    - dup_line_char_bp:   character mass of those duplicate lines
    - top_bigram_bp:      fraction of word-2gram slots taken by the
                          single most frequent 2-gram
    - dup_fivegram_bp:    fraction of word-5gram slots that repeat

    All integer basis points (engine-exact); ``keep`` ANDs the four
    thresholds. Map-only column expressions — no shuffle, no UDFs; the
    modal-bigram count is a sorted-run fold over the doc's own bigram
    array, O(n log n) per document."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("long")  # >= 1: split('') = ['']
    n_dup_lines = (F.size(lines) - F.size(F.array_distinct(lines))).cast("long")
    lens = lambda arr: F.aggregate(  # noqa: E731
        F.transform(arr, lambda x: F.length(x)),
        F.lit(0), lambda a, x: a + x).cast("long")
    line_chars = lens(lines)
    dup_line_chars = line_chars - lens(F.array_distinct(lines))

    trimmed = F.trim(t)
    empty = F.array().cast("array<string>")
    toks = F.when(F.length(trimmed) == 0, empty).otherwise(F.split(trimmed, r"\s+"))
    n_tok = F.size(toks)
    bigrams = F.when(n_tok >= 2, F.transform(
        F.sequence(F.lit(1), n_tok - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1)))).otherwise(empty)
    fivegrams = F.when(n_tok >= 5, F.transform(
        F.sequence(F.lit(1), n_tok - 4),
        lambda i: F.concat_ws(" ", F.slice(toks, i, F.lit(5))))).otherwise(empty)
    n_bg = F.size(bigrams).cast("long")
    n_fg = F.size(fivegrams).cast("long")
    # modal bigram count: longest equal-run of the sorted bigram array
    # ('' sentinel can never collide — tokens are non-empty post-trim)
    zl = F.lit(0).cast("long")
    run_next = lambda acc, x: (  # noqa: E731
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")))
    best_bg = F.aggregate(
        F.array_sort(bigrams),
        F.struct(F.lit("").alias("prev"), zl.alias("run"), zl.alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"), run_next(acc, x).alias("run"),
            F.greatest(acc["best"], run_next(acc, x)).alias("best")),
        lambda acc: acc["best"])

    bp = lambda num, den: (F.when(den > 0, F.floor(num * 10_000 / den))  # noqa: E731
                           .otherwise(F.lit(0))).cast("long")
    dup_line_bp = bp(n_dup_lines, n_lines)
    dup_line_char_bp = bp(dup_line_chars, line_chars)
    top_bigram_bp = bp(best_bg, n_bg)
    dup_fivegram_bp = bp(n_fg - F.size(F.array_distinct(fivegrams)).cast("long"), n_fg)
    keep = ((dup_line_bp <= max_dup_line_bp)
            & (dup_line_char_bp <= max_dup_line_char_bp)
            & (top_bigram_bp <= max_top_bigram_bp)
            & (dup_fivegram_bp <= max_dup_fivegram_bp))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        n_lines.alias("n_lines"),
        dup_line_bp.alias("dup_line_bp"),
        dup_line_char_bp.alias("dup_line_char_bp"),
        top_bigram_bp.alias("top_bigram_bp"),
        dup_fivegram_bp.alias("dup_fivegram_bp"),
        keep.alias("keep"),
    )


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """Corpus vocabulary head: top-k whitespace tokens by document
    frequency-weighted count. The shuffle moves (token, partial count)
    pairs only — the explode feeds a partial hash aggregate per task
    (map-side combine), so a 100-TB corpus shuffles vocabulary-sized
    data, not token-stream-sized. Deterministic order: count desc,
    token asc."""
    toks = (df.select(F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                        r"\s+")).alias("token"))
            .filter(F.col("token") != ""))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return (counts.orderBy(F.col("n").desc(), F.col("token").asc())
            .limit(k))


# mask runs that look like contact/identifier PII; word-boundary-free
# and lookaround-free so the same pattern runs on Spark and any oracle
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]"),
]


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-data PII scrub: email/phone/SSN-shaped spans become
    ``[PII]`` and the per-class hit counts are reported so the pipeline
    can audit redaction rates. Most-specific patterns run first (the
    phone pattern would otherwise swallow SSN spans); patterns apply
    in PII_PATTERNS order, each over the previous redaction's output. Map-only
    regexp_replace — no UDFs, no shuffle."""
    t = F.col(text_col)
    out_cols = [F.col(id_col)]
    redacted = t
    for name, pat in PII_PATTERNS:
        n = F.coalesce(F.size(F.regexp_extract_all(redacted, F.lit(pat), F.lit(0))), F.lit(0))
        out_cols.append(n.cast("long").alias(f"n_{name}"))
        redacted = F.regexp_replace(redacted, pat, "[PII]")
    out_cols.append(redacted.alias("text_redacted"))
    return df.select(*out_cols)


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    by: tuple[str, ...] = ("source",),
    shards: int = 1,
) -> DataFrame:
    """Sequence packing for training batches: concatenation chunking —
    docs are laid out in deterministic (by, shard, id) order and the
    token stream is cut every ``budget`` tokens; a doc's bin is the
    chunk holding its first token, ``bin_offset`` its position inside
    that chunk. One window (cumulative token sum) per (by, shard)
    group.

    Packing is inherently sequential, so parallelism comes from the
    grouping: ``by`` strata pack independently, and ``shards``
    sub-partitions each stratum deterministically (``id % shards``) —
    the 100-TB path is shards ~ cluster cores, trading global
    contiguity for per-shard contiguity (each shard still emits
    full-budget chunks; only the last chunk per shard runs short).
    Deterministic: same rows => same bins, any partitioning."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    n = token_count(F.col(text_col))
    shard = F.pmod(F.col(id_col), F.lit(shards)).cast("long")
    w = (Window.partitionBy(*[F.col(c) for c in by], shard)
         .orderBy(F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = F.sum(n).over(w) - n
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in by],
        shard.alias("shard"),
        n.alias("n_tokens"),
        F.floor(start / F.lit(budget)).cast("long").alias("bin_id"),
        (start - F.floor(start / F.lit(budget)) * budget).cast("long").alias("bin_offset"),
    )


def tfidf_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mean unigram TF-IDF per document — the corpus-statistics quality
    signal (rare-token-dense docs score high, boilerplate scores low).
    idf = ln(N / doc_freq); score = sum(tf * idf) / n_tokens.

    Two aggregates over exploded (doc, token) rows: per-(doc, token)
    term counts, then token doc-frequencies joined back — the join is
    vocabulary-sized on one side (AQE broadcasts it), the shuffles are
    all (token/doc, count) scalar rows. No UDFs."""
    toks = (df.select(F.col(id_col).alias("_id"),
                      F.explode(F.split(F.trim(F.lower(F.col(text_col))),
                                        r"\s+")).alias("token"))
            .filter(F.col("token") != ""))
    tf = toks.groupBy("_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    scored = (tf.join(docfreq, "token").crossJoin(n_docs)
              .groupBy("_id")
              .agg((F.sum(F.col("tf") * F.log(F.col("_n") / F.col("df")))
                    / F.sum("tf")).alias("score")))
    return df.select(F.col(id_col)).join(
        scored.select(F.col("_id").alias(id_col), "score"), id_col, "left") \
        .select(id_col, F.coalesce(F.round("score", 6), F.lit(0.0)).alias("tfidf_mean"))


def lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
) -> DataFrame:
    """CCNet-style language-model quality scoring with a corpus-trained
    bigram model: documents whose token transitions the corpus finds
    improbable (high perplexity) are low-quality/outlier candidates.

    Model: whitespace tokens (lowercased); P(w2|w1) = (c(w1,w2) + k) /
    (c(w1) + k*V) with add-k smoothing, c(w1) the CONTEXT count (number
    of bigrams starting w1) and V the corpus vocabulary size. Score:
    avg_nll = mean of -ln P over the doc's bigrams; perplexity =
    exp(avg_nll). Docs with fewer than 2 tokens keep their row with
    n_bigrams 0 and NULL scores.

    Scale shape: bigram extraction is map-only (one transform over the
    token array — no positional self-join); training is two hash
    aggregates (bigram and context counts, map-side combined, output
    linear in distinct bigrams); scoring is two shuffle joins of the
    doc-bigram stream against those tables plus a 1-row vocab
    cross-join — nothing corpus-sized is broadcast or collected."""
    t = F.lower(F.trim(F.col(text_col)))
    docs = df.select(F.col(id_col).alias("_id"),
                     F.when(F.length(t) == 0, F.array().cast("array<string>"))
                      .otherwise(F.split(t, r"\s+")).alias("_a"))
    # positions-first (see dedup.duplicate_spans): the exploded child
    # is the cheap int sequence and the two gets run once per bigram
    # after the explode. For THIS operator the effect is neutral (its
    # cost is the two scoring joins, ~33s at sf10 either way) — the
    # shape is kept for consistency with the gram extractors where the
    # inlined-array explode was measured 6-15x slower.
    big = (docs.filter(F.size("_a") >= 2)
           .select("_id", "_a",
                   F.explode(F.sequence(F.lit(0), F.size("_a") - 2))
                   .alias("_j"))
           .select("_id", F.get(F.col("_a"), F.col("_j")).alias("w1"),
                   F.get(F.col("_a"), F.col("_j") + 1).alias("w2")))
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_c2"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("_c1"))
    vocab = (docs.select(F.explode("_a").alias("_w"))
             .agg(F.countDistinct("_w").alias("_V")))
    nll = (big.join(c2, ["w1", "w2"]).join(c1, "w1").crossJoin(vocab)
           .select("_id", (-F.log((F.col("_c2") + add_k)
                                  / (F.col("_c1") + add_k * F.col("_V"))))
                   .alias("_nll")))
    agg = nll.groupBy("_id").agg(F.count(F.lit(1)).alias("n_bigrams"),
                                 F.avg("_nll").alias("_avg"))
    return (docs.select("_id").join(agg, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.round("_avg", 6).alias("avg_nll"),
                    F.round(F.exp("_avg"), 4).alias("perplexity")))


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level line/paragraph deduplication (the CCNet-style
    boilerplate pass): a line that appears in at least ``min_docs``
    DISTINCT documents is boilerplate (headers, footers, nav chrome,
    license blurbs) and is removed from every document. Returns
    (id, n_lines, n_kept, text_clean) with the surviving lines
    re-joined in their original order; fully-boilerplate documents
    come back with an empty string, not a dropped row.

    Scale shape: explode to (doc, pos, line) rows, one hash aggregate
    for line document-frequencies (map-side combined; the frequency
    table is distinct-line-sized, NOT corpus-sized), an anti-join
    against the boilerplate subset, and one regroup that re-assembles
    documents via sort_array(collect_list(struct(pos, line))) — two
    shuffles of scalar rows plus the regroup, no UDFs, no window over
    the whole corpus. Lines are compared exactly (trimmed); hash them
    first if line text is long relative to a 64-bit digest.
    """
    # F.split takes a REGEX but array_join rejoins LITERALLY — quote the
    # separator (\Q...\E) so e.g. sep='.' or '|' splits on the literal
    # character, not on every position
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\\Q" + sep + "\\E"))
        .alias("_pos", "_raw"),
    ).select("_id", "_pos", F.trim(F.col("_raw")).alias("_line"))
    boiler = (lines.groupBy("_line")
              .agg(F.countDistinct("_id").alias("_df"))
              .filter(F.col("_df") >= min_docs)
              .select("_line"))
    kept = lines.join(boiler, "_line", "left_anti")
    rebuilt = (kept.groupBy("_id")
               .agg(F.count(F.lit(1)).alias("n_kept"),
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("_pos", "_line"))),
                            lambda s: s["_line"]),
                        sep).alias("text_clean")))
    totals = lines.groupBy("_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (totals.join(rebuilt, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    "n_lines",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce("text_clean", F.lit("")).alias("text_clean")))


def dsir_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al.
    2023): per-document log importance weight ln(p_target(x)/p_raw(x))
    under hashed bag-of-ngram models — the standard way to up-sample
    raw web data toward a target domain without training a classifier.

    Features are whitespace unigrams + bigrams (lowercased), hashed to
    256 buckets by the first two hex chars of md5 — a string bucket
    key, so an external SQL oracle replays the hashing exactly.
    Bucket models are Laplace-smoothed: p(b) = (c(b) + alpha) /
    (total + alpha*256); a doc's log weight is the sum over its
    feature OCCURRENCES of ln(p_t(b)/p_r(b)). ``target`` is a boolean
    Column marking the in-domain rows (they contribute to the target
    counts AND get scored like everything else).

    Scale shape: feature extraction is map-only (one explode per doc);
    the two bucket models are hash aggregates over at most 256 rows
    each — they broadcast back to the per-occurrence stream, so the
    only data-sized shuffle is the final per-doc sum. Nothing is
    collected; the 256-row model join is a broadcast hash join.
    Returns (id, n_feats long, log_w double) with log_w NULL for
    feature-less docs."""
    t = F.lower(F.trim(F.col(text_col)))
    docs = df.select(F.col(id_col).alias("_id"),
                     target.alias("_t"),
                     F.when(F.length(t) == 0, F.array().cast("array<string>"))
                      .otherwise(F.split(t, r"\s+")).alias("_a"))
    # positions-first extraction (see dedup.duplicate_spans): the
    # bigram text assembles AFTER the explode, so GenerateExec's
    # re-evaluated child stays the cheap int sequence
    uni = docs.select("_id", "_t", F.explode("_a").alias("_g")) \
        .filter(F.col("_g") != "")
    bi = (docs.filter(F.size("_a") >= 2)
          .select("_id", "_t", "_a",
                  F.explode(F.sequence(F.lit(0), F.size("_a") - 2))
                  .alias("_j"))
          .select("_id", "_t", F.concat_ws(
              " ", F.get(F.col("_a"), F.col("_j")),
              F.get(F.col("_a"), F.col("_j") + 1)).alias("_g")))
    feats = (uni.unionByName(bi)
             .select("_id", "_t",
                     F.substring(F.md5("_g"), 1, 2).alias("_b")))
    # ONE aggregate builds both bucket models (conditional count for
    # the target side), and the totals derive from the 256-row frame —
    # the corpus feature stream is extracted exactly twice (model
    # build + scoring), not once per count as a naive formulation
    # would (integer sums, so the derived totals are bit-identical to
    # direct counts)
    counts = feats.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_rc"),
        F.count(F.when(F.col("_t"), F.lit(1))).alias("_tc"))
    totals = counts.agg(F.sum("_rc").alias("_rt"), F.sum("_tc").alias("_tt"))
    model = (counts.crossJoin(F.broadcast(totals))
             .select("_b", F.log(
                 ((F.col("_tc") + F.lit(alpha))
                  / (F.col("_tt") + F.lit(alpha * 256.0)))
                 / ((F.col("_rc") + F.lit(alpha))
                    / (F.col("_rt") + F.lit(alpha * 256.0)))).alias("_lr")))
    scored = (feats.join(F.broadcast(model), "_b")
              .groupBy("_id")
              .agg(F.count(F.lit(1)).alias("n_feats"),
                   F.sum("_lr").alias("_lw")))
    return (docs.select("_id").join(scored, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
                    F.round("_lw", 6).alias("log_w")))


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/RAG prep step
    (and the long-document split before embedding): each document
    becomes ceil-covering windows of ``chunk_tokens`` whitespace
    tokens advancing by ``chunk_tokens - overlap``; the final window
    is the first one whose end reaches the document's last token, so
    every token is covered and no window is pure overlap of the
    previous. Zero-token documents emit no chunks.

    Returns (id, chunk_id, start_token 1-based, n_tokens, chunk_text)
    with n_chunks = 1 + ceil(max(0, n - chunk_tokens) / stride).

    Scale shape: map-only — one split, one sequence/explode, one
    slice per row; no shuffle, no UDF, streaming-safe. Chunk count is
    linear in token count, so output size is input size times
    ~chunk/(chunk-overlap) — the only knob that matters at 100 TB is
    the overlap ratio."""
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}")
    stride = chunk_tokens - overlap
    t = F.lower(F.trim(F.col(text_col)))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>"))         .otherwise(F.split(t, r"\s+"))
    n = F.size(toks)
    n_chunks = (F.lit(1)
                + F.ceil(F.greatest(n - F.lit(chunk_tokens), F.lit(0))
                         / F.lit(stride)).cast("int"))
    base = df.select(F.col(id_col), toks.alias("_t"), n.alias("_n"),
                     n_chunks.alias("_nc"))
    ex = (base.filter(F.col("_n") > 0)
          .select(id_col, "_t", "_n",
                  F.explode(F.sequence(F.lit(0), F.col("_nc") - 1))
                  .alias("chunk_id")))
    start = (F.col("chunk_id") * F.lit(stride) + 1).cast("long")
    piece = F.slice(F.col("_t"), start.cast("int"), chunk_tokens)
    return ex.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.alias("start_token"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"))
