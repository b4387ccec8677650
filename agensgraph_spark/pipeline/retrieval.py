"""Lexical retrieval and rank fusion — the keyword-search complement
to pipeline/similarity.py's vector search.

A training-data pipeline needs BOTH retrieval modes: embedding ANN for
semantic match (similarity.py) and BM25 for exact-term match (rare
entities, code identifiers, numbers — everything embeddings blur), plus
a fusion step for hybrid serving. Both operators here are pure
DataFrame compositions — tokenize/aggregate/join/window — so Catalyst
owns the physical plan; no UDFs anywhere.

Scale shape: BM25 is the inverted-index join. Corpus statistics (term
frequencies, document lengths, document frequencies) are hash
aggregates over the exploded token stream, map-side combined; the
query side is tiny by construction (a serving batch), so the
query-term frame broadcasts and ONLY postings whose token appears in
some query ever shuffle — cost is bounded by the matched posting
lists, not |corpus| x |queries|. Top-k per query is a row_number
window (WindowGroupLimit pushes the limit into the sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from agensgraph_spark.pipeline.util import maybe_broadcast


def _ws_tokens(text_col):
    """Lowercased whitespace tokens — the same tokenization every
    corpus-statistics operator in pipeline/text.py uses, so BM25
    document frequencies agree with tfidf_scores/vocab_topk."""
    t = F.lower(F.trim(text_col))
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Okapi BM25 top-k per query over a document corpus.

    score(q, d) = sum over DISTINCT query terms t of
        idf(t) * tf(t,d) * (k1+1) / (tf(t,d) + k1*(1 - b + b*dl/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) (the
    Robertson/Lucene form — strictly positive, so stop-token matches
    can never subtract). Query term multiplicity is ignored
    (documented simplification; repeated terms in a keyword query are
    noise, and the SQL oracle replays the same rule).

    Ranking is on the score ROUNDED to 6 decimals with doc id as the
    tie-break: BM25 sums float contributions whose order differs
    between engines, so ranking on the raw double would let a last-ulp
    difference reorder near-ties — rounding first makes the top-k
    deterministic and externally replayable. Returns
    (query_id, doc_id, score double, rank int), rank 1..k.

    Scale: three aggregates over the exploded corpus (term freq, doc
    length, doc freq) shuffle narrow (id, token, count) rows; the
    distinct-query-term frame is broadcast (size-conditional), so the
    scoring join touches only posting lists of queried terms. Nothing
    is collected; the corpus is tokenized exactly once."""
    toks = (docs.select(F.col(id_col).alias("_doc"),
                        F.explode(_ws_tokens(F.col(text_col))).alias("token")))
    tf = toks.groupBy("_doc", "token").agg(F.count(F.lit(1)).alias("_tf"))
    dl = toks.groupBy("_doc").agg(F.count(F.lit(1)).alias("_dl"))
    docfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    stats = (docs.agg(F.count(F.lit(1)).cast("double").alias("_n"))
             .crossJoin(dl.agg(F.avg("_dl").alias("_avgdl"))))
    qterms = (queries.select(F.col(query_id_col).alias("_q"),
                             F.explode(_ws_tokens(F.col(query_text_col)))
                             .alias("token"))
              .distinct())
    contrib = (tf.join(maybe_broadcast(qterms, est_row_bytes=48), "token")
               .join(docfreq, "token")
               .join(dl, "_doc")
               .crossJoin(F.broadcast(stats))
               .select(
                   "_q", "_doc",
                   (F.log(F.lit(1.0)
                          + (F.col("_n") - F.col("_df") + F.lit(0.5))
                          / (F.col("_df") + F.lit(0.5)))
                    * F.col("_tf") * F.lit(k1 + 1.0)
                    / (F.col("_tf")
                       + F.lit(k1) * (F.lit(1.0 - b)
                                      + F.lit(b) * F.col("_dl")
                                      / F.col("_avgdl")))).alias("_c")))
    scored = (contrib.groupBy("_q", "_doc")
              .agg(F.round(F.sum("_c"), 6).alias("score")))
    w = Window.partitionBy("_q").orderBy(F.col("score").desc(),
                                         F.col("_doc").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("_q").alias(query_id_col),
                    F.col("_doc").alias(id_col), "score",
                    F.col("rank").cast("long").alias("rank")))


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Reciprocal-rank fusion of per-query rankings from multiple
    retrieval systems (Cormack/Clarke/Buettcher): rrf(q, d) =
    sum over systems of 1 / (rrf_k + rank_s(q, d)), summed only over
    systems that ranked d at all. Each input frame carries
    (query_id, doc_id, rank); scores are NOT mixed — that is the point
    of RRF, it fuses incomparable score scales via ranks alone.

    Returns (query_id, doc_id, rrf_score double, rank int), top ``k``
    per query, ranked on the score rounded to 6 decimals with doc id
    tie-break (rank sums are tiny rationals; rounding keeps the
    ordering engine-replayable, same rule as bm25_topk).

    Scale: a union of already-k-bounded rank frames (|queries| x k x
    systems rows) — one narrow aggregate and one window; the corpora
    behind the rankings are never touched."""
    parts = [r.select(F.col(query_id_col).alias("_q"),
                      F.col(id_col).alias("_doc"),
                      F.col("rank").cast("long").alias("_r"))
             for r in rankings]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = (allr.groupBy("_q", "_doc")
             .agg(F.round(F.sum(F.lit(1.0) / (F.lit(float(rrf_k))
                                              + F.col("_r"))), 6)
                  .alias("rrf_score")))
    w = Window.partitionBy("_q").orderBy(F.col("rrf_score").desc(),
                                         F.col("_doc").asc())
    return (fused.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("_q").alias(query_id_col),
                    F.col("_doc").alias(id_col), "rrf_score",
                    F.col("rank").cast("long").alias("rank")))
