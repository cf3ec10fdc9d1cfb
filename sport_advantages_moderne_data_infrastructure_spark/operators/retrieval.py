"""BM25 lexical retrieval primitives (Robertson & Walker 1994), shared
by the batch index build (plans/textops.bm25_index), the registered
queries, and the streaming index maintenance (streaming/bm25.py).

Scale shape: the postings build is one tokenize scan + one (doc_id,
tok) rollup; df is a rollup of the postings (rows are already distinct
per (doc_id, tok), so df = COUNT per tok). Query-time candidates are
the union of the query terms' posting lists — the term and df sides
broadcast, so per-query cost is posting-list-bounded at any corpus
size. Cross-engine bit-parity rules (log-free rational idf,
sorted-fold sums) are documented at the registered queries
(plans/textops.py, §BM25).

Reference context: the reference has no text retrieval; this extends
the training-data/RAG north star (SURVEY §2 extensions) — dedup,
similarity search, and now first-stage hybrid retrieval share one
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def postings_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, tok, tf, dl) from a documents frame — whitespace
    tokenization (the corpus-wide convention, tfidf_top_terms), term
    frequency per (doc, term), document token length attached to every
    posting so scoring never re-joins a lengths table."""
    toks = (docs.select("doc_id",
                        F.explode(F.split(F.trim("text"), " +"))
                        .alias("tok"))
            .filter(F.col("tok") != ""))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return tf.join(dl, "doc_id")


def chunk_postings_frame(docs: DataFrame,
                         extra_keys: tuple = ()) -> DataFrame:
    """(doc_id, pos, tok, tf, dl) CHUNK-granular postings from a
    documents frame — the 10-word windows of dedup_chunks kept with
    their positions (the hybrid_chunk_search retrieval unit). Chunking
    is a pure JVM projection (split + posexplode of 10-word slices —
    zero shuffle, zero UDF); ``dl`` is the chunk's token length,
    attached to every posting row so chunk scoring never re-joins a
    lengths table (the postings_frame convention). Deterministic per
    doc row — a doc's postings regenerate bit-identically from its
    text, which is what lets the maintained form
    (streaming/chunkbm25.py) apply deletes by net row count.

    ``extra_keys``: additional per-input-row grouping columns carried
    through the rollups (the maintained form passes a synthetic row
    uid so TWO copies of the same doc in one change batch — insert +
    same-text update in a multi-commit window — yield two copies of
    its posting rows instead of one copy with doubled tf; the uid is
    dropped again after net-count bookkeeping)."""
    keys = ["doc_id", *extra_keys]
    w = F.split(F.trim("text"), " +")
    n_ch = F.greatest(F.ceil(F.size("ws") / F.lit(10)).cast("int"),
                      F.lit(1))
    chunks = (docs.select(*keys, w.alias("ws"))
              .select(*keys, F.posexplode(
                  F.transform(F.sequence(F.lit(0), n_ch - 1),
                              lambda i: F.slice("ws", i * 10 + 1, 10)))
                  .alias("pos", "cws")))
    ctf = (chunks.select(*keys, "pos",
                         F.explode("cws").alias("tok"))
           .filter(F.col("tok") != "")
           .groupBy(*keys, "pos", "tok")
           .agg(F.count(F.lit(1)).cast("bigint").alias("tf")))
    dl = (ctf.groupBy(*keys, "pos")
          .agg(F.sum("tf").cast("bigint").alias("dl")))
    return ctf.join(dl, [*keys, "pos"])


def df_frame(postings: DataFrame) -> DataFrame:
    """(tok, df): document frequency — postings rows are distinct per
    (doc_id, tok), so this is a plain COUNT rollup."""
    return postings.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))


def corpus_scalars(postings: DataFrame) -> tuple[int, float]:
    """(n_docs, avgdl) over docs with >= 1 token — one bounded job."""
    dl = postings.select("doc_id", "dl").distinct()
    n_docs, total = dl.agg(F.count(F.lit(1)), F.sum("dl")).first()
    return int(n_docs), int(total) / int(n_docs)


def query_terms_tfidf(postings: DataFrame, df: DataFrame, n_docs: int,
                      doc_pred, n_terms: int = 3) -> DataFrame:
    """(query_id, tok): each selected doc's top-``n_terms`` TF-IDF
    terms (tf * N/df, the tfidf_top_terms formula) — derived entirely
    from the index artifacts, never from raw text. ``doc_pred`` is a
    Column predicate over ``doc_id`` selecting the query docs."""
    from pyspark.sql import Window as W

    # broadcast the QUERY DOCS' postings (tiny — n_queries docs' terms)
    # against the vocab-sized df table, never the reverse: at corpus
    # scale the vocabulary does not fit in a broadcast, the query set
    # always does
    scored = (F.broadcast(postings.filter(doc_pred))
              .join(df, "tok")
              .select(F.col("doc_id").alias("query_id"), "tok",
                      (F.col("tf") * F.lit(n_docs)
                       / F.col("df").cast("double")).alias("s")))
    w = W.partitionBy("query_id").orderBy(F.desc("s"), F.asc("tok"))
    return (scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= n_terms).select("query_id", "tok"))


def bm25_topk(postings: DataFrame, df: DataFrame,
              query_terms: DataFrame, n_docs: int, avgdl: float,
              k: int = 10, log_idf: bool = False) -> DataFrame:
    """(query_id, doc_id, score, rank) for rank <= k. ``query_terms``
    is any (query_id, tok) frame — the public API takes arbitrary
    queries, the registered row instantiates it with TF-IDF-derived
    ones. Expression shapes mirror the DuckDB oracle token for token
    (plans/textops.py) so the contract stays a full hash.

    DEVIATION from textbook Okapi BM25 (default): the idf term is the
    RATIONAL core (N - df + 0.5)/(df + 0.5) WITHOUT the log — a
    monotone transform whose per-term magnitudes (and so multi-term
    rankings) differ from log-idf BM25. Chosen deliberately: ln()
    diverges cross-engine in the last ulp, and the log-free form keeps
    the registered row a bit-exact full-hash oracle (rank-k for
    single-term queries is unaffected). Scores are summed across query
    terms, so the transform CANNOT be applied after the fact — callers
    wanting literature-comparable multi-term scores pass
    ``log_idf=True``, which scores with the Lucene/Robertson form
    ln(1 + (N - df + 0.5)/(df + 0.5)) inside the sum (tolerance
    oracles only; the default keeps the bit-exact contract)."""
    from pyspark.sql import Window as W

    idf = ((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    if log_idf:
        idf = F.log(F.lit(1.0) + idf)
    # K1/B drive the expression; float identity (K1 + 1 == 2.2 etc.)
    # keeps the DuckDB oracle string (plans/textops.py) in bit-sync
    tf_part = (F.col("tf") * F.lit(K1 + 1)
               / (F.col("tf") + F.lit(K1) * (1 - B + B * F.col("dl")
                                             / F.lit(avgdl))))
    # attach df to the query-term side FIRST (broadcast the <= 30-row
    # term list against the vocab-sized df — never broadcast the
    # vocabulary), so the postings scan joins ONE tiny broadcast side
    qt_df = F.broadcast(query_terms).join(df, "tok")
    cand = (postings.join(F.broadcast(qt_df), "tok")
            .select("query_id", "doc_id", (idf * tf_part).alias("ts")))
    # ONE exchange for agg + window (guide §2.4): hash-clustering the
    # candidate stream by query_id alone satisfies both the (query_id,
    # doc_id) aggregation and the per-query top-k window, where the
    # default plan shuffled candidates by (query_id, doc_id) and then
    # re-shuffled the scored rows by query_id. collect_list has no
    # map-side reduction, so the bytes crossing the single exchange are
    # the same rows the first of the two exchanges carried.
    scored = (cand.repartition("query_id")
              .groupBy("query_id", "doc_id")
              .agg(F.aggregate(F.array_sort(F.collect_list("ts")),
                               F.lit(0.0), lambda a, x: a + x)
                   .alias("score")))
    w = W.partitionBy("query_id").orderBy(F.desc("score"),
                                          F.asc("doc_id"))
    return (scored.withColumn("rank",
                              F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k))
