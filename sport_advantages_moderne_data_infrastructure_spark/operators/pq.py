"""Product quantization (PQ) for approximate similarity search.

The corpus compresses to m sub-space codes per vector (m bytes-ish vs
4*dim bytes of float32 — 8-32x), and query scoring becomes asymmetric
distance computation (ADC): ONE per-query lookup-table build (m*k*d
multiplies), then each corpus pair costs m table lookups instead of a
dim-length dot product — at 100 TB the exhaustive pass over codes moves
~32x fewer bytes and ~dim/m x fewer multiplies than the float32 rerank.
Jegou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011) — the compression half of the standard IVF-PQ layout; the
IVF half is operators/ivf.py and they compose.

Training mirrors the IVF convention (ivf.py:40): seeded k-means++ +
Lloyd's per sub-space over a deterministic bounded sample — the collect
stays 4096 rows at any corpus size; only encoding scales out, and it is
a pure projection (no shuffle, no UDF).

Reference context: the reference has no similarity search at all; this
extends the north-star ANN suite (SURVEY §2 extensions) beyond SQ8's
4x scalar quantization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def train_pq_codebooks(embeddings: DataFrame, m: int = 8, k: int = 16,
                       seed: int = 42, max_iter: int = 20,
                       sample: int = 4096) -> list[list[list[float]]]:
    """codebooks[j][c] = centroid c of sub-space j (length dim/m each).
    Deterministic: ordered sample, seeded k-means++ per sub-space."""
    import numpy as np

    rows = (embeddings.select("vec_id", "embedding")
            .orderBy("vec_id").limit(sample).collect())
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("train_pq_codebooks: embeddings table is empty")
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    out = []
    for j in range(m):
        S = X[:, j * d:(j + 1) * d]
        kk = min(k, len(S))
        rng = np.random.RandomState(seed + j)  # per-sub-space stream
        centers = [S[rng.randint(len(S))]]
        for _ in range(1, kk):
            d2 = ((S[:, None, :] - np.asarray(centers)[None, :, :]) ** 2) \
                .sum(-1).min(axis=1)
            tot = d2.sum()
            if tot <= 0:
                centers.append(S[rng.randint(len(S))])
                continue
            centers.append(S[rng.choice(len(S), p=d2 / tot)])
        C = np.asarray(centers)
        for _ in range(max_iter):
            lab = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
            newC = np.array([
                S[lab == c].mean(0) if np.any(lab == c) else C[c]
                for c in range(kk)])
            if np.allclose(newC, C):
                break
            C = newC
        out.append([[float(v) for v in c] for c in C])
    return out


def _arr(vals: list[float]) -> str:
    return "array(" + ",".join(f"{v!r}D" for v in vals) + ")"


def _cb_sql(codebooks: list[list[list[float]]]) -> str:
    """The full codebook as ONE nested array literal (m x k x d doubles
    — ~1k values at m=8,k=16,d=8: a few KB of plan, broadcast free)."""
    return ("array(" + ",".join(
        "array(" + ",".join(_arr(c) for c in cb) + ")"
        for cb in codebooks) + ")")


def pq_encode(embeddings: DataFrame,
              codebooks: list[list[list[float]]],
              keep: tuple[str, ...] = ()) -> DataFrame:
    """vec_id, code (array<int>, length m: per-sub-space argmin centroid),
    recon_norm (norm of the reconstructed vector — precomputed at encode
    time so query scoring never touches the codebooks for the corpus
    side). Pure projection over one corpus scan. ``keep``: extra input
    columns carried through unchanged (e.g. a precomputed centroid_id,
    so assign+encode compose as ONE map stage with no re-join on
    vec_id)."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    cb = _cb_sql(codebooks)
    # two-step so the k distances per sub-space evaluate ONCE: dists is
    # an m x k array, code takes the argmin of each row
    dists = (
        "transform(sequence(0, {mm}), j -> "
        "  transform(element_at({cb}, j + 1), c -> "
        "    aggregate(zip_with(slice(de, j * {d} + 1, {d}), c, "
        "      (x, y) -> (x - y) * (x - y)), 0D, (a, v) -> a + v)))"
    ).format(mm=m - 1, cb=cb, d=d)
    code = ("transform(dists, dj -> "
            "cast(array_position(dj, array_min(dj)) as int) - 1)")
    nsq = ("array(" + ",".join(
        _arr([sum(v * v for v in c) for c in cbj]) for cbj in codebooks)
        + ")")
    recon = ("sqrt(aggregate(zip_with(code, {nsq}, "
             "(cj, ns) -> element_at(ns, cj + 1)), 0D, (a, v) -> a + v))"
             ).format(nsq=nsq)
    return (embeddings
            .select("vec_id", *keep,
                    F.expr("transform(embedding, x -> cast(x as double))")
                    .alias("de"))
            .withColumn("dists", F.expr(dists))
            .withColumn("code", F.expr(code))
            .withColumn("recon_norm", F.expr(recon))
            .drop("de", "dists"))


def query_lut(codebooks: list[list[list[float]]],
              q_col: str = "qe") -> Column:
    """array<array<double>> — qlut[j][c] = dot(query sub-vector j,
    codebook[j][c]). Built ONCE per query row (m*k*d multiplies); pair
    scoring then never touches float vectors.

    Arrow-batched pandas UDF, deliberately NOT a SQL expression: the
    codebook-as-literal version compiled an m*k*d-double expression
    tree on the driver at EVERY query invocation (~0.7 s of the 1.8 s
    ann_ivfpq_topk headline at sf0.1 — measured in PLANS.md §IVF-PQ
    fixed vs marginal, r6). The UDF runs only on the QUERY side (tens
    to hundreds of rows, never the corpus), so the usual
    stay-JVM-on-the-hot-path rule cuts the other way here; ADC pair
    scoring over the corpus codes remains a pure JVM expression."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cb = np.asarray(codebooks, dtype=np.float64)  # (m, k, d)
    m, _, d = cb.shape

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf's hint inference rejects unresolvable names;
    # hint-less pandas_udf defaults to the scalar Series -> Series kind
    @pandas_udf("array<array<double>>")
    def _lut(qe):
        return pd.Series(
            [np.einsum("jd,jkd->jk",
                       np.asarray(q, dtype=np.float64).reshape(m, d),
                       cb).tolist()
             for q in qe])

    return _lut(q_col)


def pq_topk(codes: DataFrame, queries: DataFrame,
            codebooks: list[list[list[float]]], k: int = 10) -> DataFrame:
    """ADC top-k: queries carry their LUT; each (query, vector) pair
    costs m table lookups — `zip_with(code, qlut)` — and ranking is the
    same broadcast + per-partition window as the exact rerank.
    ``queries`` needs (query_id, qe: array<double>, q_norm)."""
    from pyspark.sql import Window as W

    q = queries.withColumn("qlut", query_lut(codebooks, "qe")).drop("qe")
    ip = F.expr("aggregate(zip_with(code, qlut, "
                "(cj, lut) -> element_at(lut, cj + 1)), 0D, "
                "(a, v) -> a + v)")
    scored = (codes.crossJoin(F.broadcast(q))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      (ip / (F.col("q_norm") * F.col("recon_norm")))
                      .alias("cos")))
    w = W.partitionBy("query_id").orderBy(F.desc("cos"),
                                          F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cos", 6).alias("score"), "rank")
            .orderBy("query_id", "rank"))


def build_ivfpq_index(embeddings: DataFrame,
                      ivf_centroids: list[list[float]],
                      codebooks: list[list[list[float]]],
                      path: str, meta_cols: tuple[str, ...] = ()) -> None:
    """IVF-PQ inverted lists: the PQ-encoded corpus written partitioned
    by IVF centroid_id — the standard billion-scale ANN layout (Jegou et
    al. 2011): probes prune to nprobe/k of the FILES, and what those
    files hold is 16x-compressed codes, so a query touches
    (nprobe/k) * (1/16) of the float32 corpus bytes.

    ``meta_cols`` (r11): filterable attribute columns carried INTO the
    inverted lists next to the codes — the production layout for
    metadata-filtered search ("top-k WHERE lang='en'"): the predicate
    then pushes to the parquet scan of the lists themselves (min/max +
    dictionary row-group pruning), no side join at query time."""
    from .ivf import assign_centroids

    coded = pq_encode(embeddings, codebooks, keep=meta_cols)
    assigned = assign_centroids(
        embeddings.select("vec_id", "embedding"), ivf_centroids)
    (coded.join(assigned.select("vec_id", "centroid_id"), "vec_id")
     .repartition("centroid_id")
     .write.mode("overwrite").partitionBy("centroid_id").parquet(path))


def _ivfpq_scored(codes_index: DataFrame, queries: DataFrame,
                  ivf_centroids: list[list[float]],
                  codebooks: list[list[list[float]]],
                  nprobe: int) -> DataFrame:
    """Shared ADC scoring leg: (query_id, neighbor_id, cos) over the
    nprobe probed inverted lists — the probe equi-join prunes the
    partitioned code table at the file level (broadcast query side →
    dynamic partition pruning), and each surviving pair costs m LUT
    lookups."""
    from .ivf import probe_centroids

    q_probes = (
        probe_centroids(
            queries.select(F.col("query_id").alias("vec_id"),
                           F.col("qe").alias("embedding"), "q_norm"),
            ivf_centroids, nprobe)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qe"), "q_norm", "centroid_id"))
    q_probes = q_probes.withColumn(
        "qlut", query_lut(codebooks, "qe")).drop("qe")
    ip = F.expr("aggregate(zip_with(code, qlut, "
                "(cj, lut) -> element_at(lut, cj + 1)), 0D, "
                "(a, v) -> a + v)")
    return (codes_index.join(F.broadcast(q_probes), "centroid_id")
            .select("query_id", F.col("vec_id").alias("neighbor_id"),
                    (ip / (F.col("q_norm") * F.col("recon_norm")))
                    .alias("cos")))


def ivfpq_topk(codes_index: DataFrame, queries: DataFrame,
               ivf_centroids: list[list[float]],
               codebooks: list[list[list[float]]],
               k: int = 10, nprobe: int = 6) -> DataFrame:
    """ADC top-k over the nprobe nearest inverted lists only.
    ``queries`` needs (query_id, qe: array<double>, q_norm)."""
    from pyspark.sql import Window as W

    scored = _ivfpq_scored(codes_index, queries, ivf_centroids,
                           codebooks, nprobe)
    w = W.partitionBy("query_id").orderBy(F.desc("cos"),
                                          F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cos", 6).alias("score"), "rank")
            .orderBy("query_id", "rank"))


def ivfpq_filtered_topk(codes_index: DataFrame, embeddings: DataFrame,
                        queries: DataFrame,
                        ivf_centroids: list[list[float]],
                        codebooks: list[list[list[float]]],
                        pred, k: int = 10, nprobe: int = 6,
                        shortlist: int = 50,
                        n_match: int | None = None,
                        brute_threshold: int | None = None) -> DataFrame:
    """Metadata-FILTERED IVF-PQ top-k (r11, VERDICT r10 #1): the
    predicate lands BEFORE scoring, never as a post-filter of an
    unfiltered top-k (retrieve-then-refill loses results whenever the
    unfiltered shortlist under-covers the filtered region — the exact
    failure FAISS's IDSelector pre-filter exists to avoid).

    Two regimes, the FAISS selector decision:
    - **selective** (few matching vectors): scoring the survivors
      exactly beats probing — ONE exact cosine pass over the
      ``pred``-filtered embeddings (pushed scan filter), identical to
      filtered brute truth, so recall is 1.0 by construction. Chosen
      when the match count is <= ``brute_threshold`` (default
      4 x ``shortlist``: below that the probe machinery saves nothing).
    - **broad**: ``codes_index.filter(pred)`` — the predicate pushes
      into the parquet scan of the inverted lists themselves (the
      ``meta_cols`` layout of :func:`build_ivfpq_index`), THEN the
      nprobe probe equi-join prunes files, ADC scores only surviving
      codes, and the exact refine fetches/reranks a per-query
      shortlist drawn from survivors only.

    ``n_match``: exact count of predicate-matching corpus rows; pass
    it when the caller holds it (a metadata stats table at 100 TB),
    else ONE column-pruned count over the filtered index runs.
    ``embeddings`` must carry the predicate's column(s) for the
    selective leg. ``queries`` needs (query_id, qe, q_norm)."""
    from pyspark.sql import Window as W

    if brute_threshold is None:
        brute_threshold = 4 * shortlist
    if n_match is None:
        n_match = codes_index.filter(pred).count()
    w = W.partitionBy("query_id").orderBy(F.desc("cos"),
                                          F.asc("neighbor_id"))
    if n_match <= brute_threshold:
        # selective regime: exact cosine over the filtered subset
        ne = F.expr("transform(embedding, x -> cast(x as double))")
        dot = F.expr("aggregate(zip_with(ne, qe, (x, y) -> x * y), 0D, "
                     "(a, v) -> a + v)")
        n_norm = F.sqrt(F.expr(
            "aggregate(zip_with(ne, ne, (x, y) -> x * y), 0D, "
            "(a, v) -> a + v)"))
        exact = (embeddings.filter(pred)
                 .select(F.col("vec_id").alias("neighbor_id"),
                         ne.alias("ne"))
                 .crossJoin(F.broadcast(
                     queries.select("query_id", "qe", "q_norm")))
                 .select("query_id", "neighbor_id",
                         (dot / (F.col("q_norm") * n_norm))
                         .alias("cos")))
        ranked = exact
    else:
        # broad regime: filter -> probe -> ADC -> exact refine, all
        # over survivors
        filtered = codes_index.filter(pred)
        scored = _ivfpq_scored(filtered, queries, ivf_centroids,
                               codebooks, nprobe)
        cand = (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= shortlist)
                .select("query_id", "neighbor_id"))
        cand_q = cand.join(
            queries.select("query_id", "qe", "q_norm"), "query_id")
        ne = F.expr("transform(embedding, x -> cast(x as double))")
        dot = F.expr("aggregate(zip_with(ne, qe, (x, y) -> x * y), 0D, "
                     "(a, v) -> a + v)")
        n_norm = F.sqrt(F.expr(
            "aggregate(zip_with(ne, ne, (x, y) -> x * y), 0D, "
            "(a, v) -> a + v)"))
        ranked = (embeddings
                  .select(F.col("vec_id").alias("neighbor_id"),
                          ne.alias("ne"))
                  .join(F.broadcast(cand_q), "neighbor_id")
                  .select("query_id", "neighbor_id",
                          (dot / (F.col("q_norm") * n_norm))
                          .alias("cos")))
    return (ranked.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cos", 6).alias("score"), "rank")
            .orderBy("query_id", "rank"))


def ivfpq_refined_topk(codes_index: DataFrame, embeddings: DataFrame,
                       queries: DataFrame,
                       ivf_centroids: list[list[float]],
                       codebooks: list[list[list[float]]],
                       k: int = 10, nprobe: int = 6,
                       shortlist: int = 50) -> DataFrame:
    """IVF-PQ with an exact refine stage (FAISS's IndexRefineFlat; the
    re-ranking step of Jegou et al. 2011 §V.A): ADC over the probed
    lists keeps a SHORTLIST of candidates per query (shortlist >> k),
    ONLY those candidates' raw float32 vectors are fetched and scored
    exactly, and the final top-k ranks by exact cosine. PQ quantization
    error then affects recall only through shortlist MEMBERSHIP, never
    through the final ranking — the standard way a deployment buys back
    most of the compressed index's recall loss for a fixed small cost.

    Scale shape: the shortlist is O(n_queries x shortlist) rows — tiny
    at any corpus size — so the exact leg broadcasts it against ONE
    column-pruned pass over the embeddings table (broadcast hash join:
    the corpus side never shuffles; with vec_id-clustered files the
    same join is a file-skipping point fetch). The expensive ADC leg is
    unchanged: file-pruned to nprobe lists, 16x-compressed bytes.
    ``queries`` needs (query_id, qe: array<double>, q_norm)."""
    from pyspark.sql import Window as W

    scored = _ivfpq_scored(codes_index, queries, ivf_centroids,
                           codebooks, nprobe)
    w = W.partitionBy("query_id").orderBy(F.desc("cos"),
                                          F.asc("neighbor_id"))
    cand = (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= shortlist)
            .select("query_id", "neighbor_id"))
    # exact leg: candidates (broadcast) x raw vectors (one pruned scan)
    cand_q = cand.join(
        queries.select("query_id", "qe", "q_norm"), "query_id")
    ne = F.expr("transform(embedding, x -> cast(x as double))")
    dot = F.expr("aggregate(zip_with(ne, qe, (x, y) -> x * y), 0D, "
                 "(a, v) -> a + v)")
    n_norm = F.sqrt(F.expr(
        "aggregate(zip_with(ne, ne, (x, y) -> x * y), 0D, "
        "(a, v) -> a + v)"))
    exact = (embeddings
             .select(F.col("vec_id").alias("neighbor_id"),
                     ne.alias("ne"))
             .join(F.broadcast(cand_q), "neighbor_id")
             .select("query_id", "neighbor_id",
                     (dot / (F.col("q_norm") * n_norm)).alias("cos")))
    return (exact.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cos", 6).alias("score"), "rank")
            .orderBy("query_id", "rank"))
