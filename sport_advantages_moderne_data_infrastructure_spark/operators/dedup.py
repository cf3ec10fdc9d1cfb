"""Near-duplicate detection suite for LLM-training corpora (north-star
extension, BASELINE.json): exact, character-shingle Jaccard, MinHash+LSH,
SimHash. No Python UDFs anywhere — shingling is explode(sequence),
"random" permutations are md5-keyed (cross-engine deterministic: md5 is
md5 in Spark and DuckDB, and both truncate the same 8 hex chars to the
same BIGINT).

Scale shapes (the reason each variant exists):
- exact:     groupBy(md5(text)) — one shuffle of (hash, id), never bodies.
- jaccard:   exact pairwise on shingle inverted index — quadratic in docs
             sharing a shingle; correct but only for candidate RERANK at
             100 TB.
- minhash+LSH: the scale path — k=16 signatures, 4 bands × 4 rows; the only
             shuffle joins band-buckets (equi-join), candidate set is
             |pairs sharing a band|, not |all pairs|.
- simhash:   constant-size fingerprint per doc; near-dup = hamming ≤ r on a
             16-bit fingerprint; self-join on fingerprint prefix buckets at
             scale (here: direct join, the corpus is small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dialect import DUCKDB, SPARK, Dialect

# 20-char shingles (~4 words): on shared-vocabulary corpora short char
# n-grams are near-universal (every doc shares most 8-grams with every
# other), which turns the shingle inverted-index join quadratic. 20 chars
# is selective — expected docs-per-shingle ≈ O(1) — while tail-edited
# near-dups still share >90% of their shingles.
SHINGLE_LEN = 20
N_MINHASH = 16
LSH_BANDS = 4  # × 4 rows per band
SIMHASH_BITS = 32
SIMHASH_MAX_HAMMING = 2


# --- shingling ------------------------------------------------------------

def shingles(corpus: DataFrame) -> DataFrame:
    """(doc_id, sh): distinct character 8-grams, stride 1 (positions
    explode JVM-side; no UDF)."""
    n_pos = F.greatest(F.length("text") - (SHINGLE_LEN - 1), F.lit(1))
    return (
        corpus.select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), n_pos)).alias("i"),
            "text")
        .select("doc_id",
                F.expr(f"substr(text, i, {SHINGLE_LEN})").alias("sh"))
        .distinct()
    )


def shingles_sql(corpus_cte: str) -> str:
    """DuckDB twin of :func:`shingles` over a corpus CTE name."""
    return (
        f"SELECT DISTINCT doc_id, substr(text, i, {SHINGLE_LEN}) AS sh "
        f"FROM (SELECT doc_id, text, unnest(range(1, "
        f"greatest(length(text) - {SHINGLE_LEN - 1}, 1) + 1)) AS i "
        f"FROM {corpus_cte}) t"
    )


# --- hashed shingles ------------------------------------------------------
# One md5 per distinct shingle; everything downstream (Jaccard join,
# MinHash permutations) works on the 8-byte hash — 2.5× less shuffle than
# 20-char strings and 16× less hashing than per-permutation md5. Both
# engines derive h identically, so md5-collision effects (≈0 at these
# cardinalities) cancel in the differential check.

_MH_P = 4294967311  # prime > 2^32 (h < 2^32, a < 2^30 → a·h+b < 2^63)
_MH_A = [((2654435761 * (j + 1)) % (1 << 30)) | 1 for j in range(N_MINHASH)]
_MH_B = [(40503 * (j + 7) ** 2) % _MH_P for j in range(N_MINHASH)]


def shingle_hashes(corpus: DataFrame) -> DataFrame:
    return (shingles(corpus)
            .select("doc_id", F.expr(SPARK.md5_bigint("sh")).alias("h"))
            .distinct())


def shingle_hashes_sql(corpus_cte: str) -> str:
    return (f"SELECT DISTINCT doc_id, {DUCKDB.md5_bigint('sh')} AS h "
            f"FROM ({shingles_sql(corpus_cte)}) s")


# --- n-gram Jaccard -------------------------------------------------------

def jaccard_pairs(corpus: DataFrame, threshold: float = 0.5) -> DataFrame:
    """All-pairs Jaccard over the hashed-shingle inverted index: candidate
    pairs come from the equi-join on shingle hash (docs sharing none never
    meet)."""
    sh = shingle_hashes(corpus).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.h") == F.col("b.h"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.join(na, "doc_a").join(nb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


def jaccard_pairs_sql(corpus_cte: str, threshold: float = 0.5) -> str:
    return (
        f"WITH sh AS ({shingle_hashes_sql(corpus_cte)}), "
        "sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "COUNT(*) AS c FROM sh a JOIN sh b ON a.h = b.h "
        "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT doc_a, doc_b, "
        "ROUND(CAST(c AS DOUBLE) / (na.n + nb.n - c), 4) AS jaccard "
        "FROM inter JOIN sizes na ON inter.doc_a = na.doc_id "
        "JOIN sizes nb ON inter.doc_b = nb.doc_id "
        f"WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= {threshold} "
        "ORDER BY doc_a, doc_b"
    )


# --- MinHash + LSH --------------------------------------------------------

def _perm_expr(j: int) -> str:
    """j-th universal-hash permutation of the base shingle hash — pure
    64-bit integer arithmetic, identical in Spark SQL and DuckDB (md5 runs
    once per shingle in shingle_hashes, not once per permutation)."""
    return f"MIN(({_MH_A[j]} * h + {_MH_B[j]}) % {_MH_P})"


def minhash_signatures(corpus: DataFrame) -> DataFrame:
    """k=16 minhash values per doc (signature ≈ Jaccard sketch)."""
    sh = shingle_hashes(corpus)
    return sh.groupBy("doc_id").agg(*[
        F.expr(_perm_expr(j)).alias(f"sig_{j}") for j in range(N_MINHASH)
    ])


def minhash_signatures_sql(corpus_cte: str) -> str:
    exprs = ", ".join(
        f"{_perm_expr(j)} AS sig_{j}" for j in range(N_MINHASH))
    return (f"WITH sh AS ({shingle_hashes_sql(corpus_cte)}) "
            f"SELECT doc_id, {exprs} FROM sh GROUP BY doc_id")


def _band_key_cols(prefix: str = "sig_"):
    rows = N_MINHASH // LSH_BANDS
    return [
        [f"{prefix}{b * rows + r}" for r in range(rows)]
        for b in range(LSH_BANDS)
    ]


def lsh_candidate_pairs(corpus: DataFrame) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of ≥1 band become candidates.
    The join is equi on (band, key) — the scalable skeleton; at 100 TB the
    band table is the only shuffled artifact (doc_id + 16 longs)."""
    sigs = minhash_signatures(corpus)
    # one pass: explode each signature row into its 4 (band, key) rows
    # (a 4-way union would recompute the shingle+minhash pipeline per
    # branch and again per self-join side — 8× the work), then cache the
    # tiny band table for the self-join.
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
            .alias("key"))
        for b, cols in enumerate(_band_key_cols())
    ])
    bands = (
        sigs.select("doc_id", F.explode(band_structs).alias("bk"))
        .select("doc_id", F.col("bk.band").alias("band"),
                F.col("bk.key").alias("key"))
        .cache()
    )
    a = bands.alias("a")
    b_ = bands.alias("b")
    return (
        a.join(b_, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def lsh_candidate_pairs_sql(corpus_cte: str) -> str:
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, concat_ws('|', "
        + ", ".join(f"CAST({c} AS STRING)" for c in cols)
        + ") AS key FROM sigs"
        for b, cols in enumerate(_band_key_cols()))
    return (
        f"WITH sigs AS ({minhash_signatures_sql(corpus_cte)}), "
        f"bands AS ({band_selects}) "
        "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key "
        "AND a.doc_id < b.doc_id ORDER BY doc_a, doc_b"
    )


# --- SimHash --------------------------------------------------------------

def simhash(corpus: DataFrame) -> DataFrame:
    """32-bit frequency-weighted SimHash: per-token md5 hash computed ONCE,
    token weight = occurrence count (distinct-token simhash collapses when
    all docs share a vocabulary — weighting by frequency is what separates
    same-vocab documents)."""
    toks = (
        corpus.select("doc_id",
                      F.explode(F.split(F.trim("text"), " +")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("w"))
        .select("doc_id", "w",
                F.expr(SPARK.md5_bigint("tok")).alias("h"))
    )
    sums = toks.groupBy("doc_id").agg(*[
        F.sum(F.expr(f"CASE WHEN (h >> {b}) & 1 = 1 THEN w ELSE -w END"))
        .alias(f"s_{b}")
        for b in range(SIMHASH_BITS)
    ])
    fp = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s_{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.cast("bigint").alias("simhash"))


def simhash_sql(corpus_cte: str) -> str:
    d = DUCKDB
    sums = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN w ELSE -w END) AS s_{b}"
        for b in range(SIMHASH_BITS))
    fp = " + ".join(
        f"CASE WHEN s_{b} >= 0 THEN {1 << b} ELSE 0 END"
        for b in range(SIMHASH_BITS))
    return (
        f"WITH rawtoks AS (SELECT doc_id, "
        f"unnest(regexp_split_to_array(trim(text), ' +')) AS tok "
        f"FROM {corpus_cte}), "
        f"toks AS (SELECT doc_id, {d.md5_bigint('tok')} AS h, "
        f"COUNT(*) AS w FROM rawtoks WHERE tok <> '' GROUP BY doc_id, tok), "
        f"sums AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id) "
        f"SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums"
    )


def simhash_near_dup(corpus: DataFrame,
                     max_hamming: int = SIMHASH_MAX_HAMMING) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance."""
    s = simhash(corpus)
    a, b = s.alias("a"), s.alias("b")
    ham = F.expr("bit_count(a.simhash ^ b.simhash)")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(ham <= max_hamming)
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                ham.cast("int").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )


def jaccard_for_pairs(corpus: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for a GIVEN candidate pair list (doc_a, doc_b) — the
    verify stage after LSH: per-pair set intersection via two hash-joins
    against the shingle index; all-pairs never materializes."""
    sh = shingle_hashes(corpus).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("h").alias("ha"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("h").alias("hb"))
    inter = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .filter(F.col("ha") == F.col("hb"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (inter.join(na, "doc_a").join(nb, "doc_b")
            .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard")))


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_iter: int = 20) -> DataFrame:
    """Min-label propagation over an undirected edge list → (doc_id,
    cluster_id) where cluster_id = smallest doc_id in the component.

    The dedup endgame: near-dup PAIRS become KEEP-LISTS (canonical doc per
    cluster). Driver-controlled loop of joins, converging in
    graph-diameter iterations; per-iteration localCheckpoint truncates
    lineage (without it the plan doubles every round). At 100 TB use the
    same loop with checkpointing to storage, or the large-star/small-star
    variant — the join pattern is identical.

    nodes: (doc_id), edges: (doc_a, doc_b).
    """
    sym = edges.select(F.col("doc_a").alias("src"),
                       F.col("doc_b").alias("dst")).unionAll(
        edges.select(F.col("doc_b").alias("src"),
                     F.col("doc_a").alias("dst")))
    sym = sym.localCheckpoint()
    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster_id")) \
        .localCheckpoint()
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy("src").agg(F.min("cluster_id").alias("n_min"))
        )
        new_labels = (
            labels.join(neigh, labels.doc_id == neigh.src, "left")
            .select(labels.doc_id,
                    F.least(labels.cluster_id,
                            F.coalesce(F.col("n_min"), labels.cluster_id))
                    .alias("cluster_id"))
            .localCheckpoint()
        )
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "doc_id")
                   .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                   .count())
        labels = new_labels
        if changed == 0:
            break
    return labels


def connected_components_sql(corpus_cte: str, edges_sql: str) -> str:
    """DuckDB twin: transitive closure via recursive CTE, label = min
    reachable doc_id (exact for the small oracle-side graphs)."""
    return (
        "WITH RECURSIVE "
        f"e AS ({edges_sql}), "
        "sym AS (SELECT doc_a AS src, doc_b AS dst FROM e "
        "UNION ALL SELECT doc_b, doc_a FROM e), "
        "reach(src, dst) AS ("
        " SELECT src, dst FROM sym "
        " UNION "
        " SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src), "
        f"nodes AS (SELECT DISTINCT doc_id FROM {corpus_cte}), "
        "labels AS (SELECT n.doc_id, "
        " LEAST(n.doc_id, COALESCE(MIN(r.dst), n.doc_id)) AS cluster_id "
        " FROM nodes n LEFT JOIN reach r ON r.src = n.doc_id "
        " GROUP BY n.doc_id) "
        "SELECT doc_id, cluster_id, doc_id = cluster_id AS is_canonical "
        "FROM labels ORDER BY doc_id"
    )


def simhash_near_dup_sql(corpus_cte: str,
                         max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    return (
        f"WITH s AS ({simhash_sql(corpus_cte)}) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming "
        "FROM s a JOIN s b ON a.doc_id < b.doc_id "
        f"WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming} "
        "ORDER BY doc_a, doc_b"
    )
