"""Bounded-memory sketches with EXACT recovery passes: Misra-Gries
heavy hitters (Misra & Gries 1982, the FREQUENT algorithm) with an
exact second pass, and exact order statistics (flat and grouped)
via sketch-guided bracketing — in every case the sketch only
PROPOSES; exact counts decide, so outputs carry full hash oracles.

Why a sketch when groupBy-count is exact? The shuffle. At 100 TB a
groupBy over a high-cardinality key shuffles the whole key column;
heavy-hitter recovery needs none of it:

- pass 1 (shuffle-free): every partition runs Misra-Gries with
  ceil(1/phi) counters over its slice — an Arrow-batched
  ``mapInPandas`` whose state is a bounded dict (batch-level MG: exact
  per-batch counts merge into the counters, then the (k+1)-th largest
  value is subtracted from all — the classic batched form, undercount
  still <= n_p/(k+1)). Each task emits <= k candidate rows.
  Guarantee: if an item's GLOBAL count c > n/k then in SOME partition
  c_p > n_p/k (else summing the per-partition inequalities gives
  c <= n/k), and MG retains every item with c_p > n_p/(k+1) — so the
  candidate union is a SUPERSET of the true phi-heavy hitters.
- pass 2 (bounded shuffle): one aggregation grouped by
  candidate-or-NULL — rows outside the candidate set collapse into
  the NULL group, so map-side combine reduces the exchange to
  <= (k+1) rows per task; the grand total n is the SUM over all
  groups of the same aggregate (no separate count scan).

The result is DETERMINISTIC AND EXACT — the sketch only proposes
candidates, the second pass counts them exactly and applies the
c > phi*n cut — which is why the registered row carries a FULL hash
oracle (plain GROUP BY ... HAVING in DuckDB), not a tolerance
contract.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spread(vals: DataFrame) -> DataFrame:
    """Round-robin the bracketing engines' projected slice across the
    session's parallelism iff the scan gives fewer partitions. The
    iterative engines re-read this frame every round (sketch, verify,
    ranked read — all grouped aggs with map-side partial aggregation,
    so ANY partitioning works); a narrow input (one small parquet
    split, an AQE-coalesced upstream) would otherwise run every round
    single-threaded against the persisted one-partition frame. A
    well-partitioned production input passes through untouched — no
    shuffle added."""
    n = vals.sparkSession.sparkContext.defaultParallelism
    if vals.rdd.getNumPartitions() < n:
        vals = vals.repartition(n)
    return vals


def mg_partial(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries counters (<= k rows per task) WITH
    their residual weights — the mergeable form (Agarwal et al. 2012,
    "Mergeable Summaries": MG summaries with k counters merge with
    cumulative undercount <= n/(k+1)). Arrow-batched; state is a
    <= 2k-entry dict regardless of partition size. Returns
    (col, weight) where 0 < weight <= true per-partition count.

    NULL contract (shared by the flat AND grouped paths): NULL values
    are never proposed and can never be returned as heavy hitters —
    pass 2 uses the NULL candidate tag as its "other rows" group, so a
    NULL hitter is unrepresentable there — but NULL rows DO count
    toward the denominator n (they collapse into that other-group and
    its count sums into the grand total). Dropping NULLs from the
    sketch only LOOSENS the per-partition cut, so the candidate
    superset guarantee for non-null values is preserved."""
    field = df.schema[col]
    spark_type = field.dataType.simpleString()

    def _mg(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            # batch-level MG: exact batch counts merge into the
            # sketch, then one truncation back to k counters
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - cut for v, c in counters.items()
                            if c - cut > 0}
        yield pd.DataFrame({col: list(counters.keys()),
                            "weight": list(counters.values())})

    return df.select(col).mapInPandas(
        _mg, schema=f"{col} {spark_type}, weight long")


def mg_merge(parts: DataFrame, col: str, k: int) -> DataFrame:
    """s-way MG merge: pointwise-sum the counters, then ONE truncation
    by the (k+1)-th largest summed weight (drop non-positive). Valid
    per the mergeability theorem — each unit of cut consumes >= k+1
    units of total mass, so cumulative undercount stays <= n/(k+1)
    across any merge tree; MG never overcounts, so
    true - n/(k+1) <= weight <= true for every surviving counter.
    The sort/cut window runs over the AGGREGATED sketch-sized frame
    (<= n_tasks*k rows), never the data."""
    from pyspark.sql import Window as W

    agg = parts.groupBy(col).agg(F.sum("weight").alias("weight"))
    wr = W.partitionBy().orderBy(F.desc("weight"), F.asc(col))
    ranked = agg.withColumn("__rn", F.row_number().over(wr))
    cut = F.max(F.when(F.col("__rn") == k + 1, F.col("weight"))
                .otherwise(F.lit(0))).over(W.partitionBy())
    return (ranked.withColumn("__cut", cut)
            .filter(F.col("weight") > F.col("__cut"))
            .select(col, (F.col("weight") - F.col("__cut"))
                    .cast("long").alias("weight")))


def mg_sketch(df: DataFrame, col: str, k: int) -> DataFrame:
    """Global Misra-Gries sketch of ``col``: <= k (value, weight) rows,
    shuffle-free over the data (per-partition sketches, one bounded
    merge). Any value with global count > n/(k+1) survives with a
    positive weight — the candidate-superset guarantee heavy-hitter
    recovery rests on."""
    return mg_merge(mg_partial(df, col, k), col, k)


def grouped_mg_candidates(df: DataFrame, group_col: str, col: str,
                          k: int) -> DataFrame:
    """Per-partition, PER-GROUP Misra-Gries candidates: one k-counter
    sketch per (task, group) — state is n_groups_in_task × k entries,
    the grouped generalization of :func:`mg_candidates` for frames
    whose group column is LOW-cardinality (event types, languages,
    sources — the frequent-items-per-category question). The averaging
    argument applies WITHIN each group: c_g(x) > n_g/k in some
    partition's group-slice, so the per-group candidate union is a
    superset of each group's phi-heavy items."""
    gt = df.schema[group_col].dataType.simpleString()
    vt = df.schema[col].dataType.simpleString()

    def _mg(batches):
        import pandas as pd

        sketches: dict = {}
        for pdf in batches:
            for (g, v), c in (pdf.groupby([group_col, col],
                                          dropna=False).size().items()):
                # dropna=False keeps NULL GROUPS (real groups); NULL
                # VALUES are skipped per mg_partial's NULL contract —
                # unrepresentable in pass 2's output either way
                if pd.isna(v):
                    continue
                counters = sketches.setdefault(g, {})
                counters[v] = counters.get(v, 0) + int(c)
                if len(counters) > k:
                    cut = sorted(counters.values(), reverse=True)[k]
                    sketches[g] = {x: n - cut for x, n in counters.items()
                                   if n - cut > 0}
        yield pd.DataFrame(
            {group_col: [g for g, cs in sketches.items() for _ in cs],
             col: [v for cs in sketches.values() for v in cs]})

    return (df.select(group_col, col)
            .mapInPandas(_mg, schema=f"{group_col} {gt}, {col} {vt}")
            .distinct())


def grouped_mg_partial(df: DataFrame, group_col: str, col: str,
                       k: int) -> DataFrame:
    """Per-partition, per-group MG counters WITH residual weights —
    the mergeable form of :func:`grouped_mg_candidates`, feeding the
    streaming grouped sketch the way :func:`mg_partial` feeds the flat
    one. Returns (group_col, col, weight); NULL groups are real
    groups, NULL values skipped per the module NULL contract."""
    gt = df.schema[group_col].dataType.simpleString()
    vt = df.schema[col].dataType.simpleString()

    def _mg(batches):
        import pandas as pd

        sketches: dict = {}
        for pdf in batches:
            for (g, v), c in (pdf.groupby([group_col, col],
                                          dropna=False).size().items()):
                if pd.isna(v):
                    continue
                counters = sketches.setdefault(g, {})
                counters[v] = counters.get(v, 0) + int(c)
                if len(counters) > k:
                    cut = sorted(counters.values(), reverse=True)[k]
                    sketches[g] = {x: n - cut
                                   for x, n in counters.items()
                                   if n - cut > 0}
        yield pd.DataFrame(
            {group_col: [g for g, cs in sketches.items() for _ in cs],
             col: [v for cs in sketches.values() for v in cs],
             "weight": [w for cs in sketches.values()
                        for w in cs.values()]})

    return (df.select(group_col, col)
            .mapInPandas(_mg, schema=f"{group_col} {gt}, {col} {vt}, "
                                     "weight long"))


def grouped_mg_merge(parts: DataFrame, group_col: str, col: str,
                     k: int) -> DataFrame:
    """Per-group s-way MG merge: pointwise-sum within each group, then
    ONE per-group truncation by the (k+1)-th largest summed weight —
    :func:`mg_merge` with every window keyed by the group. The
    sort/cut runs over the aggregated sketch-sized frame only."""
    from pyspark.sql import Window as W

    agg = (parts.groupBy(group_col, col)
           .agg(F.sum("weight").alias("weight")))
    wr = W.partitionBy(group_col).orderBy(F.desc("weight"), F.asc(col))
    ranked = agg.withColumn("__rn", F.row_number().over(wr))
    cut = F.max(F.when(F.col("__rn") == k + 1, F.col("weight"))
                .otherwise(F.lit(0))).over(W.partitionBy(group_col))
    return (ranked.withColumn("__cut", cut)
            .filter(F.col("weight") > F.col("__cut"))
            .select(group_col, col, (F.col("weight") - F.col("__cut"))
                    .cast("long").alias("weight")))


def grouped_exact_pass(df: DataFrame, cand: DataFrame, group_col: str,
                       col: str, phi: float) -> DataFrame:
    """Pass 2 of grouped heavy-hitter recovery, given an
    externally-proposed (group, value) candidate frame (e.g. a
    stream-maintained grouped MG sketch's keys): one
    map-side-combined aggregation over (group, candidate-or-NULL)
    counts exactly, each group's total summed from its own <= k+1
    aggregated rows. Returns (group_col, col, cnt, share)."""
    from pyspark.sql import Window as W

    tagged = (df.select(group_col, col)
              .join(F.broadcast(cand.select(
                  F.col(group_col).alias("__g"),
                  F.col(col).alias("__cand"))),
                  F.col(group_col).eqNullSafe(F.col("__g"))
                  & F.col(col).eqNullSafe(F.col("__cand")), "left")
              .select(group_col, "__cand"))
    counts = tagged.groupBy(group_col, "__cand").agg(
        F.count(F.lit(1)).alias("cnt"))
    n_group = F.sum("cnt").over(W.partitionBy(group_col))
    return (counts.withColumn("__n", n_group)
            .filter(F.col("__cand").isNotNull()
                    & (F.col("cnt") > phi * F.col("__n")))
            .select(group_col, F.col("__cand").alias(col),
                    F.col("cnt").cast("long").alias("cnt"),
                    F.round(F.col("cnt") / F.col("__n"), 6)
                    .alias("share")))


def grouped_heavy_hitters_exact(df: DataFrame, group_col: str,
                                col: str, phi: float) -> DataFrame:
    """All (group, value) with value frequency > phi * n_group, EXACT —
    the two-pass discipline of :func:`heavy_hitters_exact` per group:
    sketch proposes, one map-side-combined aggregation over
    (group, candidate-or-NULL) counts exactly, and each group's total
    is the sum over its own <= k+1 aggregated rows (no separate
    per-group count scan). Returns (group_col, col, cnt, share)."""
    k = math.ceil(1.0 / phi)
    cand = grouped_mg_candidates(df, group_col, col, k)
    return grouped_exact_pass(df, cand, group_col, col, phi)


class _QState:
    """Per-quantile bracketing state shared by the batched engines.
    Invariant after every update: ``below < k <= upto`` where
    ``below`` = exact count strictly below ``lo`` and ``upto`` = exact
    count at-or-below ``hi`` (``lo is None`` = open domain, below=0,
    upto=n)."""

    __slots__ = ("q", "k", "lo", "hi", "below", "upto", "val")

    def __init__(self, q: float, n: int):
        self.q, self.k = q, max(1, math.ceil(q * n))
        self.lo = self.hi = None
        self.below, self.upto = 0, n
        self.val: float | None = None

    def width(self) -> int:
        return self.upto - self.below

    def band(self, accuracy: int) -> tuple[float, float]:
        """The sketch percentage band for the target rank WITHIN the
        current bracket slice (2/accuracy guard each side)."""
        q_in = (self.k - self.below) / self.width()
        eps = 1.0 / accuracy
        return max(0.0, q_in - 2 * eps), min(1.0, q_in + 2 * eps)

    def apply_verified(self, nlo: float, nhi: float,
                       below_nlo: int, upto_nhi: int) -> None:
        """Adopt the proposed bracket per side ONLY where the exact
        counts prove rank k stays inside (widen-on-wobble); detect the
        one-value-owns-the-bracket short circuit."""
        if below_nlo < self.k:
            self.lo, self.below = nlo, below_nlo
        if upto_nhi >= self.k:
            self.hi, self.upto = nhi, upto_nhi
        if self.lo is not None and self.lo == self.hi:
            # one value owns the bracket: it IS the k-th smallest
            # (below < k <= upto holds by the two guards above)
            self.val = self.lo

    def resolve_stall(self, c_le_lo: int, c_lt_hi: int) -> None:
        """Exact edge-mass resolution (r11): duplicate masses sitting at
        BOTH bracket edges can pin the sketch's proposals to the current
        bracket forever — e.g. k=1 over [-39, 0] where a 17-row mass of
        zeros owns the hi edge: every percentile in the band maps back
        to an edge value, so no round shrinks anything (found by the
        hypothesis suite). Given the exact counts c_le_lo = #(col <=
        lo) and c_lt_hi = #(col < hi), rank k lands in exactly one of
        three places: lo's mass (below < k <= c_le_lo -> val = lo),
        hi's mass (c_lt_hi < k <= upto -> val = hi), or strictly
        between — then the bracket advances to the OPEN interval via
        the next representable doubles, with the exact counts as the
        new below/upto. Progress is strict (below grows by lo's mass,
        upto shrinks by hi's), so stalls resolve in at most
        #distinct-values rounds."""
        if self.k <= c_le_lo:
            self.val = self.lo
        elif self.k > c_lt_hi:
            self.val = self.hi
        else:
            self.lo = math.nextafter(float(self.lo), math.inf)
            self.below = c_le_lo
            self.hi = math.nextafter(float(self.hi), -math.inf)
            self.upto = c_lt_hi
            if self.lo == self.hi:
                self.val = self.lo


def _read_ready_brackets(vals: DataFrame, col: str,
                         ready: list[tuple[int, "_QState"]]) -> dict:
    """ONE window job reading EVERY TakeOrdered-small bracket's target
    order statistic: rows are tagged with the bracket ids they fall in
    (a row can serve several quantiles), ranked per bracket, and the
    per-bracket rank k_in = k - below row is kept. Partition sizes are
    bracket sizes (<= the direct threshold) — bounded, never the
    corpus. Returns {state_index: value}."""
    from pyspark.sql import Window as W

    conds = [F.when(
        F.lit(True) if s.lo is None
        else (F.col(col) >= F.lit(s.lo)) & (F.col(col) <= F.lit(s.hi)),
        F.lit(i)) for i, s in ready]
    kmap = F.create_map(*[x for i, s in ready
                          for x in (F.lit(i), F.lit(s.k - s.below))])
    w = W.partitionBy("__qi").orderBy(F.col(col).asc())
    hits = (vals.select(col, F.explode(F.array(*conds)).alias("__qi"))
            .filter(F.col("__qi").isNotNull())
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == F.element_at(kmap, F.col("__qi")))
            .select("__qi", col).collect())
    return {r["__qi"]: float(r[col]) for r in hits}


def exact_quantiles(df: DataFrame, col: str, qs: list[float],
                    accuracy: int = 10_000, max_rounds: int = 4,
                    direct_limit: int = 100_000,
                    ) -> list[tuple[float, float]]:
    """EXACT order statistics at scale via sketch-guided bracketing —
    the quantile analog of the heavy-hitter two-pass: a mergeable rank
    sketch (Spark's ``approx_percentile``, Greenwald-Khanna style)
    PROPOSES a value bracket guaranteed to contain the k-th smallest
    (k = ceil(q*n), the DuckDB ``ORDER BY .. OFFSET k-1`` definition);
    exact conditional counts then locate k WITHIN the bracket, and the
    answer is read with one bounded ranked read over bracket rows only.

    BATCHED ACROSS QUANTILES (r9): every round runs a CONSTANT number
    of jobs regardless of ``len(qs)`` — one multi-bracket re-sketch
    (every open bracket's ``approx_percentile`` band as a FILTERed
    aggregate in a single ``agg``), one conditional-aggregation verify
    pass (every bracket's strictly-below / at-or-below counts in the
    same ``agg``), and one shared window job reading every
    TakeOrdered-small bracket (tests/test_sketches.py pins the job
    count for a 9-quantile sweep to the 1-quantile count). Bracket
    floor counts are REUSED from the previous round's verify pass, so
    there is no separate per-bracket count scan at all.

    Rank math, not trust: the sketch's rank error is <= n/accuracy per
    endpoint, so the bracket holds ~2n/accuracy rows; each round the
    bracket is re-sketched, multiplying accuracy — rounds needed =
    ceil(log_accuracy(n / collectable)), 2 at 10^12 rows with the
    default accuracy. The sketch is only advisory: every round VERIFIES
    by exact count that the bracket still contains rank k (and widens
    to the verified side if a sketch merge-order wobble ever drops it),
    so the OUTPUT is deterministic and exact regardless of sketch
    nondeterminism. Duplicates are absorbed by counting strictly-below
    vs at-or-below; a value owning the whole bracket short-circuits.

    NULL semantics: NULL values are EXCLUDED — n counts non-null rows
    only, matching the DuckDB ``WHERE col IS NOT NULL ORDER BY col
    OFFSET k-1`` oracle definition (every bracket predicate and the
    sketch already ignore NULLs; pre-r9 the denominator didn't, so a
    NULL-bearing column could chase a rank past the last non-null row).

    Returns [(q, value)] in input order — a driver-side list (one
    scalar per requested quantile, like any aggregate)."""
    vals = df.select(col).filter(F.col(col).isNotNull())
    n = vals.count()
    if n == 0:
        raise ValueError(f"exact_quantiles: no non-null rows in {col}")
    st = [_QState(q, n) for q in qs]
    _bracket_states(vals, col, st, accuracy, max_rounds, direct_limit)
    return [(s.q, s.val) for s in st]


def exact_ranks(df: DataFrame, col: str, ks: list[int],
                n: int | None = None, accuracy: int = 10_000,
                max_rounds: int = 4,
                direct_limit: int = 100_000) -> list[float]:
    """EXACT k-th smallest values for explicit ranks ``ks`` (1-based)
    over the non-null rows of ``col`` — the rank-addressed form of
    :func:`exact_quantiles`, same bracketing engine (sketch proposes,
    exact counts verify, one shared bounded ranked read per round; no
    task ever sorts more than ``max(2*accuracy, direct_limit)`` rows).
    Pass ``n`` (the exact non-null row count) when the caller already
    holds it — e.g. a maintained exact histogram — to skip the count
    job. Returns values positionally matching ``ks``."""
    vals = df.select(col).filter(F.col(col).isNotNull())
    if n is None:
        n = vals.count()
    if n == 0:
        raise ValueError(f"exact_ranks: no non-null rows in {col}")
    st = []
    for k in ks:
        if not 1 <= k <= n:
            raise ValueError(f"rank {k} outside [1, {n}]")
        s = _QState(k / n, n)
        s.k = k  # exact rank, not a ceil(q*n) re-derivation
        st.append(s)
    _bracket_states(vals, col, st, accuracy, max_rounds, direct_limit)
    return [s.val for s in st]


def _bracket_states(vals: DataFrame, col: str, st: list["_QState"],
                    accuracy: int, max_rounds: int,
                    direct_limit: int) -> None:
    """The shared bracketing loop of :func:`exact_quantiles` /
    :func:`exact_ranks`: per round, ONE multi-bracket re-sketch, ONE
    conditional-aggregation verify pass, ONE shared ranked read over
    every TakeOrdered-small bracket (see exact_quantiles' doc — this
    is a pure extraction; the job counts those tests pin live here).
    Mutates each state's ``val`` in place."""
    from pyspark import StorageLevel

    # every round re-reads the projected 1-column slice (sketch, verify,
    # ranked read) — spread a narrow scan across the session cores and
    # persist for the life of the loop, the same iterative multi-job
    # discipline as the grouped engine (persist adds no jobs, so the
    # pinned job counts are unchanged)
    vals = _spread(vals).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        _bracket_loop_rounds(vals, col, st, accuracy, max_rounds,
                             direct_limit)
    finally:
        vals.unpersist()


def _bracket_loop_rounds(vals: DataFrame, col: str, st: list["_QState"],
                         accuracy: int, max_rounds: int,
                         direct_limit: int) -> None:
    threshold = max(2 * accuracy, direct_limit)
    sketch_rounds = 0
    while True:
        open_st = [(i, s) for i, s in enumerate(st) if s.val is None]
        if not open_st:
            break
        ready = [(i, s) for i, s in open_st if s.width() <= threshold]
        if ready:
            for i, v in _read_ready_brackets(vals, col, ready).items():
                st[i].val = v
        sketching = [(i, s) for i, s in open_st
                     if s.width() > threshold]
        if not sketching:
            continue
        if sketch_rounds >= max_rounds:
            raise RuntimeError(
                f"quantile bracketing did not converge in {max_rounds}"
                " rounds — accuracy too low for this n")
        sketch_rounds += 1
        # ONE multi-bracket re-sketch: per open bracket, a FILTERed
        # approx_percentile at its band — a single aggregation job
        exprs = []
        for i, s in sketching:
            ql, qh = s.band(accuracy)
            filt = ("" if s.lo is None else
                    f" FILTER (WHERE {col} >= {s.lo!r}"
                    f" AND {col} <= {s.hi!r})")
            exprs.append(F.expr(
                f"approx_percentile({col}, array({ql!r}, {qh!r}), "
                f"{accuracy}){filt}").alias(f"b{i}"))
        brow = vals.agg(*exprs).first()
        props = {i: (float(brow[f"b{i}"][0]), float(brow[f"b{i}"][1]))
                 for i, _ in sketching}
        # ONE conditional-aggregation verify pass for every bracket
        vexprs = []
        for i, _ in sketching:
            nlo, nhi = props[i]
            vexprs.append(F.sum(F.when(
                F.col(col) < F.lit(nlo), 1).otherwise(0))
                .alias(f"l{i}"))
            vexprs.append(F.sum(F.when(
                F.col(col) <= F.lit(nhi), 1).otherwise(0))
                .alias(f"u{i}"))
        vrow = vals.agg(*vexprs).first()
        stalled = []
        for i, s in sketching:
            nlo, nhi = props[i]
            old = (s.lo, s.hi, s.below, s.upto)
            s.apply_verified(nlo, nhi, int(vrow[f"l{i}"]),
                             int(vrow[f"u{i}"]))
            if s.val is None and (s.lo, s.hi, s.below, s.upto) == old:
                stalled.append((i, s))
        if stalled:
            # duplicate masses pinned the proposals to the current
            # bracket: ONE exact counting job resolves every stalled
            # state (see _QState.resolve_stall) — an exact-progress
            # step, so it does not count against the sketch budget
            sexprs = []
            for i, s in stalled:
                sexprs.append(F.sum(F.when(
                    F.col(col) <= F.lit(s.lo), 1).otherwise(0))
                    .alias(f"sl{i}"))
                sexprs.append(F.sum(F.when(
                    F.col(col) < F.lit(s.hi), 1).otherwise(0))
                    .alias(f"sh{i}"))
            srow = vals.agg(*sexprs).first()
            for i, s in stalled:
                s.resolve_stall(int(srow[f"sl{i}"]),
                                int(srow[f"sh{i}"]))
            sketch_rounds -= 1


def grouped_exact_quantiles(df: DataFrame, group_col: str, col: str,
                            qs: list[float], accuracy: int = 10_000,
                            max_rounds: int = 6,
                            direct_limit: int = 100_000,
                            grid: int = 512) -> list[tuple]:
    """EXACT per-group quantiles — :func:`exact_quantiles` generalized
    the way :func:`grouped_heavy_hitters_exact` generalizes the MG
    two-pass: one bracketing state per (group, quantile), every round a
    CONSTANT number of jobs regardless of n_groups x len(qs), never a
    per-group (or per-quantile) loop. For LOW-cardinality group columns
    (event types, languages, sources — the per-segment p50/p95
    question); the per-round driver collects are bounded by
    n_groups x len(qs) state rows.

    Job shape (r10 — was 1 sizes + 3/round in r9): the sizes pass
    DOUBLES as round 1's grid sketch (each group's exact n and its
    shared ``grid``-point ``approx_percentile`` array in ONE grouped
    agg — the percentages must be foldable, so per-state bands are
    not expressible; the driver picks the two grid values bracketing
    each state's in-slice rank, guard-banded by the sketch's
    n/accuracy rank error). Then ONE fused job per round: rows
    broadcast-join the open-bracket frame on the group key, slice to
    the CURRENT bracket (verify counts are RELATIVE — proposals are
    actual slice values, so count(col < nlo) = below + count(lo <=
    col < nlo) exactly, and the job shrinks with the bracket instead
    of rescanning the group), count every state's strictly-below /
    at-or-below rank (widen-on-wobble, sketch only proposes), AND
    optimistically sketch the PROPOSED bracket's grid in the same
    aggregation — adopted-as-proposed states (the common case) start
    the next round with their grid already in hand; only a
    widen-on-wobble state pays a separate re-sketch job. Shrink per
    round is ~(2*guard+1)/grid + 2/accuracy of the bracket —
    log_{~grid} convergence, e.g. 10^12 rows/group ->
    direct-readable in <= 4 rounds at the defaults. Finally ONE
    shared ranked read over every TakeOrdered-small bracket
    (partition sizes <= the direct threshold). The (group, value)
    slice is persisted for the life of the call (iterative multi-job
    discipline).

    NULL semantics: NULL ``col`` values are excluded from every
    group's n (the flat contract); a NULL GROUP is a real group.
    Returns [(group, q, value)] ordered by (group-insertion, q)."""
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    spark = df.sparkSession
    gtype = df.schema[group_col].dataType
    vals = (df.select(group_col, col)
            .filter(F.col(col).isNotNull()))
    threshold = max(2 * accuracy, direct_limit)
    guard = math.ceil(grid / accuracy) + 1
    pcts = ", ".join(repr(i / grid) for i in range(grid + 1))
    # the sizes pass DOUBLES as round 1's grid sketch (r10, VERDICT r9
    # #6): every state's first bracket is the whole group, so ONE
    # grouped agg returns each group's exact n AND its shared grid —
    # one job saved per call, and round 1 skips the broadcast-join
    # state expansion entirely (the per-group grid serves ALL of the
    # group's quantile states)
    # the 2-column slice is re-read by every round's sketch/verify/read
    # job — persist it (spilling allowed) for the life of the call, the
    # standard treatment for iterative multi-job algorithms; at corpus
    # scale this is the projected (group, value) pair, not the table
    from pyspark import StorageLevel

    vals = _spread(vals).persist(StorageLevel.MEMORY_AND_DISK)
    first = (vals.groupBy(group_col)
             .agg(F.count(F.lit(1)).alias("__n"),
                  F.expr(f"approx_percentile({col}, array({pcts}), "
                         f"{accuracy})").alias("__p"))
             .collect())
    states: list[tuple] = []  # (group_value, _QState)
    grids: dict = {}          # state index -> CURRENT bracket's grid
    for r in first:
        for q in qs:
            grids[len(states)] = r["__p"]
            states.append((r[group_col], _QState(q, int(r["__n"]))))

    try:
        _grouped_bracket_loop(spark, vals, group_col, col, gtype,
                              states, grids, accuracy, max_rounds,
                              direct_limit, grid)
    finally:
        vals.unpersist()
    return [(g, s.q, s.val) for g, s in states]


def _read_ready_grouped(tag_df, col, ready):
    """ONE shared ranked read over every TakeOrdered-small bracket of
    the grouped engine: the tagged-and-sliced frame is ranked per state
    and the in-bracket rank row kept. ``ready`` carries the (i, (group,
    state)) pairs being read — a separate function so tests can spy the
    bracket widths at the read site, exactly like the flat engine's
    :func:`_read_ready_brackets`. Returns {state_index: value}."""
    from pyspark.sql import Window as W

    w = W.partitionBy("__si").orderBy(F.col(col).asc())
    hits = (tag_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == F.col("__kin"))
            .select("__si", col).collect())
    return {int(r["__si"]): float(r[col]) for r in hits}


def _grouped_bracket_loop(spark, vals, group_col, col, gtype,
                          states, grids, accuracy, max_rounds,
                          direct_limit, grid) -> None:
    """The shared per-round loop of :func:`grouped_exact_quantiles` /
    :func:`grouped_exact_ranks` (extracted r11, ADVICE r10: the
    streaming hot-bucket serve batches ALL hot cells through this one
    loop instead of a sequential per-cell bracketing run). ``states``
    is [(group_value, _QState)]; ``grids`` maps state index -> the
    CURRENT bracket's grid where already sketched. Mutates each
    state's ``val`` in place. ``vals`` must be persisted by the
    caller for the life of the call."""
    from pyspark.sql import types as T

    threshold = max(2 * accuracy, direct_limit)
    guard = math.ceil(grid / accuracy) + 1
    pcts = ", ".join(repr(i / grid) for i in range(grid + 1))

    def _sql_lit(v, dtype) -> str:
        """A driver-side scalar as exact SQL text. Doubles go through a
        STRING cast so any repr round-trips bit-exactly; strings get
        standard quote doubling."""
        if v is None:
            return f"CAST(NULL AS {dtype.simpleString()})"
        if isinstance(dtype, T.DoubleType):
            return f"CAST('{float(v)!r}' AS DOUBLE)"
        if isinstance(dtype, T.StringType):
            s = str(v).replace("'", "''")
            return f"'{s}'"
        if isinstance(dtype, (T.IntegerType, T.LongType)):
            return str(int(v))
        if isinstance(dtype, T.BooleanType):
            return "TRUE" if v else "FALSE"
        return f"CAST('{v}' AS {dtype.simpleString()})"

    gcol = f"`{group_col}`"
    vcol = f"`{col}`"

    def _match_sql(g) -> str:
        """Null-safe group-match predicate against a DRIVER-SIDE group
        value (a NULL group is a real group). Struct-typed keys — the
        streaming serve's composite (group, bucket) cells — compare
        field-by-field, since struct literals are not expressible."""
        if isinstance(gtype, T.StructType):
            return " AND ".join(
                f"({gcol}.`{f.name}` <=> {_sql_lit(v, f.dataType)})"
                for f, v in zip(gtype.fields, tuple(g)))
        return f"({gcol} <=> {_sql_lit(g, gtype)})"

    def _tag(frame_rows, extra_fields, bracket_filter: bool):
        """Tag rows with the bracket states they fall in — as ONE
        literal projection built as a single SQL expression (r14):
        each state contributes a group-guarded struct literal to an
        array; rows explode only the states they match. This replaces
        the per-round createDataFrame + BroadcastExchange + broadcast
        join (~0.3 s of driver/exchange overhead per round at
        sf0.1/32 cores); building the expression as SQL TEXT matters
        as much as dropping the join — per-state Column operations
        were ~50 py4j round trips each, the parsed string is one call
        total. The bracket slice rides INSIDE each state's guard, so
        out-of-bracket rows never leave the Generate. Same tagged
        schema (__si, ...extra) as the join produced — the shape the
        flat engine's _read_ready_brackets always used."""
        elems = []
        for row in frame_rows:
            g, si, extras = row[0], row[1], row[2:]
            guard = _match_sql(g)
            if bracket_filter and extras[0] is not None:
                # __lo/__hi lead the extras by construction
                lo = _sql_lit(extras[0], dbl)
                hi = _sql_lit(extras[1], dbl)
                guard = (f"({guard} AND {vcol} >= {lo}"
                         f" AND {vcol} <= {hi})")
            parts = [f"'__si', {int(si)}"]
            parts += [f"'{fdef.name}', {_sql_lit(v, fdef.dataType)}"
                      for fdef, v in zip(extra_fields, extras)]
            elems.append(
                f"IF({guard}, named_struct({', '.join(parts)}), NULL)")
        tag_expr = (f"filter(array({', '.join(elems)}), "
                    f"s -> s IS NOT NULL)")
        tagged = vals.select(
            vcol, F.explode(F.expr(tag_expr)).alias("__s"))
        return tagged.select(vcol, "__s.*")

    dbl = T.DoubleType()
    sketch_rounds = 0
    while True:
        open_st = [(i, gs) for i, gs in enumerate(states)
                   if gs[1].val is None]
        if not open_st:
            break
        ready = [(i, gs) for i, gs in open_st
                 if gs[1].width() <= threshold]
        if ready:
            rrows = [(g, i, _flt(s.lo), _flt(s.hi), s.k - s.below)
                     for i, (g, s) in ready]
            tag = _tag(rrows,
                       [T.StructField("__lo", dbl),
                        T.StructField("__hi", dbl),
                        T.StructField("__kin", T.IntegerType())],
                       bracket_filter=True)
            for si, v in _read_ready_grouped(tag, col, ready).items():
                states[si][1].val = v
        sketching = [(i, gs) for i, gs in open_st
                     if gs[1].width() > threshold]
        if not sketching:
            continue
        if sketch_rounds >= max_rounds:
            raise RuntimeError(
                f"grouped quantile bracketing did not converge in "
                f"{max_rounds} rounds — accuracy/grid too low")
        sketch_rounds += 1
        # a state's grid for its CURRENT bracket usually already
        # exists: round 1's rode the sizes pass, later rounds' rode
        # the PREVIOUS verify job (optimistic fused sketch below) —
        # a separate _tag sketch job runs only for states whose
        # optimistic grid was invalidated by a widen-on-wobble
        need = [(i, gs) for i, gs in sketching if i not in grids]
        if need:
            srows = [(g, i, _flt(s.lo), _flt(s.hi))
                     for i, (g, s) in need]
            tag = _tag(srows, [T.StructField("__lo", dbl),
                               T.StructField("__hi", dbl)],
                       bracket_filter=True)
            for r in (tag.groupBy("__si")
                      .agg(F.expr(f"approx_percentile({col}, "
                                  f"array({pcts}), {accuracy})")
                           .alias("p")).collect()):
                grids[r["__si"]] = r["p"]
        props = {}
        for i, (g, s) in sketching:
            p = grids[i]
            q_in = (s.k - s.below) / s.width()
            ilo = max(0, math.floor(q_in * grid) - guard)
            ihi = min(grid, math.ceil(q_in * grid) + guard)
            props[i] = (float(p[ilo]), float(p[ihi]))
        # ONE fused job: verify RELATIVE to the previous bracket
        # (proposals are actual slice values, so nlo/nhi lie inside
        # [lo, hi] and count(col < nlo) = s.below + count(lo <=
        # col < nlo) exactly — the verify join slices to bracket
        # rows like the sketch, shrinking with the bracket), AND
        # optimistically sketch the PROPOSED bracket's grid in the
        # same aggregation — when the verify adopts both sides (the
        # common case; the guard band makes wobble rare) the next
        # round needs no sketch job at all
        vrows = [(g, i, _flt(s.lo), _flt(s.hi),
                  props[i][0], props[i][1])
                 for i, (g, s) in sketching]
        tagv = _tag(vrows, [T.StructField("__lo", dbl),
                            T.StructField("__hi", dbl),
                            T.StructField("__nlo", dbl),
                            T.StructField("__nhi", dbl)],
                    bracket_filter=True)
        vres = {r["__si"]: r for r in
                (tagv.groupBy("__si")
                 .agg(F.sum(F.when(F.col(col) < F.col("__nlo"), 1)
                            .otherwise(0)).alias("l"),
                      F.sum(F.when(F.col(col) <= F.col("__nhi"), 1)
                            .otherwise(0)).alias("u"),
                      F.expr(f"approx_percentile({col}, "
                             f"array({pcts}), {accuracy}) "
                             f"FILTER (WHERE {col} >= __nlo "
                             f"AND {col} <= __nhi)")
                      .alias("p")).collect())}
        grids.clear()
        stalled = []
        for i, (g, s) in sketching:
            nlo, nhi = props[i]
            r = vres.get(i)
            l, u = (int(r["l"]), int(r["u"])) if r else (0, 0)
            old = (s.lo, s.hi, s.below, s.upto)
            s.apply_verified(nlo, nhi, s.below + l, s.below + u)
            if (s.val is None
                    and (s.lo, s.hi, s.below, s.upto) == old):
                stalled.append((i, g, s))
                continue
            if (s.val is None and r is not None
                    and r["p"] is not None
                    and (s.lo, s.hi) == (nlo, nhi)):
                grids[i] = r["p"]  # optimistic grid is valid
        if stalled:
            # duplicate masses pinned the proposals (see
            # _QState.resolve_stall): ONE tagged counting job over the
            # stalled states' brackets resolves them all — counts are
            # RELATIVE to the bracket (rows below lo are exactly
            # s.below), an exact-progress step outside the sketch
            # budget
            srows = [(g, i, _flt(s.lo), _flt(s.hi))
                     for i, g, s in stalled]
            tag = _tag(srows, [T.StructField("__lo", dbl),
                               T.StructField("__hi", dbl)],
                       bracket_filter=True)
            sres = {r["__si"]: r for r in
                    (tag.groupBy("__si")
                     .agg(F.sum(F.when(F.col(col) <= F.col("__lo"), 1)
                                .otherwise(0)).alias("le_lo"),
                          F.sum(F.when(F.col(col) < F.col("__hi"), 1)
                                .otherwise(0)).alias("lt_hi"))
                     .collect())}
            for i, g, s in stalled:
                r = sres.get(i)
                le_lo, lt_hi = ((int(r["le_lo"]), int(r["lt_hi"]))
                                if r else (0, 0))
                s.resolve_stall(s.below + le_lo, s.below + lt_hi)
            sketch_rounds -= 1


def grouped_exact_ranks(df: DataFrame, key_col: str, col: str,
                        cells: list[tuple], accuracy: int = 10_000,
                        max_rounds: int = 6,
                        direct_limit: int = 100_000,
                        grid: int = 512) -> dict:
    """EXACT k-th smallest per (cell, rank) for caller-known exact cell
    sizes — the rank-addressed grouped twin of :func:`exact_ranks`,
    batching EVERY cell through one shared bracketing loop (r11,
    ADVICE r10: the streaming quantile serve's hot (group, bucket)
    cells previously ran a sequential per-cell loop, making serve
    latency linear in hot-cell count; here all cells share each
    round's sketch/verify/read jobs, the grouped engine's constant job
    shape).

    ``cells``: [(key_value, n_cell, [(state_id, k), ...])] with k the
    1-based rank INSIDE the cell and n_cell the cell's exact non-null
    row count (no sizes job runs — the caller holds exact counts, e.g.
    a maintained histogram). ``key_col`` may be any equality-
    comparable column the caller constructed (a partition bucket, or a
    struct of (group, bucket) for composite cells). Returns
    {state_id: value}."""
    spark = df.sparkSession
    gtype = df.schema[key_col].dataType
    vals = (df.select(key_col, col)
            .filter(F.col(col).isNotNull()))
    pcts = ", ".join(repr(i / grid) for i in range(grid + 1))
    from pyspark import StorageLevel

    vals = vals.persist(StorageLevel.MEMORY_AND_DISK)
    states: list[tuple] = []   # (key_value, _QState)
    grids: dict = {}           # state index -> current bracket's grid
    sids: list = []            # state index -> caller's state_id
    try:
        # ONE shared grid sketch seeds round 1 for every cell (the
        # analogue of grouped_exact_quantiles' fused sizes+grid pass,
        # minus the sizes — counts are caller-supplied)
        first = {r["__k"]: r["__p"] for r in
                 (vals.groupBy(F.col(key_col).alias("__k"))
                  .agg(F.expr(f"approx_percentile({col}, "
                              f"array({pcts}), {accuracy})")
                       .alias("__p")).collect())}
        for key, n_cell, pairs in cells:
            p = first.get(key)
            for sid, k in pairs:
                if not 1 <= k <= n_cell:
                    raise ValueError(
                        f"rank {k} outside [1, {n_cell}] for {key!r}")
                s = _QState(k / n_cell, n_cell)
                s.k = k  # exact rank, not a ceil(q*n) re-derivation
                if p is not None:
                    grids[len(states)] = p
                states.append((key, s))
                sids.append(sid)
        _grouped_bracket_loop(spark, vals, key_col, col, gtype,
                              states, grids, accuracy, max_rounds,
                              direct_limit, grid)
    finally:
        vals.unpersist()
    return {sid: s.val for sid, (_, s) in zip(sids, states)}


def _flt(x):
    """None-preserving float cast for bracket-frame literals."""
    return None if x is None else float(x)


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate items as a 1-column frame of
    DISTINCT candidate values (the union of per-task candidate SETS —
    a superset of :func:`mg_sketch`'s keys, used where only proposal
    matters and the exact pass does the counting)."""
    return mg_partial(df, col, k).select(col).distinct()


def heavy_hitters_exact(df: DataFrame, col: str,
                        phi: float) -> DataFrame:
    """All values of ``col`` with frequency > phi * n, with EXACT
    counts and shares — two scans, no wide shuffle (see module doc).
    Returns (col, cnt, share) unordered."""
    k = math.ceil(1.0 / phi)
    return exact_pass(df, mg_candidates(df, col, k), col, phi)


def exact_pass(df: DataFrame, cand: DataFrame, col: str,
               phi: float) -> DataFrame:
    """Pass 2 of heavy-hitter recovery, given an externally-proposed
    candidate frame (1 column named ``col``; e.g. a stream-maintained
    MG sketch's keys): exact counts + the phi cut, one bounded
    map-side-combined aggregation."""
    cand = cand.select(col)
    # pass 2: tag each row with its candidate value (or NULL), one
    # map-side-combined aggregation over <= k+1 groups gives both the
    # per-candidate exact counts and (summed) the grand total
    tagged = (df.select(col)
              .join(F.broadcast(cand.select(F.col(col).alias("__cand"))),
                    F.col(col).eqNullSafe(F.col("__cand")), "left")
              .select("__cand"))
    from pyspark.sql import Window as W

    counts = tagged.groupBy("__cand").agg(
        F.count(F.lit(1)).alias("cnt"))
    # global window over the <= k+1 aggregated rows only — bounded, a
    # single-task stage over a sketch-sized frame, never the corpus
    n_total = F.sum("cnt").over(W.partitionBy())
    return (counts.withColumn("__n", n_total)
            .filter(F.col("__cand").isNotNull()
                    & (F.col("cnt") > phi * F.col("__n")))
            .select(F.col("__cand").alias(col),
                    F.col("cnt").cast("long").alias("cnt"),
                    F.round(F.col("cnt") / F.col("__n"), 6)
                    .alias("share")))
