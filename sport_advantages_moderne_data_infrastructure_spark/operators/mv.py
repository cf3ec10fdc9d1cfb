"""Incremental materialized-view maintenance over the txn change feed.

The reference recomputes its aggregate table from scratch on every cycle
(airflow/config/read_delta.py:47-53 re-reads the whole Delta table and
re-aggregates). At 100 TB that is a full scan per refresh; the lakehouse
answer is a materialized view maintained FROM THE CHANGE FEED: the view
stores per-group partials (count, sum — the associative combiners), and
each refresh applies only the rows that changed since the last
maintained source version. Cost per refresh is O(changed rows) +
O(view), never O(source table).

Built from pieces that already exist and are independently gated: the
change data feed (``TxnTable.read_changes`` — insert / pre/postimage /
delete rows with ``_commit_version``) and
``txnlog.agg_delta_from_changes`` (CDF frame → signed per-group deltas;
preimages subtract, postimages add — which is WHY the feed carries
preimages). A history range the feed cannot express row-wise (a full
overwrite / compaction landed since the last refresh) degrades to a
full recompute from the snapshot — same answer, full-scan cost, exactly
Delta's "resync after a non-CDF commit" rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.txnlog import TxnTable, agg_delta_from_changes


# Measured crossover (PLANS.md §Incremental materialized view): at
# 0.8M source rows a full rescan beat the incremental refresh (506 vs
# 824 ms — the refresh's fixed cost dominates), at 8M the incremental
# path was flat while rescan grew 2.56x. "auto" picks rescan below
# this row count (metadata-only, from commit-log footers) — the
# threshold sits between the two measured points.
_AUTO_RESCAN_ROWS = 2_000_000


def _last_meta_with(table: TxnTable, key: str) -> dict:
    """The most recent commit meta carrying ``key`` — NOT simply the
    last commit's meta: a layout-only commit interleaved between
    refreshes (OPTIMIZE/compaction on the view) must not clobber the
    refresher's high-water bookkeeping, or the next refresh silently
    degrades to a full rebuild (and, for a capture_changes view, hands
    every downstream consumer a needless resync). The backward walk is
    bounded by how many non-refresh commits landed since the last
    refresh — ~one compaction, in practice."""
    return _last_meta_version_with(table, key)[0]


def _last_meta_version_with(table: TxnTable, key: str
                            ) -> tuple[dict, int | None]:
    """(meta, version) — like :func:`_last_meta_with` but also returns
    the commit VERSION that carried the meta, so a serve can pin its
    data read at exactly that commit: reading the meta at one version
    and the data unpinned leaves a window where a refresh landing
    between the two reads pairs fresh data with stale bookkeeping."""
    v = table.latest_version()
    while v is not None and v >= 0:
        meta = table._doc(v).get("meta", {})  # noqa: SLF001
        if key in meta:
            return meta, v
        v -= 1
    return {}, None


def maintain_agg_view(spark: SparkSession, source: TxnTable,
                      view: TxnTable, group_cols: list[str],
                      value_col: str,
                      strategy: str = "incremental",
                      capture_changes: bool = False) -> int:
    """Bring ``view`` (per-group ``cnt``/``sm`` partials over
    ``source``) up to the source's latest version. Returns the source
    version now reflected. Idempotent: re-running with no new source
    commits is a no-op (no empty commit).

    ``strategy``: ``"incremental"`` (change-feed delta; degrades to
    rescan on non-row-wise history), ``"rescan"`` (always recompute
    from the snapshot — same answer, full-scan cost), or ``"auto"``
    (rescan while the source's metadata row count is under the
    measured crossover, incremental above it).

    ``capture_changes``: write row-level change files (CHANGED GROUPS
    only — old partial rows as ``delete``, new as ``insert``, volume
    O(changed groups) per refresh, never O(groups)) with every
    incremental refresh, making the maintained view itself a CDF
    source so FURTHER incremental views consume it — e.g. a join MV
    whose one side is this aggregate (the reference's ``final`` LEFT
    JOINs the activity aggregate, read_delta.py:280-285). Rescan
    refreshes carry no row-level delta and commit without change
    files; downstream consumers resync there, Delta's rule."""
    if strategy not in ("incremental", "rescan", "auto"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    src_v = source.latest_version()
    if src_v is None:
        raise ValueError(f"source has no commits: {source.path}")
    last = (_last_meta_with(view, "mv_source_version")
            .get("mv_source_version", -1)
            if view.latest_version() is not None else -1)
    if src_v <= last:
        return last
    meta = {"operation": "mv_refresh", "mv_source_version": src_v}
    if strategy == "auto":
        rows = source.snapshot_row_count(src_v)
        strategy = ("rescan" if rows is not None
                    and rows < _AUTO_RESCAN_ROWS else "incremental")
    if strategy == "incremental":
        try:
            # bounded to src_v: a commit landing mid-refresh must NOT
            # be applied now (it would be replayed next refresh, whose
            # since_version is this src_v — double-applying its delta)
            changes = source.read_changes(spark, since_version=last,
                                          upto=src_v)
        except ValueError:
            strategy = "rescan"  # non-row-level history: full resync
            meta["mv_resync"] = True
        else:
            delta = agg_delta_from_changes(changes, group_cols,
                                           value_col)
            new = apply_delta(spark, view, delta, group_cols)
            ch_df = (agg_view_changes(spark, view, delta, group_cols,
                                      new)
                     if capture_changes else None)
            # the view is O(groups) — tiny next to the source — so an
            # atomic overwrite is the right write shape at any scale
            view.overwrite(new, meta, changes=ch_df)
            return src_v
    snap = source.read(spark, version=src_v)
    view.overwrite(_partials(snap, group_cols, value_col), meta)
    return src_v


def agg_view_changes(spark: SparkSession, view: TxnTable,
                     delta: DataFrame, group_cols: list[str],
                     new: DataFrame) -> DataFrame:
    """CHANGED-GROUPS row-level change frame for an agg-view refresh
    (old partial rows as ``delete``, new as ``insert`` — O(changed
    groups) volume). Shared by the batch ``maintain_agg_view`` and the
    streaming leg (``streaming/mv.write_stream_agg_view``), so both
    write shapes make the maintained aggregate a CDF source."""
    changed = (delta.filter((F.col("d_count") != 0)
                            | (F.col("d_sum") != 0))
               .select(*group_cols))
    ins = (_semi_nullsafe(new, changed, group_cols)
           .withColumn("_change_type", F.lit("insert")))
    if view.latest_version() is None:
        return ins
    return (_semi_nullsafe(view.read(spark), changed, group_cols)
            .withColumn("_change_type", F.lit("delete"))
            .unionByName(ins))


def _semi_nullsafe(df: DataFrame, keys_df: DataFrame,
                   cols: list[str]) -> DataFrame:
    """LEFT SEMI join on ``cols`` with NULL-safe equality (group
    columns can be NULL; a plain column-name semi join would drop the
    NULL group)."""
    from functools import reduce

    a, b = df.alias("a"), keys_df.alias("b")
    cond = reduce(lambda x, y: x & y,
                  [a[c].eqNullSafe(b[c]) for c in cols])
    return a.join(b, cond, "left_semi")


def apply_delta(spark: SparkSession, view: TxnTable, delta: DataFrame,
                group_cols: list[str]) -> DataFrame:
    """Current partials + a signed delta frame (d_count/d_sum) → the new
    partials. Fully-deleted groups (cnt reaches 0) drop, matching GROUP
    BY over the post-delete source."""
    if view.latest_version() is None:
        return (delta.select(
            *group_cols,
            F.col("d_count").alias("cnt"), F.col("d_sum").alias("sm"))
            .filter(F.col("cnt") != 0))
    cur = view.read(spark).alias("c")
    d = delta.alias("d")
    cond = cur[group_cols[0]].eqNullSafe(d[group_cols[0]])
    for c in group_cols[1:]:
        cond = cond & cur[c].eqNullSafe(d[c])
    return (cur.join(d, cond, "full_outer")
            .select(
                *[F.coalesce(cur[c], d[c]).alias(c) for c in group_cols],
                (F.coalesce(cur["cnt"], F.lit(0))
                 + F.coalesce(d["d_count"], F.lit(0))).alias("cnt"),
                (F.coalesce(cur["sm"], F.lit(0))
                 + F.coalesce(d["d_sum"], F.lit(0))).alias("sm"))
            .filter(F.col("cnt") != 0))


def _partials(df: DataFrame, group_cols: list[str],
              value_col: str) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(value_col).alias("sm"))


def read_agg_view(spark: SparkSession, view: TxnTable) -> DataFrame:
    """The maintained aggregates, with the derived mean (partials
    compose; avg never does — it is derived at read time)."""
    v = view.read(spark)
    return v.select(*[c for c in v.columns if c not in ("cnt", "sm")],
                    F.col("cnt"), F.col("sm"),
                    (F.col("sm") / F.col("cnt")).alias("mean"))


# --- incremental JOIN materialized view -----------------------------------

def buckets_for_rows(n_rows: int, target_rows: int = 100_000) -> int:
    """Bucket-count policy for the join state: hold E[bucket width]
    near ``target_rows`` so a few-keys refresh rewrites a bounded
    number of rows REGARDLESS of corpus size — the ivf.k_for_corpus
    discipline applied to partition-granular maintenance. At a fixed
    bucket count, bucket width (and so refresh cost) would grow
    linearly with the corpus."""
    return max(8, min(65_536, -(-n_rows // max(target_rows, 1))))


class JoinMaterializedView:
    """Inner equi-join of two txn tables, maintained incrementally from
    BOTH sides' change feeds — the reference's ``final`` table is a JOIN
    rebuilt wholesale every DAG run (read_delta.py:280-285); at 100 TB a
    refresh must cost O(changed keys), not O(join).

    The classic streaming-join state shape (what Flink keeps for a
    two-sided join), materialized on the lakehouse: three tables under
    one root, all partitioned by ``__kb = pmod(hash(key), n_buckets)`` —
    a keyed replica of each side (the per-key state) and the join
    output. A refresh (1) reads each side's change feed bounded to the
    captured version, (2) derives the set of AFFECTED BUCKETS from the
    changed keys (a bounded collect: at most n_buckets ints, the
    scd2.py discipline), (3) applies each side's delta to its replica
    by NET ROW COUNT — inserts/postimages +1, deletes/preimages -1,
    summed per exact row value, so application is correct for arbitrary
    multisets and independent of commit order within the range — and
    (4) recomputes the join for those buckets only, from the
    partition-pruned replicas, never touching the sources. Every read
    and write in the refresh is partition-granular
    (``commit(adds, removes)`` of ``__kb=`` subdirs), so refresh cost
    is O(changed keys x bucket width) while a rescan pays O(join).

    Non-row-wise source history (overwrite / uncaptured-DV delete — the
    feed raises) degrades to a flagged full rebuild, after which
    incremental maintenance resumes. Join columns other than ``key``
    must be distinct between the two sides."""

    #: measured crossover (PLANS.md §Incremental JOIN materialized
    #: view): at 20M source rows the wholesale re-join still beat the
    #: refresh (2.27 vs 2.91 s — fixed multi-commit overhead
    #: dominates), at 40M the flat refresh won (2.40 vs 3.64 s).
    #: "auto" rebuilds below this combined row count (metadata-only,
    #: from commit-log footers) and refreshes incrementally above it.
    AUTO_REBUILD_ROWS = 25_000_000

    def __init__(self, root: str, key: str, n_buckets: int = 32,
                 how: str = "inner", capture_changes: bool = False):
        """``how``: ``"inner"`` or ``"left"`` (the reference's
        ``final`` table is a LEFT join — read_delta.py:280-285, NULL
        counts preserved). Because a refresh RECOMPUTES the affected
        buckets from the keyed replicas — it never reasons about
        delta-join algebra — any join type that is local to a key
        bucket is maintained correctly, including the appearing/
        disappearing NULL-padded rows that make left-outer delta
        rules hard in the classical formulation.

        ``capture_changes``: write row-wise change files with every
        view commit, so the maintained view is itself a CDF source and
        further incremental views stack on it (resync rebuilds remain
        full overwrites — downstream consumers resync there, as
        Delta's rule requires)."""
        if how not in ("inner", "left"):
            raise ValueError(f"unsupported join type: {how!r}")
        # single name or a composite key (list/tuple of names); stored
        # normalized, `self.key` kept as the single-name convenience
        self.keys = [key] if isinstance(key, str) else list(key)
        self.key = self.keys[0] if len(self.keys) == 1 else None
        self.how = how
        self.capture_changes = capture_changes
        self.n_buckets = n_buckets
        self.left_state = TxnTable(f"{root}/left_state")
        self.right_state = TxnTable(f"{root}/right_state")
        self.view = TxnTable(f"{root}/join")

    # -- public ------------------------------------------------------

    def refresh(self, spark: SparkSession, left: TxnTable,
                right: TxnTable,
                strategy: str = "incremental") -> tuple[int, int]:
        """Bring the join view up to (left.latest, right.latest);
        returns the (left, right) versions now reflected. No-op (no
        empty commits) when neither source moved.

        ``strategy``: ``"incremental"`` (both change feeds, affected
        buckets only; degrades to rebuild on non-row-wise history),
        ``"rebuild"`` (recompute the whole join — same answer, full
        cost), or ``"auto"`` (rebuild while the sources' combined
        metadata row count is under the measured crossover
        ``AUTO_REBUILD_ROWS``, incremental above it)."""
        if strategy not in ("incremental", "rebuild", "auto"):
            raise ValueError(f"unknown strategy: {strategy!r}")
        lv, rv = left.latest_version(), right.latest_version()
        if lv is None or rv is None:
            raise ValueError("both sources need at least one commit")
        last = (_last_meta_with(self.view, "mv_left_version")
                if self.view.latest_version() is not None else {})
        llast = last.get("mv_left_version", -1)
        rlast = last.get("mv_right_version", -1)
        if lv <= llast and rv <= rlast:
            return llast, rlast
        meta = {"operation": "join_mv_refresh",
                "mv_left_version": lv, "mv_right_version": rv}
        if strategy == "auto":
            lrows = left.snapshot_row_count(lv)
            rrows = right.snapshot_row_count(rv)
            strategy = ("incremental"
                        if lrows is not None and rrows is not None
                        and lrows + rrows >= self.AUTO_REBUILD_ROWS
                        else "rebuild")
        if llast < 0 or strategy == "rebuild":  # first build / forced
            self._rebuild(spark, left, right, lv, rv, meta)
            return lv, rv
        try:
            lch = left.read_changes(spark, since_version=llast, upto=lv)
            rch = right.read_changes(spark, since_version=rlast, upto=rv)
            # Crash idempotence: the three commits a refresh makes
            # (left state, right state, view) are not atomic, and only
            # the VIEW's commit advances (llast, rlast). A crash after
            # a state leg leaves that replica AHEAD of the view's
            # record; blindly re-applying the view-window deltas would
            # double-count into it. Each state leg therefore uses ITS
            # OWN recorded high-water (every _apply_side commit
            # carries mv_left/right_version): a leg already at the
            # target gets an empty delta (its bucket contents are
            # still re-read and re-joined for the view), a leg partway
            # ahead gets only its unapplied remainder.
            lst = self._state_leg_feed(spark, left, self.left_state,
                                       llast, lv, lch)
            rst = self._state_leg_feed(spark, right, self.right_state,
                                       rlast, rv, rch)
        except ValueError:
            self._rebuild(spark, left, right, lv, rv,
                          {**meta, "mv_resync": True})
            return lv, rv
        if not self.apply_change_batch(spark, lch, rch, meta,
                                       lch_state=lst, rch_state=rst):
            return llast, rlast  # no changed keys: no empty commit
        return lv, rv

    def _state_leg_feed(self, spark, source: TxnTable,
                        state: TxnTable, view_last: int, target: int,
                        view_feed: DataFrame):
        """The change feed one state replica still needs, given what
        its own commit meta says it already absorbed. ``view_feed`` is
        the view-window feed (since the VIEW's recorded version);
        normally the state matches the view and gets it unchanged."""
        if state.latest_version() is None:
            return view_feed
        own_key = ("mv_left_version" if state is self.left_state
                   else "mv_right_version")
        m = _last_meta_with(state, own_key)
        own = m.get(own_key, view_last)
        if own <= view_last:
            return view_feed          # state in lockstep with view
        if own >= target:
            return view_feed.limit(0)  # leg fully applied: empty delta
        return source.read_changes(spark, since_version=own,
                                   upto=target)

    def apply_change_batch(self, spark: SparkSession, lch: DataFrame,
                           rch: DataFrame, meta: dict,
                           guard=None, lch_state: DataFrame = None,
                           rch_state: DataFrame = None) -> list[int]:
        """Apply one batch of change rows (read_changes shape: data
        columns + ``_change_type``) from each side and re-join the
        affected buckets; returns the affected bucket ids. The shared
        core of the batch ``refresh`` and the streaming maintenance
        (streaming/joinmv.py): ``guard`` — a
        ``callable(table, leg_fn)`` — wraps each of the three commits
        (left state, right state, view) so the streaming sink can make
        every leg individually replay-guarded; each leg recomputes
        from current state, so a guarded retry after a lost race is
        safe. ``lch_state``/``rch_state`` (batch crash-resume): the
        feed actually applied to a state replica, when it differs from
        the affected-bucket window ``lch``/``rch`` — a leg whose prior
        commit already absorbed part of the window gets only the
        remainder (see ``_state_leg_feed``); affected buckets are
        always computed from the FULL view window so the view re-join
        covers everything since its own record."""
        run = guard if guard is not None else (lambda table, fn: fn())
        # "__kb" is reserved: a source that is ITSELF a maintained
        # bucketed view (stacked join MVs) carries its own bucket
        # column in snapshots and change files; it is physical layout,
        # not data — strip it so this view re-buckets by its own fn
        lch, rch = lch.drop("__kb"), rch.drop("__kb")
        if lch_state is not None:
            lch_state = lch_state.drop("__kb")
        if rch_state is not None:
            rch_state = rch_state.drop("__kb")
        keys = (lch.select(*self.keys)
                .unionByName(rch.select(*self.keys)).distinct())
        affected = sorted(
            r["__kb"] for r in
            keys.select(self._bucket().alias("__kb"))
            .distinct().collect())  # bounded: <= n_buckets ints
        if not affected:
            return affected
        lapply = lch if lch_state is None else lch_state
        rapply = rch if rch_state is None else rch_state
        run(self.left_state,
            lambda: self._apply_side(spark, self.left_state, lapply,
                                     affected, meta))
        run(self.right_state,
            lambda: self._apply_side(spark, self.right_state, rapply,
                                     affected, meta))

        def _view_leg():
            joined = self._join_of(
                self._read_buckets(spark, self.left_state, affected),
                self._read_buckets(spark, self.right_state, affected))
            self._replace_buckets(self.view, joined, affected, meta)

        run(self.view, _view_leg)
        return affected

    def read(self, spark: SparkSession) -> DataFrame:
        return self.view.read(spark).drop("__kb")

    # -- internals ---------------------------------------------------

    def _bucket(self):
        return F.pmod(F.hash(*[F.col(k) for k in self.keys]),
                      F.lit(self.n_buckets)).cast("int")

    @staticmethod
    def _read_buckets(spark, state: TxnTable,
                      affected: list[int]) -> DataFrame:
        """Partition-pruned bucket read, empty-graceful: a bucket can
        be live on one side only (read_partitions raises when nothing
        matches)."""
        try:
            return state.read_partitions(spark, affected)
        except ValueError:
            return (state.read(spark).limit(0)
                    .withColumn("__kb", F.lit(0).cast("int")))

    @staticmethod
    def _bucketed_or_empty(tbl: TxnTable, df: DataFrame,
                           meta: dict) -> tuple[list[str], dict]:
        """(adds, meta) for a ``__kb``-partitioned rebuild write. A
        partitioned write of ZERO rows leaves no files at all, which
        would commit an unreadable first snapshot (no schema source) —
        an empty side of a join is legal (e.g. an activity feed that
        has not delivered yet), so fall back to ONE 0-row plain file
        that carries the schema; later partition-granular commits
        coexist with it (mixed plain/partitioned reads are the normal
        txnlog read path)."""
        adds = tbl._write_data_partitioned(df, "__kb")  # noqa: SLF001
        if adds:
            return adds, {**meta, "partition_by": "__kb"}
        return [tbl._write_data(df.repartition(1))], dict(meta)  # noqa: SLF001

    def _join_of(self, l: DataFrame, r: DataFrame) -> DataFrame:
        lc = [c for c in l.columns
              if c not in (*self.keys, "__kb")]
        rc = [c for c in r.columns
              if c not in (*self.keys, "__kb")]
        return (l.join(r.drop("__kb"), self.keys, self.how)
                .select(*self.keys, *lc, *rc, "__kb"))

    def _rebuild(self, spark, left, right, lv, rv, meta) -> None:
        ls = (left.read(spark, version=lv).drop("__kb")
              .withColumn("__kb", self._bucket()))
        rs = (right.read(spark, version=rv).drop("__kb")
              .withColumn("__kb", self._bucket()))
        for tbl, df in ((self.left_state, ls), (self.right_state, rs),
                        (self.view, self._join_of(ls, rs))):
            base = tbl.latest_version()
            adds, m = self._bucketed_or_empty(tbl, df, meta)
            removes = tbl.snapshot_dirs(base) if base is not None else []
            tbl.commit(adds, removes, m, expected_version=base)

    def _apply_side(self, spark, state: TxnTable, changes: DataFrame,
                    affected: list[int], meta: dict) -> None:
        from functools import reduce

        cols = [c for c in changes.columns
                if c not in ("_change_type", "_commit_version")]
        net = (changes
               .withColumn("__w", F.when(
                   F.col("_change_type").isin("insert",
                                              "update_postimage"),
                   F.lit(1)).otherwise(F.lit(-1)))
               .groupBy(*cols).agg(F.sum("__w").alias("__net")))
        if state.latest_version() is None:  # first batch: empty state
            from pyspark.sql.types import LongType, StructType
            schema = StructType(
                [changes.schema[c] for c in cols]).add("__cur", LongType())
            old = spark.createDataFrame([], schema)
        else:
            old = (self._read_buckets(spark, state, affected)
                   .drop("__kb")
                   .groupBy(*cols).agg(F.count(F.lit(1)).alias("__cur")))
        o, n = old.alias("o"), net.alias("n")
        cond = reduce(lambda a, b: a & b,
                      [o[c].eqNullSafe(n[c]) for c in cols])
        total = (o.join(n, cond, "full_outer")
                 .select(*[F.coalesce(o[c], n[c]).alias(c)
                           for c in cols],
                         (F.coalesce(o["__cur"], F.lit(0))
                          + F.coalesce(n["__net"], F.lit(0)))
                         .alias("__n"))
                 .filter(F.col("__n") > 0))
        rows = (total.select(
            *cols,
            F.explode(F.sequence(F.lit(1),
                                 F.col("__n").cast("int"))).alias("__i"))
            .drop("__i")
            .withColumn("__kb", self._bucket()))
        self._replace_buckets(state, rows, affected, meta)

    def _replace_buckets(self, table: TxnTable, df: DataFrame,
                         affected: list[int], meta: dict) -> None:
        """Partition-granular replace of exactly the affected buckets —
        unlike overwrite_partitions (which replaces partitions PRESENT
        in df), this also removes a bucket the delta emptied. When the
        table being replaced is the VIEW and ``capture_changes`` is on,
        the commit also writes change files (old bucket rows as
        ``delete``, new rows as ``insert`` — unchanged rows inside a
        replaced bucket appear as a cancelling delete+insert pair,
        which every net-count/partial-sum consumer absorbs), so the
        maintained view is itself a row-wise CDF source and FURTHER
        incremental views stack on top of it (an agg MV over the join
        MV — see tests/test_mv.py stacked test). Change volume is
        O(replaced buckets), the same order as the write itself."""
        import os

        base = table.latest_version()
        live = table.snapshot_dirs(base) if base is not None else []
        aff = {f"__kb={v}" for v in affected}
        adds = table._write_data_partitioned(df, "__kb")  # noqa: SLF001
        stray = [a for a in adds if os.path.basename(a) not in aff]
        if stray:  # delta rows must land in affected buckets only
            raise AssertionError(f"rows outside affected buckets: {stray}")
        removes = [d for d in live if os.path.basename(d) in aff]
        changes_rel = None
        if self.capture_changes and table is self.view:
            spark = df.sparkSession
            old = (self._read_buckets(spark, table, affected)
                   if base is not None
                   else df.limit(0))
            changes_rel = table._write_changes(  # noqa: SLF001
                old.withColumn("_change_type", F.lit("delete"))
                .unionByName(
                    df.withColumn("_change_type", F.lit("insert"))))
        table.commit(adds, removes, {**meta, "partition_by": "__kb"},
                     expected_version=base, changes=changes_rel)


class MapMaterializedView(JoinMaterializedView):
    """Row-wise PROJECTION materialized view over one CDF source: the
    maintained form of a SELECT-expression layer — the reference's
    flagship prime/total-salary query (README.md:140-164) is exactly
    this over its ``final`` table. A refresh maps the source's change
    rows through ``map_fn`` (1:1, row-wise — no joins, no aggregates)
    and applies them by net row count to the bucketed view, so refresh
    cost is O(changed rows x bucket width), never O(view).

    Inherits the bucket machinery of :class:`JoinMaterializedView`
    (``__kb`` partition-granular replace, net-count application,
    optional ``capture_changes`` so further views stack on top); keeps
    a single table — the view IS the state, because a projection needs
    no other side. ``map_fn`` must be a deterministic per-row
    DataFrame transform that PRESERVES the key columns; change rows
    are projected sign-by-sign (inserted rows through the map stay
    inserts, deleted stay deletes), which is correct precisely because
    the map is a function of the row. Non-row-wise source history
    degrades to a flagged rebuild from the source snapshot, as
    everywhere else in this module."""

    def __init__(self, root: str, key, map_fn, n_buckets: int = 32,
                 capture_changes: bool = False):
        self.keys = [key] if isinstance(key, str) else list(key)
        self.key = self.keys[0] if len(self.keys) == 1 else None
        self.map_fn = map_fn
        self.n_buckets = n_buckets
        self.capture_changes = capture_changes
        self.view = TxnTable(root)

    def refresh(self, spark: SparkSession, source: TxnTable,
                strategy: str = "incremental") -> int:
        """Bring the view up to ``source.latest_version()``; returns
        the source version now reflected. No empty commits."""
        if strategy not in ("incremental", "rebuild"):
            raise ValueError(f"unknown strategy: {strategy!r}")
        sv = source.latest_version()
        if sv is None:
            raise ValueError(f"source has no commits: {source.path}")
        last = (_last_meta_with(self.view, "mv_source_version")
                .get("mv_source_version", -1)
                if self.view.latest_version() is not None else -1)
        if sv <= last:
            return last
        meta = {"operation": "map_mv_refresh", "mv_source_version": sv}
        if last < 0 or strategy == "rebuild":
            self._rebuild_from(spark, source, sv, meta)
            return sv
        try:
            ch = source.read_changes(spark, since_version=last, upto=sv)
        except ValueError:
            self._rebuild_from(spark, source, sv,
                               {**meta, "mv_resync": True})
            return sv
        self.apply_change_batch(spark, ch, meta)
        return sv

    def apply_change_batch(self, spark: SparkSession, ch: DataFrame,
                           meta: dict, guard=None) -> list[int]:
        """Apply one batch of change rows (read_changes shape) through
        the projection; returns the affected bucket ids. The shared
        core of the batch ``refresh`` and the streaming maintenance
        (``streaming/mv.write_stream_map_view``); ``guard`` wraps the
        single view commit the same way the join MV's legs are
        wrapped, so the streaming sink is replay-guarded."""
        run = guard if guard is not None else (lambda table, fn: fn())
        ch = ch.drop("_commit_version", "__kb")
        ct = F.col("_change_type")
        # project sign-by-sign: map_fn sees plain data rows (its select
        # list need not carry _change_type through)
        pos = (self.map_fn(
            ch.filter(ct.isin("insert", "update_postimage"))
            .drop("_change_type"))
            .withColumn("_change_type", F.lit("insert")))
        neg = (self.map_fn(
            ch.filter(ct.isin("delete", "update_preimage"))
            .drop("_change_type"))
            .withColumn("_change_type", F.lit("delete")))
        projected = pos.unionByName(neg)
        affected = sorted(
            r["__kb"] for r in
            projected.select(self._bucket().alias("__kb"))
            .distinct().collect())  # bounded: <= n_buckets ints
        if not affected:
            return affected  # nothing changed: no empty commit
        run(self.view,
            lambda: self._apply_side(spark, self.view, projected,
                                     affected, meta))
        return affected

    def _rebuild_from(self, spark, source: TxnTable, sv: int,
                      meta: dict) -> None:
        df = (self.map_fn(source.read(spark, version=sv).drop("__kb"))
              .withColumn("__kb", self._bucket()))
        base = self.view.latest_version()
        adds, m = self._bucketed_or_empty(self.view, df, meta)
        removes = (self.view.snapshot_dirs(base)
                   if base is not None else [])
        self.view.commit(adds, removes, m, expected_version=base)


class AggMaterializedView(JoinMaterializedView):
    """Per-group partials (cnt/sm) maintained BUCKETED: the
    ``maintain_agg_view`` semantics on the join MV's ``__kb``
    partition-granular layout, for aggregates whose group count scales
    WITH the corpus (e.g. per-employee activity partials — O(groups) =
    O(dimension rows)). The plain agg view overwrites its whole table
    every refresh, which is fine while groups are tiny (per-BU rollups)
    but becomes the chain's bottleneck when groups track the corpus:
    measured in scripts/bench_final_pipeline_stress.py, the composed
    pipeline's refresh slope was the agg overwrite. Here a refresh
    applies the signed delta to ONLY the affected buckets (read
    affected, full-outer with the delta, replace affected), so cost is
    O(changed groups x bucket width) — and ``capture_changes`` makes
    the bucketed view a CDF source through the same bucket-level
    change files the join MV writes, so downstream views stack."""

    def __init__(self, root: str, group_cols, value_col: str,
                 n_buckets: int = 32, capture_changes: bool = False):
        self.keys = ([group_cols] if isinstance(group_cols, str)
                     else list(group_cols))
        self.key = self.keys[0] if len(self.keys) == 1 else None
        self.group_cols = list(self.keys)
        self.value_col = value_col
        self.n_buckets = n_buckets
        self.capture_changes = capture_changes
        self.view = TxnTable(root)

    def refresh(self, spark: SparkSession, source: TxnTable,
                strategy: str = "incremental") -> int:
        """Bring the partials up to ``source.latest_version()``;
        returns the version now reflected. No empty commits."""
        if strategy not in ("incremental", "rebuild"):
            raise ValueError(f"unknown strategy: {strategy!r}")
        sv = source.latest_version()
        if sv is None:
            raise ValueError(f"source has no commits: {source.path}")
        last = (_last_meta_with(self.view, "mv_source_version")
                .get("mv_source_version", -1)
                if self.view.latest_version() is not None else -1)
        if sv <= last:
            return last
        meta = {"operation": "agg_mv_refresh", "mv_source_version": sv}
        if last < 0 or strategy == "rebuild":
            self._rebuild_from(spark, source, sv, meta)
            return sv
        try:
            ch = source.read_changes(spark, since_version=last, upto=sv)
        except ValueError:
            self._rebuild_from(spark, source, sv,
                               {**meta, "mv_resync": True})
            return sv
        self.apply_change_batch(spark, ch, meta)
        return sv

    def apply_change_batch(self, spark: SparkSession, ch: DataFrame,
                           meta: dict, guard=None) -> list[int]:
        """Apply one batch of source change rows; returns the affected
        bucket ids. ``guard`` wraps the single commit for streaming
        replay protection (same contract as the join MV's legs)."""
        run = guard if guard is not None else (lambda table, fn: fn())
        delta = agg_delta_from_changes(ch.drop("__kb"),
                                       self.group_cols, self.value_col)
        changed = delta.filter((F.col("d_count") != 0)
                               | (F.col("d_sum") != 0))
        affected = sorted(
            r["__kb"] for r in
            changed.select(self._bucket().alias("__kb"))
            .distinct().collect())  # bounded: <= n_buckets ints
        if not affected:
            return affected
        gc = self.group_cols

        def _leg():
            from functools import reduce

            if self.view.latest_version() is None:
                # first batch ever (streaming path): empty partials —
                # built from scratch, NOT derived from `changed` (a
                # limit(0) of it would make the join below an
                # ambiguous self-join)
                from pyspark.sql.types import StructField, StructType

                sch = StructType(
                    [changed.schema[c] for c in gc]
                    + [StructField("cnt",
                                   changed.schema["d_count"].dataType),
                       StructField("sm",
                                   changed.schema["d_sum"].dataType)])
                old = spark.createDataFrame([], sch)
            else:
                old = (self._read_buckets(spark, self.view, affected)
                       .drop("__kb"))
            o, d = old.alias("o"), changed.alias("d")
            cond = reduce(lambda a, b: a & b,
                          [o[c].eqNullSafe(d[c]) for c in gc])
            new = (o.join(d, cond, "full_outer")
                   .select(*[F.coalesce(o[c], d[c]).alias(c)
                             for c in gc],
                           (F.coalesce(o["cnt"], F.lit(0))
                            + F.coalesce(d["d_count"], F.lit(0)))
                           .alias("cnt"),
                           (F.coalesce(o["sm"], F.lit(0))
                            + F.coalesce(d["d_sum"], F.lit(0)))
                           .alias("sm"))
                   .filter(F.col("cnt") != 0)
                   .withColumn("__kb", self._bucket()))
            self._replace_buckets(self.view, new, affected, meta)

        run(self.view, _leg)
        return affected

    def initialize_empty(self, spark: SparkSession, source: TxnTable,
                         meta: dict | None = None) -> None:
        """Materialize ZERO partials (schema only, one 0-row data
        file) for a view whose source feed has not delivered any rows
        yet — so a downstream LEFT join can build against it instead
        of waiting forever (the reference's ``final`` keeps employee
        rows with NULL aggregates when no activities exist,
        read_delta.py:280-294). Deliberately records NO
        ``mv_source_version``: nothing from the feed is considered
        absorbed, so a later batch refresh folds the entire feed and
        the streaming ledger guards its own commits. No-op if the
        view already has a commit."""
        if self.view.latest_version() is not None:
            return
        src = source.read(spark).limit(0)
        empty = (_partials(src.drop("__kb"), self.group_cols,
                           self.value_col)
                 .withColumn("__kb", self._bucket())
                 .repartition(1))  # one 0-row file carries the schema
        rel = self.view._write_data(empty)  # noqa: SLF001
        self.view.commit([rel], [],
                         {**(meta or {}),
                          "operation": "agg_mv_init_empty"},
                         expected_version=None)

    def _rebuild_from(self, spark, source: TxnTable, sv: int,
                      meta: dict) -> None:
        df = (_partials(source.read(spark, version=sv).drop("__kb"),
                        self.group_cols, self.value_col)
              .withColumn("__kb", self._bucket()))
        base = self.view.latest_version()
        adds, m = self._bucketed_or_empty(self.view, df, meta)
        removes = (self.view.snapshot_dirs(base)
                   if base is not None else [])
        self.view.commit(adds, removes, m, expected_version=base)

    def read(self, spark: SparkSession,
             version: int | None = None) -> DataFrame:
        """Partials + derived mean, __kb stripped. ``version`` pins the
        read at a specific view commit (serve-snapshot discipline)."""
        v = self.view.read(spark, version=version).drop("__kb")
        return v.withColumn("mean", F.col("sm") / F.col("cnt"))
