"""Plan-quality regression tests: the physical plans the scale design
depends on (ARCHITECTURE.md / PLANS.md) must not silently regress.
A wrong-but-correct plan is a perf bug at 100 TB — pin it like a result."""

from __future__ import annotations

import contextlib
import io as _io

from sport_advantages_moderne_data_infrastructure_spark.plans import catalog

catalog._load_all()


def _plan(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushes_filter(spark, sf_dir):
    plan = _plan(catalog.REGISTRY["pricing_summary"].spark_fn(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" \
        in plan, plan


def test_dim_joins_broadcast_not_sortmerge(spark, sf_dir):
    for q in ("final_table", "revenue_by_nation", "inner_join_dims"):
        plan = _plan(catalog.REGISTRY[q].spark_fn(spark, sf_dir))
        assert "SortMergeJoin" not in plan, f"{q} fell back to SMJ"
        assert "BroadcastHashJoin" in plan, f"{q} lost its broadcast joins"


def test_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(catalog.REGISTRY["top_orders_by_revenue"]
                 .spark_fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_cdc_parse_is_exchange_free(spark, sf_dir):
    """The parse itself must stay shuffle-free: no hash or range
    partitioning anywhere in the plan. The ONE allowed Exchange is the
    batch twin's guarded ROUND-ROBIN input spread (r14: a single-split
    parquet source would run the whole parse on one core; a partitioned
    production input passes through untouched) — a deliberate input-skew
    fix below the parse, not a shuffle the parse demands."""
    import re

    plan = _plan(catalog.REGISTRY["cdc_parse_project"].spark_fn(spark, sf_dir))
    assert "hashpartitioning" not in plan, "stateless parse must not shuffle"
    assert "rangepartitioning" not in plan, "stateless parse must not shuffle"
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
    assert len(exchanges) <= 1, (
        "at most the round-robin input spread: " + plan)
    if exchanges:
        assert "RoundRobinPartitioning" in plan, plan


def test_simhash_pairs_is_hash_join_not_nested_loop(spark, sf_dir):
    # pigeonhole banding must keep the pair generation an equi (hash/SMJ)
    # join; a BroadcastNestedLoopJoin means the all-pairs theta join is back
    plan = _plan(catalog.REGISTRY["dedup_simhash_pairs"].spark_fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan


# all-pairs is allowed ONLY where it is the documented exhaustive-rerank
# baseline (broadcast query set × corpus scan); embedding_near_dup left
# this list in r3 when it became pytest-only (driver=False) — its
# driver-facing twin is the bucketed embedding_dedup_lsh.
# ann_recall_report / ann_ivf_recall necessarily CONTAIN the brute
# baseline: they measure the approximate paths against exhaustive truth,
# so the crossJoin side is the point, not a regression (the LSH/IVF
# sides stay equi-joins).
_NESTED_LOOP_ALLOWED = {"ann_cosine_topk", "ann_recall_report",
                        "ann_ivf_recall", "ann_ivf_recall_floor",
                        "ann_lsh_recall_floor",  # aggregates
                        # ann_recall_report (contains the brute baseline)
                        # SQ8 is the exhaustive rerank over int8 codes —
                        # the broadcast-query all-pairs is its documented
                        # shape (4x less bandwidth is the win, not fewer
                        # pairs); its floor row contains the brute truth
                        "ann_sq8_topk", "ann_sq8_recall_floor",
                        # PQ/ADC exhaustive pass: broadcast-query
                        # all-pairs over 16x-compressed codes is its
                        # documented shape (bandwidth is the win); the
                        # floor row contains the brute baseline. The
                        # composed ann_ivfpq_topk is NOT allowed here —
                        # its probe join must stay an equi-join.
                        "ann_pq_topk", "ann_pq_recall_floor",
                        # r8: both CONTAIN the brute baseline by design
                        # — the refine floor measures refined AND ADC
                        # against exhaustive truth; the hybrid row fuses
                        # the exactly-oracled brute cosine leg. The
                        # refined query itself (ann_ivfpq_refined_topk)
                        # is NOT allowed here: its ADC leg is an
                        # equi-join and its exact leg a broadcast HASH
                        # join on doc id — never all-pairs.
                        "ann_refine_recall_floor", "hybrid_search_rrf",
                        # r11: filtered SQ8 is the same documented
                        # exhaustive-rerank shape over the predicate's
                        # survivors; its floor sibling and the chunk
                        # hybrid row both CONTAIN the brute cosine
                        # baseline leg. The filtered IVF-PQ query path
                        # (filtered_ivfpq_topk) is NOT allowed here —
                        # probe/refine stay equi-joins.
                        "ann_filtered_topk", "ann_filtered_recall_floor",
                        # r11 (late): the maintained-artifact twin
                        # CONTAINS the same documented brute cosine leg
                        # — exact by design, run over the maintained
                        # inverted lists' raw vectors; its text leg and
                        # fusion stay equi-joins like the batch row's
                        "hybrid_chunk_search", "stream_hybrid_chunk_equiv"}


# non-driver entries whose all-pairs shape is the documented point:
# embedding_near_dup is the pytest-only brute rerank baseline (r3)
_NESTED_LOOP_ALLOWED_FULL = _NESTED_LOOP_ALLOWED | {"embedding_near_dup"}


def test_no_registry_query_regresses_to_nested_loop(spark, sf_dir):
    """Sweeping anti-pattern net over the FULL registry (driver-facing
    and demoted alike): no query may plan a BroadcastNestedLoopJoin or
    CartesianProduct unless it IS a documented all-pairs baseline — this
    is the regression that silently turns an equi-join shape quadratic
    (the r1 SimHash defect, generalized)."""
    catalog.build_indexes(spark, sf_dir)
    offenders = []
    for name, q in catalog.REGISTRY.items():
        if name in _NESTED_LOOP_ALLOWED_FULL:
            continue
        plan = _plan(q.spark_fn(spark, sf_dir))
        if "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == [], f"nested-loop plans: {offenders}"


def test_contamination_eval_side_broadcasts(spark, sf_dir):
    # the eval/benchmark shingle set is tiny by construction — the train
    # scan must stay map-side (broadcast), never shuffle train shingles
    plan = _plan(catalog.REGISTRY["contamination_check"].spark_fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_training_pipeline_is_two_window_shuffles(spark, sf_dir):
    # quality→dedup→split→pack composes as ONE plan: the dedup window
    # (md5 partition) and the pack window (split, shard) are the only
    # required wide dependencies besides the final presentation sort
    import re
    plan = _plan(catalog.REGISTRY["training_pipeline_e2e"].spark_fn(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2, plan


def test_no_row_at_a_time_python_udfs_in_source():
    """The engine's contract (ARCHITECTURE.md, SURVEY §2.10): zero
    row-at-a-time Python UDFs anywhere — Python appears only as
    Arrow-batched stages (mapInPandas/applyInPandas, and since r6 scalar
    pandas_udf where the batch is query-side-small: operators/pq.py's
    codebook LUT, which replaced a per-invocation 1024-literal
    expression compile — PLANS.md §IVF-PQ fixed vs marginal)."""
    import pathlib

    root = (pathlib.Path(__file__).resolve().parent.parent
            / "sport_advantages_moderne_data_infrastructure_spark")
    offenders = []
    for p in root.rglob("*.py"):
        src = p.read_text()
        if "F.udf(" in src or "@udf(" in src or "\n@udf" in src:
            offenders.append(str(p))
    assert offenders == [], offenders
    # pandas_udf (Arrow-batched) is allowed but must stay rare and
    # deliberate: pin the exact usage sites so a new one is a conscious
    # decision in this test, not a drive-by
    pandas_sites = sorted(
        str(p.relative_to(root)) for p in root.rglob("*.py")
        if "pandas_udf" in p.read_text())
    assert pandas_sites == ["operators/pq.py"], pandas_sites


def test_ivf_assignment_has_no_window_shuffle(spark, sf_dir):
    # centroid assignment must be an argmin projection over the broadcast
    # centroid array — a Window on vec_id would shuffle N×k distance rows.
    # Only the final per-query top-k Window node may remain (its
    # WindowGroupLimit companions are the rank pushdown, not extra windows).
    import re
    plan = _plan(catalog.REGISTRY["ann_ivf_topk"].spark_fn(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Window\b", plan)) <= 1, plan


def test_interval_join_is_equi_join_not_nested_loop(spark, sf_dir):
    # the bucketed reduction must keep the containment join an equi join;
    # BroadcastNestedLoopJoin means the raw theta join came back
    plan = _plan(catalog.REGISTRY["interval_join_events"]
                 .spark_fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Cartesian" not in plan, plan
    assert ("BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan
            or "SortMergeJoin" in plan), plan


def test_dedup_chunks_chunking_is_exchange_free_prefix(spark, sf_dir):
    # the chunk projection (split + transform/slice + md5) must stay a
    # pure map: the first Exchange in the plan may only be the
    # chunk-hash aggregation, never a repartition of document text
    plan = _plan(catalog.REGISTRY["dedup_chunks"].spark_fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # text column never crosses an exchange: every Exchange argument list
    # carries only hashes/ids/counts
    for line in plan.splitlines():
        if line.strip().startswith("Arguments: hashpartitioning"):
            assert "text" not in line, line


def test_semantic_dedup_pair_join_is_equi_join(spark, sf_dir):
    # cluster blocking must keep pair generation an equi join on
    # centroid_id; a nested loop means all-pairs came back
    plan = _plan(catalog.REGISTRY["semantic_dedup_prune"]
                 .spark_fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan
            or "SortMergeJoin" in plan), plan


def test_gapfill_two_hash_exchanges_no_nested_loop(spark, sf_dir):
    """timeseries_gapfill: hourly-agg exchange + ONE grid-side exchange
    (the window's user_id distribution pushed below the broadcast
    join) — a third hash exchange or a nested-loop join means the
    grid/window composition regressed."""
    import re
    plan = _plan(catalog.REGISTRY["timeseries_gapfill"]
                 .spark_fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    n_hash = len(re.findall(r"Arguments: hashpartitioning", plan))
    assert n_hash <= 2, plan
    # and no global range sort: the trailing presentation orderBy was
    # dropped (r6 verdict) -- rangepartitioning reappearing means a
    # full-grid sort crept back
    assert "rangepartitioning" not in plan, plan
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1, plan


def test_training_order_one_corpus_shuffle(spark, sf_dir):
    """training_order_shuffle: the corpus shuffles ONCE (on the hash
    bucket); the only single-partition exchange is the 256-row offset
    table; no global range sort of the corpus, no nested loop."""
    import re
    plan = _plan(catalog.REGISTRY["training_order_shuffle"]
                 .spark_fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert len(re.findall(r"Arguments: hashpartitioning", plan)) == 2, plan
    assert len(re.findall(r"Arguments: SinglePartition", plan)) == 1, plan
    assert "rangepartitioning" not in plan, plan


def test_training_shards_one_corpus_shuffle(spark, sf_dir):
    """training_shard_assignments: same shape as the shuffle — one
    corpus exchange, the single-partition exchange only for the 256-row
    count table (its two tiny windows share it), no global range sort."""
    import re
    plan = _plan(catalog.REGISTRY["training_shard_assignments"]
                 .spark_fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert len(re.findall(r"Arguments: hashpartitioning", plan)) == 2, plan
    assert len(re.findall(r"Arguments: SinglePartition", plan)) == 1, plan
    assert "rangepartitioning" not in plan, plan


def test_repeated_spans_bucketed_plan(spark, sf_dir):
    """dedup_repeated_spans: duplicated-window marking must stay
    keyed on the window hash — since r14 a count window over
    (h1, h2) (ONE shuffle of the position table) plus the islands
    window, never a join of the position table against itself (two
    full-volume shuffles) and never a nested loop (all-pairs span
    comparison); a range partition means someone added a presentation
    sort of the full position set."""
    import re
    plan = _plan(catalog.REGISTRY["dedup_repeated_spans"]
                 .spark_fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "rangepartitioning" not in plan, plan
    n_hash = len(re.findall(r"Arguments: hashpartitioning", plan))
    assert 1 <= n_hash <= 3, plan
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2, plan


def test_span_scrub_no_presentation_sort(spark, sf_dir):
    """dedup_span_scrub (both policies): the trailing corpus-sized
    orderBy was dropped (r8 verdict) — rangepartitioning reappearing
    means a full-corpus sort crept back; and the marking join must
    stay an equi join (no nested loop)."""
    for name in ("dedup_span_scrub", "dedup_span_scrub_keep_one"):
        plan = _plan(catalog.REGISTRY[name].spark_fn(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)
        assert "rangepartitioning" not in plan, (name, plan)


def test_bigram_surprisal_no_presentation_sort(spark, sf_dir):
    """bigram_surprisal_score: trailing orderBy dropped (r8 verdict) —
    no rangepartitioning; pair counting stays equi-join shaped."""
    plan = _plan(catalog.REGISTRY["bigram_surprisal_score"]
                 .spark_fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_unigram_no_eager_action_no_presentation_sort(
        spark, sf_dir, monkeypatch):
    """unigram_surprisal_score: the grand token total must come from a
    rollup of the vocab partials INSIDE the one query — not an eager
    t.count() action at plan-build time, which was a whole extra
    tokenize scan of the corpus as its own job (r7 verdict #5). Also
    no trailing corpus-sized orderBy (rangepartitioning)."""
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("eager .count() during plan build")

    monkeypatch.setattr(DataFrame, "count", boom)
    df = catalog.REGISTRY["unigram_surprisal_score"].spark_fn(spark,
                                                              sf_dir)
    monkeypatch.undo()
    plan = _plan(df)
    assert "rangepartitioning" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert df.count() > 0


# r8 verdict #3 sweep: corpus-proportional-output queries must not end
# in a global sort — the driver compare and every downstream consumer
# are order-insensitive, and a trailing orderBy is a whole
# rangepartitioning exchange of the result at scale. Small-output
# queries (top-k rows, O(groups) rollups) may keep their presentation
# sort — sorting 10-100 rows is free.
_NO_PRESENTATION_SORT = [
    "dedup_exact", "dedup_chunks", "dedup_jaccard_pairs",
    "dedup_minhash_lsh", "dedup_lsh_verified",
    "dedup_clusters_large_star", "stream_dedup_batch_twin",
    "dedup_span_scrub", "dedup_span_scrub_keep_one",
    "dedup_repeated_spans", "bigram_surprisal_score",
    "unigram_surprisal_score", "mixture_token_budget",
    "training_order_shuffle", "training_shard_assignments",
    "training_pipeline_e2e",
    "multimodal_frame_sample", "multimodal_png_decode",
    "pii_redaction", "semantic_dedup_prune",
    "txn_clone_readback", "txn_dv_delete_read", "txn_zorder_read",
    "txn_schema_evolution",
    "scd2_employee_sport_dim", "session_windows_batch",
    "events_hourly", "funnel_click_purchase",
    "asof_bucketed_last_signup", "interval_join_events",
    "stream_quarantine_batch_twin", "timeseries_gapfill",
    "final_table", "prime_query", "cdc_parse_project",
    "final_pipeline_incremental",
    # r8 additions with corpus-proportional outputs
    "scd2_point_in_time_join", "leakage_safe_splits",
]


def test_no_presentation_sort_on_corpus_sized_outputs(spark, sf_dir):
    catalog.build_indexes(spark, sf_dir)
    offenders = []
    for name in _NO_PRESENTATION_SORT:
        plan = _plan(catalog.REGISTRY[name].spark_fn(spark, sf_dir))
        if "rangepartitioning" in plan:
            offenders.append(name)
    assert offenders == [], f"global sorts crept back: {offenders}"


def test_pricing_rollup_one_scan_one_expand(spark, sf_dir):
    """ROLLUP must plan ONE pushed-filter scan + ONE Expand + a
    partial/final hash aggregate — never one scan per grouping set;
    the map-side partial agg absorbs the Expand's 3x row blow-up
    before the exchange."""
    plan = _plan(catalog.REGISTRY["pricing_rollup"].spark_fn(
        spark, sf_dir))
    nodes = plan.split("\n\n")[0]  # the numbered node tree
    assert nodes.count("Scan parquet") == 1, nodes
    assert nodes.count("Expand") == 1, nodes
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" \
        in plan, plan


def test_pivot_one_scan_no_discovery(spark, sf_dir):
    """PIVOT with explicit values (r9) must be ONE pushed-filter scan
    + hash aggregate of conditional sums — no Expand, and (job-count
    pinned) NO values-discovery collect before the plan exists, which
    is what pivot(col) without values would run over the fact table."""
    from sport_advantages_moderne_data_infrastructure_spark.sources.tables import (  # noqa: E501
        load_table,
    )

    sc = spark.sparkContext

    def njobs(tag, fn):
        sc.setJobGroup(tag, "plan-construction job count")
        try:
            out = fn()
        finally:
            sc.setJobGroup(None, None)
        return out, len(sc.statusTracker().getJobIdsForGroup(tag))

    # load_table itself costs one schema/footer job per call; the
    # pivot must add ZERO on top (explicit values = no discovery scan)
    _, base = njobs("pivotbase", lambda: load_table(spark, sf_dir,
                                                    "orders"))
    df, full = njobs("pivotfull",
                     lambda: catalog.REGISTRY["orders_pivot"]
                     .spark_fn(spark, sf_dir))
    assert full == base, (base, full)
    plan = _plan(df)
    nodes = plan.split("\n\n")[0]
    assert nodes.count("Scan parquet") == 1, nodes
    assert "Expand" not in nodes, nodes
    assert "HashAggregate" in nodes, nodes
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual" \
        in plan, plan


def test_grouping_sets_one_scan_one_expand(spark, sf_dir):
    """The arbitrary-GROUPING-SETS row (r9) holds the same plan
    contract as ROLLUP: one pushed-filter scan + one Expand +
    partial/final hash aggregate."""
    plan = _plan(catalog.REGISTRY["orders_grouping_sets"].spark_fn(
        spark, sf_dir))
    nodes = plan.split("\n\n")[0]
    assert nodes.count("Scan parquet") == 1, nodes
    assert nodes.count("Expand") == 1, nodes
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual" \
        in plan, plan


def test_filtered_ann_pred_lands_before_scoring(spark, sf_dir):
    """r11 (VERDICT r10 #1): metadata-filtered ANN must apply its
    predicate BEFORE scoring — never retrieve-then-refill. Pinned at
    the strongest point available: the predicate is in the parquet
    scan's PushedFilters, i.e. it executes AT THE SCAN that feeds
    scoring, below every join and window by construction.

    (a) full-hash SQ8 row: the lang filter pushes into the documents
    scan; (b) broad-regime IVF-PQ: the label filter pushes into the
    inverted-list index scan itself (the meta_cols layout)."""
    from sport_advantages_moderne_data_infrastructure_spark.plans import (
        simops,
    )

    plan = _plan(catalog.REGISTRY["ann_filtered_topk"].spark_fn(
        spark, sf_dir))
    assert "EqualTo(lang,en)" in plan and "PushedFilters" in plan, plan
    import re

    nodes = plan.split("\n\n")[0]
    # exactly one ranking Window (WindowGroupLimit helper nodes — the
    # pushed-down top-k limit — don't count)
    assert len(re.findall(r"Window \(\d+\)", nodes)) == 1, nodes

    # broad regime (n_match passed so no planning-time count job)
    plan = _plan(simops.filtered_ivfpq_topk(spark, sf_dir,
                                            n_match=10**9))
    assert "LessThan(label,7)" in plan, plan
    # the label predicate appears ONLY at/below the scan (PushedFilters
    # + the residual Filter Spark keeps above it) — a retrieve-then-
    # refill plan would instead carry a label Filter ABOVE the ranking
    # Window. Formatted plans number leaves lowest (Scan = 1) and the
    # root highest, so every Filter detail block mentioning label must
    # carry a LOWER node id than every Window node.
    win_ids = [int(m) for m in re.findall(r"Window \((\d+)\)", plan)]
    assert win_ids, plan  # sanity: the ranking window exists
    label_filters = []
    for block in plan.split("\n\n"):
        m = re.match(r"\((\d+)\) Filter", block.strip())
        if m and "label" in block:
            label_filters.append(int(m.group(1)))
    assert label_filters, plan  # sanity: the residual filter exists
    assert max(label_filters) < min(win_ids), (label_filters, win_ids)


def test_cube_one_scan_one_expand(spark, sf_dir):
    """CUBE (r11, VERDICT r10 #5) holds the same plan contract as its
    ROLLUP/GROUPING SETS siblings: one pushed-filter scan + ONE Expand
    (4x — all 2^2 grouping sets) + partial/final hash aggregate, never
    a scan per marginal level."""
    plan = _plan(catalog.REGISTRY["orders_cube"].spark_fn(
        spark, sf_dir))
    nodes = plan.split("\n\n")[0]
    assert nodes.count("Scan parquet") == 1, nodes
    assert nodes.count("Expand") == 1, nodes
    assert "PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual" \
        in plan, plan


def test_prime_sql_collapses_to_dataframe_shape(spark, sf_dir):
    """r10 (VERDICT r9 #3): the reference's verbatim flagship SQL
    (prime_query_sql, a CTE self-join over the `final` view) must
    reach the DataFrame twin's collapsed cost shape — the corpus-scale
    work (activity scan, its ONE shuffle, the aggregate) planned
    exactly once (the duplicated prime branch prunes its left join to
    the aggregate via group-key uniqueness), and the CTE self-join
    itself a broadcast hash join adding NO shuffle exchange."""
    import re

    p_df = _plan(catalog.REGISTRY["prime_query"].spark_fn(
        spark, sf_dir))
    p_sql = _plan(catalog.REGISTRY["prime_query_sql"].spark_fn(
        spark, sf_dir))

    def shuffles(p):  # Exchange nodes that are not broadcast/reused
        return len(re.findall(r"\bExchange\b", p))

    def aggs(p):
        return len(re.findall(r"\bHashAggregate\b", p))

    assert shuffles(p_df) > 0  # sanity: the regex matches real nodes
    assert shuffles(p_sql) == shuffles(p_df), (p_sql, p_df)
    assert aggs(p_sql) == aggs(p_df)  # activity agg planned ONCE
    assert "SortMergeJoin" not in p_sql  # self-join broadcasts
    assert "BroadcastHashJoin" in p_sql
