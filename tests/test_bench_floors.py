"""bench.py floor plumbing: the FLOORS config must stay in sync with the
metric keys bench.py emits, so a floor can never silently stop being
checked (VERDICT r4 #1)."""

from __future__ import annotations


def test_floor_keys_cover_streaming_metrics():
    import bench

    assert set(bench.FLOORS) == {
        "stream_rows_per_sec", "txn_sink_rows_per_sec",
        "txn_fb_sink_rows_per_sec", "txn_feed_rows_per_sec",
        "stream_dedup_docs_per_sec", "jdbc_upsert_rows_per_sec",
        "jdbc_full_frame_rows_per_sec",
        "final_pipeline_rows_per_sec"}  # r9: the single-stream DAG
    assert all(v > 0 for v in bench.FLOORS.values())


def test_query_budgets_cover_core_set():
    """Every core query has a per-query wall-clock budget (VERDICT r5 #3)
    — the tripwire can't silently lose coverage when the core set or the
    budgets change independently. Since r6 the budgets also cover the
    r5-added queries, so the budgeted set is a superset of core but must
    stay within the benched registry (checked below)."""
    import bench

    assert set(bench.CORE_QUERIES) <= set(bench.QUERY_BUDGETS)
    assert all(0 < b < 30 for b in bench.QUERY_BUDGETS.values())
    # the six r5 additions are budgeted as of r6
    assert {"ann_pq_topk", "ann_ivfpq_topk", "dedup_chunks",
            "mixture_token_budget", "scd2_employee_sport_dim",
            "interval_join_events"} <= set(bench.QUERY_BUDGETS)


def test_core_query_set_is_frozen_r4_set():
    import bench

    # the r4 headline set, verbatim — this test is the tripwire against
    # accidental core drift; per-round additions go to added_queries
    assert len(bench.CORE_QUERIES) == 19
    assert "ann_sq8_topk" in bench.CORE_QUERIES
    assert "prime_query" in bench.CORE_QUERIES


def test_core_queries_still_registered():
    from sport_advantages_moderne_data_infrastructure_spark.plans import (
        catalog,
    )

    import bench

    bench_names = set(catalog.bench_queries())
    assert bench.CORE_QUERIES <= bench_names
    # every budgeted query must actually be benched, or its budget row
    # reports value=None forever without anyone noticing
    assert set(bench.QUERY_BUDGETS) <= bench_names
