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
    plan = _plan(catalog.REGISTRY["cdc_parse_project"].spark_fn(spark, sf_dir))
    assert "Exchange" not in plan, "stateless parse must not shuffle"


def test_simhash_pairs_is_hash_join_not_nested_loop(spark, sf_dir):
    # pigeonhole banding must keep the pair generation an equi (hash/SMJ)
    # join; a BroadcastNestedLoopJoin means the all-pairs theta join is back
    plan = _plan(catalog.REGISTRY["dedup_simhash_pairs"].spark_fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan


def test_ivf_assignment_has_no_window_shuffle(spark, sf_dir):
    # centroid assignment must be an argmin projection over the broadcast
    # centroid array — a Window on vec_id would shuffle N×k distance rows.
    # Only the final per-query top-k Window node may remain (its
    # WindowGroupLimit companions are the rank pushdown, not extra windows).
    import re
    plan = _plan(catalog.REGISTRY["ann_ivf_topk"].spark_fn(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Window\b", plan)) <= 1, plan
