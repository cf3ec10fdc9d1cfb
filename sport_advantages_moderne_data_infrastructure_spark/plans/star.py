"""Generic relational operator coverage over the driver's star schema —
aggregations, multi-way joins, top-k, windows, semi/anti joins, set ops,
rollup. These exercise the same operator classes as SURVEY §2 (A1-A3,
J1-J4, O1-O3, P-series) at fact-table scale, and double as the bench
headline set (bench.py).

Scale notes per query in the docstrings; the common rules:
- dims (region/nation/customer/supplier/part) are broadcast — never shuffle
  the fact for a dim join;
- aggregations are authored pre-join where semantics allow;
- top-k always goes through ORDER BY + LIMIT (TakeOrderedAndProject — heap
  per partition + driver merge of k rows, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import register

# ``driver=False`` entries below: operator shapes already driver-checked by a
# kept twin (see catalog.py docstring); each remains DuckDB-verified in
# tests/test_oracle_parity.py. Demoted so the driver's 50-entry correctness
# window covers the round-1-unchecked streaming/ANN/text queries instead
# (VERDICT.md "Next round" #1).

@register(
    "pricing_rollup",  # new r8, gated immediately (slot:
    # pricing_summary demoted — green r5-r7; this row STRICTLY EMBEDS
    # it: the finest grouping set of the ROLLUP is pricing_summary's
    # exact answer, the demoted row keeps running in every bench pass
    # (bench=True), and it stays DuckDB-verified per pytest run).
    # DEMOTED 2026-08-16 (r11, green r8-r10): slot goes to
    # eval_contamination (plans/textops.py) — the ONE-Expand
    # multi-level-aggregate shape survives STRICTLY HARDER in the
    # still-gated orders_cube (CUBE's 4x Expand is a superset of
    # ROLLUP's over the same partial-agg absorption, plan-pinned) and
    # orders_pivot/orders_unpivot_roundtrip keep the reshaping class;
    # this row stays DuckDB-verified per pytest run and
    # pricing_summary stays benched.
    driver=False,
    # Completes the multi-level-aggregate surface (GROUPING SETS /
    # ROLLUP / CUBE): Spark plans ONE Expand + one hash aggregate — at
    # 100 TB the fact scans ONCE for all three levels instead of once
    # per level, and the exchange still carries only (grouping sets x
    # tiny group cardinality) rows. grouping_id disambiguates NULL-
    # filled rollup levels; both engines use the same first-arg-is-
    # most-significant bitmask convention.
    oracle=(
        "SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS INT) "
        "AS gid, l_returnflag, l_linestatus, "
        "SUM(l_quantity) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
        "ROUND(AVG(l_discount), 4) AS avg_disc, "
        "CAST(COUNT(*) AS BIGINT) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP "
        "'1998-09-02 00:00:00' "
        "GROUP BY ROLLUP (l_returnflag, l_linestatus) "
        "ORDER BY gid, l_returnflag, l_linestatus"))
def q_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 generalized to GROUP BY ROLLUP (returnflag,
    linestatus): per-(flag, status) rows PLUS per-flag subtotals PLUS
    the grand total, one Expand + one hash aggregate — the OLAP
    subtotal surface (ROLLUP/CUBE/GROUPING SETS) with a full hash
    oracle. The finest level is exactly pricing_summary's answer, so
    this row strictly embeds the one it replaced in the window."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate")
                  <= F.lit("1998-09-02").cast("timestamp"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select("gid", "l_returnflag", "l_linestatus", "sum_qty",
                "sum_base_price", "avg_disc", "count_order")
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


@register(
    "orders_grouping_sets",  # new r9, gated immediately (slot:
    # session_windows_batch demoted — green r2-r8; the event-time
    # windowing surface (T5) stays gated via interval_join_events,
    # stream_quarantine_batch_twin and the SCD2 rows, and
    # sessionization keeps running in every bench pass (bench=True)
    # and stays DuckDB-verified per pytest run).
    # Demoted r11 after green r9-r10: STRICTLY EMBEDDED in orders_cube
    # (same filter, same aggregates, and CUBE's four grouping sets are
    # a strict superset of this row's three — every output row of this
    # query appears verbatim in orders_cube's at gid 0/1/2), keeps
    # running in every bench pass (bench=True), stays DuckDB-verified
    # per pytest run; slot goes to orders_cube (VERDICT r10 #5).
    driver=False,
    # The GENERAL multi-level-aggregate surface (VERDICT r8 #7):
    # pricing_rollup covers the hierarchical ROLLUP case; this row
    # exercises an EXPLICIT NON-HIERARCHICAL grouping-sets list —
    # ((status, priority), (status), (priority)): neither single-col
    # set is a prefix of the other, and there is deliberately NO grand
    # total, so neither ROLLUP nor CUBE can express it. Same plan
    # contract as ROLLUP, pinned: ONE pushed-filter scan + ONE Expand
    # (3x) + partial/final hash aggregate — never a scan per grouping
    # set. Both engines share the first-arg-most-significant
    # grouping_id bitmask convention: gid 0 = finest, 1 = priority
    # aggregated away, 2 = status aggregated away.
    oracle=(
        "SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) "
        "AS gid, o_orderstatus, o_orderpriority, "
        "ROUND(SUM(o_totalprice), 2) AS sum_price, "
        "ROUND(AVG(o_totalprice), 4) AS avg_price, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders "
        "FROM orders WHERE o_orderdate >= TIMESTAMP "
        "'1995-01-01 00:00:00' "
        "GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), "
        "(o_orderstatus), (o_orderpriority)) "
        "ORDER BY gid, o_orderstatus, o_orderpriority"),
    bench=True)
def q_orders_grouping_sets(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Order-value report at three independent granularities in ONE
    plan — per (status, priority), per status, per priority — via
    DataFrame.groupingSets (the arbitrary GROUPING SETS surface; the
    grouping-set union that ROLLUP/CUBE cannot express). One scan +
    one Expand + partial/final hash agg: the map-side partial absorbs
    the 3x Expand blow-up before the exchange, so the exchange still
    carries ~group-cardinality rows at any fact size."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate")
                 >= F.lit("1995-01-01").cast("timestamp"))
        .groupingSets(
            [["o_orderstatus", "o_orderpriority"],
             ["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("gid", "o_orderstatus", "o_orderpriority",
                "sum_price", "avg_price", "n_orders")
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


@register(
    "orders_cube",  # new r11, gated immediately (slot:
    # orders_grouping_sets demoted — green r9-r10 and STRICTLY
    # EMBEDDED here: CUBE(status, priority) plans the four grouping
    # sets {(s,p), (s), (p), ()} — a strict superset of the demoted
    # row's explicit three — with the same filter and aggregates, so
    # every row of the demoted query appears verbatim at gid 0/1/2;
    # the demoted row keeps running in every bench pass (bench=True)
    # and stays DuckDB-verified per pytest run).
    # CUBE completes the multi-level-aggregate surface (ROLLUP r8,
    # GROUPING SETS r9, PIVOT/UNPIVOT r9 — VERDICT r10 #5): all 2^k
    # marginal totals of a k-key report in ONE plan. Same pinned
    # contract as its siblings: ONE pushed-filter scan + ONE Expand
    # (4x) + partial/final hash aggregate — the map-side partial
    # absorbs the Expand blow-up before the exchange, so at 100 TB the
    # fact scans once for all four levels and the exchange still
    # carries only (4 x tiny group cardinality) rows. grouping_id
    # disambiguates NULL-filled margin levels; both engines share the
    # first-arg-is-most-significant bitmask convention (gid 3 = grand
    # total).
    oracle=(
        "SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) "
        "AS gid, o_orderstatus, o_orderpriority, "
        "ROUND(SUM(o_totalprice), 2) AS sum_price, "
        "ROUND(AVG(o_totalprice), 4) AS avg_price, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders "
        "FROM orders WHERE o_orderdate >= TIMESTAMP "
        "'1995-01-01 00:00:00' "
        "GROUP BY CUBE (o_orderstatus, o_orderpriority) "
        "ORDER BY gid, o_orderstatus, o_orderpriority"),
    bench=True)
def q_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value report at ALL four granularities of (status,
    priority) in ONE plan — per pair, per status, per priority, and
    the grand total — via DataFrame.cube. One scan + one Expand (4x)
    + partial/final hash agg; strictly embeds orders_grouping_sets
    (its three sets are cube's gid 0/1/2) and adds the gid-3 grand
    total that GROUPING SETS deliberately omitted."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate")
                 >= F.lit("1995-01-01").cast("timestamp"))
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("gid", "o_orderstatus", "o_orderpriority",
                "sum_price", "avg_price", "n_orders")
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


@register(
    "orders_pivot",  # new r9, gated immediately (slot:
    # dedup_jaccard_pairs demoted — green r1-r8; the capped
    # inverted-index pair join + exact-Jaccard verify shape is
    # EMBEDDED end-to-end in the gated leakage_safe_splits /
    # stream_splits_e2e rows, the query keeps running in every bench
    # pass via bench=True, and it stays DuckDB-verified per pytest
    # run).
    # PIVOT completes the reshaping surface the multi-level-aggregate
    # rows started (ROLLUP r8, arbitrary GROUPING SETS r9): long->wide
    # with EXPLICIT pivot values — the 100 TB-relevant detail, because
    # pivot(col) WITHOUT values runs a separate values-discovery
    # collect over the fact table before the real plan exists; with
    # values declared the whole query is ONE pushed-filter scan + one
    # partial/final hash aggregate of conditional sums (same plan
    # class as pricing_summary), exchange carrying ~|priorities| rows.
    # The oracle is the portable spelling of the same thing: FILTERed
    # aggregates per pivot value.
    oracle=(
        "SELECT o_orderpriority, "
        "ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), "
        "2) AS status_f, "
        "ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), "
        "2) AS status_o, "
        "ROUND(SUM(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), "
        "2) AS status_p "
        "FROM orders WHERE o_orderdate >= TIMESTAMP "
        "'1995-01-01 00:00:00' "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    bench=True)
def q_orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order value long->wide: one row per priority, one column per
    order status (DataFrame.pivot with EXPLICIT values — never the
    values-discovery scan). Compiles to one pushed-filter scan + one
    hash aggregate of conditional sums; NULL cells mean no orders in
    that (priority, status) pair, exactly like the oracle's FILTER."""
    o = load_table(spark, sf_dir, "orders")
    p = (o.filter(F.col("o_orderdate")
                  >= F.lit("1995-01-01").cast("timestamp"))
         .groupBy("o_orderpriority")
         .pivot("o_orderstatus", ["F", "O", "P"])
         .agg(F.round(F.sum("o_totalprice"), 2)))
    return (p.select("o_orderpriority",
                     F.col("F").alias("status_f"),
                     F.col("O").alias("status_o"),
                     F.col("P").alias("status_p"))
            .orderBy("o_orderpriority"))


@register(
    "orders_unpivot_roundtrip",  # new r9, gated immediately (slot:
    # ann_recall_report demoted — green r3-r8; the approximate-ANN
    # quality contract is ENFORCED by the three gated recall-floor
    # rows, which run the same per-variant recall computation with a
    # hard boolean cut, drift is monitored by tests/test_ann_drift.py,
    # and the report row stays DuckDB-verified per pytest run).
    # UNPIVOT completes the reshape pair: the wide frame orders_pivot
    # builds is melted back to long (DataFrame.unpivot — an Expand,
    # never a per-column scan) and must equal the DIRECT long
    # aggregate — a genuine pivot→unpivot round-trip contract, FULL
    # hash. NULL cells (no orders in a (priority, status) pair) are
    # dropped on the way back, matching the long form's absent groups.
    oracle=(
        "SELECT o_orderpriority, o_orderstatus, "
        "ROUND(SUM(o_totalprice), 2) AS sum_price "
        "FROM orders WHERE o_orderdate >= TIMESTAMP "
        "'1995-01-01 00:00:00' "
        "GROUP BY o_orderpriority, o_orderstatus "
        "ORDER BY o_orderpriority, o_orderstatus"))
def q_orders_unpivot_roundtrip(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """melt(pivot(x)) == x: the wide per-priority frame (one column
    per order status, built exactly like orders_pivot) unpivoted back
    to (priority, status, sum) via DataFrame.unpivot, NULL cells
    dropped — hash-matched against the direct long GROUP BY. One scan
    + hash agg + one Expand for the melt; the status comes back from
    the variable column name's last character."""
    o = load_table(spark, sf_dir, "orders")
    wide = (o.filter(F.col("o_orderdate")
                     >= F.lit("1995-01-01").cast("timestamp"))
            .groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .agg(F.round(F.sum("o_totalprice"), 2))
            .select("o_orderpriority",
                    F.col("F").alias("status_f"),
                    F.col("O").alias("status_o"),
                    F.col("P").alias("status_p")))
    return (wide.unpivot(
        ["o_orderpriority"],
        ["status_f", "status_o", "status_p"],
        "status_col", "sum_price")
        .filter(F.col("sum_price").isNotNull())
        .select("o_orderpriority",
                F.upper(F.substring("status_col", -1, 1))
                .alias("o_orderstatus"), "sum_price")
        .orderBy("o_orderpriority", "o_orderstatus"))


@register(
    "pricing_summary",
    # Demoted r8 after green r5-r7: STRICTLY EMBEDDED in
    # pricing_rollup (its finest grouping set), keeps running in every
    # bench pass (bench=True), stays DuckDB-verified per pytest run;
    # slot goes to pricing_rollup.
    driver=False,
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "SUM(l_quantity) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
        "ROUND(AVG(l_quantity), 4) AS avg_qty, "
        "ROUND(AVG(l_discount), 4) AS avg_disc, "
        "CAST(COUNT(*) AS BIGINT) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"),
    bench=True)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan+agg: the partial/final hash-agg workhorse.
    Group cardinality is tiny (RF×LS) so the exchange carries a handful of
    rows regardless of fact size — the 100 TB-safe shape."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                          * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "revenue_by_nation",
    driver=False,  # rotated out r4 late — triple-green; multi-join agg
    # shape stays gated via final_table/prime_query/pricing_summary;
    # slot went to txn_changes_feed
    oracle=(
        "SELECT n.n_name, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue, "
        "CAST(COUNT(*) AS BIGINT) AS n_items "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "GROUP BY n.n_name ORDER BY revenue DESC, n.n_name"),
    bench=True)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way join. nation/region are broadcast explicitly;
    customer is broadcast at test SF and becomes a shuffle join at 100 TB —
    AQE decides from runtime stats. The only unavoidable shuffle is
    lineitem⋈orders on orderkey (co-partitionable via bucketing on a real
    deployment)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "top_orders_by_revenue",
    driver=False,  # rotated out r3 (green r1+r2; pytest oracle continues)
    oracle=(
        "SELECT l_orderkey, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem GROUP BY l_orderkey "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    bench=True)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k after agg (TakeOrderedAndProject): heap-k per partition, merge
    k×partitions rows on the driver — no global sort at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "mktsegment_stats", driver=False,
    oracle=(
        "SELECT c_mktsegment, CAST(COUNT(DISTINCT c_custkey) AS BIGINT) "
        "AS n_customers, ROUND(AVG(c_acctbal), 4) AS avg_acctbal "
        "FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"))
def q_mktsegment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-agg (expand + two-phase agg in Catalyst)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(F.countDistinct("c_custkey").alias("n_customers"),
             F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"))
        .orderBy("c_mktsegment")
    )


@register(
    "customer_order_ranks",
    driver=False,  # rotated out r4 late — triple-green; window-rank shape
    # stays gated via order_price_quartile_bands / customer_running_revenue
    # / customer_order_gaps; slot went to ann_sq8_topk
    oracle=(
        "SELECT * FROM (SELECT o_custkey, o_orderkey, o_totalprice, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn "
        "FROM orders) t WHERE rn <= 3"),
    bench=True)
def q_customer_order_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: top-3 orders per customer. One shuffle on the
    partition key; rank pushdown (WindowGroupLimit) keeps per-key state at
    k rows in Spark 3.5+."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                           F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice",
                 F.row_number().over(w).cast("int").alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "events_hourly",
    driver=False,  # rotated out r3 (green r1+r2; pytest oracle continues)
    oracle=(
        "SELECT date_trunc('hour', ts) AS window_start, event_type, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        "ROUND(AVG(value), 4) AS avg_value "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    bench=True)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation, batch form (the streaming twin with
    watermark lives in streaming/windows.py — same grouping expression)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"),
                  "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.avg("value"), 4).alias("avg_value"))
    )


@register(
    "timeseries_gapfill",  # new r6, gated immediately (slot:
    # token_pack_assignments demoted — triple-green r3-r5; the greedy
    # packing shape stays pytest-gated via oracle parity)
    bench=True,  # reports under added_queries; core set stays frozen.
    # No budget yet — rolling min starts once it first reports (r6).
    oracle=(
        "WITH hourly AS (SELECT user_id, date_trunc('hour', ts) AS hour, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        "MAX(event_type) AS tt FROM events GROUP BY 1, 2), "
        "span AS (SELECT user_id, MIN(hour) AS lo, MAX(hour) AS hi "
        "FROM hourly GROUP BY 1), "
        "grid AS (SELECT user_id, "
        "unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour "
        "FROM span) "
        "SELECT g.user_id, g.hour, "
        "COALESCE(h.n_events, 0) AS n_events, "
        "last_value(h.tt IGNORE NULLS) OVER ("
        "PARTITION BY g.user_id ORDER BY g.hour "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_type "
        "FROM grid g LEFT JOIN hourly h "
        "ON g.user_id = h.user_id AND g.hour = h.hour "
        "ORDER BY g.user_id, g.hour"))
def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill (the TimescaleDB
    time_bucket_gapfill / locf shape): per user, an hourly grid spanning
    [first, last] activity hour with missing hours materialized at count
    0 and the last observed event type carried forward. The grid is
    sequence+explode per key — Σ span-hours rows, linear in keys ×
    span; the fill is ONE running `last(..., ignorenulls)` window on
    user_id. Captured plan (tests/test_plan_quality.py pins it): the
    hourly rollup shuffles once on (user_id, hour-group), broadcasts
    into the grid join, and Catalyst pushes the window's user_id
    distribution BELOW the join so the grid side exchanges exactly once
    — two hash exchanges total, each O(grid). At a scale where the
    hourly side outgrows broadcast, the join becomes a sort-merge on
    the same keys and the shape stays 3 exchanges, never a nested loop.
    Per-hour rollup stays deterministic under ts ties by aggregating
    (count, MAX(type)), so both engines derive identical fills."""
    from pyspark.sql import Window as Wn

    e = load_table(spark, sf_dir, "events")
    hourly = (e.groupBy("user_id",
                        F.date_trunc("hour", F.col("ts")).alias("hour"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.max("event_type").alias("tt")))
    grid = (hourly.groupBy("user_id")
            .agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
            .select("user_id",
                    F.explode(F.sequence(
                        "lo", "hi", F.expr("interval 1 hour")))
                    .alias("hour")))
    w = (Wn.partitionBy("user_id").orderBy("hour")
         .rowsBetween(Wn.unboundedPreceding, Wn.currentRow))
    # no trailing orderBy: the consumer (and the driver hash) is
    # order-insensitive, and a global range sort of the full grid —
    # O(keys x span-hours) rows — is pure presentation cost at scale
    return (grid.join(hourly, ["user_id", "hour"], "left")
            .select("user_id", "hour",
                    F.coalesce("n_events", F.lit(0)).alias("n_events"),
                    F.last("tt", ignorenulls=True).over(w)
                    .alias("last_type")))


@register(
    "customers_without_orders", driver=False,
    oracle=(
        "SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers "
        "FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) "
        "GROUP BY c.c_nationkey ORDER BY c.c_nationkey"))
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (NOT EXISTS). The key-set side is aggregated to distinct
    keys then broadcast — fact side never shuffles."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o.select(F.col("o_custkey").alias("c_custkey")).distinct(),
               "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_nationkey")
    )


@register(
    "nations_with_customers_and_suppliers", driver=False,
    oracle=(
        "SELECT c_nationkey AS nationkey FROM customer "
        "INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey"))
def q_nations_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op (INTERSECT → left-semi over distinct in Catalyst)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s).orderBy("nationkey")


@register(
    "nation_pair_revenue", driver=False,
    oracle=(
        "SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
        "FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey "
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
        "WHERE cn.n_nationkey < 5 AND sn.n_nationkey < 5 "
        "AND cn.n_nationkey <> sn.n_nationkey "
        "GROUP BY cn.n_name, sn.n_name ORDER BY revenue DESC, 1, 2"))
def q_nation_pair_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: revenue between (customer-nation, supplier-nation)
    pairs — two independent dimension chains hanging off the same fact
    (nation joined twice under different aliases); filters on both chains
    push into the broadcast sides."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("s_nk"))
        .filter((F.col("c_nk") < 5) & (F.col("s_nk") < 5)
                & (F.col("c_nk") != F.col("s_nk")))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "cust_nation", "supp_nation")
    )


@register(
    "above_segment_avg_customers",
    driver=False,  # rotated out r5 (green r1-r4; slot freed for
    # interval_join_events' first gate row; pytest oracle parity continues)
    oracle=(
        "SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS acctbal "
        "FROM customer c WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.5 "
        "FROM customer i WHERE i.c_mktsegment = c.c_mktsegment) "
        "ORDER BY c_custkey"))
def q_above_segment_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery semantics (per-group threshold) as a window
    average — one shuffle on the group key instead of a per-row subquery,
    the decorrelated plan Catalyst/any CBO would aim for."""
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment")
    return (
        c.withColumn("seg_avg", F.avg("c_acctbal").over(w))
        .filter(F.col("c_acctbal") > F.col("seg_avg") * 1.5)
        .select("c_custkey", "c_mktsegment",
                F.round("c_acctbal", 2).alias("acctbal"))
        .orderBy("c_custkey")
    )


@register(
    "events_props_map", driver=False,  # green r1+r2; slot rotated r3
    oracle=(
        # json_keys ≡ map_keys(from_json(...)); surface arrays, not MAP
        # values (MAP column representations don't hash across engines)
        "SELECT event_id, array_to_string(list_sort(json_keys(props)), ',') "
        "AS prop_keys, CAST(json_array_length(json_keys(props)) AS INT) "
        "AS n_keys FROM events ORDER BY event_id LIMIT 100"))
def q_events_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: JSON payload → map<string,int> → key inventory
    (map columns themselves stay engine-internal; the hashable surface is
    the sorted key list)."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        e.select("event_id",
                 F.concat_ws(",", F.sort_array(F.map_keys(m)))
                 .alias("prop_keys"),
                 F.size(F.map_keys(m)).cast("int").alias("n_keys"))
        .orderBy("event_id").limit(100)
    )


@register(
    "events_props_extract", driver=False,
    oracle=(
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(AVG(CAST(props->>'$.k' AS INT)), 4) AS avg_k, "
        "CAST(MAX(CAST(props->>'$.k' AS INT)) AS INT) AS max_k "
        "FROM events GROUP BY event_type ORDER BY event_type"))
def q_events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction on the star schema's stringly-typed props
    column (F1 on arbitrary payloads — get_json_object ≡ ->>)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg(k), 4).alias("avg_k"),
             F.max(k).cast("int").alias("max_k"))
        .orderBy("event_type")
    )


@register(
    "user_value_trend", driver=False,
    oracle=(
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROUND(regr_slope(value, (epoch_us(ts) / 1000000.0 - 1704067200) "
        "/ 86400.0), 4) AS slope_per_day "
        "FROM events GROUP BY user_id ORDER BY user_id"))
def q_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend (slope of value over days) via the
    covariance/variance identity — one grouped aggregate, JVM-side.
    tests/test_applyinpandas.py checks the applyInPandas (per-group numpy)
    formulation agrees: same math, two execution strategies."""
    e = load_table(spark, sf_dir, "events")
    x = (F.unix_micros("ts") / 1e6 - 1704067200) / 86400.0
    return (
        e.select("user_id", x.alias("x"), F.col("value").alias("v"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.covar_pop("x", "v") / F.var_pop("x"), 4)
             .alias("slope_per_day"))
        .orderBy("user_id")
    )


@register(
    "nation_customer_names", driver=False,
    oracle=(
        "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers, "
        "array_to_string(list_sort(list(c_name))[1:3], ',') AS sample_names "
        "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"))
def q_nation_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation (collect → sort → slice → join): collect_list
    is unordered by contract, so determinism comes from sort_array — the
    only way a grouped string agg is reproducible on a distributed run."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             F.concat_ws(",", F.slice(F.sort_array(F.collect_list("c_name")),
                                      1, 3)).alias("sample_names"))
        .orderBy("c_nationkey")
    )


_LI_RULES = [
    ("quantity_positive", "l_quantity <= 0"),
    ("discount_in_unit_range", "l_discount < 0 OR l_discount > 1"),
    ("tax_non_negative", "l_tax < 0"),
    ("shipdate_not_null", "l_shipdate IS NULL"),
]


@register(
    "lineitem_quality", driver=False,
    oracle=(
        "SELECT expectation, failing_rows, failing_rows = 0 AS passed FROM ("
        + " UNION ALL ".join(
            f"(SELECT '{n}' AS expectation, CAST(SUM(CASE WHEN {p} THEN 1 "
            f"ELSE 0 END) AS BIGINT) AS failing_rows FROM lineitem)"
            for n, p in _LI_RULES)
        + ") u"))
def q_lineitem_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative quality suite applied to an arbitrary table (the
    reusable GE-shape runner, operators/quality.run_suite): N rules in one
    scan + one reduce."""
    from ..operators.quality import run_suite
    return run_suite(load_table(spark, sf_dir, "lineitem"), _LI_RULES)


@register(
    "orders_by_month", driver=False,
    oracle=(
        "SELECT CAST(year(o_orderdate) AS INT) AS y, "
        "CAST(month(o_orderdate) AS INT) AS m, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "ROUND(SUM(o_totalprice), 2) AS total_price "
        "FROM orders GROUP BY 1, 2 ORDER BY 1, 2"))
def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup (year/month extraction — the partition-pruning
    grouping at 100 TB when orders is date-partitioned)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("int").alias("y"),
                  F.month("o_orderdate").cast("int").alias("m"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .orderBy("y", "m")
    )


@register(
    "supplier_name_fuzzy", driver=False,
    oracle=(
        "SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b, "
        "CAST(levenshtein(a.s_name, b.s_name) AS INT) AS edit_distance "
        "FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey "
        "WHERE levenshtein(a.s_name, b.s_name) <= 1 "
        "ORDER BY supp_a, supp_b"))
def q_supplier_name_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching via edit distance (classic DP levenshtein —
    identical semantics in both engines), with the LENGTH PREFILTER as an
    equi-join key: edit distance ≤ 1 implies |len(a) − len(b)| ≤ 1, so
    each left name probes only the three length buckets it could match —
    a hash join over length-bucketed names, never an all-pairs nested
    loop (a pair meets in exactly one bucket, so no dedup is needed).
    At web scale add a q-gram prefilter the same way. The oracle states
    the quadratic definition; the values are identical."""
    s = (load_table(spark, sf_dir, "supplier")
         .select("s_suppkey", "s_name",
                 F.length("s_name").alias("__len")))
    probes = s.select(
        F.col("s_suppkey").alias("supp_a"),
        F.col("s_name").alias("__a_name"),
        F.explode(F.array(F.col("__len") - 1, F.col("__len"),
                          F.col("__len") + 1)).alias("__len"))
    b = s.select(F.col("s_suppkey").alias("supp_b"),
                 F.col("s_name").alias("__b_name"), "__len")
    dist = F.levenshtein(F.col("__a_name"), F.col("__b_name"))
    return (
        probes.join(b, "__len")
        .filter(F.col("supp_a") < F.col("supp_b"))
        .filter(dist <= 1)
        .select("supp_a", "supp_b", dist.cast("int").alias("edit_distance"))
        .orderBy("supp_a", "supp_b")
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "orders_pivot_priority",
    driver=False,  # rotated out r3 (green r1+r2; pytest oracle continues)
    oracle=(
        "SELECT o_orderstatus, "
        + ", ".join(
            f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS \"{p}\"" for p in _PRIORITIES)
        + " FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"))
def q_orders_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (explicit list = single pass, no
    distinct-scan to discover columns — the scale-safe form); the oracle is
    the equivalent conditional aggregation."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _PRIORITIES)
        .select("o_orderstatus",
                *[F.col(p).cast("bigint").alias(p) for p in _PRIORITIES])
        .orderBy("o_orderstatus")
    )


@register(
    "order_price_quantiles",
    driver=False,  # rotated out r3 (green r1+r2; pytest oracle continues)
    oracle=(
        "SELECT o_orderstatus, "
        "ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50, "
        "ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90, "
        "ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99 "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"))
def q_order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    quantile_cont). At 100 TB swap for approx_percentile with an accuracy
    knob — exact percentile needs a per-group sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(*[
            F.round(F.expr(f"percentile(o_totalprice, {q})"), 4)
            .alias(name)
            for name, q in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]
        ])
        .orderBy("o_orderstatus")
    )


@register(
    "incremental_activity_agg", driver=False,
    oracle=(
        # oracle recomputes over the FULL table — the incremental combine
        # must be indistinguishable from a full recompute
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "ROUND(SUM(value), 4) AS total_value "
        "FROM events GROUP BY user_id ORDER BY user_id"))
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance — the scale fix for the
    reference's full-overwrite rewrite (read_delta.py:219-222, SURVEY
    §4.3): partial aggregates (count, sum) combine associatively, so a new
    batch only touches its own keys. Modeled by splitting events into a
    base (80%) and a delta (20%), aggregating independently, and combining
    — the oracle is a full recompute."""
    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("event_id") % 5 != 0)
    delta = e.filter(F.col("event_id") % 5 == 0)

    def part(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))

    return (
        part(base).unionAll(part(delta))
        .groupBy("user_id")
        .agg(F.sum("n").cast("bigint").alias("n_events"),
             F.round(F.sum("v"), 4).alias("total_value"))
        .orderBy("user_id")
    )


@register(
    "salted_user_totals", driver=False,
    oracle=(
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "ROUND(SUM(value), 4) AS total_value "
        "FROM events GROUP BY user_id ORDER BY user_id"))
def q_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: salt the hot key space into 8
    subkeys (phase 1 spreads a hot key over 8 reducers), then combine.
    Results are exactly the plain groupBy (the oracle). At 100 TB this is
    the manual fallback when AQE skew handling can't help (single massive
    key in a non-join agg). Salt from a deterministic key hash — rand()
    would break retry idempotency at scale."""
    e = load_table(spark, sf_dir, "events")
    salted = e.withColumn(
        "salt", (F.abs(F.xxhash64("event_id")) % 8).cast("int"))
    phase1 = salted.groupBy("user_id", "salt").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    return (
        phase1.groupBy("user_id")
        .agg(F.sum("n").cast("bigint").alias("n_events"),
             F.round(F.sum("v"), 4).alias("total_value"))
        .orderBy("user_id")
    )


@register(
    "small_spenders_except", driver=False,
    oracle=(
        "SELECT o_custkey AS custkey FROM orders "
        "EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 200000 "
        "ORDER BY custkey"))
def q_small_spenders_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op (→ left-anti over distinct in Catalyst): customers who
    ordered but never above 200k."""
    o = load_table(spark, sf_dir, "orders")
    all_c = o.select(F.col("o_custkey").alias("custkey"))
    big_c = o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey"))
    return all_c.subtract(big_c).orderBy("custkey")


@register(
    "orders_status_rollup",
    driver=False,  # rotated out r5 (green r1-r4; slot freed for
    # dedup_chunks' first gate row; pytest oracle parity continues)
    oracle=(
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "ROUND(SUM(o_totalprice), 2) AS total_price "
        "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) "
        "ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"))
def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total in one pass)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(),
                 F.col("o_orderpriority").asc_nulls_first())
    )


@register(
    "min_cost_supplier",
    driver=False,  # rotated out r5 (green r2-r4; slot freed for
    # semantic_dedup_prune's first gate row; pytest oracle parity continues)
    oracle=(
        # correlated min-subquery, authored as a true correlation here —
        # DuckDB decorrelates it the same way the DataFrame twin is written
        "SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, "
        "p.p_name, ROUND(l.l_extendedprice, 2) AS min_price "
        "FROM part p, supplier s, lineitem l, nation n, region r "
        "WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey "
        "AND s.s_nationkey = n.n_nationkey "
        "AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE' "
        "AND p.p_size % 5 = 0 "
        "AND l.l_extendedprice = ("
        " SELECT MIN(l2.l_extendedprice) "
        " FROM lineitem l2, supplier s2, nation n2, region r2 "
        " WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey "
        " AND s2.s_nationkey = n2.n_nationkey "
        " AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE') "
        "ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100"))
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped correlated min-subquery (cheapest EUROPE supplier
    per part), hand-decorrelated the way Catalyst rewrites it: the
    correlated scalar subquery becomes a groupBy-min over the same filtered
    join, joined back on (partkey, price). region/nation/supplier broadcast;
    the only shuffle is lineitem's groupBy(l_partkey) — 100 TB-safe.

    Total output order: DISTINCT rows are unique on (s_name, p_partkey),
    both in the ORDER BY, so the LIMIT 100 cut is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") % 5 == 0)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # offers: lineitem restricted to EUROPE suppliers (shared by both the
    # outer query and the decorrelated min side — computed once, cached by
    # Catalyst's exchange reuse since both branches shuffle on l_partkey)
    eu_supp = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
               .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")))
    offers = li.join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
    min_price = (offers.groupBy("l_partkey")
                 .agg(F.min("l_extendedprice").alias("__min_price")))
    return (
        offers.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(min_price, "l_partkey")
        .filter(F.col("l_extendedprice") == F.col("__min_price"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                F.round("l_extendedprice", 2).alias("min_price"))
        .distinct()
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "customer_order_gaps",  # gated green r4; slot rotated to
    # txn_point_lookup in r5 (pytest oracle parity still checks this)
    driver=False,
    oracle=(
        "WITH g AS (SELECT o_custkey, o_orderkey, o_orderdate, "
        "lag(o_orderdate) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) AS prev_orderdate "
        "FROM orders) "
        "SELECT o_custkey, o_orderkey, o_orderdate, prev_orderdate, "
        "CAST(FLOOR(epoch(o_orderdate - prev_orderdate) / 86400) AS BIGINT) "
        "AS gap_days "
        "FROM g ORDER BY o_custkey, o_orderdate, o_orderkey"))
def q_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() inter-event gaps: days since each customer's previous order
    (NULL for the first). One shuffle on the partition key; ties on
    o_orderdate break by o_orderkey so the lag sequence is total-ordered
    in both engines."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    gap = F.floor(
        (F.unix_timestamp("o_orderdate") - F.unix_timestamp(prev)) / 86400
    ).cast("bigint")
    return (o.select("o_custkey", "o_orderkey", "o_orderdate",
                     prev.alias("prev_orderdate"), gap.alias("gap_days"))
            .orderBy("o_custkey", "o_orderdate", "o_orderkey"))


@register(
    "approx_distinct_contract",  # promoted into the driver window r4.
    # Demoted r8 after green r5-r7: the sketch-contract class stays
    # gated via heavy_hitters_users — a STRICTER contract (exact
    # recovery + full hash oracle vs a tolerance band); HLL accuracy
    # stays DuckDB-verified per pytest run; slot goes to
    # heavy_hitters_users
    driver=False,
    oracle=(
        # the oracle pins the EXACT counts and asserts the sketch landed
        # inside the tolerance (literal TRUE): if Spark's HLL ever drifts
        # beyond 3%, within_3pct flips FALSE and the hash mismatches
        "SELECT o_orderpriority, "
        "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact, "
        "TRUE AS within_3pct "
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"))
def q_approx_distinct_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approx-distinct scale path with a checkable contract: HLL++
    (rsd=0.01) must land within 3% of the exact distinct count per group
    (observed ≤0.85% on this data; both aggregates are deterministic).
    At 100 TB the exact arm drops away and the sketch — mergeable,
    constant-memory — is the only affordable distinct; this query pins
    the accuracy the swap relies on."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_exact"),
        F.expr("approx_count_distinct(o_custkey, 0.01)").alias("n_approx"))
    within = (F.abs(F.col("n_approx") - F.col("n_exact"))
              / F.col("n_exact") <= 0.03)
    return (agg.select("o_orderpriority", "n_exact",
                       within.alias("within_3pct"))
            .orderBy("o_orderpriority"))


_HH_PHI = 0.007  # heavy-hitter threshold: share > 0.7% of all events.
# sf0.001: every user qualifies (15 users, ~6.6% each) — the recovery
# arm; sf0.01: ~a third of the 150 users clear 70 events — the
# discrimination arm (both qualifying and non-qualifying users exist,
# so a sketch that over- OR under-proposes flips the hash).


@register(
    "heavy_hitters_users",  # new r8, gated immediately (slot:
    # approx_distinct_contract demoted — green r5-r7; the
    # sketch-contract class stays gated via this STRICTER row and HLL
    # stays DuckDB-verified per pytest run). bench=True late-r8 so the
    # sketch class has a measured per-round presence (reports under
    # added_queries this round; budget forms from the rolling min).
    bench=True,
    oracle=(
        # the sketch only PROPOSES candidates — the second pass counts
        # exactly and applies the cut, so the contract is a FULL hash
        # oracle (plain GROUP BY/HAVING), not a tolerance band
        "WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM events WHERE user_id IS NOT NULL GROUP BY user_id), "
        "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c) "
        f"SELECT user_id, cnt, ROUND(cnt / CAST(n AS DOUBLE), 6) "
        f"AS share FROM c, t WHERE cnt > {_HH_PHI} * n "
        "ORDER BY user_id"))
def q_heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters over events.user_id (share > 0.7%),
    EXACT via the two-pass design (operators/sketches.py): pass 1 is a
    shuffle-FREE per-partition MG sketch (Arrow mapInPandas, bounded
    ceil(1/phi) counters, provable no-false-negative union); pass 2 is
    one map-side-combined aggregation over candidate-or-NULL (<= k+1
    groups — the exchange carries ~k rows per task, and the grand
    total n is the sum over the same groups, no separate count scan).
    At 100 TB this replaces a full key-column shuffle with two scans;
    the oracle recomputes the answer as a plain GROUP BY/HAVING, so
    the gate proves exact recovery — candidates proposed by the sketch
    and then exactly counted equal the true heavy-hitter set."""
    from ..operators.sketches import heavy_hitters_exact

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull())
    return (heavy_hitters_exact(e, "user_id", _HH_PHI)
            .orderBy("user_id"))


@register(
    "exact_quantiles_bracketed",  # new r8, gated immediately (slot:
    # dedup_exact demoted — green r3-r7; the exact-dedup stage is
    # EMBEDDED in training_pipeline_e2e (gated), the query keeps
    # running in every bench pass (bench=True), and it stays
    # DuckDB-verified per pytest run).
    # DEMOTED 2026-08-16 — green r9-r11; the flat bracketing shape
    # survives STRICTLY HARDER inside the still-gated
    # grouped_quantiles_exact (per-group brackets, adversarial
    # config, benched) and stream_quantiles_equiv (maintained-
    # histogram serve), and this row stays DuckDB-verified per pytest
    # run. Slot goes to txn_generated_partitions (VERDICT r11 #1).
    driver=False,
    # EXACT order statistics — the quantile analog of the heavy-hitter
    # two-pass, and the exact counterpart to approx_quantile_contract's
    # tolerance band: the rank sketch only PROPOSES a bracket, exact
    # counts verify it and a bounded TakeOrdered reads the answer, so
    # the oracle is the k-th order statistic itself (ROW_NUMBER join),
    # a FULL hash. CAST(q AS DOUBLE) before the rank product so both
    # engines ceil the same IEEE754 value.
    oracle=(
        "WITH t AS (SELECT o_totalprice, ROW_NUMBER() OVER "
        "(ORDER BY o_totalprice) AS rn FROM orders), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM orders) "
        "SELECT CAST(q AS DOUBLE) AS q, o_totalprice AS value "
        "FROM (VALUES (0.25),(0.5),(0.75),(0.95)) qs(q) "
        "JOIN t ON t.rn = GREATEST(1, CAST(CEIL(CAST(q AS DOUBLE) "
        "* (SELECT c FROM n)) AS BIGINT)) "
        "ORDER BY q"))
def q_exact_quantiles_bracketed(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """EXACT quantiles of o_totalprice (k = ceil(q*n) order statistic)
    via sketch-guided bracketing (operators/sketches.exact_quantiles):
    approx_percentile proposes a value bracket, exact strictly-below /
    at-or-below counts VERIFY it contains rank k (widening loudly if a
    sketch merge-order wobble ever drops it), the bracket re-sketches
    until it is TakeOrdered-small, and the answer is read exactly —
    rounds = ceil(log_accuracy(n)), 2 at 10^12 rows with the default
    accuracy. At 100 TB this replaces a full global sort with a
    handful of scans + an O(accuracy) ordered read. The gate runs
    accuracy=100 / direct_limit=500 so REAL bracketing rounds execute
    at both test scales; the oracle is the order statistic itself."""
    from ..operators.sketches import exact_quantiles

    o = load_table(spark, sf_dir, "orders")
    got = exact_quantiles(o, "o_totalprice", [0.25, 0.5, 0.75, 0.95],
                          accuracy=100, direct_limit=500)
    return spark.createDataFrame(got, "q double, value double")


@register(
    "grouped_quantiles_exact",  # new r9, gated immediately (slot:
    # ann_sq8_recall_floor demoted — green r4-r8; the quantized-codes
    # ADC shape stays gated via ann_pq_recall_floor /
    # ann_refine_recall_floor, which are STRICTER — PQ subquantizers
    # vs one scalar quantizer — and the SQ8 row stays DuckDB-verified
    # per pytest run).
    driver=False,  # rotated out r13 (green r9-r12; VERDICT r12 #7:
    # the slot passes to grouped_quantiles_prod, which shares this
    # row's oracle TEXT verbatim — identical result set by
    # construction — so the gate's hash coverage is unchanged while
    # the identical-oracle-twin carve-out in tests/test_driver_gate.py
    # retires entirely: both twins have now held a direct slot. The
    # adversarial config stays benched (bench=True), job-count-pinned
    # in tests/test_sketches.py, and DuckDB-verified per pytest run).
    # Per-group EXACT order statistics — the grouped twin of
    # exact_quantiles_bracketed, completing the sketch family the way
    # heavy_hitters_by_type completed MG: the per-segment p50/p95
    # question (the first thing a consumer of the reference's `final`
    # table asks after the mean — its README computes only averages,
    # read_delta.py:219-222 / README.md:140-164). One bracketing state
    # per (group, quantile); every round THREE jobs total (grid
    # re-sketch over broadcast-joined bracket slices, Expand-style
    # conditional-agg verify with per-group bounds from the joined
    # frame, shared ranked read) — never a per-group loop; job-count
    # pinned in tests/test_sketches.py.
    oracle=(
        "WITH t AS (SELECT event_type, value, ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY value) AS rn, "
        "CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n "
        "FROM events WHERE value IS NOT NULL) "
        "SELECT event_type, CAST(q AS DOUBLE) AS q, value "
        "FROM (VALUES (0.25),(0.5),(0.75),(0.95)) qs(q) "
        "JOIN t ON t.rn = GREATEST(1, CAST(CEIL(CAST(q AS DOUBLE) "
        "* n) AS BIGINT)) "
        "ORDER BY event_type, q"),
    bench=True)
def q_grouped_quantiles_exact(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """EXACT p25/p50/p75/p95 of event value PER event_type
    (operators/sketches.grouped_exact_quantiles): k = ceil(q*n_group)
    order statistics located by sketch-guided bracketing with one
    state per (group, quantile) and a CONSTANT number of jobs per
    round. The gate runs accuracy=40 / direct_limit=80 / grid=64 so
    REAL grid-bracketing rounds execute at both test scales (group
    sizes ~200 at sf0.001, ~2000 at sf0.01); the oracle is the
    per-group order statistic itself (ROW_NUMBER-per-group join),
    a FULL hash. NULL values excluded from each group's n; both
    engines ceil the same IEEE754 q*n product via CAST."""
    from ..operators.sketches import grouped_exact_quantiles

    e = load_table(spark, sf_dir, "events")
    got = grouped_exact_quantiles(e, "event_type", "value",
                                  [0.25, 0.5, 0.75, 0.95],
                                  accuracy=40, direct_limit=80,
                                  grid=64)
    return (spark.createDataFrame(
        got, "event_type string, q double, value double")
        .orderBy("event_type", "q"))


@register(
    "grouped_quantiles_prod",  # new r10 (VERDICT r9 #6's second half):
    # the SAME operator at PRODUCTION defaults, benched alongside the
    # adversarial gate config so the bench tracks the operator's real
    # cost curve, not only the forced-round one — at default
    # accuracy/direct_limit every test-scale group is direct-readable
    # (zero sketch rounds: one combined sizes+grid job, one shared
    # ranked read), which is exactly the production shape until groups
    # pass ~100k rows. Gated r13 (VERDICT r12 #7): takes the direct
    # slot from its adversarial twin grouped_quantiles_exact (green
    # r9-r12) — identical oracle text, so the swap keeps hash coverage
    # while retiring tests/test_driver_gate.py's identical-oracle-twin
    # carve-out (both twins have now held a direct slot).
    bench=True,
    oracle=(
        "WITH t AS (SELECT event_type, value, ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY value) AS rn, "
        "CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n "
        "FROM events WHERE value IS NOT NULL) "
        "SELECT event_type, CAST(q AS DOUBLE) AS q, value "
        "FROM (VALUES (0.25),(0.5),(0.75),(0.95)) qs(q) "
        "JOIN t ON t.rn = GREATEST(1, CAST(CEIL(CAST(q AS DOUBLE) "
        "* n) AS BIGINT)) "
        "ORDER BY event_type, q"))
def q_grouped_quantiles_prod(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """grouped_exact_quantiles at PRODUCTION defaults (accuracy=10k,
    direct_limit=100k, grid=512) — the real cost curve next to the
    gate's adversarial config; identical answers, identical oracle."""
    from ..operators.sketches import grouped_exact_quantiles

    e = load_table(spark, sf_dir, "events")
    got = grouped_exact_quantiles(e, "event_type", "value",
                                  [0.25, 0.5, 0.75, 0.95])
    return (spark.createDataFrame(
        got, "event_type string, q double, value double")
        .orderBy("event_type", "q"))


@register(
    "stream_grouped_hh_equiv",  # new r9, gated immediately (slot:
    # scd2_employee_sport_dim demoted — green r5-r8; the SCD2 run
    # derivation (scd2_runs) is EMBEDDED end-to-end in the gated
    # scd2_point_in_time_join row, the streaming SCD2 maintainer has
    # its own tests, and the dim row stays benched (bench=True) and
    # DuckDB-verified per pytest run).
    # The grouped streaming MG twin — completing the sketch-family
    # symmetry: flat MG streamed (r8), grouped MG streamed (here),
    # flat+grouped quantiles streamed (r9). One k-counter sketch PER
    # GROUP maintained from the events change feed (<= n_groups x k
    # state rows); per-group heavy hitters served THROUGH the
    # maintained sketch (grouped exact pass over accumulated events)
    # must be row-identical to the from-scratch grouped two-pass. The
    # oracle is the plain per-group GROUP BY/HAVING — a FULL hash.
    oracle=(
        "WITH c AS (SELECT event_type, user_id, "
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM events "
        "WHERE user_id IS NOT NULL GROUP BY event_type, user_id), "
        "t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n "
        "FROM c GROUP BY event_type) "
        f"SELECT c.event_type, user_id, cnt, "
        f"ROUND(cnt / CAST(n AS DOUBLE), 6) AS share "
        f"FROM c JOIN t ON c.event_type = t.event_type "
        f"WHERE cnt > {_HH_PHI} * n "
        "ORDER BY c.event_type, user_id"))
def q_stream_grouped_hh_equiv(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Events arrive as three micro-batches through the exact grouped
    per-batch ingest the foreachBatch sink runs (events append +
    per-group sketch fold from the events change feed, every leg
    replay-guarded); per-event_type heavy hitters served THROUGH the
    maintained <= n_groups x k sketch must equal the relational
    per-group GROUP BY/HAVING answer."""
    import math
    import tempfile

    from ..streaming.sketches import _tables, \
        grouped_heavy_hitters_served, ingest_batch_grouped

    e = (load_table(spark, sf_dir, "events")
         .filter(F.col("user_id").isNotNull())
         .select("event_id", "event_type", "user_id"))
    k = math.ceil(1.0 / _HH_PHI)
    root = tempfile.mkdtemp(prefix="samdis_stream_gmg_")
    events, sketch = _tables(root)
    for i in range(3):
        ingest_batch_grouped(events, sketch,
                             e.filter(F.col("event_id") % 3 == i),
                             i, "event_type", "user_id", k, "gmg_twin")
    return (grouped_heavy_hitters_served(
        spark, root, "event_type", "user_id", _HH_PHI)
        .orderBy("event_type", "user_id"))


@register(
    "stream_quantiles_equiv",  # new r9, gated immediately (slot:
    # training_pipeline_e2e demoted — green r4-r8; every composed
    # stage stays gated on its own row and the harder streaming
    # composition is gated via stream_splits_e2e; the row stays
    # benched and DuckDB-verified per pytest run).
    driver=False,  # rotated out r13 (green r9-r12; slot went to
    # skew_salted_join. The flat maintained-quantile shape survives
    # STRICTLY HARDER in the still-gated stream_grouped_quantiles_equiv
    # — one frozen-grid histogram PER GROUP over the same change-feed
    # fold and partition-pruned ranked serve — and the batch order-
    # statistic family stays gated via grouped_quantiles_prod; this row
    # stays DuckDB-verified per pytest run.)
    # Streaming EXACT quantiles (streaming/quantiles.py): unlike the
    # batch bracketing operator, the maintained form needs NO
    # verification rounds — the frozen-value-grid histogram is folded
    # from the vals change feed with EXACT counts, so serving is the
    # <= (n_vb+2)-row histogram locating each rank's bucket plus ONE
    # partition-pruned ranked read over just the target buckets. The
    # oracle is the order statistic itself recomputed relationally —
    # served-through-maintained-state values must hash-match DuckDB's
    # ORDER BY ... rank over the SAME rows, a FULL hash.
    oracle=(
        "WITH t AS (SELECT value, ROW_NUMBER() OVER "
        "(ORDER BY value) AS rn FROM events "
        "WHERE value IS NOT NULL), "
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM events "
        "WHERE value IS NOT NULL) "
        "SELECT CAST(q AS DOUBLE) AS q, value "
        "FROM (VALUES (0.25),(0.5),(0.75),(0.95)) qs(q) "
        "JOIN t ON t.rn = GREATEST(1, CAST(CEIL(CAST(q AS DOUBLE) "
        "* (SELECT c FROM n)) AS BIGINT)) "
        "ORDER BY q"))
def q_stream_quantiles_equiv(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Event values arrive as three micro-batches through the exact
    per-batch ingest the foreachBatch sink runs (bucket-partitioned
    vals append + histogram fold from the vals change feed, every leg
    replay-guarded); p25/p50/p75/p95 served THROUGH the maintained
    state must equal the from-scratch order statistics. Completes
    "every sketch artifact has a streaming twin" for the quantile
    family (IVF r6, IVF-PQ r7, BM25 r8, MG r8, CC r8, SemDeDup r8)."""
    import tempfile

    from ..streaming.quantiles import _tables, ingest_batch, \
        quantiles_served

    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    root = tempfile.mkdtemp(prefix="samdis_stream_q_")
    vals, hist = _tables(root)
    for i in range(3):
        ingest_batch(vals, hist, e.filter(F.col("event_id") % 3 == i),
                     i, "value", 0.0, 500.0, app_id="q_twin")
    got = quantiles_served(spark, root, [0.25, 0.5, 0.75, 0.95])
    return spark.createDataFrame(got, "q double, value double")


@register(
    "stream_grouped_quantiles_equiv",  # new r9, gated immediately
    # (slot: dedup_chunks demoted — green r5-r8; repeated-content
    # detection stays gated at the strictly harder substring level via
    # the span rows, and dedup_chunks stays benched + parity-verified).
    # The grouped twin of stream_quantiles_equiv, pairing with
    # grouped_quantiles_exact the way streaming MG paired with grouped
    # MG: the histogram is maintained per (group, grid-bucket) — <=
    # n_groups x (n_vb+2) rows — and serving answers every (group,
    # quantile) with ONE partition-pruned ranked read over the union
    # of target buckets (a bucket dir is scanned once no matter how
    # many groups' ranks land in it). FULL hash oracle: the per-group
    # order statistics recomputed relationally.
    oracle=(
        "WITH t AS (SELECT event_type, value, ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY value) AS rn, "
        "CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n "
        "FROM events WHERE value IS NOT NULL) "
        "SELECT event_type, CAST(q AS DOUBLE) AS q, value "
        "FROM (VALUES (0.25),(0.5),(0.75),(0.95)) qs(q) "
        "JOIN t ON t.rn = GREATEST(1, CAST(CEIL(CAST(q AS DOUBLE) "
        "* n) AS BIGINT)) "
        "ORDER BY event_type, q"))
def q_stream_grouped_quantiles_equiv(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Event values arrive as three micro-batches through the exact
    grouped per-batch ingest the foreachBatch sink runs (group column
    carried in vals, per-(group, bucket) histogram folded from the
    vals change feed, every leg replay-guarded); per-event_type
    p25/p50/p75/p95 served THROUGH the maintained state must equal
    the from-scratch per-group order statistics."""
    import tempfile

    from ..streaming.quantiles import _tables, \
        grouped_quantiles_served, ingest_batch

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    root = tempfile.mkdtemp(prefix="samdis_stream_gq_")
    vals, hist = _tables(root)
    for i in range(3):
        ingest_batch(vals, hist, e.filter(F.col("event_id") % 3 == i),
                     i, "value", 0.0, 500.0, app_id="gq_twin",
                     group_col="event_type")
    got = grouped_quantiles_served(spark, root, "event_type",
                                   [0.25, 0.5, 0.75, 0.95])
    return (spark.createDataFrame(
        got, "event_type string, q double, value double")
        .orderBy("event_type", "q"))


@register(
    "heavy_hitters_by_type",  # new r8, gated immediately (slot:
    # boilerplate_ngrams_abs demoted — green r5-r7; repeated-content
    # detection stays gated via dedup_repeated_spans (substring-level,
    # strictly harder) and boilerplate_ngrams/boilerplate_ngrams_abs
    # stay DuckDB-verified per pytest run).
    # DEMOTED 2026-08-16 — green r9-r11; the grouped two-pass shape
    # survives STRICTLY HARDER inside the still-gated
    # stream_grouped_hh_equiv (same per-group sketches, maintained
    # state, pinned serve) plus the gated+benched flat row
    # heavy_hitters_users, and this row stays DuckDB-verified per
    # pytest run. Slot goes to stream_decontaminate_equiv (VERDICT
    # r11 #3).
    driver=False,
    # The grouped generalization of heavy_hitters_users: frequent
    # items PER CATEGORY (top talkers per event type) with one
    # k-counter sketch per (task, group) and the same exact second
    # pass — the oracle is again a plain GROUP BY/HAVING full hash.
    oracle=(
        "WITH c AS (SELECT event_type, user_id, "
        "CAST(COUNT(*) AS BIGINT) AS cnt FROM events "
        "WHERE user_id IS NOT NULL GROUP BY event_type, user_id), "
        "t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n "
        "FROM c GROUP BY event_type) "
        f"SELECT c.event_type, user_id, cnt, "
        f"ROUND(cnt / CAST(n AS DOUBLE), 6) AS share "
        f"FROM c JOIN t ON c.event_type = t.event_type "
        f"WHERE cnt > {_HH_PHI} * n "
        "ORDER BY c.event_type, user_id"))
def q_heavy_hitters_by_type(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Per-group Misra-Gries heavy hitters (share > 0.7% WITHIN each
    event type), EXACT via the grouped two-pass
    (operators/sketches.grouped_heavy_hitters_exact): one bounded
    sketch per (task, group) proposes, one map-side-combined
    aggregation over (group, candidate-or-NULL) counts exactly, each
    group's total summed from its own <= k+1 aggregated rows. At
    100 TB this answers "frequent items per category" with two scans
    and a ~(groups x k)-row exchange instead of shuffling the full
    (group, key) space. Both arms non-vacuous: all 75 (user, type)
    pairs qualify at sf0.001 (recovery); 303/750 at sf0.01
    (discrimination)."""
    from ..operators.sketches import grouped_heavy_hitters_exact

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull())
    return (grouped_heavy_hitters_exact(e, "event_type", "user_id",
                                        _HH_PHI)
            .orderBy("event_type", "user_id"))


@register(
    "stream_heavy_hitters_equiv",  # new r8, gated immediately (slot:
    # txn_point_lookup demoted — green r5-r7; the stats-driven
    # pruned-read class stays gated via txn_zorder_read, the bloom
    # point-probe stays pinned by
    # tests/test_txnlog.py::test_bloom_prunes_point_lookups, and the
    # row stays DuckDB-verified per pytest run). DEMOTED 2026-08-16
    # (r11, green r8-r10): slot goes to txn_generated_identity
    # (plans/core.py) — the flat streaming-MG shape survives STRICTLY
    # HARDER inside the still-gated stream_grouped_hh_equiv (same
    # events/sketch tables, same pinned serve, per-group state on
    # top), the batch flat shape stays gated+benched via
    # heavy_hitters_users, and the streaming suite in
    # tests/test_sketches.py continues per pytest run.
    driver=False,
    # Self-contained equivalence contract (the stream_bm25_index_equiv
    # pattern): the literal-TRUE booleans flip — and the gate
    # hash-mismatches — if the stream-maintained MG sketch ever grows
    # past k rows, leaves the mergeability error band, drops a true
    # heavy hitter, or serves answers that diverge from the batch
    # two-pass. n_heavy is recomputed relationally by the oracle, so
    # the served heavy-hitter SET is value-verified too.
    oracle=(
        "WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM events WHERE user_id IS NOT NULL GROUP BY user_id), "
        "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c) "
        f"SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c, t "
        f"WHERE cnt > {_HH_PHI} * n) AS n_heavy, "
        "CAST(1 AS BOOLEAN) AS sketch_bounded, "
        "CAST(1 AS BOOLEAN) AS estimate_bounds_ok, "
        "CAST(1 AS BOOLEAN) AS superset_ok, "
        "CAST(1 AS BOOLEAN) AS hh_match"))
def q_stream_heavy_hitters_equiv(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Streaming maintenance of the MG heavy-hitter sketch
    (streaming/sketches.py): events arrive as two micro-batches
    through the exact per-batch ingest the foreachBatch sink runs
    (events append with meta-accumulated row count + sketch merge from
    the events change feed, every leg replay-guarded); the maintained
    sketch must stay <= k rows with every counter inside the
    mergeability error band [exact - n/(k+1), exact] (Agarwal et al.
    2012), must retain every true heavy hitter, and heavy hitters
    served THROUGH the maintained sketch (exact second pass over the
    accumulated events) must be row-identical to the batch two-pass.
    Completes "every index artifact has a streaming twin" for sketch
    artifacts (IVF r6, IVF-PQ r7, BM25 r8, MG r8)."""
    import math
    import tempfile

    from ..operators.sketches import heavy_hitters_exact
    from ..streaming.sketches import _tables, heavy_hitters_served, \
        ingest_batch, sketch_estimates

    e = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull())
    k = math.ceil(1.0 / _HH_PHI)
    root = tempfile.mkdtemp(prefix="samdis_stream_mg_")
    events, sketch = _tables(root)
    app = "mg_twin"
    ingest_batch(events, sketch, e.filter(F.col("event_id") % 2 == 0),
                 0, "user_id", k, app)
    ingest_batch(events, sketch, e.filter(F.col("event_id") % 2 == 1),
                 1, "user_id", k, app)

    served = heavy_hitters_served(spark, root, "user_id", _HH_PHI)
    batch = heavy_hitters_exact(e, "user_id", _HH_PHI)
    served.persist()
    batch.persist()
    try:
        hh_ok = (served.exceptAll(batch).count() == 0
                 and batch.exceptAll(served).count() == 0)

        sk, n = sketch_estimates(spark, root)
        exact = (e.groupBy("user_id")
                 .agg(F.count(F.lit(1)).alias("cnt")))
        n_exact = int(e.count())
        joined = sk.join(exact, "user_id", "left")
        bad = joined.filter(
            F.col("cnt").isNull()
            | (F.col("weight") > F.col("cnt"))
            | (F.col("cnt") - F.col("weight") > n / (k + 1.0))).count()
        bounds_ok = bad == 0 and n == n_exact
        sketch_bounded = sk.count() <= k
        superset_ok = (batch.select("user_id")
                       .join(sk.select("user_id"), "user_id",
                             "left_anti").count() == 0)
        n_heavy = served.count()
    finally:
        served.unpersist()
        batch.unpersist()
    return spark.createDataFrame(
        [(int(n_heavy), bool(sketch_bounded), bool(bounds_ok),
          bool(superset_ok), bool(hh_ok))],
        "n_heavy long, sketch_bounded boolean, "
        "estimate_bounds_ok boolean, superset_ok boolean, "
        "hh_match boolean")


@register(
    "stream_approx_distinct_equiv",  # new r10, gated immediately
    # (slot: final_table demoted — green r1-r9; its FULL plan is a
    # subtree of the just-promoted prime_query_sql gate (which
    # registers final_table as the `final` view) and the same table
    # is maintained incrementally under the gated
    # final_pipeline_incremental; the row keeps running in every
    # bench pass via bench=True and stays DuckDB-verified per pytest
    # run). Completes the streaming-twin symmetry for the LAST
    # mergeable sketch in the family (VERDICT r9 #4): per-batch
    # hll_sketch_agg partials folded into a stored binary via
    # hll_union_agg, replay-guarded from the events change feed,
    # <= n_groups rows of state; served through hll_sketch_estimate
    # with the approx_distinct_contract-style tolerance oracle
    # (exact arm pinned, flag literal TRUE — if the maintained
    # sketch ever drifts beyond 3% the hash mismatches).
    oracle=(
        "SELECT event_type, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact, "
        "TRUE AS within_3pct FROM events "
        "GROUP BY event_type ORDER BY event_type"))
def q_stream_approx_distinct_equiv(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Per-event-type distinct users arrive as three micro-batches
    through the exact per-batch ingest the foreachBatch sink runs
    (events append + HLL union fold from the events change feed,
    every leg replay-guarded); the estimate served THROUGH the
    maintained binary sketch must land within 3% of the exact
    COUNT(DISTINCT) per group (observed exact at these scales — the
    DataSketches HLL is in sparse mode), with the exact arm computed
    over the pinned events snapshot so the row is a full hash."""
    import tempfile

    from ..streaming.distinct import (_tables, distinct_contract_served,
                                      ingest_batch)

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id")
    root = tempfile.mkdtemp(prefix="samdis_stream_hll_")
    events, sketch = _tables(root)
    for i in range(3):
        ingest_batch(events, sketch,
                     e.filter(F.col("event_id") % 3 == i),
                     i, "user_id", app_id="hll_twin",
                     group_col="event_type")
    return (distinct_contract_served(spark, root, "user_id",
                                     group_col="event_type")
            .orderBy("event_type"))


@register(
    "order_price_outliers",  # promoted into the driver window r4.
    # Demoted r8 after green r5-r7: the grouped robust-stats shape
    # stays gated via pricing_summary (grouped agg, benched) +
    # customer_order_ranks (window rank, benched), and the quantile
    # machinery stays DuckDB-verified per pytest run via
    # order_price_quantiles / order_price_quartile_bands /
    # approx_quantile_contract; slot goes to stream_bm25_index_equiv
    driver=False,
    oracle=(
        # z-score anomaly detection per priority group; population stddev
        # (stddev_pop ≡ Spark stddev_pop) — boundary values rounded away
        # from the 3σ edge by the data, counts are integers
        "WITH stats AS (SELECT o_orderpriority, AVG(o_totalprice) AS mu, "
        "stddev_pop(o_totalprice) AS sigma FROM orders GROUP BY 1) "
        "SELECT o.o_orderpriority, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "CAST(SUM(CASE WHEN ABS(o.o_totalprice - s.mu) > 3 * s.sigma "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers, "
        "ROUND(MAX(ABS(o.o_totalprice - s.mu) / s.sigma), 2) AS max_z "
        "FROM orders o JOIN stats s ON o.o_orderpriority = s.o_orderpriority "
        "GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"))
def q_order_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical anomaly detection: per-group z-score outliers (>3σ on
    population stddev). Two-pass shape — tiny per-group stats broadcast
    back over the fact — the scalable form of a quality-monitoring scan;
    the single-pass alternative is a window, which would shuffle the
    whole fact instead of 5 stat rows."""
    o = load_table(spark, sf_dir, "orders")
    stats = (o.groupBy("o_orderpriority")
             .agg(F.avg("o_totalprice").alias("mu"),
                  F.stddev_pop("o_totalprice").alias("sigma")))
    z = F.abs(F.col("o_totalprice") - F.col("mu")) / F.col("sigma")
    return (o.join(F.broadcast(stats), "o_orderpriority")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.when(F.abs(F.col("o_totalprice") - F.col("mu"))
                              > 3 * F.col("sigma"), 1).otherwise(0))
                 .cast("bigint").alias("n_outliers"),
                 F.round(F.max(z), 2).alias("max_z"))
            .orderBy("o_orderpriority"))


@register(
    "repeat_buyers_intersect",  # gated green r3+r4; slot rotated to
    # scd2_employee_sport_dim late r5 (pytest oracle parity continues)
    driver=False,
    oracle=(
        "SELECT o_custkey AS custkey FROM orders "
        "WHERE year(o_orderdate) = 1996 "
        "INTERSECT SELECT o_custkey FROM orders "
        "WHERE year(o_orderdate) = 1997 ORDER BY custkey"))
def q_repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op (→ left-semi over distinct in Catalyst): customers
    who ordered in both 1996 and 1997. Completes the set-op family
    (UNION via incremental_activity_agg, EXCEPT via small_spenders_except)."""
    o = load_table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey"))
    y97 = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey"))
    return y96.intersect(y97).orderBy("custkey")


@register(
    "customer_running_revenue",  # gated green r3+r4; slot rotated to
    # ann_lsh_recall_floor in r5 (pytest oracle parity still checks this)
    driver=False,
    oracle=(
        # DECIMAL accumulation is exact and associative, so DuckDB's
        # segment-tree window agg and Spark's running frame agree bitwise;
        # a DOUBLE running sum would drift on association order
        "SELECT o_custkey, o_orderkey, "
        "ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) "
        "AS running_revenue "
        "FROM orders ORDER BY o_custkey, o_orderkey"))
def q_customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative sum (explicit ROWS frame — the window-function
    family beyond rank/lag): per-customer revenue-to-date ordered by the
    unique o_orderkey, accumulated in DECIMAL for cross-engine exactness.
    One shuffle on the partition key; frames never cross partitions, so
    this scales like any keyed window."""
    from pyspark.sql import Window as W
    o = load_table(spark, sf_dir, "orders")
    w = (W.partitionBy("o_custkey").orderBy("o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    run = F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
    return (o.select("o_custkey", "o_orderkey",
                     F.round(run.cast("double"), 2).alias("running_revenue"))
            .orderBy("o_custkey", "o_orderkey"))


@register(
    "doc_length_histogram",  # gated green r3+r4; slot rotated to
    # mixture_token_budget late r5 (pytest oracle parity continues)
    driver=False,
    oracle=(
        "SELECT CAST(FLOOR(n_chars / 50) AS BIGINT) AS bucket, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(MIN(n_chars) AS BIGINT) AS min_chars, "
        "CAST(MAX(n_chars) AS BIGINT) AS max_chars "
        "FROM documents GROUP BY bucket ORDER BY bucket"))
def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of document lengths (corpus profiling — the
    first look any training-data pipeline takes at a new crawl dump).
    Pure integer arithmetic → bit-identical cross-engine; single partial+
    final agg, output rows bounded by the bucket count regardless of
    corpus size."""
    d = load_table(spark, sf_dir, "documents")
    b = F.floor(F.col("n_chars") / 50).cast("bigint")
    return (d.groupBy(b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("n_chars").cast("bigint").alias("min_chars"),
                 F.max("n_chars").cast("bigint").alias("max_chars"))
            .orderBy("bucket"))


@register(
    "approx_quantile_contract",  # promoted r3; rotated out r6 (triple-
    # green r3-r5; slot freed for txn_clone_readback — the quantile
    # shape stays gated via order_price_outliers; pytest parity continues)
    driver=False,
    oracle=(
        # pins the exact quantiles AND asserts the sketch landed within
        # 1% (literal TRUE): a drifting approx_percentile flips the
        # boolean and the hash mismatches — same contract pattern as
        # approx_distinct_contract
        "SELECT o_orderstatus, "
        "ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50_exact, "
        "TRUE AS p50_within_1pct, "
        "ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99_exact, "
        "TRUE AS p99_within_1pct "
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"))
def q_approx_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approx-quantile scale path with a checkable contract:
    approx_percentile (accuracy=10000, mergeable constant-memory sketch —
    the only affordable percentile at 100 TB) must land within 1% of the
    exact interpolated percentile per group. Complements
    approx_distinct_contract; order_price_quantiles already pins the
    exact-percentile parity this contract measures against."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("e50"),
        F.expr("percentile(o_totalprice, 0.99)").alias("e99"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("a50"),
        F.expr("approx_percentile(o_totalprice, 0.99, 10000)").alias("a99"))
    return (agg.select(
        "o_orderstatus",
        F.round("e50", 2).alias("p50_exact"),
        (F.abs(F.col("a50") - F.col("e50")) / F.col("e50") <= 0.01)
        .alias("p50_within_1pct"),
        F.round("e99", 2).alias("p99_exact"),
        (F.abs(F.col("a99") - F.col("e99")) / F.col("e99") <= 0.01)
        .alias("p99_within_1pct"))
        .orderBy("o_orderstatus"))


@register(
    "order_price_quartile_bands",  # promoted r3; rotated out r6 (triple-
    # green r3-r5; slot freed for txn_metadata_counts — the window-rank
    # shape stays gated via customer-rank twins; pytest parity continues)
    driver=False,
    oracle=(
        # ntile ordering includes the unique o_orderkey tiebreak so bucket
        # assignment is total-ordered — identical in both engines
        "WITH t AS (SELECT o_orderpriority, o_totalprice, "
        "CAST(ntile(4) OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile "
        "FROM orders) "
        "SELECT o_orderpriority, quartile, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "ROUND(MIN(o_totalprice), 2) AS min_price, "
        "ROUND(MAX(o_totalprice), 2) AS max_price "
        "FROM t GROUP BY o_orderpriority, quartile "
        "ORDER BY o_orderpriority, quartile"))
def q_order_price_quartile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile() bucketing (the remaining ranking-window family member
    beyond rank/lag/running-frame): quartile bands of order value within
    each priority, reduced to per-band count + price range. One shuffle on
    the partition key; output bounded at groups × 4 rows regardless of
    fact size."""
    from pyspark.sql import Window as W
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (o.select("o_orderpriority", "o_totalprice",
                     F.ntile(4).over(w).cast("int").alias("quartile"))
            .groupBy("o_orderpriority", "quartile")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.min("o_totalprice"), 2).alias("min_price"),
                 F.round(F.max("o_totalprice"), 2).alias("max_price"))
            .orderBy("o_orderpriority", "quartile"))


# --- skew-mitigation bench pair (r13, VERDICT r12 #6) -------------------
# A deliberately hot-keyed fixture: HALF of lineitem's join keys collapse
# onto ONE part key, so a plain shuffle join puts ~300k of 600k fact rows
# (sf0.1) on a single reducer — the 100 TB straggler shape. The salted
# operator row and the plain baseline compute the identical answer under
# identical conf (broadcast OFF: the modeled scenario is a dim too big to
# broadcast, which is when operators/skew.py applies; AQE skew-join OFF:
# its documented gap — the engine must pre-partition, or the join is not
# an SMJ). bench.py times BOTH every round (the baseline rides the same
# two-pass-min loop as a pseudo-entry) and gates skew_ratio =
# salted/plain < 0.95, so "salting beats the plain shuffle at the same
# answer" is a measured claim, not prose; result parity between the two
# plans is pinned at tests/test_scale_paths.py.

# revenue aggregates as EXACT integer cents (ADVICE r13: the hot key
# sums ~19M doubles under two different partitionings — salted vs
# plain — and FP summation order can drift past a cent at that
# magnitude, making a ROUND(SUM(double), 2) parity pin flake-prone at
# larger SFs; per-row cents are exact for 2-decimal prices and bigint
# summation is order-independent)
_SKEW_ORACLE = (
    "SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS cnt, "
    "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
    "AS revenue_cents "
    "FROM (SELECT CASE WHEN l_orderkey % 2 = 0 THEN 1 "
    "ELSE l_partkey END AS k, l_extendedprice FROM lineitem) f "
    "JOIN (SELECT CASE WHEN p_partkey <= 64 THEN 1 ELSE p_partkey END "
    "AS k, p_brand FROM part) p USING (k) "
    "GROUP BY p_brand ORDER BY p_brand")


def _skew_fixture(spark: SparkSession, sf_dir: str):
    # the skew lands on the JOIN OUTPUT, not the shuffle: half the fact
    # keys collapse onto key 1, and key 1 carries 64 dim matches (parts
    # 1..64 remapped), so the plain join's hot reducer emits and
    # aggregates ~19M rows at sf0.1 while a balanced one handles ~10k
    # — the straggler dominates the stage without inflating the shuffle
    # itself (a 20x-replicated-shuffle variant of this fixture spilled
    # and measured memory pressure, not skew)
    li = load_table(spark, sf_dir, "lineitem")
    fact = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(1))
        .otherwise(F.col("l_partkey")).alias("k"),
        "l_extendedprice",
        # row-unique salt source: a key-derived salt would keep the hot
        # key on one reducer (see salted_join's docstring)
        F.xxhash64("l_orderkey", "l_linenumber").alias("_rowid"))
    dim = load_table(spark, sf_dir, "part").select(
        F.when(F.col("p_partkey") <= 64, F.lit(1))
        .otherwise(F.col("p_partkey")).alias("k"), "p_brand")
    return fact, dim


class _no_broadcast_no_aqe_skew:
    """Pin the comparison's conf: no auto-broadcast (the dim is a stand-
    in for one too big to broadcast) and no AQE skew-join rescue (the
    manual-salting use case is exactly where AQE can't help). Restores
    on exit."""

    _KEYS = ("spark.sql.autoBroadcastJoinThreshold",
             "spark.sql.adaptive.skewJoin.enabled")

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.saved = {k: self.spark.conf.get(k) for k in self._KEYS}
        self.spark.conf.set(self._KEYS[0], "-1")
        self.spark.conf.set(self._KEYS[1], "false")

    def __exit__(self, *exc):
        for k, v in self.saved.items():
            self.spark.conf.set(k, v)


def skew_plain_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-keyed join, plain shuffle — the STRAGGLER baseline bench.py
    times as skew_ratio's denominator: the partition holding key 1 does
    half the stage's work, and that wall-clock IS the cost salting
    removes. Deliberately NOT a registry row: its answer is byte-equal
    to skew_salted_join's (pinned in tests/test_scale_paths.py), so a
    registry twin would be a permanently never-gated duplicate oracle
    — the shape the retired twin-allowlist existed to police."""
    fact, dim = _skew_fixture(spark, sf_dir)
    with _no_broadcast_no_aqe_skew(spark):
        out = (fact.join(dim, "k")
               .groupBy("p_brand")
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.sum(F.round(F.col("l_extendedprice") * 100)
                          .cast("bigint")).alias("revenue_cents"))
               .orderBy("p_brand"))
        rows = out.collect()  # execute INSIDE the pinned conf; the
        # returned frame is the collected result (25 rows), so callers
        # never silently re-run the join under different conf
    return spark.createDataFrame(rows, out.schema)


@register(
    "skew_salted_join",  # new r13, gated immediately (slot:
    # stream_quantiles_equiv demoted — green r9-r12; the flat
    # streaming-quantile machinery survives STRICTLY HARDER in the
    # still-gated stream_grouped_quantiles_equiv — per-group frozen-grid
    # histograms over the same fold/serve core — the batch family stays
    # gated via grouped_quantiles_prod, and the row stays benched +
    # DuckDB-verified per pytest run). VERDICT r12 #6 — the mitigation:
    # operators/skew.salted_join spreads the hot key over 32 salt
    # buckets (fact side appends a row-unique salt, dim side explodes
    # x32), so no reducer owns more than ~1/32 of the hot key. Same
    # answer and conf as the skew_plain_baseline bench leg; bench.py
    # gates salted/plain < 0.95 every round (observed quiet ~0.5).
    bench=True, oracle=_SKEW_ORACLE)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-keyed join through salted_join (operators/skew.py): the
    shuffle key becomes (k, salt), the dim replicates x buckets — hot
    work spreads across the cluster instead of one straggler."""
    from ..operators.skew import salted_join

    fact, dim = _skew_fixture(spark, sf_dir)
    with _no_broadcast_no_aqe_skew(spark):
        out = (salted_join(fact, dim, on="k", buckets=32,
                           salt_from="_rowid")
               .groupBy("p_brand")
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.sum(F.round(F.col("l_extendedprice") * 100)
                          .cast("bigint")).alias("revenue_cents"))
               .orderBy("p_brand"))
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)
