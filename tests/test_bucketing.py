"""Bucketed co-located join: after bucketBy on the join key, the
lineitem⋈orders join must plan WITHOUT a shuffle on either side — the
pay-once partitioning that makes repeated fact-fact joins viable at
100 TB."""

from __future__ import annotations

import io as _io
import contextlib

from pyspark.sql import functions as F

from sport_advantages_moderne_data_infrastructure_spark.sources.io import (
    write_bucketed,
)
from sport_advantages_moderne_data_infrastructure_spark.sources.tables import (
    load_table,
)


def _plan(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], 8)
    write_bucketed(o, "o_bucketed", ["o_orderkey"], 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("li_bucketed")
             .join(spark.table("o_bucketed"),
                   F.col("l_orderkey") == F.col("o_orderkey")))
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        # and the result is right
        want = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert j.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
