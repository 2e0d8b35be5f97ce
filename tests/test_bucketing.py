"""Bucketed-table co-located joins: the write-once-shuffle-never plan.

StarRocks' ``DISTRIBUTED BY HASH`` gives co-located joins implicitly; in
Spark that's ``bucketBy`` managed tables. These tests prove the property at
the plan level, not just by results.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from emdatapipelines_spark.io import write_bucketed_table
from emdatapipelines_spark.queries.registry import t

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = t(spark, SF, "orders")
    lineitem = t(spark, SF, "lineitem")
    write_bucketed_table(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # disable auto-broadcast so the join must rely on distribution — at real
    # scale neither side of a fact-fact join is broadcastable anyway
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("b_orders")
        b = spark.table("b_lineitem")
        joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: both sides pre-bucketed on o_orderkey → the join reads
        # buckets directly, no exchange on the join key (the groupBy key's
        # exchange after the join is expected and tiny)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_results_match_unbucketed(spark, bucketed):
    a = spark.table("b_orders")
    b = spark.table("b_lineitem")
    got = {
        r["o_orderstatus"]: r["n"]
        for r in a.join(b, "o_orderkey").groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    o = t(spark, SF, "orders")
    l = t(spark, SF, "lineitem")
    expected = {
        r["o_orderstatus"]: r["n"]
        for r in o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expected
