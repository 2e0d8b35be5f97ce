"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The query inventory lives in ``emdatapipelines_spark/queries/`` — one entry
per implemented operator from SURVEY.md §2 plus the LLM-data extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: nation-level yearly revenue
    trend with YoY LAG — the `disaster_analytics` shape from SURVEY §7.2.2
    (scan → broadcast dim join → agg → window → scalar funcs)."""
    from emdatapipelines_spark.functions.macros import surrogate_key
    from emdatapipelines_spark.operators.windows import lag_over, trend_label
    from emdatapipelines_spark.queries.registry import dsum, t

    sf_dir = "/root/testdata/sf0.001"
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")

    joined = orders.join(customer, orders["o_custkey"] == customer["c_custkey"]).join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
    )
    yearly = joined.groupBy(
        F.col("n_name").alias("nation_name"),
        F.year("o_orderdate").cast("int").alias("order_year"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    prev = lag_over("revenue", ["nation_name"], ["order_year"])
    yoy = F.round((F.col("revenue") - prev) * 100.0 / prev, 4)
    return (
        yearly.withColumn("prev_revenue", prev)
        .withColumn("yoy_pct", yoy)
        .withColumn("trend", trend_label(F.col("yoy_pct")))
        .withColumn("analytics_id", surrogate_key("nation_name", "order_year"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from emdatapipelines_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every oracle-checkable query."""
    from emdatapipelines_spark.queries import ORACLES

    return dict(ORACLES)
