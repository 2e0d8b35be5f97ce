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


#: result checkpoints held for the PREVIOUS wrapped query only (freed on the
#: next wrapped call, after the driver has collected the previous result) —
#: bounds driver-side pinned residue to one small result frame.
_RESULT_RESIDUE: list[DataFrame] = []


def _pin_releasing(fn: Callable[[SparkSession, str], DataFrame]):
    """Close the cachectl loop for callers that never release (r12 ADVICE):
    the external driver runs each query and collects, with no post-collect
    hook — so a query that pins intermediates (eager localCheckpoints /
    persists on the cachectl ledger) would accumulate pinned blocks across
    the 50-query window, the exact gated-vs-isolated contention class
    VERDICT r11 #1 diagnosed. The wrapper makes release part of the query
    itself: if the fn pinned anything, eagerly checkpoint the (small) final
    result — materializing the whole plan once, same work the driver's
    collect would do — release ONLY the pins this fn made (scoped by
    cachectl.mark(), so marts/registry pins from other owners survive), and
    hand the driver the checkpointed frame. Queries that pin nothing pass
    through untouched (zero overhead on the other ~280)."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from emdatapipelines_spark import cachectl

        while _RESULT_RESIDUE:  # previous query's result: collected already
            prev = _RESULT_RESIDUE.pop()
            try:
                prev._jdf.queryExecution().analyzed().rdd().unpersist(False)
            except Exception:  # noqa: BLE001 - dead session/frame is already free
                pass
        m = cachectl.mark()
        try:
            df = fn(spark, sf_dir)
            if cachectl.tracked_count(since=m) == 0:
                return df
            ck = df.localCheckpoint(eager=True)
        except BaseException:
            # r13 ADVICE: without this, a query fn that raises AFTER
            # registering tracked pins would orphan them forever — later
            # wrapped calls release only tokens >= their own mark, and the
            # external driver never calls release_tracked() itself.
            cachectl.release_tracked(since=m)
            raise
        # Gauge the block-manager peak BEFORE releasing this query's pins:
        # the harness reads pinned bytes after the query returns, which for
        # wrapped pinning queries is after release (r13 ADVICE — the bench's
        # post-return read was dead for exactly the queries it targets).
        cachectl.note_pinned_high_water(spark)
        cachectl.release_tracked(since=m)
        _RESULT_RESIDUE.append(ck)
        return ck

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions).

    Caller contract: fully materialize (collect/write) each returned frame
    BEFORE invoking the next query callable. The wrapper frees the previous
    query's result checkpoint on the next call (bounding driver-side pinned
    residue to one result frame); a caller that builds several result
    frames first and collects later would hit a loud "checkpoint block not
    found" on the earlier frames — a freed localCheckpoint cannot
    recompute. The external driver (run one, collect, then next) and every
    in-repo harness satisfy this."""
    from emdatapipelines_spark.queries import QUERIES

    return {name: _pin_releasing(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL for every oracle-checkable query."""
    from emdatapipelines_spark.queries import ORACLES

    return dict(ORACLES)
