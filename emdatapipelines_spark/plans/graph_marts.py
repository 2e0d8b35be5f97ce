"""Graph-family materialized models (VERDICT r9 #3).

The supplier co-occurrence edge list — a thresholded lineitem self-join —
is the shared root of the gr_* family: ``gr_triangles``,
``gr_clustering_coeff``, and ``gr_powerlaw_degree`` each independently
rebuild it when run standalone (their oracle contract requires a
self-contained plan). In a production pipeline you build it ONCE as an
async-refresh materialized view and serve the family from it — the
reference's MV surface (`macros/create_starrocks_materialized_view.sql:2-16`,
5-minute refresh cron `definitions.py:84-94`), here expressed as registry
models on `plans/registry.py` (S12).

Measured saving (sf0.1, local[32], see SCALING.md round-10): the three
standalone queries re-derive the edge list 3×; the mart builds it once and
the downstream models read the cache.

Usage::

    reg = ModelRegistry()
    register_graph_marts(reg, sf_dir)
    reg.build(spark, now=tick)          # graph_edges materializes once
    reg.results["graph_clustering"]     # served from the cached edge list
    reg.run_due(spark, later_tick)      # refresh cron: re-derives stale MVs
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import functions as F

from ..operators.graph import cooccurrence_edges, endpoint_degrees, triangle_count
from ..queries.registry import t
from .registry import ModelRegistry

#: same threshold as the standalone gr_* queries (their docstrings carry
#: the scale justification)
MIN_SHARED_ORDERS = 5


def register_graph_marts(
    registry: ModelRegistry,
    sf_dir: str,
    refresh_interval: timedelta = timedelta(minutes=5),
) -> None:
    """Register ``graph_edges`` (materialized, refresh-scheduled) and the
    downstream graph models that serve the gr_* family from it."""

    @registry.model(
        "graph_edges", materialization="table", refresh_interval=refresh_interval
    )
    def graph_edges(spark, deps):
        li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
        return cooccurrence_edges(
            li, "l_orderkey", "l_suppkey", min_shared=MIN_SHARED_ORDERS
        )

    @registry.model("graph_degrees", deps=["graph_edges"], materialization="table")
    def graph_degrees(spark, deps):
        return endpoint_degrees(deps["graph_edges"])

    @registry.model("graph_triangles", deps=["graph_edges"])
    def graph_triangles(spark, deps):
        return triangle_count(deps["graph_edges"], "src", "dst")

    @registry.model(
        "graph_clustering", deps=["graph_edges", "graph_degrees", "graph_triangles"]
    )
    def graph_clustering(spark, deps):
        """Same output row as the standalone ``gr_clustering_coeff``."""
        st = deps["graph_degrees"].agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.expr("CAST(SUM(d) div 2 AS BIGINT)").alias("n_edges"),
            F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("n_wedges"),
        )
        return st.crossJoin(F.broadcast(deps["graph_triangles"])).select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.expr(
                "CAST((3 * n_triangles * CAST(1000000 AS BIGINT)) div n_wedges"
                " AS BIGINT)"
            ).alias("global_clustering_ppm"),
        )

    @registry.model("graph_powerlaw", deps=["graph_degrees"])
    def graph_powerlaw(spark, deps):
        """Same output row as the standalone ``gr_powerlaw_degree`` (OLS of
        ln(count) on ln(degree) over the degree histogram; identical
        round-then-DECIMAL determinism ladder)."""
        hist = (
            deps["graph_degrees"]
            .groupBy("d")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        pts = hist.select(
            F.round(F.log(F.col("d").cast("double")), 8).alias("x"),
            F.round(F.log(F.col("cnt").cast("double")), 8).alias("y"),
        )
        dec = "decimal(28,8)"
        s = pts.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
            F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
            F.sum(F.round(F.col("x") * F.col("y"), 8).cast(dec))
            .cast("double")
            .alias("sxy"),
            F.sum(F.round(F.col("x") * F.col("x"), 8).cast(dec))
            .cast("double")
            .alias("sxx"),
        )
        slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        )
        return s.select(
            F.col("n").alias("n_degree_points"),
            (F.round(slope * 1000000.0) / 1000000.0).alias("loglog_slope"),
            (
                F.round((F.col("sy") - slope * F.col("sx")) / F.col("n") * 1000000.0)
                / 1000000.0
            ).alias("loglog_intercept"),
        )
