"""Iterative graph analytics: weighted PageRank.

The second iterative-algorithm pattern in the engine (the first is
connected components, `llmdata/dedup.py:connected_components`): a
fixed-iteration loop whose body is one join + one aggregate, expressed so
every pass is a single hash shuffle keyed by the destination node.

Use cases in a data-curation pipeline: centrality over a similarity or
citation graph ranks documents for sampling priority (the link-graph quality
signal web-corpus pipelines use); over an entity graph (the fixture query
ranks nations by trade flow) it is the standard influence score the
reference's analytics marts approximate with hand-built aggregates
(`dbt_projects/emergency_data/models/marts/disaster_analytics.sql` severity
rollups).

Determinism convention (FIXTURES.md): per-edge contributions are rounded to
``scale`` dp and summed in exact DECIMAL, so ranks are bit-identical across
partitionings and engines; the fixed iteration count (no convergence test)
keeps the oracle SQL expressible as ``iterations`` unrolled CTEs.

Scale notes: each iteration shuffles |edges| contribution rows to |nodes|
groups with map-side combine — the textbook Pregel superstep as a DataFrame
plan. Degrees are computed once. For many iterations add per-round
``localCheckpoint`` (see connected_components) to cap plan growth; at k ≤ 5
the plan stays small without it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_weighted(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 3,
    damping: float = 0.85,
    scale: int = 8,
) -> DataFrame:
    """Weighted PageRank over a directed edge list with positive integer
    weights. Returns ``(id, rank)`` for every node appearing as src or dst;
    nodes without in-edges hold the teleport base. Ranks are rounded to
    ``scale`` dp each iteration (see module docstring)."""
    outw = edges.groupBy(src).agg(F.sum(weight).alias("wtot"))
    # materialize the degree-annotated edge list and node spine ONCE: every
    # superstep joins against them, and without truncation Spark re-evaluates
    # the (possibly expensive) edge-derivation subtree per iteration while
    # the plan doubles in size (same device as connected_components)
    e = (
        edges.join(outw, src)
        .select(
            F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
            F.col(weight).alias("e_w"), "wtot",
        )
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # bounded driver scalar: node count
    if n == 0:
        # empty graph: no nodes to rank (and 1/n below would divide by zero)
        return nodes.select("id", F.lit(None).cast("double").alias("rank"))
    base = (1.0 - damping) / n
    r = nodes.withColumn("r", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = e.join(r, e["e_src"] == r["id"]).select(
            F.col("e_dst").alias("cid"),
            F.round(F.col("r") * F.col("e_w") / F.col("wtot"), scale).alias("contrib"),
        )
        mass = contrib.groupBy("cid").agg(
            F.sum(F.col("contrib").cast(f"decimal(28,{scale})")).cast("double").alias("m")
        )
        r = nodes.join(mass, nodes["id"] == mass["cid"], "left").select(
            nodes["id"],
            F.round(
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("m"), F.lit(0.0)), scale
            ).alias("r"),
        )
    return r.select("id", F.col("r").alias("rank"))
