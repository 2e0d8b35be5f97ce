"""Spatial radius join via grid-cell bucketing.

The reference's emergency-data domain (FEMA disasters, NOAA alerts, CoAgMet
stations — reference `ops/public_ops.py`, `dbt_projects/emergency_data`)
keys everything by state/county; the natural next query is "which stations /
facilities are within R km of each incident". A naive formulation is a
cross join with a distance predicate — quadratic, and Spark plans it as
BroadcastNestedLoopJoin. The scalable form is the classic grid trick:

  - bucket every point into a square cell of side >= R;
  - a qualifying pair must fall in the same cell or one of its 8 neighbors,
    so explode ONE side into its 3x3 cell neighborhood and equi-join on the
    cell id (shuffle keyed on cell — Catalyst plans a plain shuffled hash
    join);
  - verify the exact distance on the (output-bounded) candidate set.

This is EXACT (the grid only generates candidates; distance decides), one
shuffle each side, and skew-safe as long as cell side ~ R keeps per-cell
counts bounded — the same pattern as the bucketed shingle join in
`llmdata/dedup.py`. Works on any planar (x, y) coordinates; geographic
callers project lat/lon first (or use `haversine_km` with a degree-sized
grid via `radius_join(..., cell_size=...)` widened for the worst-case
latitude).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine, R=6371.0088) as JVM math
    expressions — for geographic callers; the planar fixture query avoids
    trig so its oracle is bit-stable."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) ** 2
    return F.lit(2 * 6371.0088) * F.asin(F.sqrt(a))


def radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    x: str = "x",
    y: str = "y",
    cell_size: float | None = None,
    dist_col: str = "dist",
) -> DataFrame:
    """All (left, right) pairs with planar distance <= ``radius``.

    ``left`` and ``right`` carry ``x``/``y`` columns (same units as
    ``radius``) plus any payload columns; payloads survive with ``l_``/``r_``
    prefixes. ``cell_size`` defaults to ``radius`` and must be >= it for
    exactness. The LEFT side is exploded 9x (choose the smaller side as
    left); the right side keeps one row per point, so the join moves
    |left|*9 + |right| rows — linear, never the |left|*|right| of the naive
    cross join.
    """
    if not radius > 0:
        raise ValueError(f"radius must be positive, got {radius}")
    cell = float(cell_size if cell_size is not None else radius)
    if cell < radius:
        raise ValueError(f"cell_size {cell} must be >= radius {radius}")

    def cells(df: DataFrame, prefix: str) -> DataFrame:
        renamed = df.select([F.col(c).alias(f"{prefix}{c}") for c in df.columns])
        return renamed.withColumn(
            "__cx", F.floor(F.col(f"{prefix}{x}") / cell).cast("long")
        ).withColumn("__cy", F.floor(F.col(f"{prefix}{y}") / cell).cast("long"))

    lneighbors = cells(left, "l_").withColumn(
        "__cell",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("__cx") + F.lit(dx)).alias("cx"),
                        (F.col("__cy") + F.lit(dy)).alias("cy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ),
    ).drop("__cx", "__cy")
    rcells = cells(right, "r_").withColumn(
        "__cell", F.struct(F.col("__cx").alias("cx"), F.col("__cy").alias("cy"))
    ).drop("__cx", "__cy")

    dx = F.col(f"l_{x}") - F.col(f"r_{x}")
    dy = F.col(f"l_{y}") - F.col(f"r_{y}")
    dist = F.sqrt(dx * dx + dy * dy)
    # Each right point lives in exactly one cell and the 9 exploded left
    # cells are distinct, so a pair matches at most once — no dedup needed.
    return (
        lneighbors.join(rcells, "__cell")
        .withColumn(dist_col, F.round(dist, 6))
        .filter(F.col(dist_col) <= F.lit(float(radius)))
        .drop("__cell")
    )


def derive_planar_point(key: Column, extent: float = 1000.0) -> tuple[Column, Column]:
    """Deterministic synthetic (x, y) in a ``extent``-km square from an
    integer key via Knuth multiplicative hashing — pure BIGINT arithmetic, so
    any engine derives bit-identical coordinates (the fixture tables carry no
    geography; real deployments replace this with projected coordinates)."""
    k = key.cast("bigint")
    xi = (k * F.lit(2654435761)) % F.lit(1_000_000)
    yi = (k * F.lit(40503) + F.lit(12345)) % F.lit(1_000_000)
    s = 1_000_000 / extent
    return (xi / F.lit(s)), (yi / F.lit(s))
