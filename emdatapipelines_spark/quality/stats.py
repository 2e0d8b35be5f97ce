"""Statistical-dependence diagnostics: chi-square independence, Cramér's V,
mutual information.

The reference's quality layer tests columns one at a time
(`data_quality_ops.py` completeness/accuracy/consistency scans); this
module adds the BETWEEN-columns tests a profiling pipeline runs to find
structurally related fields — "is event mix independent of weekday?" for
drift monitoring, and MI as the model-free feature-relevance score.

Scale shape shared by both: the ONLY corpus-rate pass is the contingency
hash-agg to (x, y, count) cells; margins and totals are aggregates OF the
cell frame (cell-cardinality = |x|·|y|, a plan constant for categorical
columns) and broadcast back onto it. Per-cell contributions round to 8 dp
and sum in exact DECIMAL — the repo's partial-agg-order-proof convention —
so the statistics are bit-stable across any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _contingency(df: DataFrame, x_col: str, y_col: str):
    cells = df.groupBy(
        F.col(x_col).alias("__x"), F.col(y_col).alias("__y")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    rows_m = cells.groupBy("__x").agg(F.sum("o").cast("bigint").alias("nx"))
    cols_m = cells.groupBy("__y").agg(F.sum("o").cast("bigint").alias("ny"))
    joined = cells.join(F.broadcast(rows_m), "__x").join(
        F.broadcast(cols_m), "__y"
    )
    shape = rows_m.agg(F.count(F.lit(1)).cast("bigint").alias("r")).crossJoin(
        F.broadcast(cols_m.agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    ).crossJoin(
        F.broadcast(cells.agg(F.sum("o").cast("bigint").alias("n")))
    )
    return joined, shape


def _dsum8(c: Column) -> Column:
    return F.sum(F.round(c, 8).cast("decimal(28,8)")).cast("double")


def chi2_independence(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Pearson chi-square test of independence + Cramér's V over two
    categorical columns. Returns one row: n, r, c, dof, chi2, cramers_v.
    (No p-value: that needs the chi-square CDF, i.e. an incomplete-gamma
    routine neither engine exposes — dof + the statistic are the portable
    pair; V is the [0,1]-normalized effect size.)
    """
    joined, shape = _contingency(df, x_col, y_col)
    # chi-square sums over the FULL r×c grid: an empty cell is not a
    # missing term — it contributes (0−e)²/e = e. Rebuild the grid from
    # the margins (cell-cardinality cross of two tiny aggregates) and
    # left-join the observed counts; caught by the perfect-dependence
    # unit test (diagonal-only 2×2 must give chi2 = n, not n/2).
    rm = joined.select("__x", "nx").distinct()
    cm = joined.select("__y", "ny").distinct()
    grid = (
        rm.crossJoin(F.broadcast(cm))
        .join(joined.select("__x", "__y", "o"), ["__x", "__y"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0).cast("bigint")))
    )
    per = grid.crossJoin(F.broadcast(shape.select("n")))
    e = (F.col("nx") * F.col("ny") * F.lit(1.0)) / F.col("n")
    contrib = (F.col("o") - e) * (F.col("o") - e) / e
    stat = per.agg(_dsum8(contrib).alias("chi2_raw"))
    return (
        shape.crossJoin(F.broadcast(stat))
        .select(
            "n",
            "r",
            "c",
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
            F.round(F.col("chi2_raw"), 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2_raw")
                    / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
    )


def mutual_information(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Mutual information I(X;Y) in nats between two categorical columns,
    plus the marginal entropies and the min-entropy-normalized NMI —
    the model-free dependence score (0 = independent; NMI 1 = one column
    determines the other). Empty/observed cells only (0·ln 0 := 0 falls
    out naturally: absent cells contribute nothing).
    """
    joined, shape = _contingency(df, x_col, y_col)
    per = joined.crossJoin(F.broadcast(shape.select("n")))
    mi_c = (F.col("o") * 1.0 / F.col("n")) * F.log(
        (F.col("o") * F.col("n") * F.lit(1.0)) / (F.col("nx") * F.col("ny"))
    )
    mi = per.agg(_dsum8(mi_c).alias("mi_raw"))
    hx_c = -(F.col("nx") * 1.0 / F.col("n")) * F.log(F.col("nx") * 1.0 / F.col("n"))
    hy_c = -(F.col("ny") * 1.0 / F.col("n")) * F.log(F.col("ny") * 1.0 / F.col("n"))
    hx = (
        joined.select("__x", "nx").distinct()
        .crossJoin(F.broadcast(shape.select("n")))
        .agg(_dsum8(hx_c).alias("hx_raw"))
    )
    hy = (
        joined.select("__y", "ny").distinct()
        .crossJoin(F.broadcast(shape.select("n")))
        .agg(_dsum8(hy_c).alias("hy_raw"))
    )
    return (
        shape.select("n")
        .crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
        .select(
            "n",
            F.round(F.col("mi_raw"), 6).alias("mi_nats"),
            F.round(F.col("hx_raw"), 6).alias("h_x"),
            F.round(F.col("hy_raw"), 6).alias("h_y"),
            F.when(
                F.least(F.col("hx_raw"), F.col("hy_raw")) > 0,
                F.round(
                    F.col("mi_raw") / F.least(F.col("hx_raw"), F.col("hy_raw")), 6
                ),
            ).alias("nmi"),
        )
    )


def multi_column_entropy(df: DataFrame, specs: list[tuple[str, Column | str]]) -> DataFrame:
    """``column_entropy`` for several columns of the SAME frame in ONE scan
    (r14, guide §2.4): a per-column union re-plans and re-scans the source
    once per column (4 scans + 4 ingest exchanges for q16), while one
    explode to ``(column_name, value)`` rows feeds a single value-count
    hash-agg for all columns. Values are cast to string for the grouping
    key only — injective for the categorical/int inputs this profiler
    takes (and per column the cast is 1:1 incl. NULL), so every count,
    cardinality, entropy and modal share is IDENTICAL to the per-column
    path; the value itself is never emitted. Output: one row per spec,
    same schema/semantics as ``column_entropy``.
    """
    # r14 ADVICE: the string cast is injective ONLY for string/integral
    # inputs (float specs would merge -0.0/0.0 groups under native grouping
    # but split them as strings, and NaN repr differs) — enforce the
    # documented restriction instead of relying on the docstring. Schema
    # resolution is driver-side analysis, no job.
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    allowed = (StringType, ByteType, ShortType, IntegerType, LongType, BooleanType)
    resolved = df.select(
        *[
            (F.col(c) if isinstance(c, str) else c).alias(name)
            for name, c in specs
        ]
    ).schema
    for f in resolved.fields:
        if not isinstance(f.dataType, allowed):
            raise TypeError(
                f"multi_column_entropy spec {f.name!r} resolves to "
                f"{f.dataType.simpleString()}; only string/integral/boolean "
                "columns group identically under the string cast — use "
                "column_entropy for other types"
            )
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("column_name"),
                        (F.col(c) if isinstance(c, str) else c).cast("string").alias("v"),
                    )
                    for name, c in specs
                ]
            )
        ).alias("p")
    ).select("p.column_name", "p.v")
    per = pairs.groupBy("column_name", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # r15 (r14 ADVICE): n_tot as a window sum over the SAME per-frame —
    # the former per→tot groupBy + broadcast join planned the value-count
    # subtree twice (two scans in the formatted plan, deduped only by
    # runtime exchange reuse). One window partitioned by column_name makes
    # the single scan structural, and the final groupBy(column_name) below
    # reuses the window's partitioning (no extra exchange). Same exact
    # bigint totals.
    from pyspark.sql import Window

    j = per.withColumn(
        "n_tot",
        F.sum("cnt").over(Window.partitionBy("column_name")).cast("bigint"),
    )
    p_v = F.col("cnt") / F.col("n_tot")
    return (
        j.groupBy("column_name")
        .agg(
            F.max("n_tot").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("cardinality"),
            F.round(_dsum8(-p_v * F.log(p_v)), 6).alias("entropy_nats"),
            F.max("cnt").cast("bigint").alias("modal_count"),
        )
        .select(
            "column_name",
            "n",
            "cardinality",
            "entropy_nats",
            F.when(
                F.col("cardinality") > 1,
                F.round(
                    F.col("entropy_nats") / F.log(F.col("cardinality").cast("double")), 6
                ),
            ).alias("norm_entropy"),
            (F.col("modal_count").cast("double") / F.col("n")).alias("modal_share"),
        )
    )


def column_entropy(df: DataFrame, col: Column | str, name: str) -> DataFrame:
    """Shannon entropy profile of one column: H = Σ −p·ln p over the
    distinct-value frame, with cardinality, normalized entropy
    H/ln(cardinality) (1 = uniform, 0 = constant), and the modal share.
    The profiling signal schema-drift/anonymization monitors track per
    column (a near-zero entropy column is constant or broken; a
    max-entropy id-like column is a join key or a PII candidate).

    Corpus-rate work is one hash-agg to value counts; every ln term is
    rounded to 8 dp and summed in DECIMAL (the a32/q14 convention that
    makes transcendental sums engine-exact); modal share is an integer
    ratio.
    """
    c = F.col(col) if isinstance(col, str) else col
    per = df.groupBy(c.alias("v")).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    tot = per.agg(F.sum("cnt").cast("bigint").alias("n_tot"))
    j = per.crossJoin(F.broadcast(tot))
    p_v = F.col("cnt") / F.col("n_tot")
    return j.agg(
        F.lit(name).alias("column_name"),
        F.max("n_tot").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("cardinality"),
        F.round(_dsum8(-p_v * F.log(p_v)), 6).alias("entropy_nats"),
        F.max("cnt").cast("bigint").alias("modal_count"),
    ).select(
        "column_name",
        "n",
        "cardinality",
        "entropy_nats",
        F.when(
            F.col("cardinality") > 1,
            F.round(
                F.col("entropy_nats") / F.log(F.col("cardinality").cast("double")), 6
            ),
        ).alias("norm_entropy"),
        (F.col("modal_count").cast("double") / F.col("n")).alias("modal_share"),
    )

