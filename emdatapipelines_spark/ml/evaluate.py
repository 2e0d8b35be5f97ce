"""Model-evaluation operators: ROC AUC, decile lift/gains, calibration.

The reference trains simple supervised models (`pipelines/dagster/
emergency_pipeline/ops/ml_ops.py` — RandomForest fit + a train/test
accuracy print) but publishes no evaluation surface beyond that single
accuracy number. This module adds the standard offline-eval trio any
scored pipeline needs — each expressed so the expensive passes stay
corpus-distributed and only score-band-cardinality frames ever meet a
global window:

* :func:`roc_auc` — exact Mann-Whitney/rank-sum AUC. One corpus-rate
  hash-agg collapses rows to per-distinct-score (pos, neg) counts; the
  cumulative pass then runs on that per-score frame, whose cardinality is
  bounded by the score's 6-dp rounding (≤ 1e6 + 1 rows), never by the
  corpus. Concordance is accumulated in INTEGER arithmetic (2·U as a
  bigint) so no float-association or partial-agg-order effect can move
  the result — the only division is the final AUC ratio.
* :func:`lift_table` — NTILE gains/lift by score decile. Runs on the
  model's daily-grain feature frame (dimension-sized: types × days); the
  total order under the NTILE breaks score ties by the full feature
  tuple + label so bucket boundaries are engine-deterministic even when
  scores collide.
* :func:`calibration_bins` — reliability-diagram data over fixed-width
  probability bins: pure groupBy, shuffle-free of any window, scales to
  any corpus.

Determinism convention (repo-wide): scores round to 6 dp at creation,
sums of scores go through DECIMAL, every emitted ratio rounds to 6 dp
with the same operand order as the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def score_linear(
    feats: DataFrame,
    weights: tuple[float, ...] = (-1.0, 0.4, 0.3),
    feature_cols: tuple[str, ...] = ("x1", "x2"),
    label_col: str = "y",
) -> DataFrame:
    """Attach ``score = round(sigmoid(b0 + Σ bi·xi), 6)`` from a FIXED
    weight vector — the deterministic stand-in for "a trained model's
    predictions" that both engines can replay bit-for-bit (6-dp rounding
    absorbs libm's ≤1-ulp exp() wiggle). Keeps the feature columns so
    downstream orderings can tie-break on them.
    """
    z = F.lit(weights[0])
    for wi, c in zip(weights[1:], feature_cols):
        z = z + F.lit(wi) * F.col(c)
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return feats.select(
        score.alias("score"), *(F.col(c) for c in feature_cols), F.col(label_col)
    )


def roc_auc(
    scored: DataFrame, score_col: str = "score", label_col: str = "y"
) -> DataFrame:
    """Exact ROC AUC via the rank-sum identity, ties at mid-rank:
    ``AUC = Σ_s pos_s·(neg_below_s + ½·neg_s) / (P·N)``.

    The per-score aggregation is the only corpus-rate pass (map-side
    combined hash-agg). The cumulative window then orders the per-score
    frame — bounded by score cardinality (6-dp probabilities ⇒ ≤ 1e6+1
    rows), a metadata-rate sort at any corpus size. The numerator is
    kept as ``2·U`` in bigint so every engine computes the identical
    integer; one final double division, rounded to 6 dp.
    """
    is_pos = F.col(label_col) == 1.0
    per = scored.groupBy(F.col(score_col).alias("score")).agg(
        F.sum(F.when(is_pos, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("pos"),
        F.sum(F.when(is_pos, F.lit(0)).otherwise(F.lit(1)))
        .cast("bigint")
        .alias("neg"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = per.withColumn(
        "below", F.coalesce(F.sum("neg").over(w), F.lit(0).cast("bigint"))
    )
    tot = cum.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_scores"),
        F.sum(F.col("pos") * (F.lit(2) * F.col("below") + F.col("neg")))
        .cast("bigint")
        .alias("u2"),
    )
    auc = F.round(
        F.col("u2") * 1.0 / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")), 6
    )
    return tot.select(
        "n_pos",
        "n_neg",
        "n_distinct_scores",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc).alias("auc"),
    )


def lift_table(
    scored: DataFrame,
    n_buckets: int = 10,
    score_col: str = "score",
    label_col: str = "y",
    tiebreak_cols: tuple[str, ...] = ("x1", "x2", "y"),
) -> DataFrame:
    """Gains/lift by score bucket: NTILE over score DESC, per-bucket hit
    rate, lift vs the global base rate, cumulative capture of positives.

    The NTILE's total order tie-breaks equal scores by the feature tuple
    and label, so rows that straddle a bucket boundary land identically
    in any engine; remaining ties are full-row duplicates, interchangeable
    under every emitted aggregate. Intended for dimension-sized scored
    frames (here: types × days); at corpus scale bucket by
    approx-quantile score boundaries instead of a global NTILE
    (documented divergence, same downstream arithmetic).
    """
    order = [F.desc(score_col)] + [F.col(c) for c in tiebreak_cols]
    ranked = scored.withColumn(
        "bucket", F.ntile(n_buckets).over(Window.orderBy(*order))
    )
    per = ranked.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col(label_col) == 1.0, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.sum("n_pos").cast("bigint").alias("p"),
    )
    wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n",
            "n_pos",
            F.round(F.col("n_pos") * 1.0 / F.col("n"), 6).alias("hit_rate"),
            F.round(
                (F.col("n_pos") * F.col("total") * F.lit(1.0))
                / (F.col("n") * F.col("p")),
                6,
            ).alias("lift"),
            F.round(
                F.sum("n_pos").over(wc) * 1.0 / F.col("p"), 6
            ).alias("cum_capture"),
        )
        .orderBy("bucket")
    )


def calibration_bins(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "score",
    label_col: str = "y",
) -> DataFrame:
    """Reliability-diagram bins: fixed-width probability buckets, each
    with count, mean predicted probability (exact-DECIMAL sum of the
    6-dp scores), observed positive rate, and the |gap| between them.
    Pure groupBy — no window anywhere — so it runs at full corpus scale
    unchanged.
    """
    bin_col = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    per = scored.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(
            F.sum(F.col(score_col).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_pred"),
        F.round(
            F.sum(F.when(F.col(label_col) == 1.0, F.lit(1)).otherwise(F.lit(0)))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("pos_rate"),
    )
    return per.select(
        "bin",
        "n",
        "avg_pred",
        "pos_rate",
        F.round(F.abs(F.col("avg_pred") - F.col("pos_rate")), 6).alias("calib_gap"),
    ).orderBy("bin")


def woe_iv(
    df: DataFrame,
    cat_col: str,
    label_col: str = "y",
) -> DataFrame:
    """Weight of Evidence per category + the feature's Information Value —
    the credit-scoring-era categorical-relevance encoding that still runs
    ahead of every scorecard/GBM feature cut:
    ``WOE_c = ln((pos_c/P)/(neg_c/N))``, ``IV = Σ (pos_c/P − neg_c/N)·WOE_c``.

    One corpus-rate hash-agg to per-category (pos, neg); totals broadcast
    back; the IV window runs over the category-cardinality frame. Zero
    cells yield NULL WOE (ln 0 is undefined; the caller decides between
    Laplace smoothing and dropping — silently smoothing would change the
    statistic). NULL-WOE categories contribute nothing to IV, mirroring
    SQL's SUM-skips-NULL.
    """
    is_pos = F.col(label_col) == 1.0
    per = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.sum(F.when(is_pos, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.when(is_pos, F.lit(0)).otherwise(F.lit(1)))
        .cast("bigint")
        .alias("n_neg"),
    )
    tot = per.agg(
        F.sum("n_pos").cast("bigint").alias("p"),
        F.sum("n_neg").cast("bigint").alias("n"),
    )
    j = per.crossJoin(F.broadcast(tot))
    woe_raw = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.log(
            (F.col("n_pos") * 1.0 / F.col("p"))
            / (F.col("n_neg") * 1.0 / F.col("n"))
        ),
    )
    contrib = (F.col("n_pos") * 1.0 / F.col("p") - F.col("n_neg") * 1.0 / F.col("n")) * woe_raw
    w = Window.partitionBy()
    return (
        j.withColumn("__woe_raw", woe_raw)
        .withColumn("__contrib", F.round(contrib, 8))
        .select(
            "category",
            "n_pos",
            "n_neg",
            F.round(F.col("__woe_raw"), 6).alias("woe"),
            F.round(
                F.sum(F.col("__contrib").cast("decimal(28,8)"))
                .over(w)
                .cast("double"),
                6,
            ).alias("iv"),
        )
        .orderBy("category")
    )


def average_precision(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "y",
    scale: int = 10**12,
) -> DataFrame:
    """Exact average precision (area under the precision-recall curve,
    step interpolation, tied scores treated as one atomic block — the
    standard AP):

    ``AP = (1/P) Σ_s pos_s · precision_at(s)`` over distinct scores s in
    descending order, ``precision_at(s) = cum_pos_s / cum_n_s``.

    The corpus-rate pass is ONE hash-agg to per-distinct-score (pos,
    neg); the cumulative window then runs on that score-band frame
    (≤ 1e6+1 rows under 6-dp scores). Every per-threshold term is kept
    in the INTEGER domain — ``floor(pos·cum_pos·scale / cum_n)`` via
    integer division — so partial-agg order and float association cannot
    move the sum; total truncation error is < n_distinct/(scale·P),
    invisible at the emitted 6-dp. The final value is likewise floored
    to ppm (``Σ div (P·1e6)``) and exactly represented as a double.
    Requires ``pos_s·cum_pos_s·scale`` within int64 (fine up to ~3M
    positives at the default scale; drop ``scale`` for larger corpora).
    """
    is_pos = F.col(label_col) == 1.0
    per = scored.groupBy(F.col(score_col).alias("score")).agg(
        F.sum(F.when(is_pos, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("pos"),
        F.sum(F.when(is_pos, F.lit(0)).otherwise(F.lit(1)))
        .cast("bigint")
        .alias("neg"),
    )
    w = Window.orderBy(F.desc("score")).rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "pos",
        F.sum("pos").over(w).alias("cum_pos"),
        (F.sum("pos").over(w) + F.sum("neg").over(w)).alias("cum_n"),
    )
    term = F.expr(f"(pos * cum_pos * CAST({scale} AS BIGINT)) div cum_n")
    tot = cum.select(
        "pos",
        "cum_pos",
        (F.col("cum_n") - F.col("cum_pos")).alias("__neg_cum"),
        term.alias("__t"),
    ).agg(
        F.max("cum_pos").cast("bigint").alias("n_pos"),
        F.max(F.col("__neg_cum")).cast("bigint").alias("n_neg"),
        F.sum("__t").cast("bigint").alias("__s"),
    )
    ap_ppm = F.expr("__s div (n_pos * CAST(1000000 AS BIGINT))")
    return tot.select(
        "n_pos",
        "n_neg",
        F.when(F.col("n_pos") > 0, ap_ppm / F.lit(1000000.0)).alias("avg_precision"),
    )


def brier_decomposition(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "score",
    label_col: str = "y",
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score over fixed-width
    probability bins: BRIER = REL − RES + UNC, where

        REL = Σ_k n_k (p̄_k − ȳ_k)² / N   (reliability — calibration error)
        RES = Σ_k n_k (ȳ_k − ȳ)² / N     (resolution — discrimination)
        UNC = ȳ (1 − ȳ)                  (irreducible base-rate variance)

    plus the direct BRIER = mean((p − y)²) for the identity check (exact
    when forecasts are constant per bin; the gap is the within-bin
    variance the binning discards — emitted as ``binning_residual``).

    One row out; two passes over the scored frame (a whole-frame moment
    aggregate and a 10-group bin aggregate), both pure groupBy, no window.
    Determinism: per-row and per-bin terms round to 8 dp then sum in
    exact DECIMAL (hash-agg order cannot move them); the final stats use
    the integer-domain round ladder at 6 dp.
    """
    y1 = F.when(F.col(label_col) == 1.0, F.lit(1)).otherwise(F.lit(0))
    tot = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(y1).cast("bigint").alias("npos"),
        F.sum(
            F.round((F.col(score_col) - F.col(label_col)) * (F.col(score_col) - F.col(label_col)), 8)
            .cast("decimal(28,8)")
        )
        .cast("double")
        .alias("sq"),
    )
    bin_col = F.least(F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1))
    per = scored.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        F.sum(F.col(score_col).cast("decimal(18,6)")).cast("double").alias("sp"),
        F.sum(y1).cast("bigint").alias("pk"),
    )
    pbar = F.col("sp") / F.col("nk")
    ybar_k = F.col("pk") * 1.0 / F.col("nk")
    ybar = F.col("npos") * 1.0 / F.col("n")
    terms = per.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.round(F.col("nk") * (pbar - ybar_k) * (pbar - ybar_k), 8).cast("decimal(28,8)")
        )
        .cast("double")
        .alias("rel_num"),
        F.sum(
            F.round(F.col("nk") * (ybar_k - ybar) * (ybar_k - ybar), 8).cast("decimal(28,8)")
        )
        .cast("double")
        .alias("res_num"),
        F.max("n").alias("n"),
        F.max("npos").alias("npos"),
        F.max("sq").alias("sq"),
    )
    lad = lambda c: F.round(c * 1000000.0) / 1000000.0  # noqa: E731
    yb = F.col("npos") * 1.0 / F.col("n")
    return terms.select(
        F.col("n").alias("n_obs"),
        lad(F.col("sq") / F.col("n")).alias("brier"),
        lad(F.col("rel_num") / F.col("n")).alias("reliability"),
        lad(F.col("res_num") / F.col("n")).alias("resolution"),
        lad(yb * (1.0 - yb)).alias("uncertainty"),
        lad(
            F.col("sq") / F.col("n")
            - (F.col("rel_num") / F.col("n") - F.col("res_num") / F.col("n") + yb * (1.0 - yb))
        ).alias("binning_residual"),
    )
