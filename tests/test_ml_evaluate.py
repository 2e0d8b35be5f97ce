"""Hand-computed checks for the ML-evaluation operators (ml/evaluate.py):
rank-sum AUC with mid-rank ties, NTILE lift arithmetic, calibration bins.
"""

from emdatapipelines_spark.ml.evaluate import (
    calibration_bins,
    lift_table,
    roc_auc,
    score_linear,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score double, x1 double, x2 double, y double")


def test_auc_perfect_separation(spark):
    rows = [(0.1, 0.0, 0.0, 0.0), (0.2, 0.0, 0.0, 0.0), (0.8, 0.0, 0.0, 1.0), (0.9, 0.0, 0.0, 1.0)]
    r = roc_auc(_scored(spark, rows)).first()
    assert r["auc"] == 1.0 and r["n_pos"] == 2 and r["n_neg"] == 2


def test_auc_ties_at_midrank(spark):
    # one pos and one neg share score 0.5 -> that pair contributes 0.5;
    # plus a clean concordant pair and a clean discordant pair.
    rows = [
        (0.5, 0.0, 0.0, 1.0),
        (0.5, 0.0, 0.0, 0.0),
        (0.9, 0.0, 0.0, 1.0),
        (0.95, 0.0, 0.0, 0.0),
    ]
    # pairs (pos, neg): (.5p,.5n)=0.5, (.5p,.95n)=0, (.9p,.5n)=1, (.9p,.95n)=0
    # AUC = 1.5 / 4 = 0.375
    r = roc_auc(_scored(spark, rows)).first()
    assert r["auc"] == 0.375
    assert r["n_distinct_scores"] == 3


def test_auc_single_class_is_null(spark):
    rows = [(0.3, 0.0, 0.0, 1.0), (0.6, 0.0, 0.0, 1.0)]
    assert roc_auc(_scored(spark, rows)).first()["auc"] is None


def test_lift_two_buckets(spark):
    # 4 rows, 2 buckets: top bucket (scores .9,.8) has 2 pos; bottom 0.
    rows = [
        (0.9, 1.0, 0.0, 1.0),
        (0.8, 2.0, 0.0, 1.0),
        (0.2, 3.0, 0.0, 0.0),
        (0.1, 4.0, 0.0, 0.0),
    ]
    out = lift_table(_scored(spark, rows), n_buckets=2).collect()
    top, bot = out[0], out[1]
    assert top["bucket"] == 1 and top["hit_rate"] == 1.0
    assert top["lift"] == 2.0  # 100% hit rate vs 50% base rate
    assert top["cum_capture"] == 1.0
    assert bot["n_pos"] == 0 and bot["lift"] == 0.0 and bot["cum_capture"] == 1.0


def test_calibration_perfectly_calibrated_bin(spark):
    # bin 7: two predictions 0.75, one positive of two -> pos_rate 0.5,
    # avg_pred 0.75, gap 0.25; bin 9 catches score exactly 1.0 via LEAST.
    rows = [
        (0.75, 0.0, 0.0, 1.0),
        (0.75, 0.0, 0.0, 0.0),
        (1.0, 0.0, 0.0, 1.0),
    ]
    out = {r["bin"]: r for r in calibration_bins(_scored(spark, rows)).collect()}
    assert out[7]["n"] == 2 and out[7]["avg_pred"] == 0.75
    assert out[7]["pos_rate"] == 0.5 and out[7]["calib_gap"] == 0.25
    assert 9 in out and out[9]["n"] == 1


def test_score_linear_is_6dp_sigmoid(spark):
    feats = spark.createDataFrame([(0.0, 0.0, 1.0)], "x1 double, x2 double, y double")
    r = score_linear(feats).first()
    # sigmoid(-1.0) = 0.268941...
    assert r["score"] == 0.268941
    assert set(r.asDict()) == {"score", "x1", "x2", "y"}


def test_woe_iv_hand_computed(spark):
    from emdatapipelines_spark.ml.evaluate import woe_iv

    # category a: 3 pos / 1 neg; category b: 1 pos / 3 neg; P = N = 4
    # WOE_a = ln((3/4)/(1/4)) = ln 3; WOE_b = ln((1/4)/(3/4)) = -ln 3
    # IV = (3/4-1/4)*ln3 + (1/4-3/4)*(-ln3) = ln 3 ≈ 1.098612
    rows = [("a", 1.0)] * 3 + [("a", 0.0)] + [("b", 1.0)] + [("b", 0.0)] * 3
    out = {r["category"]: r for r in woe_iv(
        spark.createDataFrame(rows, "category string, y double"), "category"
    ).collect()}
    assert abs(out["a"]["woe"] - 1.098612) < 1e-5
    assert abs(out["b"]["woe"] + 1.098612) < 1e-5
    assert abs(out["a"]["iv"] - 1.098612) < 1e-5


def test_woe_zero_cell_is_null_and_skipped_in_iv(spark):
    from emdatapipelines_spark.ml.evaluate import woe_iv

    rows = [("pure", 1.0)] * 2 + [("mixed", 1.0), ("mixed", 0.0), ("mixed", 0.0)]
    out = {r["category"]: r for r in woe_iv(
        spark.createDataFrame(rows, "category string, y double"), "category"
    ).collect()}
    assert out["pure"]["woe"] is None
    assert out["mixed"]["iv"] is not None  # IV still defined from mixed cell


def test_average_precision_hand_computed(spark):
    from emdatapipelines_spark.ml.evaluate import average_precision

    # scores desc: 0.9(+), 0.8(-), 0.7(+), 0.6(-)
    # AP = 1/2 * (1*1/1 + 1*2/3) = 0.833333 (floored at ppm)
    rows = [(0.9, 1.0), (0.8, 0.0), (0.7, 1.0), (0.6, 0.0)]
    r = average_precision(
        spark.createDataFrame(rows, "score double, y double")
    ).collect()[0]
    assert r["n_pos"] == 2 and r["n_neg"] == 2
    assert abs(r["avg_precision"] - 0.833333) < 2e-6


def test_average_precision_tied_scores_atomic_block(spark):
    from emdatapipelines_spark.ml.evaluate import average_precision

    # one score block: 2 pos + 2 neg tied -> precision 0.5 for all mass
    rows = [(0.5, 1.0), (0.5, 1.0), (0.5, 0.0), (0.5, 0.0)]
    r = average_precision(
        spark.createDataFrame(rows, "score double, y double")
    ).collect()[0]
    assert abs(r["avg_precision"] - 0.5) < 2e-6


def test_ridge_recovers_exact_linear_relation(spark):
    from emdatapipelines_spark.ml.logreg import ridge_closed_form_2d

    # y = 2*x1 + 3*x2 exactly; tiny lambda barely shrinks
    rows = [(1.0, 0.0, 2), (0.0, 1.0, 3), (1.0, 1.0, 5), (2.0, 1.0, 7)]
    r = ridge_closed_form_2d(
        spark.createDataFrame(rows, "x1 double, x2 double, y long"), lam=1e-6
    ).collect()[0]
    assert abs(r["b1"] - 2.0) < 1e-3 and abs(r["b2"] - 3.0) < 1e-3
    assert r["mse"] < 1e-5 and r["n"] == 4
