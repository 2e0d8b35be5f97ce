"""Hand-computed checks: key-skew Gini profile, association-rule lift,
rolling median window.
"""

from datetime import datetime

from pyspark.sql import functions as F

from emdatapipelines_spark.operators.aggregates import basket_association_rules
from emdatapipelines_spark.operators.windows import rolling_median
from emdatapipelines_spark.quality.profile import key_skew_profile


def test_gini_uniform_keys_is_near_zero(spark):
    # 4 keys x 5 rows each: perfectly equal counts -> Gini 0.
    rows = [(k,) for k in "abcd" for _ in range(5)]
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_profile(df, "k").first()
    assert r["n_keys"] == 4 and r["total_rows"] == 20
    assert r["gini"] == 0.0 and r["top_share"] == 0.25
    assert r["skew_ratio"] == 1.0


def test_gini_concentrated_key(spark):
    # counts [1, 1, 1, 97]: sorted ranks 1..4, S=100
    # T = 1*1 + 2*1 + 3*1 + 4*97 = 394; G = (2*394 - 5*100)/(4*100) = 0.72
    rows = [("a",), ("b",), ("c",)] + [("hot",)] * 97
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_profile(df, "k").first()
    assert r["gini"] == 0.72 and r["top_share"] == 0.97


def test_gini_equal_count_block_formula(spark):
    # counts [1,1,2,2]: T = (1+2)*1 + (3+4)*2 = 17; S=6, n=4
    # G = (34 - 30)/24 = 0.166667 — exercises the m>1 rank-block path.
    rows = [("a",), ("b",), ("c",), ("c",), ("d",), ("d",)]
    r = key_skew_profile(spark.createDataFrame(rows, "k string"), "k").first()
    assert r["gini"] == 0.166667


def test_assoc_rules_lift(spark):
    # 4 baskets; x,y always together (2 baskets), z alone in the others.
    # lift(x,y) = (2 * 4) / (2 * 2) = 2.0; no (x,z) pair exists.
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "z"),
        (4, "z"),
    ]
    df = spark.createDataFrame(rows, "b int, it string")
    out = basket_association_rules(df, ["b"], "it").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["antecedent"], r["consequent"]) == ("x", "y")
    assert r["pair_cnt"] == 2 and r["support"] == 0.5
    assert r["confidence"] == 1.0 and r["lift"] == 2.0


def test_assoc_rules_duplicate_item_rows_collapse(spark):
    # the same item twice in one basket must count once (distinct guard)
    rows = [(1, "x"), (1, "x"), (1, "y")]
    r = basket_association_rules(spark.createDataFrame(rows, "b int, it string"), ["b"], "it").first()
    assert r["pair_cnt"] == 1 and r["lift"] == 1.0


def test_rolling_median_odd_even_frames(spark):
    rows = [("g", datetime(2024, 1, 1 + i), v) for i, v in enumerate([10, 2, 30, 4, 50])]
    df = spark.createDataFrame(rows, "g string, d timestamp, v bigint")
    med = rolling_median(df, "v", "d", ["g"], window_rows=3)
    out = [r["m"] for r in df.withColumn("m", med).orderBy("d").collect()]
    # frames: [10]->10; [10,2]->6; [10,2,30]->10; [2,30,4]->4; [30,4,50]->30
    assert out == [10.0, 6.0, 10.0, 4.0, 30.0]


def test_rolling_median_outlier_resistant_vs_mean(spark):
    rows = [("g", datetime(2024, 1, 1 + i), v) for i, v in enumerate([5, 5, 1000, 5, 5])]
    df = spark.createDataFrame(rows, "g string, d timestamp, v bigint")
    med = rolling_median(df, "v", "d", ["g"], window_rows=5)
    last = df.withColumn("m", med).orderBy("d").collect()[-1]
    assert last["m"] == 5.0  # the 1000 spike never surfaces


def test_chi2_perfect_dependence_and_independence(spark):
    from emdatapipelines_spark.quality.stats import chi2_independence, mutual_information

    # perfectly dependent 2x2: x == y; chi2 = n, V = 1
    dep = spark.createDataFrame([("a", "a")] * 10 + [("b", "b")] * 10, "x string, y string")
    r = chi2_independence(dep, "x", "y").first()
    assert r["n"] == 20 and r["dof"] == 1
    assert r["chi2"] == 20.0 and r["cramers_v"] == 1.0

    # independent uniform 2x2: chi2 = 0
    ind = spark.createDataFrame(
        [("a", "u"), ("a", "v"), ("b", "u"), ("b", "v")] * 5, "x string, y string"
    )
    r2 = chi2_independence(ind, "x", "y").first()
    assert r2["chi2"] == 0.0 and r2["cramers_v"] == 0.0

    # MI: dependent -> MI = ln 2, NMI = 1; independent -> 0
    m = mutual_information(dep, "x", "y").first()
    assert abs(m["mi_nats"] - 0.693147) < 1e-5 and m["nmi"] == 1.0
    m2 = mutual_information(ind, "x", "y").first()
    assert m2["mi_nats"] == 0.0 and m2["nmi"] == 0.0


def test_touch_attribution_first_last_and_window_edge(spark):
    from datetime import datetime
    from emdatapipelines_spark.operators.joins import touch_attribution

    base = datetime(2024, 1, 1, 12, 0, 0)

    def at(sec):
        return datetime(2024, 1, 1, 12, 0, 0).replace(
            hour=12 + (sec // 3600), minute=(sec % 3600) // 60, second=sec % 60
        )

    rows = [
        # user 1: view at t+0, click at t+100, purchase at t+200
        (1, at(0), 1, "view", 0.0, "{}"),
        (2, at(100), 1, "click", 0.0, "{}"),
        (3, at(200), 1, "purchase", 0.0, "{}"),
        # user 2: touch exactly 3601s before purchase -> OUTSIDE window
        (4, at(0), 2, "click", 0.0, "{}"),
        (5, at(3601), 2, "purchase", 0.0, "{}"),
        # user 3: touch at the same second as purchase -> excluded (-1 bound)
        (6, at(500), 3, "view", 0.0, "{}"),
        (7, at(500), 3, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    out = {r["purchase_id"]: r for r in touch_attribution(df).collect()}
    r1 = out[3]
    assert r1["first_touch_id"] == 1 and r1["first_touch_type"] == "view"
    assert r1["last_touch_id"] == 2 and r1["last_touch_type"] == "click"
    assert r1["n_touches"] == 2
    assert out[5]["n_touches"] == 0 and out[5]["first_touch_id"] is None
    assert out[7]["n_touches"] == 0  # same-second touch excluded by -1 bound
