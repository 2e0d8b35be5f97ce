

def test_zipf_fit_exact_inverse_law(spark):
    # cf = 12/rank exactly (12, 6, 4, 3): ln cf = ln 12 - 1·ln rank, so the
    # log-log OLS recovers slope -1 and r² = 1 to 6 dp.
    from emdatapipelines_spark.llmdata.text import zipf_fit

    vocab = spark.createDataFrame(
        [("the", 12), ("of", 6), ("and", 4), ("to", 3)], "term string, cf bigint"
    )
    r = zipf_fit(vocab).first()
    assert r["n_terms"] == 4
    assert abs(r["zipf_slope"] + 1.0) < 1e-5
    assert abs(r["r2"] - 1.0) < 1e-5
    assert abs(r["intercept"] - 2.484907) < 1e-5  # ln 12


def test_zipf_fit_caps_at_top_n(spark):
    from emdatapipelines_spark.llmdata.text import zipf_fit

    vocab = spark.createDataFrame(
        [(f"t{i}", 100 - i) for i in range(50)], "term string, cf bigint"
    )
    assert zipf_fit(vocab, top_n=10).first()["n_terms"] == 10
