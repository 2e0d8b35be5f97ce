"""Hand-computed checks for Spearman rank correlation and lexical
diversity (registered queries ts_spearman_corr / tx_lexical_diversity —
these tests drive the same logic on tiny frames via the registry).
"""

from datetime import datetime

import __spark_entry__ as entry


def test_spearman_vs_pearson_on_monotone_outlier(spark, tmp_path):
    # type A rises 1..6; type B rises with A except one wild (but still
    # monotone-consistent) spike: Spearman sees a perfect monotone
    # relationship (rho = 1), Pearson would not.
    rows = []
    avals = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0]
    bvals = [1.0, 2.0, 3.0, 4.0, 5.0, 500.0]
    for i in range(6):
        d = datetime(2024, 1, 1 + i)
        rows.append((1, d, 1, "A", avals[i], "{}"))
        rows.append((2, d, 1, "B", bvals[i], "{}"))
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)
    # point the query at a directory shaped like an sf dir
    q = entry.queries()["ts_spearman_corr"]
    out = q(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("A", "B")
    assert r["spearman_rho"] == 1.0 and r["n_days"] == 6


def test_lexical_diversity_counts(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "en", "a a b c"),        # 4 tokens, 3 types, 2 hapax
            (2, "en", "x x x x"),        # 4 tokens, 1 type, 0 hapax
        ],
        "doc_id bigint, lang string, text string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    q = entry.queries()["tx_lexical_diversity"]
    out = {r["doc_id"]: r for r in q(spark, str(tmp_path)).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_types"] == 3
    assert out[1]["n_hapax"] == 2 and out[1]["ttr"] == 0.75
    assert out[1]["hapax_share"] == 0.666667
    assert out[2]["ttr"] == 0.25 and out[2]["hapax_share"] == 0.0
