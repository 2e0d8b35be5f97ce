"""Behavioral pins for the round-10 corpus-statistics queries, beyond
their DuckDB oracle rows: mathematical invariants on the fixtures plus
hand-computable synthetic cases (written as parquet so the queries run
through their real load path).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q():
    return entry.queries()


# ---------------------------------------------------------------------------
# fixture invariants
# ---------------------------------------------------------------------------


def test_js_divergence_bounded(spark, q):
    """JSD is bounded by [0, ln 2] in nats, for every source."""
    rows = q["lm_js_divergence"](spark, SF).collect()
    assert rows, "no sources"
    for r in rows:
        assert 0.0 <= r["jsd_nats"] <= math.log(2) + 1e-9, r


def test_wasserstein_nonnegative_and_bounded(spark, q):
    """W1 >= 0, and cannot exceed the value range of the pooled grid."""
    rows = q["ts_wasserstein_drift"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["w1_distance"] >= 0.0, r
        assert r["w1_distance"] <= 500.0, r  # events.value spans ~[0, 490]


def test_permutation_test_p_value_range(spark, q):
    row = q["ml_permutation_test"](spark, SF).first()
    assert 0 < row["p_value"] <= 1.0
    assert 0 <= row["n_exceed"] <= row["n_perms"] == 32
    assert row["n_treat"] <= row["n_rows"]


def test_boilerplate_accounting(spark, q):
    rows = q["tx_boilerplate_chunks"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["distinct_boiler_chunks"] <= r["boiler_chunks"] <= r["n_chunks"]
        assert r["boiler_ppm"] == r["boiler_chunks"] * 1000000 // r["n_chunks"]


def test_subword_fertility_at_least_one(spark, q):
    """BPE-ish tokenization never merges across whitespace, so it yields
    at least one token per whitespace word: fertility_ppm >= 1e6."""
    for r in q["tx_subword_fertility"](spark, SF).collect():
        assert r["fertility_ppm"] >= 1000000, r


# ---------------------------------------------------------------------------
# hand-computable synthetic cases (real parquet load path)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def synth_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("r10synth"))
    docs = spark.createDataFrame(
        [
            # src_a and src_b have IDENTICAL unigram distributions -> JSD 0.
            (1, "alpha beta alpha", "en", "src_a", 16),
            (2, "alpha beta alpha", "en", "src_b", 16),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    events = spark.createDataFrame(
        [
            # type A: one event at 0.0, one at 1.0; type B: both at 0.0.
            # Pooled F jumps 0.5 at 0.0 (A) vs 0.75; gap 1.0:
            # W1(A, all) = |2*3 - 3*2| ... computed below in the test.
            (1, "2024-01-01 00:00:00", 10, "A", 0.0, "{}"),
            (2, "2024-01-01 00:00:01", 10, "A", 1.0, "{}"),
            (3, "2024-01-01 00:00:02", 11, "B", 0.0, "{}"),
            (4, "2024-01-01 00:00:03", 11, "B", 0.0, "{}"),
            # NULL measurement: must carry no distributional mass (and the
            # engines disagree on NULL sort position, so it must be
            # excluded, not merely tolerated).
            (5, "2024-01-01 00:00:04", 10, "A", None, "{}"),
        ],
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    events.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_js_divergence_zero_for_identical_distributions(spark, q, synth_dir):
    rows = {r["source"]: r for r in q["lm_js_divergence"](spark, synth_dir).collect()}
    assert set(rows) == {"src_a", "src_b"}
    for r in rows.values():
        assert r["jsd_nats"] == pytest.approx(0.0, abs=1e-6), r
        assert r["n_terms"] == 2 and r["source_tokens"] == 3


def test_wasserstein_hand_case(spark, q, synth_dir):
    """Grid 0.0/1.0; F_A = (0.5, 1), F_B = (1, 1), F_all = (0.75, 1).
    W1(A) = |0.5 - 0.75| * 1.0 = 0.25; W1(B) = |1 - 0.75| * 1.0 = 0.25."""
    rows = {r["event_type"]: r for r in q["ts_wasserstein_drift"](spark, synth_dir).collect()}
    assert rows["A"]["w1_distance"] == pytest.approx(0.25, abs=1e-9)
    assert rows["B"]["w1_distance"] == pytest.approx(0.25, abs=1e-9)
    assert rows["A"]["n_events"] == 2 and rows["A"]["n_buckets"] == 2


def test_boilerplate_synthetic_shared_chunk(spark, q, tmp_path):
    """Two docs sharing their (single) 8-token chunk + one unique doc:
    the shared chunk is boilerplate (df=2), the unique one is not."""
    d = str(tmp_path)
    eight = "w1 w2 w3 w4 w5 w6 w7 w8"
    other = "u1 u2 u3 u4 u5 u6 u7 u8"
    docs = spark.createDataFrame(
        [
            (1, eight, "en", "s1", len(eight)),
            (2, eight, "en", "s1", len(eight)),
            (3, other, "en", "s2", len(other)),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {r["source"]: r for r in q["tx_boilerplate_chunks"](spark, d).collect()}
    assert rows["s1"]["n_chunks"] == 2
    assert rows["s1"]["boiler_chunks"] == 2
    assert rows["s1"]["distinct_boiler_chunks"] == 1
    assert rows["s1"]["boiler_ppm"] == 1000000
    assert rows["s2"]["boiler_chunks"] == 0 and rows["s2"]["boiler_ppm"] == 0
