"""SemDeDup centroid-pruned semantic dedup + BPE round-trip gate units.

The hand case pins the three semantic rules: (a) nearest-centroid
assignment with round-6 cosine and lowest-cid ties, (b) a vector is a dup
iff an EARLIER same-cluster vector is >= threshold, (c) near-dup pairs
that straddle clusters do NOT mark anything (the SemDeDup within-cluster
contract — cross-cluster redundancy is the diversity the method keeps).
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry
from emdatapipelines_spark.llmdata.similarity import centroid_assign, semdedup

SF = "/root/testdata/sf0.001"


def _mk(spark):
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.14]),   # near v0, same cluster -> dup of 0
        (2, [0.0, 1.0]),
        (3, [0.1, 0.99]),    # near v2, same cluster -> dup of 2
        (5, [0.707107, 0.707107]),  # centroid tie -> lowest cid (100)
        (6, [0.69, 0.72]),   # cluster 101; cos(v5,v6)≈0.9998 but cross-cluster
    ]
    cents = [(100, [1.0, 0.0]), (101, [0.0, 1.0])]
    v = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    c = spark.createDataFrame(cents, "cid long, cv array<double>")
    return v, c


def test_centroid_assign_nearest_and_tie_break(spark):
    v, c = _mk(spark)
    got = {r["vec_id"]: r for r in centroid_assign(v, c).collect()}
    assert got[0]["cluster_id"] == 100
    assert got[1]["cluster_id"] == 100
    assert got[2]["cluster_id"] == 101
    assert got[3]["cluster_id"] == 101
    # exact tie at rounded cosine 0.707107 -> lowest centroid id wins
    assert got[5]["cluster_id"] == 100
    assert got[6]["cluster_id"] == 101
    assert got[0]["cos_c"] == 1.0


def test_semdedup_marks_within_cluster_dups_only(spark):
    v, c = _mk(spark)
    got = {r["vec_id"]: r for r in semdedup(v, c, threshold=0.9).collect()}
    assert len(got) == 6
    assert not got[0]["is_dup"] and got[0]["dup_of"] is None
    assert got[1]["is_dup"] and got[1]["dup_of"] == 0
    assert not got[2]["is_dup"]
    assert got[3]["is_dup"] and got[3]["dup_of"] == 2
    # v5/v6 cosine ≈ 0.9998 >= 0.9 but they live in different clusters:
    # SemDeDup keeps both (cross-cluster redundancy is retained diversity)
    assert not got[5]["is_dup"] and not got[6]["is_dup"]


def test_semdedup_survivor_rule_is_incremental(spark):
    """min-id survivor rule == cross-snapshot contract: adding later-id
    vectors never flips an earlier vector's is_dup/dup_of."""
    v, c = _mk(spark)
    before = {
        r["vec_id"]: (r["is_dup"], r["dup_of"])
        for r in semdedup(v.filter(F.col("vec_id") <= 2), c, threshold=0.9).collect()
    }
    after = {
        r["vec_id"]: (r["is_dup"], r["dup_of"])
        for r in semdedup(v, c, threshold=0.9).collect()
    }
    for vid, st in before.items():
        assert after[vid] == st


def test_bpe_roundtrip_gate_is_lossless_on_fixture(spark):
    rows = entry.queries()["lm_bpe_roundtrip"](spark, SF).collect()
    assert rows, "gate must emit one row per source"
    for r in rows:
        assert r["n_roundtrip_fail"] == 0
        assert r["n_roundtrip_ok"] == r["n_words"]
        # every word is >=1 subword + the end marker
        assert r["tokens_per_word_ppm"] >= 2_000_000
        assert r["chars_per_token_ppm"] > 0
