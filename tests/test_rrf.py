"""Reciprocal Rank Fusion (llmdata/similarity.py: rrf_fuse) — hand-computed
fused scores, missing-list handling, tie-breaks, and truncation."""

from __future__ import annotations

from emdatapipelines_spark.llmdata.similarity import rrf_fuse


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, rank int")


def test_rrf_hand_computed(spark):
    # doc 1 in both lists, doc 2 only lexical, doc 3 only dense
    lex = _frame(spark, [(1, 1), (2, 2)])
    den = _frame(spark, [(1, 2), (3, 1)])
    out = {
        r["doc_id"]: r
        for r in rrf_fuse([("bm25", lex), ("dense", den)], k=10).collect()
    }
    assert out[1]["rrf_score"] == round(1 / 61 + 1 / 62, 6)
    assert out[2]["rrf_score"] == round(1 / 62, 6)
    assert out[3]["rrf_score"] == round(1 / 61, 6)
    assert out[1]["rank_bm25"] == 1 and out[1]["rank_dense"] == 2
    assert out[2]["rank_dense"] is None and out[3]["rank_bm25"] is None
    # both-list doc outranks either single-list doc
    assert out[1]["fused_rank"] == 1


def test_rrf_tie_breaks_by_id_and_truncates(spark):
    # docs 5 and 7 each appear once at rank 1 → equal score, id breaks tie
    lex = _frame(spark, [(7, 1), (9, 2)])
    den = _frame(spark, [(5, 1), (9, 2)])
    rows = rrf_fuse([("bm25", lex), ("dense", den)], k=2).collect()
    assert [r["doc_id"] for r in rows] == [9, 5]  # 9 in both lists wins; 5 < 7
    assert [r["fused_rank"] for r in rows] == [1, 2]


def test_rrf_single_ranker_and_custom_k(spark):
    lex = _frame(spark, [(1, 1), (2, 2), (3, 3)])
    rows = rrf_fuse([("only", lex)], k=10, rrf_k=10).collect()
    by_id = {r["doc_id"]: r["rrf_score"] for r in rows}
    assert by_id == {1: round(1 / 11, 6), 2: round(1 / 12, 6), 3: round(1 / 13, 6)}


def test_rrf_empty_input_raises(spark):
    import pytest

    with pytest.raises(ValueError):
        rrf_fuse([])
