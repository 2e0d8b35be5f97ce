"""BM25 retrieval (llmdata/text.py: bm25_topk) — hand-computed scores on a
tiny corpus, idf ordering, determinism, and edge cases."""

from __future__ import annotations

import math

from emdatapipelines_spark.llmdata.text import bm25_topk

DOCS = [
    (1, "spark hash join"),          # matches both query terms
    (2, "hash hash hash table"),     # high tf for 'hash'
    (3, "sort merge join"),          # matches 'join' only
    (4, "nothing relevant here"),    # no match
    (5, "spark"),                    # short doc, rare term
]


def _expected(query, k1=1.2, b=0.75):
    import re
    toks = {i: re.sub(r"\s+", " ", t.lower().strip()).split(" ") for i, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        s, m = 0.0, 0
        for term in sorted(set(query)):
            tf = tk.count(term)
            if not tf:
                continue
            df = sum(1 for v in toks.values() if term in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
            m += 1
        if m:
            out[i] = (round(s, 6), m)
    return out


def test_bm25_matches_hand_computation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["score"], r["n_terms_matched"], r["rank"])
        for r in bm25_topk(df, ["hash", "spark"], k=10).collect()
    }
    want = _expected(["hash", "spark"])
    assert set(got) == set(want)
    for i, (s, m) in want.items():
        assert abs(got[i][0] - s) < 1e-6 and got[i][1] == m
    # ranks follow (score desc, doc_id)
    ranked = sorted(got.items(), key=lambda kv: kv[1][2])
    scores = [v[0] for _, v in ranked]
    assert scores == sorted(scores, reverse=True)


def test_bm25_rare_term_outranks_common(spark):
    # 'spark' appears in 2 docs, 'join' in 2 — make 'rare' appear once: a
    # doc matching only the rarer term must beat one matching only a much
    # more common term at equal tf/dl
    docs = [(i, "common filler words") for i in range(1, 8)]
    docs += [(100, "common target"), (200, "rare target")]
    for i in range(1, 8):
        docs[i - 1] = (i, "common filler words")
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_topk(df, ["common", "rare"], k=20).collect()}
    assert got[200] > got[100]


def test_bm25_topk_cut_and_empty(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top1 = bm25_topk(df, ["hash", "spark"], k=1).collect()
    assert len(top1) == 1 and top1[0]["rank"] == 1
    none = bm25_topk(df, ["zzz_absent"], k=5)
    assert none.count() == 0
    assert none.columns == ["doc_id", "score", "n_terms_matched", "rank"]
