"""Bigram LM surprisal (llmdata/text.py: bigram_nll) — hand-computed tiny
corpus, short-doc exclusion, empty corpus, and a python-reference sweep."""

from __future__ import annotations

import math
import random
import re

from emdatapipelines_spark.llmdata.text import bigram_nll


def _reference(docs):
    toks = {
        i: re.sub(r"\s+", " ", t.lower().strip()).split(" ") for i, t in docs
    }
    pairs = {
        i: list(zip(tk, tk[1:])) for i, tk in toks.items() if len(tk) >= 2
    }
    c2: dict = {}
    for ps in pairs.values():
        for p in ps:
            c2[p] = c2.get(p, 0) + 1
    c1: dict = {}
    for (w1, _), c in c2.items():
        c1[w1] = c1.get(w1, 0) + c
    v = len({w for tk in toks.values() for w in tk})
    out = {}
    for i, ps in pairs.items():
        if not ps:
            continue
        s = sum(
            round(-math.log((c2[p] + 1.0) / (c1[p[0]] + float(v))), 8)
            for p in ps
        )
        out[i] = (len(ps), round(s / len(ps) * 1e6) / 1e6)
    return out


def test_bigram_nll_hand_computed(spark):
    docs = [(1, "a b a"), (2, "b a")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_nll(df).collect()}
    # c2: (a,b)=1, (b,a)=2; c1: a=1, b=2; V=2
    s_ab = round(-math.log((1 + 1.0) / (1 + 2.0)), 8)
    s_ba = round(-math.log((2 + 1.0) / (2 + 2.0)), 8)
    assert got[1]["n_bigrams"] == 2
    assert got[1]["avg_bigram_nll"] == round((s_ab + s_ba) / 2 * 1e6) / 1e6
    assert got[2]["n_bigrams"] == 1
    assert got[2]["avg_bigram_nll"] == round(s_ba * 1e6) / 1e6


def test_bigram_nll_short_docs_drop_out(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "two tokens")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in bigram_nll(df).collect()}
    assert ids == {2}


def test_bigram_nll_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = bigram_nll(df)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "n_bigrams",
        "avg_bigram_nll",
    ]


def test_bigram_nll_matches_python_reference(spark):
    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_bigram_nll"])
        for r in bigram_nll(df).collect()
    }
    assert got == _reference(docs)
