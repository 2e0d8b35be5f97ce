"""Distributed BPE (llmdata/bpe.py) — merge learning on the classic
Sennrich corpus shape, greedy-fold application, determinism across
partitionings, and the encode path."""

from __future__ import annotations

from collections import Counter

from emdatapipelines_spark.llmdata.bpe import apply_bpe, learn_bpe_merges


def _py_bpe(texts, k):
    """Reference implementation (greedy left-to-right merge application)."""
    import re

    words = Counter()
    for t in texts:
        for tok in re.sub(r"\s+", " ", t.strip().lower()).split(" "):
            w = re.sub(r"[^a-z0-9]", "", tok)
            if w:
                words[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in words.items()}
    out = []
    for step in range(1, k + 1):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        m = max(pc.values())
        a, b = sorted(p for p, c in pc.items() if c == m)[0]
        out.append((step, a, b, a + b, m))
        nv = {}
        for syms, c in vocab.items():
            res = [syms[0]]
            for x in syms[1:]:
                if res[-1] == a and x == b:
                    res[-1] = a + b
                else:
                    res.append(x)
            nv[tuple(res)] = nv.get(tuple(res), 0) + c
        vocab = nv
    return out


TEXTS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "new new newer newer",
]


def _df(spark, parts=4):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id bigint, text string"
    ).repartition(parts)


def test_merges_match_reference(spark):
    got = [tuple(r) for r in learn_bpe_merges(_df(spark), k=5).collect()]
    assert got == _py_bpe(TEXTS, 5)
    # sanity: the corpus's dominant pairs surface ('e','s' inside newest/widest
    # and 'es','t' or the 'n','e' of new* family, depending on counts)
    assert got[0][4] >= got[1][4] >= got[2][4]  # counts non-increasing


def test_partitioning_independent(spark):
    a = [tuple(r) for r in learn_bpe_merges(_df(spark, 1), k=4).collect()]
    b = [tuple(r) for r in learn_bpe_merges(_df(spark, 8), k=4).collect()]
    assert a == b


def test_early_stop_on_exhausted_vocab(spark):
    tiny = spark.createDataFrame([(1, "ab ab")], "doc_id bigint, text string")
    # word 'ab' -> symbols a,b,</w>: only 2 pairs exist, then 1, then none
    out = learn_bpe_merges(tiny, k=10).collect()
    assert 1 <= len(out) <= 3          # stops well before k=10
    assert out[0]["pair_count"] == 2   # 'ab' occurs twice -> pair weight 2


def test_apply_bpe_segments_with_learned_merges(spark):
    df = _df(spark)
    merges = [
        (r["sym_a"], r["sym_b"]) for r in learn_bpe_merges(df, k=5).collect()
    ]
    enc = apply_bpe(df, merges).select("doc_id", "bpe_tokens").collect()
    toks = {r["doc_id"]: r["bpe_tokens"] for r in enc}
    # every token stream is non-empty, every token is a learned symbol or
    # a residual char / end-marker, and joining tokens reconstructs the words
    merged_syms = {a + b for a, b in merges}
    for d, ts in toks.items():
        assert ts
        text = "".join(ts).replace("</w>", " ").strip()
        import re

        want = " ".join(
            re.sub(r"[^a-z0-9]", "", w)
            for w in re.sub(r"\s+", " ", TEXTS[d].strip().lower()).split(" ")
            if re.sub(r"[^a-z0-9]", "", w)
        )
        assert text == want
    # merges actually applied somewhere in the corpus (a doc whose words the
    # first k merges never touch legitimately stays at char level)
    assert any(t in merged_syms for ts in toks.values() for t in ts)
