"""Prefix-filtering exact Jaccard join (llmdata/dedup.py:
prefix_jaccard_pairs) — losslessness vs the full shingle self-join, the
prefix-pruning property, and threshold edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from emdatapipelines_spark.llmdata.dedup import (
    _shingles,
    ngram_jaccard_pairs,
    prefix_jaccard_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain falls on "
    "the quiet town and the river runs to the sea"
)

DOCS = [
    (1, BASE),
    (2, BASE + " tonight"),                      # near-dup of 1 (high jaccard)
    (3, BASE.replace("quick", "slow")),          # near-dup of 1
    (4, "completely different content about spark shuffles and joins"),
    (5, "another unrelated doc on parquet row groups and pruning"),
    (6, BASE),                                   # exact dup of 1 (jaccard 1.0)
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def _pairs(df_result):
    return {
        (r["id_a"], r["id_b"]): r["jaccard"] for r in df_result.collect()
    }


def test_matches_naive_exact_join(spark):
    """Prefix filtering is lossless: identical pair set AND identical
    jaccard values as the full shingle self-join at the same threshold."""
    d = _df(spark)
    for t in (0.5, 0.8):
        fast = _pairs(prefix_jaccard_pairs(d, n=3, threshold=t))
        naive = _pairs(ngram_jaccard_pairs(d, n=3, threshold=t))
        assert fast == naive and fast  # non-empty at these thresholds


def test_exact_dup_and_ordering(spark):
    out = _pairs(prefix_jaccard_pairs(_df(spark), n=3, threshold=0.95))
    assert out[(1, 6)] == 1.0
    assert all(a < b for a, b in out)


def test_prefix_index_is_smaller_than_full_index(spark):
    """The candidate-generating side indexes only |x|-ceil(t|x|)+1 shingles
    per doc — at t=0.8 that must be well under half the full shingle set."""
    d = _df(spark)
    full = d.select(F.explode(_shingles("text", 3))).count()
    t = 0.8
    sizes = [
        r[0] for r in d.select(F.size(_shingles("text", 3))).collect()
    ]
    import math

    prefix_total = sum(s - math.ceil(t * s) + 1 for s in sizes)
    assert prefix_total < 0.45 * full


def test_no_python_udf_in_plan(spark):
    plan = (
        prefix_jaccard_pairs(_df(spark), n=3, threshold=0.8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_containment_pairs_directed_and_lossless(spark):
    """Planted doc-inside-doc: containment must fire A→B with high score
    while the symmetric Jaccard stays low; the prefix-filtered candidate
    path must equal the brute-force all-pairs computation."""
    import re

    from pyspark.sql import functions as F

    from emdatapipelines_spark.llmdata.dedup import containment_pairs

    core = "the quick brown fox jumps over the lazy dog near the river bank"
    container = core + " " + " ".join(f"filler{i} pad{i} extra{i}" for i in range(20))
    docs = [
        (1, core),                     # contained in 2
        (2, container),                # the big container
        (3, "completely different words about spark and shuffles here"),
        (4, core),                     # byte-identical to 1 -> mutual containment
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in containment_pairs(df, n=3, threshold=0.5).collect()
    }
    assert got[(1, 2)] == 1.0           # core fully inside container
    assert (2, 1) not in got            # container not inside core
    assert got[(1, 4)] == 1.0 and got[(4, 1)] == 1.0  # identical: both ways
    assert not any(3 in k for k in got)

    # brute force over trigram shingle sets — prefix filter must be lossless
    def shingles(text):
        tk = re.sub(r"\s+", " ", text.lower().strip()).split(" ")
        if len(tk) < 3:
            return {" ".join(tk)}
        return {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}

    sets = {i: shingles(t) for i, t in docs}
    want = {}
    for a in sets:
        for b in sets:
            if a == b:
                continue
            c = len(sets[a] & sets[b]) / len(sets[a])
            if c >= 0.5:
                want[(a, b)] = round(c, 6)
    assert got == want
