"""Tagged-candidate single-pass sweeps (VERDICT r10 #1): filtering the
tagged frame at each probe setting must be BYTE-IDENTICAL to running the
family's per-setting top-k — the whole point is that `sim_ann_param_sweep`
re-prices settings without re-scoring, so any divergence here silently
changes the published recall table.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from emdatapipelines_spark.llmdata.similarity import (
    ivf_corpus_cells,
    ivf_cosine_topk,
    ivf_tagged_candidates,
    lsh_corpus_buckets,
    lsh_cosine_topk,
    lsh_tagged_candidates,
    topk_from_tagged,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ivf_tagged_matches_per_nprobe(spark, emb):
    q = emb.filter(F.col("vec_id") < 8)
    idx = ivf_corpus_cells(emb, nlist=16).localCheckpoint(eager=True)
    tagged = ivf_tagged_candidates(
        q, emb, nlist=16, max_nprobe=8, corpus_cells=idx
    ).localCheckpoint(eager=True)
    assert tagged.filter(F.col("min_nprobe") < 1).count() == 0
    assert tagged.filter(F.col("min_nprobe") > 8).count() == 0
    for p in (1, 2, 4, 8):
        direct = ivf_cosine_topk(q, emb, k=5, nlist=16, nprobe=p, corpus_cells=idx)
        via_tag = topk_from_tagged(tagged, "min_nprobe", p, k=5)
        assert _rows(via_tag) == _rows(direct), f"nprobe={p} diverged"


def test_lsh_tagged_matches_per_radius(spark, emb):
    q = emb.filter(F.col("vec_id") < 8)
    idx = lsh_corpus_buckets(emb, n_planes=8).localCheckpoint(eager=True)
    tagged = lsh_tagged_candidates(
        q, emb, n_planes=8, max_multiprobe=2, corpus_buckets=idx
    ).localCheckpoint(eager=True)
    # each (query, neighbor) pair appears exactly once — one bucket per
    # corpus vector, distinct probe keys
    n_pairs = tagged.select("query_id", "neighbor_id").distinct().count()
    assert tagged.count() == n_pairs
    for r in (0, 1, 2):
        direct = lsh_cosine_topk(
            q, emb, k=5, n_planes=8, multiprobe=r, corpus_buckets=idx
        )
        via_tag = topk_from_tagged(tagged, "min_radius", r, k=5)
        assert _rows(via_tag) == _rows(direct), f"multiprobe={r} diverged"


def test_tagged_candidate_volume_is_monotone(spark, emb):
    """The tag partitions the max-setting candidate set: smaller settings
    see a subset, and the subsets are nested."""
    q = emb.filter(F.col("vec_id") < 8)
    tagged = ivf_tagged_candidates(q, emb, nlist=16, max_nprobe=8).localCheckpoint(
        eager=True
    )
    counts = [tagged.filter(F.col("min_nprobe") <= p).count() for p in (1, 2, 4, 8)]
    assert counts == sorted(counts)
    assert counts[-1] == tagged.count()
