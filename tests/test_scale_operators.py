"""Scale-path operators: salted skew join, approximate distinct counts,
IVF/LSH recall sanity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry
from emdatapipelines_spark.operators.joins import salted_join
from emdatapipelines_spark.queries.registry import t

SF = "/root/testdata/sf0.01"


def test_salted_join_matches_plain_join(spark):
    # heavily skewed left side: 90% of rows share one key
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("HOT")).otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame(
        [("HOT", 1), ("k950", 2), ("k999", 3)], "k string, rv int"
    )
    plain = left.join(right, "k").select("k", "lv", "rv")
    salted = salted_join(left, right, "k", salt_buckets=8).select("k", "lv", "rv")
    assert salted.count() == plain.count() == 902
    assert salted.exceptAll(plain).count() == 0 and plain.exceptAll(salted).count() == 0


def test_approx_distinct_within_rsd(spark):
    qs = entry.queries()
    approx = {r["l_returnflag"]: r for r in qs["a12_approx_distinct"](spark, SF).collect()}
    exact = {
        r["l_returnflag"]: r
        for r in t(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("suppliers"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    for flag, row in approx.items():
        assert abs(row["approx_suppliers"] - exact[flag]["suppliers"]) <= 0.05 * exact[flag]["suppliers"] + 2
        assert abs(row["approx_parts"] - exact[flag]["parts"]) <= 0.05 * exact[flag]["parts"] + 2


def test_training_mix_deterministic_and_proportional(spark):
    qs = entry.queries()
    a = {r["lang"]: r["sampled_docs"] for r in qs["llm_training_mix"](spark, SF).collect()}
    b = {r["lang"]: r["sampled_docs"] for r in qs["llm_training_mix"](spark, SF).collect()}
    assert a == b  # hash-mod sampling is deterministic by construction
    totals = {
        r["lang"]: r["n"]
        for r in t(spark, SF, "documents").groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    fractions = {"en": 0.8, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.25}
    for lang, frac in fractions.items():
        expected = totals[lang] * frac
        # Bernoulli sampling: allow 4 sigma
        sigma = (totals[lang] * frac * (1 - frac)) ** 0.5
        assert abs(a.get(lang, 0) - expected) <= 4 * sigma + 1, lang


def test_hash_sampler_edge_fractions(spark):
    from emdatapipelines_spark.llmdata.sampling import (
        hash_bucket_threshold,
        hash_stratified_sample,
    )

    assert hash_bucket_threshold(0.5) == "8000"
    assert hash_bucket_threshold(0.0) == "0000"
    assert hash_bucket_threshold(1.0) == "g"  # above all hex → keeps everything
    df = spark.range(500).select(F.col("id"), F.lit("en").alias("lang"))
    keep_all = hash_stratified_sample(df, "lang", {"en": 1.0}, "id")
    keep_none = hash_stratified_sample(df, "lang", {"en": 0.0}, "id")
    drop_stratum = hash_stratified_sample(df, "lang", {"other": 1.0}, "id")
    assert keep_all.count() == 500
    assert keep_none.count() == 0
    assert drop_stratum.count() == 0


def test_ivf_recall_against_exact(spark):
    qs = entry.queries()
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in qs["sim_cosine_topk"](spark, SF).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in qs["sim_ivf_topk"](spark, SF).collect()
    }
    # approximate search: meaningful overlap with the exact top-k (IVF probes
    # a fraction of cells; random fixture vectors are a worst case)
    assert len(ivf & exact) / len(exact) >= 0.2


def test_pack_sequences_plan_layout(spark):
    from emdatapipelines_spark.llmdata.sampling import pack_sequences_plan

    df = spark.createDataFrame(
        [(1, 1000), (2, 1000), (3, 5000), (4, 10), (5, 0), (6, 100)],
        "doc_id int, n_tokens int",
    )
    rows = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences_plan(df, "n_tokens", budget=2048, order_col="doc_id").collect()
    }
    # cumulative-before: doc1@0, doc2@1000, doc3@2000, doc4@7000, doc5@7010, doc6@7010
    assert rows == {1: 0, 2: 0, 3: 0, 4: 3, 5: 3, 6: 3}
    # pack ids never decrease along the layout order
    ordered = [rows[k] for k in sorted(rows)]
    assert ordered == sorted(ordered)


def test_ivf_kmeans_refinement_runs_and_keeps_recall(spark):
    from emdatapipelines_spark.llmdata.similarity import (
        brute_force_cosine_topk,
        ivf_cosine_topk,
    )
    from emdatapipelines_spark.queries.registry import t as load

    e = load(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_cosine_topk(q, e, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_cosine_topk(q, e, k=5, nlist=8, nprobe=2, kmeans_iters=2).collect()
    }
    assert len(ivf & exact) / len(exact) >= 0.2


def test_fuzzy_name_pairs_blocking_and_cap(spark):
    """Bigram blocking must find all close pairs without an all-pairs join;
    the hot-gram cap drops only candidates, never the distance math."""
    from emdatapipelines_spark.operators.joins import fuzzy_name_pairs

    names = ["alpha node", "alpho node", "beta node", "gamma link", "gamma lynk"]
    df = spark.createDataFrame([(n,) for n in names], "name STRING")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in fuzzy_name_pairs(df, "name", max_dist=2).collect()
    }
    assert ("alpha node", "alpho node", 1) in got
    assert ("gamma link", "gamma lynk", 1) in got
    # 'beta node' vs 'alpha node' is distance > 2 → excluded despite sharing grams
    assert not any("beta node" in pair[:2] and "alpha node" in pair[:2] for pair in got)
    # plan must not contain a cartesian product
    plan = fuzzy_name_pairs(df, "name")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_pq_recall_against_exact(spark):
    """Two-stage PQ (ADC shortlist + exact re-rank) must recover nearly the
    exact top-k; the raw ADC shortlist alone must still be far better than
    chance (the compressed index does real ranking work)."""
    from emdatapipelines_spark.llmdata.similarity import (
        brute_force_cosine_topk,
        pq_cosine_topk,
    )
    from emdatapipelines_spark.queries.registry import t

    emb = t(spark, SF, "embeddings")
    queries = emb.filter("vec_id % 100 = 0")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_cosine_topk(queries, emb, k=10).collect()
    }
    reranked = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_cosine_topk(
            queries, emb, k=10, m=32, n_centroids=64, oversample=4
        ).collect()
    }
    assert len(reranked & exact) / len(exact) >= 0.9
    raw = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_cosine_topk(
            queries, emb, k=10, m=32, n_centroids=64, rerank=False
        ).collect()
    }
    assert len(raw & exact) / len(exact) >= 0.4


def test_pq_train_deterministic_and_bounded(spark):
    """Codebooks must be identical across runs (hash-ordered sample + fixed
    Lloyd iterations) and constant-size regardless of corpus size."""
    import numpy as np

    from emdatapipelines_spark.llmdata.similarity import pq_train
    from emdatapipelines_spark.queries.registry import t

    emb = t(spark, SF, "embeddings")
    a = pq_train(emb, m=16, k=8, sample_cap=128)
    b = pq_train(emb, m=16, k=8, sample_cap=128)
    assert a.shape == (16, 8, 4)
    assert np.array_equal(a, b)
    # smaller sample than k: init cycles, shape still exact
    c = pq_train(emb.filter("vec_id < 5"), m=16, k=8, sample_cap=128)
    assert c.shape == (16, 8, 4)


def test_pagerank_weighted_known_graph(spark):
    """Hand-checkable PageRank: a 3-node chain a->b->c (+c->a to avoid
    dangling mass). With uniform weights and damping 0.85 the ranks must be
    uniform (the graph is a cycle); breaking symmetry by doubling one edge
    weight must strictly favor its destination."""
    from emdatapipelines_spark.operators.graph import pagerank_weighted

    cycle = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)], "src string, dst string, w long"
    )
    r = {x["id"]: x["rank"] for x in pagerank_weighted(cycle, iterations=3).collect()}
    assert len(r) == 3 and len(set(r.values())) == 1  # cycle symmetry → uniform

    skew = spark.createDataFrame(
        [("a", "b", 2), ("a", "c", 1), ("b", "a", 1), ("b", "c", 1), ("c", "a", 1)],
        "src string, dst string, w long",
    )
    r2 = {x["id"]: x["rank"] for x in pagerank_weighted(skew, iterations=5).collect()}
    assert r2["a"] > r2["c"]  # a receives full mass from c plus half from b
    # deterministic across runs (round-then-decimal-sum convention)
    r3 = {x["id"]: x["rank"] for x in pagerank_weighted(skew, iterations=5).collect()}
    assert r2 == r3


def test_lsh_multiprobe_improves_recall_and_query_self_validates(spark):
    """The multiprobe lever must do real work (strictly more candidates →
    higher recall than single-bucket probing on the same index), and the
    sim_lsh_topk query's self-validating recall_at_k column must clear the
    floor (random fixture vectors are ANN's worst case — real corpora with
    cluster structure score far higher)."""
    import statistics

    from emdatapipelines_spark.llmdata.similarity import (
        brute_force_cosine_topk,
        lsh_cosine_topk,
    )

    e = t(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_cosine_topk(q, e, k=5).collect()
    }

    def recall(mp):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_cosine_topk(q, e, k=5, dim=64, n_planes=6, multiprobe=mp).collect()
        }
        return len(got & exact) / len(exact)

    r0, r1 = recall(0), recall(1)
    assert r1 > r0  # probing Hamming-1 buckets recovers strictly more

    # the query entry carries the in-query recall column; floor on the mean
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["sim_lsh_topk"](spark, SF).collect()
    per_query = {r["query_id"]: r["recall_at_k"] for r in rows}
    assert statistics.mean(per_query.values()) >= 0.15


def test_pq_query_recall_column_is_perfect_on_fixture(spark):
    """sim_pq_topk's self-validating column: ADC shortlist + exact re-rank
    recovers the exact top-5 on the fixture (measured 1.0 recall)."""
    rows = entry.queries()["sim_pq_topk"](spark, SF).collect()
    assert rows and all(r["recall_at_k"] == 1.0 for r in rows)


def test_ivf_query_recall_column_clears_floor(spark):
    import statistics

    rows = entry.queries()["sim_ivf_topk"](spark, SF).collect()
    per_query = {r["query_id"]: r["recall_at_k"] for r in rows}
    assert statistics.mean(per_query.values()) >= 0.2


def test_minhash_lsh_candidates_superset_of_high_jaccard_pairs(spark):
    """The LSH banding guarantee: a pair with Jaccard ≥ 0.95 survives at
    least one of 16 bands of 4 rows with probability 1-(1-0.95^4)^16 ≈
    1-6e-13, so the candidate set must contain every high-Jaccard pair the
    exact operator finds (this is what makes dd_minhash_lsh's rows-only
    driver row meaningful: candidates aren't just *some* pairs, they are a
    provable superset of the true near-dups)."""
    from emdatapipelines_spark.llmdata.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    d = t(spark, SF, "documents")
    true_pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(d, n=3, threshold=0.95).collect()
    }
    assert true_pairs  # fixture contains near-duplicate documents
    sigs = minhash_signatures(d, n=3, num_hashes=64)
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(sigs, bands=16, rows_per_band=4).collect()
    }
    assert true_pairs <= cands


def test_hll_monthly_rollup_within_rated_error_of_exact(spark):
    """a21's fixture-level error bound: the merged monthly HLL estimate must
    sit within the sketch's rated relative error of the exact distinct
    count (lgConfigK=12 → ~1.6% RSE; assert 5% for slack)."""
    qs = entry.queries()
    est = {r["month"]: r["approx_distinct"] for r in qs["a21_hll_distinct_rollup"](spark, SF).collect()}
    exact = {
        r["month"]: r["n"]
        for r in t(spark, SF, "events")
        .select(F.date_trunc("month", F.col("ts")).cast("date").alias("month"), "user_id")
        .groupBy("month")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for m, n in exact.items():
        assert abs(est[m] - n) <= max(0.05 * n, 2), (m, est[m], n)


def test_incremental_minhash_dedup_flags_copies_and_updates_index(spark):
    """Snapshot-over-snapshot dedup: an exact copy of an indexed doc MUST be
    flagged with est_jaccard 1.0; fresh docs survive and their signatures
    join the index; flagged docs' signatures do NOT (append-only index)."""
    from emdatapipelines_spark.llmdata.dedup import (
        incremental_minhash_dedup,
        minhash_signatures,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # exact copy of 1
            (11, "completely different sentence about sparkly distributed engines"),
        ],
        "doc_id bigint, text string",
    )
    index = minhash_signatures(corpus, n=3, num_hashes=64)
    step = incremental_minhash_dedup(batch, index, threshold=0.8)
    flagged = {(r["id"], r["idx_id"]): r["est_jaccard"] for r in step["flagged"].collect()}
    assert flagged.get((10, 1)) == 1.0
    assert all(k[0] != 11 for k in flagged)
    survivors = {r["doc_id"] for r in step["survivors"].collect()}
    assert survivors == {11}
    idx_ids = sorted(r["id"] for r in step["updated_index"].collect())
    assert idx_ids == [1, 2, 11]


def test_incremental_dedup_near_but_not_exact_copy_flagged(spark):
    """A near-duplicate (one token changed in a long doc) clears the 0.8
    estimated-Jaccard threshold; a disjoint doc never collides."""
    from emdatapipelines_spark.llmdata.dedup import (
        dedup_against_index,
        minhash_signatures,
    )

    base = " ".join(f"tok{i}" for i in range(200))
    near = " ".join(("CHANGED" if i == 100 else f"tok{i}") for i in range(200))
    corpus = spark.createDataFrame([(1, base)], "doc_id bigint, text string")
    batch = spark.createDataFrame([(10, near)], "doc_id bigint, text string")
    flagged = dedup_against_index(
        minhash_signatures(batch, n=3, num_hashes=64),
        minhash_signatures(corpus, n=3, num_hashes=64),
        threshold=0.8,
    ).collect()
    assert [(r["id"], r["idx_id"]) for r in flagged] == [(10, 1)]
    assert flagged[0]["est_jaccard"] >= 0.8


def test_nb_token_quality_separates_planted_classes(spark):
    """NB classifier sanity on a separable corpus: docs drawn from the
    positive-class vocabulary score > 0, negative-class docs < 0, and the
    score is deterministic across runs (decimal-summed log-odds)."""
    from pyspark.sql import functions as F
    from emdatapipelines_spark.llmdata.text import nb_token_quality

    rows = []
    for i in range(20):
        rows.append((i, "good great excellent wonderful shiny", 1))
    for i in range(20, 40):
        rows.append((i, "bad awful terrible dreadful rusty", 0))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, y int")
    out1 = {r["doc_id"]: r["nb_score"] for r in nb_token_quality(df, label=F.col("y") == 1).collect()}
    out2 = {r["doc_id"]: r["nb_score"] for r in nb_token_quality(df, label=F.col("y") == 1).collect()}
    assert out1 == out2
    assert all(out1[i] > 0 for i in range(20))
    assert all(out1[i] < 0 for i in range(20, 40))


def test_triangle_count_known_graphs(spark):
    """Hand-checkable triangle counts: K4 has 4, a path has 0, and the
    count is invariant to edge direction, duplication, and self-loops."""
    from emdatapipelines_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4, "src int, dst int")
    assert triangle_count(df).collect()[0]["n_triangles"] == 4

    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src int, dst int")
    assert triangle_count(path).collect()[0]["n_triangles"] == 0

    messy = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)], "src int, dst int"
    )
    assert triangle_count(messy).collect()[0]["n_triangles"] == 1


def test_triangle_count_skewed_hub_matches_naive(spark):
    """A hub node with high degree: the degree-ordered count must equal the
    naive u<v 3-way join count (orientation invariance under skew)."""
    from pyspark.sql import functions as F
    from emdatapipelines_spark.operators.graph import triangle_count

    edges = [(0, i) for i in range(1, 40)] + [(i, i + 1) for i in range(1, 39)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = triangle_count(df).collect()[0]["n_triangles"]
    e = df.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    naive = (
        e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v")))
        .join(e3, (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")))
        .count()
    )
    assert got == naive == 38  # hub wedges close along the 1-2-...-39 path


def _clustered_vectors(n_clusters=40, per_cluster=6, d=16, spread=0.05):
    """Deterministic clustered corpus: unit centers + small per-member
    perturbation. Within-cluster cosines mostly >= 0.95; cross-cluster
    cosines are random (~0). Pure-python LCG so no numpy RNG state leaks."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        for m in range(per_cluster):
            v = centers[c] + spread * rng.standard_normal(d)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def test_embedding_neardup_prefilter_lossless_high_threshold(spark):
    """The grid prefilter must be LOSSLESS: at a real dedup threshold
    (0.95) on clustered data, the prefiltered pairs equal the numpy
    all-pairs ground truth exactly — same pairs, same cosines — for both
    projection modes and several projection counts."""
    import numpy as np

    from emdatapipelines_spark.llmdata.similarity import embedding_neardup_pairs

    rows = _clustered_vectors()
    mat = np.vstack([np.array(v) for _, v in rows])
    nrm = np.linalg.norm(mat, axis=1)
    sims = (mat @ mat.T) / (nrm[:, None] * nrm[None, :])
    t = 0.95
    want = {
        (i, j, round(float(sims[i, j]), 6))
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if sims[i, j] >= t
    }
    assert len(want) > 50  # the fixture actually has near-dups at 0.95

    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    for mode in ("pca", "random"):
        for p in (1, 2, 3):
            got = {
                (r["id_a"], r["id_b"], r["cosine"])
                for r in embedding_neardup_pairs(
                    df, threshold=t, n_projections=p, projections=mode
                ).collect()
            }
            assert got == want, f"mode={mode} p={p}"


def test_embedding_neardup_prefilter_actually_prunes(spark):
    """On clustered data at threshold 0.95 the candidate row-pair count
    must be a small fraction of all pairs (the prefilter has power), while
    staying lossless (previous test). Also: the degenerate low-threshold
    grid (one cell) must fall back to all pairs, never MORE than all
    pairs."""
    from emdatapipelines_spark.llmdata.similarity import embedding_neardup_stats

    rows = _clustered_vectors()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    s = embedding_neardup_stats(df, threshold=0.95, n_projections=2)
    assert s["n_rows"] == len(rows)
    assert s["candidate_row_pairs"] < 0.5 * s["all_row_pairs"]
    # low threshold: grid collapses -> bounded all-pairs fallback
    s_lo = embedding_neardup_stats(df, threshold=0.4, n_projections=2)
    assert s_lo["candidate_row_pairs"] <= s_lo["all_row_pairs"]


def test_embedding_neardup_edge_cases(spark):
    """Empty corpus, single row, zero vectors, exact duplicates."""
    from emdatapipelines_spark.llmdata.similarity import embedding_neardup_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = embedding_neardup_pairs(empty, threshold=0.9)
    assert out.count() == 0 and out.columns == ["id_a", "id_b", "cosine"]

    one = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    assert embedding_neardup_pairs(one, threshold=0.9).count() == 0

    # zero vectors never pair (cosine undefined -> excluded); exact dups do
    mix = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [0.6, 0.8]), (4, [0.6, 0.8])],
        "vec_id long, embedding array<double>",
    )
    got = [
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_neardup_pairs(mix, threshold=0.99).collect()
    ]
    assert got == [(3, 4, 1.0)]


def test_connected_components_chain_converges_in_log_rounds(spark):
    """A 10^4-node path graph has diameter 10^4: plain label propagation
    would need ~10^4 rounds, the pointer-jumping implementation must
    converge in <= 2*log2(n) (the min-label-doubling bound). Also checks
    correctness: every node labels to the chain head."""
    import math

    from pyspark.sql import functions as F

    from emdatapipelines_spark.llmdata.dedup import connected_components

    n = 10_000
    chain = spark.range(1, n).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    stats: dict = {}
    out = connected_components(chain, stats=stats)
    assert out.filter(F.col("cluster_id") != 1).count() == 0
    assert out.count() == n
    assert stats["rounds"] <= 2 * math.log2(n)  # 26; measured 13-14


def test_connected_components_round_counter_small_graphs(spark):
    """Star and two-component graphs converge in a couple of rounds and the
    counter reports them."""
    from pyspark.sql import functions as F

    from emdatapipelines_spark.llmdata.dedup import connected_components

    star = spark.createDataFrame(
        [(1, i) for i in range(2, 8)] + [(10, 11), (11, 12)], "id_a long, id_b long"
    )
    stats: dict = {}
    out = {r["doc_id"]: r["cluster_id"] for r in connected_components(star, stats=stats).collect()}
    assert {out[i] for i in range(1, 8)} == {1}
    assert out[10] == out[11] == out[12] == 10
    assert 1 <= stats["rounds"] <= 4


def test_pq_partial_topk_partition_independent(spark):
    """The map-side partial top-k inside the ADC scan must not change the
    result under different partitionings (boundary ties included)."""
    from emdatapipelines_spark.llmdata.similarity import pq_cosine_topk
    from emdatapipelines_spark.queries.registry import t as load

    emb = load(spark, SF, "embeddings")
    queries = emb.filter("vec_id % 200 = 0")

    def run(parts):
        return sorted(
            (r["query_id"], r["neighbor_id"], r["rank"], r["cosine"])
            for r in pq_cosine_topk(
                queries, emb.repartition(parts), k=5, m=32, n_centroids=64
            ).collect()
        )

    assert run(2) == run(17)


def test_mmr_rerank_matches_reference_greedy(spark):
    """MMR must equal a straightforward python greedy reference on a
    shortlist with a planted redundancy: two near-identical high-relevance
    docs — plain top-k keeps both, MMR must demote the duplicate."""
    import numpy as np

    from emdatapipelines_spark.llmdata.similarity import mmr_rerank

    rng = np.random.RandomState(3)
    base = rng.standard_normal(8)
    vecs = {
        0: base + 0.01 * rng.standard_normal(8),          # the query
        1: base + 0.02 * rng.standard_normal(8),          # top hit
        2: base + 0.02 * rng.standard_normal(8),          # near-dup of 1
        # moderately-relevant distinct docs: related to the query but far
        # from each other, so diversity has something to prefer
        3: 0.5 * base + 0.9 * rng.standard_normal(8),
        4: 0.5 * base + 0.9 * rng.standard_normal(8),
        5: 0.5 * base + 0.9 * rng.standard_normal(8),
    }
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    rel = {i: round(cos(vecs[0], v), 6) for i, v in vecs.items() if i != 0}
    cands = spark.createDataFrame(
        [(i, r) for i, r in rel.items()], "neighbor_id long, cosine double"
    )
    lam, k = 0.5, 4  # 0.5: dup penalty ~cancels a near-1 rel, diversity wins
    # python greedy reference with the same integer-domain rounding
    def r6(x):
        return round(x * 1e6) / 1e6

    selected, remaining = [], dict(rel)
    for step in range(1, k + 1):
        scored = {}
        for i, r in remaining.items():
            msim = max(
                (round(cos(vecs[i], vecs[j]), 6) for j, _ in selected), default=0.0
            )
            scored[i] = r6(lam * r - (1 - lam) * msim) if selected else r6(lam * r)
        win = min(scored, key=lambda i: (-scored[i], i))
        selected.append((win, scored[win]))
        del remaining[win]

    got = sorted(
        (r["mmr_rank"], r["selected_id"], r["mmr_score"])
        for r in mmr_rerank(cands, corpus, k=k, lam=lam).collect()
    )
    want = sorted((n + 1, i, s) for n, (i, s) in enumerate(selected))
    assert [(rk, i) for rk, i, _ in got] == [(rk, i) for rk, i, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) < 1e-9
    # the diversity property itself: 1 and 2 are near-dups; MMR must NOT
    # pick them back-to-back at ranks 1-2 (plain top-k would)
    order = [i for _, i, _ in got]
    assert not (set(order[:2]) == {1, 2})


def test_mmr_rerank_nan_candidate_sorts_greatest(spark):
    """r14 ADVICE: the replaced Spark window (ORDER BY mmr_score DESC)
    sorts NaN as the GREATEST double, so a NaN-relevance / NaN-cosine
    candidate (a NaN component in the embedding propagates NaN through
    dot and norm; under ANSI a zero NORM would instead raise
    DIVIDE_BY_ZERO, so NaN-by-NaN-value is the reachable corner) must win
    rank 1 — the pandas greedy has to replicate that, not silently skip
    NaN via ``score > best``."""
    from emdatapipelines_spark.llmdata.similarity import mmr_rerank

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
            (3, [float("nan"), 1.0]),  # NaN component: cosine vs anything is NaN
        ],
        "vec_id long, embedding array<double>",
    )
    cands = spark.createDataFrame(
        [(1, 0.99), (2, 0.95), (3, float("nan"))],
        "neighbor_id long, cosine double",
    )
    rows = {
        r["mmr_rank"]: (r["selected_id"], r["mmr_score"])
        for r in mmr_rerank(cands, corpus, k=3, lam=0.5).collect()
    }
    # NaN relevance → NaN step-1 score → sorts above every finite score.
    # The score VALUE crosses the Arrow boundary as NULL (pandas NaN is
    # Arrow's null sentinel — documented on the operator); the SELECTION
    # ORDER is the former window's NaN-greatest contract.
    assert rows[1][0] == 3 and rows[1][1] is None
    # remaining candidates: cand 2's penalty term vs selected {3} is a NaN
    # cosine → NaN score for BOTH survivors; cid-ASC tie-break keeps 1
    assert rows[2][0] == 1 and rows[2][1] is None
    assert rows[3][0] == 2 and rows[3][1] is None


def test_mmr_rerank_per_query_equals_independent_runs(spark):
    """query_col mode: a multi-query shortlist frame must produce, per
    query, EXACTLY what a single-query mmr_rerank over that query's slice
    produces — queries never leak into each other's greedy selection."""
    import numpy as np

    from emdatapipelines_spark.llmdata.similarity import mmr_rerank

    rng = np.random.RandomState(11)
    corpus_rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(12)]
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    )
    # two queries with overlapping but distinct shortlists + relevances
    short = {
        100: [(1, 0.9), (2, 0.85), (3, 0.7), (4, 0.6), (5, 0.5)],
        200: [(3, 0.95), (6, 0.8), (7, 0.75), (8, 0.4), (9, 0.3)],
    }
    multi = spark.createDataFrame(
        [(q, i, r) for q, rows in short.items() for i, r in rows],
        "query_id long, neighbor_id long, cosine double",
    )
    multi_out = mmr_rerank(multi, corpus, k=3, lam=0.6, query_col="query_id")
    # r15 (VERDICT r14 #9): in multi-query mode the qid equi-key is real,
    # so the pairwise-sim build must be a plain (scale-unbounded) equi-join
    # — no driver-side broadcast of the k x |queries| shortlist union and
    # no cartesian fallback in the plan.
    plan = multi_out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {
        (r["query_id"], r["mmr_rank"]): (r["selected_id"], r["mmr_score"])
        for r in multi_out.collect()
    }
    for q, rows in short.items():
        single = spark.createDataFrame(rows, "neighbor_id long, cosine double")
        want = {
            r["mmr_rank"]: (r["selected_id"], r["mmr_score"])
            for r in mmr_rerank(single, corpus, k=3, lam=0.6).collect()
        }
        for rank, (sid, score) in want.items():
            gsid, gscore = got[(q, rank)]
            assert gsid == sid and abs(gscore - score) < 1e-9


def test_knn_graph_ann_structure_and_recall_floor(spark):
    """The ANN k-NN-graph scale twin must (a) emit exactly k edges per
    source — every vector probes its own cell, so the graph is never
    starved — (b) clear the same loose recall floor as the other IVF
    entries (the random fixture is IVF's documented worst case; the
    clustered sf1 fixture measures 0.93), and (c) agree edge-for-edge
    with itself under a different input partitioning (the per-(cell,sub)
    local top-k must be partition-independent)."""
    from emdatapipelines_spark.llmdata.similarity import knn_graph_ann
    from emdatapipelines_spark.queries.registry import t

    rows = entry.queries()["sim_knn_graph_ann"](spark, SF).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["src"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in per_src.values())
    assert len(per_src) == 500  # every vector is a source
    assert rows[0]["sample_recall_at_k"] >= 0.2

    e = t(spark, SF, "embeddings")
    def run(parts):
        return sorted(
            (r["src"], r["neighbor"], r["rank"], r["cosine"])
            for r in knn_graph_ann(e.repartition(parts), k=3, nlist=22, nprobe=4).collect()
        )
    assert run(2) == run(17)


def test_url_canonicalize_collapses_crawl_variants(spark):
    """Every mess class the canonicalizer claims to handle must collapse
    to one key; distinct resources must NOT collapse."""
    from emdatapipelines_spark.llmdata.dedup import url_canonicalize

    same = [
        "http://www.News.example.com/a/b/?ref=1&utm_source=x",
        "https://news.example.com:443/a/b?utm_campaign=y&ref=1",
        "https://NEWS.example.com/a/b/?ref=1#frag",  # fragment stripped
        "news.example.com:80/a/b?fbclid=zz&ref=1",
    ]
    different = [
        "https://news.example.com/a/b?ref=2",      # param value differs
        "https://news.example.com/a/c?ref=1",      # path differs
        "https://blog.example.com/a/b?ref=1",      # host differs
        "https://news.example.com/a/b?ref=1&z=1",  # extra real param
    ]
    df = spark.createDataFrame([(u,) for u in same + different], "url string")
    got = [r[0] for r in df.select(url_canonicalize("url")).collect()]
    assert len(set(got[: len(same)])) == 1
    assert len(set(got)) == 1 + len(different)
    assert got[0] == "news.example.com/a/b?ref=1"
    # param sort: order never distinguishes
    two = spark.createDataFrame(
        [("https://h.com/p?b=2&a=1",), ("https://h.com/p?a=1&b=2",)], "url string"
    )
    a, b = [r[0] for r in two.select(url_canonicalize("url")).collect()]
    assert a == b == "h.com/p?a=1&b=2"


def test_substring_dedup_chunks_keeps_first_occurrence_only(spark):
    """A 20-token block repeated across (and within) documents survives
    only at its first (doc_id, chunk_idx) position; unique chunks are
    untouched; counts reconcile."""
    from emdatapipelines_spark.llmdata.dedup import substring_dedup_chunks

    block = " ".join(f"b{i}" for i in range(20))
    u = lambda tag: " ".join(f"{tag}{i}" for i in range(20))
    rows = [
        (1, u("x") + " " + block),          # chunks: unique-x, block (first)
        (2, block + " " + u("y")),          # block (dup) dropped, unique-y kept
        (3, block + " " + block),           # both occurrences dup -> empty text? no: both >first
        (4, u("z")),                        # untouched
    ]
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dedup_text"])
        for r in substring_dedup_chunks(
            spark.createDataFrame(rows, "doc_id long, text string"), chunk_tokens=20
        ).collect()
    }
    assert got[1] == (2, 0, u("x") + " " + block)
    assert got[2] == (2, 1, u("y"))
    assert got[3] == (2, 2, "")
    assert got[4] == (1, 0, u("z"))
