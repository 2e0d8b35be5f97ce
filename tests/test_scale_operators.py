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
