"""Round-8 additions: HITS, best-changepoint, Mann-Whitney — each pinned
against an independent brute-force recomputation (pandas/numpy over the
sf0.001 fixture, or a hand-built graph), not just the SQL oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

import __spark_entry__ as entry
from emdatapipelines_spark.operators.graph import hits_weighted
from emdatapipelines_spark.queries.registry import t

SF = "/root/testdata/sf0.001"


def test_hits_tiny_graph_ordering(spark):
    # A feeds B and C (two out-edges); B feeds C -> C is the top authority
    # (two in-edges incl. one from the top hub), A the top hub (its targets
    # hold all the authority mass).
    edges = spark.createDataFrame(
        [("A", "B", 1), ("A", "C", 1), ("B", "C", 1)], "src string, dst string, w long"
    )
    got = {r["id"]: r for r in hits_weighted(edges, iterations=2).collect()}
    assert set(got) == {"A", "B", "C"}
    assert got["C"]["authority"] > got["B"]["authority"] > 0.0
    assert got["A"]["authority"] == 0.0  # no in-edges
    assert got["A"]["hub"] > got["B"]["hub"]
    assert got["C"]["hub"] == 0.0  # no out-edges
    # L1-normalized half-steps: each score vector sums to ~1 (round-8 dust)
    assert abs(sum(v["authority"] for v in got.values()) - 1.0) < 1e-6
    assert abs(sum(v["hub"] for v in got.values()) - 1.0) < 1e-6


def test_changepoint_matches_bruteforce(spark):
    rows = entry.queries()["ts_changepoint"](spark, SF).collect()
    ev = (
        t(spark, SF, "events")
        .select("event_type", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["event_type", "ts", "event_id"])
    )
    for r in rows:
        v = ev[ev["event_type"] == r["event_type"]]["value"].to_numpy()
        # same decimal(28,4) quantization the query applies
        v = np.round(v, 4)
        n = len(v)
        assert r["n_obs"] == n
        cs = np.cumsum(v)
        ks = np.arange(1, n)
        obj = cs[:-1] ** 2 / ks + (cs[-1] - cs[:-1]) ** 2 / (n - ks)
        best_k = int(ks[np.argmax(obj)])
        assert r["split_k"] == best_k
        gain = obj.max() - cs[-1] ** 2 / n
        assert abs(r["sse_gain"] - gain) < max(1e-4, abs(gain) * 1e-6)


def test_changepoint_obvious_break(spark):
    pdf = pd.DataFrame(
        {
            "event_type": ["x"] * 8,
            "ts": pd.date_range("2024-01-01", periods=8, freq="h"),
            "event_id": range(8),
            "value": [1.0, 1.0, 1.0, 1.0, 10.0, 10.0, 10.0, 10.0],
        }
    )
    df = spark.createDataFrame(pdf)
    # drive the same plan the query builds, against a local frame
    import emdatapipelines_spark.queries.extensions as ext

    orig_t = ext.t
    try:
        ext.t = lambda s, d, name: df  # noqa: E731 - events only in this query
        out = entry.queries()["ts_changepoint"](None, SF).collect()
    finally:
        ext.t = orig_t
    assert len(out) == 1 and out[0]["split_k"] == 4


def test_mannwhitney_matches_bruteforce(spark):
    r = entry.queries()["q18_mannwhitney"](spark, SF).collect()[0]
    ev = t(spark, SF, "events").select("event_type", "value").toPandas()
    a = ev[ev["event_type"] == "click"]["value"].to_numpy()
    b = ev[ev["event_type"] == "purchase"]["value"].to_numpy()
    na, nb = len(a), len(b)
    assert (r["n_click"], r["n_purchase"]) == (na, nb)
    # exact doubled U by pair counting (fixture is small enough)
    gt = (a[:, None] > b[None, :]).sum()
    eq = (a[:, None] == b[None, :]).sum()
    u_a_x2 = int(2 * gt + eq)
    assert r["u_click_x2"] == u_a_x2
    assert r["u_purchase_x2"] == 2 * na * nb - u_a_x2
    z = (u_a_x2 / 2.0 - na * nb / 2.0) / np.sqrt(na * nb * (na + nb + 1) / 12.0)
    assert abs(r["z"] - z) < 1e-5


def test_brier_decomposition_matches_bruteforce(spark):
    r = entry.queries()["ml_brier_decomposition"](spark, SF).collect()[0]
    from emdatapipelines_spark.ml.evaluate import score_linear
    from emdatapipelines_spark.ml.logreg import daily_count_features

    pdf = score_linear(daily_count_features(t(spark, SF, "events"))).toPandas()
    p, y = pdf["score"].to_numpy(), pdf["y"].to_numpy()
    n = len(p)
    assert r["n_obs"] == n
    brier = np.mean((p - y) ** 2)
    assert abs(r["brier"] - brier) < 1e-4
    bins = np.minimum(np.floor(p * 10).astype(int), 9)
    ybar = y.mean()
    rel = res = 0.0
    for b in np.unique(bins):
        m = bins == b
        rel += m.sum() * (p[m].mean() - y[m].mean()) ** 2
        res += m.sum() * (y[m].mean() - ybar) ** 2
    assert abs(r["reliability"] - rel / n) < 1e-4
    assert abs(r["resolution"] - res / n) < 1e-4
    assert abs(r["uncertainty"] - ybar * (1 - ybar)) < 1e-4
    # Murphy identity up to within-bin forecast variance
    ident = r["reliability"] - r["resolution"] + r["uncertainty"] + r["binning_residual"]
    assert abs(ident - r["brier"]) < 5e-6


def test_rsi_bounds_and_signals(spark):
    rows = entry.queries()["w17_rsi"](spark, SF).collect()
    for r in rows:
        assert 0.0 <= r["rsi14"] <= 100.0
        assert (r["signal"] == "OVERBOUGHT") == (r["rsi14"] > 70)


def test_fk_orphans_clean_fixture(spark):
    rows = entry.queries()["q19_fk_orphans"](spark, SF).collect()
    assert len(rows) == 6
    # the TPC-H-ish fixtures are referentially intact by construction
    assert all(r["n_orphan"] == 0 and r["orphan_ppm"] == 0 for r in rows)
    assert all(r["n_child"] > 0 for r in rows)


def test_truncated_rerank_recall_and_partition_independence(spark):
    from emdatapipelines_spark.llmdata.similarity import truncated_rerank_topk

    rows = entry.queries()["sim_truncated_rerank_topk"](spark, SF).collect()
    assert len(rows) == 8 * 5
    # random fixture embeddings have no Matryoshka structure, so the prefix
    # shortlist is a weak filter here — the floor is deliberately modest;
    # the per-row recall_at_k column is the real contract
    mean_recall = sum(r["recall_at_k"] for r in rows) / len(rows)
    assert mean_recall >= 0.15
    e = t(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    a = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in truncated_rerank_topk(q, e, k=5).collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in truncated_rerank_topk(q.repartition(7), e.repartition(13), k=5).collect()
    )
    assert a == b


def test_mixture_reweight_mass_is_balanced(spark):
    rows = entry.queries()["llm_mixture_reweight"](spark, SF).collect()
    assert abs(sum(r["share_ppm"] for r in rows) - 1_000_000) <= len(rows)
    # uncapped domains get (n/k)/n_docs -> equal weighted mass per domain
    masses = [r["weighted_mass"] for r in rows if r["weight_ppm"] < 5_000_000]
    if len(masses) >= 2:
        assert max(masses) - min(masses) <= max(masses) * 0.01 + 1_000_000


def test_holt_winters_matches_reference_recursion(spark):
    from emdatapipelines_spark.operators.windows import holt_winters_additive

    rows = entry.queries()["ts_holt_winters"](spark, SF).collect()
    ev = t(spark, SF, "events").select("event_type", "ts").toPandas()
    ev["d"] = ev["ts"].dt.date
    for r in rows:
        cnts = (
            ev[ev["event_type"] == r["event_type"]]
            .groupby("d").size().sort_index().to_numpy().astype(float)
        )
        m, a, b, g = 7, 0.3, 0.1, 0.2
        assert r["n_obs"] == len(cnts)
        l = cnts[:m].sum() / m
        tr = 0.0
        s = list(cnts[:m] - l)
        for x in cnts[m:]:
            sh = s.pop(0)
            lnew = a * (x - sh) + (1 - a) * (l + tr)
            tr = b * (lnew - l) + (1 - b) * tr
            s.append(g * (x - lnew) + (1 - g) * sh)
            l = lnew
        assert abs(r["level"] - l) < 1e-5
        assert abs(r["trend"] - tr) < 1e-5
        for h in (1, 2, 7):
            assert abs(r[f"forecast_{h}"] - (l + h * tr + s[h - 1])) < 1e-5
