"""Property-based invariants (hypothesis) — the reference ships no
randomized testing (SURVEY §5); these pin the engine's operator contracts.
Spark-backed properties keep example counts small; pure-Python ones run wide.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from emdatapipelines_spark.api import RateLimiter, fingerprint_query
from emdatapipelines_spark.io import optimal_bucket_count
from emdatapipelines_spark.operators.aggregates import privacy_threshold_agg
from emdatapipelines_spark.operators.upsert import upsert_last_wins

# --------------------------------------------------------------------------
# pure-Python properties — cheap, run wide
# --------------------------------------------------------------------------


@given(st.integers(min_value=0, max_value=10**12), st.integers(min_value=0, max_value=10**12))
def test_bucket_count_monotone(a, b):
    lo, hi = sorted((a, b))
    assert optimal_bucket_count(lo) <= optimal_bucket_count(hi)


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=200))
def test_fingerprint_whitespace_case_invariant(q):
    # ASCII-scoped: unicode case folding is not round-trippable (ß → SS)
    assert fingerprint_query(q) == fingerprint_query("  " + q.upper() + "  ")


@given(st.integers(min_value=1, max_value=20), st.integers(min_value=0, max_value=40))
def test_rate_limiter_never_exceeds_quota(quota, n_requests):
    rl = RateLimiter(quotas={"public": quota})
    granted = sum(1 for i in range(n_requests) if rl.check("org", "public", 1000.0 + i))
    assert granted == min(quota, n_requests)


# --------------------------------------------------------------------------
# Spark-backed properties — few, small examples
# --------------------------------------------------------------------------

_keyed_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100), st.integers(1, 3)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(existing=_keyed_rows, incoming=_keyed_rows)
def test_upsert_last_wins_invariants(spark, existing, incoming):
    e = spark.createDataFrame(existing, "k int, v int, version int")
    i = spark.createDataFrame(
        [(k, v, ver + 10) for k, v, ver in incoming], "k int, v int, version int"
    )
    merged = upsert_last_wins(e, i, ["k"], "version")
    rows = merged.collect()
    # exactly one row per key
    keys = [r["k"] for r in rows]
    assert len(keys) == len(set(keys))
    # key space = union of inputs
    assert set(keys) == {k for k, _, _ in existing} | {k for k, _, _ in incoming}
    # idempotent: re-applying the same incoming changes nothing
    again = upsert_last_wins(merged, i, ["k"], "version")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=30),
    threshold=st.integers(1, 6),
)
def test_privacy_threshold_suppresses_small_groups(spark, rows, threshold):
    df = spark.createDataFrame(rows, "grp int, v int")
    out = privacy_threshold_agg(
        df, ["grp"], [F.sum("v").alias("total")], min_group_size=threshold
    ).collect()
    from collections import Counter

    sizes = Counter(g for g, _ in rows)
    # exactly the groups meeting the threshold survive — no small-group leaks
    assert {r["grp"] for r in out} == {g for g, n in sizes.items() if n >= threshold}
    assert all(r["group_size"] >= threshold for r in out)


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_hash_bucket_threshold_valid_for_any_fraction(fraction):
    from emdatapipelines_spark.llmdata.sampling import hash_bucket_threshold

    t = hash_bucket_threshold(fraction)
    # threshold is either the keep-all sentinel or exactly 4 hex digits; the
    # ~[0.9999924, 1.0) band must NOT produce the 5-char '10000' whose
    # lexicographic compare would keep only '0…' hashes (~6.25%)
    assert t == "g" or (len(t) == 4 and int(t, 16) <= 0xFFFF)
    if fraction >= 0.99999:
        kept = 65536 if t == "g" else int(t, 16)
        assert kept / 65536 >= 0.9999


# --------------------------------------------------------------------------
# two-stage aggregation algebra (operators/reaggregate.py)
# --------------------------------------------------------------------------

_measure_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),          # group key
        st.integers(min_value=0, max_value=7),          # fine-grain key
        st.integers(min_value=-10**6, max_value=10**6),  # value in cents
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(_measure_rows)
def test_partial_merge_equals_direct_agg_property(spark, rows):
    """For ANY dataset: partials at (grp, sub) merged to grp must equal the
    direct aggregation at grp — the mergeable-partials contract."""
    from emdatapipelines_spark.operators.reaggregate import (
        merge_partials,
        partial_aggregate,
    )

    df = spark.createDataFrame(rows, "grp INT, sub INT, cents INT").selectExpr(
        "grp", "sub", "CAST(cents AS DOUBLE) / 100 AS x"
    )
    merged = {
        r["grp"]: (r["x_sum"], r["x_min"], r["x_max"], r["x_n"])
        for r in merge_partials(
            partial_aggregate(df, ["grp", "sub"], {"x": "x"}), ["grp"], ["x"]
        ).collect()
    }
    direct = {
        r["grp"]: (r["s"], r["lo"], r["hi"], r["n"])
        for r in df.groupBy("grp")
        .agg(
            F.sum(F.col("x").cast("decimal(28,2)")).cast("double").alias("s"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
            F.count("x").alias("n"),
        )
        .collect()
    }
    assert merged == direct


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_measure_rows, st.integers(min_value=1, max_value=9))
def test_salted_aggregate_salt_invariance_property(spark, rows, buckets):
    """The salted plan's OUTPUT must be identical for any salt fan-out."""
    from emdatapipelines_spark.operators.reaggregate import salted_aggregate

    df = spark.createDataFrame(rows, "grp INT, sub INT, cents INT").selectExpr(
        "grp", "sub", "CAST(cents AS DOUBLE) / 100 AS x"
    )
    a = salted_aggregate(df, ["grp"], {"x": "x"}, F.col("sub"), buckets)
    b = salted_aggregate(df, ["grp"], {"x": "x"}, F.col("sub") + 1, 3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),   # user
            st.integers(min_value=0, max_value=30),  # ts offset
            st.sampled_from(["a", "b", "c"]),        # event type
        ),
        min_size=0,
        max_size=40,
    )
)
def test_funnel_counts_monotone_nonincreasing(spark, rows):
    """Stage k+1 can never have more users than stage k, for any event set."""
    from emdatapipelines_spark.operators.sessions import funnel_stages

    df = spark.createDataFrame(rows, "u INT, off INT, et STRING").selectExpr(
        "u", "timestamp_micros(CAST(off AS LONG) * 1000000) AS ts", "et"
    )
    got = {
        r["stage"]: r["users"]
        for r in funnel_stages(df, "u", "ts", "et", ["a", "b", "c"]).collect()
    }
    assert got["a"] >= got["a>b"] >= got["a>b>c"] >= 0


# --------------------------------------------------------------------------
# round-5 exact-algorithm claims, randomized
# --------------------------------------------------------------------------

_doc_corpus = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30),  # tiny alphabet -> dense collisions
    min_size=2,
    max_size=8,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_doc_corpus, st.sampled_from([0.3, 0.6, 0.9]))
def test_prefix_filter_is_lossless(spark, texts, threshold):
    """prefix_jaccard_pairs == the naive full self-join on random corpora —
    the AllPairs completeness theorem, checked empirically."""
    from emdatapipelines_spark.llmdata.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    fast = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(df, n=2, threshold=threshold).collect()
    }
    naive = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=2, threshold=threshold).collect()
    }
    assert fast == naive


_item_stream = st.lists(st.integers(0, 8), min_size=1, max_size=60)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_item_stream, st.sampled_from([2, 4]))
def test_mg_merge_bounds_hold(spark, items, k):
    """Merged Misra-Gries estimates: never overcount, undercount <= N/(k+1),
    and every item above the bound survives — for any stream and k."""
    from collections import Counter

    from emdatapipelines_spark.operators.heavyhitters import (
        merge_mg,
        misra_gries_partials,
    )

    df = spark.createDataFrame([(str(v),) for v in items], "item string").repartition(3)
    merged, totals = merge_mg(misra_gries_partials(df, "item", k), "item")
    est = {r["item"]: r["est"] for r in merged.collect()}
    true = Counter(str(v) for v in items)
    n = len(items)
    assert totals.first()["total_n"] == n
    for it, e in est.items():
        assert e <= true[it] and true[it] - e <= n / (k + 1)
    for it, c in true.items():
        if c > n / (k + 1):
            assert it in est


_points = st.lists(
    st.tuples(
        st.floats(-30, 30, allow_nan=False, width=32),
        st.floats(-30, 30, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_points, _points, st.sampled_from([3.0, 10.0]))
def test_radius_join_is_exact(spark, lpts, rpts, radius):
    """Grid-bucketed radius join == naive cross-join distance filter for any
    point sets (incl. negative coords / cell-boundary values)."""
    import math

    from emdatapipelines_spark.operators.spatial import radius_join

    l = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(lpts)],
        "id bigint, x double, y double",
    )
    r = spark.createDataFrame(
        [(j, float(x), float(y)) for j, (x, y) in enumerate(rpts)],
        "pid bigint, x double, y double",
    )
    got = {
        (row["l_id"], row["r_pid"])
        for row in radius_join(l, r, radius=radius).collect()
    }
    want = {
        (i, j)
        for i, (xa, ya) in enumerate(lpts)
        for j, (xb, yb) in enumerate(rpts)
        if round(math.sqrt((float(xa) - float(xb)) ** 2 + (float(ya) - float(yb)) ** 2), 6)
        <= radius
    }
    assert got == want


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=20), min_size=1, max_size=5
    ),
    st.integers(1, 3),
)
def test_bpe_merges_match_reference(spark, texts, k):
    """Distributed BPE merge table == the sequential reference
    implementation for any corpus and k (greedy application order, count
    weighting, lexicographic tie-break)."""
    from emdatapipelines_spark.llmdata.bpe import learn_bpe_merges
    from tests.test_bpe import _py_bpe

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = [tuple(r) for r in learn_bpe_merges(df, k=k).collect()]
    assert got == _py_bpe(texts, k)
