"""cachectl — the pinned-frame ledger that closes the cache-lifetime loop
(r11 VERDICT #1 / r11 ADVICE): engine internals register their eager
localCheckpoints and persists; the harness releases them AFTER result
materialization, so a long-suite JVM never accumulates leaked blocks.

Assertions use PINNED-ID SET DELTAS, not global counts: under the full
suite, Spark's async ContextCleaner frees earlier tests' garbage RDDs at
arbitrary points, so ``count == base`` is racy while ``new_ids − base_ids``
is not (the cleaner only ever REMOVES ids).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from emdatapipelines_spark import cachectl


def _pinned_ids(spark) -> set[int]:
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet().toArray()}


def test_tracked_checkpoint_release_frees_blocks(spark):
    cachectl.release_tracked()  # clean slate
    spark.catalog.clearCache()
    base = _pinned_ids(spark)
    ck = cachectl.tracked_local_checkpoint(
        spark.range(1000).select("id", (F.col("id") * 2).alias("v"))
    )
    assert ck.count() == 1000
    assert cachectl.tracked_count() == 1
    assert len(_pinned_ids(spark) - base) == 1
    assert cachectl.release_tracked() == 1
    assert cachectl.tracked_count() == 0
    assert _pinned_ids(spark) - base == set()


def test_tracked_persist_release_and_recompute(spark):
    cachectl.release_tracked()
    spark.catalog.clearCache()
    base = _pinned_ids(spark)
    p = cachectl.tracked_persist(spark.range(500).select((F.col("id") + 1).alias("x")))
    assert p.count() == 500
    assert len(_pinned_ids(spark) - base) == 1
    assert cachectl.release_tracked() == 1
    assert _pinned_ids(spark) - base == set()
    # persist (unlike checkpoint) keeps lineage: post-release recompute works
    assert p.count() == 500


def test_release_is_idempotent_and_safe_when_empty(spark):
    cachectl.release_tracked()
    assert cachectl.release_tracked() == 0


def test_scoped_release_frees_only_own_pins(spark):
    """r12 ADVICE (medium): release_tracked(since=mark()) must not free
    frames pinned by another still-live owner — here an eager checkpoint
    pinned BEFORE the mark survives the scoped release and stays readable."""
    cachectl.release_tracked()
    spark.catalog.clearCache()
    base = _pinned_ids(spark)
    outer = cachectl.tracked_local_checkpoint(
        spark.range(300).select("id", (F.col("id") * 3).alias("v"))
    )
    assert outer.count() == 300
    outer_ids = _pinned_ids(spark) - base
    m = cachectl.mark()
    inner = cachectl.tracked_persist(spark.range(100).select("id"))
    assert inner.count() == 100
    assert cachectl.tracked_count() == 2
    assert cachectl.tracked_count(since=m) == 1
    assert cachectl.release_tracked(since=m) == 1
    # the outer owner's checkpoint is untouched — blocks still pinned and
    # readable (a freed checkpoint cannot recompute)
    assert cachectl.tracked_count() == 1
    assert _pinned_ids(spark) - base == outer_ids
    assert outer.count() == 300
    assert cachectl.release_tracked() == 1
    assert _pinned_ids(spark) - base == set()


def test_pin_scope_releases_on_exit(spark):
    cachectl.release_tracked()
    spark.catalog.clearCache()
    base = _pinned_ids(spark)
    with cachectl.pin_scope():
        p = cachectl.tracked_persist(spark.range(200).select("id"))
        assert p.count() == 200
        assert len(_pinned_ids(spark) - base) == 1
    assert cachectl.tracked_count() == 0
    assert _pinned_ids(spark) - base == set()


def test_pinned_bytes_tracks_block_manager(spark):
    cachectl.release_tracked()
    spark.catalog.clearCache()
    base = cachectl.pinned_bytes(spark)
    ck = cachectl.tracked_local_checkpoint(
        spark.range(50_000).select("id", (F.col("id") * 2).alias("v"))
    )
    assert ck.count() == 50_000
    assert cachectl.pinned_bytes(spark) > base
    cachectl.release_tracked()


def test_pinned_queries_release_to_zero(spark):
    """Pinning queries through the driver surface (__spark_entry__) release
    their own pins inline (r12 ADVICE: the external driver never calls
    release_tracked); the only residue is the previous query's small result
    checkpoint, freed by the next wrapped call."""
    import __spark_entry__ as entry

    SF_SMALL = "/root/testdata/sf0.001"
    qs = entry.queries()
    cachectl.release_tracked()
    entry._RESULT_RESIDUE.clear()
    spark.catalog.clearCache()
    base = _pinned_ids(spark)
    # sim_ann_param_sweep (not ml_forest_predictions) as the third pinning
    # query: MLlib's fit() keeps internal training caches the ledger never
    # owned and the async ContextCleaner frees them at arbitrary points —
    # id-delta asserts on an MLlib query race with that cleanup
    for name in ("dd_minhash_lsh", "sim_ann_param_sweep", "dd_jaccard_pairs"):
        qs[name](spark, SF_SMALL).collect()
        # the wrapper already released the query's own pins …
        assert cachectl.tracked_count() == 0, f"{name} left ledger entries"
        # … leaving at most the result checkpoint pinned
        assert len(_pinned_ids(spark) - base) <= 1, f"{name} leaked pinned blocks"
    # the raw (unwrapped) registry functions still pin through the ledger —
    # the in-repo harness contract (materialize → release) is unchanged
    from emdatapipelines_spark.queries import QUERIES

    while entry._RESULT_RESIDUE:
        prev = entry._RESULT_RESIDUE.pop()
        prev._jdf.queryExecution().analyzed().rdd().unpersist(False)
    QUERIES["dd_minhash_lsh"](spark, SF_SMALL).collect()
    assert cachectl.tracked_count() > 0, "raw query registered nothing"
    cachectl.release_tracked()
    assert _pinned_ids(spark) - base == set(), "raw query leaked after release"


def test_wrapper_releases_pins_when_query_raises(spark):
    """r13 ADVICE (medium): a pinning query fn that raises mid-flight must
    not orphan its tracked pins — the entry wrapper's scoped release runs
    on the failure path too (the external driver never calls
    release_tracked, so one failing pinning query used to re-create the
    cross-query pinned-block accumulation the wrapper exists to prevent)."""
    import pytest

    import __spark_entry__ as entry

    cachectl.release_tracked()
    spark.catalog.clearCache()
    base = _pinned_ids(spark)

    def bad(spark_, sf_dir):
        p = cachectl.tracked_persist(spark_.range(1000).select("id"))
        p.count()
        raise RuntimeError("boom after pinning")

    wrapped = entry._pin_releasing(bad)
    with pytest.raises(RuntimeError, match="boom after pinning"):
        wrapped(spark, "unused")
    assert cachectl.tracked_count() == 0, "failure path left ledger entries"
    # a later wrapped pinning query scopes its release to its own mark —
    # the orphan would have survived forever without the failure-path drain
    assert len(_pinned_ids(spark) - base) == 0 or cachectl.tracked_count() == 0


def test_pinned_high_water_gauge(spark):
    """r13 ADVICE (medium): the entry wrapper releases a query's pins
    before returning, so the bench's post-return pinned_bytes read misses
    the peak for exactly the pinning queries — the in-wrapper gauge
    (note just before release, take by the harness) is the honest peak."""
    cachectl.release_tracked()
    cachectl.take_pinned_high_water()  # reset any prior gauge
    base = cachectl.pinned_bytes(spark)
    with cachectl.pin_scope():
        p = cachectl.tracked_persist(
            spark.range(200_000).select(
                "id", F.md5(F.col("id").cast("string")).alias("h")
            )
        )
        assert p.count() == 200_000
        noted = cachectl.note_pinned_high_water(spark)
        assert noted > base
    hw = cachectl.take_pinned_high_water()
    assert hw >= noted
    assert cachectl.take_pinned_high_water() == 0  # take resets


def test_pinned_gate_trips_on_synthetic_leak(spark):
    """r13 VERDICT #5: the pinned-MB ratchet gate. Ceiling logic first
    (committed high-water x 1.5, floor 64 MB), then a real synthetic leak:
    a tracked pin whose release is skipped shows up in pinned_bytes and
    trips a committed ratchet; releasing it (the non-leaky path) quiets
    the gate."""
    import sys as _sys
    from os.path import dirname

    _sys.path.insert(0, dirname(dirname(__file__)))
    from bench import pinned_breaches

    # ceiling logic: floor 64 MB for unknown queries, 1.5x ratchet above
    assert pinned_breaches({"q": 63.9}, {}) == {}
    assert pinned_breaches({"q": 64.1}, {})["q"] == [64.1, 64.0]
    assert pinned_breaches({"q": 149.0}, {"q": 100.0}) == {}
    assert pinned_breaches({"q": 151.0}, {"q": 100.0})["q"] == [151.0, 150.0]

    cachectl.release_tracked()
    spark.catalog.clearCache()
    base_mb = cachectl.pinned_bytes(spark) / (1024 * 1024)
    # hash strings defeat columnar compression so the leak exceeds the floor
    p = cachectl.tracked_persist(
        spark.range(1_500_000).select(
            "id",
            F.md5(F.col("id").cast("string")).alias("a"),
            F.sha2(F.col("id").cast("string"), 256).alias("b"),
        )
    )
    assert p.count() == 1_500_000
    leak_mb = round(cachectl.pinned_bytes(spark) / (1024 * 1024) - base_mb, 2)
    assert leak_mb > 64.0, f"synthetic leak only {leak_mb} MB"
    breaches = pinned_breaches({"leaky_query": leak_mb}, {"leaky_query": 1.0})
    assert "leaky_query" in breaches, "gate missed the leak"
    # the non-leaky path: release (blocking so the read is race-free)
    cachectl.release_tracked()
    p.unpersist(blocking=True)
    clean_mb = round(cachectl.pinned_bytes(spark) / (1024 * 1024) - base_mb, 2)
    assert pinned_breaches({"leaky_query": max(clean_mb, 0.0)},
                           {"leaky_query": 1.0}) == {}


def test_regression_watch_selects_inflated_queries():
    """r15 (VERDICT r14 #5/#6): synthetic inflation — a query whose gated
    min is >= 1.5x its committed previous value joins the isolation set so
    the artifact carries its own fresh-JVM twin; stable and sub-threshold
    queries stay out, the set is worst-first and capped at 10."""
    import sys as _sys
    from os.path import dirname

    _sys.path.insert(0, dirname(dirname(__file__)))
    from bench import regression_watch

    prev = {"stable": 2.0, "inflated": 2.0, "worse": 2.0, "tiny": 0.1}
    now = {"stable": 2.2, "inflated": 3.1, "worse": 5.0, "tiny": 1.0, "new": 9.0}
    picked = regression_watch(now, prev)
    # worst ratio first; 'stable' (<1.5x), 'tiny' (prev <0.2s ratio-of-noise)
    # and 'new' (no committed value) are all excluded
    assert picked == ["worse", "inflated"]
    # cap: a fully-contended window cannot trigger unbounded subprocesses
    many_prev = {f"q{i}": 1.0 for i in range(40)}
    many_now = {f"q{i}": 2.0 + i * 0.01 for i in range(40)}
    capped = regression_watch(many_now, many_prev)
    assert len(capped) == 10
    assert capped[0] == "q39"  # worst ratio leads


def test_entry_wrapper_residue_bound(spark):
    """r13 VERDICT stretch #7: after a window of wrapped queries, at most
    ONE result-sized frame remains pinned, and it is the LAST pinning
    query's checkpointed result (non-pinning queries pass through and the
    next wrapped call drains the previous residue)."""
    import __spark_entry__ as entry

    SF_SMALL = "/root/testdata/sf0.001"
    qs = entry.queries()
    cachectl.release_tracked()
    entry._RESULT_RESIDUE.clear()
    spark.catalog.clearCache()
    base = _pinned_ids(spark)
    last_rows = None
    for name in ("dd_minhash_lsh", "a1_pricing_summary", "sim_ann_param_sweep"):
        rows = qs[name](spark, SF_SMALL).collect()
        if name == "sim_ann_param_sweep":
            last_rows = sorted(map(repr, rows))
    assert len(entry._RESULT_RESIDUE) == 1, "residue bound exceeded"
    residue = entry._RESULT_RESIDUE[0]
    assert sorted(map(repr, residue.collect())) == last_rows
    assert len(_pinned_ids(spark) - base) <= 1, "more than one frame pinned"
    while entry._RESULT_RESIDUE:
        prev = entry._RESULT_RESIDUE.pop()
        prev._jdf.queryExecution().analyzed().rdd().unpersist(False)


def test_family_recalls_emits_every_setting(spark):
    """r11 ADVICE #1: a sweep setting reached by ZERO candidates must still
    emit its row (n_queries=0, mean NULL) — the published 9-row
    ``sim_ann_param_sweep`` shape may never silently shrink."""
    from emdatapipelines_spark.queries.extensions import _family_recalls

    # every candidate carries min_tag=2: setting 1 reaches nothing
    tagged = spark.createDataFrame(
        [(0, 10, 0.9, 2), (0, 11, 0.8, 2), (1, 10, 0.7, 2)],
        "query_id int, neighbor_id int, cosine double, min_tag int",
    )
    exact = spark.createDataFrame(
        [(0, 10), (1, 10)], "query_id int, exact_neighbor_id int"
    )
    rows = {
        r["setting"]: r
        for r in _family_recalls(tagged, "min_tag", (1, 2), exact).collect()
    }
    assert set(rows) == {1, 2}
    assert rows[1]["n_queries"] == 0
    assert rows[1]["mean_recall_at_k"] is None
    assert rows[2]["n_queries"] == 2
    assert rows[2]["mean_recall_at_k"] is not None
