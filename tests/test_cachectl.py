"""cachectl — the pinned-frame ledger that closes the cache-lifetime loop
(r11 VERDICT #1 / r11 ADVICE): engine internals register their eager
localCheckpoints and persists; the harness releases them AFTER result
materialization, so a long-suite JVM never accumulates leaked blocks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from emdatapipelines_spark import cachectl


def _n_pinned(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_tracked_checkpoint_release_frees_blocks(spark):
    cachectl.release_tracked()  # clean slate
    spark.catalog.clearCache()
    base = _n_pinned(spark)
    ck = cachectl.tracked_local_checkpoint(
        spark.range(1000).select("id", (F.col("id") * 2).alias("v"))
    )
    assert ck.count() == 1000
    assert cachectl.tracked_count() == 1
    assert _n_pinned(spark) == base + 1
    assert cachectl.release_tracked() == 1
    assert cachectl.tracked_count() == 0
    assert _n_pinned(spark) == base


def test_tracked_persist_release_and_recompute(spark):
    cachectl.release_tracked()
    spark.catalog.clearCache()
    base = _n_pinned(spark)
    p = cachectl.tracked_persist(spark.range(500).select((F.col("id") + 1).alias("x")))
    assert p.count() == 500
    assert _n_pinned(spark) == base + 1
    assert cachectl.release_tracked() == 1
    assert _n_pinned(spark) == base
    # persist (unlike checkpoint) keeps lineage: post-release recompute works
    assert p.count() == 500


def test_release_is_idempotent_and_safe_when_empty(spark):
    cachectl.release_tracked()
    assert cachectl.release_tracked() == 0


def test_pinned_queries_release_to_zero(spark):
    """The three r11-ADVICE queries pin through the ledger and the harness
    contract (materialize → release) leaves zero persistent RDDs behind."""
    import __spark_entry__ as entry

    SF_SMALL = "/root/testdata/sf0.001"
    qs = entry.queries()
    cachectl.release_tracked()
    spark.catalog.clearCache()
    base = _n_pinned(spark)
    for name in ("dd_minhash_lsh", "ml_forest_predictions", "dd_jaccard_pairs"):
        qs[name](spark, SF_SMALL).collect()
        assert cachectl.tracked_count() > 0, f"{name} registered nothing"
        cachectl.release_tracked()
        assert _n_pinned(spark) == base, f"{name} leaked pinned blocks"


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
