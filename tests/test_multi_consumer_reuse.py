"""Multi-consumer recompute guards (VERDICT r8 #4).

A frame with several lazy consumers silently re-plans its whole upstream
subtree per consumer unless (a) the plan is restructured to one consumer,
(b) the frame is persisted, or (c) exchange/stage reuse provably dedupes
it. These guards pin the states we measured:

- gr_modularity_regions: the r8 shape fed rflow to 5 consumers and the
  executed plan scanned lineitem 6x (41 distinct query stages, zero
  reuse). The r9 shape is one linear chain (explode + region agg + 5-row
  windows): exactly ONE lineitem and ONE orders scan may remain.
- dd_snapshot_dedup_rate: the pair self-join was consumed twice via a
  union-of-selects (measured 3.78s -> 0.78s at sf0.1 after the explode
  restructure); the symmetrization must stay a single-consumer explode
  (no Union node) with the shingle frame persisted.
- dd_minhash_estimate: the two deliberate persists (shingle frame x5
  consumers, pair frame x2) must stay in the plan — dropping either was
  measured at 2-3x the cost (SCALING.md r8).

All counts read the FINAL AQE plan section only ("== Initial Plan ==" and
later text double-count every node).
"""

from __future__ import annotations

from emdatapipelines_spark.cachectl import release_tracked
from emdatapipelines_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def _final_plan(spark, name: str) -> str:
    # RAW registry queries, not the __spark_entry__ wrapper: for pinning
    # queries the wrapper checkpoints the result (its plan is just `Scan
    # ExistingRDD`), hiding the upstream plan these guards inspect. The
    # harness contract applies: release the pins after materializing.
    df = QUERIES[name](spark, SF)
    df.collect()  # finalize AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    release_tracked()
    return plan.split("== Initial Plan ==")[0]


def test_modularity_single_fact_scan(spark):
    plan = _final_plan(spark, "gr_modularity_regions")
    assert plan.count("lineitem.parquet") == 1, "rflow subtree re-executed"
    assert plan.count("orders.parquet") == 1


def test_snapshot_dedup_symmetrize_is_single_consumer(spark):
    plan = _final_plan(spark, "dd_snapshot_dedup_rate")
    # the pair join must not be duplicated by a union-of-selects
    assert "Union" not in plan, "pair self-join re-planned via Union"
    # the shingle explode must come from the persisted frame
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan


def test_minhash_estimate_keeps_both_persists(spark):
    plan = _final_plan(spark, "dd_minhash_estimate")
    n_cached = plan.count("InMemoryTableScan") + plan.count("TableCacheQueryStage")
    assert n_cached >= 2, "shingle/pair persist dropped — measured 2-3x cost"
