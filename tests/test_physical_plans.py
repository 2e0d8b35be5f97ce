"""Physical-plan guards: the properties that make these queries scale to
100 TB must stay visible in the plan — column-pruned scans, pushed filters,
broadcast dim joins, two-phase (partial + final) aggregation. A regression
that silently drops one of these would still pass value checks at sf0.01
while becoming a full-scan or shuffle catastrophe at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from emdatapipelines_spark.cachectl import release_tracked
from emdatapipelines_spark.queries import QUERIES as RAW_QUERIES

SF = "/root/testdata/sf0.01"


def _raw_queries():
    """RAW registry functions for PLAN inspection: the __spark_entry__
    wrapper checkpoints pinning queries' results (plan = Scan
    ExistingRDD), which would silently exempt those ~8 queries from the
    suite-wide plan audits. Callers release the pins the raw fns make."""
    return RAW_QUERIES


def _plan(spark, name: str) -> str:
    df = _raw_queries()[name](spark, SF)
    out = df._jdf.queryExecution().toString()
    release_tracked()
    return out


def _non_ingest_hash_exchanges(plan: str) -> int:
    """Hash exchanges EXCLUDING the ingest-boundary restore repartition
    (recognizable by its synthetic ``xxhash64(<table key>)`` partitioning
    expression — registry._RESTORE_KEYS). The restore moves table rows
    once at the scan and never fires on a naturally-split table; the
    shuffle-freedom guards below are about everything above it.

    r14 ADVICE: match ``xxhash64(<restore key column>`` specifically, not
    any xxhash64-partitioned exchange — the minhash/simhash pipelines
    compute xxhash64 columns of their own, and a regression shuffling on
    one of those must NOT be silently exempted."""
    from emdatapipelines_spark.queries.registry import _RESTORE_KEYS

    restore_prefixes = tuple(f"xxhash64({k}#" for k in _RESTORE_KEYS.values())
    return sum(
        1
        for seg in plan.split("Exchange hashpartitioning")[1:]
        if not seg.lstrip("( ").startswith(restore_prefixes)
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "p4_enum_filter")
    # enum + range predicates pushed into the parquet scan
    assert "PushedFilters: [" in plan
    assert "In(o_orderpriority" in plan
    assert "GreaterThanOrEqual(o_totalprice" in plan


def test_column_pruning(spark):
    plan = _plan(spark, "a1_pricing_summary")
    scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert scan_lines, "no parquet scan found"
    # the lineitem scan must NOT read join keys it doesn't need. Exception:
    # the ingest restore repartition (r14) hashes xxhash64(l_orderkey), so
    # the 8-byte key column rides the starved-fixture scan — a local-only
    # cost (the restore never fires on a naturally-split table) accepted
    # for dropping round-robin's sort-before-repartition. Any OTHER unused
    # column (l_partkey) must still be pruned.
    assert all("l_partkey" not in l for l in scan_lines)


def test_dim_joins_broadcast(spark):
    plan = _plan(spark, "j1_dim_enrich")
    assert plan.count("BroadcastHashJoin") >= 2     # nation + region
    assert "SortMergeJoin" not in plan


def test_two_phase_aggregation(spark):
    plan = _plan(spark, "a1_pricing_summary")
    # map-side combine before the shuffle
    assert "partial_sum" in plan or "partial_count" in plan
    assert plan.count("HashAggregate") >= 2


def test_flagship_broadcasts_dim_and_partial_aggs(spark):
    df = entry.entry(spark)
    plan = df._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan or "partial_sum" in plan


#: queries where a BroadcastNestedLoopJoin is the *intended* plan — each
#: broadcasts a tiny side (single-row global moments, or a handful of query
#: vectors) against the fact side, so the nested loop is O(n · tiny):
#:   ml_risk_bands / q2 / q3 / q6 / tpch_q22: crossJoin(broadcast(1-row aggregate))
#:   sim_cosine_topk: non-equi (id != id) join against broadcast query set
BNLJ_ALLOWED = {
    "a23_heavy_hitters",  # two crossJoin(broadcast(1-row total-N aggregate)) scalar joins
    "rag_bm25_topk",  # crossJoin(broadcast(1-row N/avgdl corpus-stats aggregate))
    "q12_benford",  # crossJoin(broadcast(1-row total count))
    "ts_pmi_cooccurrence",  # crossJoin(broadcast(1-row basket-count aggregate))
    "a26_kmv_set_ops",  # type-pair enumeration: non-equi join of two ~5-row type lists
    "llm_data_card",  # crossJoin(broadcast(1-row total-token aggregate))
    "ml_risk_bands",
    "rag_mmr_rerank",  # pairwise shortlist sims: non-equi (ia != ib) join
    # against the broadcast shortlist side (retrieval-bounded k·|queries|
    # rows — O(n·shortlist), by design; r14 made the formerly
    # checkpoint-hidden build visible in the lazy plan)
    "m4_recommendations",  # crossJoin(broadcast(1-row moments/tail-rate aggregates))
    "q2_outliers",
    "q3_consistency",
    "q6_concentration",
    "sim_cosine_topk",
    "tpch_q22_sales_opportunity",
    # self-validating recall_at_k columns: the exact brute-force baseline is
    # a non-equi join against the broadcast 8-query sample (bounded by the
    # query sample, not the corpus)
    "sim_lsh_topk",
    "sim_ivf_topk",
    "sim_pq_topk",
    "sim_truncated_rerank_topk",
    # ANN graph twin: non-equi brute-force recall probe over the broadcast
    # 20-source sample + crossJoin(broadcast(1-row recall aggregate))
    "sim_knn_graph_ann",
    # self-proving accuracy row (r11, VERDICT r10 #5):
    # crossJoin(broadcast(1-row train-accuracy aggregate))
    "ml_forest_predictions",
    # exact k-NN baseline (r8): non-equi join of the broadcast FIXED
    # <=20-source probe set against the corpus — bounded by the probe set,
    # the corpus side never shuffles (replaced the all-pairs O(n^2) graph,
    # VERDICT r7 #4)
    "sim_knn_graph",
    # SemDeDup centroid assignment: crossJoin(broadcast(<=20 pinned
    # centroids)) — bounded by fixed K, corpus side never shuffles
    "dd_semdedup",
    # lead-lag spine: crossJoin(broadcast(6-row lag list)) over the tiny
    # daily-counts frame
    "ts_cross_correlation",
    # 1-row scalar broadcasts: bigram-type total (KN continuation), the
    # whole-frame moment row (Brier decomposition), per-half-step L1
    # normalizers (HITS), the n/k totals row (mixture reweight), and the
    # six 1-row (n_child × n_orphan) aggregate pairs (FK orphan mart)
    "lm_kneser_ney_cont",
    "ml_brier_decomposition",
    "gr_hits",
    "llm_mixture_reweight",
    "q19_fk_orphans",
    # 1-row scalar broadcasts: total edge mass m and the Q sum (modularity)
    "gr_modularity_regions",
    # TS similarity search: non-equi join of the broadcast <=20-probe PAA
    # profiles against the user-profile frame — bounded by the probe set
    "ts_similarity_topk",
    # hybrid fusion embeds both allowlisted retrievers: bm25's 1-row
    # corpus-stats crossJoin + the dense ranker's non-equi join against the
    # broadcast single-query vector; the fusion layer itself is equi-joins
    # over the two bounded top-20 lists
    "rag_rrf_fusion",
    # 1-row scalar broadcasts: the decile frame joins the 1-row totals
    # aggregate; the skew profile joins the 1-row p50/p99 aggregate; the
    # rule pairs join the 1-row basket-count aggregate
    "ml_lift_deciles",
    "a29_key_skew_gini",
    "a30_assoc_rules",
    # contingency statistics: margin×margin grid rebuild (cell-cardinality
    # cross of two tiny margin frames) + 1-row stat broadcasts
    "q14_chi2_independence",
    "a32_mutual_information",
    "ml_woe_iv",  # 1-row P/N totals broadcast onto the category frame
    "q15_ks_test",  # 1-row (n1, n2) totals broadcast onto the 50-value frame
    "rag_ndcg",  # BM25's 1-row stats crossJoins + the 1-row DCG x IDCG join
    "tx_collocations",  # 1-row (n_uni, n_big) totals broadcast onto bigrams
    "tx_burstiness",  # 1-row doc-count broadcast onto the term frame
    "a35_growth_accounting",  # 1-row horizon max-week broadcast
    "q16_entropy_profile",  # four 1-row column-total broadcasts
    "ml_ridge_2d",  # 1-row beta broadcast for the MSE re-walk
    "lm_conditional_entropy",  # 1-row unigram/bigram total broadcasts
    "ml_knn_eval",  # all-pairs over the calendar-bounded (types x days) frame
    "sim_cluster_separation",  # 1-row scatter/size aggregates crossJoined
    "lm_good_turing",  # 1-row token/type totals broadcast onto the fof frame
    "gr_clustering_coeff",  # 1-row triangle count crossJoined onto 1-row wedge stats
    "sim_ann_param_sweep",  # all 3 ANN families' broadcast-probe non-equi scoring x9
    "ml_bootstrap_ci",  # 32-row resample-mean frame crossJoins the 1-row point stats
    "lm_js_divergence",  # 1-row corpus-token total broadcast onto the (source, term) frame
    "ml_permutation_test",  # three 1-row stat broadcasts (cut / obs_diff / exceed-count)
    "ts_wasserstein_drift",  # 5-row event-type margin crossed onto the quantized value grid
}


def test_no_accidental_nested_loop_or_cartesian(spark):
    """Suite-wide audit: a non-equi join sneaking into any other query would
    silently plan a BroadcastNestedLoopJoin/CartesianProduct — fine at
    sf0.01, catastrophic at 100 TB."""
    flagged = {}
    for name, fn in _raw_queries().items():
        plan = fn(spark, SF)._jdf.queryExecution().toString()
        release_tracked()
        if "CartesianProduct" in plan:
            flagged[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            flagged[name] = "BroadcastNestedLoopJoin"
    assert not flagged, f"unexpected nested-loop/cartesian plans: {flagged}"


@pytest.mark.parametrize("name", ["p1_project_cast", "p7_range_validate"])
def test_projection_queries_stay_codegen(spark, name):
    plan = _plan(spark, name)
    # pure-projection queries must remain a single whole-stage-codegen scan +
    # project — no exchanges ("*(n)" is the codegen-stage marker)
    assert "Exchange" not in plan
    assert "*(1) Project" in plan


def test_simhash_plan_is_shuffle_free(spark):
    """The r4 shuffle-elimination win (commit b965683): the SimHash
    OPERATOR folds row-locally — no Exchange at all in its plan. A
    refactor reintroducing the explode+groupBy shape would shuffle the
    whole token stream (catastrophic at 100 TB) while still passing
    value checks."""
    from emdatapipelines_spark.llmdata.dedup import simhash
    from emdatapipelines_spark.queries.registry import t as load

    plan = (
        simhash(load(spark, SF, "documents"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the ingest-boundary restore repartition (hashpartitioning on
    # xxhash64 of the table key since r14) moves DOC rows once and is
    # allowed; any OTHER hash exchange would mean the token stream shuffles
    assert _non_ingest_hash_exchanges(plan) == 0
    assert "Generate" not in plan  # the explode+groupBy regression shape


def test_simhash_query_shuffles_doc_rate_only(spark):
    """The dd_simhash QUERY adds the r11 self-proving group-consistency
    columns (join + window keyed on the md5 token-set key) — those
    exchanges move DOC-rate rows (id / 32-byte key), never the token
    stream: no Generate (explode) may appear anywhere in the plan, and
    the exchange count stays bounded."""
    plan = _plan(spark, "dd_simhash")
    assert "Generate" not in plan
    assert plan.count("Exchange") <= 6


def test_repetition_plan_is_shuffle_free(spark):
    """The r4 row-local fold (commit a826490): bigram repetition is a
    per-document statistic — no hash exchange anywhere in the plan (the
    only allowed Exchange is the ingest-boundary round-robin repartition,
    which moves document rows once, not the token stream)."""
    plan = _plan(spark, "tx_repetition")
    assert _non_ingest_hash_exchanges(plan) == 0
    assert plan.count("Exchange") <= 1


def test_pagerank_iterations_reuse_checkpointed_leaves(spark):
    """The localCheckpoint contract (commit 8081668): the 6-table edge-
    derivation pyramid is materialized ONCE before the superstep loop, so
    the final plan reads only checkpointed RDDs — zero parquet scans — and
    plan size stays linear in the iteration count (each superstep adds one
    join + one combiner agg, it does not re-derive the edges)."""
    plan = _plan(spark, "gr_pagerank_trade")
    assert "FileScan parquet" not in plan
    assert "ExistingRDD" in plan
    # linear growth: 3 supersteps → a handful of exchanges (join+agg each),
    # not a re-derivation pyramid per round
    assert plan.count("Exchange") <= 12


def test_keyset_pagination_pushes_on_native_timestamps(spark, tmp_path):
    """The keyset predicate must reach the parquet scan when the table's
    timestamp column is natively typed (the events fixture's ns-long ts is
    reconstructed in the plan, which blocks pushdown — a fixture artifact,
    not an operator property)."""
    from pyspark.sql import functions as F

    from emdatapipelines_spark.queries.registry import t

    p = str(tmp_path / "events_us")
    t(spark, "/root/testdata/sf0.001", "events").write.mode("overwrite").parquet(p)
    ev = spark.read.parquet(p)
    boundary = F.lit("2024-01-25 00:00:00").cast("timestamp")
    page = (
        ev.filter(
            (F.col("ts") < boundary)
            | ((F.col("ts") == boundary) & (F.col("event_id") > 500000))
        )
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(50)
    )
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        page.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, "no PushedFilters section in formatted plan"
    # the ENTIRE composite keyset predicate reaches the scan, OR included
    assert "LessThan(ts" in m.group(1) and "GreaterThan(event_id" in m.group(1)
    assert "TakeOrderedAndProject" in plan  # TopK, not a global sort


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, tmp_path):
    """At 100 TB the fact side is date-partitioned and the dim filter is the
    only thing standing between a query and a full scan: Spark's dynamic
    partition pruning must inject the dim's build-side keys as a runtime
    PartitionFilter on the fact scan (the broadcast-reuse form costs no
    extra job). A config/regression that silently disabled DPP would keep
    every value check green while re-reading the whole table."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "fact")
    fact = spark.range(100_000).select(
        "id", (F.col("id") % 30).cast("int").alias("day"), (F.col("id") * 2).alias("v")
    )
    fact.write.mode("overwrite").partitionBy("day").parquet(d)
    dim = spark.createDataFrame([(5, "keep"), (6, "keep"), (7, "drop")], "day int, tag string")
    j = spark.read.parquet(d).join(dim.filter(F.col("tag") == "keep"), "day")
    plan = j._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan parquet" in l and "PartitionFilters" in l]
    assert scan and "dynamicpruning" in scan[0].lower()


@pytest.mark.parametrize(
    "name",
    [
        "sim_cosine_topk",
        "s10_upsert_last_wins",
        "llm_clean_corpus",
        "tx_tfidf_keywords",
        "llm_stratified_k",
    ],
)
def test_rank_filters_get_window_group_limit(spark, name):
    """Every rank<=k / rn=1 filter in the suite must keep Spark's
    WindowGroupLimit rewrite (Partial before the shuffle + Final after):
    each map task forwards only its local top-k per group instead of the
    whole partition, which is the difference between shuffling k rows per
    group and shuffling the table at 100 TB. An intervening projection or a
    filter form the optimizer can't see through would silently lose it."""
    plan = _raw_queries()[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    release_tracked()
    assert "WindowGroupLimit" in plan


def test_runtime_bloom_filter_prunes_large_large_join(spark):
    """At 100 TB a fact-dim join where the (filtered) dim side is still too
    big to broadcast becomes a shuffle join that drags every fact row
    through the exchange. Spark's runtime Bloom-filter injection
    (spark.sql.optimizer.runtime.bloomFilter.*, on by default) builds a
    bloom_filter_agg over the filtered dim keys and plants
    BloomFilterMightContain on the fact side BEFORE its shuffle, pruning
    non-joining rows at the scan. This guard pins the contract: with
    broadcast off (simulating a large dim) the filter must appear."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        o = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        executed = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in optimized.lower()
        assert "might_contain" in executed.lower()
        # and the probe must sit on the FACT (lineitem) side scan subtree
        fact_side = executed.lower().split("lineitem.parquet")[0]
        assert "might_contain" in fact_side
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def _unbounded_single_partition_exchanges(plan: str) -> list[str]:
    """Return the plan lines of every planner-forced single-partition
    exchange (``Exchange SinglePartition, ENSURE_REQUIREMENTS`` — what a
    partition-less Window or global sort demands) whose input subtree is
    NOT row-bounded by an aggregate, a window-group-limit, or a limit.

    A bounded input means the funnel receives group-cardinality /
    top-k-cardinality rows (metadata-rate); an UNbounded one receives the
    whole corpus in ONE task at any scale — the w16/w17 and
    llm_shuffle_order/llm_pack_plan/llm_curriculum_order regression class
    (VERDICT r8 #1, r9 #1). Explicit byte-budgeted repartitions
    (REPARTITION_BY_NUM, e.g. multimodal.partition_by_bytes, whose
    partition count grows with total payload bytes) are out of scope.
    """
    import re

    bounding = (
        "HashAggregate",
        "SortAggregate",
        "ObjectHashAggregate",
        "WindowGroupLimit",
        "TakeOrderedAndProject",
        "LocalLimit",
        "CollectLimit",
    )

    def prefix(line: str) -> int:
        return re.match(r"^[\s:+\-*()0-9]*", line).end()

    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition, ENSURE_REQUIREMENTS" not in line:
            continue
        p = prefix(line)
        bounded = False
        for j in range(i + 1, len(lines)):
            if lines[j].strip() and prefix(lines[j]) <= p:
                break
            if any(b in lines[j] for b in bounding):
                bounded = True
                break
        if not bounded:
            bad.append(line.strip()[:100])
    return bad


def test_no_single_task_corpus_funnel_suite_wide(spark):
    """Suite-wide guard (VERDICT r9 #1): NO query may plan a single-
    partition exchange over an unbounded (corpus-rate) input. A
    ``Window.orderBy(...)`` without ``partitionBy`` — Spark's "Moving all
    data to a single partition" shape — would reappear here as
    ``Exchange SinglePartition, ENSURE_REQUIREMENTS`` with a raw scan
    below it: fine at sf0.01, one task doing 100 TB at scale. Bounded
    funnels (global windows over aggregated frames, top-k after a partial
    WindowGroupLimit) stay allowed — those receive metadata-rate rows."""
    flagged = {}
    for name, fn in _raw_queries().items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        release_tracked()
        bad = _unbounded_single_partition_exchanges(plan)
        if bad:
            flagged[name] = bad
    assert not flagged, f"unbounded single-partition exchanges: {flagged}"


def test_guard_catches_partitionless_corpus_window(spark):
    """The guard itself must flag the regression shape it exists for: a
    partition-less row_number over a raw corpus-rate frame."""
    from pyspark.sql import Window

    df = spark.read.parquet(f"{SF}/documents.parquet")
    bad = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    plan = bad._jdf.queryExecution().executedPlan().toString()
    assert _unbounded_single_partition_exchanges(plan)


def test_shuffle_order_plan_is_distributed(spark):
    """llm_shuffle_order's rank must come from the two-phase device: the
    corpus-side window partitions by the hash-prefix bucket (256-way
    parallel sort), the offsets ride a broadcast, and the only single-
    partition exchange feeds the metadata-rate offsets frame."""
    plan = _plan(spark, "llm_shuffle_order")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert not _unbounded_single_partition_exchanges(
        _raw_queries()["llm_shuffle_order"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_neardup_prefilter_has_no_global_window(spark):
    """The grid-prefilter block directory must derive block ids WITHOUT an
    unpartitioned Window (the former row_number over a global orderBy
    funneled the whole cell×sub directory — ~n rows at tight pitch —
    through one task). Hash-derived ids need no Window at all, so the
    near-dup plan must be Window-free end to end."""
    plan = _plan(spark, "dd_embedding_neardup")
    assert "Window" not in plan


def test_bm25_single_doc_cardinality_shuffle(spark):
    """BM25's only corpus-rate shuffle is the ONE doc_id hash-agg that
    computes dl + per-term conditional tfs; the former plan re-shuffled a
    full per-doc length frame into a corpus-cardinality join. Guard: no
    SortMergeJoin anywhere (scoring joins are broadcast), and the doc_id
    aggregation is two-phase (partial before the exchange)."""
    plan = _plan(spark, "rag_bm25_topk")
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan
