"""Driver-facing query suite: one named query per implemented operator from
SURVEY §2 (+ LLM-data extensions), each paired with an ANSI-SQL oracle that
DuckDB can run over the same parquet fixtures.

Import side effect: importing this package registers every query.

Registration ORDER matters: the driver's correctness run checks the first 50
``queries()`` entries only (CORRECTNESS_r01.json recorded exactly the first
50 in insertion order). Rotation policy (VERDICT r4 #1):

1. FRONT: queries with no green driver row yet (today: the 9 rows-only
   approx/ANN/ML queries), oracle-equipped first, cheapest-first.
2. BACK: the cumulative greens, ordered STALEST-FIRST (oldest last-verified
   round first, cheapest-first within a round) so the driver re-proves the
   oldest hashes under the current fixtures/pyspark before re-proving recent
   ones. 74 of the 132 greens were last verified before the NTZ fixture
   regeneration; this ordering retires that backlog in ~1-2 rounds.

``DRIVER_GREEN`` (name -> last round with a green rows+schema+hash row) is
computed from the committed CORRECTNESS_r*.json artifacts at import time, so
each new round's results refresh the rotation automatically with no manual
edit. A hardcoded snapshot is the fallback if the artifacts are unreadable.
"""

import glob as _glob
import json as _json
import os as _os
import re as _re

from .registry import QUERIES, ORACLES, query  # noqa: F401
from . import relational  # noqa: F401,E402
from . import relational_ext  # noqa: F401,E402
from . import quality_queries  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import analytics_ext  # noqa: F401,E402
from . import tpch_ext  # noqa: F401,E402

_REPO_ROOT = _os.path.join(_os.path.dirname(__file__), "..", "..")


def _green_rounds() -> dict[str, int]:
    """name -> latest round whose CORRECTNESS_r*.json has a full green row."""
    out: dict[str, int] = {}
    for path in sorted(_glob.glob(_os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path, "r", encoding="utf-8") as fh:
                rows = _json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                out[name] = max(rnd, out.get(name, 0))
    return out


# Snapshot through CORRECTNESS_r04.json (132 greens), used only if the
# artifacts are missing. Values are the last-verified round.
_GREEN_SNAPSHOT: dict[str, int] = {
    "a10_surrogate_key": 4, "a11_percentiles": 1, "a13_rollup_totals": 2,
    "a14_cube_margins": 2, "a15_pivot_daily_matrix": 2, "a16_ntile_deciles": 2,
    "a17_salted_skew_agg": 2, "a19_reaggregate_monthly": 3, "a1_pricing_summary": 4,
    "a20_retention_cohorts": 2, "a22_histogram_quantiles": 4, "a3_yearly_trend": 1,
    "a4_privacy_agg": 4, "a5_count_distinct": 4, "a6_union_profile": 4,
    "a7_config_window_agg": 1, "a9_profile_metrics": 2, "alert_rules_fired": 4,
    "dd_cluster_assign": 3, "dd_decontaminate": 3, "dd_dedup_survivors": 3,
    "dd_embedding_clusters": 3, "dd_embedding_neardup": 2, "dd_exact_dedup": 2,
    "dd_jaccard_pairs": 3, "enc_roundtrip": 2, "fn_event_scoring": 1,
    "fn_state_mask": 1, "gr_pagerank_trade": 4, "j10_click_to_purchase": 2,
    "j11_fuzzy_name_match": 2, "j1_dim_enrich": 4, "j2_fact_join_yearly": 4,
    "j3_interval_join": 4, "j4_date_key_join": 1, "j5_anti_join": 4,
    "j6_consistency_join": 1, "j8_map_lookup": 4, "j9_asof_latest_click": 2,
    "llm_clean_corpus": 3, "llm_cluster_safe_split": 4, "llm_corpus_stats": 2,
    "llm_pack_plan": 2, "llm_shuffle_order": 2, "llm_training_mix": 2,
    "lm_unigram_surprisal": 4, "m4_recommendations": 4, "ml_daily_features": 2,
    "ml_risk_bands": 2, "mm_frame_plan": 2, "mm_resize": 2, "o1_recent_limit": 1,
    "o2_case_sort_limit": 4, "o4_topk_nations": 4, "o6_keyset_pagination": 2,
    "p1_project_cast": 4, "p2_notnull_keys": 1, "p3_recent_events": 4,
    "p4_enum_filter": 4, "p6_active_alerts": 1, "p7_range_validate": 4,
    "q10_test_suite": 2, "q11_drift_psi": 2, "q1_completeness": 2,
    "q2_outliers": 2, "q3_consistency": 3, "q4_freshness": 2, "q5_validity": 2,
    "q6_concentration": 2, "q7_pii_redact": 3, "q7_pii_scan": 2,
    "q9_quality_report": 1, "s10_upsert_last_wins": 1, "s13_retention": 1,
    "s16_merge_cdc": 2, "s17_versioned_history": 3, "s18_version_diff": 3,
    "s19_from_json_typed": 2, "s1_string_funcs": 4, "s2_date_funcs": 4,
    "s3_math_funcs": 4, "s4_case_ladder": 1, "s5_json_extract": 2,
    "scd2_status_history": 1, "sim_cosine_topk": 2, "sql1_revenue_by_region": 3,
    "st_session_window": 2, "st_tumbling_1h": 2, "tenant_scoped_view": 2,
    "tpch_q10_returned_items": 1, "tpch_q11_important_stock": 4,
    "tpch_q12_late_priority": 4, "tpch_q13_custdist": 1,
    "tpch_q14_promo_effect": 1, "tpch_q15_top_supplier": 3,
    "tpch_q16_supplier_cnt": 4, "tpch_q17_small_quantity": 1,
    "tpch_q18_large_orders": 1, "tpch_q19_bracket_revenue": 4,
    "tpch_q20_promo_suppliers": 4, "tpch_q21_sole_fault_supplier": 4,
    "tpch_q22_sales_opportunity": 3, "tpch_q2_min_cost_supplier": 4,
    "tpch_q3_shipping_priority": 1, "tpch_q4_priority_semi": 1,
    "tpch_q5_local_supplier": 1, "tpch_q6_forecast_revenue": 2,
    "tpch_q7_volume_shipping": 1, "tpch_q8_market_share": 3,
    "tpch_q9_product_profit": 4, "ts_corr_pairs": 2, "ts_resample_ffill": 4,
    "tx_c4_line_filter": 4, "tx_chunking": 2, "tx_fingerprint": 2,
    "tx_language_id": 2, "tx_quality": 2, "tx_repetition": 3,
    "tx_tfidf_keywords": 3, "tx_token_counts": 2, "tx_vocab_freq": 2,
    "u1_union_entities": 4, "u4_intersect_except": 2, "w10_time_weighted_avg": 2,
    "w1_lag_yoy": 4, "w2_row_number_code": 4, "w3_rolling_count": 4,
    "w4_trailing_mean": 4, "w5_lead_target": 4, "w6_sessionize": 2,
    "w8_streak_islands": 2, "w9_funnel_stages": 2,
}

GREEN_ROUNDS: dict[str, int] = _green_rounds() or dict(_GREEN_SNAPSHOT)
DRIVER_GREEN: set[str] = set(GREEN_ROUNDS)


def _bench_times() -> dict[str, float]:
    """Last recorded per-query timings (BENCH_FULL.json at the repo root),
    used as the tie-break within a staleness tier: under a TIME budget,
    cheapest-first maximizes the number of re-verified rows."""
    path = _os.path.join(_REPO_ROOT, "BENCH_FULL.json")
    try:
        with open(path, "r", encoding="utf-8") as fh:
            return dict(_json.load(fh).get("queries") or {})
    except (OSError, ValueError):
        return {}


#: Rows-only (no-oracle) queries whose IMPLEMENTATION changed this round —
#: only these re-enter the driver's 50-slot window (VERDICT r11 #3: a
#: rows-only query can never turn green, so keeping all 12 in front
#: permanently starves the stalest greens of re-verification slots; r11
#: spent 12/50 slots on them while q4_freshness et al. sat at r6). The 9
#: unchanged ones go to the very back: their rows-only record from the
#: last round still describes the current code.
ROWS_ONLY_REINCLUDE: set[str] = {
    # r14: empty — no rows-only query's result-affecting code changed this
    # round (the entry wrapper gained a try/finally release and a
    # diagnostic pinned-bytes gauge, neither of which alters any plan or
    # row). All 12 rows-only records from r12/r13 still describe current
    # code; every freed slot goes to the 28-name r7-tier anchor rotation.
}


#: The full r7-tier backlog (VERDICT r13 #2): the 28 queries whose last
#: green driver row is round 7 — pinned ahead of the ordinary
#: stalest-first tier so every one lands inside the 50-slot window this
#: round regardless of cost ranking; the remaining ~22 slots fall to the
#: r8 tier via the ordinary stalest-first ordering. (The r13 anchors —
#: a3_yearly_trend et al. — greened in r13 and rotate back automatically.)
ANCHOR_FIRST: tuple[str, ...] = (
    "a29_key_skew_gini",
    "a30_assoc_rules",
    "a32_mutual_information",
    "a33_share_of_parent",
    "a34_rfm_segments",
    "a35_growth_accounting",
    "a36_slo_burn",
    "a37_cohort_ltv",
    "j14_attribution",
    "j15_interval_coalesce",
    "lm_conditional_entropy",
    "lm_next_word_topk",
    "ml_confusion_thresholds",
    "ml_knn_eval",
    "ml_lift_deciles",
    "ml_ridge_2d",
    "o7_skyline",
    "q13_mad_outliers",
    "q14_chi2_independence",
    "q16_entropy_profile",
    "q17_luhn_check",
    "sim_cluster_separation",
    "sk_bloom_prefilter",
    "ts_seasonal_strength",
    "tx_burstiness",
    "tx_collocations",
    "tx_lexical_diversity",
    "tx_readability",
)


def _rotate() -> None:
    """Never-verified oracle-equipped -> changed rows-only -> pinned stale
    anchors -> greens stalest-first -> unchanged rows-only (already
    recorded, code untouched)."""
    times = _bench_times()
    cost = lambda n: times.get(n, 1.0)  # noqa: E731 - unknown cost -> middle
    front_oracle = sorted(
        (n for n in QUERIES if n not in DRIVER_GREEN and n in ORACLES), key=cost
    )
    rows_only = [n for n in QUERIES if n not in DRIVER_GREEN and n not in ORACLES]
    front_weak = sorted((n for n in rows_only if n in ROWS_ONLY_REINCLUDE), key=cost)
    tail_weak = sorted((n for n in rows_only if n not in ROWS_ONLY_REINCLUDE), key=cost)
    anchors = [n for n in ANCHOR_FIRST if n in QUERIES and n in DRIVER_GREEN]
    back = sorted(
        (n for n in QUERIES if n in DRIVER_GREEN and n not in set(anchors)),
        key=lambda n: (GREEN_ROUNDS.get(n, 0), cost(n)),
    )
    ordered = front_oracle + front_weak + anchors + back + tail_weak
    for d in (QUERIES, ORACLES):
        snap = dict(d)
        d.clear()
        d.update({n: snap[n] for n in ordered if n in snap})


_rotate()
