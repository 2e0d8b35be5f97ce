"""Relational operator library (SURVEY §2.2–§2.7 inventory).

Composable DataFrame → DataFrame functions. Everything is declarative —
Catalyst gets the whole plan (pushdown, pruning, join selection); the helpers
only encode semantics the reference pinned down (null-extension rules, custom
orderings, privacy thresholds, upsert/SCD2 merge logic).
"""

from .projections import null_out_of_range, config_filter, select_rename  # noqa: F401
from .joins import dim_enrich_join, interval_join, anti_join, map_lookup  # noqa: F401
from .aggregates import (  # noqa: F401
    conditional_count,
    privacy_threshold_agg,
    union_of_aggregates,
    windowed_agg,
)
from .windows import lag_over, rolling_time_count, trailing_mean, lead_over  # noqa: F401
from .sorts import case_rank, top_k_by_group  # noqa: F401
from .upsert import upsert_last_wins  # noqa: F401
from .reaggregate import (  # noqa: F401
    combine_partials,
    hll_merge,
    hll_partial,
    merge_partials,
    partial_aggregate,
    salted_aggregate,
)
from .sessions import funnel_stages, session_stats, sessionize  # noqa: F401
from .joins import fuzzy_name_pairs, salted_join  # noqa: F401
from .scd2 import scd2_merge  # noqa: F401
