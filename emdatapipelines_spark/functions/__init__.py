"""Column-expression function library (the engine's "macro" layer).

The reference implements its scalar business logic as dbt Jinja macros that
expand to inline SQL (`dbt_projects/emergency_data/macros/*.sql`) and a few
pandas row lambdas (`assets/processed_data.py:165-185`). Here every one is a
pure Python function returning a Spark ``Column`` — JVM-evaluated inside
whole-stage codegen, no serialized Python UDFs in the hot path.
"""

from .macros import (  # noqa: F401
    alert_priority,
    alert_status,
    categorize_disaster_impact,
    event_severity,
    federal_fiscal_year,
    heat_index,
    risk_score,
    season,
    seasonal_risk_factor,
    standardize_state_code,
    surrogate_key,
    timestampdiff_hours,
    safe_ratio,
    zscore,
)
