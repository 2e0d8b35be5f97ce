"""M4 — rule-based operational recommendations.

≈ `assets/ml_assets.py:430-571`: thresholds over model accuracy, recent risk
level, data-quality status and calendar month produce a prioritized action
list. Driver-side plain Python over collected aggregates by design — the
inputs are a handful of scalars, not data-plane rows.
"""

from __future__ import annotations

from ..clock import DEFAULT_CLOCK, Clock

#: month → hazard season hints (`ml_assets.py:394-397` seasonal multipliers)
_SEASONAL_WATCH = {
    (6, 7, 8): "wildfire/drought monitoring",
    (3, 4, 5): "flood/tornado monitoring",
    (12, 1, 2): "winter-storm monitoring",
    (9, 10, 11): "hurricane monitoring",
}


def recommendations(
    model_accuracy: float | None = None,
    recent_risk_level: str | None = None,
    quality_status: str | None = None,
    clock: Clock = DEFAULT_CLOCK,
) -> list[dict]:
    """Produce a prioritized action list (priority 1 = act now)."""
    out: list[dict] = []
    if model_accuracy is not None and model_accuracy < 0.7:
        out.append(
            {
                "priority": 1,
                "category": "model",
                "action": f"retrain risk model (accuracy {model_accuracy:.2f} < 0.70)",
            }
        )
    if recent_risk_level in ("HIGH", "VERY_HIGH", "CRITICAL"):
        out.append(
            {
                "priority": 1,
                "category": "operations",
                "action": f"escalate monitoring cadence: recent risk {recent_risk_level}",
            }
        )
    if quality_status in ("POOR", "CRITICAL", "FAIR"):
        out.append(
            {
                "priority": 2,
                "category": "data_quality",
                "action": f"investigate ingestion quality (status {quality_status})",
            }
        )
    month = clock.py_date().month
    for months, watch in _SEASONAL_WATCH.items():
        if month in months:
            out.append({"priority": 3, "category": "seasonal", "action": f"enable {watch}"})
    return sorted(out, key=lambda r: r["priority"])
