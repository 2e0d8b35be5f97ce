"""Q9 — composite quality report.

≈ `ops/data_quality_ops.py:738-872` + `jobs/quality_jobs.py:47-178`: weighted
overall score over the five quality dimensions with status bands. Operates on
already-aggregated metric values (tiny), so plain Python is appropriate here —
this is the one deliberately driver-side step, mirroring the reference.
"""

from __future__ import annotations

#: dimension weights (`jobs/quality_jobs.py:125-132`).
DEFAULT_WEIGHTS = {
    "completeness": 0.25,
    "accuracy": 0.25,
    "consistency": 0.20,
    "timeliness": 0.15,
    "validity": 0.10,
    "uniqueness": 0.05,
}

STATUS_BANDS = [
    (0.95, "excellent"),
    (0.85, "good"),
    (0.70, "fair"),
    (0.50, "poor"),
    (0.0, "critical"),
]


def composite_quality_score(scores: dict[str, float], weights: dict[str, float] | None = None) -> dict:
    """Weighted overall score + status band + recommendations."""
    weights = weights or DEFAULT_WEIGHTS
    used = {k: v for k, v in scores.items() if k in weights}
    total_w = sum(weights[k] for k in used) or 1.0
    overall = sum(scores[k] * weights[k] for k in used) / total_w
    status = next(label for cutoff, label in STATUS_BANDS if overall >= cutoff)
    recommendations = [
        f"improve {dim}: score {val:.2f} below 0.85" for dim, val in sorted(used.items()) if val < 0.85
    ]
    return {
        "overall_score": round(overall, 6),
        "status": status,
        "dimension_scores": used,
        "recommendations": recommendations,
    }
