"""Projection / filter operators (SURVEY §2.2 P1–P7)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def select_rename(df: DataFrame, mapping: dict[str, str | Column]) -> DataFrame:
    """P1 — projection with rename/cast: ``{out_name: in_col_or_expr}``.

    ≈ staging SELECT lists (`models/staging/stg_fema_disasters.sql:20-49`).
    Pure projection → Catalyst prunes unused source columns down to the scan.
    """
    return df.select(
        *[(F.col(v) if isinstance(v, str) else v).alias(k) for k, v in mapping.items()]
    )


def null_out_of_range(col, lo, hi, scale: int | None = None) -> Column:
    """P7 — range-validating projection: value inside [lo, hi] (optionally
    rounded), NULL outside.

    ≈ ``CASE WHEN temperature BETWEEN -50 AND 60 THEN ROUND(CAST(...)) ELSE
    NULL END`` (`models/staging/stg_coagmet_data.sql:36-54`,
    `stg_usda_data.sql:30-49`).
    """
    c = F.col(col) if isinstance(col, str) else col
    v = F.round(c, scale) if scale is not None else c
    return F.when(c.between(lo, hi), v)


def config_filter(df: DataFrame, rules: dict[str, dict]) -> DataFrame:
    """P5 — config-driven filter chain.

    ≈ `ops/data_processing_ops.py:69-82`: per-column dict supporting
    ``{"min":..,"max":..}`` ranges, ``{"in":[...]}`` include-lists and
    ``{"eq": ...}`` exact matches. All rules AND together; each becomes a
    plain predicate Catalyst can push to the scan.
    """
    cond = F.lit(True)
    for col, rule in rules.items():
        c = F.col(col)
        if "min" in rule:
            cond = cond & (c >= rule["min"])
        if "max" in rule:
            cond = cond & (c <= rule["max"])
        if "in" in rule:
            cond = cond & c.isin(list(rule["in"]))
        if "eq" in rule:
            cond = cond & (c == rule["eq"])
    return df.filter(cond)


def active_alert_predicate(effective_col: str, expires_col: str, now: Column) -> Column:
    """P6 — active/expired predicate with null handling.

    ≈ ``(expires > NOW() OR expires IS NULL) OR effective >= NOW() - 24h``
    (`assets/public_assets.py:140-141`, `ops/public_ops.py:106-107`).
    """
    e, x = F.col(effective_col), F.col(expires_col)
    return (x > now) | x.isNull() | (e >= now - F.expr("INTERVAL 24 HOURS"))
