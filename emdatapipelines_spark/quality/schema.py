"""Q8 — declarative schema validation.

≈ `utils/data_validation.py:55-144`: required columns, logical types,
nullability, regex patterns, and a compliance score, evaluated against a
DataFrame without collecting it (structure checks are metadata-only; pattern
and null checks are one aggregate pass).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

#: logical type → acceptable Spark type names
#: (`config/validation_schemas.py:9-264` uses string|datetime|numeric|boolean)
LOGICAL_TYPES = {
    "string": {"string", "varchar"},
    "datetime": {"timestamp", "timestamp_ntz", "date"},
    "numeric": {"int", "bigint", "smallint", "double", "float", "decimal", "long"},
    "boolean": {"boolean"},
}


@dataclass
class ColumnSpec:
    name: str
    logical_type: str = "string"
    required: bool = False       # column must exist
    not_null: bool = False       # no null values allowed
    pattern: str | None = None   # regex every non-null value must match
    enum: list | None = None
    min_value: float | None = None
    max_value: float | None = None


@dataclass
class SchemaSpec:
    name: str
    columns: list[ColumnSpec] = field(default_factory=list)


def validate_schema(df: DataFrame, spec: SchemaSpec) -> dict:
    """Validate ``df`` against ``spec``; returns a report dict with
    structural errors, per-rule violation counts, and a 0–1 compliance score
    (`data_validation.py:123-144` weights structure and content equally)."""
    dtypes = {name: dt.split("(")[0] for name, dt in df.dtypes}
    errors: list[str] = []
    checks: list = []
    labels: list[tuple[str, str]] = []

    for col in spec.columns:
        if col.name not in dtypes:
            if col.required:
                errors.append(f"missing required column: {col.name}")
            continue
        allowed = LOGICAL_TYPES.get(col.logical_type, {col.logical_type})
        if dtypes[col.name] not in allowed:
            errors.append(
                f"type mismatch {col.name}: {dtypes[col.name]} not in {sorted(allowed)}"
            )
        c = F.col(col.name)
        if col.not_null:
            checks.append(F.count(F.when(c.isNull(), 1)))
            labels.append((col.name, "null_violations"))
        if col.pattern is not None:
            checks.append(F.count(F.when(c.isNotNull() & ~c.cast("string").rlike(col.pattern), 1)))
            labels.append((col.name, "pattern_violations"))
        if col.enum is not None:
            checks.append(F.count(F.when(c.isNotNull() & ~c.isin(col.enum), 1)))
            labels.append((col.name, "enum_violations"))
        if col.min_value is not None or col.max_value is not None:
            lo = col.min_value if col.min_value is not None else float("-inf")
            hi = col.max_value if col.max_value is not None else float("inf")
            checks.append(F.count(F.when(c.isNotNull() & ~c.between(lo, hi), 1)))
            labels.append((col.name, "range_violations"))

    violations: dict[str, int] = {}
    if checks:
        row = df.agg(*[chk.alias(f"c{i}") for i, chk in enumerate(checks)]).first()
        for i, (col_name, kind) in enumerate(labels):
            n = int(row[f"c{i}"])
            if n:
                violations[f"{col_name}.{kind}"] = n

    n_rules = max(len(labels) + sum(1 for c in spec.columns if c.required), 1)
    n_failed = len(errors) + len(violations)
    score = max(0.0, 1.0 - n_failed / n_rules)
    return {
        "schema": spec.name,
        "structural_errors": errors,
        "violations": violations,
        "is_valid": not errors and not violations,
        "compliance_score": round(score, 4),
    }
