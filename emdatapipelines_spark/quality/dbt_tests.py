"""Q10 — dbt-style generic column tests as DataFrame assertions.

≈ dbt schema tests (`models/staging/schema.yml:5-129`): not_null, unique,
relationships (FK), accepted_values, dbt_utils.accepted_range. Each test
returns the count of violating rows (0 = pass), mirroring dbt's "query must
return 0 rows" contract; ``run_test_suite`` stacks results like
``store_failures`` (`dbt_project.yml:114-117`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, functions as F

from ..operators.aggregates import union_of_aggregates
from ..operators.joins import anti_join


def test_not_null(df: DataFrame, col: str) -> DataFrame:
    return df.filter(F.col(col).isNull()).agg(F.count(F.lit(1)).cast("bigint").alias("failures"))


def test_unique(df: DataFrame, col: str) -> DataFrame:
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("failures"))
    )


def test_relationships(df: DataFrame, col: str, ref: DataFrame, ref_col: str) -> DataFrame:
    """FK orphans via anti-join (`tests/data_quality_tests.yml:11-15`)."""
    orphans = anti_join(
        df.filter(F.col(col).isNotNull()), ref.select(F.col(ref_col).alias(col)), [col]
    )
    return orphans.agg(F.count(F.lit(1)).cast("bigint").alias("failures"))


def test_accepted_values(df: DataFrame, col: str, values: list) -> DataFrame:
    bad = df.filter(F.col(col).isNotNull() & ~F.col(col).isin(values))
    return bad.agg(F.count(F.lit(1)).cast("bigint").alias("failures"))


def test_accepted_range(df: DataFrame, col: str, lo: Any, hi: Any) -> DataFrame:
    bad = df.filter(F.col(col).isNotNull() & ~F.col(col).between(lo, hi))
    return bad.agg(F.count(F.lit(1)).cast("bigint").alias("failures"))


@dataclass
class TestCase:
    name: str
    frame: DataFrame  # single-row frame with a `failures` column
    meta: dict = field(default_factory=dict)


def run_test_suite(cases: list[TestCase]) -> DataFrame:
    """Stack test results into (test_name, failures, status)."""
    frames = [
        c.frame.select(
            F.lit(c.name).alias("test_name"),
            F.col("failures"),
            F.when(F.col("failures") == 0, F.lit("pass")).otherwise(F.lit("fail")).alias("status"),
        )
        for c in cases
    ]
    return union_of_aggregates(frames)
