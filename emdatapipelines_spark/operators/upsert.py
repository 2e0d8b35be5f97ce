"""Keyed upsert semantics (SURVEY §2.1 S10).

The reference writes with ``INSERT ... ON DUPLICATE KEY UPDATE`` in batches
(`resources/database.py:86-138`): last write for a key wins. On immutable
columnar storage the same contract is expressed as keyed last-wins
deduplication — also the idempotent-sink core for exactly-once streaming
(`foreachBatch` + dedupe, SURVEY §2.9 T4/T9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def upsert_last_wins(
    existing: DataFrame | None,
    incoming: DataFrame,
    keys: list[str],
    version_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Merge ``incoming`` into ``existing``: one row per key, the highest
    ``version_col`` (then tiebreakers) wins; incoming beats existing on equal
    versions.

    Single shuffle on the key columns (window `row_number`); at scale, if the
    target table is bucketed by ``keys`` the shuffle is one-sided.
    """
    inc = incoming.withColumn("__src", F.lit(1))
    both = inc if existing is None else existing.withColumn("__src", F.lit(0)).unionByName(inc)
    order = [F.col(version_col).desc(), F.col("__src").desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        both.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
