"""SCD2 snapshots (dbt snapshot parity).

≈ dbt snapshots with ``strategy='timestamp'`` and
``invalidate_hard_deletes=True``
(`dbt_projects/emergency_data/snapshots/disaster_declarations_snapshot.sql:4-13`
and 3 siblings): track history of a mutable source table as
(valid_from, valid_to, is_current) versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

VALID_FROM, VALID_TO, IS_CURRENT = "dbt_valid_from", "dbt_valid_to", "is_current"


def scd2_init(source: DataFrame, updated_at: str) -> DataFrame:
    """First snapshot: every row current."""
    return (
        source.withColumn(VALID_FROM, F.col(updated_at))
        .withColumn(VALID_TO, F.lit(None).cast("timestamp"))
        .withColumn(IS_CURRENT, F.lit(True))
    )


def scd2_merge(
    snapshot: DataFrame,
    source: DataFrame,
    key: str,
    updated_at: str,
    hard_deletes: bool = True,
) -> DataFrame:
    """Timestamp-strategy SCD2 merge without Delta MERGE (plain Spark):

    - changed rows (same key, newer ``updated_at``) close the current version
      and append a new current one;
    - unseen keys insert as current;
    - keys absent from the source hard-invalidate (``invalidate_hard_deletes``):
      current version closes at the merge's max source timestamp. Set
      ``hard_deletes=False`` when the source is a PARTIAL slice (e.g. a
      streaming microbatch of changed rows) — absence then means
      "unchanged", not "deleted".

    One full-outer join on the key — a single shuffle; at 100 TB run per
    date-partition slice.
    """
    cur = snapshot.filter(F.col(IS_CURRENT))
    hist = snapshot.filter(~F.col(IS_CURRENT))
    s = source.select(key, updated_at, *[c for c in source.columns if c not in (key, updated_at)])

    j = cur.alias("c").join(s.alias("s"), F.col(f"c.{key}") == F.col(f"s.{key}"), "full_outer")
    changed = F.col(f"s.{key}").isNotNull() & F.col(f"c.{key}").isNotNull() & (
        F.col(f"s.{updated_at}") > F.col(f"c.{updated_at}")
    )
    deleted = (
        F.col(f"s.{key}").isNull() & F.col(f"c.{key}").isNotNull()
        if hard_deletes
        else F.lit(False)
    )
    inserted = F.col(f"c.{key}").isNull() & F.col(f"s.{key}").isNotNull()

    close_ts = source.agg(F.max(updated_at)).first()[0]

    # close out changed/deleted current rows
    closed = (
        j.filter(changed | deleted)
        .select("c.*")
        .withColumn(VALID_TO, F.when(F.lit(True), F.coalesce(F.lit(close_ts)).cast("timestamp")))
        .withColumn(IS_CURRENT, F.lit(False))
    )
    # keep unchanged current rows
    kept = j.filter(~(changed | deleted) & F.col(f"c.{key}").isNotNull()).select("c.*")
    # new current versions for changed + inserted keys
    fresh = (
        j.filter(changed | inserted)
        .select("s.*")
        .withColumn(VALID_FROM, F.col(updated_at))
        .withColumn(VALID_TO, F.lit(None).cast("timestamp"))
        .withColumn(IS_CURRENT, F.lit(True))
    )
    return hist.unionByName(closed).unionByName(kept).unionByName(fresh)
