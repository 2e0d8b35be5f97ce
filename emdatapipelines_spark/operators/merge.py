"""Generic MERGE INTO (CDC apply) operator.

The reference's write path exposes two mutation primitives: keyed upsert via
``INSERT ... ON DUPLICATE KEY UPDATE`` (`resources/database.py:111-117`) and
predicate deletes for retention (`resources/database.py:215-218`); its
StarRocks primary-key tables resolve concurrent writes last-wins. This module
generalizes that contract to full Delta/Iceberg-style MERGE semantics —
WHEN MATCHED [AND cond] THEN UPDATE/DELETE, WHEN NOT MATCHED [AND cond] THEN
INSERT — as a single-shuffle batch operator over immutable columnar data.

Scale shape: ONE full-outer shuffle join on the merge keys decides every
row's fate; all clause logic is per-row Column expressions (whole-stage
codegen, no UDFs, no second pass). If the target table is bucketed by the
merge keys (io.write_bucketed), the target side needs no shuffle at all.
Skewed source keys are handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Alias names the caller can use in clause conditions / update expressions.
TARGET_ALIAS = "t"
SOURCE_ALIAS = "s"


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    *,
    when_matched_update: dict[str, Column] | None = None,
    when_matched_update_condition: Column | None = None,
    when_matched_delete_condition: Column | None = None,
    when_not_matched_insert: dict[str, Column] | None = None,
    when_not_matched_insert_condition: Column | None = None,
) -> DataFrame:
    """Apply MERGE semantics and return the new target contents.

    ``on`` must uniquely key both sides (standard MERGE precondition — the
    reference's ON DUPLICATE KEY path assumes a primary key the same way).

    Clause semantics (Delta-compatible ordering):
      matched  & delete-cond            -> row removed
      matched  & update-cond (else all) -> target row with ``when_matched_update``
                                           expressions applied (missing columns
                                           keep the target value)
      matched  otherwise                -> target row unchanged
      source-only & insert-cond         -> ``when_not_matched_insert`` values
                                           (default: source values for target
                                           columns, null where absent)
      target-only                       -> kept as-is

    Conditions and value expressions reference the two sides through the
    aliases ``t`` / ``s`` (e.g. ``F.col("s.value") > F.col("t.value")``).
    """
    out_cols = target.columns
    tt = target.alias(TARGET_ALIAS)
    ss = source.alias(SOURCE_ALIAS)

    # Presence markers survive the outer join even when every payload column
    # of a side is legitimately NULL.
    tt = tt.withColumn("__t_present", F.lit(1))
    ss = ss.withColumn("__s_present", F.lit(1))
    cond = None
    for k in on:
        c = F.col(f"{TARGET_ALIAS}.{k}").eqNullSafe(F.col(f"{SOURCE_ALIAS}.{k}"))
        cond = c if cond is None else (cond & c)
    joined = tt.join(ss, cond, "full_outer")

    matched = F.col("__t_present").isNotNull() & F.col("__s_present").isNotNull()
    source_only = F.col("__t_present").isNull()
    target_only = F.col("__s_present").isNull()

    # A clause condition that evaluates to NULL (e.g. a null CDC flag in the
    # comparison) counts as NOT satisfied, matching Delta/ANSI MERGE. Without
    # the coalesce, `matched & ~NULL` is NULL and filter() would silently
    # DELETE the row instead of leaving it unchanged.
    upd_cond = (
        F.coalesce(when_matched_update_condition, F.lit(False))
        if when_matched_update_condition is not None
        else F.lit(True)
    )
    del_cond = (
        F.coalesce(when_matched_delete_condition, F.lit(False))
        if when_matched_delete_condition is not None
        else F.lit(False)
    )
    ins_cond = (
        F.coalesce(when_not_matched_insert_condition, F.lit(False))
        if when_not_matched_insert_condition is not None
        else F.lit(True)
    )
    updates = when_matched_update or {}
    src_cols = set(source.columns)
    inserts = when_not_matched_insert or {
        c: (F.col(f"{SOURCE_ALIAS}.{c}") if c in src_cols else F.lit(None)) for c in out_cols
    }

    # Delete wins over update (evaluated first, like Delta's clause order);
    # unmatched-insert rows failing the insert condition are dropped.
    keep = (
        (matched & ~del_cond)
        | target_only
        | (source_only & ins_cond)
    )

    projected = []
    for c in out_cols:
        t_val = F.col(f"{TARGET_ALIAS}.{c}")
        upd_val = updates.get(c, t_val)
        ins_val = inserts.get(c, F.lit(None))
        expr = (
            F.when(matched & upd_cond, upd_val)
            .when(matched, t_val)
            .when(source_only, ins_val)
            .otherwise(t_val)
        )
        projected.append(expr.alias(c))
    return joined.filter(keep).select(*projected)
