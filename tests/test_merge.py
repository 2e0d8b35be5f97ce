"""MERGE INTO clause semantics (operators/merge.py) — every clause path on a
hand-built target/source pair, plus plan shape (one join, no nested loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from emdatapipelines_spark.operators.merge import merge_into


def _frames(spark):
    target = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"), (4, 40.0, "d")],
        "id bigint, val double, tag string",
    )
    # id=1 update, id=2 delete (flag), id=3 matched but fails update cond,
    # id=5 insert, id=6 insert blocked by condition; id=4 target-only.
    source = spark.createDataFrame(
        [
            (1, 11.0, False),
            (2, 0.0, True),
            (3, -1.0, False),
            (5, 50.0, False),
            (6, 60.0, True),
        ],
        "id bigint, val double, deleted boolean",
    )
    return target, source


def test_all_clause_paths(spark):
    target, source = _frames(spark)
    out = merge_into(
        target,
        source,
        on=["id"],
        when_matched_update={"val": F.col("s.val")},
        when_matched_update_condition=F.col("s.val") > F.col("t.val"),
        when_matched_delete_condition=F.col("s.deleted"),
        when_not_matched_insert={
            "id": F.col("s.id"),
            "val": F.col("s.val"),
            "tag": F.lit("new"),
        },
        when_not_matched_insert_condition=~F.col("s.deleted"),
    )
    rows = {r["id"]: (r["val"], r["tag"]) for r in out.collect()}
    assert rows == {
        1: (11.0, "a"),   # matched, update cond true -> new val, tag kept
        3: (30.0, "c"),   # matched, update cond false -> unchanged
        4: (40.0, "d"),   # target-only -> kept
        5: (50.0, "new"), # source-only, insert cond true
    }                     # 2 deleted; 6 insert blocked


def test_default_clauses_upsert_shape(spark):
    """No conditions + no explicit expressions == plain keyed upsert where
    source columns overwrite and unseen keys insert (nulls for missing)."""
    target, source = _frames(spark)
    out = merge_into(
        target,
        source.drop("deleted"),
        on=["id"],
        when_matched_update={"val": F.col("s.val")},
    )
    rows = {r["id"]: (r["val"], r["tag"]) for r in out.collect()}
    assert rows[1] == (11.0, "a") and rows[2] == (0.0, "b")
    assert rows[5] == (50.0, None)  # default insert: source cols, null tag
    assert rows[4] == (40.0, "d")


def test_null_clause_conditions_keep_row(spark):
    """A clause condition evaluating to NULL (null CDC flag, null comparison
    input) is NOT satisfied — the matched row must survive unchanged, exactly
    like Delta/ANSI MERGE. Regression: `matched & ~NULL` is NULL and filter()
    used to silently delete the row."""
    target = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
        "id bigint, val double, tag string",
    )
    # id=1: null deleted flag AND null val (null update condition too).
    # id=2: real delete. id=3: real update.
    source = spark.createDataFrame(
        [(1, None, None), (2, 0.0, True), (3, 33.0, False)],
        "id bigint, val double, deleted boolean",
    )
    out = merge_into(
        target,
        source,
        on=["id"],
        when_matched_update={"val": F.col("s.val")},
        when_matched_update_condition=F.col("s.val") > F.col("t.val"),
        when_matched_delete_condition=F.col("s.deleted"),
        when_not_matched_insert_condition=F.col("s.deleted").isNotNull() & ~F.col("s.deleted"),
    )
    rows = {r["id"]: (r["val"], r["tag"]) for r in out.collect()}
    assert rows == {
        1: (10.0, "a"),  # null delete-cond + null update-cond -> unchanged
        3: (33.0, "c"),  # update still applies
    }  # 2 deleted


def test_null_insert_condition_drops_row(spark):
    """NULL insert condition = not satisfied: the source-only row is skipped,
    not inserted."""
    target = spark.createDataFrame([(1, 10.0)], "id bigint, val double")
    source = spark.createDataFrame(
        [(5, 50.0, None), (6, 60.0, True)], "id bigint, val double, keep boolean"
    )
    out = merge_into(
        target,
        source.select("id", "val", "keep"),
        on=["id"],
        when_not_matched_insert={"id": F.col("s.id"), "val": F.col("s.val")},
        when_not_matched_insert_condition=F.col("s.keep"),
    )
    ids = sorted(r["id"] for r in out.collect())
    assert ids == [1, 6]  # 5's NULL keep-flag blocks the insert


def test_plan_single_join_no_nested_loop(spark):
    target, source = _frames(spark)
    out = merge_into(target, source, on=["id"])
    plan = out._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Join") >= 1
