"""SCD2 snapshot-merge semantics (dbt timestamp strategy +
invalidate_hard_deletes — SURVEY §2 data model item 5).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from emdatapipelines_spark.operators.scd2 import (
    IS_CURRENT,
    VALID_FROM,
    VALID_TO,
    scd2_init,
    scd2_merge,
)


def _src(spark, rows):
    return spark.createDataFrame(rows, "id int, attr string, updated_at timestamp")


def test_scd2_merge_change_insert_delete(spark):
    t0, t1 = datetime(2024, 1, 1), datetime(2024, 1, 15)
    snap = scd2_init(
        _src(
            spark,
            [(1, "a", t0), (2, "b", t0), (3, "c", t0)],
        ),
        "updated_at",
    )

    # id=1 changed, id=2 unchanged, id=3 deleted, id=4 inserted
    source = _src(spark, [(1, "a2", t1), (2, "b", t0), (4, "d", t1)])
    merged = scd2_merge(snap, source, key="id", updated_at="updated_at")

    rows = {(r["id"], r["attr"], r[IS_CURRENT]): r for r in merged.collect()}

    # changed key: old version closed at merge time, new version current
    assert rows[(1, "a", False)][VALID_TO] == t1
    assert rows[(1, "a2", True)][VALID_TO] is None
    # unchanged key: still one open version
    assert rows[(2, "b", True)][VALID_TO] is None
    # hard delete: closed out, no current version
    assert rows[(3, "c", False)][VALID_TO] == t1
    assert (3, "c", True) not in rows
    # insert: new current version
    assert rows[(4, "d", True)][VALID_FROM] == t1

    cur = merged.filter(F.col(IS_CURRENT))
    assert sorted(r["id"] for r in cur.collect()) == [1, 2, 4]


def test_scd2_merge_is_stable_when_source_unchanged(spark):
    t0 = datetime(2024, 1, 1)
    source = _src(spark, [(1, "a", t0), (2, "b", t0)])
    snap = scd2_init(source, "updated_at")
    merged = scd2_merge(snap, source, key="id", updated_at="updated_at")
    assert merged.count() == 2
    assert merged.filter(~F.col(IS_CURRENT)).count() == 0
