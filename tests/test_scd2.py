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


def test_apply_scd2_batch_sequence_and_replay(spark, tmp_path):
    """Three batches drive the dimension through insert → change → late
    no-op; a replayed batch is a detected no-op; intra-batch multi-updates
    collapse to last-per-key before the merge."""
    from emdatapipelines_spark.streaming.incremental import apply_scd2_batch
    from emdatapipelines_spark.versioned import read_versioned

    path = str(tmp_path / "dim")
    schema = "id long, status string, updated_at timestamp"

    def rows(*r):
        from datetime import datetime

        return spark.createDataFrame(
            [(i, s, datetime.fromisoformat(ts)) for i, s, ts in r], schema
        )

    # batch 1: initial image (+ an intra-batch double update of id 2)
    assert apply_scd2_batch(
        rows((1, "open", "2024-01-01T00:00:00"),
             (2, "open", "2024-01-01T00:00:00"),
             (2, "ack", "2024-01-01T06:00:00")),
        1, path, "id", "updated_at",
    )
    snap = {(r["id"], r["status"], r["is_current"])
            for r in read_versioned(spark, path).collect()}
    assert snap == {(1, "open", True), (2, "ack", True)}

    # batch 2: id 2 changes, id 3 appears; id 1 absent -> unchanged (no
    # hard deletes on a partial slice)
    assert apply_scd2_batch(
        rows((2, "closed", "2024-01-02T00:00:00"),
             (3, "open", "2024-01-02T00:00:00")),
        2, path, "id", "updated_at",
    )
    out = read_versioned(spark, path).collect()
    cur = {(r["id"], r["status"]) for r in out if r["is_current"]}
    hist = {(r["id"], r["status"]) for r in out if not r["is_current"]}
    assert cur == {(1, "open"), (2, "closed"), (3, "open")}
    assert hist == {(2, "ack")}

    # replay of batch 2: detected, not re-merged
    assert not apply_scd2_batch(
        rows((2, "closed", "2024-01-02T00:00:00")), 2, path, "id", "updated_at"
    )
    assert read_versioned(spark, path).count() == len(out)


def test_incremental_scd2_streaming_end_to_end(spark, tmp_path):
    """The foreachBatch wiring drains a file stream into the dimension."""
    from emdatapipelines_spark.streaming.incremental import incremental_scd2
    from emdatapipelines_spark.versioned import read_versioned
    from datetime import datetime

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (1, "open", datetime(2024, 1, 1)),
            (1, "closed", datetime(2024, 1, 2)),
            (2, "open", datetime(2024, 1, 1)),
        ],
        "id long, status string, updated_at timestamp",
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "id long, status string, updated_at timestamp"
    ).parquet(src)
    q = incremental_scd2(
        stream, str(tmp_path / "dim"), "id", "updated_at",
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    out = read_versioned(spark, str(tmp_path / "dim")).collect()
    cur = {(r["id"], r["status"]) for r in out if r["is_current"]}
    # one batch: intra-batch collapse keeps the latest state of id 1
    assert cur == {(1, "closed"), (2, "open")}


def test_scd2_merge_hard_deletes_flag(spark):
    """hard_deletes=False must keep keys absent from the source current;
    True must close them (the original dbt invalidate_hard_deletes)."""
    from datetime import datetime

    from emdatapipelines_spark.operators.scd2 import scd2_init, scd2_merge

    base = spark.createDataFrame(
        [(1, "a", datetime(2024, 1, 1)), (2, "b", datetime(2024, 1, 1))],
        "id long, v string, updated_at timestamp",
    )
    snap = scd2_init(base, "updated_at")
    upd = spark.createDataFrame(
        [(2, "b2", datetime(2024, 1, 2))], "id long, v string, updated_at timestamp"
    )
    soft = scd2_merge(snap, upd, "id", "updated_at", hard_deletes=False)
    assert {(r["id"], r["is_current"]) for r in soft.collect()} == {
        (1, True), (2, False), (2, True)
    }
    hard = scd2_merge(snap, upd, "id", "updated_at", hard_deletes=True)
    assert {(r["id"], r["v"], r["is_current"]) for r in hard.collect()} == {
        (1, "a", False), (2, "b", False), (2, "b2", True)
    }
