"""Versioned snapshot sink (versioned.py): atomic commits, time travel,
append-by-reference, vacuum retention."""

from __future__ import annotations

import os

from emdatapipelines_spark.versioned import (
    history,
    read_versioned,
    vacuum,
    write_versioned,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS val")


def test_overwrite_and_time_travel(spark, tmp_path):
    p = str(tmp_path / "tbl")
    assert write_versioned(_df(spark, 0, 10), p) == 0
    assert write_versioned(_df(spark, 100, 105), p) == 1
    assert read_versioned(spark, p).count() == 5            # latest
    assert read_versioned(spark, p, version=0).count() == 10  # time travel
    assert [h["version"] for h in history(p)] == [0, 1]


def test_append_references_previous_snapshot(spark, tmp_path):
    p = str(tmp_path / "tbl")
    write_versioned(_df(spark, 0, 10), p)
    write_versioned(_df(spark, 10, 15), p, mode="append")
    latest = read_versioned(spark, p)
    assert latest.count() == 15
    assert {r["id"] for r in latest.collect()} == set(range(15))
    # append must NOT copy v0's data — v1 holds only the delta
    v1_rows = spark.read.parquet(os.path.join(p, "v=1", "data")).count()
    assert v1_rows == 5
    assert read_versioned(spark, p, version=0).count() == 10


def test_vacuum_keeps_referenced_data(spark, tmp_path):
    p = str(tmp_path / "tbl")
    write_versioned(_df(spark, 0, 10), p)               # v0
    write_versioned(_df(spark, 10, 12), p, mode="append")  # v1 refs v0 data
    write_versioned(_df(spark, 20, 23), p, mode="append")  # v2 refs v0+v1
    removed = vacuum(p, keep_last=2)
    assert removed == [0]
    # v0's manifest is gone but its DATA survives (v1/v2 reference it)
    assert not os.path.exists(os.path.join(p, "v=0", "_manifest.json"))
    assert read_versioned(spark, p).count() == 15
    assert read_versioned(spark, p, version=1).count() == 12


def test_partitioned_snapshot_prunes(spark, tmp_path):
    p = str(tmp_path / "tbl")
    df = spark.range(0, 100).selectExpr("id", "id % 4 AS part")
    write_versioned(df, p, partition_by=["part"])
    got = read_versioned(spark, p).filter("part = 2")
    assert got.count() == 25
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "part" in plan.split("PartitionFilters")[1][:80]


def test_diff_versions_classification(spark, tmp_path):
    from emdatapipelines_spark.versioned import diff_versions, write_versioned

    p = str(tmp_path / "tbl")
    v0 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k INT, v STRING"
    )
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k INT, v STRING"
    )
    write_versioned(v0, p)
    write_versioned(v1, p)
    got = {
        (r["change_type"], r["k"])
        for r in diff_versions(spark, p, 0, 1, keys=["k"]).collect()
    }
    assert got == {("update", 2), ("delete", 3), ("insert", 4)}


def test_diff_versions_schema_mismatch_raises(spark, tmp_path):
    import pytest as _pytest

    from emdatapipelines_spark.versioned import diff_versions, write_versioned

    p = str(tmp_path / "tbl")
    write_versioned(spark.createDataFrame([(1, "a")], "k INT, v STRING"), p)
    write_versioned(spark.createDataFrame([(1, "a", 2)], "k INT, v STRING, w INT"), p)
    with _pytest.raises(ValueError, match="schemas differ"):
        diff_versions(spark, p, 0, 1, keys=["k"])


def test_write_audit_publish_blocks_bad_snapshot(spark, tmp_path):
    from emdatapipelines_spark.versioned import (
        AuditFailed,
        history,
        read_versioned,
        write_versioned,
    )

    p = str(tmp_path / "tbl")

    def no_nulls(staged):
        n = staged.filter("val IS NULL").count()
        return [f"{n} null vals"] if n else []

    good = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, val STRING")
    bad = spark.createDataFrame([(3, None)], "id INT, val STRING")

    assert write_versioned(good, p, audit=no_nulls) == 0
    try:
        write_versioned(bad, p, audit=no_nulls)
        raise AssertionError("audit should have failed")
    except AuditFailed as e:
        assert "1 null vals" in e.violations[0]
    # readers still see v0; no orphan version is visible
    assert read_versioned(spark, p).count() == 2
    assert [h["version"] for h in history(p)] == [0]
    # a later good commit reuses the orphaned slot cleanly
    assert write_versioned(good, p, audit=no_nulls) == 1


def test_compact_folds_append_chain(spark, tmp_path):
    import glob

    from emdatapipelines_spark.versioned import (
        compact,
        history,
        read_versioned,
        write_versioned,
    )

    p = str(tmp_path / "tbl")
    write_versioned(spark.range(0, 10).coalesce(2), p)
    write_versioned(spark.range(10, 20).coalesce(2), p, mode="append")
    write_versioned(spark.range(20, 30).coalesce(2), p, mode="append")

    v = compact(spark, p, num_files=1)
    assert v == 3
    latest = read_versioned(spark, p)
    assert latest.count() == 30
    assert {r["id"] for r in latest.collect()} == set(range(30))
    # compacted snapshot is one directory, one file
    files = glob.glob(f"{p}/v=3/data/part-*.parquet")
    assert len(files) == 1
    # provenance + history preserved (v2 still readable pre-vacuum)
    assert history(p)[-1]["meta"] == {"compaction_of": 2}
    assert read_versioned(spark, p, version=2).count() == 30


def test_streaming_incremental_upsert_last_wins(spark, tmp_path):
    from emdatapipelines_spark.streaming.incremental import incremental_upsert
    from emdatapipelines_spark.streaming.sources import stream_source
    from emdatapipelines_spark.versioned import read_versioned

    src = str(tmp_path / "src")
    rows = spark.createDataFrame(
        [(1, 1, "old"), (2, 1, "keep"), (1, 2, "new")], "k INT, ver INT, val STRING"
    )
    rows.write.mode("overwrite").parquet(src)
    table = str(tmp_path / "tbl")
    q = incremental_upsert(
        stream_source(spark, "file", schema=rows.schema, path=src).drop("proc_time"),
        table,
        keys=["k"],
        version_col="ver",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = {r["k"]: (r["ver"], r["val"]) for r in read_versioned(spark, table).collect()}
    assert got == {1: (2, "new"), 2: (1, "keep")}


def test_vacuum_after_compact_reclaims_append_chain(spark, tmp_path):
    import glob

    from emdatapipelines_spark.versioned import (
        compact,
        read_versioned,
        vacuum,
        write_versioned,
    )

    p = str(tmp_path / "tbl")
    write_versioned(spark.range(0, 10), p)
    write_versioned(spark.range(10, 20), p, mode="append")
    write_versioned(spark.range(20, 30), p, mode="append")
    compact(spark, p, num_files=1)                      # v3 owns all rows
    assert vacuum(p, keep_last=1) == [0, 1, 2]
    # pre-compaction data directories are physically gone
    assert glob.glob(f"{p}/v=0/data") == []
    assert glob.glob(f"{p}/v=1/data") == []
    assert glob.glob(f"{p}/v=2/data") == []
    latest = read_versioned(spark, p)
    assert latest.count() == 30
    assert {r["id"] for r in latest.collect()} == set(range(30))


def test_drop_partitions_retention_without_rewrite(spark, tmp_path):
    import glob

    from emdatapipelines_spark.versioned import (
        drop_partitions,
        history,
        read_versioned,
        vacuum,
        write_versioned,
    )

    p = str(tmp_path / "tbl")
    df = spark.range(0, 100).selectExpr("id", "CAST(id % 5 AS INT) AS day")
    write_versioned(df, p, partition_by=["day"])

    v = drop_partitions(spark, p, "day", keep=lambda val: int(val) >= 2)
    assert v == 1
    latest = read_versioned(spark, p)
    assert latest.count() == 60
    assert dict(latest.dtypes)["day"] == "int"  # partition col reconstructed
    assert {r["day"] for r in latest.select("day").distinct().collect()} == {2, 3, 4}
    # zero rewrite: the retention version has NO data directory of its own
    assert glob.glob(f"{p}/v=1/data") == []
    # time travel to the pre-retention snapshot still sees everything
    assert read_versioned(spark, p, version=0).count() == 100
    assert history(p)[-1]["meta"] == {"retained_partitions": 3}

    # appending after retention unions new rows with the survivors
    write_versioned(
        spark.range(100, 110).selectExpr("id", "CAST(9 AS INT) AS day"),
        p,
        mode="append",
        partition_by=["day"],
    )
    assert read_versioned(spark, p).count() == 70

    # vacuum reclaims only the DROPPED partitions of v0; survivors stay
    removed = vacuum(p, keep_last=2)
    assert removed == [0]
    assert glob.glob(f"{p}/v=0/data/day=0") == []
    assert glob.glob(f"{p}/v=0/data/day=1") == []
    assert glob.glob(f"{p}/v=0/data/day=2") != []
    assert read_versioned(spark, p).count() == 70


def test_drop_partitions_requires_partitioned_table(spark, tmp_path):
    import pytest as _pytest

    from emdatapipelines_spark.versioned import drop_partitions, write_versioned

    p = str(tmp_path / "tbl")
    write_versioned(spark.range(10), p)
    with _pytest.raises(ValueError, match="not partitioned"):
        drop_partitions(spark, p, "day", keep=lambda v: True)


def test_additive_schema_evolution_on_append(spark, tmp_path):
    """An append commit may add columns: readers of the merged snapshot see
    the union schema with nulls for pre-evolution rows (without mergeSchema
    the first parquet footer wins and the new column is silently DROPPED),
    while time travel to the old version keeps the old schema."""
    from pyspark.sql import functions as F

    d = str(tmp_path / "tbl")
    write_versioned(spark.range(3).withColumnRenamed("id", "k"), d)
    write_versioned(
        spark.range(3, 5).withColumnRenamed("id", "k").withColumn("extra", F.lit("x")),
        d,
        mode="append",
    )
    cur = read_versioned(spark, d)
    assert set(cur.columns) == {"k", "extra"}
    rows = {r["k"]: r["extra"] for r in cur.collect()}
    assert len(rows) == 5
    assert rows[4] == "x" and rows[0] is None  # old rows null-filled
    assert read_versioned(spark, d, version=0).columns == ["k"]  # time travel
