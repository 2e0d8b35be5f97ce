"""Unit tests for the as-of join (operators/joins.py) and benchmark
decontamination (llmdata/dedup.py) — hand-built frames with known answers,
covering the tie/no-match/threshold edges the oracle queries can miss."""

import datetime as dt

from pyspark.sql import functions as F

from emdatapipelines_spark.llmdata.dedup import decontaminate
from emdatapipelines_spark.operators.joins import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_nulls(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),  # before any right row
            (1, _ts("2024-01-01T12:00:00"), "p2"),  # exact tie with right @12
            (1, _ts("2024-01-01T13:30:00"), "p3"),  # between 12 and 14
            (2, _ts("2024-01-01T12:00:00"), "p4"),  # other key, no right rows
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T11:00:00"), 11.0),
            (1, _ts("2024-01-01T12:00:00"), 12.0),
            (1, _ts("2024-01-01T14:00:00"), 14.0),
        ],
        "k int, ts timestamp, v double",
    )
    out = {
        r["tag"]: (r["v"], r["ts_right"])
        for r in asof_join(left, right, on=["k"], right_cols=["v"]).collect()
    }
    assert out["p1"] == (None, None)  # no prior right row
    assert out["p2"] == (12.0, _ts("2024-01-01T12:00:00"))  # inclusive tie
    assert out["p3"] == (12.0, _ts("2024-01-01T12:00:00"))  # latest prior
    assert out["p4"] == (None, None)  # key with no right side


def test_asof_multiple_left_same_ts(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "a"), (1, _ts("2024-01-01T12:00:00"), "b")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), 5.0)], "k int, ts timestamp, v double"
    )
    rows = asof_join(left, right, on=["k"], right_cols=["v"]).collect()
    assert sorted((r["tag"], r["v"]) for r in rows) == [("a", 5.0), ("b", 5.0)]


def test_asof_single_shuffle_plan(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T12:00:00"), "a")], "k int, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts("2024-01-01T11:00:00"), 5.0)], "k int, ts timestamp, v double")
    plan = asof_join(left, right, on=["k"], right_cols=["v"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # union + window: exactly one exchange feeds the window sort
    assert plan.count("Exchange hashpartitioning") == 1


def test_decontaminate_threshold_and_short_docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (0, base),                          # eval doc (id % 53 == 0)
            (1, base + " extra tail tokens"),   # shares 4 shingles -> flagged
            (2, "alpha beta gamma delta epsilon unrelated"),  # shares 1 < 3
            (3, "totally different words here again now ok"),  # shares 0
            (4, "alpha beta gamma"),            # < 5 tokens: no shingles
        ],
        "doc_id long, text string",
    )
    out = decontaminate(
        docs.filter(F.col("doc_id") % 53 != 0),
        docs.filter(F.col("doc_id") % 53 == 0),
        n=5,
        min_shared=3,
    ).collect()
    assert {r["doc_id"]: r["n_shared_shingles"] for r in out} == {1: 4}
