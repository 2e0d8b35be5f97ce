"""Round-9 ADVICE regressions.

1. ppm ladders over ``F.length`` (IntegerType) must widen to BIGINT BEFORE
   the *1e6 multiply: a >= ~2148-char doc wraps int32 in non-ANSI Spark
   while the DuckDB oracle's length() is BIGINT — silent cross-engine
   divergence the short-doc fixtures never exercised (ADVICE r8 medium).
2. ``ts_similarity_topk`` segment bucketing must floor (not truncate
   toward zero) and clamp to [0, 5] so pre-epoch events agree with the
   oracle's ``//`` floor division (ADVICE r8 low).
3. ``hits_weighted`` rejects iterations < 1 instead of crashing with
   AttributeError on the final join (ADVICE r8 low).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from emdatapipelines_spark.operators.graph import hits_weighted


@pytest.fixture(scope="module")
def longdoc_dir(spark, tmp_path_factory):
    """A documents fixture whose one long doc overflows int32 at *1e6."""
    base = tmp_path_factory.mktemp("longdocs")
    # 5000 chars: 2500 '{' symbols + 2500 'a' -> n_sym=2500, and
    # 2500 * 1_000_000 = 2.5e9 > 2^31-1 (wraps to -1794967296 on int32).
    long_text = "{a" * 2500
    rows = [
        (1, long_text, "web"),
        (2, "plain prose here", "web"),
        (3, "x = f(y); // code-ish", "code"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.write.mode("overwrite").parquet(str(base / "documents.parquet"))
    return str(base)


def test_tx_code_detect_no_int32_wrap(spark, longdoc_dir):
    got = {
        r["doc_id"]: r
        for r in entry.queries()["tx_code_detect"](spark, longdoc_dir).collect()
    }
    r = got[1]
    assert r["n_chars"] == 5000
    # exact: 2500 * 1_000_000 div 5000 = 500_000 ppm (half the chars are sym)
    assert r["sym_ppm"] == 500_000
    assert r["sym_ppm"] >= 0  # the int32 wrap produced a negative ppm
    assert r["looks_like_code"] is True
    assert r["digit_ppm"] == 0


def test_curriculum_order_no_int32_wrap(spark, longdoc_dir):
    got = {
        r["doc_id"]: r
        for r in entry.queries()["llm_curriculum_order"](spark, longdoc_dir).collect()
    }
    r = got[1]
    # norm("{a"*2500) is one 5000-char token (no spaces): n_tokens=1,
    # difficulty = (5000 - 1 + 1) * 1e6 / 1 = 5_000_000_000 > int32.
    assert r["n_tokens"] == 1
    assert r["difficulty_ppm"] == 5_000_000_000
    assert r["difficulty_ppm"] > 0


def test_ts_similarity_seg_floor_clamps_pre_epoch(spark, tmp_path):
    # Events before 2024-01-01: cast-int truncation gives seg 0 for
    # datediff in (-4..-1) but floor gives -1 — both engines must clamp
    # to seg 0 so the PAA profile stays on the 6-segment spine.
    rows = []
    for uid in (1, 101, 300):
        rows += [
            (uid * 10 + i, uid, dt.datetime(2023, 12, 29, 12), "click", 1.0)
            for i in range(3)
        ]
        rows += [
            (uid * 10 + 5 + i, uid, dt.datetime(2024, 1, 20, 12), "view", 1.0)
            for i in range(2)
        ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = entry.queries()["ts_similarity_topk"](spark, str(tmp_path)).collect()
    # probes: user_id % 100 == 1 and < 2000 -> users 1 and 101. All three
    # users share the identical profile [3,0,0,3+?..] -> dist2 == 0 for
    # every pair; the point is it RUNS and every distance is exact 0
    # (pre-epoch rows landed in seg 0 on both engines, not seg -1).
    assert len(out) > 0
    assert all(r["dist2"] == 0 for r in out)


def test_hits_weighted_rejects_nonpositive_iterations(spark):
    edges = spark.createDataFrame(
        [("A", "B", 1)], "src string, dst string, w long"
    )
    with pytest.raises(ValueError, match="iterations >= 1"):
        hits_weighted(edges, iterations=0)
