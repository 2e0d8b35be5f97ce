"""C4 line-level cleaning (llmdata/text.py: c4_line_filter) — rule-by-rule
on hand-built multi-line docs (the parquet documents fixture has no line
structure), plus the no-UDF/no-explode plan property."""

from __future__ import annotations

from emdatapipelines_spark.llmdata.text import apply_c4_line_filter

DOCS = [
    (1, "Good first line.\nshort.\nAnother proper sentence here!\nno punct line at all"),
    (2, "Enable javascript to continue reading.\nReal content stays right here."),
    (3, "tiny\nx y\nz"),                      # every line fails -> doc dropped
    (4, 'He said "stop".\nA line ending with quote."'),
]


def _run(spark, **kw):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in apply_c4_line_filter(df, **kw).collect()}


def test_line_rules(spark):
    out = _run(spark)
    # doc 1: keeps the two proper sentences; drops short + unpunctuated
    assert out[1]["text"] == "Good first line.\nAnother proper sentence here!"
    assert out[1]["kept_lines"] == 2
    # doc 2: javascript boilerplate line dropped, content kept
    assert out[2]["text"] == "Real content stays right here."
    # doc 3: all lines fail -> doc removed entirely
    assert 3 not in out
    # doc 4: terminal quote counts as sentence punctuation
    assert out[4]["kept_lines"] == 2


def test_thresholds_and_blocklist_are_configurable(spark):
    out = _run(spark, min_kept_lines=2, blocklist=("stop",))
    assert out[2]["kept_lines"] == 2  # custom blocklist no longer bans javascript
    assert 4 not in out               # "stop" line blocklisted -> 1 kept < 2


def test_stays_jvm_side(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    plan = apply_c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" not in plan  # no explode — array ops stay in-row
