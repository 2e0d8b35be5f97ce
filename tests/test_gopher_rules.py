"""Gopher document-quality rules (llmdata/text.py: gopher_rules) — rule-by-
rule on hand-built docs covering each threshold, plus the zero-shuffle plan
property (the filter must stay a single codegen'd scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from emdatapipelines_spark.llmdata.text import gopher_rules

GOOD = (
    "The quick brown fox jumps over that lazy dog and runs off with great "
    "speed to be sure of the outcome and have fun."
)

DOCS = [
    (1, GOOD),                                     # passes every rule
    (2, "word " * 5),                              # too few words
    (3, ("a " * 30).strip()),                      # mean word length 1 < 3
    (4, GOOD + " ##### ### ## # #### ## # ## ##"),  # symbol ratio > 0.1
    (5, "- " + GOOD.replace(". ", ".\n- ")),       # every line bulleted
    (6, GOOD.replace(".", "...")),                 # every line ends in ellipsis
    (7, ("123 456 " * 10) + "the of"),             # alpha word frac < 0.8
    (8, "alpha beta gamma delta epsilon " * 6),    # no required stopwords
    (9, ""),                                       # empty text: n_words 0
]


def _run(spark, **kw):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    g = gopher_rules("text", min_words=10, **kw)
    out = df.select("doc_id", *[v.alias(k) for k, v in g.items()])
    return out, {r["doc_id"]: r for r in out.collect()}


def test_each_rule_fires(spark):
    _, out = _run(spark)
    assert out[1]["passes_gopher"]
    assert not out[2]["passes_gopher"] and out[2]["n_words"] == 5
    assert not out[3]["passes_gopher"] and out[3]["mean_word_len"] == 1.0
    assert not out[4]["passes_gopher"] and out[4]["symbol_ratio"] > 0.1
    assert not out[5]["passes_gopher"] and out[5]["bullet_line_frac"] == 1.0
    assert not out[6]["passes_gopher"] and out[6]["ellipsis_line_frac"] > 0.3
    assert not out[7]["passes_gopher"] and out[7]["alpha_word_frac"] < 0.8
    assert not out[8]["passes_gopher"] and out[8]["required_hits"] < 2
    assert not out[9]["passes_gopher"] and out[9]["n_words"] == 0


def test_published_defaults_gate_on_50_words(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id bigint, text string")
    g = gopher_rules("text")  # min_words=50 (Rae et al. 2021 default)
    row = df.select(g["n_words"].alias("n"), g["passes_gopher"].alias("p")).first()
    assert row["n"] < 50 and not row["p"]


def test_zero_shuffle_plan(spark):
    out, _ = _run(spark)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
