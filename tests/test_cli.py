"""CLI module (python -m emdatapipelines_spark) — list/run/explain."""

from __future__ import annotations

import json

from emdatapipelines_spark.__main__ import main


def test_list_names(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "a1_pricing_summary" in out and len(out) > 150


def test_unknown_query_fails_cleanly(capsys):
    assert main(["run", "nope_not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_run_json(spark, capsys):
    assert (
        main(
            [
                "run",
                "o4_topk_nations",
                "--sf-dir",
                "/root/testdata/sf0.001",
                "--format",
                "json",
                "--limit",
                "3",
            ]
        )
        == 0
    )
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert 1 <= len(lines) <= 3
    assert all(isinstance(json.loads(l), dict) for l in lines)


def test_run_csv_quotes_embedded_delimiters(spark, capsys):
    """CSV output must round-trip through csv.reader even when text columns
    contain commas (TPC-H comments do; raw str-join corrupted rows before)."""
    import csv as _csv
    import io

    assert (
        main(["run", "p1_project_cast", "--sf-dir", "/root/testdata/sf0.001",
              "--format", "csv", "--limit", "5"]) == 0
    )
    out = capsys.readouterr().out
    parsed = list(_csv.reader(io.StringIO(out)))
    assert 2 <= len(parsed) <= 6  # header + rows, no row corruption
    assert all(len(r) == len(parsed[0]) for r in parsed)


def test_run_table_single_execution(spark, capsys):
    """Table format renders from the collected rows (one execution)."""
    assert (
        main(["run", "o4_topk_nations", "--sf-dir", "/root/testdata/sf0.001",
              "--limit", "3"]) == 0
    )
    out = capsys.readouterr().out.splitlines()
    assert any("-+-" in l or "---" in l for l in out)  # header rule rendered
    assert len([l for l in out if l.strip()]) >= 2


def test_explain_prints_plan(spark, capsys):
    assert main(["explain", "j1_dim_enrich", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert "Physical Plan" in capsys.readouterr().out
