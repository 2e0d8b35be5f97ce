"""Governed streaming run (VERDICT r11 #4): the composed streaming
pipeline — dedup ingest, rollup, co-occurrence graph, keyed upsert —
under one GovernanceLog, with a mid-stream kill/restart whose recovered
final state must equal every batch twin. The committed artifact is
GOVERNED_STREAM.json (scripts/run_governed_stream.py at sf0.1); this pins
the invariants at sf0.001.
"""

from __future__ import annotations

import pytest

from emdatapipelines_spark.pipelines.governed_stream import run_governed_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def report(spark, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("governed_stream"))
    return run_governed_stream(spark, SF, work)


def test_crash_was_injected_and_replayed(report):
    d = report["dedup"]
    assert d["crashed_as_planned"], "the kill never fired"
    # the injected crash fires AFTER the sink write but BEFORE the
    # watermark append, so the killed batch must be absent from leg 1's
    # committed set — the exactly-once recovery in one line (r12 ADVICE:
    # the previous or-form was vacuously true)
    assert d["kill_batch"] not in d["leg1_batches"]
    assert d["replayed"], "restart did not replay the killed batch"
    # the watermark at crash had NOT advanced past the killed batch (the
    # crash sat between sink and commit), and the final watermark covers
    # every snapshot
    assert d["watermark_at_crash"] is not None
    assert d["watermark_at_crash"] < d["kill_batch"] or d["kill_batch"] == 0
    assert d["final_watermark"] == report["n_snapshots"] - 1
    assert d["recovery_sec"] > 0


def test_final_state_equals_batch_twins(report):
    eq = report["equivalence"]
    assert all(eq.values()), f"stream ≠ batch twin: {eq}"


def test_gates_and_governance(report):
    assert report["gate_status"] == "pass", report["gate_results"]
    # one lineage edge per declared stream model + the three replay inputs
    assert report["lineage_records"] >= 8
    # crash + recovery compliance events at minimum
    assert report["compliance_events"] >= 2


@pytest.fixture(scope="module")
def rollup_kill_report(spark, tmp_path_factory):
    """VERDICT r12 #4: the crash injected in a DIFFERENT leg — the rollup's
    post-commit/pre-checkpoint window, the dual of the dedup leg's
    post-sink/pre-commit kill."""
    work = str(tmp_path_factory.mktemp("governed_stream_rollup_kill"))
    return run_governed_stream(spark, SF, work, kill_leg="rollup")


def test_rollup_kill_crashes_and_replay_skips(rollup_kill_report):
    r = rollup_kill_report["rollup"]
    assert rollup_kill_report["kill_leg"] == "rollup"
    assert r["crashed_as_planned"], "the rollup kill never fired"
    # leg 1 COMMITTED the killed batch before the crash (applied=True) …
    assert {"batch": r["kill_batch"], "applied": True} in r["leg1_batches"]
    # … so the replay must SKIP it (applied=False) — re-applying would
    # double-count the partials
    assert r["replay_skipped"], r["leg2_batches"]
    assert {"batch": r["kill_batch"], "applied": False} in r["leg2_batches"]
    assert r["recovery_sec"] > 0
    # every later chunk applied exactly once across both legs
    applied = [b["batch"] for b in r["leg1_batches"] + r["leg2_batches"] if b["applied"]]
    assert sorted(applied) == sorted(set(applied))


def test_rollup_kill_final_states_equal_batch_twins(rollup_kill_report):
    eq = rollup_kill_report["equivalence"]
    assert all(eq.values()), f"stream ≠ batch twin: {eq}"
    # the un-killed dedup leg ran crash-free in this configuration
    assert not rollup_kill_report["dedup"]["crashed_as_planned"]
    assert not rollup_kill_report["dedup"]["was_kill_leg"]
    assert rollup_kill_report["rollup"]["was_kill_leg"]
    assert rollup_kill_report["gate_status"] == "pass"


@pytest.fixture(scope="module")
def cooc_kill_report(spark, tmp_path_factory):
    """VERDICT r13 #4: the crash injected in the MOST STATE-HEAVY leg —
    the co-occurrence graph accumulator's post-commit/pre-checkpoint
    window. Re-applying the killed batch would double-credit every
    co-occurrence in it, so the replay must be a detected no-op."""
    work = str(tmp_path_factory.mktemp("governed_stream_cooc_kill"))
    return run_governed_stream(spark, SF, work, kill_leg="cooccurrence")


def test_cooc_kill_crashes_and_replay_skips(cooc_kill_report):
    c = cooc_kill_report["cooccurrence"]
    assert cooc_kill_report["kill_leg"] == "cooccurrence"
    assert c["was_kill_leg"]
    assert c["crashed_as_planned"], "the cooccurrence kill never fired"
    # leg 1 COMMITTED the killed batch before the crash (applied=True) …
    assert {"batch": c["kill_batch"], "applied": True} in c["leg1_batches"]
    # … so the replay must SKIP it (applied=False) — re-applying would
    # double-credit the pair counts
    assert c["replay_skipped"], c["leg2_batches"]
    assert {"batch": c["kill_batch"], "applied": False} in c["leg2_batches"]
    assert c["recovery_sec"] > 0
    # every chunk applied exactly once across both legs
    applied = [b["batch"] for b in c["leg1_batches"] + c["leg2_batches"] if b["applied"]]
    assert sorted(applied) == sorted(set(applied))


def test_cooc_kill_final_states_equal_batch_twins(cooc_kill_report):
    eq = cooc_kill_report["equivalence"]
    assert all(eq.values()), f"stream ≠ batch twin: {eq}"
    # the other legs ran crash-free in this configuration
    assert not cooc_kill_report["dedup"]["crashed_as_planned"]
    assert not cooc_kill_report["dedup"]["was_kill_leg"]
    assert not cooc_kill_report["rollup"]["was_kill_leg"]
    assert cooc_kill_report["gate_status"] == "pass"
