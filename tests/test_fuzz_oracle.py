"""Randomized differential testing vs DuckDB (VERDICT r10 #2): seeded
random plans over the fixture schemas, rendered to both engines and
hash-compared — the correctness axis the fixed 275-oracle inventory
can't provide (untested operator compositions).

The full 500-seed ledger lives in FUZZ.md (scripts/fuzz_oracle.py); this
test keeps a rotating window green in CI: FUZZ_SEEDS cases starting at
FUZZ_START (defaults 500 from seed 1 — the committed ledger's exact
range).
"""

from __future__ import annotations

import os

import pytest

from emdatapipelines_spark.fuzz import generate_case, run_case
from tests.oracle_harness import duckdb_con

N_CASES = int(os.environ.get("FUZZ_SEEDS", "500"))
START = int(os.environ.get("FUZZ_START", "1"))
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb_con(SF)
    yield con
    con.close()


def test_fuzz_differential(spark, duck):
    failures = []
    for seed in range(START, START + N_CASES):
        case = generate_case(seed)
        err = run_case(case, spark, duck, SF)
        if err is not None:
            failures.append((seed, case.shape, err, case.duck_sql))
    assert not failures, (
        f"{len(failures)}/{N_CASES} cases diverged; first: seed={failures[0][0]} "
        f"shape={failures[0][1]}\n{failures[0][2]}\nSQL: {failures[0][3]}"
    )


def test_generator_is_deterministic():
    """Same seed → same SQL and same shape (resume/replay contract)."""
    for seed in (1, 7, 123, 4999):
        a, b = generate_case(seed), generate_case(seed)
        assert a.duck_sql == b.duck_sql and a.shape == b.shape


def test_generator_covers_all_shapes():
    """The first 300 seeds must exercise every final shape (incl. phase
    2's setop), at least one join of each type, a multi-join chain, a
    null-masked case, and every phase-3 feature (self-join, 3-hop chain,
    decimal arithmetic, guarded ROUND bridge, numeric HAVING) — guards
    against a refactor silently collapsing the grammar."""
    shapes = set()
    joins = set()
    chained = masked = False
    selfj = chain3 = dec = round_bridge = hv_num = 0
    for seed in range(1, 301):
        c = generate_case(seed)
        shapes.add(c.shape.split("->")[-1])
        if "+" in c.shape:
            tags = [t for t in c.shape.split("->")[0].split("+")[1:] if ":" in t]
            joins.update(t.split(":")[0] for t in tags)
        if c.shape.count("+") >= 2:
            chained = True
        if "~null" in c.shape:
            masked = True
        if "+self" in c.shape:
            selfj += 1
        if c.shape.count("+") >= 3:
            chain3 += 1
        if "DECIMAL(12,2)" in c.duck_sql:
            dec += 1
        if "FLOOR(" in c.duck_sql and "ROUND(" in c.duck_sql:
            round_bridge += 1
        tail = c.duck_sql.split("fz_h WHERE ")[-1] if "fz_h WHERE" in c.duck_sql else ""
        if tail and "VARCHAR" not in tail and ">" in tail:
            hv_num += 1
    assert shapes == {"project", "aggregate", "window", "setop"}
    assert {"inner", "left_semi", "left_anti"} <= joins
    assert chained, "no two-join chain in 300 seeds"
    assert masked, "no null-masked case in 300 seeds"
    assert selfj >= 5, f"only {selfj} self-join cases in 300 seeds"
    assert chain3 >= 3, f"only {chain3} three-hop chains in 300 seeds"
    assert dec >= 10, f"only {dec} decimal-arithmetic cases in 300 seeds"
    assert round_bridge >= 5, f"only {round_bridge} guarded-ROUND cases"
    assert hv_num >= 5, f"only {hv_num} numeric-HAVING cases"
