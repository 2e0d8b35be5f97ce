"""In-row invariants for the rows-only driver queries (VERDICT r10 #5):
the 12 queries with no DuckDB twin now carry self-proving columns the
driver row itself exposes — these tests pin the bounds those columns
must satisfy, turning "rows came back" into "rows came back AND the
measured quality/consistency number is in range".
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def test_minhash_lsh_estimator_vs_exact(spark, queries):
    """Every LSH candidate pair carries the 64-position MinHash agreement
    count and the exact hashed-shingle Jaccard: exact duplicates must
    agree on ALL positions, and the mean estimator error must sit inside
    the binomial envelope (se = sqrt(p(1-p)/64) <= 1/16; mean |err| over
    pairs stays within 3x that)."""
    rows = queries["dd_minhash_lsh"](spark, SF).collect()
    assert rows, "no candidate pairs at sf0.01"
    errs = []
    for r in rows:
        assert 0 <= r["mh_matches"] <= 64
        assert 0 <= r["exact_jaccard_ppm"] <= 1_000_000
        if r["exact_jaccard_ppm"] == 1_000_000:
            assert r["mh_matches"] == 64, f"exact dup disagreed: {r}"
        errs.append(abs(r["mh_matches"] / 64 - r["exact_jaccard_ppm"] / 1e6))
    assert sum(errs) / len(errs) <= 3 / 16, f"mean estimator error {sum(errs)/len(errs)}"


def test_simhash_group_consistency(spark, queries):
    """SimHash is a pure function of the normalized distinct-token set:
    every row's token-set group must contain exactly one distinct
    fingerprint, and at least one multi-doc group must exist at sf0.01
    (else the invariant is vacuous)."""
    rows = queries["dd_simhash"](spark, SF).collect()
    assert rows
    assert all(r["n_group_fps"] == 1 for r in rows)
    assert any(r["n_group_docs"] > 1 for r in rows), "invariant vacuous: no dup groups"


def test_forest_train_accuracy_floor(spark, queries):
    """The forest's full-data accuracy rides on every prediction row.
    The fixture is 10-class (chance = 10%) with partially learnable
    labels — the 20-tree/depth-5 model measures 68.6% at sf0.01; the
    floor pins "far above chance" with margin for split jitter."""
    rows = queries["ml_forest_predictions"](spark, SF).collect()
    assert rows
    accs = {r["train_accuracy_ppm"] for r in rows}
    assert len(accs) == 1
    acc = accs.pop()
    assert acc >= 400_000, f"train accuracy {acc/1e6} below floor (chance=0.1)"


def test_media_stub_kernel_consistency(spark, queries):
    """The Arrow stub kernel's first feature must equal the JVM-side
    splitmix64 recomputation on every decoded row — a bit-level
    cross-check of the whole mapInPandas path (batching, Arrow transfer,
    numpy uint64 lanes)."""
    rows = queries["mm_media_features"](spark, SF).collect()
    assert rows
    ok = [r for r in rows if r["decode_status"] == "ok"]
    assert ok, "no decoded rows"
    bad = [r for r in rows if not r["f0_consistent"]]
    assert not bad, f"{len(bad)} inconsistent rows; first: {bad[0]}"
    for r in ok:
        assert r["f0"] == r["f0_expected"]
