"""Containment accuracy-vs-cost ladder (VERDICT r11 #6): the PPJoin rung
must be EXACT (identical pair set to the naive full self-join), and the
banded-LSH rung's recall bound must hold — every true containment pair
whose underlying Jaccard sits at/past the 16×4 S-curve knee (j ≥ 0.8,
P(candidate) ≈ 0.9998, deterministic here since the hash family is
fixed) is recalled. The sf1 cost table lives in SCALING.md /
CONTAINMENT_LADDER.json (scripts/containment_ladder.py).
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ladder(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    from scripts.containment_ladder import run_ladder

    return run_ladder(spark, SF)


def test_ppjoin_rung_is_exact(ladder):
    pp = ladder["rungs"]["ppjoin_exact"]
    assert pp["identical_to_naive"], "PPJoin prefix/positional filter lost pairs"
    assert pp["recall"] == 1.0
    # and the filter actually prunes: strictly fewer candidates than naive
    assert pp["candidates"] < ladder["rungs"]["naive_exact"]["candidates"]


def test_banded_rung_recall_bound(ladder):
    lsh = ladder["rungs"]["banded_lsh_16x4"]
    # the pinned bound: no true pair at/past the S-curve knee is missed
    assert lsh["recall_jaccard_ge_0.8"] == 1.0
    # candidate volume is the rung's point — far below the exact rungs
    assert lsh["candidates"] < ladder["rungs"]["ppjoin_exact"]["candidates"]
    # verification is exact, so any emitted pair above threshold on the
    # true shingle sets is correct: no false positives
    assert lsh["false_positive_pairs"] == 0
