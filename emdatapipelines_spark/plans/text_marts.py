"""Shingle-dedup-family materialized models (the text sibling of
`plans/graph_marts.py`).

The hashed 3-gram shingle frame ``(id, h)`` is the shared root of the
near-dup family: ``dd_jaccard_pairs``, ``dd_minhash_lsh``, and
``dd_minhash_estimate`` each re-derive it (normalize → shingle →
explode → xxhash64 — the scan-cost term at 100 TB) when run standalone,
because their oracle contract requires self-contained plans. In a
production pipeline the frame materializes ONCE as an async-refresh MV —
the reference's MV surface (`macros/create_starrocks_materialized_view.sql:2-16`,
5-minute refresh cron `definitions.py:84-94`) expressed as registry
models on `plans/registry.py` (S12) — and the family serves from the
cache. Measured saving at sf0.1 in SCALING.md (round 10).

Usage::

    reg = ModelRegistry()
    register_text_marts(reg, sf_dir)
    reg.build(spark, now=tick)        # doc_shingles materializes once
    reg.results["text_lsh_candidates"]  # ≡ dd_minhash_lsh, from the cache
    reg.run_due(spark, later_tick)    # refresh cron re-derives stale MVs
"""

from __future__ import annotations

from datetime import timedelta

from ..llmdata.dedup import (
    hashed_shingles,
    jaccard_pairs_from_hashes,
    minhash_lsh_candidates,
    minhash_signatures_from_hashes,
)
from ..queries.registry import t
from .registry import ModelRegistry

#: same knobs as the standalone dd_* queries (their docstrings carry the
#: scale justification: 16×4 banding targets J≈0.5+, t=0.05 is the exact
#: long-tail baseline the banded family is calibrated against)
SHINGLE_N = 3
NUM_HASHES = 64
BANDS, ROWS_PER_BAND = 16, 4
JACCARD_THRESHOLD = 0.05


def register_text_marts(
    registry: ModelRegistry,
    sf_dir: str,
    refresh_interval: timedelta = timedelta(minutes=5),
) -> None:
    """Register ``doc_shingles`` (materialized, refresh-scheduled) and the
    downstream near-dup models that serve the dd_* family from it."""

    @registry.model(
        "doc_shingles", materialization="table", refresh_interval=refresh_interval
    )
    def doc_shingles(spark, deps):
        d = t(spark, sf_dir, "documents")
        return hashed_shingles(d, "doc_id", "text", n=SHINGLE_N)

    @registry.model(
        "text_minhash_signatures", deps=["doc_shingles"], materialization="table"
    )
    def text_minhash_signatures(spark, deps):
        return minhash_signatures_from_hashes(
            deps["doc_shingles"], num_hashes=NUM_HASHES
        )

    @registry.model("text_lsh_candidates", deps=["text_minhash_signatures"])
    def text_lsh_candidates(spark, deps):
        """Same rows as the standalone ``dd_minhash_lsh``."""
        return minhash_lsh_candidates(
            deps["text_minhash_signatures"], bands=BANDS, rows_per_band=ROWS_PER_BAND
        ).orderBy("id_a", "id_b")

    @registry.model("text_jaccard_pairs", deps=["doc_shingles"])
    def text_jaccard_pairs(spark, deps):
        """Same rows as the standalone ``dd_jaccard_pairs``. ``persist=False``:
        the dep is already a cached `table` model — a second cache of the
        same rows buys nothing."""
        return jaccard_pairs_from_hashes(
            deps["doc_shingles"], threshold=JACCARD_THRESHOLD, persist=False
        )
