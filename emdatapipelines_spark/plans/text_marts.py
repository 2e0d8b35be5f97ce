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
        d = t(spark, sf_dir, "documents", restore=True)
        return hashed_shingles(d, "doc_id", "text", n=SHINGLE_N)

    @registry.model(
        "text_minhash_signatures", deps=["doc_shingles"], materialization="table"
    )
    def text_minhash_signatures(spark, deps):
        return minhash_signatures_from_hashes(
            deps["doc_shingles"], num_hashes=NUM_HASHES
        )

    @registry.model("text_lsh_candidates", deps=["doc_shingles"])
    def text_lsh_candidates(spark, deps):
        """Same rows as the standalone ``dd_minhash_lsh`` (r11: including
        its self-proving mh_matches / exact_jaccard_ppm invariant columns,
        so the mart serves the same enriched shape)."""
        from ..queries.extensions import _lsh_candidates_with_invariants

        return _lsh_candidates_with_invariants(deps["doc_shingles"])

    @registry.model(
        "text_jaccard_pairs", deps=["doc_shingles"], materialization="table"
    )
    def text_jaccard_pairs(spark, deps):
        """Same rows as the standalone ``dd_jaccard_pairs``, served as a
        PRE-VERIFIED PAIRS MART (r13 VERDICT #3): the shingle self-join
        emits SUM C(df,2) candidate rows, measured quadratic in corpus
        scale (1.27M -> 40.3M -> 107M candidates at sf0.1/0.5/1, exponent
        ~1.93 — JACCARD_GROWTH.json), because replica-shared marker-free
        shingles put every same-source replica pair at J~0.23 >= 0.05. As
        a lazy view each consumer READ re-paid that join (8.11s of the
        8.93s sf1 serve total); as a `table` model the join runs once at
        build and reads are linear in result rows (~4.5us/row: 1.10s for
        263k pairs at sf1). repartition(1): the pairs result is
        result-frame-sized — one cached partition keeps the read a single
        task; the upstream join keeps full shuffle parallelism (coalesce
        would collapse the join's reduce stage too). ``persist=False``:
        the dep is already a cached `table` model."""
        return jaccard_pairs_from_hashes(
            deps["doc_shingles"], threshold=JACCARD_THRESHOLD, persist=False
        ).repartition(1)

    # -- r11 (r10 VERDICT #3): remaining dd_* consumers ---------------------

    @registry.model(
        "doc_shingles_n5", materialization="table", refresh_interval=refresh_interval
    )
    def doc_shingles_n5(spark, deps):
        """The RAW 5-gram shingle frame ``(doc_id, shingle)`` — second
        shared root: the estimate/profile family needs raw strings (df-cap
        on the string, 16-seed md5 fan-out), unlike the xxhash64-collapsed
        ``doc_shingles``."""
        from pyspark.sql import functions as F

        from ..llmdata.dedup import _shingles

        d = t(spark, sf_dir, "documents", restore=True)
        return d.select("doc_id", F.explode(_shingles("text", 5)).alias("shingle"))

    @registry.model("text_minhash_estimate", deps=["doc_shingles_n5"])
    def text_minhash_estimate(spark, deps):
        """Same rows as the standalone ``dd_minhash_estimate``."""
        from ..queries.extensions import _minhash_estimate_from_shingles

        return _minhash_estimate_from_shingles(deps["doc_shingles_n5"], persist=False)

    @registry.model("text_shingle_profile", deps=["doc_shingles_n5"])
    def text_shingle_profile(spark, deps):
        """Same rows as the standalone ``dd_shingle_profile``."""
        from ..queries.extensions import _shingle_profile_from_shingles

        return _shingle_profile_from_shingles(deps["doc_shingles_n5"])

    @registry.model("text_incremental_probe", deps=["text_minhash_signatures"])
    def text_incremental_probe(spark, deps):
        """Same rows as the standalone ``dd_incremental_index``: the
        persisted signature table IS the index — per-doc signatures are
        independent, so the corpus index is a FILTER of the full-corpus
        signature model, no re-hash."""
        from pyspark.sql import functions as F

        from ..queries.extensions import (
            _incremental_probe_from_index,
            _incremental_split,
        )

        d = t(spark, sf_dir, "documents", restore=True)
        _, batch = _incremental_split(d)
        index = deps["text_minhash_signatures"].filter(F.col("id") % 4 != 0)
        return _incremental_probe_from_index(batch, index)


#: mart model → standalone query it must byte-match (test + bench surface)
TEXT_MART_TWINS = {
    "text_lsh_candidates": "dd_minhash_lsh",
    "text_jaccard_pairs": "dd_jaccard_pairs",
    "text_minhash_estimate": "dd_minhash_estimate",
    "text_shingle_profile": "dd_shingle_profile",
    "text_incremental_probe": "dd_incremental_index",
}
