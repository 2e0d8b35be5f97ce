"""LLM training-data pipeline operators (beyond-reference extensions).

The operations a 100 TB training-data pipeline needs, built the same
operator-library shape as the parity layer: deduplication (exact, n-gram
Jaccard, MinHash+LSH, SimHash), similarity search over embedding columns
(brute-force cosine baseline + LSH-bucketed scale path), text analysis
(language ID, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing.

Scale posture: everything is expressed as explode → aggregate → equi-join
pipelines (shuffle on content keys, never pairwise-all), with frequency caps
to bound skew from ultra-common shingles/buckets.
"""

from .dedup import (  # noqa: F401
    exact_dedup_groups,
    exact_dedup,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_candidates,
    simhash,
)
from .sampling import hash_stratified_sample, hash_sample_sql_predicate  # noqa: F401
from .similarity import brute_force_cosine_topk, cosine_topk_pandas, lsh_cosine_topk  # noqa: F401
from .text import (  # noqa: F401
    token_count,
    text_quality,
    language_id,
    fingerprint,
)
