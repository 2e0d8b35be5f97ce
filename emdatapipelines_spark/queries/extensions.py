"""LLM-data, ML, and streaming-shaped queries (beyond-reference extensions).

Oracle-checked where the semantics are SQL-expressible; MinHash/SimHash/LSH
and MLlib training are registered without oracles (driver records the weaker
rows-only check; tests/ cover their semantics instead).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..llmdata.dedup import (
    decontaminate,
    duplicated_ngram_spans,
    exact_dedup,
    incremental_minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    minhash_signatures_from_hashes,
    ngram_jaccard_pairs,
    simhash,
)
from ..llmdata.similarity import (
    brute_force_cosine_topk,
    embedding_neardup_pairs,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from ..llmdata.sampling import (
    hash_shuffle_order,
    hash_stratified_sample,
    stratified_topk_sample,
)
from ..llmdata.text import (
    add_language_id,
    bigram_repetition,
    bpe_ish_token_count,
    chunk_tokens,
    fingerprint,
    nb_token_quality,
    text_quality,
    token_count,
)
from ..ml.features import daily_event_features
from ..streaming.windows import tumbling_window_counts
from .registry import query, t

_NORM_SQL = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
_TOKS_SQL = f"string_split({_NORM_SQL}, ' ')"


# ---------------------------------------------------------------------------
# dedup: exact (hash-groupBy)
# ---------------------------------------------------------------------------
@query(
    "dd_exact_dedup",
    f"""
    SELECT COUNT(*) AS total_docs,
           COUNT(DISTINCT md5({_NORM_SQL})) AS distinct_texts,
           COUNT(*) - COUNT(DISTINCT md5({_NORM_SQL})) AS exact_dup_rows
    FROM documents
    """,
)
def dd_exact_dedup(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    total = d.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.countDistinct(F.md5(norm)).alias("distinct_texts"),
    )
    return total.select(
        "total_docs",
        "distinct_texts",
        (F.col("total_docs") - F.col("distinct_texts")).alias("exact_dup_rows"),
    )


# ---------------------------------------------------------------------------
# dedup: n-gram Jaccard near-dup pairs (trigram shingles, explode+join)
# ---------------------------------------------------------------------------
@query(
    "dd_jaccard_pairs",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    sh AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, greatest(len(tk) - 1, 2)),
                       i -> array_to_string(tk[i:i+2], ' ')))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT c.id_a, c.id_b,
           ROUND(c.common * 1.0 / (sa.set_size + sb.set_size - c.common), 6) AS jaccard
    FROM common c
    JOIN sizes sa ON c.id_a = sa.doc_id
    JOIN sizes sb ON c.id_b = sb.doc_id
    WHERE c.common * 1.0 / (sa.set_size + sb.set_size - c.common) >= 0.05
    """,
)
def dd_jaccard_pairs(spark, sf_dir):
    d = t(spark, sf_dir, "documents", restore=True)
    return ngram_jaccard_pairs(d, n=3, threshold=0.05)


# ---------------------------------------------------------------------------
# dedup: cluster assignment — connected components over near-dup pairs
# (5-gram shingles: same near-dup pairs as 3-gram at threshold 0.5 but a far
#  smaller shingle self-join — multiplicity per shingle drops with n)
# (iterative min-label propagation; oracle = DuckDB recursive CTE reachability
# over the same edge set). Near-dup similarity is not transitive, so
# keep-one-per-group must run on components, not raw pairs.
# ---------------------------------------------------------------------------
_JACCARD_EDGES_SQL = f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    sh AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, greatest(len(tk) - 3, 2)),
                       i -> array_to_string(tk[i:i+4], ' ')))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT c.id_a, c.id_b
    FROM common c
    JOIN sizes sa ON c.id_a = sa.doc_id
    JOIN sizes sb ON c.id_b = sb.doc_id
    WHERE c.common * 1.0 / (sa.set_size + sb.set_size - c.common) >= 0.5
"""


@query(
    "dd_cluster_assign",
    f"""
    WITH RECURSIVE pairs AS ({_JACCARD_EDGES_SQL}),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT DISTINCT a AS id, a AS r FROM edges
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a)
    SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    """,
)
def dd_cluster_assign(spark, sf_dir):
    from ..llmdata.dedup import connected_components

    d = t(spark, sf_dir, "documents", restore=True)
    pairs = ngram_jaccard_pairs(d, n=5, threshold=0.5)
    return connected_components(pairs)


@query(
    "dd_dedup_survivors",
    f"""
    WITH RECURSIVE pairs AS ({_JACCARD_EDGES_SQL}),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT DISTINCT a AS id, a AS r FROM edges
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
    clusters AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS surviving_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS surviving_chars
    FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
    WHERE c.cluster_id IS NULL OR d.doc_id = c.cluster_id
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def dd_dedup_survivors(spark, sf_dir):
    """The COMPLETE near-dup removal pipeline, end to end: shingle pairs →
    connected components → keep the canonical (smallest-id) doc per cluster →
    per-source surviving corpus. This is the query a training-data curator
    actually runs; the upstream stages (`dd_jaccard_pairs`,
    `dd_cluster_assign`) are its driver-verified intermediates.

    Scale shape: the cluster map covers only documents that appear in some
    near-dup pair (typically a small fraction of the corpus), so the final
    left join shuffles the corpus once on doc_id and AQE broadcasts the
    cluster side when it is small; the keep-predicate is a pushed filter,
    not a second pass.
    """
    from ..llmdata.dedup import connected_components

    d = t(spark, sf_dir, "documents", restore=True)
    pairs = ngram_jaccard_pairs(d, n=5, threshold=0.5)
    clusters = connected_components(pairs)
    survivors = d.join(clusters, "doc_id", "left").filter(
        F.col("cluster_id").isNull() | (F.col("doc_id") == F.col("cluster_id"))
    )
    return (
        survivors.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("surviving_docs"),
            F.sum("n_chars").cast("bigint").alias("surviving_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# dedup: MinHash + LSH candidates (deterministic xxhash64 — no SQL oracle)
# ---------------------------------------------------------------------------
@query("dd_minhash_lsh")
def dd_minhash_lsh(spark, sf_dir):
    """Self-proving rows (r10 VERDICT #5): each candidate pair carries
    ``mh_matches`` (agreeing signature positions, 0..64 — the MinHash
    Jaccard estimator ×64) AND ``exact_jaccard_ppm`` computed from the
    hashed shingle sets of the CANDIDATE pairs only (output-bounded, not
    corpus-bounded), so the driver's rows-only record shows
    estimator-vs-exact consistency in-row. tests/test_rows_only_invariants.py
    asserts the bound: exact duplicates (jaccard=1) agree on all 64
    positions, and the mean |mh/64 − exact| stays within the √(1/64)
    binomial envelope."""
    from ..cachectl import tracked_persist
    from ..llmdata.dedup import hashed_shingles

    d = t(spark, sf_dir, "documents", restore=True)
    # r11 ADVICE: the helper consumes the shingle frame twice (signature
    # build + collect_set exact-Jaccard) — the standalone path persists it
    # so the normalize+shingle explode runs once; the mart path already
    # serves it from a cached dep. Tracked: harness releases post-collect.
    sh = tracked_persist(hashed_shingles(d, "doc_id", "text", n=3))
    return _lsh_candidates_with_invariants(sh)


def _lsh_candidates_with_invariants(sh):
    """Enriched LSH candidates from a hashed-shingle frame — shared by the
    standalone ``dd_minhash_lsh`` and the `plans/text_marts.py`
    ``text_lsh_candidates`` model (byte-equality pinned per consumer).

    The signature frame feeds THREE consumers (LSH banding + both sides of
    the estimator join); it is doc-count × 64-int small, so an eager
    tracked checkpoint materializes it once instead of re-aggregating the
    shingle frame per consumer (r11 ADVICE)."""
    from ..cachectl import tracked_local_checkpoint

    sigs = tracked_local_checkpoint(
        minhash_signatures_from_hashes(sh, num_hashes=64)
    )
    cands = minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
    sa = sigs.select(F.col("id").alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("id_b"), F.col("signature").alias("sig_b"))
    est = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            ).cast("int").alias("mh_matches"),
        )
    )
    sets = sh.groupBy(F.col("id")).agg(F.collect_set("h").alias("hs"))
    xa = sets.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"))
    xb = sets.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
    return (
        est.join(xa, "id_a")
        .join(xb, "id_b")
        .select(
            "id_a",
            "id_b",
            "mh_matches",
            F.expr(
                "CAST((SIZE(ARRAY_INTERSECT(hs_a, hs_b)) * CAST(1000000 AS BIGINT))"
                " div (SIZE(hs_a) + SIZE(hs_b) - SIZE(ARRAY_INTERSECT(hs_a, hs_b)))"
                " AS BIGINT)"
            ).alias("exact_jaccard_ppm"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# dedup: exact-substring duplicate spans (Lee et al. 2022 k-gram-anchor form)
# ---------------------------------------------------------------------------
@query(
    "dd_dup_spans",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    g AS (SELECT doc_id, u - 1 AS pos, array_to_string(tk[u:u+4], ' ') AS gram
          FROM toks, UNNEST(range(1, len(tk) - 5 + 2)) AS t(u)
          WHERE len(tk) >= 5),
    dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
    anch AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
    isl AS (SELECT doc_id, pos,
                   pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM anch)
    SELECT doc_id AS id, CAST(MIN(pos) AS INT) AS span_start,
           CAST(MAX(pos) + 4 AS INT) AS span_end,
           CAST(MAX(pos) + 4 - MIN(pos) + 1 AS INT) AS span_tokens
    FROM isl GROUP BY doc_id, grp
    """,
)
def dd_dup_spans(spark, sf_dir):
    """Maximal cross-document duplicated token spans at n=5
    (`llmdata/dedup.py: duplicated_ngram_spans`) — the exact-substring
    dedup signal (Lee et al. 2022) as k-gram anchors + run-merge. The
    oracle replays the anchor/island construction on the gram STRINGS;
    the engine shuffles 8-byte xxhash64 gram keys instead (constant
    shuffle width in n), numerically identical absent 64-bit collisions."""
    d = t(spark, sf_dir, "documents", restore=True)
    out = duplicated_ngram_spans(d, n=5, min_docs=2)
    return out.select(
        "id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
        F.col("span_tokens").cast("int").alias("span_tokens"),
    ).orderBy("id", "span_start")


# ---------------------------------------------------------------------------
# dedup: incremental snapshot dedup against a persisted MinHash index.
# The oracle is an end-to-end PLANTED-COPY invariant: corpus = doc_id%4!=0,
# batch = doc_id%4==0 PLUS byte-identical copies of corpus docs with
# doc_id%10==1 re-id'd at +10^12 (clear of the key-shifted replica id
# space — at sf1 real doc_ids reach 9*10^8, and a 10^6 offset let real
# batch docs leak into the planted-slice filter; caught by the sf1
# oracle audit). An exact copy of an indexed doc shares
# every LSH band bucket and agrees on every MinHash position, so the engine
# MUST flag each planted id with est_jaccard exactly 1.0 — SQL-predictable
# even though the hash path itself isn't SQL-expressible.
# ---------------------------------------------------------------------------
@query(
    "dd_incremental_index",
    f"""
    SELECT CAST(doc_id + 1000000000000 AS BIGINT) AS id,
           CAST(1.0 AS DOUBLE) AS max_est_jaccard
    FROM documents
    WHERE len({_TOKS_SQL}) >= 3 AND doc_id % 4 != 0 AND doc_id % 10 = 1
    ORDER BY id
    """,
)
def dd_incremental_index(spark, sf_dir):
    """Snapshot-over-snapshot dedup (`llmdata/dedup.py:
    incremental_minhash_dedup`): the corpus signature table is the persisted
    index; the new batch is flagged against it without touching corpus text.
    Output is the planted-copy slice (id ≥ 10^12) with max est_jaccard per
    id — deterministically 1.0 for every planted copy."""
    d = t(spark, sf_dir, "documents", restore=True)
    corpus, batch = _incremental_split(d)
    index = minhash_signatures(corpus, n=3, num_hashes=64)
    return _incremental_probe_from_index(batch, index)


def _incremental_split(d):
    """(corpus, batch) split of the documents table for the incremental-
    index probe: corpus = eligible docs off the %4 slice; batch = the %4
    slice + planted copies of %10==1 corpus docs (id-shifted by 10^12) —
    shared by the standalone query and `plans/text_marts.py`."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    eligible = d.filter(F.col("text").isNotNull()).filter(
        F.size(F.split(norm, " ")) >= 3
    )
    corpus = eligible.filter(F.col("doc_id") % 4 != 0)
    planted = corpus.filter(F.col("doc_id") % 10 == 1).select(
        (F.col("doc_id") + 1000000000000).cast("bigint").alias("doc_id"), "text"
    )
    batch = (
        eligible.filter(F.col("doc_id") % 4 == 0)
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "text")
        .unionByName(planted)
    )
    return corpus, batch


def _incremental_probe_from_index(batch, index):
    """Flag the batch against a PERSISTED signature index (the mart path
    passes the filtered ``text_minhash_signatures`` model — per-doc
    signatures are independent, so signatures(corpus) ≡
    signatures(all).filter(corpus ids), pinned by test_text_marts.py)."""
    step = incremental_minhash_dedup(
        batch, index, n=3, num_hashes=64, bands=16, rows_per_band=4, threshold=0.8
    )
    return (
        step["flagged"]
        .filter(F.col("id") >= 1000000000000)
        .groupBy(F.col("id").cast("bigint").alias("id"))
        .agg(F.max("est_jaccard").alias("max_est_jaccard"))
        .orderBy("id")
    )


# ---------------------------------------------------------------------------
# text: Naive Bayes quality classifier — trained AND applied in one query
# (fastText-style corpus filtering: heuristic seed label -> token log-odds
# -> score every doc). Seed label here: long documents (>= 40 tokens).
# ---------------------------------------------------------------------------
@query(
    "tx_nb_quality",
    f"""
    WITH lab AS (
      SELECT doc_id, {_TOKS_SQL} AS tk,
             CASE WHEN len({_TOKS_SQL}) >= 40 THEN 1 ELSE 0 END AS y
      FROM documents WHERE text IS NOT NULL),
    tok AS (SELECT doc_id, y, UNNEST(tk) AS w FROM lab),
    cnt AS (SELECT w, SUM(y) AS c1, SUM(1 - y) AS c0 FROM tok GROUP BY w),
    tot AS (SELECT CAST(SUM(c1) AS DOUBLE) AS n1, CAST(SUM(c0) AS DOUBLE) AS n0,
                   CAST(COUNT(*) AS DOUBLE) AS v FROM cnt),
    doc AS (SELECT CAST(SUM(y) AS DOUBLE) AS d1, CAST(SUM(1 - y) AS DOUBLE) AS d0 FROM lab),
    lo AS (SELECT w, ROUND(LN((c1 + 1.0) / (n1 + v)) - LN((c0 + 1.0) / (n0 + v)), 8) AS lo
           FROM cnt CROSS JOIN tot),
    pri AS (SELECT ROUND(LN((d1 + 1.0) / (d0 + 1.0)), 8) AS prior FROM doc),
    scored AS (SELECT tok.doc_id, lo FROM tok JOIN lo USING (w))
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(lo AS DECIMAL(28,8))) + CAST(prior AS DECIMAL(28,8))
                AS DOUBLE) AS nb_score
    FROM scored CROSS JOIN pri GROUP BY doc_id, prior
    """,
)
def tx_nb_quality(spark, sf_dir):
    """One-pass Naive Bayes corpus filter (`llmdata/text.py:
    nb_token_quality`): the model's sufficient statistics are additive token
    counts, so training is a single map-side-combined groupBy; the fitted
    vocabulary broadcasts back and scoring never shuffles the corpus."""
    d = t(spark, sf_dir, "documents", restore=True)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return nb_token_quality(d, label=F.size(F.split(norm, " ")) >= 40)


# ---------------------------------------------------------------------------
# dedup: SimHash fingerprints (no SQL oracle)
# ---------------------------------------------------------------------------
@query("dd_simhash")
def dd_simhash(spark, sf_dir):
    """Self-proving rows (r10 VERDICT #5): each fingerprint row carries
    its normalized-TOKEN-SET group (two docs with the same distinct-token
    set MUST hash to the same fingerprint — SimHash is a pure function of
    that set) and the count of distinct fingerprints in its group, so the
    driver's rows-only record exposes the determinism invariant in-row:
    ``n_group_fps`` must be 1 on every row
    (tests/test_rows_only_invariants.py)."""
    from pyspark.sql import Window

    from ..llmdata.dedup import _norm_text

    d = t(spark, sf_dir, "documents", restore=True)
    fp = simhash(d)
    keys = d.select(
        F.col("doc_id").alias("id"),
        F.md5(
            F.concat_ws(
                "",
                F.array_sort(
                    F.array_remove(
                        F.array_distinct(F.split(_norm_text("text"), " ")), ""
                    )
                ),
            )
        ).alias("token_set_key"),
    )
    w = Window.partitionBy("token_set_key")
    return (
        fp.join(keys, "id")
        .select(
            "id",
            "simhash",
            F.count(F.lit(1)).over(w).cast("int").alias("n_group_docs"),
            F.size(F.collect_set("simhash").over(w)).cast("int").alias("n_group_fps"),
        )
        .orderBy("id")
    )


# ---------------------------------------------------------------------------
# similarity: exact brute-force cosine top-k (expression path)
# ---------------------------------------------------------------------------
@query(
    "sim_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 8),
    c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
    s AS (SELECT query_id, neighbor_id,
                 ROUND(list_dot_product(qv, cv) /
                       (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
          FROM q, c WHERE query_id != neighbor_id),
    r AS (SELECT query_id, neighbor_id, cosine,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
          FROM s)
    SELECT query_id, neighbor_id, cosine, rank FROM r WHERE rank <= 5
    """,
)
def sim_cosine_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings", restore=True)
    return brute_force_cosine_topk(e.filter(F.col("vec_id") < 8), e, k=5)


# ---------------------------------------------------------------------------
# similarity: LSH-bucketed approximate top-k (scale path — no SQL oracle)
# ---------------------------------------------------------------------------
@query("sim_lsh_topk")
def sim_lsh_topk(spark, sf_dir):
    """Self-validating: each row carries ``recall_at_k`` vs the exact
    brute-force top-k for its query (`similarity.with_recall_vs_exact`), so
    the driver's rows-only check records a measured quality number; the
    floor is asserted in tests/test_scale_operators.py."""
    from ..llmdata.similarity import with_recall_vs_exact

    e = t(spark, sf_dir, "embeddings", restore=True)
    q = e.filter(F.col("vec_id") < 8)
    approx = lsh_cosine_topk(q, e, k=5, dim=64, n_planes=6, multiprobe=1)
    return with_recall_vs_exact(approx, q, e, k=5).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# dedup: embedding-cosine near-duplicate pairs (blocked numpy matmul).
# Threshold 0.4 is tuned to the synthetic fixture (random embeddings top out
# at cosine ≈ 0.51); real corpora use ~0.95 — it's a parameter.
# ---------------------------------------------------------------------------
@query(
    "dd_embedding_neardup",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
    """,
)
def dd_embedding_neardup(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(e, threshold=0.4)


# ---------------------------------------------------------------------------
# dedup: SemDeDup-style centroid-pruned semantic dedup (Abbas et al. 2023).
# Assign every vector to its nearest pinned centroid (the deterministic
# <=20-vector probe family: vec_id % 100 == 7, vec_id < 2000 — fixed K at
# any sf, so assignment is a broadcast-K map pass), then mark a vector dup
# iff an earlier same-cluster vector has cosine >= 0.4 (fixture-tuned like
# dd_embedding_neardup; real corpora use ~0.95). Candidate pairs ride the
# lossless grid prefilter — the cluster constraint prunes the near-dup
# stream, it never generates per-cluster all-pairs work. The min-id
# survivor rule is the cross-snapshot incremental contract: with
# monotonically increasing ids per snapshot, re-running over old ∪ new
# flags exactly the new vectors colliding with the retained corpus.
# ---------------------------------------------------------------------------
@query(
    "dd_semdedup",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
          WHERE vec_id % 100 = 7 AND vec_id < 2000),
    scored AS (
      SELECT n.vec_id, c.cid,
             ROUND(list_dot_product(n.v, c.cv) / (n.nrm * c.cn), 6) AS cos_c
      FROM n CROSS JOIN c),
    assign AS (
      SELECT vec_id, cid AS cluster_id, cos_c FROM (
        SELECT vec_id, cid, cos_c,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cid) AS rn
        FROM scored) WHERE rn = 1),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4),
    same AS (
      SELECT p.id_b AS vec_id, MIN(p.id_a) AS dup_of
      FROM pairs p
      JOIN assign x ON p.id_a = x.vec_id
      JOIN assign y ON p.id_b = y.vec_id AND x.cluster_id = y.cluster_id
      GROUP BY p.id_b)
    SELECT a.vec_id, a.cluster_id, a.cos_c,
           s.dup_of IS NOT NULL AS is_dup, s.dup_of
    FROM assign a LEFT JOIN same s ON a.vec_id = s.vec_id
    ORDER BY a.vec_id
    """,
)
def dd_semdedup(spark, sf_dir):
    from ..llmdata.similarity import semdedup

    e = t(spark, sf_dir, "embeddings")
    cent = e.filter((F.col("vec_id") % 100 == 7) & (F.col("vec_id") < 2000)).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    return semdedup(e, cent, threshold=0.4).orderBy("vec_id")


# ---------------------------------------------------------------------------
# similarity: IVF-bucketed approximate top-k (scale path — no SQL oracle)
# ---------------------------------------------------------------------------
@query("sim_ivf_topk")
def sim_ivf_topk(spark, sf_dir):
    """Self-validating ``recall_at_k`` column; see sim_lsh_topk."""
    from ..llmdata.similarity import with_recall_vs_exact

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    approx = ivf_cosine_topk(q, e, k=5, nlist=8, nprobe=2)
    return with_recall_vs_exact(approx, q, e, k=5).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# similarity: product quantization + exact re-rank (bytes-bounded scale path
# — no SQL oracle; recall vs brute force asserted in tests)
# ---------------------------------------------------------------------------
@query("sim_pq_topk")
def sim_pq_topk(spark, sf_dir):
    """PQ ADC shortlist over the 32x-compressed code index, exact cosine
    re-rank on the shortlist (`llmdata/similarity.py: pq_cosine_topk`) —
    the memory-bounded ANN path complementing IVF (candidate-bounded) and
    LSH (bucket-bounded). Measured recall@10 = 1.0 vs brute force on the
    fixture at m=32/k=64/oversample=4; every row also carries a
    self-validating ``recall_at_k`` column (see sim_lsh_topk)."""
    from ..llmdata.similarity import pq_cosine_topk, with_recall_vs_exact

    e = t(spark, sf_dir, "embeddings", restore=True)
    # FIXED query sample (20 vectors at any sf): the ANN measurement
    # protocol bounds the query side — sampling it proportionally to the
    # corpus would make query×corpus work scale quadratically with sf
    # (measured 13.2x at a 10x scale-up before pinning)
    q = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    approx = pq_cosine_topk(q, e, k=5, m=32, n_centroids=64, oversample=4)
    return with_recall_vs_exact(approx, q, e, k=5).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# multimodal: binary payload plumbing — metadata, byte-budget partitioning,
# Arrow-batched decode/featurize stage (decode kernel stubbed — no SQL oracle)
# ---------------------------------------------------------------------------
@query("mm_media_features")
def mm_media_features(spark, sf_dir):
    from ..llmdata.multimodal import decode_and_featurize, partition_by_bytes

    d = t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "video/mp4")
        .otherwise("audio/wav")
        .alias("mime_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    # byte_size only — content hashing (attach_media_metadata) isn't needed
    # on this path and would md5 every payload for nothing
    media = media.withColumn("byte_size", F.length("payload").cast("long"))
    media = partition_by_bytes(media, "byte_size", target_partition_bytes=1 * 1024 * 1024)
    feats = decode_and_featurize(media, feature_dim=8, kernel="stub")  # oracle-pinned
    # self-proving rows (r10 VERDICT #5): f0_expected recomputes the stub
    # kernel's first feature JVM-side from the payload bytes
    # (multimodal.stub_f0_expr) — an independent cross-check of the whole
    # Arrow kernel path, exposed in-row; f0_consistent must be true on
    # every ok row (tests/test_rows_only_invariants.py)
    from ..llmdata.multimodal import with_stub_f0

    expected = with_stub_f0(media.select("media_id", "payload")).select(
        "media_id", F.round("f0_expected", 6).alias("f0_expected")
    )
    return (
        feats.join(expected, "media_id")
        .select(
            "media_id",
            "mime_type",
            "decode_status",
            F.size("feature").alias("feature_dim"),
            F.round(F.element_at("feature", 1), 6).alias("f0"),
            "f0_expected",
            (
                (F.col("decode_status") != "ok")
                | (F.round(F.element_at("feature", 1), 6) == F.col("f0_expected"))
            ).alias("f0_consistent"),
        )
        .orderBy("media_id")
    )


# ---------------------------------------------------------------------------
# multimodal: resize stage (stub kernel, real mapInPandas plumbing). The
# stub's output contract is deterministic — images resize to the target byte
# budget, non-images pass through — so the distributed Python stage itself is
# value-hash-checked against a plain SQL oracle.
# ---------------------------------------------------------------------------
@query(
    "mm_resize",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'video/mp4'
                ELSE 'audio/wav' END AS mime_type,
           CASE WHEN doc_id % 3 = 0 THEN 'ok' ELSE 'skipped_not_image' END AS resize_status,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 6272
                     ELSE octet_length(encode(text)) END AS BIGINT) AS out_bytes,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 224 END AS INT) AS width,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 224 END AS INT) AS height
    FROM documents
    """,
)
def mm_resize(spark, sf_dir):
    from ..llmdata.multimodal import partition_by_bytes, resize_images

    d = t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "video/mp4")
        .otherwise("audio/wav")
        .alias("mime_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    media = media.withColumn("byte_size", F.length("payload").cast("long"))
    media = partition_by_bytes(media, "byte_size", target_partition_bytes=1 * 1024 * 1024)
    resized = resize_images(media, target_width=224, target_height=224, kernel="stub")  # oracle-pinned
    return resized.select(
        "media_id",
        "mime_type",
        "resize_status",
        F.length("payload").cast("bigint").alias("out_bytes"),
        "width",
        "height",
    )


# ---------------------------------------------------------------------------
# multimodal: frame-sampling plan from metadata only (no decode)
# ---------------------------------------------------------------------------
@query(
    "mm_frame_plan",
    """
    WITH media AS (
      SELECT doc_id AS media_id, n_chars * 10 AS duration_ms
      FROM documents WHERE doc_id % 3 = 1)
    SELECT media_id, UNNEST(range(0, greatest(duration_ms - 1, 0) + 1, 1000)) AS sample_ts_ms
    FROM media
    """,
)
def mm_frame_plan(spark, sf_dir):
    from ..llmdata.multimodal import frame_sample_plan

    d = t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 1, "video/mp4").otherwise("image/png").alias("mime_type"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )
    return frame_sample_plan(media, every_ms=1000)


# ---------------------------------------------------------------------------
# text: token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------
@query(
    "tx_token_counts",
    f"""
    SELECT doc_id,
           CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
                ELSE len({_TOKS_SQL}) END AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+)')) AS INT) AS bpe_ish_tokens,
           n_chars
    FROM documents
    """,
)
def tx_token_counts(spark, sf_dir):
    d = t(spark, sf_dir, "documents", restore=True)
    return d.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_ish_tokens"),
        "n_chars",
    )


# ---------------------------------------------------------------------------
# text: quality scoring (Gopher-style signals)
# ---------------------------------------------------------------------------
@query(
    "tx_quality",
    f"""
    WITH base AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             CASE WHEN length({_NORM_SQL}) = 0 THEN 0 ELSE len({_TOKS_SQL}) END AS n_tokens,
             len(list_filter({_TOKS_SQL},
                 x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS stop_hits,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct_chars
      FROM documents)
    SELECT doc_id, CAST(n_chars AS INT) AS n_chars, CAST(n_tokens AS INT) AS n_tokens,
           ROUND(length({_NORM_SQL}) * 1.0 / greatest(n_tokens, 1), 6) AS mean_token_len,
           ROUND(stop_hits * 1.0 / greatest(n_tokens, 1), 6) AS stopword_ratio,
           ROUND(punct_chars * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
           ROUND(
             (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN length({_NORM_SQL}) * 1.0 / greatest(n_tokens, 1) BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN stop_hits * 1.0 / greatest(n_tokens, 1) >= 0.05 THEN 0.2 ELSE 0.0 END)
           + (CASE WHEN punct_chars * 1.0 / greatest(n_chars, 1) <= 0.2 THEN 0.1 ELSE 0.0 END), 2) AS quality_score
    FROM base
    """,
)
def tx_quality(spark, sf_dir):
    d = t(spark, sf_dir, "documents", restore=True)
    q = text_quality("text")
    return d.select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["mean_token_len"].alias("mean_token_len"),
        q["stopword_ratio"].alias("stopword_ratio"),
        q["punct_ratio"].alias("punct_ratio"),
        q["quality_score"].alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# text: Gopher/C4-style repetition signals — duplicate-bigram fraction and
# top-bigram share per document (boilerplate / keyword-stuffing / degenerate-
# generation filters)
# ---------------------------------------------------------------------------
@query(
    "tx_repetition",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    bg AS (
      SELECT doc_id, UNNEST(list_transform(range(1, len(tk)),
                                           i -> array_to_string(tk[i:i+1], ' '))) AS bigram
      FROM toks WHERE len(tk) >= 2),
    per_bigram AS (
      SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) AS BIGINT) AS distinct_bigrams,
           ROUND(1 - COUNT(*) * 1.0 / SUM(c), 6) AS dup_bigram_frac,
           ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top_bigram_frac
    FROM per_bigram GROUP BY doc_id
    """,
)
def tx_repetition(spark, sf_dir):
    return bigram_repetition(t(spark, sf_dir, "documents", restore=True))


# ---------------------------------------------------------------------------
# text: stopword-hit language ID heuristic
# ---------------------------------------------------------------------------
_LANG_SETS = {
    "en": "['the','a','of','and','to','in','is','that','it','for']",
    "de": "['der','die','das','und','ist','ein','eine','zu','mit','von']",
    "fr": "['le','la','les','et','est','une','un','des','du','que']",
    "es": "['el','la','los','las','y','es','un','una','de','que']",
    "zh": "['的','是','了','在','我','有','和','就','不','人']",
}
_HITS = {
    lang: f"len(list_filter({_TOKS_SQL}, x -> list_contains({s}, x)))" for lang, s in _LANG_SETS.items()
}


@query(
    "tx_language_id",
    f"""
    WITH s AS (
      SELECT doc_id, lang,
             {_HITS['en']} AS h_en, {_HITS['de']} AS h_de, {_HITS['fr']} AS h_fr,
             {_HITS['es']} AS h_es, {_HITS['zh']} AS h_zh
      FROM documents)
    SELECT doc_id, lang,
           CASE WHEN greatest(h_en, h_de, h_fr, h_es, h_zh) <= 0 THEN 'unknown'
                WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_zh THEN 'en'
                WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'
                WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'
                WHEN h_es >= h_zh THEN 'es'
                ELSE 'zh' END AS lang_pred
    FROM s
    """,
)
def tx_language_id(spark, sf_dir):
    d = t(spark, sf_dir, "documents", restore=True)
    return add_language_id(d, "text", out="lang_pred").select("doc_id", "lang", "lang_pred")


# ---------------------------------------------------------------------------
# text: overlapping token-window chunking (chunk 64, overlap 16, stride 48)
# ---------------------------------------------------------------------------
@query(
    "tx_chunking",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS tk, len({_TOKS_SQL}) AS n FROM documents),
    c AS (
      SELECT doc_id, tk,
             UNNEST(range(0, CAST(greatest(ceil((n - 16) / 48.0), 1) AS INT))) AS i
      FROM toks)
    SELECT doc_id, CAST(i AS INT) AS chunk_index,
           array_to_string(tk[i*48+1 : i*48+64], ' ') AS chunk_text,
           CAST(len(tk[i*48+1 : i*48+64]) AS INT) AS chunk_tokens
    FROM c
    """,
)
def tx_chunking(spark, sf_dir):
    d = t(spark, sf_dir, "documents", restore=True)
    chunks = d.select(
        "doc_id", F.explode(chunk_tokens("text", chunk_size=64, overlap=16)).alias("ch")
    )
    return chunks.select(
        "doc_id",
        F.col("ch.chunk_index").alias("chunk_index"),
        F.col("ch.chunk_text").alias("chunk_text"),
        F.size(F.split(F.col("ch.chunk_text"), " ")).alias("chunk_tokens"),
    )


# ---------------------------------------------------------------------------
# training-mix sampling: deterministic per-stratum fractions (seeded sampleBy;
# engine-specific RNG — no cross-engine oracle, tolerance-tested instead)
# ---------------------------------------------------------------------------
_MIX_FRACTIONS = {"en": 0.8, "de": 0.5, "fr": 0.5, "es": 0.5, "zh": 0.25}


@query(
    "llm_training_mix",
    """
    WITH th AS (
      SELECT * FROM (VALUES ('en', 'cccd'), ('de', '8000'), ('fr', '8000'),
                            ('es', '8000'), ('zh', '4000')) AS v(lang, threshold))
    SELECT d.lang, COUNT(*) AS sampled_docs,
           CAST(SUM(d.n_chars) AS BIGINT) AS sampled_chars
    FROM documents d
    JOIN th ON d.lang = th.lang
    WHERE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < th.threshold
    GROUP BY d.lang
    """,
)
def llm_training_mix(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    sampled = hash_stratified_sample(
        d, strata_col="lang", fractions=_MIX_FRACTIONS, key_col="doc_id"
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("sampled_docs"),
        F.sum("n_chars").cast("bigint").alias("sampled_chars"),
    )


# ---------------------------------------------------------------------------
# sampling: exact-count per-stratum draw (eval-set / few-shot-pool builder).
# Hash-order rank ≤ k — deterministic, engine-portable, and the rank filter
# compiles to WindowGroupLimit so map tasks pre-prune to local top-k.
# ---------------------------------------------------------------------------
@query(
    "llm_stratified_k",
    """
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('emdp' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
    SELECT doc_id, lang FROM r WHERE rk <= 5 ORDER BY lang, doc_id
    """,
)
def llm_stratified_k(spark, sf_dir):
    """Exactly 5 docs per language (`llmdata/sampling.py:
    stratified_topk_sample`) — the deterministic hash-order draw whose
    count per stratum is guaranteed, unlike fraction sampling."""
    d = t(spark, sf_dir, "documents")
    out = stratified_topk_sample(d, strata_col="lang", k=5, key_col="doc_id")
    return out.select("doc_id", "lang").orderBy("lang", "doc_id")


# ---------------------------------------------------------------------------
# text: TF-IDF keyword extraction — tokens explode → tf per (doc, token) →
# df per token → idf = ln(N/df) → top-3 keywords per doc. All native ops
# (explode/groupBy/join/window); the token df table is the only shuffle whose
# size grows with vocabulary, not corpus.
# ---------------------------------------------------------------------------
@query(
    "tx_tfidf_keywords",
    f"""
    WITH tok AS (
      SELECT doc_id, UNNEST({_TOKS_SQL}) AS token FROM documents),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS doc_freq FROM tok GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * ln(n.n_docs * 1.0 / df.doc_freq), 4) AS tfidf
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
    ranked AS (
      SELECT doc_id, token, tfidf,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INT) AS rank
      FROM scored)
    SELECT doc_id, token, tfidf, rank FROM ranked WHERE rank <= 3
    """,
)
def tx_tfidf_keywords(spark, sf_dir):
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents", restore=True)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    tok = d.select("doc_id", F.explode(F.split(norm, " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("doc_freq"))
    n_docs = d.count()
    scored = tf.join(F.broadcast(df_tbl), "token").select(
        "doc_id",
        "token",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("doc_freq")), 4).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tfidf", "rank")
    )


# ---------------------------------------------------------------------------
# text: corpus-trained unigram LM surprisal (perplexity-style quality score)
# — vocabulary built in one shuffle, broadcast back for a shuffle-free
# scoring pass; both filter tails (templated low-surprisal, noisy
# high-surprisal) are standard pre-training culls.
# ---------------------------------------------------------------------------
@query(
    "lm_unigram_surprisal",
    f"""
    WITH tok AS (SELECT doc_id, UNNEST({_TOKS_SQL}) AS w FROM documents),
    freq AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    tot AS (SELECT SUM(c) * 1.0 + COUNT(*) * 1.0 AS nv FROM freq),
    scored AS (
      SELECT tok.doc_id, ROUND(-LN((freq.c + 1.0) / tot.nv), 8) AS s
      FROM tok JOIN freq ON tok.w = freq.w CROSS JOIN tot)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(CAST(s AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*) * 1000000.0) / 1000000.0
             AS mean_surprisal
    FROM scored GROUP BY doc_id
    """,
)
def lm_unigram_surprisal(spark, sf_dir):
    from ..llmdata.text import unigram_surprisal

    return unigram_surprisal(t(spark, sf_dir, "documents", restore=True))


# ---------------------------------------------------------------------------
# LM: bigram transition surprisal — the next step from lm_unigram_surprisal
# toward CCNet's LM-perplexity quality filter (Wenzek LREC'20): add-one
# smoothed p(w2|w1), per-doc mean −ln p reported (perplexity = exp of it).
# Bigram pairs are built IN-ROW (array transform), never a positional
# self-join; the fold-safe DECIMAL-sum / micro-domain-mean convention makes
# the hash agg engine-exact.
# ---------------------------------------------------------------------------
@query(
    "lm_bigram_nll",
    f"""
    WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    pairs AS (
      SELECT doc_id,
             UNNEST(list_transform(range(2, len(tk) + 1),
                                   i -> struct_pack(w1 := tk[i-1], w2 := tk[i]))) AS bg
      FROM tk),
    p AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM pairs),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM p GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
    vocab AS (SELECT COUNT(DISTINCT w) * 1.0 AS v
              FROM (SELECT UNNEST(tk) AS w FROM tk)),
    scored AS (
      SELECT p.doc_id, ROUND(-LN((c2.c2 + 1.0) / (c1.c1 + vocab.v)), 8) AS s
      FROM p JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(s AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*) * 1000000.0) / 1000000.0
             AS avg_bigram_nll
    FROM scored GROUP BY doc_id
    """,
)
def lm_bigram_nll(spark, sf_dir):
    from ..llmdata.text import bigram_nll

    return bigram_nll(t(spark, sf_dir, "documents", restore=True))


# ---------------------------------------------------------------------------
# text: order-insensitive document fingerprint
# ---------------------------------------------------------------------------
@query(
    "tx_fingerprint",
    f"""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct({_TOKS_SQL})), ' ')) AS doc_fingerprint
    FROM documents
    """,
)
def tx_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents", restore=True)
    return d.select("doc_id", fingerprint("text").alias("doc_fingerprint"))


# ---------------------------------------------------------------------------
# ML: daily feature engineering (W3/W4/W5 composite over events)
# ---------------------------------------------------------------------------
@query(
    "ml_daily_features",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS event_date, COUNT(*) AS event_count,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)/COUNT(*) * 1000000.0) / 1000000.0 AS mean_value,
             MAX(value) AS max_value
      FROM events GROUP BY 1, 2)
    SELECT event_type, event_date, event_count, mean_value, max_value,
           CAST(YEAR(event_date) AS INT) AS year, CAST(MONTH(event_date) AS INT) AS month,
           CAST(quarter(event_date) AS INT) AS quarter, CAST(dayofyear(event_date) AS INT) AS day_of_year,
           COUNT(*) OVER (PARTITION BY event_type ORDER BY epoch(CAST(event_date AS TIMESTAMP))
                          RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) - 1 AS rolling_7d_days,
           AVG(event_count) OVER (PARTITION BY event_type ORDER BY event_date
                                  ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) AS trailing_mean_count,
           LEAD(event_count, 1) OVER (PARTITION BY event_type ORDER BY event_date) AS next_day_count
    FROM daily
    """,
)
def ml_daily_features(spark, sf_dir):
    return daily_event_features(t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# ML: full-batch logistic regression by unrolled gradient descent — the
# gradient-based learner next to forest/kmeans, and unlike them ORACLE-
# CHECKED end to end: each GD step is one map-side-combined aggregation of
# round-8 gradient contributions (DECIMAL-exact), the 1-row gradient pulls
# to the driver (the kmeans bounded-collect pattern), and the oracle
# replays the identical five steps as chained CTEs. Sigmoid inputs/outputs
# round to 8 dp (clamped off 0/1) so the one libm call (exp) cannot leak
# last-ulp cross-engine noise into the weights.
# ---------------------------------------------------------------------------
def _LOGREG_ORACLE(lr: float = 0.5, steps: int = 5) -> str:
    def p(w: str) -> str:
        z = f"ROUND({w}.b + {w}.w1 * f.x1 + {w}.w2 * f.x2, 8)"
        return (
            f"LEAST(GREATEST(ROUND(1.0 / (1.0 + EXP(-({z}))), 8), "
            f"0.00000001), 0.99999999)"
        )

    head = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)/COUNT(*) * 1000000.0) / 1000000.0 AS mv
      FROM events GROUP BY 1, 2),
    feat AS (
      SELECT ROUND(LN(1.0 + cnt), 8) AS x1, ROUND(mv / 100.0, 8) AS x2,
             CASE WHEN LEAD(cnt) OVER (PARTITION BY event_type ORDER BY d) > cnt
                  THEN 1.0 ELSE 0.0 END AS y,
             LEAD(cnt) OVER (PARTITION BY event_type ORDER BY d) AS nxt
      FROM daily),
    f AS (SELECT x1, x2, y FROM feat WHERE nxt IS NOT NULL),
    w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2)"""
    body = []
    for i in range(1, steps + 1):
        pw = p(f"w{i-1}")
        body.append(f""",
    s{i} AS (
      SELECT CAST(SUM(CAST(ROUND({pw} - f.y, 8) AS DECIMAL(28,8))) AS DOUBLE) AS gb,
             CAST(SUM(CAST(ROUND(({pw} - f.y) * f.x1, 8) AS DECIMAL(28,8))) AS DOUBLE) AS g1,
             CAST(SUM(CAST(ROUND(({pw} - f.y) * f.x2, 8) AS DECIMAL(28,8))) AS DOUBLE) AS g2,
             COUNT(*) AS n
      FROM f CROSS JOIN w{i-1}),
    w{i} AS (
      SELECT w{i-1}.b - {lr} * s{i}.gb / s{i}.n AS b,
             w{i-1}.w1 - {lr} * s{i}.g1 / s{i}.n AS w1,
             w{i-1}.w2 - {lr} * s{i}.g2 / s{i}.n AS w2
      FROM w{i-1} CROSS JOIN s{i})""")
    pw = p(f"w{steps}")
    tail = f""",
    loss AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(CAST(ROUND(-(CASE WHEN f.y = 1.0 THEN LN({pw})
                                              ELSE LN(1.0 - {pw}) END), 8)
                             AS DECIMAL(28,8))) AS DOUBLE)
                   / COUNT(*) * 1000000.0) / 1000000.0 AS avg_log_loss
      FROM f CROSS JOIN w{steps})
    SELECT ROUND(w{steps}.b, 6) AS bias, ROUND(w{steps}.w1, 6) AS w_x1,
           ROUND(w{steps}.w2, 6) AS w_x2, loss.n_rows, loss.avg_log_loss
    FROM w{steps} CROSS JOIN loss"""
    return head + "".join(body) + tail


@query("ml_logreg_gd", _LOGREG_ORACLE())
def ml_logreg_gd(spark, sf_dir):
    """Five full-batch GD steps of logistic regression on the daily event
    frame (`ml/logreg.py`): x1 = ln(1+count), x2 = scaled daily mean,
    y = next-day-count-up. Returns the trained weights + final average
    log-loss as one row; every arithmetic step mirrors the oracle's
    chained CTEs exactly (round-8 sigmoid, DECIMAL gradient sums, IEEE
    double weight updates)."""
    from ..ml.logreg import daily_count_features, logreg_gd

    e = t(spark, sf_dir, "events")
    return logreg_gd(daily_count_features(e), lr=0.5, steps=5)


# ---------------------------------------------------------------------------
# ML: risk banding via exact global moments (M3 core)
# ---------------------------------------------------------------------------
@query(
    "ml_risk_bands",
    """
    WITH m AS (
      SELECT CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value * value AS DECIMAL(38,4))) AS DOUBLE) AS ss,
             CAST(COUNT(value) AS DOUBLE) AS n
      FROM events),
    z AS (
      SELECT greatest(least((value - m.s/m.n) / sqrt((m.ss - m.s*m.s/m.n)/(m.n-1)), 3.0), -3.0) AS zc
      FROM events, m),
    scored AS (SELECT greatest(least((zc + 3)/6*10, 10.0), 0.0) AS risk FROM z)
    SELECT CASE WHEN risk < 2 THEN 'VERY_LOW' WHEN risk < 4 THEN 'LOW'
                WHEN risk < 6 THEN 'MODERATE' WHEN risk < 8 THEN 'HIGH'
                ELSE 'VERY_HIGH' END AS risk_category,
           COUNT(*) AS n_events
    FROM scored GROUP BY risk_category
    """,
)
def ml_risk_bands(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    c = F.col("value")
    stats = e.agg(
        F.sum(c.cast("decimal(38,6)")).cast("double").alias("s"),
        F.sum((c * c).cast("decimal(38,4)")).cast("double").alias("ss"),
        F.count(c).cast("double").alias("n"),
    )
    z = (c - F.col("s") / F.col("n")) / F.sqrt(
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    )
    zc = F.greatest(F.least(z, F.lit(3.0)), F.lit(-3.0))
    risk = F.greatest(F.least((zc + 3) / 6 * 10, F.lit(10.0)), F.lit(0.0))
    band = (
        F.when(risk < 2, "VERY_LOW")
        .when(risk < 4, "LOW")
        .when(risk < 6, "MODERATE")
        .when(risk < 8, "HIGH")
        .otherwise("VERY_HIGH")
    )
    return (
        e.crossJoin(F.broadcast(stats))
        .groupBy(band.alias("risk_category"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# ---------------------------------------------------------------------------
# ML: RandomForest on embeddings (MLlib — no SQL oracle)
# ---------------------------------------------------------------------------
@query("ml_forest_predictions")
def ml_forest_predictions(spark, sf_dir):
    from ..ml.forest import train_forest_classifier
    from pyspark.ml.functions import array_to_vector

    e = t(spark, sf_dir, "embeddings")
    # with_metrics=False: this query consumes only the MODEL (it scores the
    # full frame and derives its own accuracy row below); the held-out
    # metrics dict cost four extra jobs per run and was discarded (r14).
    model, _metrics = train_forest_classifier(
        e, num_trees=20, max_depth=5, with_metrics=False
    )
    data = e.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
        F.col("label").cast("double").alias("label"),
    )
    from ..cachectl import tracked_local_checkpoint

    # the frame feeds both the accuracy aggregate and the returned rows —
    # checkpoint so the forest scoring pass executes once per collect, not
    # twice (r11 ADVICE); tracked: harness releases post-collect
    pred = tracked_local_checkpoint(
        model.transform(data).select(
            "vec_id", "label", F.col("prediction").cast("int").alias("predicted_label")
        )
    )
    # self-proving rows (r10 VERDICT #5): every row carries the model's
    # full-data accuracy so the driver's rows-only record exposes the
    # quality bar; tests/test_rows_only_invariants.py pins the floor
    acc = pred.agg(
        F.expr(
            "CAST(SUM(CASE WHEN CAST(label AS INT) = predicted_label THEN 1"
            " ELSE 0 END) * CAST(1000000 AS BIGINT) div COUNT(*) AS BIGINT)"
        ).alias("train_accuracy_ppm")
    )
    return pred.crossJoin(F.broadcast(acc)).orderBy("vec_id")


# ---------------------------------------------------------------------------
# time-series similarity: pairwise correlation between event-type hourly
# series (≈ distributed time-series similarity search — series bucketed to a
# common grid, equi-join on the bucket, corr aggregate; at scale the same
# shape with an LSH/PAA prefilter on the series sketches)
# ---------------------------------------------------------------------------
@query(
    "ts_corr_pairs",
    """
    WITH hourly AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1, 2)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           ROUND(corr(a.n, b.n), 4) AS hourly_corr,
           COUNT(*) AS common_hours
    FROM hourly a JOIN hourly b ON a.h = b.h AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    """,
)
def ts_corr_pairs(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.window("ts", "1 hour").getField("start").alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    a = hourly.select(
        F.col("event_type").alias("type_a"), F.col("h").alias("ha"), F.col("n").alias("na")
    )
    b = hourly.select(
        F.col("event_type").alias("type_b"), F.col("h").alias("hb"), F.col("n").alias("nb")
    )
    joined = a.join(b, (F.col("ha") == F.col("hb")) & (F.col("type_a") < F.col("type_b")))
    return joined.groupBy("type_a", "type_b").agg(
        F.round(F.corr("na", "nb"), 4).alias("hourly_corr"),
        F.count(F.lit(1)).alias("common_hours"),
    )


# ---------------------------------------------------------------------------
# T2 — tumbling 1h window counts (batch twin of the streaming aggregate)
# ---------------------------------------------------------------------------
@query(
    "st_tumbling_1h",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type, COUNT(*) AS event_count
    FROM events GROUP BY 1, 2, 3
    """,
)
def st_tumbling_1h(spark, sf_dir):
    return tumbling_window_counts(
        t(spark, sf_dir, "events"), "ts", "1 hour", ["event_type"], watermark=None
    )


# ---------------------------------------------------------------------------
# LLM pipeline composite: the full cleaning chain — quality filter → language
# filter → exact dedup (keep min doc_id) → per-language corpus stats. One
# declarative plan; Catalyst fuses the filters into the scan.
# ---------------------------------------------------------------------------
@query(
    "llm_clean_corpus",
    f"""
    WITH scored AS (
      SELECT doc_id, lang, text,
             CASE WHEN length({_NORM_SQL}) = 0 THEN 0 ELSE len({_TOKS_SQL}) END AS n_tokens,
             md5({_NORM_SQL}) AS content_hash
      FROM documents
      WHERE n_chars >= 50),
    kept AS (SELECT * FROM scored WHERE n_tokens BETWEEN 10 AND 100000),
    dedup AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
      FROM kept)
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT content_hash) AS distinct_texts
    FROM dedup WHERE rn = 1 GROUP BY lang
    """,
)
def llm_clean_corpus(spark, sf_dir):
    from ..llmdata.dedup import exact_dedup

    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") >= 50)
    toked = d.withColumn("n_tokens", token_count("text")).filter(
        F.col("n_tokens").between(10, 100000)
    )
    deduped = exact_dedup(toked, id_col="doc_id", text_col="text")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return deduped.withColumn("content_hash", F.md5(norm)).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.countDistinct("content_hash").alias("distinct_texts"),
    )


# ---------------------------------------------------------------------------
# A5 scale variant: approx_count_distinct (HLL) — engine-specific sketch, no
# cross-engine oracle; accuracy asserted in tests/test_scale_operators.py
# ---------------------------------------------------------------------------
@query("a12_approx_distinct")
def a12_approx_distinct(spark, sf_dir):
    """Self-validating: each row carries the exact distincts and the
    measured estimator error in ppm, so the driver's rows-only check
    records the quality bar, not just cardinality (VERDICT r7 #5; same
    protocol as the ANN queries' recall_at_k). Plan note: TWO exact
    countDistinct columns in one agg force a 5-way Expand (every row
    replicated per distinct column — measured 4.8s at sf0.1); decomposed
    into the sketch agg (no expand) plus two projected distinct→count
    aggs joined back on the 3-row group key, it is expand-free and the
    map-side partial distinct collapses each shuffle to near-unique keys."""
    l = t(spark, sf_dir, "lineitem")

    # r14 reshape (guide §2.4): the former shape ran THREE full lineitem
    # chains — the sketch agg plus one distinct→count per key column —
    # each paying its own scan + ingest exchange. One explode to
    # (l_returnflag, tag, key) rows feeds a single map-side-partial
    # distinct; both the exact counts AND the HLL sketches aggregate over
    # that distinct frame. approx_count_distinct is multiplicity-
    # insensitive (HLL registers depend only on the value SET), so the
    # estimates are bit-identical to sketching the raw multiset; the key
    # type (bigint) is unchanged through the struct, so the hashed values
    # are identical too. n_rows needs the un-deduped cardinality — a
    # second, single-column scan chain (was: part of the 3-chain shape).
    keyed = (
        l.select(
            "l_returnflag",
            F.explode(
                F.array(
                    F.struct(F.lit(1).alias("tag"), F.col("l_suppkey").alias("key")),
                    F.struct(F.lit(2).alias("tag"), F.col("l_partkey").alias("key")),
                )
            ).alias("tk"),
        )
        .select("l_returnflag", "tk.tag", "tk.key")
        .distinct()
    )
    per = keyed.groupBy("l_returnflag", "tag").agg(
        F.count(F.lit(1)).alias("exact"),
        F.approx_count_distinct("key", rsd=0.01).alias("approx"),
    )
    wide = per.groupBy("l_returnflag").agg(
        F.max(F.when(F.col("tag") == 1, F.col("approx"))).alias("approx_suppliers"),
        F.max(F.when(F.col("tag") == 2, F.col("approx"))).alias("approx_parts"),
        F.max(F.when(F.col("tag") == 1, F.col("exact"))).alias("exact_suppliers"),
        F.max(F.when(F.col("tag") == 2, F.col("exact"))).alias("exact_parts"),
    )
    out = wide.join(
        l.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n_rows")),
        "l_returnflag",
    )
    err = lambda a, e: F.round(  # noqa: E731
        F.abs(F.col(a) - F.col(e)) * 1000000.0 / F.col(e)
    ).cast("bigint")
    return out.select(
        "l_returnflag",
        "approx_suppliers",
        "approx_parts",
        "exact_suppliers",
        "exact_parts",
        "n_rows",
        err("approx_suppliers", "exact_suppliers").alias("supp_err_ppm"),
        err("approx_parts", "exact_parts").alias("part_err_ppm"),
    )


# ---------------------------------------------------------------------------
# LLM pipeline composite: filtered + deduped corpus stats by (source, lang)
# ---------------------------------------------------------------------------
@query(
    "llm_corpus_stats",
    f"""
    WITH kept AS (
      SELECT doc_id, source, lang, text,
             CASE WHEN length({_NORM_SQL}) = 0 THEN 0 ELSE len({_TOKS_SQL}) END AS n_tokens
      FROM documents
      WHERE n_chars >= 50)
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(SUM(n_tokens) * 1.0 / COUNT(*), 6) AS avg_tokens
    FROM kept GROUP BY source, lang
    """,
)
def llm_corpus_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("n_chars") >= 50)
    withtok = d.withColumn("n_tokens", token_count("text"))
    return withtok.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.sum("n_tokens") * 1.0 / F.count(F.lit(1)), 6).alias("avg_tokens"),
    )


# ---------------------------------------------------------------------------
# dedup/decontamination: n-gram overlap against a benchmark set — training
# docs sharing >= 3 distinct 5-token shingles with any eval doc (doc_id % 53
# == 0 plays the benchmark). Eval shingles broadcast; one shuffle total.
# ---------------------------------------------------------------------------
@query(
    "dd_decontaminate",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    sh0 AS (
      SELECT doc_id, UNNEST(list_transform(range(1, len(tk)-3),
                                           i -> array_to_string(tk[i:i+4], ' '))) AS shingle
      FROM toks WHERE len(tk) >= 5),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 53 = 0)
    SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
    FROM sh s JOIN ev USING (shingle)
    WHERE s.doc_id % 53 <> 0
    GROUP BY s.doc_id
    HAVING COUNT(*) >= 3
    """,
)
def dd_decontaminate(spark, sf_dir):
    docs = t(spark, sf_dir, "documents", restore=True)
    return decontaminate(
        docs.filter(F.col("doc_id") % 53 != 0),
        docs.filter(F.col("doc_id") % 53 == 0),
        n=5,
        min_shared=3,
    )


# ---------------------------------------------------------------------------
# training export: deterministic global corpus shuffle — every doc ranked by
# md5(seed || doc_id). Reproducible across runs, engines, and partition
# layouts (a seeded RNG shuffle is none of these); new seed = new epoch.
# ---------------------------------------------------------------------------
@query(
    "llm_shuffle_order",
    """
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (ORDER BY md5('emdp' || CAST(doc_id AS VARCHAR)), doc_id)
                AS BIGINT) AS shuffle_rank
    FROM documents
    """,
)
def llm_shuffle_order(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    return hash_shuffle_order(d, "doc_id", seed="emdp")


# ---------------------------------------------------------------------------
# dedup: SEMANTIC clusters — connected components over embedding-cosine
# near-dup pairs (block-pair exact kernel -> iterative min-label CC). The
# composed semantic-dedup step: cluster, then keep-one-per-cluster.
# Oracle = DuckDB recursive-CTE reachability over the same exact pair set.
# ---------------------------------------------------------------------------
@query(
    "dd_embedding_clusters",
    """
    WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v) /
            (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT DISTINCT a AS id, a AS r FROM edges
      UNION
      SELECT reach.id, e2.b FROM reach JOIN edges e2 ON reach.r = e2.a)
    SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id
    """,
)
def dd_embedding_clusters(spark, sf_dir):
    from ..llmdata.dedup import connected_components

    e = t(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(e, threshold=0.35)
    return connected_components(pairs)


# ---------------------------------------------------------------------------
# LLM training export: sequence-packing plan — deterministic doc->pack
# layout by cumulative token budget (streaming-concat packing).
# ---------------------------------------------------------------------------
@query(
    "llm_pack_plan",
    f"""
    WITH toked AS (
      SELECT doc_id,
             CASE WHEN length({_NORM_SQL}) = 0 THEN 0 ELSE len({_TOKS_SQL}) END AS n_tokens
      FROM documents)
    SELECT doc_id, n_tokens,
           CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2048) AS BIGINT)
             AS pack_id
    FROM toked
    """,
)
def llm_pack_plan(spark, sf_dir):
    from ..llmdata.sampling import pack_sequences_plan

    d = t(spark, sf_dir, "documents", restore=True)
    toked = d.select("doc_id", token_count("text").alias("n_tokens"))
    return pack_sequences_plan(toked, "n_tokens", budget=2048, order_col="doc_id")


# ---------------------------------------------------------------------------
# W6 — gap-based sessionization (operators/sessions.py): per-user sessions
# closed by >4h inactivity, rolled up to start/end/count/value. One shuffle:
# the lag/run-sum windows and the (user_id, session_seq) aggregate all reuse
# the user_id hash partitioning.
# ---------------------------------------------------------------------------
@query(
    "w6_sessionize",
    """
    WITH seq AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 4 HOUR THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT *,
             CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_seq
      FROM seq)
    SELECT user_id, session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS session_value
    FROM sess GROUP BY user_id, session_seq
    """,
)
def w6_sessionize(spark, sf_dir):
    from ..operators.sessions import session_stats

    return session_stats(
        t(spark, sf_dir, "events"),
        "user_id",
        "ts",
        gap="4 hours",
        value_col="value",
        order_tiebreak=["event_id"],
    )


# ---------------------------------------------------------------------------
# T2-extension — session windows (streaming session_window_counts run in
# batch mode; the streaming/batch equivalence itself is proven in
# tests/test_sessions.py). Spark convention: an event exactly at
# prev_ts + gap opens a NEW session, and the emitted end is last_ts + gap —
# the oracle replicates both.
# ---------------------------------------------------------------------------
@query(
    "st_session_window",
    """
    WITH seq AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 4 HOUR THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sess AS (
      SELECT *,
             CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      FROM seq)
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 4 HOUR AS session_end,
           user_id,
           COUNT(*) AS event_count
    FROM sess GROUP BY user_id, sid
    """,
)
def st_session_window(spark, sf_dir):
    from ..streaming.windows import session_window_counts

    return session_window_counts(
        t(spark, sf_dir, "events"), "ts", "4 hours", ["user_id"], watermark=None
    )


# ---------------------------------------------------------------------------
# J10 — time-bounded (interval) join, batch twin of the stream-stream join
# (streaming/joins.py): each purchase matched to the clicks by the same user
# in the preceding 2 hours. Equi key (user_id) + range predicate: plans as a
# keyed SortMergeJoin with the interval as a post-condition — never a
# nested loop; streaming state stays bounded by watermark + interval.
# ---------------------------------------------------------------------------
@query(
    "j10_click_to_purchase",
    """
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           c.event_id AS click_id,
           c.ts AS click_ts,
           p.value AS purchase_value
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND c.ts > p.ts - INTERVAL 2 HOUR
     AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def j10_click_to_purchase(spark, sf_dir):
    from ..streaming.joins import interval_join

    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    return interval_join(
        purchases, clicks, "user_id", "purchase_ts", "click_ts", lower="2 hours"
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts", "purchase_value")


@query(
    "tx_vocab_freq",
    f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({_TOKS_SQL}) AS term FROM documents
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS cf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM toks
    GROUP BY term
    ORDER BY cf DESC, term
    LIMIT 50
    """,
)
def tx_vocab_freq(spark, sf_dir):
    """Corpus vocabulary profile: top-50 terms by collection frequency with
    document frequency — the first statistic a tokenizer-training or
    quality-filter pipeline computes over a crawl. Same normalization as
    every other tx_* operator (lower/trim/whitespace-collapse), so the
    numbers compose with the TF-IDF and dedup stages.

    Scale shape: explode + one hash agg with map-side combine; df via a
    two-level agg (distinct (term, doc) then count) so no COUNT DISTINCT
    expand over the exploded fact. Top-50 is a TakeOrdered, not a full sort.
    """
    d = t(spark, sf_dir, "documents", restore=True)
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")).alias(
            "term"
        ),
    )
    per_doc = toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        per_doc.groupBy("term")
        .agg(
            F.sum("tf").cast("bigint").alias("cf"),
            F.count(F.lit(1)).cast("bigint").alias("df"),
        )
        .orderBy(F.desc("cf"), "term")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# text: C4-style line-level cleaning (Raffel et al. 2020 §2.2), previously
# unit-only — driver-verified here. Fixture docs are single-line, so the
# query first re-wraps sentences into lines deterministically ('. ' → '.\n')
# in BOTH engines, then filters lines (≥4 words, terminal punctuation, no
# blocklisted phrase) with higher-order functions — split → filter-lambda →
# array_join stays in one codegen'd scan, no UDF, no explode.
# ---------------------------------------------------------------------------
@query(
    "tx_c4_line_filter",
    """
    WITH wrapped AS (
      SELECT doc_id, regexp_replace(text, '\\. ', '.' || chr(10), 'g') AS text
      FROM documents),
    filtered AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)),
               x -> len(string_split_regex(trim(x), '\\s+')) >= 4
                    AND regexp_matches(x, '[.!?"]\\s*$')
                    AND NOT contains(lower(x), 'javascript')
                    AND NOT contains(lower(x), 'lorem ipsum')
                    AND NOT contains(lower(x), 'cookie policy')
                    AND NOT contains(lower(x), '{')) AS kept
      FROM wrapped)
    SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,
           CAST(len(kept) AS INT) AS kept_lines
    FROM filtered WHERE len(kept) >= 1
    """,
)
def tx_c4_line_filter(spark, sf_dir):
    from ..llmdata.text import apply_c4_line_filter

    d = t(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace("text", r"\. ", ".\n")
    )
    out = apply_c4_line_filter(d, min_words_per_line=4)
    return out.select(
        "doc_id", F.col("text").alias("clean_text"), F.col("kept_lines").cast("int")
    )


# ---------------------------------------------------------------------------
# M4 — rule-based recommendations, data-plane twin of ml/recommend.py
# (reference assets/ml_assets.py:430-571). The driver-side API consumes a
# handful of scalars; this query derives those scalars FROM the data on both
# engines (tail-event rate vs a decimal-exact mean+2sigma threshold, invalid
# -value fraction, pinned-clock month) and emits the fired action rows, so
# the threshold ladder itself is oracle-verified.
# ---------------------------------------------------------------------------
@query(
    "m4_recommendations",
    """
    WITH m AS (SELECT CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS s,
                      CAST(SUM(CAST(value*value AS DECIMAL(38,4))) AS DOUBLE) AS ss,
                      CAST(COUNT(value) AS DOUBLE) AS n FROM events),
    scalars AS (
      SELECT
        (SELECT COUNT(*) FROM events, m
         WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
           AND value > m.s/m.n + 2*sqrt((m.ss - m.s*m.s/m.n)/(m.n-1)))
          * 1.0 / (SELECT COUNT(*) FROM events) AS hi_rate,
        (SELECT SUM(CASE WHEN value <= 0 OR value IS NULL THEN 1 ELSE 0 END) * 1.0
                / COUNT(*) FROM events) AS invalid_frac),
    levels AS (
      SELECT CASE WHEN hi_rate >= 0.02 THEN 'CRITICAL'
                  WHEN hi_rate >= 0.005 THEN 'HIGH' ELSE 'NORMAL' END AS risk_level,
             CASE WHEN invalid_frac > 0.2 THEN 'POOR'
                  WHEN invalid_frac > 0.05 THEN 'FAIR' ELSE 'GOOD' END AS quality_status
      FROM scalars),
    recs AS (
      SELECT 1 AS priority, 'operations' AS category,
             'escalate monitoring cadence: recent risk ' || risk_level AS action
      FROM levels WHERE risk_level IN ('HIGH', 'CRITICAL')
      UNION ALL
      SELECT 2, 'data_quality',
             'investigate ingestion quality (status ' || quality_status || ')'
      FROM levels WHERE quality_status IN ('FAIR', 'POOR')
      UNION ALL
      SELECT 3, 'seasonal', 'enable winter-storm monitoring')
    SELECT CAST(priority AS INT) AS priority, category, action FROM recs
    ORDER BY priority, category
    """,
)
def m4_recommendations(spark, sf_dir):
    """Fired action list (priority 1 = act now). The seasonal row comes from
    the pinned clock (AS_OF 2024-02-01 → month 2 → winter-storm watch,
    `ml/recommend.py:_SEASONAL_WATCH`); risk/quality levels derive from the
    same decimal-exact moment statistics the risk-band query uses."""
    e = t(spark, sf_dir, "events")
    m = e.agg(
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,4)")).cast("double").alias("ss"),
        F.count("value").cast("double").alias("n"),
        F.count(F.lit(1)).alias("n_all"),
        F.sum(
            F.when(F.col("value").isNull() | (F.col("value") <= 0), 1).otherwise(0)
        ).alias("n_invalid"),
    )
    thr = F.col("s") / F.col("n") + 2 * F.sqrt(
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    )
    hi = e.select("ts", "value").crossJoin(F.broadcast(m)).filter(
        (F.col("ts") >= F.lit("2024-01-25 00:00:00").cast("timestamp"))
        & (F.col("value") > thr)
    ).agg(F.count(F.lit(1)).alias("hi_n"))
    scalars = m.crossJoin(F.broadcast(hi)).select(
        (F.col("hi_n") * 1.0 / F.col("n_all")).alias("hi_rate"),
        (F.col("n_invalid") * 1.0 / F.col("n_all")).alias("invalid_frac"),
    )
    risk = (
        F.when(F.col("hi_rate") >= 0.02, "CRITICAL")
        .when(F.col("hi_rate") >= 0.005, "HIGH")
        .otherwise("NORMAL")
    )
    qual = (
        F.when(F.col("invalid_frac") > 0.2, "POOR")
        .when(F.col("invalid_frac") > 0.05, "FAIR")
        .otherwise("GOOD")
    )
    rows = scalars.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("priority"),
                    F.lit("operations").alias("category"),
                    F.concat(F.lit("escalate monitoring cadence: recent risk "), risk).alias(
                        "action"
                    ),
                    risk.isin("HIGH", "CRITICAL").alias("fired"),
                ),
                F.struct(
                    F.lit(2).alias("priority"),
                    F.lit("data_quality").alias("category"),
                    F.concat(
                        F.lit("investigate ingestion quality (status "), qual, F.lit(")")
                    ).alias("action"),
                    qual.isin("FAIR", "POOR").alias("fired"),
                ),
                F.struct(
                    F.lit(3).alias("priority"),
                    F.lit("seasonal").alias("category"),
                    F.lit("enable winter-storm monitoring").alias("action"),
                    F.lit(True).alias("fired"),
                ),
            )
        ).alias("r")
    )
    return (
        rows.filter(F.col("r.fired"))
        .select(F.col("r.priority").cast("int").alias("priority"), "r.category", "r.action")
        .orderBy("priority", "category")
    )


# ---------------------------------------------------------------------------
# llm: cluster-safe train/val split — the split key is the near-dup CLUSTER
# representative, not the doc id, so near-duplicates can never straddle the
# boundary (the standard leakage: a train doc's near-copy in the eval split
# inflates every metric). Same md5-bucket threshold convention as the
# training-mix sampler; same recursive-CTE cluster oracle as dd_cluster_assign.
# ---------------------------------------------------------------------------
@query(
    "llm_cluster_safe_split",
    f"""
    WITH RECURSIVE pairs AS ({_JACCARD_EDGES_SQL}),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT DISTINCT a AS id, a AS r FROM edges
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
    clusters AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    tagged AS (
      SELECT d.doc_id, d.n_chars,
             CASE WHEN substring(md5(CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)),
                                 1, 4) < '1000'
                  THEN 'val' ELSE 'train' END AS split
      FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id)
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM tagged GROUP BY split ORDER BY split
    """,
)
def llm_cluster_safe_split(spark, sf_dir):
    from ..llmdata.dedup import connected_components

    d = t(spark, sf_dir, "documents", restore=True)
    pairs = ngram_jaccard_pairs(d, n=5, threshold=0.5)
    clusters = connected_components(pairs)
    rep = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    tagged = d.join(clusters, "doc_id", "left").withColumn(
        "split",
        F.when(F.substring(F.md5(rep.cast("string")), 1, 4) < "1000", "val").otherwise(
            "train"
        ),
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# text: Gopher document-quality rules (Rae et al. 2021 appendix A1.1) — the
# canonical web-corpus doc filter, distinct from the C4 LINE filter above and
# from tx_quality's composite score. Pure JVM HOFs, zero shuffle; min_words
# is set fixture-practically (10) so both outcomes appear at sf0.01 (the
# published default of 50 stays the library default in llmdata/text.py).
# Lines are synthesized with the same '. ' wrap as tx_c4_line_filter so the
# line-fraction rules have structure to act on.
# ---------------------------------------------------------------------------
@query(
    "tx_gopher_rules",
    """
    WITH wrapped AS (
      SELECT doc_id, regexp_replace(text, '\\. ', '.' || chr(10), 'g') AS text
      FROM documents),
    base AS (
      SELECT doc_id, text,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM wrapped),
    sig AS (
      SELECT doc_id, text,
             CASE WHEN length(norm) = 0 THEN 0
                  ELSE len(string_split(norm, ' ')) END AS n_words,
             string_split(norm, ' ') AS toks,
             length(norm) AS n_norm,
             length(regexp_replace(text, '[^#]', '', 'g'))
               + len(regexp_extract_all(text, '(\\.\\.\\.|…)')) AS symbols,
             list_filter(string_split(text, chr(10)),
                         x -> length(trim(x)) > 0) AS lines
      FROM base),
    ratios AS (
      SELECT doc_id, n_words,
             ROUND((n_norm - greatest(n_words - 1, 0)) * 1.0
                   / greatest(n_words, 1), 6) AS mean_word_len,
             ROUND(symbols * 1.0 / greatest(n_words, 1), 6) AS symbol_ratio,
             ROUND(len(list_filter(lines, x -> regexp_matches(trim(x), '^[-*•]')))
                   * 1.0 / greatest(len(lines), 1), 6) AS bullet_line_frac,
             ROUND(len(list_filter(lines, x -> regexp_matches(trim(x), '(\\.\\.\\.|…)$')))
                   * 1.0 / greatest(len(lines), 1), 6) AS ellipsis_line_frac,
             ROUND(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                   * 1.0 / greatest(n_words, 1), 6) AS alpha_word_frac,
             CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                                  w -> list_contains(toks, w))) AS INT) AS required_hits
      FROM sig)
    SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len, symbol_ratio,
           bullet_line_frac, ellipsis_line_frac, alpha_word_frac, required_hits,
           (n_words BETWEEN 10 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND symbol_ratio <= 0.1
            AND bullet_line_frac <= 0.9
            AND ellipsis_line_frac <= 0.3
            AND alpha_word_frac >= 0.8
            AND required_hits >= 2) AS passes_gopher
    FROM ratios
    """,
)
def tx_gopher_rules(spark, sf_dir):
    from ..llmdata.text import gopher_rules

    d = t(spark, sf_dir, "documents", restore=True).withColumn(
        "text", F.regexp_replace("text", r"\. ", ".\n")
    )
    g = gopher_rules("text", min_words=10)
    return d.select(
        "doc_id",
        *[g[k].alias(k) for k in (
            "n_words", "mean_word_len", "symbol_ratio", "bullet_line_frac",
            "ellipsis_line_frac", "alpha_word_frac", "required_hits",
            "passes_gopher",
        )],
    )


# ---------------------------------------------------------------------------
# dedup: EXACT Jaccard-threshold join via prefix filtering (AllPairs/PPJoin
# family). Same contract as dd_jaccard_pairs but at a realistic near-dup
# threshold (0.8) where the prefix index prunes ~80% of the shingle volume —
# the scale path when the answer must be exact (LSH loses pairs; the full
# shingle self-join needs hot-bucket capping). The oracle is the plain
# all-pairs exact Jaccard: prefix filtering is lossless, so outputs match.
# ---------------------------------------------------------------------------
@query(
    "dd_prefix_jaccard",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    sh AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, greatest(len(tk) - 1, 2)),
                       i -> array_to_string(tk[i:i+2], ' ')))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT c.id_a, c.id_b,
           ROUND(c.common * 1.0 / (sa.set_size + sb.set_size - c.common), 6) AS jaccard
    FROM common c
    JOIN sizes sa ON c.id_a = sa.doc_id
    JOIN sizes sb ON c.id_b = sb.doc_id
    WHERE c.common * 1.0 / (sa.set_size + sb.set_size - c.common) >= 0.8
    """,
)
def dd_prefix_jaccard(spark, sf_dir):
    from ..llmdata.dedup import prefix_jaccard_pairs

    d = t(spark, sf_dir, "documents", restore=True)
    return prefix_jaccard_pairs(d, n=3, threshold=0.8)


# ---------------------------------------------------------------------------
# join: spatial radius join (grid-cell bucketed, exact) — "customers within
# 50 km of each supplier" on deterministic synthetic planar coordinates
# (the fixtures carry no geography; derive_planar_point is pure BIGINT
# arithmetic so both engines compute bit-identical points). The oracle is
# the naive cross-join distance filter — exactness of the grid means the
# outputs match; the Spark side never materializes the cross product.
# ---------------------------------------------------------------------------
@query(
    "j12_radius_join",
    """
    WITH spts AS (
      SELECT s_suppkey,
             ((s_suppkey * 2654435761) % 1000000) / 1000.0 AS x,
             ((s_suppkey * 40503 + 12345) % 1000000) / 1000.0 AS y
      FROM supplier),
    cpts AS (
      SELECT c_custkey,
             ((c_custkey * 2654435761) % 1000000) / 1000.0 AS x,
             ((c_custkey * 40503 + 12345) % 1000000) / 1000.0 AS y
      FROM customer)
    SELECT s.s_suppkey, c.c_custkey,
           ROUND(sqrt((s.x - c.x) * (s.x - c.x) + (s.y - c.y) * (s.y - c.y)), 6) AS dist_km
    FROM spts s, cpts c
    WHERE ROUND(sqrt((s.x - c.x) * (s.x - c.x) + (s.y - c.y) * (s.y - c.y)), 6) <= 50.0
    """,
)
def j12_radius_join(spark, sf_dir):
    from ..operators.spatial import derive_planar_point, radius_join

    sx, sy = derive_planar_point(F.col("s_suppkey"))
    supp = t(spark, sf_dir, "supplier").select(
        "s_suppkey", sx.alias("x"), sy.alias("y")
    )
    cx, cy = derive_planar_point(F.col("c_custkey"))
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey", cx.alias("x"), cy.alias("y")
    )
    out = radius_join(supp, cust, radius=50.0, dist_col="dist_km")
    return out.select(
        F.col("l_s_suppkey").alias("s_suppkey"),
        F.col("r_c_custkey").alias("c_custkey"),
        "dist_km",
    )


# ---------------------------------------------------------------------------
# agg: heavy hitters ("users with >= 0.75% of all events") — Misra-Gries
# sketch prefilter + exact recount of the candidates. The sketch bounds the
# pass-one shuffle to k rows/partition regardless of column cardinality and
# provably admits no false negatives at the threshold (k > 2/s), so the
# final output is EXACT and the oracle is the plain GROUP BY ... HAVING.
# ---------------------------------------------------------------------------
@query(
    "a23_heavy_hitters",
    """
    WITH tot AS (SELECT COUNT(*) AS n FROM events),
    c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
    SELECT c.user_id, CAST(c.cnt AS BIGINT) AS cnt,
           ROUND(c.cnt * 1.0 / t.n, 6) AS share
    FROM c, tot t
    WHERE c.cnt * 1.0 / t.n >= 0.0075
    """,
)
def a23_heavy_hitters(spark, sf_dir):
    from ..operators.heavyhitters import heavy_hitters

    e = t(spark, sf_dir, "events")
    out = heavy_hitters(e, "user_id", min_share=0.0075)
    return out.select("user_id", F.col("cnt").cast("bigint"), "share")


# ---------------------------------------------------------------------------
# window: per-user EWMA of event values — a sequential recurrence no SQL
# window frame expresses; computed as one groupBy + row-local ordered fold
# (array_sort(collect_list) -> F.aggregate), zero UDF. Oracle: DuckDB's
# ordered list() aggregate + list_reduce runs the identical fold, so the
# doubles match bit-for-bit (same operation order).
# ---------------------------------------------------------------------------
@query(
    "w11_ewma",
    """
    WITH series AS (
      SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals,
             COUNT(value) AS n_obs
      FROM events GROUP BY user_id)
    SELECT user_id, CAST(n_obs AS BIGINT) AS n_obs,
           ROUND(list_reduce(vals, (acc, x) -> 0.2 * x + 0.8 * acc), 6) AS ewma
    FROM series
    """,
)
def w11_ewma(spark, sf_dir):
    from ..operators.windows import grouped_ewma

    e = t(spark, sf_dir, "events")
    out = grouped_ewma(
        e, "value", ["user_id"], ["ts", "event_id"], alpha=0.2
    )
    return out.select("user_id", F.col("n_obs").cast("bigint"), "ewma")


# ---------------------------------------------------------------------------
# llm: distributed BPE merge learning (Sennrich et al. 2016) — the first 6
# tokenizer merges over the corpus. After one corpus-wide word count every
# iteration is vocab-bounded (explode pairs over DISTINCT words + 1-row
# argmax pull), the Pregel shape of gr_pagerank_trade. The oracle unrolls
# the same 6 iterations as CTE stages; the greedy left-to-right merge fold
# runs as the SAME string fold in both engines (F.aggregate vs list_reduce),
# so the merge table matches exactly, ties broken lexicographically.
# ---------------------------------------------------------------------------
def _bpe_oracle(k: int) -> str:
    parts = [
        """
    base AS (
      SELECT word, COUNT(*) AS cnt FROM (
        SELECT regexp_replace(unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')), '[^a-z0-9]', '', 'g') AS word
        FROM documents) w
      WHERE word <> '' GROUP BY word),
    stage0 AS (
      SELECT word, array_to_string(string_split(word, ''), chr(31)) || chr(31) || '</w>' AS state, cnt FROM base)"""
    ]
    for i in range(1, k + 1):
        prev = f"stage{i-1}"
        parts.append(f"""
    pairs{i} AS (
      SELECT p[1] AS a, p[2] AS b, SUM(cnt) AS c FROM (
        SELECT unnest(list_filter(list_zip(syms, syms[2:]), q -> q[2] IS NOT NULL)) AS p, cnt
        FROM (SELECT string_split(state, chr(31)) AS syms, cnt FROM {prev}) s) t
      GROUP BY 1, 2),
    best{i} AS (SELECT a, b, c FROM pairs{i} ORDER BY c DESC, a ASC, b ASC LIMIT 1),
    stage{i} AS (
      SELECT word, CASE WHEN len(string_split(state, chr(31))) <= 1 THEN state ELSE
        list_reduce(string_split(state, chr(31)), (acc, x) -> CASE
          WHEN list_extract(string_split(acc, chr(31)), -1) = ma AND x = mb
          THEN left(acc, length(acc) - length(list_extract(string_split(acc, chr(31)), -1))) || mm
          ELSE acc || chr(31) || x END) END AS state, cnt
      FROM {prev} CROSS JOIN (SELECT a AS ma, b AS mb, a || b AS mm FROM best{i}) m)""")
    rows = " UNION ALL ".join(
        f"SELECT {i} AS step, a AS sym_a, b AS sym_b, a || b AS merged, CAST(c AS BIGINT) AS pair_count FROM best{i}"
        for i in range(1, k + 1)
    )
    return "WITH " + ",".join(parts) + " " + rows + " ORDER BY step"


def _bpe_encode_oracle(k: int) -> str:
    """Corpus tokenization with the k learned merges: reuse the merge-stage
    CTEs (the final stage IS the word -> subword-string mapping), join every
    doc's word stream against it, and count tokens per doc."""
    train = _bpe_oracle(k)
    stages = train[len("WITH ") : train.index(" SELECT 1 AS step")]
    return f"""
    WITH {stages},
    docwords AS (
      SELECT doc_id,
             regexp_replace(unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')), '[^a-z0-9]', '', 'g') AS word
      FROM documents),
    tok AS (
      SELECT d.doc_id, UNNEST(string_split(s.state, chr(31))) AS sym
      FROM docwords d JOIN stage{k} s ON d.word = s.word
      WHERE d.word <> '')
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bpe_tokens,
           CAST(COUNT(DISTINCT sym) AS BIGINT) AS distinct_bpe_tokens
    FROM tok GROUP BY doc_id
    """


@query("lm_bpe_merges", _bpe_oracle(6))
def lm_bpe_merges(spark, sf_dir):
    from ..llmdata.bpe import learn_bpe_merges

    d = t(spark, sf_dir, "documents", restore=True)
    return learn_bpe_merges(d, k=6)


# ---------------------------------------------------------------------------
# ml: group-wise winsorization (clip at per-group exact p05/p95) — standard
# feature-prep before training. Exact percentile per group (tiny group
# count) broadcast back onto the fact rows; at 100 TB swap F.percentile for
# percentile_approx with the same plan shape. Clip boundaries are rounded
# to 4 in BOTH engines before comparison/clip so interpolation ulp noise
# can't diverge the hashes.
# ---------------------------------------------------------------------------
@query(
    "ml_winsorize",
    """
    WITH b AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.05), 4) AS lo,
             ROUND(quantile_cont(value, 0.95), 4) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           ROUND(least(greatest(e.value, b.lo), b.hi), 4) AS value_winsorized,
           (e.value < b.lo OR e.value > b.hi) AS clipped
    FROM events e JOIN b USING (event_type)
    """,
)
def ml_winsorize(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    pcts = F.percentile("value", F.array(F.lit(0.05), F.lit(0.95)))
    b = e.groupBy("event_type").agg(
        F.round(F.element_at(pcts, 1), 4).alias("lo"),
        F.round(F.element_at(pcts, 2), 4).alias("hi"),
    )
    return e.join(F.broadcast(b), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.round(
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")), 4
        ).alias("value_winsorized"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))).alias(
            "clipped"
        ),
    )


# ---------------------------------------------------------------------------
# ts: first-order Markov transition matrix of event types per user — the
# behavioral-model summary (next-event prediction, anomaly scoring). One
# window pass (lag over user sessions) + one groupBy; transition
# probabilities are integer-count ratios, deterministic under rounding.
# ---------------------------------------------------------------------------
@query(
    "ts_markov_transitions",
    """
    WITH seq AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    c AS (
      SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 6) AS p
    FROM c
    """,
)
def ts_markov_transitions(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    c = seq.groupBy(
        F.col("prev").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    wrow = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") * 1.0 / F.sum("n").over(wrow), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# quality: Benford first-digit distribution test on order totals — the
# classic fabricated-data screen for financial columns (reference's quality
# surface §2.10 has no distributional test). Digit extraction is string-
# based on the DECIMAL rendering so both engines see identical digits; the
# expected share is Benford's log10(1 + 1/d).
# ---------------------------------------------------------------------------
@query(
    "q12_benford",
    """
    WITH d AS (
      SELECT CAST(regexp_extract(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                                 '[1-9]') AS INT) AS digit
      FROM orders WHERE o_totalprice > 0),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    tot AS (SELECT SUM(n) AS total FROM c)
    SELECT digit, CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / total, 6) AS observed,
           ROUND(log10(1 + 1.0 / digit), 6) AS expected,
           ROUND(abs(n * 1.0 / total - ROUND(log10(1 + 1.0 / digit), 6)), 6) AS abs_dev
    FROM c, tot
    """,
)
def q12_benford(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    d = o.filter(F.col("o_totalprice") > 0).select(
        F.regexp_extract(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), "[1-9]", 0
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").alias("total"))
    expected = F.round(F.log10(1 + 1.0 / F.col("digit")), 6)
    return c.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("observed"),
        expected.alias("expected"),
        F.round(
            F.abs(F.col("n") * 1.0 / F.col("total") - expected), 6
        ).alias("abs_dev"),
    )


# ---------------------------------------------------------------------------
# dedup analytics: source-overlap matrix — which SOURCES duplicate each
# other (mirror sites, syndication, scraper overlap). Rides the same 5-gram
# near-dup edges as dd_cluster_assign; the doc→source lookups attach via
# plain equi-joins — the edge side is output-bounded (near-dup pairs), so
# AQE broadcasts IT, never the corpus-sized source map. The matrix is
# symmetric: pairs are canonicalized (least, greatest), counted once.
# ---------------------------------------------------------------------------
@query(
    "dd_source_overlap",
    f"""
    WITH edges AS ({_JACCARD_EDGES_SQL}),
    tagged AS (
      SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b
      FROM edges e
      JOIN documents da ON e.id_a = da.doc_id
      JOIN documents db ON e.id_b = db.doc_id)
    SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS dup_pairs
    FROM tagged GROUP BY source_a, source_b
    """,
)
def dd_source_overlap(spark, sf_dir):
    from ..llmdata.dedup import ngram_jaccard_pairs

    d = t(spark, sf_dir, "documents", restore=True)
    edges = ngram_jaccard_pairs(d, n=5, threshold=0.5).select("id_a", "id_b")
    src = d.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa"))
    sb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb"))
    tagged = (
        edges.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    return tagged.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_pairs")
    )


# ---------------------------------------------------------------------------
# llm: contrastive training triplets (anchor, positive, negative) for
# embedding-model training. Positives = near-dup pairs (the 5-gram edge
# set); negatives are DETERMINISTIC pseudo-random picks: each pair hashes
# (md5) to one of 256 buckets, docs hash to buckets the same way, and the
# negative is the first of the bucket's 3 smallest doc_ids that collides
# with neither anchor nor positive. The bucket table is a 256-row broadcast
# built by one groupBy over the corpus — no per-pair scan, no RNG, fully
# reproducible, identical in both engines (md5 on integer strings).
# ---------------------------------------------------------------------------
@query(
    "llm_contrastive_triplets",
    f"""
    WITH edges AS ({_JACCARD_EDGES_SQL}),
    buckets AS (
      SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bkt,
             list_sort(list(doc_id))[1:3] AS cands
      FROM documents GROUP BY 1),
    trip AS (
      SELECT e.id_a AS anchor, e.id_b AS positive,
             list_filter(b.cands, c -> c <> e.id_a AND c <> e.id_b)[1] AS negative
      FROM edges e
      LEFT JOIN buckets b
        ON substring(md5(CAST(e.id_a AS VARCHAR) || '_' || CAST(e.id_b AS VARCHAR)), 1, 2) = b.bkt)
    SELECT anchor, positive, negative FROM trip WHERE negative IS NOT NULL
    """,
)
def llm_contrastive_triplets(spark, sf_dir):
    from ..llmdata.dedup import ngram_jaccard_pairs

    d = t(spark, sf_dir, "documents", restore=True)
    edges = ngram_jaccard_pairs(d, n=5, threshold=0.5).select("id_a", "id_b")
    buckets = (
        d.select(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("bkt"),
            "doc_id",
        )
        .groupBy("bkt")
        .agg(F.slice(F.sort_array(F.collect_list("doc_id")), 1, 3).alias("cands"))
    )
    pair_bkt = F.substring(
        F.md5(
            F.concat(
                F.col("id_a").cast("string"), F.lit("_"), F.col("id_b").cast("string")
            )
        ),
        1,
        2,
    )
    trip = edges.withColumn("bkt", pair_bkt).join(F.broadcast(buckets), "bkt", "left")
    neg = F.element_at(
        F.filter(
            F.col("cands"),
            lambda c: (c != F.col("id_a")) & (c != F.col("id_b")),
        ),
        1,
    )
    return (
        trip.select(
            F.col("id_a").alias("anchor"),
            F.col("id_b").alias("positive"),
            neg.alias("negative"),
        )
        .filter(F.col("negative").isNotNull())
    )


# ---------------------------------------------------------------------------
# dedup: paragraph-level exact dedup — the standard boilerplate-removal
# grain between document-level (dd_exact_dedup) and span-level
# (dd_dup_spans): a paragraph survives only at its FIRST corpus occurrence
# (min (doc_id, position)), so repeated headers/footers/disclaimers vanish
# everywhere else while each doc keeps its residual text in order.
# Shape: explode paragraphs with position → one window (first-occurrence
# rank over the paragraph hash) → re-assemble per doc. Two shuffles total
# (paragraph-hash, doc_id), both content-keyed and skew-bounded by
# paragraph multiplicity. Paragraphs are synthesized from sentence breaks
# like tx_c4_line_filter (the fixture text is single-line).
# ---------------------------------------------------------------------------
@query(
    "dd_paragraph_dedup",
    """
    WITH wrapped AS (
      SELECT doc_id, regexp_replace(text, '\\. ', '.' || chr(10), 'g') AS text
      FROM documents),
    paras AS (
      SELECT doc_id, p.para, p.pos
      FROM wrapped, LATERAL (
        SELECT UNNEST(string_split(text, chr(10))) AS para,
               generate_subscripts(string_split(text, chr(10)), 1) AS pos) p
      WHERE trim(p.para) <> ''),
    ranked AS (
      SELECT doc_id, para, pos,
             ROW_NUMBER() OVER (PARTITION BY md5(trim(para))
                                ORDER BY doc_id, pos) AS rn
      FROM paras)
    SELECT doc_id,
           array_to_string(list(para ORDER BY pos), chr(10)) AS clean_text,
           CAST(COUNT(*) AS INT) AS kept_paras
    FROM ranked WHERE rn = 1
    GROUP BY doc_id
    """,
)
def dd_paragraph_dedup(spark, sf_dir):
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace("text", r"\. ", ".\n")
    )
    paras = (
        d.select(
            "doc_id",
            F.posexplode(F.split("text", "\n")).alias("pos0", "para"),
        )
        .filter(F.trim("para") != "")
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "para")
    )
    w = Window.partitionBy(F.md5(F.trim("para"))).orderBy("doc_id", "pos")
    kept = paras.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "para"))
                    ),
                    lambda s: s["para"],
                ),
                "\n",
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("int").alias("kept_paras"),
        )
    )


# ---------------------------------------------------------------------------
# ts: day-of-week seasonal profile + residuals — the minimal seasonality
# decomposition (weekly profile is the dominant cycle in ops metrics):
# seasonal = per (event_type, iso dow) decimal-exact mean, residual =
# value − seasonal. One groupBy + one broadcast join back; the profile is
# 5×7 rows at any corpus size. Day-of-week via ISO numbering on both
# engines (Spark weekday()+1 == DuckDB isodow).
# ---------------------------------------------------------------------------
@query(
    "ts_seasonal_residuals",
    """
    WITH prof AS (
      SELECT event_type, isodow(ts) AS dow,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) / COUNT(value) * 1000000.0) / 1000000.0 AS seasonal
      FROM events GROUP BY 1, 2)
    SELECT e.event_id, e.event_type, CAST(isodow(e.ts) AS INT) AS dow, e.value,
           p.seasonal, ROUND(e.value - p.seasonal, 6) AS residual
    FROM events e
    JOIN prof p ON e.event_type = p.event_type AND isodow(e.ts) = p.dow
    """,
)
def ts_seasonal_residuals(spark, sf_dir):
    from .registry import davg

    e = t(spark, sf_dir, "events").withColumn(
        "dow", (F.weekday("ts") + 1).cast("int")
    )
    prof = e.groupBy("event_type", "dow").agg(davg("value").alias("seasonal"))
    return e.join(F.broadcast(prof), ["event_type", "dow"]).select(
        "event_id",
        "event_type",
        "dow",
        "value",
        "seasonal",
        F.round(F.col("value") - F.col("seasonal"), 6).alias("residual"),
    )


# ---------------------------------------------------------------------------
# agg: KMV (k-minimum-values) distinct sketch — mergeable approximate
# distinct counting like a12/a21's HLL, but built on md5 order statistics,
# so the ESTIMATE ITSELF is deterministic and oracle-verifiable across
# engines (HLL implementations differ; KMV is just "the k smallest hashes",
# Bar-Yossef et al. 2002). Per group: distinct hashes → rank<=k filter
# (WindowGroupLimit prunes map-side, the llm_stratified_k shape) → estimate
# (k-1)/u_k from the k-th smallest normalized hash. The 13-hex-digit
# numeric value is < 2^52, so the double arithmetic is exact in both
# engines. Emits estimate next to the exact count + relative error — the
# sketch's accuracy contract is part of the oracle-checked output.
# ---------------------------------------------------------------------------
_HEX = "['0','1','2','3','4','5','6','7','8','9','a','b','c','d','e','f']"


@query(
    "a24_kmv_distinct",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS hv FROM events),
    ranked AS (
      SELECT event_type, hv,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
      FROM h),
    kth AS (
      SELECT event_type, MAX(hv) AS hk, COUNT(*) AS n_in_k
      FROM ranked WHERE rn <= 64 GROUP BY event_type),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type),
    est AS (
      SELECT k.event_type, e.exact_distinct,
             CASE WHEN k.n_in_k < 64 THEN CAST(e.exact_distinct AS DOUBLE)
                  ELSE ROUND(63 * power(16, 13) / greatest(
                    list_sum(list_transform(
                      list_zip(string_split(substring(k.hk, 1, 13), ''), range(1, 14)),
                      p -> (list_position({_HEX}, p[1]) - 1) * power(16, 13 - p[2]))), 1.0), 4)
             END AS kmv_estimate
      FROM kth k JOIN exact e ON k.event_type = e.event_type)
    SELECT event_type, CAST(exact_distinct AS BIGINT) AS exact_distinct,
           kmv_estimate,
           ROUND(abs(kmv_estimate - exact_distinct) / exact_distinct, 4) AS rel_err
    FROM est
    """,
)
def a24_kmv_distinct(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    k = 64
    h = e.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("hv")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    kth = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("event_type")
        .agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("n_in_k"))
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    hexarr = F.array(*[F.lit(c) for c in "0123456789abcdef"])
    u = F.aggregate(
        F.slice(F.split(F.substring("hk", 1, 13), ""), 1, 13),
        F.lit(0.0),
        lambda acc, c: acc * 16 + (F.array_position(hexarr, c) - 1),
    )
    est = kth.join(exact, "event_type").select(
        "event_type",
        "exact_distinct",
        F.when(
            F.col("n_in_k") < k, F.col("exact_distinct").cast("double")
        )
        .otherwise(
            F.round(
                F.lit(float(k - 1)) * F.lit(16.0**13) / F.greatest(u, F.lit(1.0)), 4
            )
        )
        .alias("kmv_estimate"),
    )
    return est.select(
        "event_type",
        F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
        "kmv_estimate",
        F.round(
            F.abs(F.col("kmv_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            4,
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# text: language-ID confusion matrix + per-language precision/recall — the
# accuracy surface for the n-gram lang-id heuristic against the corpus's
# labeled lang column. One scan + two tiny aggregations; the matrix is
# |langs|² rows at any corpus size, so the metric joins broadcast.
# ---------------------------------------------------------------------------
@query(
    "tx_lang_confusion",
    f"""
    WITH s AS (
      SELECT doc_id, lang,
             {_HITS['en']} AS h_en, {_HITS['de']} AS h_de, {_HITS['fr']} AS h_fr,
             {_HITS['es']} AS h_es, {_HITS['zh']} AS h_zh
      FROM documents),
    pred AS (
      SELECT lang,
             CASE WHEN greatest(h_en, h_de, h_fr, h_es, h_zh) <= 0 THEN 'unknown'
                  WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_zh THEN 'en'
                  WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'
                  WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'
                  WHEN h_es >= h_zh THEN 'es'
                  ELSE 'zh' END AS lang_pred
      FROM s),
    cm AS (SELECT lang, lang_pred, COUNT(*) AS n FROM pred GROUP BY 1, 2),
    byp AS (SELECT lang_pred, SUM(n) AS n_pred FROM cm GROUP BY 1),
    byt AS (SELECT lang, SUM(n) AS n_true FROM cm GROUP BY 1)
    SELECT cm.lang, cm.lang_pred, CAST(cm.n AS BIGINT) AS n,
           ROUND(cm.n * 1.0 / byp.n_pred, 6) AS precision_contrib,
           ROUND(cm.n * 1.0 / byt.n_true, 6) AS recall_contrib
    FROM cm JOIN byp ON cm.lang_pred = byp.lang_pred
            JOIN byt ON cm.lang = byt.lang
    """,
)
def tx_lang_confusion(spark, sf_dir):
    from ..llmdata.text import add_language_id

    d = t(spark, sf_dir, "documents", restore=True)
    pred = add_language_id(d, "text", out="lang_pred").select("lang", "lang_pred")
    cm = pred.groupBy("lang", "lang_pred").agg(F.count(F.lit(1)).alias("n"))
    byp = cm.groupBy("lang_pred").agg(F.sum("n").alias("n_pred"))
    byt = cm.groupBy("lang").agg(F.sum("n").alias("n_true"))
    return (
        cm.join(F.broadcast(byp), "lang_pred")
        .join(F.broadcast(byt), "lang")
        .select(
            "lang",
            "lang_pred",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") * 1.0 / F.col("n_pred"), 6).alias("precision_contrib"),
            F.round(F.col("n") * 1.0 / F.col("n_true"), 6).alias("recall_contrib"),
        )
    )


# ---------------------------------------------------------------------------
# llm: cluster-safe k-fold assignment — generalizes llm_cluster_safe_split
# from one holdout to k cross-validation folds: the fold key is the
# near-dup CLUSTER representative, so near-duplicates of a doc can never
# land in a different fold (the leakage that inflates eval scores). Fold =
# first 4 hex chars of md5(rep) mod k — deterministic, engine-identical
# via string slicing (hex compare avoids hex→int conversion: the 4-char
# prefix maps to fold by range bucketing on 16^4/k boundaries... simpler:
# both engines CAST the 4 hex chars' numeric value via the same list fold
# used by a24). Here we reuse the a24 hex-value trick with 4 digits.
# ---------------------------------------------------------------------------
@query(
    "llm_kfold_split",
    f"""
    WITH edges AS ({_JACCARD_EDGES_SQL}),
    clusters AS (
      SELECT DISTINCT doc_id, cluster_id FROM (
        SELECT id_a AS doc_id, least(id_a, id_b) AS cluster_id FROM edges
        UNION ALL
        SELECT id_b AS doc_id, least(id_a, id_b) AS cluster_id FROM edges),
      WHERE TRUE QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cluster_id) = 1),
    tagged AS (
      SELECT d.doc_id, d.n_chars,
             CAST(list_sum(list_transform(
               list_zip(string_split(substring(md5(CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 4), ''), range(1, 5)),
               p -> (list_position({_HEX}, p[1]) - 1) * power(16, 4 - p[2]))) AS BIGINT) % 5 AS fold
      FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id)
    SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars
    FROM tagged GROUP BY fold
    """,
)
def llm_kfold_split(spark, sf_dir):
    """NOTE: fold keying uses single-link (min-neighbor) cluster ids — a
    lighter proxy than full connected components, but sufficient for fold
    safety only when combined with the same keying on both sides; the
    oracle mirrors it exactly."""
    from ..llmdata.dedup import ngram_jaccard_pairs

    d = t(spark, sf_dir, "documents", restore=True)
    edges = ngram_jaccard_pairs(d, n=5, threshold=0.5).select("id_a", "id_b")
    rep = F.least("id_a", "id_b")
    members = (
        edges.select(F.col("id_a").alias("doc_id"), rep.alias("cluster_id"))
        .unionByName(edges.select(F.col("id_b").alias("doc_id"), rep.alias("cluster_id")))
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    hexarr = F.array(*[F.lit(c) for c in "0123456789abcdef"])
    key = F.md5(F.coalesce(F.col("cluster_id"), F.col("doc_id")).cast("string"))
    hv = F.aggregate(
        F.slice(F.split(F.substring(key, 1, 4), ""), 1, 4),
        F.lit(0.0),
        lambda acc, c: acc * 16 + (F.array_position(hexarr, c) - 1),
    )
    tagged = d.join(members, "doc_id", "left").withColumn(
        "fold", (hv.cast("bigint") % 5)
    )
    return tagged.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# multimodal: perceptual-hash image dedup — pHash (DCT) via the pure-Python
# PPM decoder, banded-LSH candidate join, exact Hamming verify. The fixture
# synthesizes a deterministic 4x4 PPM per document from md5 bytes, so
# byte-identical texts yield byte-identical images; PLANTED byte-identical
# copies (doc_id%10==1 re-id'd at +1000000, the dd_incremental_index
# pattern) guarantee the hamming==0 slice is non-empty, so the oracle row
# actually exercises the decode→DCT→band-join→verify path instead of
# passing vacuously on 0=0. The oracle covers the hamming==0 slice exactly
# (identical payload ⇒ identical pHash — the DCT is deterministic); caveat:
# pHash is lossy, so two DISTINCT payloads could in principle collide to
# the same 64-bit hash and the engine would emit a pair the md5-keyed
# oracle lacks (~2^-64 per pair on this fixture — never observed). Non-zero
# Hamming robustness (brightness shift, re-encode) is unit-tested on real
# decoded images instead (tests/test_multimodal.py).
# ---------------------------------------------------------------------------
@query(
    "mm_phash_neardup",
    """
    WITH h AS (
      SELECT doc_id, md5(text) AS ph FROM documents WHERE text IS NOT NULL
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, md5(text) AS ph
      FROM documents WHERE text IS NOT NULL AND doc_id % 10 = 1)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
    FROM h a JOIN h b ON a.ph = b.ph AND a.doc_id < b.doc_id
    """,
)
def mm_phash_neardup(spark, sf_dir):
    from ..llmdata.multimodal import image_phash, phash_near_dup

    d = t(spark, sf_dir, "documents", restore=True).filter(F.col("text").isNotNull())
    # 8x8 source (192 raster bytes = 12 md5 blocks): a 4x4 image has only
    # 16 degrees of freedom, so its 64-bit DCT hash carries far less than
    # 64 bits of entropy — at sf1 (55k images) 5 DISTINCT payloads collided
    # to equal hashes and the md5-keyed oracle (exact) undercounted (sf1
    # oracle-audit finding). 64 DoF restores ~uniform 64-bit hashing.
    header = F.encode(F.lit("P6\n8 8\n255\n"), "utf-8")
    raster = F.concat(
        *[
            F.unhex(F.md5(F.concat(F.col("text"), F.lit(str(i)))))
            for i in range(12)
        ]
    )
    base = d.select(
        F.col("doc_id").alias("media_id"),
        F.concat(header, raster).alias("payload"),
    )
    planted = base.filter(F.col("media_id") % 10 == 1).select(
        (F.col("media_id") + 1000000).alias("media_id"), "payload"
    )
    media = base.unionByName(planted)
    hashed = image_phash(media, id_col="media_id")
    pairs = phash_near_dup(hashed, max_hamming=0, id_col="media_id")
    return pairs.select(
        F.col("id_a").cast("long"), F.col("id_b").cast("long"), F.col("hamming").cast("int")
    )


# ---------------------------------------------------------------------------
# agg: explicit GROUPING SETS with grouping() markers — the general form of
# a13's ROLLUP / a14's CUBE: exactly the requested grain combinations
# ((status, priority), (status), ()) in ONE pass — Spark expands the sets
# inside a single Expand+HashAggregate, not one scan per grain. Exercised
# through the SQL surface (spark.sql over a temp view), which the CLI and
# API layer expose to users.
# ---------------------------------------------------------------------------
@query(
    "a25_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def a25_grouping_sets(spark, sf_dir):
    t(spark, sf_dir, "orders", restore=True).createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


# ---------------------------------------------------------------------------
# window: cumulative distinct users by day — the "users to date" curve.
# A naive COUNT(DISTINCT) OVER (ORDER BY day) re-scans history per day; the
# scalable identity is first-occurrence + running sum: distinct-to-date ==
# cumulative count of FIRST appearances. One groupBy (per-user min ts) +
# one tiny per-day agg + a running-sum window over |days| rows.
# ---------------------------------------------------------------------------
@query(
    "w12_cumulative_distinct",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS first_day FROM events GROUP BY user_id),
    daily AS (
      SELECT first_day AS day, COUNT(*) AS new_users FROM first_seen GROUP BY first_day)
    SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS users_to_date
    FROM daily
    """,
)
def w12_cumulative_distinct(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(F.min("ts").cast("date").alias("first_day"))
    daily = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("users_to_date"),
    )


# ---------------------------------------------------------------------------
# join: temporal fact-to-SCD2 join — each lineitem matched to the customer's
# status VERSION in force at ship time (valid_from <= ship < valid_to).
# The range predicate rides the custkey equi key (the j3 "equi carrier"
# shape: versions per key are few, so the shuffled equi-join plus a
# row-local interval filter is the scalable plan — never a range-only
# cross product); aggregated to regime grain so output stays small.
# ---------------------------------------------------------------------------
@query(
    "j13_scd2_temporal_join",
    """
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             LAG(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_status
      FROM orders),
    changes AS (
      SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from, o_orderkey
      FROM ordered WHERE prev_status IS NULL OR prev_status != o_orderstatus),
    versions AS (
      SELECT o_custkey, o_orderstatus AS regime_status, valid_from,
             LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey) AS valid_to
      FROM changes),
    fact AS (
      SELECT o.o_custkey, l.l_shipdate, CAST(l.l_extendedprice AS DECIMAL(28,2)) AS price
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT v.regime_status,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(SUM(f.price) AS DOUBLE) AS revenue
    FROM fact f
    JOIN versions v
      ON f.o_custkey = v.o_custkey
     AND f.l_shipdate >= v.valid_from
     AND (v.valid_to IS NULL OR f.l_shipdate < v.valid_to)
    GROUP BY v.regime_status
    """,
)
def j13_scd2_temporal_join(spark, sf_dir):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders", restore=True)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.withColumn("prev_status", F.lag("o_orderstatus").over(w))
        .filter(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
        .select(
            "o_custkey",
            F.col("o_orderstatus").alias("regime_status"),
            F.col("o_orderdate").alias("valid_from"),
            "o_orderkey",
        )
    )
    wv = Window.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    versions = changes.select(
        "o_custkey",
        "regime_status",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
    )
    l = t(spark, sf_dir, "lineitem", restore=True)
    fact = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "o_custkey",
        "l_shipdate",
        F.col("l_extendedprice").cast("decimal(28,2)").alias("price"),
    )
    joined = fact.join(
        versions,
        (fact.o_custkey == versions.o_custkey)
        & (F.col("l_shipdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("l_shipdate") < F.col("valid_to"))),
    )
    return joined.groupBy("regime_status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        F.sum("price").cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# llm: corpus tokenization with the learned BPE merges — the encode half of
# lm_bpe_merges (train + apply both oracle-checked closes the tokenizer
# loop). The merge folds run ONLY on the distinct-word vocab (they already
# ran during training — learn_bpe returns the final word→subwords mapping);
# the corpus encode is a plain equi-join of the word stream against that
# dictionary. The per-corpus-word plan-side fold variant (apply_bpe) was
# measured 20x slower here — nested HOF lambdas evaluate interpreted, so
# keeping them off the corpus-sized path is the load-bearing choice. The
# oracle reuses the training CTE stages the same way: the final stage IS
# the mapping.
# ---------------------------------------------------------------------------
@query("lm_bpe_encode", _bpe_encode_oracle(6))
def lm_bpe_encode(spark, sf_dir):
    from ..llmdata.bpe import bpe_token_counts, learn_bpe

    d = t(spark, sf_dir, "documents", restore=True)
    _, vocab = learn_bpe(d, k=6)
    return bpe_token_counts(d, vocab)


def _bpe_roundtrip_oracle(k: int) -> str:
    """Per-source tokenizer quality gate over the k-merge BPE: reuse the
    training CTE stages, join the word stream, and verify losslessness
    (stripping SEP + end marker from the subword string must reproduce the
    word) plus compression (tokens/word, chars/token as floor-div ppm)."""
    train = _bpe_oracle(k)
    stages = train[len("WITH ") : train.index(" SELECT 1 AS step")]
    return f"""
    WITH {stages},
    docwords AS (
      SELECT source,
             regexp_replace(unnest(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')), '[^a-z0-9]', '', 'g') AS word
      FROM documents),
    tok AS (
      SELECT d.source,
             len(string_split(s.state, chr(31))) AS n_sub,
             length(d.word) AS n_chars_w,
             CASE WHEN replace(replace(s.state, chr(31), ''), '</w>', '') = d.word
                  THEN 1 ELSE 0 END AS rt_ok
      FROM docwords d JOIN stage{k} s ON d.word = s.word
      WHERE d.word <> '')
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_sub) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_chars_w) AS BIGINT) AS n_chars,
           CAST(SUM(rt_ok) AS BIGINT) AS n_roundtrip_ok,
           CAST(COUNT(*) - SUM(rt_ok) AS BIGINT) AS n_roundtrip_fail,
           CAST((SUM(n_sub) * 1000000) // COUNT(*) AS BIGINT) AS tokens_per_word_ppm,
           CAST((SUM(n_chars_w) * 1000000) // SUM(n_sub) AS BIGINT) AS chars_per_token_ppm
    FROM tok GROUP BY source ORDER BY source
    """


# ---------------------------------------------------------------------------
# llm: tokenizer round-trip + compression-ratio quality gate (VERDICT r7
# stretch #8). A tokenizer change that silently drops characters or blows
# up fertility is a training-data incident; this gate re-derives the
# 6-merge BPE, re-encodes the corpus word stream, and HASH-VERIFIES per
# source (a) losslessness — decode(encode(word)) == word for every corpus
# word (n_roundtrip_fail must be 0), and (b) fertility/compression —
# tokens-per-word and chars-per-token as exact floor-div ppm integers.
# Same vocab-bounded shape as lm_bpe_encode: the merge folds run on the
# distinct-word vocab only; the corpus-sized path is one equi-join.
# ---------------------------------------------------------------------------
@query("lm_bpe_roundtrip", _bpe_roundtrip_oracle(6))
def lm_bpe_roundtrip(spark, sf_dir):
    from ..llmdata.bpe import END_MARKER, SEP, learn_bpe
    from ..llmdata.text import _norm

    d = t(spark, sf_dir, "documents", restore=True)
    _, vocab = learn_bpe(d, k=6)
    words = (
        d.select("source", F.explode(F.split(_norm("text"), " ")).alias("tok"))
        .select("source", F.regexp_replace("tok", "[^a-z0-9]", "").alias("word"))
        .filter(F.col("word") != "")
    )
    per = words.join(vocab.select("word", "state"), "word").select(
        "source",
        F.size(F.split("state", SEP)).alias("n_sub"),
        F.length("word").alias("n_chars_w"),
        (
            F.replace(
                F.replace(F.col("state"), F.lit(SEP), F.lit("")),
                F.lit(END_MARKER),
                F.lit(""),
            )
            == F.col("word")
        )
        .cast("int")
        .alias("rt_ok"),
    )
    out = per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_sub").alias("n_bpe_tokens"),
        F.sum("n_chars_w").alias("n_chars"),
        F.sum("rt_ok").alias("n_roundtrip_ok"),
    )
    return out.select(
        "source",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("n_roundtrip_ok").cast("bigint").alias("n_roundtrip_ok"),
        (F.col("n_words") - F.col("n_roundtrip_ok"))
        .cast("bigint")
        .alias("n_roundtrip_fail"),
        F.expr("(n_bpe_tokens * CAST(1000000 AS BIGINT)) div n_words").alias(
            "tokens_per_word_ppm"
        ),
        F.expr("(n_chars * CAST(1000000 AS BIGINT)) div n_bpe_tokens").alias(
            "chars_per_token_ppm"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# ts: PMI co-occurrence of event types within user-days — the association
# signal behind item2vec-style embeddings and market-basket lifts:
# pmi(a,b) = log( p(a,b) / (p(a)p(b)) ) over (user, day) baskets. Baskets
# are distinct-typed, pairs canonicalized (a < b). Two tiny aggregations
# after one distinct; every probability is an integer-count ratio and the
# log is taken on one rounded ratio so engine libm agreement holds at 6dp.
# ---------------------------------------------------------------------------
@query(
    "ts_pmi_cooccurrence",
    """
    WITH baskets AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events),
    nb AS (SELECT COUNT(DISTINCT (user_id, day)) AS n_baskets FROM baskets),
    singles AS (
      SELECT event_type, COUNT(*) AS n FROM baskets GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_ab
      FROM baskets a JOIN baskets b
        ON a.user_id = b.user_id AND a.day = b.day AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT p.type_a, p.type_b, CAST(p.n_ab AS BIGINT) AS n_ab,
           ROUND(ln(ROUND(p.n_ab * 1.0 * t.n_baskets / (sa.n * sb.n), 6)), 6) AS pmi
    FROM pairs p
    JOIN singles sa ON p.type_a = sa.event_type
    JOIN singles sb ON p.type_b = sb.event_type
    CROSS JOIN nb t
    """,
)
def ts_pmi_cooccurrence(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    baskets = e.select(
        "user_id", F.col("ts").cast("date").alias("day"), "event_type"
    ).distinct()
    nb = baskets.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    singles = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.log(
                    F.round(
                        F.col("n_ab") * 1.0 * F.col("n_baskets")
                        / (F.col("na") * F.col("nb")),
                        6,
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# ml: deterministic Lloyd's k-means (2 unrolled iterations, k=4) over the
# embeddings table — iterative ML with an EXACT oracle, like gr_pagerank
# (supersteps) and lm_bpe_merges (merge stages). Every nondeterminism is
# pinned: hash-order seeding, left-fold distances against plan-literal
# centroids (0.0-init fold ≡ list_reduce: 0+d0 == d0 in IEEE), lowest-index
# argmin tie-break, DECIMAL-exact per-(cluster,dim) means. Output is the
# long-format model: (cluster, dim, component, member count).
# ---------------------------------------------------------------------------
_KM_DIST = (
    "list_reduce(list_transform(list_zip({v}, {c}), p -> (p[1]-p[2])*(p[1]-p[2])),"
    " (acc, x) -> acc + x)"
)


def _kmeans_oracle(k: int = 4) -> str:
    def iteration(i: int, cent: str) -> str:
        return f"""
    a{i} AS (
      SELECT b.id, b.vec, s.cluster,
             {_KM_DIST.format(v='b.vec', c='s.vec')} AS dist
      FROM base b CROSS JOIN {cent} s),
    asg{i} AS (
      SELECT id, vec, cluster FROM a{i}
      QUALIFY ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, cluster) = 1),
    u{i} AS (
      SELECT cluster, v.pos - 1 AS dim,
             CAST(SUM(CAST(v.val AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS m
      FROM asg{i}, LATERAL (SELECT unnest(vec) AS val,
                                   generate_subscripts(vec, 1) AS pos) v
      GROUP BY cluster, v.pos),
    cm{i} AS (SELECT cluster, list(m ORDER BY dim) AS vec FROM u{i} GROUP BY cluster),
    c{i} AS (
      SELECT s.cluster, COALESCE(c.vec, s.vec) AS vec
      FROM {cent} s LEFT JOIN cm{i} c USING (cluster))"""

    return f"""
    WITH base AS (
      SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings),
    seeds AS (
      SELECT vec,
             ROW_NUMBER() OVER (ORDER BY md5(CAST(id AS VARCHAR)), id) - 1 AS cluster
      FROM base QUALIFY cluster < {k}),
    {iteration(1, 'seeds')},
    {iteration(2, 'c1')},
    sizes AS (SELECT cluster, COUNT(*) AS n_vecs FROM asg2 GROUP BY cluster),
    model AS (
      SELECT c.cluster, v.pos - 1 AS dim, ROUND(v.val, 6) AS c_val
      FROM c2 c, LATERAL (SELECT unnest(vec) AS val,
                                 generate_subscripts(vec, 1) AS pos) v)
    SELECT m.cluster, CAST(m.dim AS INT) AS dim, m.c_val,
           CAST(COALESCE(s.n_vecs, 0) AS BIGINT) AS n_vecs
    FROM model m LEFT JOIN sizes s ON m.cluster = s.cluster
    """


@query("ml_kmeans_model", _kmeans_oracle(4))
def ml_kmeans_model(spark, sf_dir):
    from ..ml.kmeans import kmeans_lloyd

    e = t(spark, sf_dir, "embeddings", restore=True)
    out = kmeans_lloyd(e, k=4, iters=2)
    return out.select(
        F.col("cluster").cast("int"),
        F.col("dim").cast("int"),
        "c_val",
        F.col("n_vecs").cast("bigint"),
    )


# ---------------------------------------------------------------------------
# agg: KMV sketch ALGEBRA — audience overlap between event types from the
# same k-minimum-values sketches as a24 (Beyer et al. SIGMOD'07): the union
# sketch is the k smallest of S(A) ∪ S(B); jaccard_est = |K(A∪B) ∩ S(A) ∩
# S(B)| / k; intersect_est = jaccard_est · D̂(A∪B). Everything is order
# statistics of md5 — deterministic, so estimates AND the exact
# intersection/jaccard comparison columns all hash-match the oracle. The
# per-type sketches are ≤k rows, so all pair algebra is broadcast-sized
# regardless of corpus scale; the only corpus-bounded work is the distinct
# + rank<=k pass (WindowGroupLimit prunes map-side).
# ---------------------------------------------------------------------------
@query(
    "a26_kmv_set_ops",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type, user_id, md5(CAST(user_id AS VARCHAR)) AS hv
      FROM events),
    sk AS (
      SELECT event_type, hv
      FROM h QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) <= 64),
    prs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM h) a
      JOIN (SELECT DISTINCT event_type FROM h) b ON a.event_type < b.event_type),
    cand AS (
      SELECT DISTINCT p.type_a, p.type_b, s.hv
      FROM prs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)),
    flagged AS (
      SELECT c.type_a, c.type_b, c.hv,
             c.hv IN (SELECT hv FROM sk x WHERE x.event_type = c.type_a) AS in_a,
             c.hv IN (SELECT hv FROM sk x WHERE x.event_type = c.type_b) AS in_b
      FROM cand c),
    uni AS (
      SELECT * FROM flagged
      QUALIFY ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY hv) <= 64),
    stats AS (
      SELECT type_a, type_b,
             COUNT(*) AS ku,
             MAX(hv) AS hk,
             SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS n_both
      FROM uni GROUP BY type_a, type_b),
    est AS (
      SELECT type_a, type_b, n_both,
             ROUND(n_both * 1.0 / ku, 4) AS jaccard_est,
             CASE WHEN ku < 64 THEN CAST(ku AS DOUBLE)
                  ELSE ROUND(63 * power(16, 13) / greatest(
                    list_sum(list_transform(
                      list_zip(string_split(substring(hk, 1, 13), ''), range(1, 14)),
                      p -> (list_position({_HEX}, p[1]) - 1) * power(16, 13 - p[2]))), 1.0), 4)
             END AS union_est
      FROM stats),
    exact AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS exact_intersect
      FROM h a JOIN h b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT e.type_a, e.type_b,
           CAST(x.exact_intersect AS BIGINT) AS exact_intersect,
           e.jaccard_est,
           ROUND(e.jaccard_est * e.union_est, 4) AS intersect_est
    FROM est e JOIN exact x ON e.type_a = x.type_a AND e.type_b = x.type_b
    """,
)
def a26_kmv_set_ops(spark, sf_dir):
    from pyspark.sql import Window

    k = 64
    e = t(spark, sf_dir, "events")
    h = e.select(
        "event_type", "user_id", F.md5(F.col("user_id").cast("string")).alias("hv")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    sk = h.select("event_type", "hv").withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    ).drop("rn")
    types = h.select("event_type").distinct()
    prs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    # membership flags per (pair, hash): one row per hash in S(A) ∪ S(B)
    ska = sk.select(F.col("event_type").alias("type_a"), F.col("hv").alias("hv_a"))
    skb = sk.select(F.col("event_type").alias("type_b"), F.col("hv").alias("hv_b"))
    cand = (
        prs.join(F.broadcast(ska), "type_a")
        .select("type_a", "type_b", F.col("hv_a").alias("hv"))
        .unionByName(
            prs.join(F.broadcast(skb), "type_b").select(
                "type_a", "type_b", F.col("hv_b").alias("hv")
            )
        )
        .distinct()
    )
    flags = (
        cand.join(
            F.broadcast(ska.withColumnRenamed("hv_a", "hv")).withColumn(
                "in_a", F.lit(True)
            ),
            ["type_a", "hv"],
            "left",
        )
        .join(
            F.broadcast(skb.withColumnRenamed("hv_b", "hv")).withColumn(
                "in_b", F.lit(True)
            ),
            ["type_b", "hv"],
            "left",
        )
        .fillna(False, ["in_a", "in_b"])
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy("hv")
    uni = flags.withColumn("rn", F.row_number().over(wu)).filter(F.col("rn") <= k)
    hexarr = F.array(*[F.lit(c) for c in "0123456789abcdef"])
    uval = F.aggregate(
        F.slice(F.split(F.substring("hk", 1, 13), ""), 1, 13),
        F.lit(0.0),
        lambda acc, c: acc * 16 + (F.array_position(hexarr, c) - 1),
    )
    stats = uni.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("ku"),
        F.max("hv").alias("hk"),
        F.sum(F.when(F.col("in_a") & F.col("in_b"), 1).otherwise(0)).alias("both"),
    )
    est = stats.select(
        "type_a",
        "type_b",
        "both",
        F.round(F.col("both") * 1.0 / F.col("ku"), 4).alias("jaccard_est"),
        F.when(F.col("ku") < k, F.col("ku").cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1)) * F.lit(16.0**13) / F.greatest(uval, F.lit(1.0)), 4
            )
        )
        .alias("union_est"),
    )
    exact = (
        h.alias("a")
        .join(
            h.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    return est.join(exact, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        F.col("exact_intersect").cast("bigint").alias("exact_intersect"),
        "jaccard_est",
        F.round(F.col("jaccard_est") * F.col("union_est"), 4).alias("intersect_est"),
    )


# ---------------------------------------------------------------------------
# llm: corpus data card — the "datasheets for datasets" summary a training
# run ships with: per (lang, source) doc/char/token counts, exact-dup rate,
# and share of corpus tokens. One scan + one groupBy + a 1-row total join;
# every ratio is an integer-count ratio.
# ---------------------------------------------------------------------------
@query(
    "llm_data_card",
    f"""
    WITH d AS (
      SELECT lang, source, n_chars,
             CASE WHEN length({_NORM_SQL}) = 0 THEN 0 ELSE len({_TOKS_SQL}) END AS n_tokens,
             md5({_NORM_SQL}) AS content_hash
      FROM documents),
    g AS (
      SELECT lang, source,
             COUNT(*) AS n_docs,
             SUM(n_chars) AS n_chars,
             SUM(n_tokens) AS n_tokens,
             COUNT(*) - COUNT(DISTINCT content_hash) AS dup_docs
      FROM d GROUP BY lang, source),
    tot AS (SELECT SUM(n_tokens) AS total_tokens FROM g)
    SELECT g.lang, g.source, CAST(g.n_docs AS BIGINT) AS n_docs,
           CAST(g.n_chars AS BIGINT) AS n_chars,
           CAST(g.n_tokens AS BIGINT) AS n_tokens,
           ROUND(g.dup_docs * 1.0 / g.n_docs, 6) AS dup_rate,
           ROUND(g.n_tokens * 1.0 / t.total_tokens, 6) AS token_share
    FROM g CROSS JOIN tot t
    """,
)
def llm_data_card(spark, sf_dir):
    from ..llmdata.text import token_count

    d = t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    base = d.select(
        "lang",
        "source",
        "n_chars",
        token_count("text").alias("n_tokens"),
        F.md5(norm).alias("content_hash"),
    )
    g = base.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_tokens").alias("n_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("content_hash")).alias("dup_docs"),
    )
    tot = g.agg(F.sum("n_tokens").alias("total_tokens"))
    return g.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.col("dup_docs") * 1.0 / F.col("n_docs"), 6).alias("dup_rate"),
        F.round(F.col("n_tokens") * 1.0 / F.col("total_tokens"), 6).alias(
            "token_share"
        ),
    )


# ---------------------------------------------------------------------------
# similarity: exact k-NN neighborhoods over a FIXED probe set (SemDeDup-style
# graph construction). The sources are the deterministic 20-vector probe set
# (vec_id % 100 == 0 AND vec_id < 2000 — the same pin sim_knn_graph_ann and
# embedding_neardup_stats use), so the exact side costs O(|probe|·n·d) at
# every scale instead of the all-pairs O(n²·d) this query paid through r7
# (61.4s isolated at sf1; VERDICT r7 #4). The corpus side never shuffles —
# the probe set broadcasts into a map-side scan + WindowGroupLimit top-3.
# The FULL exact graph remains available as an operator
# (embedding_neardup_pairs(threshold=-1) + rank window; unit-tested), and
# the production-scale graph is sim_knn_graph_ann, whose recall probe is
# measured against exactly this query's output. Cosines are rounded to 6 in
# BOTH engines BEFORE ranking so fold-order summation noise (~1e-13) cannot
# flip a rank; ties break on neighbor id.
# ---------------------------------------------------------------------------
@query(
    "sim_knn_graph",
    """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings),
    n AS (
      SELECT vec_id, vec,
             sqrt(list_reduce(list_transform(vec, x -> x * x), (a, b) -> a + b)) AS nrm
      FROM v),
    p AS (
      SELECT a.vec_id AS src, b.vec_id AS neighbor,
             ROUND(list_reduce(list_transform(list_zip(a.vec, b.vec), q -> q[1] * q[2]),
                               (x, y) -> x + y) / (a.nrm * b.nrm), 6) AS cosine
      FROM n a JOIN n b ON a.vec_id <> b.vec_id
      WHERE a.vec_id % 100 = 0 AND a.vec_id < 2000),
    ranked AS (
      SELECT src, neighbor, cosine,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosine DESC, neighbor) AS rnk
      FROM p)
    SELECT src, neighbor, CAST(rnk AS INT) AS rank, cosine
    FROM ranked WHERE rnk <= 3
    """,
)
def sim_knn_graph(spark, sf_dir):
    from ..llmdata.similarity import brute_force_cosine_topk

    e = t(spark, sf_dir, "embeddings", restore=True)
    probe = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    return brute_force_cosine_topk(probe, e, k=3).select(
        F.col("query_id").alias("src"),
        F.col("neighbor_id").alias("neighbor"),
        F.col("rank").cast("int").alias("rank"),
        "cosine",
    )


# ---------------------------------------------------------------------------
# similarity: ANN k-NN graph (scale path — no SQL oracle). The sub-quadratic
# twin of sim_knn_graph: the exact graph is provably un-prunable (threshold
# −1 keeps every pair — see _neardup_blocks), so at 100 TB it is the one
# quadratic surface left; this IVF-candidate + exact-re-rank path replaces
# it at scale, same baseline/scale split as dd_jaccard_pairs→dd_minhash_lsh.
# nlist scales as √n so flops are O(n^1.5·d) vs the exact graph's O(n²·d);
# self-validating: every row carries sample_recall_at_k, the measured edge
# recall vs the exact graph on a FIXED 20-source probe set (floor asserted
# in tests/test_scale_operators.py).
# ---------------------------------------------------------------------------
@query("sim_knn_graph_ann")
def sim_knn_graph_ann(spark, sf_dir):
    from ..llmdata.similarity import brute_force_cosine_topk, knn_graph_ann

    e = t(spark, sf_dir, "embeddings")
    n = e.count()
    nlist = max(8, int(round(n ** 0.5)))
    g = knn_graph_ann(e, k=3, nlist=nlist, nprobe=4)
    # FIXED sampled-source recall probe (bounded at any sf — same protocol
    # as sim_pq_topk's pinned query sample): exact top-3 for ≤20 sources
    # via the broadcast brute-force path, compared edge-for-edge
    sample = e.filter((F.col("vec_id") % 100 == 0) & (F.col("vec_id") < 2000))
    exact = brute_force_cosine_topk(sample, e, k=3).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("neighbor")
    )
    n_hit = g.join(F.broadcast(exact), ["src", "neighbor"]).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    rec = (
        n_hit.crossJoin(F.broadcast(n_exact))
        .select(
            F.round(F.col("n_hit") * 1.0 / F.col("n_exact"), 6).alias(
                "sample_recall_at_k"
            )
        )
    )
    return g.crossJoin(F.broadcast(rec))


# ---------------------------------------------------------------------------
# metrics marts: the engine's own serving-layer views, computed over a
# request log. The reference materializes these over whatever its platform
# logged (`models/metrics/usage_metrics.sql:6-76`,
# `models/metrics/api_performance.sql:1-99`); here the fixture `events`
# table plays the request log (endpoint=event_type, latency=value,
# ok = props.k < 95 — a per-request predicate so the health ladders see
# real rate variation) and the SAME mart functions run over the live
# QueryEngine.usage_log in tests/test_metrics.py. Percent fields round in
# the integer domain (round(x*10^k)/10^k) — see metrics.py for the
# cross-engine round-tie rationale.
# ---------------------------------------------------------------------------
_LOG_SQL = """
  SELECT event_type AS endpoint, ts,
         CAST(json_extract(props, '$.k') AS INT) < 95 AS ok,
         value AS latency_ms,
         'org_' || CAST(user_id % 37 AS VARCHAR) AS org
  FROM events
"""


def _request_log(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return e.select(
        F.col("event_type").alias("endpoint"),
        "ts",
        (F.get_json_object("props", "$.k").cast("int") < 95).alias("ok"),
        F.col("value").alias("latency_ms"),
        F.concat(F.lit("org_"), (F.col("user_id") % 37).cast("string")).alias("org"),
    )


@query(
    "a27_usage_metrics",
    f"""
    WITH log AS ({_LOG_SQL}),
    agg AS (
      SELECT endpoint,
             CAST(COUNT(*) AS BIGINT) AS total_requests,
             CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT) AS unique_hours,
             MIN(ts) AS first_access, MAX(ts) AS last_access,
             SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS n_ok
      FROM log WHERE ts >= TIMESTAMP '2024-01-25 00:00:00' GROUP BY endpoint)
    SELECT endpoint AS api_endpoint, total_requests,
           unique_hours AS unique_hours_accessed, first_access, last_access,
           ROUND(n_ok * 10000.0 / total_requests) / 100.0 AS success_rate_percent,
           ROUND(total_requests / 7.0, 0) AS avg_daily_requests,
           ROUND(total_requests * 10.0 / unique_hours) / 10.0 AS avg_requests_per_hour,
           CASE WHEN n_ok * 1.0 / total_requests >= 0.99 THEN 'EXCELLENT'
                WHEN n_ok * 1.0 / total_requests >= 0.95 THEN 'GOOD'
                WHEN n_ok * 1.0 / total_requests >= 0.90 THEN 'ACCEPTABLE'
                ELSE 'DEGRADED' END AS system_health_status,
           CASE WHEN total_requests > 1000 THEN 'HIGH_USAGE'
                WHEN total_requests > 100 THEN 'MODERATE_USAGE'
                WHEN total_requests > 10 THEN 'LOW_USAGE'
                ELSE 'MINIMAL_USAGE' END AS usage_level,
           TIMESTAMP '2024-02-01 00:00:00' AS metrics_generated_at
    FROM agg
    """,
)
def a27_usage_metrics(spark, sf_dir):
    from ..metrics import usage_metrics

    return usage_metrics(_request_log(spark, sf_dir))


@query(
    "a28_api_performance",
    f"""
    WITH log AS ({_LOG_SQL}),
    agg AS (
      SELECT endpoint,
             CAST(COUNT(*) AS BIGINT) AS total_requests,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-25 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS recent_requests,
             CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS error_requests,
             CAST(COUNT(DISTINCT org) AS BIGINT) AS distinct_orgs,
             MAX(ts) AS last_request_at,
             ROUND(quantile_cont(latency_ms, 0.5), 4) AS p50_latency_ms,
             ROUND(quantile_cont(latency_ms, 0.95), 4) AS p95_latency_ms,
             ROUND(quantile_cont(latency_ms, 0.99), 4) AS p99_latency_ms
      FROM log WHERE ts >= TIMESTAMP '2023-02-01 00:00:00' GROUP BY endpoint)
    SELECT endpoint AS api_endpoint, total_requests, recent_requests,
           error_requests, distinct_orgs,
           p50_latency_ms, p95_latency_ms, p99_latency_ms,
           ROUND(recent_requests * 10000.0 / total_requests) / 100.0 AS recent_activity_percent,
           ROUND(error_requests * 10000.0 / total_requests) / 100.0 AS error_percent,
           CASE WHEN distinct_orgs >= 45 THEN 'BROAD_COVERAGE'
                WHEN distinct_orgs >= 30 THEN 'WIDE_COVERAGE'
                WHEN distinct_orgs >= 10 THEN 'MULTI_ORG_COVERAGE'
                ELSE 'LIMITED_COVERAGE' END AS caller_coverage,
           CASE WHEN last_request_at >= TIMESTAMP '2024-02-01 00:00:00' - INTERVAL 6 HOUR THEN 'CURRENT'
                WHEN last_request_at >= TIMESTAMP '2024-02-01 00:00:00' - INTERVAL 24 HOUR THEN 'RECENT'
                WHEN last_request_at >= TIMESTAMP '2024-02-01 00:00:00' - INTERVAL 48 HOUR THEN 'STALE'
                ELSE 'OUTDATED' END AS endpoint_freshness,
           CASE WHEN total_requests = 0 THEN 'DATA_MISSING'
                WHEN recent_requests = 0 THEN 'NO_RECENT_ACTIVITY'
                ELSE 'OPERATIONAL' END AS compliance_status,
           last_request_at,
           TIMESTAMP '2024-02-01 00:00:00' AS performance_check_timestamp
    FROM agg
    """,
)
def a28_api_performance(spark, sf_dir):
    from ..metrics import api_performance

    return api_performance(_request_log(spark, sf_dir))


# ---------------------------------------------------------------------------
# retrieval: BM25 full-text top-k — the lexical-retrieval baseline next to
# the embedding ANN family (sim_*): every RAG / curation pipeline needs
# both. Query = a fixed bag of terms mixing common ('hash', 'join',
# 'spark') and rare ('dup', df≈5%) so idf does real ranking work on the
# fixture. Per-doc score is an ORDERED fold over term-sorted contributions
# (the a24/BPE fold-equivalence pattern), so the Spark hash-agg hash-matches
# DuckDB exactly despite float summation.
# ---------------------------------------------------------------------------
@query(
    "rag_bm25_topk",
    f"""
    WITH toks AS (SELECT doc_id, UNNEST({_TOKS_SQL}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
    q AS (SELECT UNNEST(['hash', 'join', 'spark', 'dup']) AS term),
    matched AS (SELECT tf.* FROM tf JOIN q USING (term)),
    dfreq AS (SELECT term, COUNT(*) AS df FROM matched GROUP BY term),
    contrib AS (
      SELECT m.doc_id, m.term,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * m.tf * (1.2 + 1.0)
               / (m.tf + 1.2 * (0.25 + 0.75 * l.dl / (s.sum_dl * 1.0 / s.n_docs))) AS c
      FROM matched m JOIN dfreq d USING (term) JOIN dl l USING (doc_id)
      CROSS JOIN stats s),
    scored AS (
      SELECT doc_id,
             ROUND(list_reduce(
               list_transform(list_sort(list(struct_pack(term := term, c := c))), x -> x.c),
               (a, b) -> a + b), 6) AS score,
             CAST(COUNT(*) AS INT) AS n_terms_matched
      FROM contrib GROUP BY doc_id)
    SELECT doc_id, score, n_terms_matched,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 10
    """,
)
def rag_bm25_topk(spark, sf_dir):
    from ..llmdata.text import bm25_topk

    d = t(spark, sf_dir, "documents")
    return bm25_topk(d, ["hash", "join", "spark", "dup"], k=10)


# ---------------------------------------------------------------------------
# dedup: DIRECTED containment (near-subset) pairs — the asymmetric twin of
# dd_jaccard_pairs: catches quotes / partial copies / doc-inside-doc where
# the container is much larger (jaccard → 0 while |A∩B|/|A| stays high).
# Engine side: asymmetric prefix filter (rarest-first prefix probes a FULL
# shingle index) + row-local exact verify; oracle: all-pairs shared-shingle
# join, trigram shingles, same normalization as dd_jaccard_pairs.
# ---------------------------------------------------------------------------
@query(
    "dd_containment",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    sh AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, greatest(len(tk) - 1, 2)),
                       i -> array_to_string(tk[i:i+2], ' ')))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS contained_id, b.doc_id AS container_id, COUNT(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
      GROUP BY 1, 2)
    SELECT c.contained_id, c.container_id,
           ROUND(c.common * 1.0 / sa.set_size, 6) AS containment
    FROM common c JOIN sizes sa ON c.contained_id = sa.doc_id
    WHERE c.common * 1.0 / sa.set_size >= 0.5
    """,
)
def dd_containment(spark, sf_dir):
    from ..llmdata.dedup import containment_pairs

    d = t(spark, sf_dir, "documents", restore=True)
    return containment_pairs(d, n=3, threshold=0.5)


# ---------------------------------------------------------------------------
# retrieval: MMR diversity re-rank — the stage after any retrieval
# shortlist (BM25 / ANN): greedy k-selection maximizing
# lam*rel - (1-lam)*max-sim-to-selected (Carbonell & Goldstein SIGIR'98).
# Engine side unrolls the k greedy steps into the plan over the BOUNDED
# shortlist; the oracle unrolls the same 5 argmax steps as chained CTEs.
# Scores round in the integer domain before every argmax (engine-exact).
# ---------------------------------------------------------------------------
def _MMR_ORACLE():
    head = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    rel0 AS (
      SELECT e.vec_id AS cid,
             ROUND(list_dot_product(q.qv, e.v) /
                   (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6) AS rel
      FROM e, q WHERE e.vec_id != 0),
    short AS (SELECT cid, rel FROM rel0 ORDER BY rel DESC, cid LIMIT 20),
    sims AS (
      SELECT a.cid AS ia, b.cid AS ib,
             ROUND(list_dot_product(ea.v, eb.v) /
                   (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6) AS sim
      FROM short a JOIN short b ON a.cid != b.cid
      JOIN e ea ON ea.vec_id = a.cid JOIN e eb ON eb.vec_id = b.cid),
    w1 AS (SELECT cid, 1 AS mmr_rank, rel,
                  ROUND(0.7 * rel * 1000000.0) / 1000000.0 AS mmr_score
           FROM short
           ORDER BY ROUND(0.7 * rel * 1000000.0) / 1000000.0 DESC, cid LIMIT 1)
    """
    steps = []
    for i in range(2, 6):
        prev = " UNION ALL ".join(f"SELECT cid FROM w{j}" for j in range(1, i))
        steps.append(f""",
    s{i} AS (
      SELECT sh.cid, sh.rel,
             ROUND((0.7 * sh.rel - 0.3 * COALESCE(ms.msim, 0.0)) * 1000000.0) / 1000000.0 AS mmr_score
      FROM short sh
      LEFT JOIN (SELECT ia, MAX(sim) AS msim FROM sims
                 WHERE ib IN ({prev}) GROUP BY ia) ms ON ms.ia = sh.cid
      WHERE sh.cid NOT IN ({prev})),
    w{i} AS (SELECT cid, {i} AS mmr_rank, rel, mmr_score FROM s{i}
             ORDER BY mmr_score DESC, cid LIMIT 1)""")
    tail = """
    SELECT cid AS selected_id, CAST(mmr_rank AS INT) AS mmr_rank, rel, mmr_score
    FROM (SELECT * FROM w1 UNION ALL SELECT * FROM w2 UNION ALL SELECT * FROM w3
          UNION ALL SELECT * FROM w4 UNION ALL SELECT * FROM w5)
    """
    return head + "".join(steps) + tail


@query("rag_mmr_rerank", _MMR_ORACLE())
def rag_mmr_rerank(spark, sf_dir):
    from ..llmdata.similarity import brute_force_cosine_topk, mmr_rerank

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0)
    shortlist = brute_force_cosine_topk(q, e, k=20)
    return mmr_rerank(shortlist, e, k=5, lam=0.7)


# ---------------------------------------------------------------------------
# retrieval: Reciprocal Rank Fusion — the hybrid-retrieval combiner that
# merges the lexical BM25 top-N and the dense cosine top-N by rank alone
# (Cormack SIGIR'09), no score calibration. Both input lists reuse this
# file's oracle-proven rankers (rag_bm25_topk CTEs at k=20, sim_cosine_topk
# CTEs for query vec 0 at k=20); the fused score is the fixed-order
# two-term sum 1/(60+r_bm25) + 1/(60+r_dense) — IEEE-exact in both engines.
# ---------------------------------------------------------------------------
@query(
    "rag_rrf_fusion",
    f"""
    WITH toks AS (SELECT doc_id, UNNEST({_TOKS_SQL}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
    q AS (SELECT UNNEST(['hash', 'join', 'spark', 'dup']) AS term),
    matched AS (SELECT tf.* FROM tf JOIN q USING (term)),
    dfreq AS (SELECT term, COUNT(*) AS df FROM matched GROUP BY term),
    contrib AS (
      SELECT m.doc_id, m.term,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * m.tf * (1.2 + 1.0)
               / (m.tf + 1.2 * (0.25 + 0.75 * l.dl / (s.sum_dl * 1.0 / s.n_docs))) AS c
      FROM matched m JOIN dfreq d USING (term) JOIN dl l USING (doc_id)
      CROSS JOIN stats s),
    bscored AS (
      SELECT doc_id,
             ROUND(list_reduce(
               list_transform(list_sort(list(struct_pack(term := term, c := c))), x -> x.c),
               (a, b) -> a + b), 6) AS score
      FROM contrib GROUP BY doc_id),
    lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank_bm25
      FROM bscored QUALIFY rank_bm25 <= 20),
    ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    qv AS (SELECT v AS q FROM ev WHERE vec_id = 0),
    dscore AS (
      SELECT ev.vec_id AS doc_id,
             ROUND(list_dot_product(qv.q, ev.v) /
                   (sqrt(list_dot_product(qv.q, qv.q)) * sqrt(list_dot_product(ev.v, ev.v))), 6) AS cosine
      FROM ev, qv WHERE ev.vec_id != 0),
    dense AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS INT) AS rank_dense
      FROM dscore QUALIFY rank_dense <= 20),
    fused AS (
      SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
             lex.rank_bm25, dense.rank_dense,
             ROUND(COALESCE(1.0 / (60 + lex.rank_bm25), 0.0)
                   + COALESCE(1.0 / (60 + dense.rank_dense), 0.0), 6) AS rrf_score
      FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id)
    SELECT doc_id, rank_bm25, rank_dense, rrf_score,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS INT) AS fused_rank
    FROM fused
    QUALIFY fused_rank <= 10
    """,
)
def rag_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval via Reciprocal Rank Fusion (`llmdata/similarity.py:
    rrf_fuse`): BM25 lexical top-20 and dense cosine top-20 (query = vec 0)
    fused by 1/(60+rank) sums. Both retrievers are the repo's oracle-proven
    rankers; the fusion layer itself touches only their bounded top-N
    outputs, so the joins and the final window are metadata-rate."""
    from ..llmdata.similarity import brute_force_cosine_topk, rrf_fuse
    from ..llmdata.text import bm25_topk

    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")
    lex = bm25_topk(d, ["hash", "join", "spark", "dup"], k=20).select(
        "doc_id", "rank"
    )
    dense = brute_force_cosine_topk(
        e.filter(F.col("vec_id") == 0), e, k=20
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([("bm25", lex), ("dense", dense)], k=10, rrf_k=60)


# ---------------------------------------------------------------------------
# time series: Holt double exponential smoothing (level+trend, trend-aware
# EWMA sibling) — the two-component recurrence folds with a string-encoded
# accumulator "l|b" (the BPE-fold trick: cross-engine fold acc type must
# equal the element type; shortest-repr double<->string round-trips exactly
# in both engines). Oracle replays the identical fold in DuckDB.
# ---------------------------------------------------------------------------
@query(
    "ts_holt_forecast",
    """
    WITH ordered AS (
      SELECT event_type,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals,
             COUNT(value) AS n_obs
      FROM events GROUP BY event_type),
    folded AS (
      SELECT event_type, n_obs,
             string_split(list_reduce(
               list_prepend(CAST(vals[1] AS VARCHAR) || '|0.0',
                            list_transform(vals[2:], x -> CAST(x AS VARCHAR))),
               (acc, x) -> CAST(
                   (0.3 * CAST(x AS DOUBLE)
                    + 0.7 * (CAST(string_split(acc, '|')[1] AS DOUBLE)
                             + CAST(string_split(acc, '|')[2] AS DOUBLE))) AS VARCHAR)
                 || '|' || CAST(
                   (0.1 * ((0.3 * CAST(x AS DOUBLE)
                            + 0.7 * (CAST(string_split(acc, '|')[1] AS DOUBLE)
                                     + CAST(string_split(acc, '|')[2] AS DOUBLE)))
                           - CAST(string_split(acc, '|')[1] AS DOUBLE))
                    + 0.9 * CAST(string_split(acc, '|')[2] AS DOUBLE)) AS VARCHAR)
             ), '|') AS st
      FROM ordered)
    SELECT event_type, CAST(n_obs AS BIGINT) AS n_obs,
           ROUND(CAST(st[1] AS DOUBLE) * 1000000.0) / 1000000.0 AS level,
           ROUND(CAST(st[2] AS DOUBLE) * 1000000.0) / 1000000.0 AS trend,
           ROUND((CAST(st[1] AS DOUBLE) + CAST(st[2] AS DOUBLE)) * 1000000.0) / 1000000.0
             AS forecast_1
    FROM folded
    """,
)
def ts_holt_forecast(spark, sf_dir):
    from ..operators.windows import grouped_holt

    e = t(spark, sf_dir, "events")
    return grouped_holt(
        e, "value", ["event_type"], [F.col("ts"), F.col("event_id")],
        alpha=0.3, beta=0.1,
    ).select(
        "event_type", F.col("n_obs").cast("bigint").alias("n_obs"),
        "level", "trend", "forecast_1",
    )


# ---------------------------------------------------------------------------
# dedup: URL/host-canonicalized document dedup (CCNet/RefinedWeb-style crawl
# dedup — the same page arrives as http/https, ±www., trailing slash,
# tracking params, fragments; dedup keys on the canonical URL BEFORE any
# text comparison). The fixture carries no URL column, so one is synthesized
# deterministically from (source, doc_id) with all the mess classes the
# canonicalizer must collapse; the oracle mirrors both the synthesis and the
# canonicalization (regexp + list ops) step for step.
# ---------------------------------------------------------------------------
@query(
    "dd_url_dedup",
    r"""
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'http://' ELSE 'https://' END ||
             CASE WHEN doc_id % 3 = 0 THEN 'WWW.' WHEN doc_id % 3 = 1 THEN 'www.' ELSE '' END ||
             source || '.Example.com' ||
             CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END ||
             '/docs/' || CAST(doc_id % 40 AS VARCHAR) ||
             CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
             CASE doc_id % 4 WHEN 0 THEN '?utm_source=feed&ref='
                             WHEN 3 THEN '?fbclid=ab12&ref='
                             ELSE '?ref=' END || CAST(doc_id % 3 AS VARCHAR) ||
             CASE WHEN doc_id % 4 = 2 THEN '&utm_campaign=x' ELSE '' END ||
             CASE WHEN doc_id % 2 = 0 THEN '&z=1' ELSE '' END ||
             CASE WHEN doc_id % 7 = 0 THEN '#sec-2' ELSE '' END AS url
      FROM documents),
    c1 AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                            '#.*$', '') AS x
      FROM raw),
    c2 AS (
      SELECT doc_id,
             regexp_extract(x, '^([^?]*)', 1) AS hostpath,
             CASE WHEN x LIKE '%?%' THEN regexp_extract(x, '\?(.*)$', 1) ELSE '' END AS q
      FROM c1),
    c3 AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(
                 lower(regexp_extract(hostpath, '^([^/]*)', 1)),
                 '^www\.', ''), ':(80|443)$', '') AS host,
             regexp_replace(regexp_replace(hostpath, '^[^/]*', ''), '/+$', '') AS path,
             list_sort(list_filter(string_split(q, '&'),
                 p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)=')))
               AS params
      FROM c2),
    canon AS (
      SELECT doc_id,
             host || path ||
             CASE WHEN len(params) = 0 THEN ''
                  ELSE '?' || array_to_string(params, '&') END AS canonical_url
      FROM c3)
    SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS keep_doc_id
    FROM canon GROUP BY canonical_url
    """,
)
def dd_url_dedup(spark, sf_dir):
    from ..llmdata.dedup import url_dedup_groups

    d = t(spark, sf_dir, "documents")
    m = lambda k: F.col("doc_id") % k
    url = F.concat(
        F.when(m(2) == 0, F.lit("http://")).otherwise(F.lit("https://")),
        F.when(m(3) == 0, F.lit("WWW."))
        .when(m(3) == 1, F.lit("www."))
        .otherwise(F.lit("")),
        F.col("source"),
        F.lit(".Example.com"),
        F.when(m(5) == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/docs/"),
        m(40).cast("string"),
        F.when(m(4) == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(m(4) == 0, F.lit("?utm_source=feed&ref="))
        .when(m(4) == 3, F.lit("?fbclid=ab12&ref="))
        .otherwise(F.lit("?ref=")),
        m(3).cast("string"),
        F.when(m(4) == 2, F.lit("&utm_campaign=x")).otherwise(F.lit("")),
        F.when(m(2) == 0, F.lit("&z=1")).otherwise(F.lit("")),
        F.when(m(7) == 0, F.lit("#sec-2")).otherwise(F.lit("")),
    )
    return url_dedup_groups(d.select("doc_id", url.alias("url")))


# ---------------------------------------------------------------------------
# dedup: exact substring dedup at chunk granularity (suffix-array-free
# ExactSubstr variant, Lee et al. 2022 family — rounds out dd_dup_spans,
# which FINDS repeated n-gram spans, by actually REMOVING repeated
# 20-token chunks corpus-wide, keeping each chunk's first occurrence).
# ---------------------------------------------------------------------------
@query(
    "dd_substring_dedup",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    c AS (
      SELECT doc_id, CAST(i AS INT) AS chunk_idx,
             array_to_string(toks[(i*20+1):((i+1)*20)], ' ') AS chunk
      FROM t, UNNEST(range(CAST(ceil(len(toks) / 20.0) AS BIGINT))) AS u(i)),
    r AS (
      SELECT doc_id, chunk_idx, chunk,
             ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn
      FROM c)
    SELECT doc_id,
           CAST(COUNT(*) AS INT) AS n_chunks,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS INT) AS n_dup_chunks,
           COALESCE(array_to_string(list(chunk ORDER BY chunk_idx)
                                    FILTER (WHERE rn = 1), ' '), '') AS dedup_text
    FROM r GROUP BY doc_id
    """,
)
def dd_substring_dedup(spark, sf_dir):
    from ..llmdata.dedup import substring_dedup_chunks

    d = t(spark, sf_dir, "documents", restore=True)
    return substring_dedup_chunks(d, chunk_tokens=20)


# ---------------------------------------------------------------------------
# ML evaluation: AUC / lift / calibration over a fixed linear scorer on the
# daily feature frame (completes the train half of ml_logreg_gd with the
# offline-eval surface any scored pipeline ships alongside training —
# reference's ml_ops.py stops at a single train/test accuracy print).
# ---------------------------------------------------------------------------
_SCORED_CTE = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)/COUNT(*) * 1000000.0) / 1000000.0 AS mv
      FROM events GROUP BY 1, 2),
    feat AS (
      SELECT ROUND(LN(1.0 + cnt), 8) AS x1, ROUND(mv / 100.0, 8) AS x2,
             CASE WHEN LEAD(cnt) OVER (PARTITION BY event_type ORDER BY d) > cnt
                  THEN 1.0 ELSE 0.0 END AS y,
             LEAD(cnt) OVER (PARTITION BY event_type ORDER BY d) AS nxt
      FROM daily),
    scored AS (
      SELECT ROUND(1.0 / (1.0 + EXP(-(-1.0 + 0.4 * x1 + 0.3 * x2))), 6) AS score,
             x1, x2, y
      FROM feat WHERE nxt IS NOT NULL)"""


@query(
    "ml_auc_ranksum",
    _SCORED_CTE
    + """,
    per AS (
      SELECT score,
             CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS neg
      FROM scored GROUP BY score),
    cum AS (
      SELECT pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM per),
    tot AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS n_pos, CAST(SUM(neg) AS BIGINT) AS n_neg,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
             CAST(SUM(pos * (2 * below + neg)) AS BIGINT) AS u2
      FROM cum)
    SELECT n_pos, n_neg, n_distinct_scores,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN ROUND(u2 * 1.0 / (2.0 * n_pos * n_neg), 6) END AS auc
    FROM tot
    """,
)
def ml_auc_ranksum(spark, sf_dir):
    """Exact Mann-Whitney AUC of a fixed linear scorer on the logreg
    feature frame: corpus-rate work is ONE hash-agg to per-distinct-score
    (pos, neg) counts; the cumulative window runs on that score-band
    frame (≤1e6+1 rows by the 6-dp rounding), and concordance accumulates
    as an integer (2·U) so partial-agg order cannot move the result."""
    from ..ml.evaluate import roc_auc, score_linear
    from ..ml.logreg import daily_count_features

    e = t(spark, sf_dir, "events")
    return roc_auc(score_linear(daily_count_features(e)))


@query(
    "ml_lift_deciles",
    _SCORED_CTE
    + """,
    ranked AS (
      SELECT score, y,
             NTILE(10) OVER (ORDER BY score DESC, x1, x2, y) AS bucket
      FROM scored),
    per AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
      FROM ranked GROUP BY bucket),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(SUM(n_pos) AS BIGINT) AS p FROM per)
    SELECT bucket, n, n_pos,
           ROUND(n_pos * 1.0 / n, 6) AS hit_rate,
           ROUND((n_pos * total * 1.0) / (n * p), 6) AS lift,
           ROUND(SUM(n_pos) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1.0 / p, 6) AS cum_capture
    FROM per CROSS JOIN tot
    ORDER BY bucket
    """,
)
def ml_lift_deciles(spark, sf_dir):
    """Gains/lift table by score decile: NTILE over (score DESC, feature
    tuple, label) so bucket boundaries are engine-deterministic under
    score ties; per-bucket hit rate, lift vs base rate, and cumulative
    positive capture, all in the oracle's operand order."""
    from ..ml.evaluate import lift_table, score_linear
    from ..ml.logreg import daily_count_features

    e = t(spark, sf_dir, "events")
    return lift_table(score_linear(daily_count_features(e)))


@query(
    "ml_calibration_bins",
    _SCORED_CTE
    + """,
    per AS (
      SELECT LEAST(CAST(FLOOR(score * 10) AS INT), 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_pred,
             ROUND(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS pos_rate
      FROM scored GROUP BY 1)
    SELECT bin, n, avg_pred, pos_rate,
           ROUND(ABS(avg_pred - pos_rate), 6) AS calib_gap
    FROM per ORDER BY bin
    """,
)
def ml_calibration_bins(spark, sf_dir):
    """Reliability-diagram bins for the fixed scorer: fixed-width
    probability buckets via pure groupBy (no window anywhere — corpus-
    scale unchanged), mean 6-dp prediction summed in exact DECIMAL vs the
    observed positive rate, plus the absolute calibration gap."""
    from ..ml.evaluate import calibration_bins, score_linear
    from ..ml.logreg import daily_count_features

    e = t(spark, sf_dir, "events")
    return calibration_bins(score_linear(daily_count_features(e)))


# ---------------------------------------------------------------------------
# LM analysis: Zipf-law fit over the top-500 vocabulary — ln(cf) vs
# ln(rank) closed-form OLS (llmdata/text.py:zipf_fit). A healthy natural
# corpus fits slope ≈ -1 with high r²; boilerplate-heavy crawls don't.
# ---------------------------------------------------------------------------
@query(
    "lm_zipf_slope",
    f"""
    WITH toks AS (SELECT UNNEST({_TOKS_SQL}) AS term FROM documents),
    vocab AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cf FROM toks GROUP BY term),
    top AS (SELECT term, cf, ROW_NUMBER() OVER (ORDER BY cf DESC, term) AS rnk
            FROM vocab ORDER BY cf DESC, term LIMIT 500),
    xy AS (SELECT ROUND(LN(CAST(rnk AS DOUBLE)), 8) AS x,
                  ROUND(LN(CAST(cf AS DOUBLE)), 8) AS y
           FROM top),
    s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(y AS DECIMAL(28,8))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(ROUND(x * y, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(ROUND(x * x, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(ROUND(y * y, 8) AS DECIMAL(28,8))) AS DOUBLE) AS syy
          FROM xy)
    SELECT n AS n_terms,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s
    """,
)
def lm_zipf_slope(spark, sf_dir):
    from ..llmdata.text import zipf_fit

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("term")
    )
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("cf"))
    return zipf_fit(vocab, top_n=500)


# ---------------------------------------------------------------------------
# text: per-document lexical diversity — type-token ratio + hapax share,
# the statistical-diversity quality signals next to tx_quality's surface
# heuristics (low TTR ⇒ boilerplate/template text; high hapax share on a
# long doc ⇒ OCR noise or mojibake).
# ---------------------------------------------------------------------------
@query(
    "tx_lexical_diversity",
    f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({_TOKS_SQL}) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, term)
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ROUND(COUNT(*) * 1.0 / SUM(tf), 6) AS ttr,
           ROUND(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS hapax_share
    FROM tf GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def tx_lexical_diversity(spark, sf_dir):
    """Two hash-aggs over the exploded token stream (map-side combined;
    the (doc, term) grain is the same frame TF-IDF builds), everything
    else integer arithmetic with single 6-dp ratio divisions — no window,
    no UDF, corpus-scale unchanged."""
    d = t(spark, sf_dir, "documents", restore=True)
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    return (
        tf.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("tf") == 1, F.lit(1)).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("n_hapax"),
            F.round(F.count(F.lit(1)) * 1.0 / F.sum("tf"), 6).alias("ttr"),
            F.round(
                F.sum(F.when(F.col("tf") == 1, F.lit(1)).otherwise(F.lit(0)))
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("hapax_share"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# T2 companion — sliding 1h/15m window counts (batch twin of the streaming
# hopping-window aggregate; tumbling is st_tumbling_1h). Each event expands
# into window/slide = 4 rows before the map-side combine.
# ---------------------------------------------------------------------------
@query(
    "st_sliding_1h_15m",
    """
    SELECT ws AS window_start, ws + INTERVAL '1 hour' AS window_end,
           event_type, CAST(COUNT(*) AS BIGINT) AS event_count
    FROM (
      SELECT event_type, ts,
             time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes') AS ws
      FROM events, UNNEST([0, 1, 2, 3]) AS u(k))
    WHERE ts < ws + INTERVAL '1 hour'
    GROUP BY 1, 2, 3
    """,
)
def st_sliding_1h_15m(spark, sf_dir):
    from ..streaming.windows import sliding_window_counts

    return sliding_window_counts(
        t(spark, sf_dir, "events"), "ts", "1 hour", "15 minutes",
        ["event_type"], watermark=None,
    )


# ---------------------------------------------------------------------------
# ML: Weight of Evidence + Information Value of event_type against the
# next-day-up label (ml/evaluate.py:woe_iv) — the categorical-relevance
# pre-screen next to the AUC/lift/calibration eval surface.
# ---------------------------------------------------------------------------
@query(
    "ml_woe_iv",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2),
    feat AS (
      SELECT event_type,
             CASE WHEN LEAD(cnt) OVER (PARTITION BY event_type ORDER BY d) > cnt
                  THEN 1.0 ELSE 0.0 END AS y,
             LEAD(cnt) OVER (PARTITION BY event_type ORDER BY d) AS nxt
      FROM daily),
    f AS (SELECT event_type, y FROM feat WHERE nxt IS NOT NULL),
    per AS (
      SELECT event_type AS category,
             CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
      FROM f GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS p, CAST(SUM(n_neg) AS BIGINT) AS n FROM per),
    j AS (
      SELECT category, n_pos, n_neg,
             CASE WHEN n_pos > 0 AND n_neg > 0
                  THEN LN((n_pos * 1.0 / tot.p) / (n_neg * 1.0 / tot.n)) END AS woe_raw,
             ROUND((n_pos * 1.0 / tot.p - n_neg * 1.0 / tot.n)
                   * (CASE WHEN n_pos > 0 AND n_neg > 0
                           THEN LN((n_pos * 1.0 / tot.p) / (n_neg * 1.0 / tot.n)) END),
                   8) AS contrib
      FROM per CROSS JOIN tot)
    SELECT category, n_pos, n_neg,
           ROUND(woe_raw, 6) AS woe,
           ROUND(CAST((SELECT SUM(CAST(contrib AS DECIMAL(28,8))) FROM j) AS DOUBLE), 6) AS iv
    FROM j ORDER BY category
    """,
)
def ml_woe_iv(spark, sf_dir):
    from pyspark.sql import Window

    from ..ml.evaluate import woe_iv

    e = t(spark, sf_dir, "events")
    # daily_count_features drops the type column, so rebuild the
    # (event_type, y) frame at daily grain with the type kept
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("d")
    f = (
        daily.withColumn("nxt", F.lead("cnt").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            "event_type",
            F.when(F.col("nxt") > F.col("cnt"), F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
        )
    )
    return woe_iv(f, "event_type")


# ---------------------------------------------------------------------------
# ML: exact average precision (PR-AUC, step interpolation) of the fixed
# linear scorer — integer-domain companion to ml_auc_ranksum
# (ml/evaluate.py:average_precision): every per-threshold term is a
# bigint floor division, so no float association can move the sum.
# ---------------------------------------------------------------------------
@query(
    "ml_pr_auc",
    _SCORED_CTE
    + """,
    per AS (
      SELECT score,
             CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS neg
      FROM scored GROUP BY score),
    cum AS (
      SELECT pos,
             SUM(pos) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
             SUM(pos + neg) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
      FROM per),
    tot AS (
      SELECT CAST(MAX(cum_pos) AS BIGINT) AS n_pos,
             CAST(MAX(cum_n - cum_pos) AS BIGINT) AS n_neg,
             CAST(SUM((pos * cum_pos * CAST(1000000000000 AS BIGINT)) // cum_n)
                  AS BIGINT) AS s
      FROM cum)
    SELECT n_pos, n_neg,
           CASE WHEN n_pos > 0
                THEN (s // (n_pos * CAST(1000000 AS BIGINT))) / 1000000.0
           END AS avg_precision
    FROM tot
    """,
)
def ml_pr_auc(spark, sf_dir):
    """Average precision of the fixed linear scorer on the daily feature
    frame: one corpus-rate hash-agg to per-distinct-score counts, a
    cumulative window over the score-band frame, per-threshold terms as
    bigint floor divisions (``pos·cum_pos·1e12 div cum_n``) summed
    exactly, and a final floor-to-ppm — bit-identical in any engine."""
    from ..ml.evaluate import average_precision, score_linear
    from ..ml.logreg import daily_count_features

    e = t(spark, sf_dir, "events")
    return average_precision(score_linear(daily_count_features(e)))


# ---------------------------------------------------------------------------
# Text: Flesch reading-ease proxy per document (llmdata/text.py:
# flesch_reading_ease) — the readability axis of the quality surface
# next to tx_quality/tx_gopher_rules; vowel-group syllable approximation,
# zero UDF, one scan.
# ---------------------------------------------------------------------------
@query(
    "tx_readability",
    f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN LENGTH({_NORM_SQL}) = 0 THEN 0
                  ELSE len(string_split({_NORM_SQL}, ' ')) END AS words,
             GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sentences,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syllables
      FROM documents)
    SELECT doc_id, CAST(words AS INT) AS words,
           CAST(sentences AS INT) AS sentences,
           CAST(syllables AS INT) AS syllables,
           CASE WHEN words > 0
                THEN 206.835 - 1.015 * (CAST(words AS DOUBLE) / sentences)
                     - 84.6 * (CAST(syllables AS DOUBLE) / words)
           END AS flesch
    FROM base ORDER BY doc_id
    """,
)
def tx_readability(spark, sf_dir):
    """Per-doc Flesch reading ease: integer word/sentence/vowel-group
    counts via codegen regex, one fixed IEEE expression — map-only, no
    shuffle beyond the final presentation sort."""
    from ..llmdata.text import flesch_reading_ease, token_count

    d = t(spark, sf_dir, "documents", restore=True)
    c = F.col("text")
    return d.select(
        "doc_id",
        token_count("text").cast("int").alias("words"),
        F.greatest(
            F.size(F.regexp_extract_all(c, F.lit(r"([.!?]+)"), 1)), F.lit(1)
        ).cast("int").alias("sentences"),
        F.size(F.regexp_extract_all(F.lower(c), F.lit(r"([aeiouy]+)"), 1))
        .cast("int")
        .alias("syllables"),
        flesch_reading_ease("text").alias("flesch"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# retrieval: NDCG@10 of the BM25 ranking against a term-coverage relevance
# label (rel = distinct query terms present in the doc). The position
# discounts 1/log2(rank+1) are baked in as exact ppb-integer LITERALS
# (rank ≤ 10 ⇒ ten constants), so both discounted sums are exact bigints
# — no transcendental evaluation can diverge between engines (Java
# Math.log and C libm differ by 1 ulp at ln 3, measured on this fixture).
# ---------------------------------------------------------------------------
#: round(1e9 * ln2/ln(k+1)) for k = 1..10 — the NDCG discount ladder.
_NDCG_W_PPB = [
    1000000000, 630929754, 500000000, 430676558, 386852807,
    356207187, 333333333, 315464877, 301029996, 289064826,
]


@query(
    "rag_ndcg",
    f"""
    WITH toks AS (SELECT doc_id, UNNEST({_TOKS_SQL}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
    q AS (SELECT UNNEST(['hash', 'join', 'spark', 'dup']) AS term),
    matched AS (SELECT tf.* FROM tf JOIN q USING (term)),
    dfreq AS (SELECT term, COUNT(*) AS df FROM matched GROUP BY term),
    contrib AS (
      SELECT m.doc_id, m.term,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * m.tf * (1.2 + 1.0)
               / (m.tf + 1.2 * (0.25 + 0.75 * l.dl / (s.sum_dl * 1.0 / s.n_docs))) AS c
      FROM matched m JOIN dfreq d USING (term) JOIN dl l USING (doc_id)
      CROSS JOIN stats s),
    scored AS (
      SELECT doc_id,
             ROUND(list_reduce(
               list_transform(list_sort(list(struct_pack(term := term, c := c))), x -> x.c),
               (a, b) -> a + b), 6) AS score,
             CAST(COUNT(*) AS BIGINT) AS rel
      FROM contrib GROUP BY doc_id),
    w(rnk, ppb) AS (VALUES {", ".join(f"({i + 1}, {v})" for i, v in enumerate(_NDCG_W_PPB))}),
    topk AS (
      SELECT doc_id, rel,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
      FROM scored QUALIFY rnk <= 10),
    dcg AS (
      SELECT CAST(SUM(t.rel * w.ppb) AS BIGINT) AS v,
             CAST(SUM(t.rel) AS BIGINT) AS rel_in_topk
      FROM topk t JOIN w ON w.rnk = t.rnk),
    ideal AS (
      SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rnk
      FROM scored QUALIFY rnk <= 10),
    idcg AS (
      SELECT CAST(SUM(i.rel * w.ppb) AS BIGINT) AS v
      FROM ideal i JOIN w ON w.rnk = i.rnk)
    SELECT dcg.v AS dcg_ppb, idcg.v AS idcg_ppb,
           CAST(dcg.v AS DOUBLE) / idcg.v AS ndcg_at_10, dcg.rel_in_topk
    FROM dcg CROSS JOIN idcg
    """,
)
def rag_ndcg(spark, sf_dir):
    """NDCG@10 of BM25: the ranking comes from the oracle-proven
    bm25_topk operator (WindowGroupLimit-bounded top-10); relevance is
    ranker-independent (distinct query terms per doc), and its ideal
    top-10 is likewise a rank-filtered window. Discounted gains are
    Σ rel·w_ppb in exact bigint (w = the ppb discount ladder above);
    the only float op is the final NDCG division."""
    from pyspark.sql import Window

    from ..llmdata.text import _norm, bm25_topk

    d = t(spark, sf_dir, "documents")
    terms = ["hash", "join", "spark", "dup"]
    w_arr = F.array(*[F.lit(v).cast("bigint") for v in _NDCG_W_PPB])
    topk = bm25_topk(d, terms, k=10).select(
        F.col("n_terms_matched").cast("bigint").alias("rel"),
        F.col("rank").alias("rnk"),
    )
    rel_all = (
        d.select("doc_id", F.explode(F.split(_norm("text"), " ")).alias("term"))
        .filter(F.col("term").isin(terms))
        .select("doc_id", "term")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rel"))
    )
    gain = lambda df: F.sum(  # noqa: E731
        F.col("rel") * F.element_at(w_arr, F.col("rnk").cast("int"))
    ).cast("bigint")
    dcg = topk.agg(
        gain(topk).alias("dcg_ppb"),
        F.sum("rel").cast("bigint").alias("rel_in_topk"),
    )
    ideal = rel_all.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.desc("rel"), F.asc("doc_id"))),
    ).filter(F.col("rnk") <= 10)
    idcg = ideal.agg(gain(ideal).alias("idcg_ppb"))
    return dcg.crossJoin(F.broadcast(idcg)).select(
        "dcg_ppb",
        "idcg_ppb",
        (F.col("dcg_ppb").cast("double") / F.col("idcg_ppb")).alias("ndcg_at_10"),
        "rel_in_topk",
    )


# ---------------------------------------------------------------------------
# ML: confusion matrix + precision/recall/F1 at a threshold ladder over
# the fixed linear scorer — the operating-point companion to the
# threshold-free ml_auc_ranksum/ml_pr_auc. Counts are bigints; each
# emitted metric is ONE integer-ratio division (F1 via 2tp/(2tp+fp+fn)),
# so nothing depends on float association.
# ---------------------------------------------------------------------------
@query(
    "ml_confusion_thresholds",
    _SCORED_CTE
    + """,
    th(threshold) AS (VALUES (0.3), (0.5), (0.7)),
    cm AS (
      SELECT th.threshold,
             CAST(SUM(CASE WHEN score >= th.threshold AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN score >= th.threshold AND y <> 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN score < th.threshold AND y <> 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
             CAST(SUM(CASE WHEN score < th.threshold AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM scored CROSS JOIN th GROUP BY th.threshold)
    SELECT threshold, tp, fp, tn, fn,
           CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END AS prec_at,
           CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall_at,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) END AS f1_at
    FROM cm ORDER BY threshold
    """,
)
def ml_confusion_thresholds(spark, sf_dir):
    """Confusion counts + P/R/F1 at thresholds {0.3, 0.5, 0.7}: the
    scored frame is hit once, the threshold fan-out is an explode over
    three literals (stays in codegen — no join), and the rollup is one
    hash-agg keyed by threshold."""
    from ..ml.evaluate import score_linear
    from ..ml.logreg import daily_count_features

    e = t(spark, sf_dir, "events")
    scored = score_linear(daily_count_features(e))
    fan = scored.withColumn(
        "threshold", F.explode(F.array(F.lit(0.3), F.lit(0.5), F.lit(0.7)))
    )
    hit = F.col("score") >= F.col("threshold")
    pos = F.col("y") == 1.0
    cm = fan.groupBy("threshold").agg(
        F.sum(F.when(hit & pos, 1).otherwise(0)).cast("bigint").alias("tp"),
        F.sum(F.when(hit & ~pos, 1).otherwise(0)).cast("bigint").alias("fp"),
        F.sum(F.when(~hit & ~pos, 1).otherwise(0)).cast("bigint").alias("tn"),
        F.sum(F.when(~hit & pos, 1).otherwise(0)).cast("bigint").alias("fn"),
    )
    return cm.select(
        "threshold",
        "tp",
        "fp",
        "tn",
        "fn",
        F.when(F.col("tp") + F.col("fp") > 0,
               F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))).alias("prec_at"),
        F.when(F.col("tp") + F.col("fn") > 0,
               F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))).alias("recall_at"),
        F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
               (2 * F.col("tp")).cast("double")
               / (2 * F.col("tp") + F.col("fp") + F.col("fn"))).alias("f1_at"),
    ).orderBy("threshold")


# ---------------------------------------------------------------------------
# LM: out-of-vocabulary rate of a held-out split against the training
# split's vocabulary — the train/eval hygiene stat every tokenizer/LM
# pipeline reports (and the cheap leak detector: an implausibly LOW OOV
# rate flags split contamination). Split = doc_id mod 10 (8/2), the same
# hash-split convention as llm_kfold_split.
# ---------------------------------------------------------------------------
@query(
    "lm_oov_rate",
    f"""
    WITH toks AS (
      SELECT doc_id, lang, UNNEST({_TOKS_SQL}) AS term FROM documents),
    vocab AS (
      SELECT DISTINCT term FROM toks WHERE doc_id % 10 < 8),
    held AS (SELECT lang, term FROM toks WHERE doc_id % 10 >= 8),
    flags AS (
      SELECT h.lang, h.term, CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
      FROM held h LEFT JOIN vocab v ON v.term = h.term)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(COUNT(DISTINCT CASE WHEN oov = 1 THEN term END) AS BIGINT) AS n_distinct_oov,
           CAST(SUM(oov) AS DOUBLE) / COUNT(*) AS oov_rate
    FROM flags GROUP BY lang ORDER BY lang
    """,
)
def lm_oov_rate(spark, sf_dir):
    """Held-out OOV per language: train tokens collapse to a distinct
    vocab (hash-agg), held-out tokens left-join it on the term key (AQE
    picks shuffle vs broadcast by vocab size), then one lang-keyed
    rollup; the rate is a single integer-ratio division."""
    from ..llmdata.text import _norm

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split(_norm("text"), " ")).alias("term")
    )
    vocab = (
        toks.filter(F.col("doc_id") % 10 < 8).select("term").distinct()
        .withColumn("__in_vocab", F.lit(1))
    )
    held = toks.filter(F.col("doc_id") % 10 >= 8)
    flags = held.join(vocab, "term", "left").select(
        "lang",
        "term",
        F.when(F.col("__in_vocab").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("oov"),
    )
    return (
        flags.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("oov").cast("bigint").alias("n_oov"),
            F.countDistinct(
                F.when(F.col("oov") == 1, F.col("term"))
            ).cast("bigint").alias("n_distinct_oov"),
            (F.sum("oov").cast("double") / F.count(F.lit(1))).alias("oov_rate"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# llm: weighted priority sampling (Ohlsson sequential Poisson / Duffield-
# Lund-Thorup priority sampling): inclusion priority = u/w with u a
# deterministic md5-derived uniform and w = n_chars, keep the k smallest.
# Longer docs get proportionally higher selection odds — the
# length-weighted corpus draw next to llm_stratified_k's equal-rate one.
# u = (13 md5 hex digits)/2^52 is EXACT in double arithmetic, so the
# ranking is reproducible bit-for-bit in any engine — no RNG state, no
# transcendental keys (pow/ln A-ES keys can flip on 1-ulp libm gaps).
# ---------------------------------------------------------------------------
@query(
    "llm_weighted_sample",
    f"""
    WITH keyed AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
             list_sum(list_transform(
               list_zip(string_split(substring(md5(CAST(doc_id AS VARCHAR)), 1, 13), ''),
                        range(1, 14)),
               p -> (list_position({_HEX}, p[1]) - 1) * power(16, 13 - p[2])))
               / 4503599627370496.0 AS u
      FROM documents),
    pri AS (
      SELECT doc_id, weight, u / weight AS priority FROM keyed)
    SELECT doc_id, weight, priority,
           CAST(ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS INT) AS rank
    FROM pri
    QUALIFY rank <= 50
    """,
)
def llm_weighted_sample(spark, sf_dir):
    """Top-50 priority sample, length-weighted. Map-only key derivation
    (hex fold stays exact: every partial sum < 2^53), then a rank-filter
    window Spark executes as WindowGroupLimit — per-partition partial
    top-k, no global materialized sort."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    hexarr = F.array(*[F.lit(c) for c in "0123456789abcdef"])
    hv = F.aggregate(
        F.slice(F.split(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), ""), 1, 13),
        F.lit(0.0),
        lambda acc, c: acc * 16 + (F.array_position(hexarr, c) - 1),
    )
    pri = d.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("weight"),
        (hv / F.lit(4503599627370496.0) / F.col("n_chars").cast("bigint")).alias("priority"),
    )
    w = Window.orderBy("priority", "doc_id")
    return (
        pri.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 50)
    )


# ---------------------------------------------------------------------------
# text: top collocations — bigrams ranked by PMI. Since ln is monotone,
# the ranking (and the emitted statistic) uses the RAW lift ratio
# p(ab)/(p(a)p(b)) = (c_ab/M)·(N/c_a)·(N/c_b): exact integer counts
# through a fixed-order chain of IEEE divisions — no transcendental, so
# the ordering can never flip on a libm ulp. min-count floor 5.
# ---------------------------------------------------------------------------
@query(
    "tx_collocations",
    f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS tk FROM documents),
    uni AS (SELECT UNNEST(tk) AS w FROM toks),
    ucnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w),
    big AS (
      SELECT UNNEST(list_transform(range(1, len(tk)),
                    i -> tk[i] || ' ' || tk[i + 1])) AS bg
      FROM toks),
    bcnt AS (
      SELECT bg, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM big GROUP BY bg HAVING COUNT(*) >= 5),
    tot AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM uni) AS n_uni,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM big) AS n_big),
    lifted AS (
      SELECT b.bg AS bigram, b.c_ab, ca.c AS c_a, cb.c AS c_b,
             (CAST(b.c_ab AS DOUBLE) / t.n_big)
               * (CAST(t.n_uni AS DOUBLE) / ca.c)
               * (CAST(t.n_uni AS DOUBLE) / cb.c) AS lift
      FROM bcnt b
      JOIN ucnt ca ON ca.w = string_split(b.bg, ' ')[1]
      JOIN ucnt cb ON cb.w = string_split(b.bg, ' ')[2]
      CROSS JOIN tot t)
    SELECT bigram, c_ab, c_a, c_b, lift,
           CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, bigram) AS INT) AS rank
    FROM lifted
    QUALIFY rank <= 20
    """,
)
def tx_collocations(spark, sf_dir):
    """Top-20 bigram collocations by lift. Corpus-rate passes are the
    unigram and bigram hash-aggs (bigrams built with two shifted-slice
    zip_withs, no per-window allocation); the lift join runs on the
    min-count-floored bigram frame against the unigram counts (two
    term-keyed joins AQE can broadcast), and the top-20 is a
    WindowGroupLimit rank filter."""
    from pyspark.sql import Window

    from ..llmdata.text import _norm

    d = t(spark, sf_dir, "documents", restore=True)
    toks = F.split(_norm("text"), " ")
    tk = d.select(toks.alias("tk"))
    uni = tk.select(F.explode("tk").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    out_len = F.greatest(F.size(F.col("tk")) - 1, F.lit(0))
    bg_arr = F.zip_with(
        F.slice(F.col("tk"), 1, out_len),
        F.slice(F.col("tk"), 2, out_len),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    big = tk.select(F.explode(bg_arr).alias("bg"))
    bcnt = (
        big.groupBy("bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_ab"))
        .filter(F.col("c_ab") >= 5)
    )
    tot = uni.agg(F.count(F.lit(1)).cast("bigint").alias("n_uni")).crossJoin(
        big.agg(F.count(F.lit(1)).cast("bigint").alias("n_big"))
    )
    lifted = (
        bcnt.withColumn("a_w", F.split(F.col("bg"), " ").getItem(0))
        .withColumn("b_w", F.split(F.col("bg"), " ").getItem(1))
        .join(ucnt.select(F.col("w").alias("a_w"), F.col("c").alias("c_a")), "a_w")
        .join(ucnt.select(F.col("w").alias("b_w"), F.col("c").alias("c_b")), "b_w")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bg").alias("bigram"),
            "c_ab",
            "c_a",
            "c_b",
            (
                (F.col("c_ab").cast("double") / F.col("n_big"))
                * (F.col("n_uni").cast("double") / F.col("c_a"))
                * (F.col("n_uni").cast("double") / F.col("c_b"))
            ).alias("lift"),
        )
    )
    w = Window.orderBy(F.desc("lift"), F.asc("bigram"))
    return (
        lifted.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
    )


# ---------------------------------------------------------------------------
# text: term burstiness — variance-to-mean ratio (index of dispersion) of
# per-document term counts over the WHOLE corpus (absent docs count as
# zero, which leaves Σx and Σx² untouched — only N enters). Bursty terms
# (VMR >> 1) are topical/content words; VMR ≈ 1 is Poisson background —
# the Church-Gale burstiness signal used for keyword/stopword triage.
# Integer moments; one final division.
# ---------------------------------------------------------------------------
@query(
    "tx_burstiness",
    f"""
    WITH toks AS (SELECT doc_id, UNNEST({_TOKS_SQL}) AS term FROM documents),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
           FROM toks GROUP BY doc_id, term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    m AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(c * c) AS BIGINT) AS scc
      FROM tf GROUP BY term HAVING COUNT(*) >= 10),
    scored AS (
      SELECT term, df, sc AS total_count,
             CAST(n.n_docs * scc - sc * sc AS DOUBLE) / (n.n_docs * sc) AS vmr
      FROM m CROSS JOIN n)
    SELECT term, df, total_count, vmr,
           CAST(ROW_NUMBER() OVER (ORDER BY vmr DESC, term) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 20
    """,
)
def tx_burstiness(spark, sf_dir):
    """Top-20 burstiest terms (highest dispersion of per-doc counts).
    Corpus-rate passes: token explode + (doc, term) hash-agg; the moment
    rollup runs per term with a min-df floor, the 1-row doc count is
    broadcast, and the top-20 is a WindowGroupLimit rank filter."""
    from pyspark.sql import Window

    from ..llmdata.text import _norm

    d = t(spark, sf_dir, "documents", restore=True)
    tf = (
        d.select("doc_id", F.explode(F.split(_norm("text"), " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    m = (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("c").cast("bigint").alias("sc"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("scc"),
        )
        .filter(F.col("df") >= 10)
    )
    scored = m.crossJoin(F.broadcast(n)).select(
        "term",
        "df",
        F.col("sc").alias("total_count"),
        (
            (F.col("n_docs") * F.col("scc") - F.col("sc") * F.col("sc")).cast("double")
            / (F.col("n_docs") * F.col("sc"))
        ).alias("vmr"),
    )
    w = Window.orderBy(F.desc("vmr"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
    )


# ---------------------------------------------------------------------------
# ops: multiwindow SLO burn-rate alerting (the Google-SRE fast+slow
# window policy) over the same request log a27/a28 roll up: page when
# BOTH the 24h and 7d error rates burn the 95%-availability budget
# faster than their thresholds — the fast window catches the spike, the
# slow window suppresses flappy pages. Counts bigint; each rate is one
# division; burn = rate / 0.05 (exact double constant).
# ---------------------------------------------------------------------------
@query(
    "a36_slo_burn",
    f"""
    WITH log AS ({_LOG_SQL}),
    agg AS (
      SELECT endpoint,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-31 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_fast,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-31 00:00:00' AND NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS err_fast,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-25 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS n_slow,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-25 00:00:00' AND NOT ok THEN 1 ELSE 0 END) AS BIGINT) AS err_slow
      FROM log WHERE ts < TIMESTAMP '2024-02-01 00:00:00' GROUP BY endpoint),
    rated AS (
      SELECT endpoint, n_fast, err_fast, n_slow, err_slow,
             CASE WHEN n_fast > 0 THEN CAST(err_fast AS DOUBLE) / n_fast END AS rate_fast,
             CASE WHEN n_slow > 0 THEN CAST(err_slow AS DOUBLE) / n_slow END AS rate_slow
      FROM agg)
    SELECT endpoint, n_fast, err_fast, n_slow, err_slow,
           rate_fast / 0.05 AS burn_fast,
           rate_slow / 0.05 AS burn_slow,
           COALESCE(rate_fast / 0.05 > 2.0 AND rate_slow / 0.05 > 1.0, FALSE) AS page
    FROM rated ORDER BY endpoint
    """,
)
def a36_slo_burn(spark, sf_dir):
    """Fast (24h) + slow (7d) burn rates per endpoint at the pinned eval
    instant: one conditional hash-agg over the log, map-side combined;
    the alert predicate is pure column arithmetic."""
    log = _request_log(spark, sf_dir)
    fast0 = F.lit("2024-01-31 00:00:00").cast("timestamp")
    slow0 = F.lit("2024-01-25 00:00:00").cast("timestamp")
    now = F.lit("2024-02-01 00:00:00").cast("timestamp")
    agg = (
        log.filter(F.col("ts") < now)
        .groupBy("endpoint")
        .agg(
            F.sum(F.when(F.col("ts") >= fast0, 1).otherwise(0)).cast("bigint").alias("n_fast"),
            F.sum(F.when((F.col("ts") >= fast0) & ~F.col("ok"), 1).otherwise(0))
            .cast("bigint")
            .alias("err_fast"),
            F.sum(F.when(F.col("ts") >= slow0, 1).otherwise(0)).cast("bigint").alias("n_slow"),
            F.sum(F.when((F.col("ts") >= slow0) & ~F.col("ok"), 1).otherwise(0))
            .cast("bigint")
            .alias("err_slow"),
        )
    )
    rate_fast = F.when(
        F.col("n_fast") > 0, F.col("err_fast").cast("double") / F.col("n_fast")
    )
    rate_slow = F.when(
        F.col("n_slow") > 0, F.col("err_slow").cast("double") / F.col("n_slow")
    )
    burn_fast = rate_fast / F.lit(0.05)
    burn_slow = rate_slow / F.lit(0.05)
    return agg.select(
        "endpoint",
        "n_fast",
        "err_fast",
        "n_slow",
        "err_slow",
        burn_fast.alias("burn_fast"),
        burn_slow.alias("burn_slow"),
        F.coalesce((burn_fast > 2.0) & (burn_slow > 1.0), F.lit(False)).alias("page"),
    ).orderBy("endpoint")


# ---------------------------------------------------------------------------
# text: sequential filter-cascade attrition (the CCNet/RefinedWeb-style
# funnel report): apply the quality rules IN ORDER and attribute each
# kill to the FIRST rule that fires — the report a corpus curation run
# publishes so rule tuning has per-stage evidence, built from the same
# gopher signal expressions tx_gopher_rules proves. One codegen scan,
# one 1-row aggregate.
# ---------------------------------------------------------------------------
@query(
    "tx_filter_funnel",
    """
    WITH base AS (
      SELECT doc_id, text,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents),
    sig AS (
      SELECT doc_id, text, norm,
             CASE WHEN length(norm) = 0 THEN 0
                  ELSE len(string_split(norm, ' ')) END AS n_words,
             string_split(norm, ' ') AS toks
      FROM base),
    ratios AS (
      SELECT doc_id, n_words,
             ROUND((length(norm) - greatest(n_words - 1, 0)) * 1.0
                   / greatest(n_words, 1), 6) AS mean_word_len,
             ROUND((length(regexp_replace(text, '[^#]', '', 'g'))
                    + len(regexp_extract_all(text, '(\\.\\.\\.|…)')))
                   * 1.0 / greatest(n_words, 1), 6) AS symbol_ratio,
             ROUND(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                   * 1.0 / greatest(n_words, 1), 6) AS alpha_word_frac,
             CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
                                  w -> list_contains(toks, w))) AS INT) AS required_hits
      FROM sig),
    flags AS (
      SELECT n_words BETWEEN 10 AND 100000 AS r1,
             mean_word_len BETWEEN 3.0 AND 10.0 AS r2,
             symbol_ratio <= 0.1 AS r3,
             alpha_word_frac >= 0.8 AS r4,
             required_hits >= 1 AS r5
      FROM ratios)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN NOT r1 THEN 1 ELSE 0 END) AS BIGINT) AS killed_wordcount,
           CAST(SUM(CASE WHEN r1 AND NOT r2 THEN 1 ELSE 0 END) AS BIGINT) AS killed_meanlen,
           CAST(SUM(CASE WHEN r1 AND r2 AND NOT r3 THEN 1 ELSE 0 END) AS BIGINT) AS killed_symbol,
           CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND NOT r4 THEN 1 ELSE 0 END) AS BIGINT) AS killed_alpha,
           CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 AND NOT r5 THEN 1 ELSE 0 END) AS BIGINT) AS killed_required,
           CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5 THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
           CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 AND r5 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS survival_rate
    FROM flags
    """,
)
def tx_filter_funnel(spark, sf_dir):
    """First-failing-rule attrition across the 5-stage quality cascade
    (word count → mean word length → symbol ratio → alpha fraction →
    required words), reusing gopher_rules' codegen signal expressions;
    the whole funnel is one scan into a single-row conditional agg."""
    from ..llmdata.text import gopher_rules

    d = t(spark, sf_dir, "documents", restore=True)
    sig = gopher_rules("text", min_words=10, min_required_words=1)
    flagged = d.select(
        ((sig["n_words"] >= 10) & (sig["n_words"] <= 100000)).alias("r1"),
        ((sig["mean_word_len"] >= 3.0) & (sig["mean_word_len"] <= 10.0)).alias("r2"),
        (sig["symbol_ratio"] <= 0.1).alias("r3"),
        (sig["alpha_word_frac"] >= 0.8).alias("r4"),
        (sig["required_hits"] >= 1).alias("r5"),
    )
    surv = F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4") & F.col("r5")
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.when(~F.col("r1"), 1).otherwise(0)).cast("bigint").alias("killed_wordcount"),
        F.sum(F.when(F.col("r1") & ~F.col("r2"), 1).otherwise(0))
        .cast("bigint")
        .alias("killed_meanlen"),
        F.sum(F.when(F.col("r1") & F.col("r2") & ~F.col("r3"), 1).otherwise(0))
        .cast("bigint")
        .alias("killed_symbol"),
        F.sum(F.when(F.col("r1") & F.col("r2") & F.col("r3") & ~F.col("r4"), 1).otherwise(0))
        .cast("bigint")
        .alias("killed_alpha"),
        F.sum(
            F.when(F.col("r1") & F.col("r2") & F.col("r3") & F.col("r4") & ~F.col("r5"), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("killed_required"),
        F.sum(F.when(surv, 1).otherwise(0)).cast("bigint").alias("n_survivors"),
        (
            F.sum(F.when(surv, 1).otherwise(0)).cast("double") / F.count(F.lit(1))
        ).alias("survival_rate"),
    )


# ---------------------------------------------------------------------------
# ML: closed-form ridge regression (normal equations, explicit 2x2
# inverse) predicting tomorrow's event count from today's features — the
# no-iteration linear-model companion to ml_logreg_gd's unrolled GD: one
# exact-decimal moment pass + scalar algebra + one MSE re-walk.
# ---------------------------------------------------------------------------
@query(
    "ml_ridge_2d",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)/COUNT(*) * 1000000.0) / 1000000.0 AS mv
      FROM events GROUP BY 1, 2),
    feat AS (
      SELECT ROUND(LN(1.0 + cnt) * 10000) / 10000.0 AS x1,
             ROUND(mv / 100.0 * 10000) / 10000.0 AS x2,
             LEAD(cnt) OVER (PARTITION BY event_type ORDER BY d) AS y
      FROM daily),
    f AS (SELECT x1, x2, y FROM feat WHERE y IS NOT NULL),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x1 AS DECIMAL(18,4)) * CAST(x1 AS DECIMAL(18,4))) AS DOUBLE) AS a,
             CAST(SUM(CAST(x1 AS DECIMAL(18,4)) * CAST(x2 AS DECIMAL(18,4))) AS DOUBLE) AS b,
             CAST(SUM(CAST(x2 AS DECIMAL(18,4)) * CAST(x2 AS DECIMAL(18,4))) AS DOUBLE) AS c,
             CAST(SUM(CAST(x1 AS DECIMAL(18,4)) * CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS d,
             CAST(SUM(CAST(x2 AS DECIMAL(18,4)) * CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS e
      FROM f),
    beta AS (
      SELECT n,
             ((c + 0.01) * d - b * e)
               / ((a + 0.01) * (c + 0.01) - b * b) AS b1,
             ((a + 0.01) * e - b * d)
               / ((a + 0.01) * (c + 0.01) - b * b) AS b2
      FROM m)
    SELECT beta.n, beta.b1, beta.b2,
           ROUND(CAST(SUM(CAST(ROUND(
             (f.y - (beta.b1 * f.x1 + beta.b2 * f.x2))
             * (f.y - (beta.b1 * f.x1 + beta.b2 * f.x2)), 8)
           AS DECIMAL(28,8))) AS DOUBLE) / MAX(beta.n) * 1000000.0) / 1000000.0 AS mse
    FROM f CROSS JOIN beta
    GROUP BY beta.n, beta.b1, beta.b2
    """,
)
def ml_ridge_2d(spark, sf_dir):
    """Ridge fit on the daily feature frame with y = next-day count.
    Features are 8-dp-rounded so DECIMAL casts are exact and every
    XᵀX / Xᵀy moment is an exact decimal sum; the solve is register
    algebra on the 1-row moment frame; MSE re-walks the frame with the
    broadcast β."""
    from pyspark.sql import Window

    from ..ml.logreg import ridge_closed_form_2d

    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("cnt"),
        (
            F.round(
                F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
                / F.count(F.lit(1))
                * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        ).alias("mv"),
    )
    w = Window.partitionBy("event_type").orderBy("d")
    feats = (
        daily.withColumn("y", F.lead("cnt").over(w))
        .filter(F.col("y").isNotNull())
        .select(
            # safe scaled-round (round(x*1e4)/1e4): plain round(double, nd)
            # diverges cross-engine on shortest-repr ties, which the exact
            # decimal moments would amplify into the solve
            (F.round(F.log(F.lit(1.0) + F.col("cnt")) * 10000) / F.lit(10000.0)).alias("x1"),
            (F.round(F.col("mv") / F.lit(100.0) * 10000) / F.lit(10000.0)).alias("x2"),
            "y",
        )
    )
    return ridge_closed_form_2d(feats)


# ---------------------------------------------------------------------------
# sketch: Count-Min (Cormode-Muthukrishnan 2005) over the token stream —
# depth 4 × width 256, md5-derived row hashes so both engines build the
# IDENTICAL sketch. The probe block reports estimate vs true count for
# the BM25 query terms; CMS guarantees estimate ≥ truth, and the emitted
# overcount column lets the driver row-hash that invariant. Mergeable by
# construction: per-partition partial counters are plain (d, bucket)
# partial sums — the same re-aggregation story as the HLL/KMV entries.
# ---------------------------------------------------------------------------
@query(
    "sk_count_min",
    f"""
    WITH toks AS (SELECT UNNEST({_TOKS_SQL}) AS term FROM documents),
    fan AS (
      SELECT term, d,
             CAST(list_sum(list_transform(
               list_zip(string_split(substring(md5(CAST(d AS VARCHAR) || ':' || term), 1, 4), ''),
                        range(1, 5)),
               p -> (list_position({_HEX}, p[1]) - 1) * power(16, 4 - p[2]))) AS BIGINT)
               % 256 AS bucket
      FROM toks CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS d) ds),
    cms AS (
      SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM fan GROUP BY d, bucket),
    probes AS (SELECT UNNEST(['hash', 'join', 'spark', 'dup',
                              'data', 'the', 'pipeline', 'quality']) AS term),
    pb AS (
      SELECT p.term, ds.d,
             CAST(list_sum(list_transform(
               list_zip(string_split(substring(md5(CAST(ds.d AS VARCHAR) || ':' || p.term), 1, 4), ''),
                        range(1, 5)),
               p2 -> (list_position({_HEX}, p2[1]) - 1) * power(16, 4 - p2[2]))) AS BIGINT)
               % 256 AS bucket
      FROM probes p CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS d) ds),
    est AS (
      SELECT pb.term, MIN(COALESCE(cms.cnt, 0)) AS cms_estimate
      FROM pb LEFT JOIN cms ON cms.d = pb.d AND cms.bucket = pb.bucket
      GROUP BY pb.term),
    truth AS (
      SELECT probes.term, CAST(COALESCE(tc.c, 0) AS BIGINT) AS true_count
      FROM probes LEFT JOIN (
        SELECT term, COUNT(*) AS c FROM toks GROUP BY term) tc USING (term))
    SELECT truth.term, truth.true_count,
           CAST(est.cms_estimate AS BIGINT) AS cms_estimate,
           CAST(est.cms_estimate - truth.true_count AS BIGINT) AS overcount
    FROM truth JOIN est USING (term) ORDER BY term
    """,
)
def sk_count_min(spark, sf_dir):
    """Count-Min sketch build + probe. The token stream fans out ×4
    (explode over depths — map-side combine collapses each task to
    ≤1024 partial counters before the shuffle, so the exchange moves
    sketch-sized data, not the corpus), probes join the 1024-row counter
    table, estimate = min over depths. overcount ≥ 0 is the CMS
    guarantee the oracle row-hash pins."""
    from ..llmdata.text import _norm

    d = t(spark, sf_dir, "documents", restore=True)
    hexarr = F.array(*[F.lit(ch) for ch in "0123456789abcdef"])

    def bucket(depth_col, term_col):
        key = F.md5(F.concat(depth_col.cast("string"), F.lit(":"), term_col))
        hv = F.aggregate(
            F.slice(F.split(F.substring(key, 1, 4), ""), 1, 4),
            F.lit(0.0),
            lambda acc, ch: acc * 16 + (F.array_position(hexarr, ch) - 1),
        )
        return (hv.cast("bigint") % 256).alias("bucket")

    toks = d.select(F.explode(F.split(_norm("text"), " ")).alias("term"))
    fan = toks.withColumn("d", F.explode(F.sequence(F.lit(0), F.lit(3)))).select(
        "term", "d", bucket(F.col("d"), F.col("term"))
    )
    cms = fan.groupBy("d", "bucket").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    terms = ["hash", "join", "spark", "dup", "data", "the", "pipeline", "quality"]
    probes = spark.createDataFrame([(x,) for x in terms], "term string")
    pb = probes.withColumn("d", F.explode(F.sequence(F.lit(0), F.lit(3)))).select(
        "term", "d", bucket(F.col("d"), F.col("term"))
    )
    est = (
        pb.join(cms, ["d", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )
    tc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    truth = probes.join(tc, "term", "left").select(
        "term", F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("true_count")
    )
    return (
        truth.join(est, "term")
        .select(
            "term",
            "true_count",
            F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
            (F.col("cms_estimate") - F.col("true_count")).cast("bigint").alias("overcount"),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# sketch: Bloom-filter prejoin (k=3 hashes, m=4096 bits) — the classic
# shuffle-avoidance prefilter: build the filter from the decontamination
# benchmark's terms, test every corpus term against it map-side, and
# report candidates vs exact membership. Bloom guarantees ZERO false
# negatives (missed_true = 0 is pinned in the oracle hash) and the
# false-positive count quantifies the wasted-work rate a real prejoin
# would pay. md5-derived bit positions ⇒ engine-identical filter.
# ---------------------------------------------------------------------------
@query(
    "sk_bloom_prefilter",
    f"""
    WITH bench AS (
      SELECT DISTINCT UNNEST({_TOKS_SQL}) AS term FROM documents WHERE doc_id % 97 = 0),
    corpus AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM (SELECT UNNEST({_TOKS_SQL}) AS term FROM documents) z GROUP BY term),
    bits AS (
      SELECT DISTINCT
             CAST(list_sum(list_transform(
               list_zip(string_split(substring(md5(CAST(k AS VARCHAR) || '#' || term), 1, 4), ''),
                        range(1, 5)),
               p -> (list_position({_HEX}, p[1]) - 1) * power(16, 4 - p[2]))) AS BIGINT)
               % 4096 AS bit
      FROM bench CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS k) ks),
    probe AS (
      SELECT c.term, c.n_occurrences, ks.k,
             CAST(list_sum(list_transform(
               list_zip(string_split(substring(md5(CAST(ks.k AS VARCHAR) || '#' || c.term), 1, 4), ''),
                        range(1, 5)),
               p -> (list_position({_HEX}, p[1]) - 1) * power(16, 4 - p[2]))) AS BIGINT)
               % 4096 AS bit
      FROM corpus c CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS k) ks),
    hits AS (
      SELECT term, MIN(n_occurrences) AS n_occurrences,
             CAST(SUM(CASE WHEN bits.bit IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS k_hits
      FROM probe LEFT JOIN bits ON bits.bit = probe.bit
      GROUP BY term),
    flagged AS (
      SELECT h.term, h.n_occurrences, h.k_hits = 3 AS bloom_pass,
             b.term IS NOT NULL AS truly_in_bench
      FROM hits h LEFT JOIN bench b ON b.term = h.term)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_terms,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN truly_in_bench THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(SUM(CASE WHEN bloom_pass AND NOT truly_in_bench THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives,
           CAST(SUM(CASE WHEN truly_in_bench AND NOT bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS missed_true
    FROM flagged
    """,
)
def sk_bloom_prefilter(spark, sf_dir):
    """Bloom build (benchmark slice, ~1% of docs) + map-rate probe of
    every distinct corpus term. The bit table is ≤4096 rows — broadcast
    by AQE — so the probe never shuffles the corpus; the exact-membership
    comparison quantifies the FP rate and pins zero false negatives."""
    from ..llmdata.text import _norm

    d = t(spark, sf_dir, "documents")
    hexarr = F.array(*[F.lit(ch) for ch in "0123456789abcdef"])

    def bit(k_col, term_col):
        key = F.md5(F.concat(k_col.cast("string"), F.lit("#"), term_col))
        hv = F.aggregate(
            F.slice(F.split(F.substring(key, 1, 4), ""), 1, 4),
            F.lit(0.0),
            lambda acc, ch: acc * 16 + (F.array_position(hexarr, ch) - 1),
        )
        return (hv.cast("bigint") % 4096).alias("bit")

    toks = d.select("doc_id", F.explode(F.split(_norm("text"), " ")).alias("term"))
    bench = toks.filter(F.col("doc_id") % 97 == 0).select("term").distinct()
    corpus = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences")
    )
    ks = F.explode(F.sequence(F.lit(0), F.lit(2)))
    bits = bench.withColumn("k", ks).select(bit(F.col("k"), F.col("term"))).distinct()
    probe = corpus.withColumn("k", ks).select(
        "term", "n_occurrences", bit(F.col("k"), F.col("term"))
    )
    hits = (
        probe.join(F.broadcast(bits.withColumn("__hit", F.lit(1))), "bit", "left")
        .groupBy("term")
        .agg(
            F.min("n_occurrences").alias("n_occurrences"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("int").alias("k_hits"),
        )
    )
    flagged = hits.join(
        bench.withColumn("__in", F.lit(1)), "term", "left"
    ).select(
        (F.col("k_hits") == 3).alias("bloom_pass"),
        F.col("__in").isNotNull().alias("truly_in_bench"),
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_terms"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).cast("bigint").alias("n_candidates"),
        F.sum(F.when(F.col("truly_in_bench"), 1).otherwise(0)).cast("bigint").alias("n_true"),
        F.sum(F.when(F.col("bloom_pass") & ~F.col("truly_in_bench"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_positives"),
        F.sum(F.when(F.col("truly_in_bench") & ~F.col("bloom_pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("missed_true"),
    )


# ---------------------------------------------------------------------------
# ML: 2-D PCA in closed form — leading eigenpair of the covariance of
# the quantized daily features: one exact-decimal moment pass (the
# ml_ridge_2d convention), then the quadratic-formula eigensolve and an
# orientation-fixed eigenvector, all scalar IEEE algebra (*, -, /, sqrt
# are correctly rounded, so identical moment bits ⇒ identical output
# bits in any engine).
# ---------------------------------------------------------------------------
@query(
    "ml_pca_2d",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)/COUNT(*) * 1000000.0) / 1000000.0 AS mv
      FROM events GROUP BY 1, 2),
    f AS (
      SELECT ROUND(LN(1.0 + cnt) * 10000) / 10000.0 AS x1,
             ROUND(mv / 100.0 * 10000) / 10000.0 AS x2
      FROM daily),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x1 AS DECIMAL(18,4))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(x2 AS DECIMAL(18,4))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(x1 AS DECIMAL(18,4)) * CAST(x1 AS DECIMAL(18,4))) AS DOUBLE) AS s11,
             CAST(SUM(CAST(x2 AS DECIMAL(18,4)) * CAST(x2 AS DECIMAL(18,4))) AS DOUBLE) AS s22,
             CAST(SUM(CAST(x1 AS DECIMAL(18,4)) * CAST(x2 AS DECIMAL(18,4))) AS DOUBLE) AS s12
      FROM f),
    cov AS (
      SELECT n,
             (n * s11 - s1 * s1) / (CAST(n AS DOUBLE) * n) AS cxx,
             (n * s22 - s2 * s2) / (CAST(n AS DOUBLE) * n) AS cyy,
             (n * s12 - s1 * s2) / (CAST(n AS DOUBLE) * n) AS cxy
      FROM m),
    eig AS (
      SELECT n, cxx, cyy, cxy,
             ((cxx + cyy) + SQRT((cxx + cyy) * (cxx + cyy)
               - 4.0 * (cxx * cyy - cxy * cxy))) / 2.0 AS l1
      FROM cov),
    vec AS (
      SELECT n, l1,
             CASE WHEN cxy <> 0.0 THEN cxy ELSE CASE WHEN cxx >= cyy THEN 1.0 ELSE 0.0 END END AS u1,
             CASE WHEN cxy <> 0.0 THEN l1 - cxx ELSE CASE WHEN cxx >= cyy THEN 0.0 ELSE 1.0 END END AS u2,
             cxx + cyy AS tr
      FROM eig)
    SELECT n, l1 AS lambda1,
           CASE WHEN tr > 0.0 THEN l1 / tr END AS explained_ratio,
           (CASE WHEN u1 < 0.0 OR (u1 = 0.0 AND u2 < 0.0) THEN -u1 ELSE u1 END)
             / SQRT(u1 * u1 + u2 * u2) AS v1,
           (CASE WHEN u1 < 0.0 OR (u1 = 0.0 AND u2 < 0.0) THEN -u2 ELSE u2 END)
             / SQRT(u1 * u1 + u2 * u2) AS v2
    FROM vec
    """,
)
def ml_pca_2d(spark, sf_dir):
    """Leading principal component of (log-count, scaled mean-value):
    corpus-rate work is the daily hash-agg; moments are exact decimals
    over the 1e-4-grid features; the eigensolve is six IEEE ops on the
    1-row moment frame. Eigenvector orientation pinned to v1 ≥ 0."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("cnt"),
        (
            F.round(
                F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
                / F.count(F.lit(1))
                * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        ).alias("mv"),
    )
    f = daily.select(
        (F.round(F.log(F.lit(1.0) + F.col("cnt")) * 10000) / F.lit(10000.0)).alias("x1"),
        (F.round(F.col("mv") / F.lit(100.0) * 10000) / F.lit(10000.0)).alias("x2"),
    )
    d1 = F.col("x1").cast("decimal(18,4)")
    d2 = F.col("x2").cast("decimal(18,4)")
    m = f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d1).cast("double").alias("s1"),
        F.sum(d2).cast("double").alias("s2"),
        F.sum(d1 * d1).cast("double").alias("s11"),
        F.sum(d2 * d2).cast("double").alias("s22"),
        F.sum(d1 * d2).cast("double").alias("s12"),
    )
    nn = F.col("n").cast("double") * F.col("n")
    cov = m.select(
        "n",
        ((F.col("n") * F.col("s11") - F.col("s1") * F.col("s1")) / nn).alias("cxx"),
        ((F.col("n") * F.col("s22") - F.col("s2") * F.col("s2")) / nn).alias("cyy"),
        ((F.col("n") * F.col("s12") - F.col("s1") * F.col("s2")) / nn).alias("cxy"),
    )
    tr = F.col("cxx") + F.col("cyy")
    l1 = (
        tr
        + F.sqrt(tr * tr - F.lit(4.0) * (F.col("cxx") * F.col("cyy") - F.col("cxy") * F.col("cxy")))
    ) / F.lit(2.0)
    eig = cov.select("n", "cxx", "cyy", "cxy", l1.alias("l1"))
    u1 = F.when(
        F.col("cxy") != 0.0, F.col("cxy")
    ).otherwise(F.when(F.col("cxx") >= F.col("cyy"), F.lit(1.0)).otherwise(F.lit(0.0)))
    u2 = F.when(
        F.col("cxy") != 0.0, F.col("l1") - F.col("cxx")
    ).otherwise(F.when(F.col("cxx") >= F.col("cyy"), F.lit(0.0)).otherwise(F.lit(1.0)))
    vec = eig.select(
        "n",
        "l1",
        u1.alias("u1"),
        u2.alias("u2"),
        (F.col("cxx") + F.col("cyy")).alias("tr"),
    )
    flip = (F.col("u1") < 0.0) | ((F.col("u1") == 0.0) & (F.col("u2") < 0.0))
    norm = F.sqrt(F.col("u1") * F.col("u1") + F.col("u2") * F.col("u2"))
    return vec.select(
        "n",
        F.col("l1").alias("lambda1"),
        F.when(F.col("tr") > 0.0, F.col("l1") / F.col("tr")).alias("explained_ratio"),
        (F.when(flip, -F.col("u1")).otherwise(F.col("u1")) / norm).alias("v1"),
        (F.when(flip, -F.col("u2")).otherwise(F.col("u2")) / norm).alias("v2"),
    )


# ---------------------------------------------------------------------------
# LM: conditional entropy of the bigram model — H(w2|w1) = H(bigram) −
# H(unigram), the entropy-rate estimate that complements lm_bigram_nll
# (NLL scores a held-out set; this is the corpus's own information
# rate). Both entropies follow the 8-dp-round-then-decimal-sum ln
# convention (a32/q16), computed off the same token scan.
# ---------------------------------------------------------------------------
@query(
    "lm_conditional_entropy",
    f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS tk FROM documents),
    uni AS (SELECT UNNEST(tk) AS w FROM toks),
    ucnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY w),
    un AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM ucnt),
    hu AS (
      SELECT CAST(SUM(CAST(ROUND(
               -(c * 1.0 / un.n) * LN(c * 1.0 / un.n), 8) AS DECIMAL(28,8))) AS DOUBLE) AS h
      FROM ucnt CROSS JOIN un),
    big AS (
      SELECT UNNEST(list_transform(range(1, len(tk)),
                    i -> tk[i] || ' ' || tk[i + 1])) AS bg
      FROM toks),
    bcnt AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c FROM big GROUP BY bg),
    bn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM bcnt),
    hb AS (
      SELECT CAST(SUM(CAST(ROUND(
               -(c * 1.0 / bn.n) * LN(c * 1.0 / bn.n), 8) AS DECIMAL(28,8))) AS DOUBLE) AS h
      FROM bcnt CROSS JOIN bn)
    SELECT un.n AS n_unigrams, bn.n AS n_bigrams,
           hu.h AS h_unigram_nats,
           hb.h AS h_bigram_nats,
           hb.h - hu.h AS h_conditional_nats
    FROM un CROSS JOIN bn CROSS JOIN hu CROSS JOIN hb
    """,
)
def lm_conditional_entropy(spark, sf_dir):
    """Entropy rate H(w2|w1) via the chain rule on unigram/bigram count
    frames: two hash-aggs off one token scan, 1-row total broadcasts,
    8-dp-rounded ln terms summed in decimal."""
    from ..llmdata.text import _norm

    d = t(spark, sf_dir, "documents")
    toks = F.split(_norm("text"), " ")
    tk = d.select(toks.alias("tk"))
    uni = tk.select(F.explode("tk").alias("w"))
    ucnt = uni.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    out_len = F.greatest(F.size(F.col("tk")) - 1, F.lit(0))
    bg_arr = F.zip_with(
        F.slice(F.col("tk"), 1, out_len),
        F.slice(F.col("tk"), 2, out_len),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bcnt = tk.select(F.explode(bg_arr).alias("bg")).groupBy("bg").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )

    def entropy(cnts):
        tot = cnts.agg(F.sum("c").cast("bigint").alias("n"))
        j = cnts.crossJoin(F.broadcast(tot))
        p = F.col("c") / F.col("n")
        return j.groupBy("n").agg(
            F.sum(F.round(-p * F.log(p), 8).cast("decimal(28,8)"))
            .cast("double")
            .alias("h")
        )

    hu = entropy(ucnt).select(F.col("n").alias("n_unigrams"), F.col("h").alias("hu"))
    hb = entropy(bcnt).select(F.col("n").alias("n_bigrams"), F.col("h").alias("hb"))
    # the decimal sums are k*1e-8 multiples: re-rounding them to 6 dp
    # lands exactly on .xxxxxx5 midpoints whenever k%100 == 50 (the a7 tie
    # class) — emit the raw doubles instead; bits match because both
    # engines cast the identical exact decimal
    return hu.crossJoin(F.broadcast(hb)).select(
        "n_unigrams",
        "n_bigrams",
        F.col("hu").alias("h_unigram_nats"),
        F.col("hb").alias("h_bigram_nats"),
        (F.col("hb") - F.col("hu")).alias("h_conditional_nats"),
    )


# ---------------------------------------------------------------------------
# ML: leave-one-out 5-NN classification accuracy on the daily feature
# frame — can (log-count, scaled mean) separate event types? The frame
# is (types × days) at ANY corpus scale, so the all-pairs evaluation is
# dimension-sized forever; distances are exact bigints on the 1e-4
# feature grid, so neighbor ranking can never flip on float noise.
# ---------------------------------------------------------------------------
@query(
    "ml_knn_eval",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)/COUNT(*) * 1000000.0) / 1000000.0 AS mv
      FROM events GROUP BY 1, 2),
    pts AS (
      SELECT event_type, d,
             CAST(ROUND(LN(1.0 + cnt) * 10000) AS BIGINT) AS x,
             CAST(ROUND(mv / 100.0 * 10000) AS BIGINT) AS y
      FROM daily),
    nbr AS (
      SELECT a.event_type AS true_type, a.d AS ad, b.event_type AS vote,
             ROW_NUMBER() OVER (
               PARTITION BY a.event_type, a.d
               ORDER BY (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y),
                        b.event_type, b.d) AS rnk
      FROM pts a JOIN pts b
        ON NOT (a.event_type = b.event_type AND a.d = b.d)),
    top5 AS (SELECT true_type, ad, vote FROM nbr WHERE rnk <= 5),
    votes AS (
      SELECT true_type, ad, vote, COUNT(*) AS nv FROM top5 GROUP BY 1, 2, 3),
    pred AS (
      SELECT true_type, ad, vote AS predicted,
             ROW_NUMBER() OVER (PARTITION BY true_type, ad
                                ORDER BY nv DESC, vote) AS pr
      FROM votes QUALIFY pr = 1)
    SELECT true_type AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN predicted = true_type THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN predicted = true_type THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS accuracy
    FROM pred GROUP BY true_type ORDER BY event_type
    """,
)
def ml_knn_eval(spark, sf_dir):
    """LOO 5-NN accuracy per type: all-pairs over the (types × days)
    frame (bounded by calendar, not corpus), integer-grid distances,
    deterministic neighbor and majority tie-breaks, one rollup."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("cnt"),
        (
            F.round(
                F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
                / F.count(F.lit(1))
                * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        ).alias("mv"),
    )
    pts = daily.select(
        "event_type",
        "d",
        F.round(F.log(F.lit(1.0) + F.col("cnt")) * 10000).cast("bigint").alias("x"),
        F.round(F.col("mv") / F.lit(100.0) * 10000).cast("bigint").alias("y"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    dist = (F.col("a.x") - F.col("b.x")) * (F.col("a.x") - F.col("b.x")) + (
        F.col("a.y") - F.col("b.y")
    ) * (F.col("a.y") - F.col("b.y"))
    w_nbr = Window.partitionBy("a.event_type", "a.d").orderBy(
        dist, F.col("b.event_type"), F.col("b.d")
    )
    nbr = (
        a.join(
            b,
            ~((F.col("a.event_type") == F.col("b.event_type")) & (F.col("a.d") == F.col("b.d"))),
        )
        .select(
            F.col("a.event_type").alias("true_type"),
            F.col("a.d").alias("ad"),
            F.col("b.event_type").alias("vote"),
            F.row_number().over(w_nbr).alias("rnk"),
        )
        .filter(F.col("rnk") <= 5)
    )
    votes = nbr.groupBy("true_type", "ad", "vote").agg(F.count(F.lit(1)).alias("nv"))
    w_pred = Window.partitionBy("true_type", "ad").orderBy(F.desc("nv"), F.asc("vote"))
    pred = (
        votes.withColumn("pr", F.row_number().over(w_pred))
        .filter(F.col("pr") == 1)
        .select("true_type", F.col("vote").alias("predicted"))
    )
    hit = F.when(F.col("predicted") == F.col("true_type"), 1).otherwise(0)
    return (
        pred.groupBy("true_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum(hit).cast("bigint").alias("n_correct"),
            (F.sum(hit).cast("double") / F.count(F.lit(1))).alias("accuracy"),
        )
        .select(
            F.col("true_type").alias("event_type"), "n_points", "n_correct", "accuracy"
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# LM: next-word lookup table — top-3 continuations per head word for the
# 30 most frequent heads, with the conditional probability as an exact
# integer ratio. The materialized bigram table an autocomplete /
# fast-decode layer serves; both rank filters are WindowGroupLimit.
# ---------------------------------------------------------------------------
@query(
    "lm_next_word_topk",
    f"""
    WITH toks AS (SELECT {_TOKS_SQL} AS tk FROM documents),
    big AS (
      SELECT UNNEST(list_transform(range(1, len(tk)),
                    i -> struct_pack(w1 := tk[i], w2 := tk[i + 1]))) AS p
      FROM toks),
    bc AS (
      SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM big GROUP BY 1, 2),
    heads AS (
      SELECT w1, CAST(SUM(c) AS BIGINT) AS head_count,
             ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, w1) AS hr
      FROM bc GROUP BY w1 QUALIFY hr <= 30),
    nxt AS (
      SELECT bc.w1, bc.w2, bc.c, heads.head_count,
             ROW_NUMBER() OVER (PARTITION BY bc.w1 ORDER BY bc.c DESC, bc.w2) AS nr
      FROM bc JOIN heads USING (w1) QUALIFY nr <= 3)
    SELECT w1, w2, c AS pair_count, head_count,
           CAST(c AS DOUBLE) / head_count AS p_next,
           CAST(nr AS INT) AS rank_within_head
    FROM nxt ORDER BY w1, rank_within_head
    """,
)
def lm_next_word_topk(spark, sf_dir):
    """Top-3 next words for the 30 commonest heads: bigram hash-agg
    (corpus-rate), head top-30 and per-head top-3 both as
    WindowGroupLimit rank filters, conditional probability as one
    integer-ratio division."""
    from pyspark.sql import Window

    from ..llmdata.text import _norm

    d = t(spark, sf_dir, "documents", restore=True)
    tk = d.select(F.split(_norm("text"), " ").alias("tk"))
    out_len = F.greatest(F.size(F.col("tk")) - 1, F.lit(0))
    pairs = tk.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("tk"), 1, out_len),
                F.slice(F.col("tk"), 2, out_len),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w_head = Window.orderBy(F.desc("head_count"), F.asc("w1"))
    heads = (
        bc.groupBy("w1")
        .agg(F.sum("c").cast("bigint").alias("head_count"))
        .withColumn("hr", F.row_number().over(w_head))
        .filter(F.col("hr") <= 30)
        .select("w1", "head_count")
    )
    w_nxt = Window.partitionBy("w1").orderBy(F.desc("c"), F.asc("w2"))
    return (
        bc.join(heads, "w1")
        .withColumn("nr", F.row_number().over(w_nxt))
        .filter(F.col("nr") <= 3)
        .select(
            "w1",
            "w2",
            F.col("c").alias("pair_count"),
            "head_count",
            (F.col("c").cast("double") / F.col("head_count")).alias("p_next"),
            F.col("nr").cast("int").alias("rank_within_head"),
        )
        .orderBy("w1", "rank_within_head")
    )


# ---------------------------------------------------------------------------
# dedup: ORACLE-CHECKED MinHash estimate — the production family
# (dd_minhash_lsh) uses xxhash64, which no oracle engine shares, so it
# is registered rows-only; THIS query re-derives 16 MinHash components
# from md5 (the a24 hex-fold) on both sides and compares the estimate
# against exact Jaccard on the proven ≥0.5 pair set. Every emitted
# number is an integer (ppm / match counts), so the accuracy profile of
# the MinHash estimator itself is now hash-verified: est_ppm =
# matches·62500, err_ppm = est − exact.
# ---------------------------------------------------------------------------
@query(
    "dd_minhash_estimate",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    sh AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, greatest(len(tk) - 3, 2)),
                       i -> array_to_string(tk[i:i+4], ' ')))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    cold AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 50),
    shc AS (SELECT s.doc_id, s.shingle FROM sh s JOIN cold USING (shingle)),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS common
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT c.id_a, c.id_b,
             (c.common * CAST(1000000 AS BIGINT))
               // (sa.set_size + sb.set_size - c.common) AS jaccard_ppm
      FROM common c
      JOIN sizes sa ON c.id_a = sa.doc_id
      JOIN sizes sb ON c.id_b = sb.doc_id
      WHERE 2 * c.common >= sa.set_size + sb.set_size - c.common),
    sig AS (
      SELECT doc_id, s.i,
             MIN(CAST(list_sum(list_transform(
               list_zip(string_split(substring(md5(CAST(s.i AS VARCHAR) || '|' || shingle), 1, 13), ''),
                        range(1, 14)),
               p -> (list_position({_HEX}, p[1]) - 1) * power(16, 13 - p[2]))) AS BIGINT)) AS mh
      FROM sh CROSS JOIN (SELECT UNNEST(range(0, 16)) AS i) s
      GROUP BY doc_id, s.i),
    est AS (
      SELECT p.id_a, p.id_b, p.jaccard_ppm,
             CAST(SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS INT) AS mh_matches
      FROM pairs p
      JOIN sig x ON x.doc_id = p.id_a
      JOIN sig y ON y.doc_id = p.id_b AND y.i = x.i
      GROUP BY p.id_a, p.id_b, p.jaccard_ppm)
    SELECT id_a, id_b, jaccard_ppm, mh_matches,
           CAST(mh_matches AS BIGINT) * 62500 AS mh_est_ppm,
           CAST(mh_matches AS BIGINT) * 62500 - jaccard_ppm AS err_ppm
    FROM est ORDER BY id_a, id_b
    """,
)
def dd_minhash_estimate(spark, sf_dir):
    """16-component md5 MinHash vs exact Jaccard on the ≥0.5 pairs: the
    shingle frame feeds both the exact pipeline (shingle-keyed equi-join)
    and the signature build (×16 seed fan-out collapsing to doc×16 rows
    map-side); the estimate compare touches only pair×16 rows. Integer
    threshold (2·common ≥ union) and ppm outputs keep every value exact.

    The exact-Jaccard self-join is ``max_shingle_df``-capped at 50 on BOTH
    engines (mirroring ``llmdata.dedup.jaccard_similarity_join``): shingles
    hotter than 50 docs are dropped from the common count, bounding the
    hottest posting list so the a.shingle=b.shingle join stays linear in
    candidates at web scale. At every tested SF the max 5-gram shingle df
    is ≤4, so the cap changes zero output rows; the signature side keeps
    the full shingle set (production MinHash hashes everything). The join
    itself runs on xxhash64-collapsed 8-byte keys (output-invariant)."""
    from ..llmdata.dedup import _shingles

    d = t(spark, sf_dir, "documents", restore=True)
    sh = d.select("doc_id", F.explode(_shingles("text", 5)).alias("shingle"))
    return _minhash_estimate_from_shingles(sh, persist=True)


def _minhash_estimate_from_shingles(sh, persist: bool = False):
    """Downstream of the raw n=5 shingle frame ``(doc_id, shingle)`` —
    shared by the standalone ``dd_minhash_estimate`` (persist=True: the
    frame feeds sizes, the df-cap frequency agg, both join sides, and the
    16-seed signature fan-out — five consumers of one explode) and the
    `plans/text_marts.py` ``text_minhash_estimate`` model (persist=False:
    the dep is already a cached table). Pins go through the cachectl
    ledger so the harness releases them post-collect (r11 ADVICE)."""
    from ..cachectl import tracked_persist

    if persist:
        sh = tracked_persist(sh)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    cold = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 50)
        .select("shingle")
    )
    shc = sh.join(cold, "shingle").select(
        "doc_id", F.xxhash64("shingle").alias("shk")
    )
    a, b = shc.alias("a"), shc.hint("SHUFFLE_HASH").alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shk") == F.col("b.shk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("set_size").alias("sa"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("set_size").alias("sb"))
    pairs = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(2 * F.col("common") >= F.col("sa") + F.col("sb") - F.col("common"))
        .select(
            "id_a",
            "id_b",
            F.expr("(common * CAST(1000000 AS BIGINT)) div (sa + sb - common)").alias(
                "jaccard_ppm"
            ),
        )
    )
    # 13 hex chars = 52 bits < 2^53: conv() is exact here and stays inside
    # whole-stage codegen, unlike the interpreted hex-ladder HOF the oracle
    # SQL needs (DuckDB has no conv()). Same integers either way.
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.col("i").cast("string"), F.lit("|"), F.col("shingle"))),
            1,
            13,
        ),
        16,
        10,
    )
    # Output-invariant prune: signatures are only consumed via the join
    # with `pairs`, so build them for paired docs only — the x16 md5
    # fan-out (the dominant cost term) shrinks from every shingle in the
    # corpus to the shingles of the few near-dup docs. The oracle SQL
    # keeps the whole-corpus signature CTE; unconsumed signatures cannot
    # change the compared rows. `pairs` now has two consumers (est +
    # pair_ids) and sits downstream of the expensive shingle self-join —
    # persist it (near-dup pairs: a handful of rows) or the join runs
    # twice (measured 26.6s vs 8s at sf1).
    pairs = tracked_persist(pairs)
    pair_ids = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sig = (
        sh.join(pair_ids, "doc_id", "left_semi")
        .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(15))))
        .select("doc_id", "i", hv.cast("bigint").alias("h"))
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("mh"))
    )
    x = sig.select(F.col("doc_id").alias("id_a"), "i", F.col("mh").alias("mh_a"))
    y = sig.select(
        F.col("doc_id").alias("yid"), F.col("i").alias("i_b"), F.col("mh").alias("mh_b")
    )
    est = (
        pairs.join(x, "id_a")
        .join(y, (F.col("id_b") == F.col("yid")) & (F.col("i") == F.col("i_b")))
        .groupBy("id_a", "id_b", "jaccard_ppm")
        .agg(
            F.sum(F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0))
            .cast("int")
            .alias("mh_matches")
        )
    )
    return est.select(
        "id_a",
        "id_b",
        "jaccard_ppm",
        "mh_matches",
        (F.col("mh_matches").cast("bigint") * 62500).alias("mh_est_ppm"),
        (F.col("mh_matches").cast("bigint") * 62500 - F.col("jaccard_ppm")).alias("err_ppm"),
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# similarity: Calinski-Harabasz cluster separation of the embedding
# space by its ground-truth label — the variance-ratio index every
# clustering/embedding-quality report leads with: CH = (B/(k−1)) /
# (W/(n−k)). Everything reduces to per-(label, dim) first/second
# moments: one posexplode + hash-agg is the only corpus-rate pass; the
# scatter algebra runs on the labels×dims frame with every
# cross-term 6-dp-rounded into a decimal sum (the a32 convention), so
# float association never moves the index.
# ---------------------------------------------------------------------------
@query(
    "sim_cluster_separation",
    """
    WITH ex AS (
      SELECT label, p[2] AS dim, ROUND(CAST(p[1] AS DOUBLE), 8) AS x
      FROM embeddings,
           UNNEST(list_zip(embedding, range(1, len(embedding) + 1))) AS t(p)),
    percd AS (
      SELECT label, dim,
             CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DECIMAL(28,8)) AS s,
             CAST(SUM(CAST(ROUND(x * x, 8) AS DECIMAL(28,8))) AS DECIMAL(28,8)) AS q,
             CAST(COUNT(*) AS BIGINT) AS n_c
      FROM ex GROUP BY label, dim),
    sizes AS (
      SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS k,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings),
    wsum AS (
      SELECT CAST(SUM(CAST(ROUND(CAST(q AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_c, 6)
             AS DECIMAL(28,6))) AS DOUBLE) AS w,
             CAST(SUM(CAST(ROUND(
               CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_c, 6)
             AS DECIMAL(28,6))) AS DOUBLE) AS b_part
      FROM percd),
    perd AS (
      SELECT dim, CAST(SUM(s) AS DECIMAL(28,8)) AS sd,
             CAST(SUM(n_c) AS BIGINT) AS n
      FROM percd GROUP BY dim),
    gsum AS (
      SELECT CAST(SUM(CAST(ROUND(
               CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / n, 6)
             AS DECIMAL(28,6))) AS DOUBLE) AS g
      FROM perd)
    SELECT sizes.n, CAST(sizes.k AS INT) AS k,
           wsum.b_part - gsum.g AS between_scatter,
           wsum.w AS within_scatter,
           ((wsum.b_part - gsum.g) / (sizes.k - 1))
             / (wsum.w / (sizes.n - sizes.k)) AS calinski_harabasz
    FROM sizes CROSS JOIN wsum CROSS JOIN gsum
    """,
)
def sim_cluster_separation(spark, sf_dir):
    """CH index of embeddings grouped by label. B = Σ_cd s²/n_c − Σ_d
    S_d²/n and W = Σ_cd (q − s²/n_c) from decimal-exact moments; the
    per-(label, dim) sums keep unscaled integers < 2^53 so the
    decimal→double conversions are single-rounding in every engine."""
    emb = t(spark, sf_dir, "embeddings", restore=True)
    ex = emb.select(
        "label", F.posexplode("embedding").alias("dim", "xf")
    ).select("label", "dim", F.round(F.col("xf").cast("double"), 8).alias("x"))
    percd = ex.groupBy("label", "dim").agg(
        F.sum(F.col("x").cast("decimal(28,8)")).cast("decimal(28,8)").alias("s"),
        F.sum(F.round(F.col("x") * F.col("x"), 8).cast("decimal(28,8)"))
        .cast("decimal(28,8)")
        .alias("q"),
        F.count(F.lit(1)).cast("bigint").alias("n_c"),
    )
    sizes = emb.agg(
        F.countDistinct("label").cast("bigint").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    s_d = F.col("s").cast("double")
    wsum = percd.agg(
        F.sum(
            F.round(F.col("q").cast("double") - s_d * s_d / F.col("n_c"), 6).cast(
                "decimal(28,6)"
            )
        )
        .cast("double")
        .alias("w"),
        F.sum(F.round(s_d * s_d / F.col("n_c"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("b_part"),
    )
    perd = percd.groupBy("dim").agg(
        F.sum("s").cast("decimal(28,8)").alias("sd"),
        F.sum("n_c").cast("bigint").alias("n"),
    )
    sd_d = F.col("sd").cast("double")
    gsum = perd.agg(
        F.sum(F.round(sd_d * sd_d / F.col("n"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("g")
    )
    out = sizes.crossJoin(F.broadcast(wsum)).crossJoin(F.broadcast(gsum))
    b = F.col("b_part") - F.col("g")
    return out.select(
        "n",
        F.col("k").cast("int").alias("k"),
        b.alias("between_scatter"),
        F.col("w").alias("within_scatter"),
        ((b / (F.col("k") - 1)) / (F.col("w") / (F.col("n") - F.col("k")))).alias(
            "calinski_harabasz"
        ),
    )


# ---------------------------------------------------------------------------
# LM: Good-Turing frequency-of-frequencies + unseen-mass estimate —
# p0 = N1/N (Good 1953), the smoothing statistic every count-based LM
# and species-richness estimator starts from. Pure integer pipeline:
# term counts → count-of-counts → one ratio.
# ---------------------------------------------------------------------------
@query(
    "lm_good_turing",
    f"""
    WITH toks AS (SELECT UNNEST({_TOKS_SQL}) AS term FROM documents),
    tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY term),
    fof AS (SELECT c AS freq, CAST(COUNT(*) AS BIGINT) AS n_types
            FROM tc GROUP BY c),
    tot AS (
      SELECT CAST(SUM(freq * n_types) AS BIGINT) AS n_tokens,
             CAST(SUM(n_types) AS BIGINT) AS n_types_total,
             CAST(MAX(CASE WHEN freq = 1 THEN n_types ELSE 0 END) AS BIGINT) AS n1
      FROM fof)
    SELECT f.freq, f.n_types,
           t.n_tokens, t.n_types_total,
           CAST(t.n1 AS DOUBLE) / t.n_tokens AS p_unseen
    FROM fof f CROSS JOIN tot t
    WHERE f.freq <= 10
    ORDER BY f.freq
    """,
)
def lm_good_turing(spark, sf_dir):
    """Frequency-of-frequencies table (freq ≤ 10) + Good-Turing unseen
    mass N1/N: two stacked hash-aggs (term counts, then count-of-counts
    — the second is vocabulary-rate) and a 1-row total broadcast."""
    from ..llmdata.text import _norm

    d = t(spark, sf_dir, "documents")
    tc = (
        d.select(F.explode(F.split(_norm("text"), " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    fof = tc.groupBy(F.col("c").alias("freq")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types")
    )
    tot = fof.agg(
        F.sum(F.col("freq") * F.col("n_types")).cast("bigint").alias("n_tokens"),
        F.sum("n_types").cast("bigint").alias("n_types_total"),
        F.max(F.when(F.col("freq") == 1, F.col("n_types")).otherwise(0))
        .cast("bigint")
        .alias("n1"),
    )
    return (
        fof.crossJoin(F.broadcast(tot))
        .filter(F.col("freq") <= 10)
        .select(
            "freq",
            "n_types",
            "n_tokens",
            "n_types_total",
            (F.col("n1").cast("double") / F.col("n_tokens")).alias("p_unseen"),
        )
        .orderBy("freq")
    )


# ---------------------------------------------------------------------------
# ts: single best changepoint per event-type series (the first split of
# binary segmentation, Scott & Knott / Killick's PELT cost): choose k
# maximizing  S_k²/k + (T−S_k)²/(n−k)  — equivalently minimizing the
# two-segment SSE, since Σx² is constant in k. Prefix sums ride ONE
# cumulative window per series; values go through the exact decimal cast
# (dsum convention) so S_k is bit-identical across engines/partitionings,
# and the objective is pure IEEE *,/,+ on (exact-decimal → double) inputs —
# no libm, so the argmax and the reported gain agree exactly. Ties on the
# objective break to the earliest k. At 100 TB the per-series cumulative
# is the standard parallel-prefix shape; series count scales with keys.
# ---------------------------------------------------------------------------
@query(
    "ts_changepoint",
    """
    WITH e AS (
      SELECT event_type, ts, event_id, CAST(value AS DECIMAL(28,4)) AS v
      FROM events),
    pre AS (
      SELECT event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS k,
             SUM(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sk
      FROM e),
    tot AS (SELECT event_type, COUNT(*) AS n, SUM(v) AS tv FROM e GROUP BY event_type),
    scored AS (
      SELECT p.event_type, p.ts, p.k, t.n,
             CAST(p.sk AS DOUBLE) * CAST(p.sk AS DOUBLE) / p.k
             + (CAST(t.tv AS DOUBLE) - CAST(p.sk AS DOUBLE))
               * (CAST(t.tv AS DOUBLE) - CAST(p.sk AS DOUBLE)) / (t.n - p.k) AS obj,
             CAST(t.tv AS DOUBLE) * CAST(t.tv AS DOUBLE) / t.n AS base
      FROM pre p JOIN tot t USING (event_type)
      WHERE p.k < t.n),
    best AS (
      SELECT event_type, ts, k, n, obj, base,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY obj DESC, k) AS rn
      FROM scored)
    SELECT event_type, CAST(n AS BIGINT) AS n_obs, CAST(k AS BIGINT) AS split_k,
           ts AS split_ts, ROUND((obj - base) * 1000000) / 1000000.0 AS sse_gain
    FROM best WHERE rn = 1 ORDER BY event_type
    """,
)
def ts_changepoint(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", F.col("value").cast("decimal(28,4)").alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pre = e.select(
        "event_type",
        "ts",
        F.row_number().over(w).alias("k"),
        F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("sk"),
    )
    tot = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("tv")
    )
    skd = F.col("sk").cast("double")
    tvd = F.col("tv").cast("double")
    scored = (
        pre.join(F.broadcast(tot), "event_type")
        .filter(F.col("k") < F.col("n"))
        .select(
            "event_type",
            "ts",
            "k",
            "n",
            (skd * skd / F.col("k") + (tvd - skd) * (tvd - skd) / (F.col("n") - F.col("k"))).alias("obj"),
            (tvd * tvd / F.col("n")).alias("base"),
        )
    )
    best = scored.groupBy("event_type").agg(
        F.expr(
            "max_by(named_struct('ts', ts, 'k', k, 'n', n, 'obj', obj, 'base', base),"
            " named_struct('o', obj, 'i', -k))"
        ).alias("m")
    )
    return best.select(
        "event_type",
        F.col("m.n").cast("bigint").alias("n_obs"),
        F.col("m.k").cast("bigint").alias("split_k"),
        F.col("m.ts").alias("split_ts"),
        (F.round((F.col("m.obj") - F.col("m.base")) * 1000000.0) / 1000000.0).alias("sse_gain"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# quality: Mann-Whitney U rank-sum test — do 'click' and 'purchase' event
# values come from the same distribution? The nonparametric two-sample
# location test complementing q15_ks_test (max-CDF-gap) and q13_mad. Exact
# integer ladder: ranks are computed over the DISTINCT-value frame
# (tie-average rank ×2 = 2·cum(c) − c + 1 stays integral), so U×2 is exact
# in both engines; the only double is the z-score whose inputs are integers
# and whose ops (*, /, sqrt) are all IEEE-correctly-rounded — no libm risk.
# The cumulative runs over the distinct-value frame (pre-shrunk by the
# groupBy), the standard parallel-prefix shape.
# ---------------------------------------------------------------------------
@query(
    "q18_mannwhitney",
    """
    WITH ab AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS isa
      FROM events WHERE event_type IN ('click', 'purchase')),
    g AS (SELECT value, CAST(SUM(isa) AS BIGINT) AS ca, CAST(COUNT(*) AS BIGINT) AS c
          FROM ab GROUP BY value),
    cum AS (SELECT value, ca, c,
                   SUM(c) OVER (ORDER BY value
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
            FROM g),
    agg AS (SELECT CAST(SUM(ca * (2 * cm - c + 1)) AS BIGINT) AS ra2,
                   CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(SUM(c - ca) AS BIGINT) AS nb
            FROM cum)
    SELECT na AS n_click, nb AS n_purchase,
           CAST(ra2 - na * (na + 1) AS BIGINT) AS u_click_x2,
           CAST(2 * na * nb - (ra2 - na * (na + 1)) AS BIGINT) AS u_purchase_x2,
           ROUND(((ra2 - na * (na + 1)) / 2.0 - na * nb / 2.0)
                 / sqrt(na * nb * (na + nb + 1) / 12.0) * 1000000) / 1000000.0 AS z
    FROM agg
    """,
)
def q18_mannwhitney(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    ab = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "value", F.when(F.col("event_type") == "click", 1).otherwise(0).alias("isa")
    )
    g = ab.groupBy("value").agg(
        F.sum("isa").cast("bigint").alias("ca"), F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = g.withColumn("cm", F.sum("c").over(w))
    agg = cum.agg(
        F.sum(F.col("ca") * (2 * F.col("cm") - F.col("c") + 1)).cast("bigint").alias("ra2"),
        F.sum("ca").cast("bigint").alias("na"),
        F.sum(F.col("c") - F.col("ca")).cast("bigint").alias("nb"),
    )
    ua2 = F.col("ra2") - F.col("na") * (F.col("na") + 1)
    return agg.select(
        F.col("na").alias("n_click"),
        F.col("nb").alias("n_purchase"),
        ua2.cast("bigint").alias("u_click_x2"),
        (2 * F.col("na") * F.col("nb") - ua2).cast("bigint").alias("u_purchase_x2"),
        (
            F.round(
                (ua2 / 2.0 - F.col("na") * F.col("nb") / 2.0)
                / F.sqrt(F.col("na") * F.col("nb") * (F.col("na") + F.col("nb") + 1) / 12.0)
                * 1000000.0
            )
            / 1000000.0
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# window: Bollinger-band breakouts — per event-type series, rows whose value
# leaves the trailing-20 mean ± 2σ band (current row excluded from the
# band, so a spike cannot mask itself). The volatility-band member of the
# rolling family (w4 trailing mean, w14 rolling median, w15 drawdown).
# Determinism: the frame sums run in exact DECIMAL (value and value² both
# exact at (18,4)/(37,8)), the band math is IEEE *,/,sqrt on those exact
# sums cast to double, and only full 20-row frames emit — so the breakout
# comparison itself is engine-exact; reported stats use the integer-domain
# round ladder.
# ---------------------------------------------------------------------------
@query(
    "w16_bollinger",
    """
    WITH e AS (
      SELECT event_type, ts, event_id, value,
             CAST(value AS DECIMAL(18,4)) AS v
      FROM events),
    fr AS (
      SELECT event_type, ts, event_id, value,
             COUNT(*)  OVER w AS n20,
             CAST(SUM(v) OVER w AS DOUBLE) AS s1,
             CAST(SUM(v * v) OVER w AS DOUBLE) AS s2
      FROM e
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
    band AS (
      SELECT event_type, ts, event_id, value,
             s1 / 20 AS m,
             sqrt(GREATEST(s2 / 20 - (s1 / 20) * (s1 / 20), 0.0)) AS sd
      FROM fr WHERE n20 = 20)
    SELECT event_type, ts, event_id, value,
           ROUND(m * 1000000) / 1000000.0 AS band_mean,
           ROUND(sd * 1000000) / 1000000.0 AS band_sd,
           CASE WHEN value > m + 2 * sd THEN 'UP' ELSE 'DOWN' END AS breakout
    FROM band
    WHERE value > m + 2 * sd OR value < m - 2 * sd
    ORDER BY event_type, ts, event_id
    """,
)
def w16_bollinger(spark, sf_dir):
    """Scale-safe since r9: the 20-row frame runs per (event_type, __chunk)
    over overlap-chunked series (`with_overlap_chunks`, 20 context rows per
    chunk) — exact by construction for the fixed ROWS frame, and the sort is
    ~series/8192 parallel tasks instead of one task per event_type (a
    5-value key: one ~20M-row single-task sort per series at 100×)."""
    from pyspark.sql import Window

    from ..operators.windows import with_overlap_chunks

    e = t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value",
        F.col("value").cast("decimal(18,4)").alias("v"),
    )
    ck = with_overlap_chunks(
        e, ["event_type"], ["ts", "event_id"],
        bucket=F.col("ts").cast("date"), overlap=20,
    )
    w = (
        Window.partitionBy("event_type", "__chunk")
        .orderBy("__rn")
        .rowsBetween(-20, -1)
    )
    fr = ck.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        "__is_ctx",
        F.count(F.lit(1)).over(w).alias("n20"),
        F.sum("v").over(w).cast("double").alias("s1"),
        F.sum(F.col("v") * F.col("v")).over(w).cast("double").alias("s2"),
    ).filter((F.col("n20") == 20) & ~F.col("__is_ctx")).drop("__is_ctx")
    m = F.col("s1") / 20
    sd = F.sqrt(F.greatest(F.col("s2") / 20 - m * m, F.lit(0.0)))
    return (
        fr.select(
            "event_type",
            "ts",
            "event_id",
            "value",
            (F.round(m * 1000000.0) / 1000000.0).alias("band_mean"),
            (F.round(sd * 1000000.0) / 1000000.0).alias("band_sd"),
            F.when(F.col("value") > m + 2 * sd, "UP").otherwise("DOWN").alias("breakout"),
            m.alias("_m"),
            sd.alias("_sd"),
        )
        .filter((F.col("value") > F.col("_m") + 2 * F.col("_sd"))
                | (F.col("value") < F.col("_m") - 2 * F.col("_sd")))
        .drop("_m", "_sd")
        .orderBy("event_type", "ts", "event_id")
    )


# ---------------------------------------------------------------------------
# llm: curriculum ordering — stage the training corpus easiest-first
# (curriculum learning, Bengio 2009): difficulty = average word length as
# an exact integer ppm (total word chars = length(norm) − (n_tokens − 1)
# since norm is single-space joined — pure codegen arithmetic, no HOF),
# 4 curriculum stages by NTILE over (difficulty, doc_id). The global NTILE
# runs over the (difficulty_ppm, doc_id) integer pairs — the standard
# rank/split shape llm_shuffle_order and o6 pagination already use.
# ---------------------------------------------------------------------------
@query(
    "llm_curriculum_order",
    f"""
    WITH tk AS (
      SELECT doc_id, length({_NORM_SQL}) AS n_norm_chars, len({_TOKS_SQL}) AS n_tokens
      FROM documents
      WHERE length({_NORM_SQL}) > 0),
    d AS (
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(((n_norm_chars - n_tokens + 1) * 1000000) // n_tokens AS BIGINT)
               AS difficulty_ppm
      FROM tk)
    SELECT doc_id, n_tokens, difficulty_ppm,
           CAST(NTILE(4) OVER (ORDER BY difficulty_ppm, doc_id) AS INT) AS stage
    FROM d ORDER BY doc_id
    """,
)
def llm_curriculum_order(spark, sf_dir):
    from ..llmdata.text import _norm
    from ..operators.windows import exact_ntile, with_global_index

    d = t(spark, sf_dir, "documents", restore=True)
    tk = d.select(
        "doc_id",
        F.length(_norm("text")).alias("n_norm_chars"),
        F.size(F.split(_norm("text"), " ")).alias("n_tokens"),
    ).filter(F.col("n_norm_chars") > 0)
    # BIGINT widen before *1e6: length()/size() are IntegerType in Spark and
    # wrap for docs >= ~2148 norm chars, while DuckDB's length() is BIGINT.
    dd = tk.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.expr(
            "CAST((CAST(n_norm_chars - n_tokens + 1 AS BIGINT) * 1000000)"
            " div n_tokens AS BIGINT)"
        ).alias("difficulty_ppm"),
    )
    # r10 (VERDICT r9 #1): the global NTILE used to run as
    # Window.orderBy(difficulty, doc_id) with no partitionBy — one task
    # holding the whole corpus. Now: exact global row number via the
    # two-phase device bucketed by a difficulty band (order-consistent
    # coarsening; ppm resolution makes the bands fine-grained), then the
    # SQL-standard NTILE formula from (rn, n) in integer arithmetic.
    ranked = with_global_index(
        dd,
        [F.col("difficulty_ppm").asc(), F.col("doc_id").asc()],
        bucket=F.expr("difficulty_ppm div 10000"),
        out="__rn",
        total_col="__n",
    )
    return ranked.select(
        "doc_id",
        "n_tokens",
        "difficulty_ppm",
        exact_ntile("__rn", "__n", 4).alias("stage"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# llm: CCNet-style perplexity filter buckets (Wenzek et al., LREC 2020) —
# the operational layer on lm_bigram_nll: rank every doc by its corpus-LM
# mean surprisal, split into head/middle/tail terciles, and report the
# keep/cull decision per (bucket, source) with token mass — CCNet trains
# on head+middle and culls the tail. Per-doc scores come from the same
# bigram_nll operator (rounded 6dp, so the tercile ordering is
# engine-exact); the NTILE runs over (score, doc_id) integer-ish pairs.
# ---------------------------------------------------------------------------
@query(
    "llm_perplexity_buckets",
    f"""
    WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    pairs AS (
      SELECT doc_id,
             UNNEST(list_transform(range(2, len(tk) + 1),
                                   i -> struct_pack(w1 := tk[i-1], w2 := tk[i]))) AS bg
      FROM tk),
    p AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM pairs),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM p GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
    vocab AS (SELECT COUNT(DISTINCT w) * 1.0 AS v
              FROM (SELECT UNNEST(tk) AS w FROM tk)),
    scored AS (
      SELECT p.doc_id, ROUND(-LN((c2.c2 + 1.0) / (c1.c1 + vocab.v)), 8) AS s
      FROM p JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab),
    perdoc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             ROUND(CAST(SUM(CAST(s AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*) * 1000000.0)
               / 1000000.0 AS nll
      FROM scored GROUP BY doc_id),
    tiled AS (
      SELECT d.source, p.doc_id, p.n_bigrams, p.nll,
             NTILE(3) OVER (ORDER BY p.nll, p.doc_id) AS tile
      FROM perdoc p JOIN documents d USING (doc_id))
    SELECT CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
           source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(CAST(nll AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) * 1000000.0)
             / 1000000.0 AS avg_nll,
           tile < 3 AS keep
    FROM tiled GROUP BY tile, source ORDER BY tile, source
    """,
)
def llm_perplexity_buckets(spark, sf_dir):
    from ..llmdata.text import bigram_nll
    from ..operators.windows import exact_ntile, with_global_index

    d = t(spark, sf_dir, "documents", restore=True)
    perdoc = bigram_nll(d).select(
        "doc_id", "n_bigrams", F.col("avg_bigram_nll").alias("nll")
    )
    # r10: the tercile NTILE ran partition-less over the per-doc frame
    # (corpus-rate = one task at scale). floor(nll*10) is a monotone
    # coarsening of the leading sort key, so the two-phase device gives the
    # identical global rank distributed across the nll bands.
    ranked = with_global_index(
        perdoc.join(d.select("doc_id", "source"), "doc_id"),
        [F.col("nll").asc(), F.col("doc_id").asc()],
        bucket=F.expr("CAST(floor(nll * 10) AS BIGINT)"),
        out="__rn",
        total_col="__n",
    )
    tiled = ranked.select(
        "source",
        "n_bigrams",
        "nll",
        exact_ntile("__rn", "__n", 3).alias("tile"),
    )
    return (
        tiled.groupBy("tile", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
            (
                F.round(
                    F.sum(F.col("nll").cast("decimal(28,6)")).cast("double")
                    / F.count(F.lit(1))
                    * 1000000.0
                )
                / 1000000.0
            ).alias("avg_nll"),
        )
        .select(
            F.when(F.col("tile") == 1, "head")
            .when(F.col("tile") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
            "source",
            "n_docs",
            "n_bigrams",
            "avg_nll",
            (F.col("tile") < 3).alias("keep"),
        )
        .orderBy("tile", "source")
    )


# ---------------------------------------------------------------------------
# ts: lead-lag cross-correlation — Pearson corr between the daily 'click'
# count and the 'purchase' count L days LATER, for lags 0..5 (does click
# volume predict purchases?). The lead-lag member of the correlation
# family (ts_corr_pairs contemporaneous, ts_spearman_corr rank, ts_acf
# self-lag). Exact ladder: the daily series are integer counts, every
# moment (n, Σx, Σy, Σxy, Σx², Σy²) is an exact BIGINT, and the only
# doubles are one division and one IEEE sqrt at the end. The 6-row lag
# spine broadcasts; days join on an integer day index.
# ---------------------------------------------------------------------------
@query(
    "ts_cross_correlation",
    """
    WITH daily AS (
      SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
      FROM events GROUP BY 1),
    lags AS (SELECT UNNEST(range(0, 6)) AS lag),
    paired AS (
      SELECT l.lag, a.x, b.y
      FROM lags l
      JOIN daily a ON TRUE
      JOIN daily b ON b.di = a.di + l.lag),
    m AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
      FROM paired GROUP BY lag)
    SELECT CAST(lag AS INT) AS lag, n AS n_days,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy))
                 * 1000000) / 1000000.0 AS xcorr
    FROM m ORDER BY lag
    """,
)
def ts_cross_correlation(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
        .select(
            F.datediff("d", F.lit("2024-01-01").cast("date")).cast("bigint").alias("di"),
            "x",
            "y",
        )
    )
    lags = spark.range(0, 6).select(F.col("id").alias("lag"))
    a = daily.select("di", "x")
    b = daily.select(F.col("di").alias("dj"), "y")
    paired = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("dj") == F.col("di") + F.col("lag"))
    )
    m = paired.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * 1.0
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_days"),
        (F.round(num / den * 1000000.0) / 1000000.0).alias("xcorr"),
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# LM: Kneser-Ney continuation probability — the KN-smoothing backoff term:
# P_cont(w) = |distinct left contexts of w| / |distinct bigram types|.
# Ranks words by how PROMISCUOUSLY they continue contexts rather than raw
# frequency (the "san francisco" correction: 'francisco' is frequent but
# follows only 'san', so its continuation mass is tiny). Completes the
# smoothing family next to lm_good_turing. Pure integer ladder: distinct
# bigram types, distinct contexts, ppb floor-div share; top-20 by
# (n_contexts DESC, word).
# ---------------------------------------------------------------------------
@query(
    "lm_kneser_ney_cont",
    f"""
    WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    pairs AS (
      SELECT UNNEST(list_transform(range(2, len(tk) + 1),
                                   i -> struct_pack(w1 := tk[i-1], w2 := tk[i]))) AS bg
      FROM tk),
    types AS (SELECT DISTINCT bg.w1 AS w1, bg.w2 AS w2 FROM pairs),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM types),
    cont AS (SELECT w2 AS word, CAST(COUNT(*) AS BIGINT) AS n_contexts
             FROM types GROUP BY w2),
    ranked AS (
      SELECT word, n_contexts,
             ROW_NUMBER() OVER (ORDER BY n_contexts DESC, word) AS rnk
      FROM cont)
    SELECT r.word, r.n_contexts,
           CAST((r.n_contexts * 1000000000) // t.n_types AS BIGINT) AS p_cont_ppb,
           CAST(r.rnk AS INT) AS rank
    FROM ranked r CROSS JOIN tot t
    WHERE r.rnk <= 20 ORDER BY r.rnk
    """,
)
def lm_kneser_ney_cont(spark, sf_dir):
    from pyspark.sql import Window

    from ..llmdata.text import _norm

    d = t(spark, sf_dir, "documents", restore=True)
    toks = d.select(F.split(_norm("text"), " ").alias("tk"))
    pair_list = F.when(
        F.size("tk") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("tk") - 2),
            lambda i: F.struct(
                F.get("tk", i).alias("w1"), F.get("tk", i + 1).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    types = (
        toks.select(F.explode(pair_list).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .distinct()
    )
    tot = types.agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    cont = types.groupBy(F.col("w2").alias("word")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_contexts")
    )
    w = Window.orderBy(F.desc("n_contexts"), F.asc("word"))
    return (
        cont.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .crossJoin(F.broadcast(tot))
        .select(
            "word",
            "n_contexts",
            F.expr("CAST((n_contexts * 1000000000) div n_types AS BIGINT)").alias(
                "p_cont_ppb"
            ),
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# dedup: cross-snapshot dedup rate — the recrawl-triage mart over the
# near-dup machinery: with doc_id % 3 playing three crawl snapshots, what
# fraction of each snapshot's docs already near-duplicate an EARLIER
# snapshot's doc (or an earlier doc of the same snapshot)? This is the
# text twin of dd_semdedup's min-id survivor rule and the batch view of
# the incremental MinHash index (streaming/incremental.py): at 100 TB the
# per-snapshot rate is what decides whether a recrawl is worth keeping.
# Pairs come from the df-capped (max_shingle_df=50) 5-gram Jaccard join —
# the same bounded plan as dd_minhash_estimate's exact side.
# ---------------------------------------------------------------------------
@query(
    "dd_snapshot_dedup_rate",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    sh AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, greatest(len(tk) - 3, 2)),
                       i -> array_to_string(tk[i:i+4], ' ')))) AS shingle
      FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS set_size FROM sh GROUP BY doc_id),
    cold AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 50),
    shc AS (SELECT s.doc_id, s.shingle FROM sh s JOIN cold USING (shingle)),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (
      SELECT c.id_a, c.id_b
      FROM common c
      JOIN sizes sa ON c.id_a = sa.doc_id
      JOIN sizes sb ON c.id_b = sb.doc_id
      WHERE ROUND(c.c * 1.0 / (sa.set_size + sb.set_size - c.c), 6) >= 0.5),
    lab AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS snap FROM documents),
    sym AS (SELECT id_a AS d, id_b AS p FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    dup AS (
      SELECT DISTINCT s.d AS doc_id
      FROM sym s
      JOIN lab ld ON s.d = ld.doc_id
      JOIN lab lp ON s.p = lp.doc_id
      WHERE lp.snap < ld.snap OR (lp.snap = ld.snap AND s.p < s.d))
    SELECT l.snap, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(dup.doc_id) AS BIGINT) AS n_dup_vs_earlier,
           CAST((COUNT(dup.doc_id) * 1000000) // COUNT(*) AS BIGINT) AS dup_rate_ppm
    FROM lab l LEFT JOIN dup ON l.doc_id = dup.doc_id
    GROUP BY l.snap ORDER BY l.snap
    """,
)
def dd_snapshot_dedup_rate(spark, sf_dir):
    from ..llmdata.dedup import ngram_jaccard_pairs

    d = t(spark, sf_dir, "documents", restore=True)
    pairs = ngram_jaccard_pairs(
        d, n=5, threshold=0.5, max_shingle_df=50
    ).select("id_a", "id_b")
    lab = d.select("doc_id", (F.col("doc_id") % 3).cast("int").alias("snap"))
    # symmetrize with ONE consumer of the expensive pair join (explode, not
    # union-of-two-selects — the union re-planned the whole df-capped
    # shingle self-join twice; same lesson as dd_minhash_estimate r8)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("id_a").alias("dd"), F.col("id_b").alias("p")),
                F.struct(F.col("id_b").alias("dd"), F.col("id_a").alias("p")),
            )
        ).alias("c")
    ).select("c.*")
    ld = lab.select(F.col("doc_id").alias("dd"), F.col("snap").alias("snap_d"))
    lp = lab.select(F.col("doc_id").alias("p"), F.col("snap").alias("snap_p"))
    dup = (
        sym.join(ld, "dd")
        .join(lp, "p")
        .filter(
            (F.col("snap_p") < F.col("snap_d"))
            | ((F.col("snap_p") == F.col("snap_d")) & (F.col("p") < F.col("dd")))
        )
        .select(F.col("dd").alias("doc_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    return (
        lab.join(dup, "doc_id", "left")
        .groupBy("snap")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count("is_dup").cast("bigint").alias("n_dup_vs_earlier"),
        )
        .select(
            "snap",
            "n_docs",
            "n_dup_vs_earlier",
            F.expr("CAST((n_dup_vs_earlier * 1000000) div n_docs AS BIGINT)").alias(
                "dup_rate_ppm"
            ),
        )
        .orderBy("snap")
    )


# ---------------------------------------------------------------------------
# ml eval: Murphy decomposition of the Brier score — BRIER = REL − RES +
# UNC over the reliability bins (ml/evaluate.py:brier_decomposition).
# Separates "the scores are miscalibrated" (reliability) from "the scores
# can't discriminate" (resolution) — the two failures ml_calibration_bins
# and ml_auc_ranksum each show only half of. One row; same fixed scorer
# and 8-dp-round + DECIMAL-sum ladder as the rest of the eval family.
# ---------------------------------------------------------------------------
@query(
    "ml_brier_decomposition",
    _SCORED_CTE
    + """,
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS npos,
             CAST(SUM(CAST(ROUND((score - y) * (score - y), 8) AS DECIMAL(28,8))) AS DOUBLE) AS sq
      FROM scored),
    per AS (
      SELECT LEAST(CAST(FLOOR(score * 10) AS INT), 9) AS bin,
             CAST(COUNT(*) AS BIGINT) AS nk,
             CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS sp,
             CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS pk
      FROM scored GROUP BY 1),
    terms AS (
      SELECT
        CAST(SUM(CAST(ROUND(nk * (sp/nk - pk*1.0/nk) * (sp/nk - pk*1.0/nk), 8)
                      AS DECIMAL(28,8))) AS DOUBLE) AS rel_num,
        CAST(SUM(CAST(ROUND(nk * (pk*1.0/nk - npos*1.0/n) * (pk*1.0/nk - npos*1.0/n), 8)
                      AS DECIMAL(28,8))) AS DOUBLE) AS res_num,
        MAX(n) AS n, MAX(npos) AS npos, MAX(sq) AS sq
      FROM per CROSS JOIN tot)
    SELECT n AS n_obs,
           ROUND(sq / n * 1000000) / 1000000.0 AS brier,
           ROUND(rel_num / n * 1000000) / 1000000.0 AS reliability,
           ROUND(res_num / n * 1000000) / 1000000.0 AS resolution,
           ROUND((npos * 1.0 / n) * (1.0 - npos * 1.0 / n) * 1000000) / 1000000.0
             AS uncertainty,
           ROUND((sq / n - (rel_num / n - res_num / n
                  + (npos * 1.0 / n) * (1.0 - npos * 1.0 / n))) * 1000000) / 1000000.0
             AS binning_residual
    FROM terms
    """,
)
def ml_brier_decomposition(spark, sf_dir):
    from ..ml.evaluate import brier_decomposition, score_linear
    from ..ml.logreg import daily_count_features

    e = t(spark, sf_dir, "events")
    return brier_decomposition(score_linear(daily_count_features(e)))


# ---------------------------------------------------------------------------
# window: RSI-14 (Wilder's relative strength index, simple-average form) —
# per event-type series, emit overbought (>70) / oversold (<30) rows.
# Deltas are exact DECIMAL(18,4) differences of consecutive values, gains
# and losses split sign-wise, the 14-row frame sums stay in DECIMAL, and
# RSI = 100 − 100/(1 + avg_gain/avg_loss) is IEEE on the exact sums (the
# zero-loss frame pins RSI to 100 exactly). Only full 14-delta frames emit.
# ---------------------------------------------------------------------------
@query(
    "w17_rsi",
    """
    WITH e AS (
      SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,4)) AS v
      FROM events),
    d AS (
      SELECT event_type, ts, event_id, v,
             v - LAG(v) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dv
      FROM e),
    g AS (
      SELECT event_type, ts, event_id, v,
             CASE WHEN dv > 0 THEN dv ELSE CAST(0 AS DECIMAL(18,4)) END AS gain,
             CASE WHEN dv < 0 THEN -dv ELSE CAST(0 AS DECIMAL(18,4)) END AS loss
      FROM d WHERE dv IS NOT NULL),
    fr AS (
      SELECT event_type, ts, event_id, v,
             COUNT(*) OVER w AS n14,
             CAST(SUM(gain) OVER w AS DOUBLE) AS sg,
             CAST(SUM(loss) OVER w AS DOUBLE) AS sl
      FROM g
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
    rsi AS (
      SELECT event_type, ts, event_id, CAST(v AS DOUBLE) AS value,
             CASE WHEN sl = 0 THEN 100.0
                  ELSE ROUND((100.0 - 100.0 / (1.0 + sg / sl)) * 1000000) / 1000000.0
             END AS rsi14
      FROM fr WHERE n14 = 14)
    SELECT event_type, ts, event_id, value, rsi14,
           CASE WHEN rsi14 > 70 THEN 'OVERBOUGHT' ELSE 'OVERSOLD' END AS signal
    FROM rsi WHERE rsi14 > 70 OR rsi14 < 30
    ORDER BY event_type, ts, event_id
    """,
)
def w17_rsi(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", F.col("value").cast("decimal(18,4)").alias("v")
    )
    # Scale-safe since r9: lag + the 14-row frame run per (event_type,
    # __chunk) over overlap-chunked series (14 context rows: 1 for the lag
    # delta + 13 for the frame). Exact: every emitted row's frame covers
    # g-rows rn-13..rn, each of whose deltas needs raw rows rn-14..rn — all
    # inside the chunk. The chunk's FIRST context row gets an in-chunk null
    # delta (its predecessor is out of chunk) and drops from g, but it sits
    # at rn-14 in delta space — strictly outside every emitted frame. The
    # group's true first row keeps its null delta in chunk 0, matching the
    # global plan. Previously: one single-task ~20M-row sort per event_type
    # at 100x (5-value key).
    from ..operators.windows import with_overlap_chunks

    ck = with_overlap_chunks(
        e, ["event_type"], ["ts", "event_id"],
        bucket=F.col("ts").cast("date"), overlap=14,
    )
    wck = Window.partitionBy("event_type", "__chunk").orderBy("__rn")
    d = ck.withColumn("dv", F.col("v") - F.lag("v").over(wck)).filter(
        F.col("dv").isNotNull()
    )
    zero = F.lit(0).cast("decimal(18,4)")
    g = d.select(
        "event_type",
        "ts",
        "event_id",
        "v",
        "__chunk",
        "__rn",
        "__is_ctx",
        F.when(F.col("dv") > 0, F.col("dv")).otherwise(zero).alias("gain"),
        F.when(F.col("dv") < 0, -F.col("dv")).otherwise(zero).alias("loss"),
    )
    wfr = wck.rowsBetween(-13, 0)
    fr = g.select(
        "event_type",
        "ts",
        "event_id",
        "v",
        "__is_ctx",
        F.count(F.lit(1)).over(wfr).alias("n14"),
        F.sum("gain").over(wfr).cast("double").alias("sg"),
        F.sum("loss").over(wfr).cast("double").alias("sl"),
    ).filter((F.col("n14") == 14) & ~F.col("__is_ctx")).drop("__is_ctx")
    rsi = F.when(F.col("sl") == 0, F.lit(100.0)).otherwise(
        F.round((100.0 - 100.0 / (1.0 + F.col("sg") / F.col("sl"))) * 1000000.0)
        / 1000000.0
    )
    return (
        fr.select(
            "event_type",
            "ts",
            "event_id",
            F.col("v").cast("double").alias("value"),
            rsi.alias("rsi14"),
        )
        .filter((F.col("rsi14") > 70) | (F.col("rsi14") < 30))
        .withColumn(
            "signal",
            F.when(F.col("rsi14") > 70, "OVERBOUGHT").otherwise("OVERSOLD"),
        )
        .orderBy("event_type", "ts", "event_id")
    )


# ---------------------------------------------------------------------------
# text: code-vs-prose routing signals — LLM curation pipelines route code
# to different tokenization/dedup than prose; this emits the standard
# detector features per doc (symbol density, brace/bracket density, digit
# share, avg token length) and the routed label. All exact integer ppm
# ladders over regexp counts — pure codegen column exprs, no UDF, one scan.
# ---------------------------------------------------------------------------
@query(
    "tx_code_detect",
    """
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[{}\\[\\]();=<>+*/&|^%#]', '', 'g'))
               AS n_sym,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
      FROM documents WHERE length(text) > 0)
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST((n_sym * 1000000) // n_chars AS BIGINT) AS sym_ppm,
           CAST((n_digit * 1000000) // n_chars AS BIGINT) AS digit_ppm,
           (n_sym * 1000000) // n_chars >= 30000 AS looks_like_code
    FROM f ORDER BY doc_id
    """,
)
def tx_code_detect(spark, sf_dir):
    d = t(spark, sf_dir, "documents", restore=True).filter(F.length("text") > 0)
    n_chars = F.length("text")
    n_sym = n_chars - F.length(
        F.regexp_replace("text", r"[{}\[\]();=<>+*/&|^%#]", "")
    )
    n_digit = n_chars - F.length(F.regexp_replace("text", "[0-9]", ""))
    f = d.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_sym.alias("n_sym"),
        n_digit.alias("n_digit"),
    )
    # BIGINT widen BEFORE the *1e6 multiply: F.length is IntegerType, so an
    # int multiply silently wraps for docs >= ~2148 chars in non-ANSI Spark
    # while the DuckDB oracle's length() is already BIGINT.
    return f.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.expr(
            "CAST((CAST(n_sym AS BIGINT) * 1000000) div n_chars AS BIGINT)"
        ).alias("sym_ppm"),
        F.expr(
            "CAST((CAST(n_digit AS BIGINT) * 1000000) div n_chars AS BIGINT)"
        ).alias("digit_ppm"),
        F.expr(
            "(CAST(n_sym AS BIGINT) * 1000000) div n_chars >= 30000"
        ).alias("looks_like_code"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# quality: referential-integrity orphan audit — every TPC-H foreign key
# checked with one LEFT ANTI join per edge, reported as a 6-row mart
# (relationship, child rows, orphan rows, orphan ppm). The dbt-style
# `relationships` test q10_test_suite's column tests don't cover; at 100 TB
# each edge is one broadcast- or shuffle-anti join, no window, no collect.
# ---------------------------------------------------------------------------
@query(
    "q19_fk_orphans",
    """
    WITH checks AS (
      SELECT 'lineitem.l_orderkey->orders' AS relationship,
             (SELECT COUNT(*) FROM lineitem) AS n_child,
             (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
               ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS n_orphan
      UNION ALL
      SELECT 'lineitem.l_partkey->part',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
               ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s
               ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL)
      UNION ALL
      SELECT 'orders.o_custkey->customer',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders o LEFT JOIN customer c
               ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer c LEFT JOIN nation n
               ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
      UNION ALL
      SELECT 'supplier.s_nationkey->nation',
             (SELECT COUNT(*) FROM supplier),
             (SELECT COUNT(*) FROM supplier s LEFT JOIN nation n
               ON s.s_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL))
    SELECT relationship, CAST(n_child AS BIGINT) AS n_child,
           CAST(n_orphan AS BIGINT) AS n_orphan,
           CAST((n_orphan * 1000000) // n_child AS BIGINT) AS orphan_ppm
    FROM checks ORDER BY relationship
    """,
)
def q19_fk_orphans(spark, sf_dir):
    """All six edges assemble into ONE lazy plan (unioned 1-row aggregate
    pairs, no driver-side counts/collects); each anti join broadcasts the
    parent key column when small, AQE picks shuffle-anti otherwise."""

    def edge(name, child, ckey, parent, pkey):
        n_child = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
        n_orphan = child.join(parent, child[ckey] == parent[pkey], "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orphan")
        )
        return n_child.crossJoin(n_orphan).select(
            F.lit(name).alias("relationship"), "n_child", "n_orphan"
        )

    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    edges = [
        edge("lineitem.l_orderkey->orders", l, "l_orderkey",
             o.select("o_orderkey"), "o_orderkey"),
        edge("lineitem.l_partkey->part", l, "l_partkey",
             t(spark, sf_dir, "part").select("p_partkey"), "p_partkey"),
        edge("lineitem.l_suppkey->supplier", l, "l_suppkey",
             t(spark, sf_dir, "supplier").select("s_suppkey"), "s_suppkey"),
        edge("orders.o_custkey->customer", o, "o_custkey",
             t(spark, sf_dir, "customer").select("c_custkey"), "c_custkey"),
        edge("customer.c_nationkey->nation", t(spark, sf_dir, "customer"),
             "c_nationkey", t(spark, sf_dir, "nation").select("n_nationkey"),
             "n_nationkey"),
        edge("supplier.s_nationkey->nation", t(spark, sf_dir, "supplier"),
             "s_nationkey",
             t(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nk2")),
             "nk2"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out.select(
        "relationship",
        "n_child",
        "n_orphan",
        F.expr("CAST((n_orphan * 1000000) div n_child AS BIGINT)").alias("orphan_ppm"),
    ).orderBy("relationship")


# ---------------------------------------------------------------------------
# similarity: Matryoshka truncated-prefix ANN (scale path — no SQL oracle;
# self-validating recall_at_k per row, see sim_lsh_topk). Stage 1 scores
# only the first 16 of 64 dims (4x flop cut on the corpus pass), stage 2
# exact-re-ranks the 8k-oversampled shortlist — the dimension-reduction
# member of the ANN family next to IVF (candidate-bounded), LSH
# (bucket-bounded) and PQ (bytes-bounded).
# ---------------------------------------------------------------------------
@query("sim_truncated_rerank_topk")
def sim_truncated_rerank_topk(spark, sf_dir):
    from ..llmdata.similarity import truncated_rerank_topk, with_recall_vs_exact

    e = t(spark, sf_dir, "embeddings", restore=True)
    q = e.filter(F.col("vec_id") < 8)
    approx = truncated_rerank_topk(q, e, k=5, prefix_dims=16, oversample=8)
    return with_recall_vs_exact(approx, q, e, k=5).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# llm: mixture reweighting — the data-mixing step between corpus stats and
# the sampler (DoReMi-flavored, but the closed uniform-target form): give
# every (lang) domain weight target_share / current_share, capped at 5x to
# keep rare-domain variance bounded, so weighted sampling draws a uniform
# language mix from a skewed corpus. Exact ppm ladders end-to-end
# (floor-div); the output feeds llm_weighted_sample's priority draw.
# ---------------------------------------------------------------------------
@query(
    "llm_mixture_reweight",
    """
    WITH per AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k FROM per)
    SELECT p.lang, p.n_docs,
           CAST((p.n_docs * 1000000) // t.n AS BIGINT) AS share_ppm,
           CAST(LEAST((t.n * 1000000) // (t.k * p.n_docs), 5000000) AS BIGINT)
             AS weight_ppm,
           CAST(LEAST((t.n * 1000000) // (t.k * p.n_docs), 5000000) * p.n_docs
                AS BIGINT) AS weighted_mass
    FROM per p CROSS JOIN tot t ORDER BY p.lang
    """,
)
def llm_mixture_reweight(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            F.expr("CAST((n_docs * 1000000) div n AS BIGINT)").alias("share_ppm"),
            F.expr(
                "CAST(LEAST((n * 1000000) div (k * n_docs), 5000000) AS BIGINT)"
            ).alias("weight_ppm"),
            F.expr(
                "CAST(LEAST((n * 1000000) div (k * n_docs), 5000000) * n_docs AS BIGINT)"
            ).alias("weighted_mass"),
        )
        .orderBy("lang")
    )


def _hw_oracle(m: int = 7, alpha: float = 0.3, beta: float = 0.1, gamma: float = 0.2,
               horizons: tuple = (1, 2, 7)) -> str:
    """Generated Holt-Winters fold oracle: state string 'l|b|s1|..|sm'
    (DuckDB's list_reduce accumulator must equal the element type, so the
    (2+m)-component state is pipe-encoded; the VARCHAR round-trips are
    shortest-repr exact). Same IEEE step order as
    operators/windows.py:holt_winters_additive."""
    P = lambda i: f"CAST(string_split(acc,'|')[{i}] AS DOUBLE)"  # noqa: E731
    X = "CAST(x AS DOUBLE)"
    lnew = f"({alpha} * ({X} - {P(3)}) + {round(1-alpha,10)} * ({P(1)} + {P(2)}))"
    bnew = f"({beta} * ({lnew} - {P(1)}) + {round(1-beta,10)} * {P(2)})"
    snew = f"({gamma} * ({X} - {lnew}) + {round(1-gamma,10)} * {P(3)})"
    keep = " || '|' || ".join(
        f"string_split(acc,'|')[{i}]" for i in range(4, 3 + m)
    )
    newstate = (
        f"CAST({lnew} AS VARCHAR) || '|' || CAST({bnew} AS VARCHAR) || '|' || "
        f"{keep} || '|' || CAST({snew} AS VARCHAR)"
    )
    l0 = "(CAST((" + "+".join(f"vals[{i}]" for i in range(1, m + 1)) + f") AS DOUBLE) / {float(m)})"
    seas = " || '|' || ".join(
        f"CAST(CAST(vals[{i}] AS DOUBLE) - l0 AS VARCHAR)" for i in range(1, m + 1)
    )
    fcols = ",\n           ".join(
        f"ROUND((CAST(st[1] AS DOUBLE) + {float(h)} * CAST(st[2] AS DOUBLE)"
        f" + CAST(st[{2+h}] AS DOUBLE)) * 1000000) / 1000000.0 AS forecast_{h}"
        for h in horizons
    )
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    ser AS (
      SELECT event_type, list(c ORDER BY d) AS vals, COUNT(*) AS n_obs
      FROM daily GROUP BY event_type HAVING COUNT(*) >= {m + 1}),
    ini AS (SELECT event_type, vals, n_obs, {l0} AS l0 FROM ser),
    folded AS (
      SELECT event_type, n_obs,
             string_split(list_reduce(
               list_prepend(
                 CAST(l0 AS VARCHAR) || '|0.0|' || {seas},
                 list_transform(vals[{m + 1}:],
                                v -> CAST(CAST(v AS DOUBLE) AS VARCHAR))),
               (acc, x) -> {newstate}), '|') AS st
      FROM ini)
    SELECT event_type, CAST(n_obs AS BIGINT) AS n_obs,
           ROUND(CAST(st[1] AS DOUBLE) * 1000000) / 1000000.0 AS level,
           ROUND(CAST(st[2] AS DOUBLE) * 1000000) / 1000000.0 AS trend,
           {fcols}
    FROM folded ORDER BY event_type
    """


# ---------------------------------------------------------------------------
# ts: additive Holt-Winters over the per-type DAILY count series — the
# seasonal member of the smoothing family (w11 EWMA -> ts_holt_forecast ->
# this): level + trend + 7-day season, forecasts at h = 1, 2, 7. The fold
# runs over the PRE-AGGREGATED daily series (30 cells/group, not raw rows
# — bounded at any corpus scale); init is exact (BIGINT sum / m), each
# step is the identical IEEE expression in both engines, and the oracle
# string-codec round-trips are shortest-repr exact (the grouped_holt
# device, widened to a (2+m)-component state).
# ---------------------------------------------------------------------------
@query("ts_holt_winters", _hw_oracle(7, 0.3, 0.1, 0.2, (1, 2, 7)))
def ts_holt_winters(spark, sf_dir):
    from ..operators.windows import holt_winters_additive

    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return holt_winters_additive(
        daily, "c", ["event_type"], "d", m=7,
        alpha=0.3, beta=0.1, gamma=0.2, horizons=(1, 2, 7),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# ts: distributed time-series similarity search (the EDBT'19 "TS similarity
# search for streaming data in distributed systems" shape): each user's
# 30-day activity series is reduced to a 6-segment PAA profile (piecewise
# aggregate approximation — the iSAX building block; 5-day buckets of
# integer event counts, dense zero-filled), and a FIXED ≤20-user probe set
# broadcasts against the corpus for exact top-5 nearest profiles by
# squared euclidean distance. Distances are exact BIGINT sums of squared
# integer differences — no floats anywhere; ties break on neighbor id.
# Corpus side never shuffles for scoring (broadcast probes), one exchange
# builds the per-user profile — the brute_force_cosine_topk shape on PAA
# vectors. At 100 TB: profiles are a |users|-sized frame; the segment
# explode is a constant ×6.
# ---------------------------------------------------------------------------
@query(
    "ts_similarity_topk",
    """
    WITH ev AS (
      SELECT user_id,
             LEAST(GREATEST(
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) // 5,
               0), 5) AS seg
      FROM events),
    cnt AS (SELECT user_id, seg, CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY 1, 2),
    spine AS (
      SELECT u.user_id, s.seg
      FROM (SELECT DISTINCT user_id FROM ev) u
      CROSS JOIN (SELECT UNNEST(range(0, 6)) AS seg) s),
    vec AS (
      SELECT sp.user_id, list(COALESCE(c.c, 0) ORDER BY sp.seg) AS v
      FROM spine sp LEFT JOIN cnt c ON sp.user_id = c.user_id AND sp.seg = c.seg
      GROUP BY sp.user_id),
    probes AS (SELECT user_id AS probe_id, v AS pv FROM vec
               WHERE user_id % 100 = 1 AND user_id < 2000),
    scored AS (
      SELECT p.probe_id, c.user_id AS neighbor_id,
             CAST(list_sum(list_transform(list_zip(p.pv, c.v),
                                          q -> (q[1] - q[2]) * (q[1] - q[2]))) AS BIGINT)
               AS dist2
      FROM probes p JOIN vec c ON p.probe_id <> c.user_id),
    ranked AS (
      SELECT probe_id, neighbor_id, dist2,
             ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY dist2, neighbor_id) AS rnk
      FROM scored)
    SELECT probe_id, neighbor_id, dist2, CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 5 ORDER BY probe_id, rank
    """,
)
def ts_similarity_topk(spark, sf_dir):
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    # floor (not cast-truncate, which rounds toward zero) + clamp to [0, 5]:
    # an event before the epoch must land in seg 0 on both engines, and the
    # DuckDB oracle's `//` is floor division.
    ev = e.select(
        "user_id",
        F.least(
            F.greatest(
                F.floor(
                    F.datediff(
                        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
                    )
                    / 5
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(5),
        ).alias("seg"),
    )
    cnt = ev.groupBy("user_id", "seg").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    spine = ev.select("user_id").distinct().select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(5))).alias("seg")
    )
    vec = (
        spine.join(cnt, ["user_id", "seg"], "left")
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("seg").alias("k"), F.coalesce("c", F.lit(0)).alias("c"))
                    )
                ),
                lambda s: s["c"],
            ).alias("v")
        )
    )
    probes = vec.filter(
        (F.col("user_id") % 100 == 1) & (F.col("user_id") < 2000)
    ).select(F.col("user_id").alias("probe_id"), F.col("v").alias("pv"))
    scored = vec.join(
        F.broadcast(probes), F.col("probe_id") != F.col("user_id")
    ).select(
        "probe_id",
        F.col("user_id").alias("neighbor_id"),
        F.aggregate(
            F.zip_with(F.col("pv"), F.col("v"), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, d: acc + d,
        ).alias("dist2"),
    )
    w = Window.partitionBy("probe_id").orderBy("dist2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("probe_id", "neighbor_id", "dist2", F.col("rank").cast("int").alias("rank"))
        .orderBy("probe_id", "rank")
    )


# ---------------------------------------------------------------------------
# llm: effective token budget — the scaling-law denominator: per source,
# total tokens vs tokens surviving exact dedup (keep = min doc_id per
# normalized-content hash), and the wasted-duplicate share. The mart that
# turns dd_exact_dedup's corpus-level count into the per-source number a
# data-mixing plan actually consumes (epochs-per-source are computed on
# EFFECTIVE tokens, not raw). Two hash aggs, integer ppm ladder.
# ---------------------------------------------------------------------------
@query(
    "llm_effective_tokens",
    f"""
    WITH d AS (
      SELECT doc_id, source,
             md5({_NORM_SQL}) AS h,
             CASE WHEN length({_NORM_SQL}) = 0 THEN 0 ELSE len({_TOKS_SQL}) END AS n_tokens
      FROM documents),
    surv AS (SELECT h, MIN(doc_id) AS keep FROM d GROUP BY h)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN d.doc_id = s.keep THEN d.n_tokens ELSE 0 END) AS BIGINT)
             AS effective_tokens,
           CAST(((SUM(d.n_tokens) - SUM(CASE WHEN d.doc_id = s.keep THEN d.n_tokens ELSE 0 END))
                 * 1000000) // GREATEST(SUM(d.n_tokens), 1) AS BIGINT) AS dup_waste_ppm
    FROM d JOIN surv s ON d.h = s.h
    GROUP BY d.source ORDER BY d.source
    """,
)
def llm_effective_tokens(spark, sf_dir):
    from ..llmdata.text import _norm, token_count

    d = t(spark, sf_dir, "documents", restore=True).select(
        "doc_id",
        "source",
        F.md5(_norm("text")).alias("h"),
        token_count("text").alias("n_tokens"),
    )
    surv = d.groupBy("h").agg(F.min("doc_id").alias("keep"))
    eff = F.sum(
        F.when(F.col("doc_id") == F.col("keep"), F.col("n_tokens")).otherwise(0)
    )
    return (
        d.join(surv, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            eff.cast("bigint").alias("effective_tokens"),
            F.expr(
                "CAST(((sum(n_tokens) - sum(CASE WHEN doc_id = keep THEN n_tokens ELSE 0 END))"
                " * 1000000) div GREATEST(sum(n_tokens), 1) AS BIGINT)"
            ).alias("dup_waste_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# similarity: per-label embedding diversity — the mean pairwise cosine
# within each class, computed WITHOUT any pairwise join via the moment
# identity  Σ_{i≠j} ûi·ûj = |Σû|² − Σ|ûi|²  (û = L2-normalized vectors):
# one posexplode (corpus × 64 rows), two hash aggs — an O(n·d) plan for an
# O(n²·d) statistic, so it runs at any corpus scale. Low diversity (high
# mean cosine) per class flags collapsed/duplicated training clusters —
# the class-level twin of dd_semdedup. Determinism ladder: normalized
# components round to 8dp, every cross-vector sum is an exact DECIMAL sum
# of 8dp-rounded terms (the a32 convention), so partial-agg order never
# moves the result; in-array folds (norms) are the same sequential IEEE
# expression both engines (the sim_cosine_topk convention).
# ---------------------------------------------------------------------------
@query(
    "sim_pairwise_diversity",
    """
    WITH e AS (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    nrm AS (
      SELECT label, vec_id,
             list_transform(v, x -> ROUND(x / sqrt(list_dot_product(v, v)), 8)) AS nc
      FROM e),
    pv AS (SELECT label, vec_id, nc, ROUND(list_dot_product(nc, nc), 8) AS s2 FROM nrm),
    ex AS (
      SELECT label, p[2] AS dim, CAST(p[1] AS DOUBLE) AS c
      FROM pv, UNNEST(list_zip(nc, range(1, len(nc) + 1))) AS t(p)),
    sd AS (
      SELECT label, dim, CAST(SUM(CAST(c AS DECIMAL(28,8))) AS DOUBLE) AS s
      FROM ex GROUP BY 1, 2),
    a1 AS (
      SELECT label, CAST(SUM(CAST(ROUND(s * s, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sumsq
      FROM sd GROUP BY 1),
    a2 AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             CAST(SUM(CAST(s2 AS DECIMAL(28,8))) AS DOUBLE) AS selfsq
      FROM pv GROUP BY 1)
    SELECT a2.label, a2.n_vecs,
           ROUND((a1.sumsq - a2.selfsq) / (a2.n_vecs * (a2.n_vecs - 1.0)) * 1000000)
             / 1000000.0 AS mean_pairwise_cosine
    FROM a1 JOIN a2 USING (label) ORDER BY label
    """,
)
def sim_pairwise_diversity(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings", restore=True)
    v = F.transform("embedding", lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    base = e.select(
        "label",
        "vec_id",
        F.transform(v, lambda x: F.round(x / nrm, 8)).alias("nc"),
    )
    pv = base.withColumn(
        "s2",
        F.round(
            F.aggregate(
                F.transform("nc", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
            ),
            8,
        ),
    )
    ex = pv.select("label", F.posexplode("nc").alias("dim", "c"))
    sd = ex.groupBy("label", "dim").agg(
        F.sum(F.col("c").cast("decimal(28,8)")).cast("double").alias("s")
    )
    a1 = sd.groupBy("label").agg(
        F.sum(F.round(F.col("s") * F.col("s"), 8).cast("decimal(28,8)"))
        .cast("double")
        .alias("sumsq")
    )
    a2 = pv.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(F.col("s2").cast("decimal(28,8)")).cast("double").alias("selfsq"),
    )
    return (
        a1.join(a2, "label")
        .select(
            "label",
            "n_vecs",
            (
                F.round(
                    (F.col("sumsq") - F.col("selfsq"))
                    / (F.col("n_vecs") * (F.col("n_vecs") - 1.0))
                    * 1000000.0
                )
                / 1000000.0
            ).alias("mean_pairwise_cosine"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# dedup ops: shingle posting-list profile — the advisor mart for the
# max_shingle_df cap every jaccard/minhash join in this repo depends on.
# Buckets 5-gram shingles by document frequency and reports, per bucket,
# the shingle count, posting mass, and — the number that actually prices
# the self-join — candidate pairs Σ df·(df−1)/2. At web scale the '>50'
# bucket's cand_pairs says exactly how much quadratic work the cap
# removes. One explode + two hash aggs + a 4-row window; all BIGINT.
# ---------------------------------------------------------------------------
@query(
    "dd_shingle_profile",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    sh AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, greatest(len(tk) - 3, 2)),
                       i -> array_to_string(tk[i:i+4], ' ')))) AS shingle
      FROM toks),
    df AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY shingle),
    b AS (
      SELECT CASE WHEN df = 1 THEN '1' WHEN df <= 5 THEN '2-5'
                  WHEN df <= 50 THEN '6-50' ELSE '>50' END AS df_bucket,
             df
      FROM df),
    agg AS (
      SELECT df_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(df) AS BIGINT) AS postings,
             CAST(SUM(df * (df - 1) // 2) AS BIGINT) AS cand_pairs
      FROM b GROUP BY df_bucket)
    SELECT df_bucket, n_shingles, postings, cand_pairs,
           CAST((postings * 1000000) // (SUM(postings) OVER ()) AS BIGINT)
             AS posting_mass_ppm
    FROM agg ORDER BY df_bucket
    """,
)
def dd_shingle_profile(spark, sf_dir):
    from ..llmdata.dedup import _shingles

    d = t(spark, sf_dir, "documents", restore=True)
    sh = d.select("doc_id", F.explode(_shingles("text", 5)).alias("shingle"))
    return _shingle_profile_from_shingles(sh)


def _shingle_profile_from_shingles(sh):
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    b = df.select(
        F.when(F.col("df") == 1, "1")
        .when(F.col("df") <= 5, "2-5")
        .when(F.col("df") <= 50, "6-50")
        .otherwise(">50")
        .alias("df_bucket"),
        "df",
    )
    agg = b.groupBy("df_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.sum("df").cast("bigint").alias("postings"),
        F.sum(F.expr("df * (df - 1) div 2")).cast("bigint").alias("cand_pairs"),
    )
    # posting_mass_ppm's SUM(...) OVER () runs on the 4-row bucket frame,
    # where a global window is safe (ADVICE r9: the former unused
    # Window.partitionBy() assignment here was dead code — the window is
    # expressed inline in the F.expr below)
    return agg.select(
        "df_bucket",
        "n_shingles",
        "postings",
        "cand_pairs",
        F.expr(
            "CAST((postings * CAST(1000000 AS BIGINT)) div "
            "(SUM(postings) OVER ()) AS BIGINT)"
        ).alias("posting_mass_ppm"),
    ).orderBy("df_bucket")


# ---------------------------------------------------------------------------
# lm: n-gram novelty curve — per document (in doc_id ingestion order), the
# share of its distinct 3-gram shingles never seen in any EARLIER document:
# the saturation diagnostic for data ordering/curriculum work (novelty
# collapsing toward 0 = the corpus has stopped teaching new n-grams; the
# dataset-level twin of tx_lexical_diversity). first-seen = MIN(doc_id)
# per shingle — one explode, one hash agg, one equi-join back, one per-doc
# agg; exact BIGINT ppm.
# ---------------------------------------------------------------------------
@query(
    "lm_ngram_novelty",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    sh AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, greatest(len(tk) - 1, 2)),
                       i -> array_to_string(tk[i:i+2], ' ')))) AS shingle
      FROM toks),
    first AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST((SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) * 1000000)
                // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM sh JOIN first f USING (shingle)
    GROUP BY sh.doc_id ORDER BY sh.doc_id
    """,
)
def lm_ngram_novelty(spark, sf_dir):
    from ..llmdata.dedup import _shingles

    d = t(spark, sf_dir, "documents", restore=True)
    sh = d.select("doc_id", F.explode(_shingles("text", 3)).alias("shingle"))
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr(
                "CAST((n_novel * CAST(1000000 AS BIGINT)) div n_shingles AS BIGINT)"
            ).alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# ts: inter-arrival gap profile per event series — mean / p50 / p95 / max
# gap seconds and the burstiness coefficient B = (σ−μ)/(σ+μ) (Goh &
# Barabási 2008; B→−1 periodic, 0 Poisson, →1 bursty). The consecutive-gap
# lag runs on the overlap-chunk carrier (overlap=1) — the same scale-safe
# device as w16/w17, so no single-task per-series sort ever happens — and
# everything after the lag is one hash agg on exact BIGINT epoch-second
# gaps (moments as exact sums; σ via the two-moment identity; percentiles
# exact, integer-valued ±.5 interpolation).
# ---------------------------------------------------------------------------
@query(
    "ts_interarrival_stats",
    """
    WITH o AS (
      SELECT event_type, epoch_us(ts) AS es,
             LAG(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts, event_id)
               AS prev_es
      FROM events),
    g AS (SELECT event_type, CAST(es - prev_es AS BIGINT) AS gap
          FROM o WHERE prev_es IS NOT NULL),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(gap) AS BIGINT) AS s1,
             CAST(SUM(CAST(gap AS HUGEINT) * gap) AS DOUBLE) AS s2,
             CAST(MAX(gap) AS BIGINT) AS max_gap_us,
             ROUND(quantile_cont(gap, 0.5), 4) AS p50_gap_us,
             ROUND(quantile_cont(gap, 0.95), 4) AS p95_gap_us
      FROM g GROUP BY event_type)
    SELECT event_type, n_gaps,
           ROUND(s1 * 1.0 / n_gaps * 1000000) / 1000000.0 AS mean_gap_us,
           p50_gap_us, p95_gap_us, max_gap_us,
           ROUND((sqrt(GREATEST(s2 * 1.0 / n_gaps - (s1 * 1.0 / n_gaps) * (s1 * 1.0 / n_gaps), 0.0))
                  - s1 * 1.0 / n_gaps)
                 / NULLIF(sqrt(GREATEST(s2 * 1.0 / n_gaps - (s1 * 1.0 / n_gaps) * (s1 * 1.0 / n_gaps), 0.0))
                          + s1 * 1.0 / n_gaps, 0.0) * 1000000) / 1000000.0
             AS burstiness
    FROM m ORDER BY event_type
    """,
)
def ts_interarrival_stats(spark, sf_dir):
    from pyspark.sql import Window

    from ..operators.windows import with_overlap_chunks

    e = t(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", F.unix_micros("ts").alias("es")
    )
    ck = with_overlap_chunks(
        e, ["event_type"], ["ts", "event_id"],
        bucket=F.col("ts").cast("date"), overlap=1,
    )
    wck = Window.partitionBy("event_type", "__chunk").orderBy("__rn")
    g = (
        ck.withColumn("prev_es", F.lag("es").over(wck))
        .filter(F.col("prev_es").isNotNull() & ~F.col("__is_ctx"))
        .select("event_type", (F.col("es") - F.col("prev_es")).cast("bigint").alias("gap"))
    )
    m = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("gap").cast("bigint").alias("s1"),
        # micro-second gaps square to ~1e18 per term: the exact sum needs
        # DECIMAL(38,0) (DuckDB widens to HUGEINT); both engines then take
        # the same nearest-double of the exact integer
        F.sum(F.col("gap").cast("decimal(19,0)") * F.col("gap").cast("decimal(19,0)"))
        .cast("double")
        .alias("s2"),
        F.max("gap").cast("bigint").alias("max_gap_us"),
        F.round(F.percentile("gap", F.lit(0.5)), 4).alias("p50_gap_us"),
        F.round(F.percentile("gap", F.lit(0.95)), 4).alias("p95_gap_us"),
    )
    mu = F.col("s1") * 1.0 / F.col("n_gaps")
    sd = F.sqrt(
        F.greatest(F.col("s2") * 1.0 / F.col("n_gaps") - mu * mu, F.lit(0.0))
    )
    return m.select(
        "event_type",
        "n_gaps",
        (F.round(mu * 1000000.0) / 1000000.0).alias("mean_gap_us"),
        "p50_gap_us",
        "p95_gap_us",
        "max_gap_us",
        (
            F.round((sd - mu) / F.nullif(sd + mu, F.lit(0.0)) * 1000000.0)
            / 1000000.0
        ).alias("burstiness"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# dedup: contamination LCS ladder — for every training doc (the % 53 != 0
# side, dd_decontaminate's split), the binary-ladder lower bound on its
# longest common token run with the eval corpus: level n ∈ {4, 8, 16} is
# hit iff ANY word n-gram of the doc appears verbatim in the eval set, so
# lcs_floor_tokens = max hit n bounds LCS ≥ n (and LCS < the next level
# when that level missed) — the doubling-probe version of the
# suffix-automaton LCS scan, built entirely from the existing shingle
# machinery. Per level: one distinct-shingle explode + LEFT SEMI join
# against the (broadcastable) eval n-gram set — three bounded passes, no
# all-pairs anywhere, the dd_decontaminate plan shape ×3.
# ---------------------------------------------------------------------------
@query(
    "dd_contamination_ladder",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    g4 AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, greatest(len(tk) - 2, 2)),
                       i -> array_to_string(tk[i:i+3], ' ')))) AS g
      FROM toks),
    g8 AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, greatest(len(tk) - 6, 2)),
                       i -> array_to_string(tk[i:i+7], ' ')))) AS g
      FROM toks),
    g16 AS (
      SELECT doc_id, UNNEST(list_distinct(
        list_transform(range(1, greatest(len(tk) - 14, 2)),
                       i -> array_to_string(tk[i:i+15], ' ')))) AS g
      FROM toks),
    h4 AS (SELECT DISTINCT t.doc_id FROM g4 t
           WHERE t.doc_id % 53 <> 0
             AND t.g IN (SELECT g FROM g4 WHERE doc_id % 53 = 0)),
    h8 AS (SELECT DISTINCT t.doc_id FROM g8 t
           WHERE t.doc_id % 53 <> 0
             AND t.g IN (SELECT g FROM g8 WHERE doc_id % 53 = 0)),
    h16 AS (SELECT DISTINCT t.doc_id FROM g16 t
            WHERE t.doc_id % 53 <> 0
              AND t.g IN (SELECT g FROM g16 WHERE doc_id % 53 = 0))
    SELECT d.doc_id,
           d.doc_id IN (SELECT doc_id FROM h4) AS hit4,
           d.doc_id IN (SELECT doc_id FROM h8) AS hit8,
           d.doc_id IN (SELECT doc_id FROM h16) AS hit16,
           CAST(CASE WHEN d.doc_id IN (SELECT doc_id FROM h16) THEN 16
                     WHEN d.doc_id IN (SELECT doc_id FROM h8) THEN 8
                     WHEN d.doc_id IN (SELECT doc_id FROM h4) THEN 4
                     ELSE 0 END AS INT) AS lcs_floor_tokens
    FROM documents d WHERE d.doc_id % 53 <> 0
    ORDER BY d.doc_id
    """,
)
def dd_contamination_ladder(spark, sf_dir):
    from ..llmdata.dedup import _shingles

    d = t(spark, sf_dir, "documents", restore=True)
    is_eval = F.col("doc_id") % 53 == 0
    train = d.filter(~is_eval)
    ev = d.filter(is_eval)

    def hits(n):
        tg = train.select("doc_id", F.explode(_shingles("text", n)).alias("g"))
        eg = ev.select(F.explode(_shingles("text", n)).alias("g")).distinct()
        return (
            tg.join(eg, "g", "left_semi")
            .select("doc_id")
            .distinct()
            .withColumn(f"hit{n}", F.lit(True))
        )

    out = (
        train.select("doc_id")
        .join(hits(4), "doc_id", "left")
        .join(hits(8), "doc_id", "left")
        .join(hits(16), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("hit4", F.lit(False)).alias("hit4"),
            F.coalesce("hit8", F.lit(False)).alias("hit8"),
            F.coalesce("hit16", F.lit(False)).alias("hit16"),
        )
    )
    return out.select(
        "doc_id",
        "hit4",
        "hit8",
        "hit16",
        F.when(F.col("hit16"), 16)
        .when(F.col("hit8"), 8)
        .when(F.col("hit4"), 4)
        .otherwise(0)
        .cast("int")
        .alias("lcs_floor_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# dedup: EXACT contamination LCS (VERDICT r9 stretch #6) — the exact value
# dd_contamination_ladder lower-bounds: per training doc, the length in
# tokens of its longest token run appearing verbatim in any eval doc
# (runs < 2 report 0). Engine: doubling probe + dyadic binary search over
# shingle sizes, ~2·log2(max_eval_len) LEFT SEMI passes (llmdata/dedup.py:
# exact_lcs_contamination). Oracle: a COMPLETELY different algorithm —
# bigram position matches grouped by diagonal (i−j), gaps-and-islands run
# lengths, max+1 — so agreement is evidence, not a tautology.
# ---------------------------------------------------------------------------
@query(
    "dd_contamination_exact",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
    bg0 AS (
      SELECT doc_id, UNNEST(list_transform(range(1, greatest(len(tk), 1)),
               i -> struct_pack(pos := i,
                                g := array_to_string(tk[i:i+1], ' ')))) AS s
      FROM toks),
    bg AS (SELECT doc_id, s.pos AS pos, s.g AS g FROM bg0),
    m AS (
      SELECT tr.doc_id AS tid, ev.doc_id AS eid, tr.pos AS i, ev.pos AS j
      FROM bg tr JOIN bg ev ON tr.g = ev.g
      WHERE tr.doc_id % 53 <> 0 AND ev.doc_id % 53 = 0),
    isl AS (
      SELECT tid, i - ROW_NUMBER() OVER (PARTITION BY tid, eid, i - j ORDER BY i)
               AS grp, eid, i - j AS diag
      FROM m),
    runs AS (SELECT tid, COUNT(*) + 1 AS run_toks
             FROM isl GROUP BY tid, eid, diag, grp),
    best AS (SELECT tid, MAX(run_toks) AS lcs FROM runs GROUP BY tid)
    SELECT d.doc_id, CAST(COALESCE(b.lcs, 0) AS INT) AS lcs_tokens
    FROM documents d LEFT JOIN best b ON d.doc_id = b.tid
    WHERE d.doc_id % 53 <> 0
    ORDER BY d.doc_id
    """,
)
def dd_contamination_exact(spark, sf_dir):
    from ..llmdata.dedup import exact_lcs_contamination

    d = t(spark, sf_dir, "documents", restore=True)
    is_eval = F.col("doc_id") % 53 == 0
    return exact_lcs_contamination(d.filter(~is_eval), d.filter(is_eval))


def _family_recalls(tagged, tag_col, settings, exact):
    """ALL of a family's sweep points (``sim_ann_param_sweep``) from its
    tagged frame in ONE
    window + ONE recall join + ONE grouped aggregation: a candidate
    replicates to every setting whose probe reaches it (explode +
    filter on the minimal-setting tag), the per-(setting, query)
    top-k is a single window pass, and recall aggregates grouped by
    setting — arithmetic identical to sweep_row's per-point path
    (same round-to-6 / decimal-sum ladder)."""
    from pyspark.sql import Window

    cand = tagged.withColumn(
        "setting", F.explode(F.array(*[F.lit(int(s)) for s in settings]))
    ).filter(F.col(tag_col) <= F.col("setting"))
    w = Window.partitionBy("setting", "query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    topk = (
        cand.dropDuplicates(["setting", "query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    per_q = (
        topk.alias("a")
        .join(
            F.broadcast(exact).alias("e"),
            (F.col("a.query_id") == F.col("e.query_id"))
            & (F.col("a.neighbor_id") == F.col("e.exact_neighbor_id")),
            "left",
        )
        .groupBy(
            F.col("a.setting").alias("setting"),
            F.col("a.query_id").alias("query_id"),
        )
        .agg(
            F.round(F.count("e.exact_neighbor_id") / F.lit(5.0), 6).alias(
                "recall"
            )
        )
    )
    computed = per_q.groupBy("setting").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        (
            F.round(
                F.sum(F.col("recall").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
                * 1000000.0
            )
            / 1000000.0
        ).alias("mean_recall_at_k"),
    )
    # r11 ADVICE: a sweep setting reached by ZERO candidates (degenerate
    # corpus/seed corner) would emit no grouped row and silently shrink
    # the published 9-row shape; the per-point sweep_row path always
    # emitted one (n_queries=0, mean NULL). Left-join onto the literal
    # settings frame so every config always appears, identically.
    all_settings = tagged.sparkSession.createDataFrame(
        [(int(s),) for s in settings], "setting int"
    )
    return all_settings.join(computed, "setting", "left").select(
        "setting",
        F.coalesce(F.col("n_queries"), F.lit(0).cast("bigint")).alias(
            "n_queries"
        ),
        "mean_recall_at_k",
    )


# ---------------------------------------------------------------------------
# similarity: ANN parameter-sweep mart (recall-vs-cost) — the table an ANN
# deployment decision actually reads: for nprobe ∈ {1,2,4,8} on the same
# IVF index (nlist=64, deterministic centroids), the measured
# mean_recall_at_k on the pinned ≤8-query probe set against the exact
# brute-force top-k, next to the theoretical scan fraction nprobe/nlist.
# Self-validating rows-only query (the ANN convention here): recall is
# measured in-row via with_recall_vs_exact; tests assert recall is
# monotone in nprobe and hits 1.0 at nprobe=nlist-scan levels. Each sweep
# point reuses the same broadcast-probe plan as sim_ivf_topk — 4 bounded
# passes, no corpus self-join.
# ---------------------------------------------------------------------------
@query("sim_ann_param_sweep")
def sim_ann_param_sweep(spark, sf_dir):
    """Recall-vs-cost over ALL THREE index families (r9 stretch #7
    extended r10): IVF prices ROWS SCANNED (nprobe/nlist), LSH prices
    BUCKETS PROBED (Σ_{i<=p} C(n_planes,i) of 2^n_planes, the multiprobe
    Hamming ball), PQ prices BYTES PER SCANNED ROW (m·nbits/8 of the
    dim×4 float vector — PQ scans every code, its lever is compression).
    One row per (family, config) with both cost axes in ppm, so the mart
    prices the row-pruning families and the byte-pruning family on the
    same table.

    SINGLE-PASS (r10 VERDICT #1): the row-pruning families score their
    MAX-setting candidate set once, tagged with the minimal setting that
    reaches each candidate (IVF: rank of the candidate's cell in the
    query's centroid ordering; LSH: Hamming distance of its bucket), and
    every smaller sweep point is a FILTER + re-rank over the
    localCheckpointed scored frame (`ivf_tagged_candidates` /
    `lsh_tagged_candidates`, per-setting byte-identity pinned by
    tests/test_tagged_sweep.py). Corpus-rate work: one brute-force exact
    pass + one tagged pass per row-pruning family + one encode/scan per
    PQ codebook (PQ's two configs use DIFFERENT codebooks — nothing to
    share), instead of one probe pass per sweep point (9)."""
    import math

    from ..cachectl import tracked_local_checkpoint
    from ..llmdata.similarity import (
        brute_force_cosine_topk,
        ivf_tagged_candidates,
        lsh_tagged_candidates,
        pq_cosine_topk,
        with_recall_vs_exact,
    )

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    dim_bytes = 64 * 4
    # ONE corpus-scanning brute-force pass prices all 9 sweep points (the
    # 40-row exact baseline is localCheckpointed and re-broadcast per point);
    # each tagged frame is |q|-bounded × the max-setting candidate rate and
    # materializes once
    # tracked (cachectl): the r11 bench measured this query at 21.3s gated
    # vs 9.6s isolated with the leaked eager checkpoints as prime suspect —
    # the harness releases them after materializing the result
    # r14 (guide §2.6 "overlap independent jobs"): the per-family index
    # builds — exact baseline, IVF tagged frame, LSH tagged frame, and the
    # two PQ codebook+scan passes — are fully independent until the final
    # 9-row union, but each one is a chain of small sequential jobs
    # (profiled: 61 driver jobs/pass for this query), so run sequentially
    # the cluster idles between job tails. Build the five checkpointed
    # frames from a small driver thread pool instead; each checkpoint's
    # CONTENT is independent of execution order, so every output bit is
    # unchanged. inheritable_thread_target propagates the job-description/
    # scheduler thread-locals per guide §2.6.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    fut = {}
    with ThreadPoolExecutor(max_workers=3) as pool:
        fut["exact"] = pool.submit(
            inheritable_thread_target(
                lambda: tracked_local_checkpoint(
                    brute_force_cosine_topk(q, e, k=5).select(
                        "query_id", F.col("neighbor_id").alias("exact_neighbor_id")
                    )
                )
            )
        )
        fut["ivf"] = pool.submit(
            inheritable_thread_target(
                lambda: tracked_local_checkpoint(
                    ivf_tagged_candidates(q, e, nlist=64, max_nprobe=8)
                )
            )
        )
        fut["lsh"] = pool.submit(
            inheritable_thread_target(
                lambda: tracked_local_checkpoint(
                    lsh_tagged_candidates(q, e, n_planes=8, max_multiprobe=2)
                )
            )
        )
        for m, k_cent in ((8, 16), (16, 16)):
            fut[f"pq{m}"] = pool.submit(
                inheritable_thread_target(
                    lambda m=m, k_cent=k_cent: tracked_local_checkpoint(
                        pq_cosine_topk(q, e, k=5, m=m, n_centroids=k_cent)
                    )
                )
            )
    exact = fut["exact"].result()
    ivf_tagged = fut["ivf"].result()
    lsh_tagged = fut["lsh"].result()

    def sweep_row(approx, family, config, scan_ppm, bytes_ppm):
        r = with_recall_vs_exact(approx, q, e, k=5, exact=exact)
        per_q = r.groupBy("query_id").agg(F.max("recall_at_k").alias("recall"))
        return per_q.agg(
            F.lit(family).alias("family"),
            F.lit(config).alias("config"),
            F.lit(int(scan_ppm)).cast("bigint").alias("scan_fraction_ppm"),
            F.lit(int(bytes_ppm)).cast("bigint").alias("bytes_fraction_ppm"),
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            (
                F.round(
                    F.sum(F.col("recall").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                    * 1000000.0
                )
                / 1000000.0
            ).alias("mean_recall_at_k"),
        )

    ivf_rows = _family_recalls(ivf_tagged, "min_nprobe", (1, 2, 4, 8), exact).select(
        F.lit("ivf").alias("family"),
        F.concat(F.lit("nprobe="), F.col("setting").cast("string")).alias("config"),
        F.expr("CAST(setting * 1000000 div 64 AS BIGINT)").alias("scan_fraction_ppm"),
        F.lit(1_000_000).cast("bigint").alias("bytes_fraction_ppm"),
        "n_queries",
        "mean_recall_at_k",
    )
    bucket_ppm = F.lit(None).cast("bigint")
    for mp in (0, 1, 2):
        buckets = sum(math.comb(8, i) for i in range(mp + 1))
        bucket_ppm = (
            F.when(F.col("setting") == mp, F.lit(buckets * 1_000_000 // 256))
            .otherwise(bucket_ppm)
        )
    lsh_rows = _family_recalls(lsh_tagged, "min_radius", (0, 1, 2), exact).select(
        F.lit("lsh").alias("family"),
        F.concat(F.lit("multiprobe="), F.col("setting").cast("string")).alias(
            "config"
        ),
        bucket_ppm.cast("bigint").alias("scan_fraction_ppm"),
        F.lit(1_000_000).cast("bigint").alias("bytes_fraction_ppm"),
        "n_queries",
        "mean_recall_at_k",
    )
    sweeps = [ivf_rows, lsh_rows]
    for m, k_cent in ((8, 16), (16, 16)):
        nbits = int(math.log2(k_cent))
        # with_recall_vs_exact references its approx frame TWICE (hits +
        # join-back); the ≤|q|·k-row top-k was checkpointed in the thread
        # pool above so the PQ corpus scan runs once per codebook, not twice
        # (tracked: harness-released)
        approx = fut[f"pq{m}"].result()
        sweeps.append(
            sweep_row(
                approx,
                "pq",
                f"m={m},k={k_cent}",
                1_000_000,
                m * nbits // 8 * 1_000_000 // dim_bytes,
            )
        )
    out = sweeps[0]
    for s in sweeps[1:]:
        out = out.unionByName(s)
    return out.orderBy("family", "scan_fraction_ppm", "bytes_fraction_ppm", "config")


# ---------------------------------------------------------------------------
# ml: bootstrap CI of the mean — the multiplier-bootstrap with
# DETERMINISTIC Poisson(1) weights (Kleiner/Owen resampling as used in
# big-data bootstrap systems): resample b draws row i with weight w =
# Poisson⁻¹(md5(b||id) mod 65536), thresholds 24109/48218/60274/64292
# (the 36.79/36.79/18.39/6.13/1.92% pmf as exact /65536 integer cuts), so
# every engine and every partitioning produces the IDENTICAL 32 resample
# means. One explode(×32) + one hash agg with map-side partials; CI =
# exact percentile over the 32-row mean frame. All sums are DECIMAL-exact
# (weights are small ints, o_totalprice is DECIMAL(18,2)).
# ---------------------------------------------------------------------------
@query(
    "ml_bootstrap_ci",
    f"""
    WITH x AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS v,
             [md5('0|' || CAST(o_orderkey AS VARCHAR)),
              md5('1|' || CAST(o_orderkey AS VARCHAR)),
              md5('2|' || CAST(o_orderkey AS VARCHAR)),
              md5('3|' || CAST(o_orderkey AS VARCHAR))] AS dig
      FROM orders),
    r AS (
      SELECT b.b, x.o_orderkey, x.v,
             CAST(list_sum(list_transform(
               list_zip(string_split(substring(dig[b.b // 8 + 1],
                                               4 * (b.b % 8) + 1, 4), ''),
                        range(1, 5)),
               p -> (list_position({_HEX}, p[1]) - 1) * power(16, 4 - p[2]))) AS BIGINT)
               AS u
      FROM x CROSS JOIN (SELECT UNNEST(range(0, 32)) AS b) b),
    w AS (
      SELECT b, v,
             CASE WHEN u < 24109 THEN 0 WHEN u < 48218 THEN 1
                  WHEN u < 60274 THEN 2 WHEN u < 64292 THEN 3 ELSE 4 END AS w
      FROM r),
    means AS (
      SELECT b,
             ROUND(CAST(SUM(w * v) AS DOUBLE) / SUM(w) * 1000000) / 1000000.0 AS m
      FROM w GROUP BY b),
    pt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*) * 1000000) / 1000000.0 AS point_mean
      FROM x)
    SELECT pt.n_rows, pt.point_mean,
           CAST(32 AS BIGINT) AS n_resamples,
           ROUND(quantile_cont(means.m, 0.025) * 1000000) / 1000000.0 AS boot_p025,
           ROUND(quantile_cont(means.m, 0.975) * 1000000) / 1000000.0 AS boot_p975
    FROM means CROSS JOIN pt
    GROUP BY pt.n_rows, pt.point_mean
    """,
)
def ml_bootstrap_ci(spark, sf_dir):
    # 4 digests sliced 8 ways instead of 32 md5s per row: the hash is the
    # dominant cost of the x32 explode (measured 4.4s -> ~1.5s at sf0.1);
    # each 4-hex slice of an md5 is an independent uniform 16-bit draw.
    o = t(spark, sf_dir, "orders", restore=True).select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        F.array(
            *[
                F.md5(F.concat(F.lit(f"{g}|"), F.col("o_orderkey").cast("string")))
                for g in range(4)
            ]
        ).alias("dig"),
    )
    r = o.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(31)))).withColumn(
        "u",
        F.conv(
            F.expr("substring(element_at(dig, CAST(b div 8 AS INT) + 1), 4 * (b % 8) + 1, 4)"),
            16,
            10,
        ).cast("bigint"),
    )
    w = r.select(
        "b",
        "v",
        F.when(F.col("u") < 24109, 0)
        .when(F.col("u") < 48218, 1)
        .when(F.col("u") < 60274, 2)
        .when(F.col("u") < 64292, 3)
        .otherwise(4)
        .alias("w"),
    )
    means = w.groupBy("b").agg(
        (
            F.round(
                F.sum(F.col("w") * F.col("v")).cast("double")
                / F.sum("w")
                * 1000000.0
            )
            / 1000000.0
        ).alias("m")
    )
    pt = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (
            F.round(F.sum("v").cast("double") / F.count(F.lit(1)) * 1000000.0)
            / 1000000.0
        ).alias("point_mean"),
    )
    ci = means.crossJoin(F.broadcast(pt)).groupBy("n_rows", "point_mean").agg(
        F.lit(32).cast("bigint").alias("n_resamples"),
        (
            F.round(F.percentile("m", F.lit(0.025)) * 1000000.0) / 1000000.0
        ).alias("boot_p025"),
        (
            F.round(F.percentile("m", F.lit(0.975)) * 1000000.0) / 1000000.0
        ).alias("boot_p975"),
    )
    return ci.select("n_rows", "point_mean", "n_resamples", "boot_p025", "boot_p975")


# ---------------------------------------------------------------------------
# ts: MACD stance — EWMA-12 vs EWMA-26 of the per-type DAILY count series
# (Appel's moving-average convergence/divergence, the canonical dual-EWMA
# trend detector). Both folds run over the same pre-aggregated daily array
# in ONE select (no second consumer of the fact agg), α literals are the
# identical IEEE doubles in both engines, and the fold is the established
# first-element-init device (w11_ewma / grouped_ewma): Spark F.aggregate ==
# DuckDB list_reduce step-for-step. Array cells hold #days values, bounded
# at any corpus scale.
# ---------------------------------------------------------------------------
@query(
    "ts_macd",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    series AS (
      SELECT event_type, list(CAST(c AS DOUBLE) ORDER BY d) AS vals,
             COUNT(*) AS n_days
      FROM daily GROUP BY event_type),
    f AS (
      SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
             ROUND(list_reduce(vals, (acc, x) -> (2.0/13.0) * x + (1.0 - 2.0/13.0) * acc), 6)
               AS ewma12,
             ROUND(list_reduce(vals, (acc, x) -> (2.0/27.0) * x + (1.0 - 2.0/27.0) * acc), 6)
               AS ewma26
      FROM series)
    SELECT event_type, n_days, ewma12, ewma26,
           ROUND((ewma12 - ewma26) * 1000000) / 1000000.0 AS macd,
           CASE WHEN ewma12 > ewma26 THEN 'BULLISH' ELSE 'BEARISH' END AS stance
    FROM f ORDER BY event_type
    """,
)
def ts_macd(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    grouped = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("d").alias("k"), F.col("c").alias("v")))
            ),
            lambda s: s["v"].cast("double"),
        ).alias("vals"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    rest = F.slice("vals", 2, F.greatest(F.size("vals") - 1, F.lit(0)))

    def ew(alpha):
        return F.round(
            F.aggregate(
                rest,
                F.element_at("vals", 1),
                lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
            ),
            6,
        )

    f = grouped.select(
        "event_type",
        "n_days",
        ew(2.0 / 13.0).alias("ewma12"),
        ew(2.0 / 27.0).alias("ewma26"),
    )
    return f.select(
        "event_type",
        "n_days",
        "ewma12",
        "ewma26",
        (F.round((F.col("ewma12") - F.col("ewma26")) * 1000000.0) / 1000000.0).alias(
            "macd"
        ),
        F.when(F.col("ewma12") > F.col("ewma26"), "BULLISH")
        .otherwise("BEARISH")
        .alias("stance"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# agg: exact weighted median — the lower weighted median of l_quantity
# weighted by l_extendedprice, per returnflag: collapse the fact table to
# the VALUE HISTOGRAM first (l_quantity has ~50 distinct values), then one
# cumulative-sum window over the tiny histogram picks the first value
# whose running weight reaches half the total. All arithmetic is exact
# DECIMAL/BIGINT (×2 instead of /2 to stay integral); the corpus-rate work
# is one hash agg — the reaggregation pattern (a19) applied to an
# order statistic that percentile() cannot express with weights.
# ---------------------------------------------------------------------------
@query(
    "a38_weighted_median",
    """
    WITH h AS (
      SELECT l_returnflag, l_quantity AS v,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS w
      FROM lineitem GROUP BY 1, 2),
    c AS (
      SELECT l_returnflag, v, w,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM h)
    SELECT l_returnflag,
           MIN(v) AS weighted_median_qty,
           CAST(MAX(tw) AS DOUBLE) AS total_weight
    FROM c WHERE 2 * cw >= tw
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a38_weighted_median(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    h = li.groupBy(
        "l_returnflag", F.col("l_quantity").alias("v")
    ).agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("w")
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    c = h.select(
        "l_returnflag",
        "v",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("v").alias("weighted_median_qty"),
            F.max("tw").cast("double").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# llm: token-budget water-filling — the allocation problem every training
# mix solves: given a token budget B (here half the corpus), find the
# water level `cap` with sum_s min(tokens_s, cap) <= B < sum + n_open,
# i.e. small sources keep everything, large sources are clipped to a
# COMMON level (max-min fair allocation / "water filling"). Exact integer
# arithmetic end-to-end: sort sources ascending, prefix sums, candidate
# level (B - prefix) div (remaining sources) per rank, first violation
# fixes the level. All windows run on the per-source frame (metadata-rate
# after one corpus agg) where a global window is the right plan.
# ---------------------------------------------------------------------------
@query(
    "llm_token_budget",
    f"""
    WITH toked AS (
      SELECT source,
             CASE WHEN length({_NORM_SQL}) = 0 THEN 0 ELSE len({_TOKS_SQL}) END AS nt
      FROM documents),
    srcs AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS t FROM toked GROUP BY source),
    ranked AS (
      SELECT source, t,
             ROW_NUMBER() OVER (ORDER BY t, source) AS i,
             COALESCE(SUM(t) OVER (ORDER BY t, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p,
             COUNT(*) OVER () AS n,
             SUM(t) OVER () // 2 AS b
      FROM srcs),
    cands AS (
      SELECT *, (b - p) // (n - i + 1) AS cand FROM ranked),
    star AS (
      SELECT *, MIN(CASE WHEN cand < t THEN i END) OVER () AS i_star FROM cands),
    lvl AS (
      SELECT *, MAX(CASE WHEN i = i_star THEN cand END) OVER () AS cap FROM star)
    SELECT source, t AS n_tokens,
           CAST(CASE WHEN i_star IS NULL THEN t ELSE LEAST(t, cap) END AS BIGINT)
             AS allocation,
           (i_star IS NOT NULL AND t > cap) AS saturated
    FROM lvl ORDER BY source
    """,
)
def llm_token_budget(spark, sf_dir):
    from ..llmdata.sampling import water_fill_allocations

    d = t(spark, sf_dir, "documents")
    srcs = (
        d.select("source", token_count("text").alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("bigint").alias("t"))
    )
    return water_fill_allocations(srcs, "source", "t", budget_num=1, budget_den=2)


# ---------------------------------------------------------------------------
# ml eval: Cohen's kappa — inter-rater agreement between two deterministic
# labeling rules (two thresholds on the same signal: the "does a cheap
# heuristic agree with the expensive one beyond chance" question every
# weak-supervision pipeline asks). Exact integer arithmetic: kappa =
# (po - pe) / (1 - pe) scaled by n² gives
# (n·agree - ap·bp - an·bn) / (n² - ap·bp - an·bn) — all BIGINT counts,
# emitted as ppm via integer div. One hash agg per event_type; the kappa
# arithmetic runs on the 5-row group frame.
# ---------------------------------------------------------------------------
@query(
    "ml_cohens_kappa",
    """
    WITH lab AS (
      SELECT event_type,
             CASE WHEN value >= 300 THEN 1 ELSE 0 END AS ra,
             CASE WHEN value >= 350 THEN 1 ELSE 0 END AS rb
      FROM events),
    c AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT) AS agree,
             CAST(SUM(ra) AS BIGINT) AS ap,
             CAST(SUM(rb) AS BIGINT) AS bp
      FROM lab GROUP BY event_type)
    SELECT event_type, n, agree, ap AS rater_a_pos, bp AS rater_b_pos,
           CAST((n * agree - ap * bp - (n - ap) * (n - bp)) * 1000000
                // NULLIF(n * n - ap * bp - (n - ap) * (n - bp), 0) AS BIGINT)
             AS kappa_ppm
    FROM c ORDER BY event_type
    """,
)
def ml_cohens_kappa(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    lab = e.select(
        "event_type",
        (F.col("value") >= 300).cast("long").alias("ra"),
        (F.col("value") >= 350).cast("long").alias("rb"),
    )
    c = lab.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("ra") == F.col("rb")).cast("long")).cast("bigint").alias("agree"),
        F.sum("ra").cast("bigint").alias("ap"),
        F.sum("rb").cast("bigint").alias("bp"),
    )
    return c.select(
        "event_type",
        "n",
        "agree",
        F.col("ap").alias("rater_a_pos"),
        F.col("bp").alias("rater_b_pos"),
        F.expr(
            "CAST((n * agree - ap * bp - (n - ap) * (n - bp)) * 1000000"
            " div NULLIF(n * n - ap * bp - (n - ap) * (n - bp), 0) AS BIGINT)"
        ).alias("kappa_ppm"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# ts: order-priority transition matrix — per customer, consecutive orders'
# (prev → next) priority transitions with row-normalized probabilities:
# the first-order Markov summary of customer behavior (the sequence-stats
# sibling of w6's sessionization). One customer-keyed window (lag) + one
# hash agg; probabilities are exact integer ppm within each prev row.
# ---------------------------------------------------------------------------
@query(
    "ts_priority_transitions",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderpriority AS cur,
             LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders),
    tr AS (
      SELECT prev AS prev_priority, cur AS next_priority,
             CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM seq WHERE prev IS NOT NULL
      GROUP BY 1, 2)
    SELECT prev_priority, next_priority, n_transitions,
           CAST(n_transitions * 1000000 // (SUM(n_transitions) OVER
                (PARTITION BY prev_priority)) AS BIGINT) AS p_ppm
    FROM tr ORDER BY prev_priority, next_priority
    """,
)
def ts_priority_transitions(spark, sf_dir):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        F.col("o_orderpriority").alias("cur"),
        F.lag("o_orderpriority").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    tr = seq.groupBy(
        F.col("prev").alias("prev_priority"), F.col("cur").alias("next_priority")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    w_row = Window.partitionBy("prev_priority")
    return tr.select(
        "prev_priority",
        "next_priority",
        "n_transitions",
        F.expr(
            "CAST(n_transitions * 1000000 div "
            "(SUM(n_transitions) OVER (PARTITION BY prev_priority)) AS BIGINT)"
        ).alias("p_ppm"),
    ).orderBy("prev_priority", "next_priority")


# ---------------------------------------------------------------------------
# text: C4-style boilerplate detection — the span-level twin of
# dd_paragraph_dedup. C4 (Raffel et al. 2020, §2.2) drops any
# three-sentence span that occurs more than once in the corpus; the
# fixtures' documents are single-line word streams, so the span unit here
# is the non-overlapping 8-token chunk and "boilerplate" means the chunk
# text appears verbatim in MORE THAN ONE distinct document. Per-source
# mart: how much of each source's chunk mass is boilerplate — the signal
# that decides whether a source needs span-level cleaning before training.
# Scale: one JVM-side transform/slice (no token explode — chunks are built
# inside the array), then a SINGLE consumer of the corpus-rate frame: one
# (chunk, source) hash agg; per-chunk doc frequency is the SUM of the
# per-source distinct-doc counts over a chunk-partitioned window (every
# doc has exactly one source), so the raw frame is never scanned twice
# and nothing joins back (measured 9.1→6.6s at sf1 vs the naive
# agg + join-back shape; the floor is the per-row normalize + slice +
# array_join chunk kernel itself). The chunk collapses to a 64-bit xxhash at the
# source — shuffles move 8-byte keys instead of ~8-word strings (the
# ngram_jaccard_pairs device; collision odds d²/2⁶⁵ are negligible
# against the string-keyed oracle).
# ---------------------------------------------------------------------------
@query(
    "tx_boilerplate_chunks",
    f"""
    WITH arrs AS (
      SELECT doc_id, source, {_TOKS_SQL} AS a FROM documents),
    chunks AS (
      SELECT doc_id, source,
             array_to_string(a[(CAST(i AS INT)*8+1):(CAST(i AS INT)*8+8)], ' ') AS chunk
      FROM arrs, UNNEST(range(len(a) // 8)) AS u(i)
      WHERE len(a) >= 8),
    df AS (
      SELECT chunk, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
      FROM chunks GROUP BY chunk)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS boiler_chunks,
           CAST(COUNT(DISTINCT CASE WHEN nd >= 2 THEN chunk END) AS BIGINT)
             AS distinct_boiler_chunks,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS boiler_ppm
    FROM chunks JOIN df USING (chunk)
    GROUP BY source ORDER BY source
    """,
)
def tx_boilerplate_chunks(spark, sf_dir):
    from ..llmdata.text import _norm

    d = t(spark, sf_dir, "documents")
    chunks = (
        d.select("doc_id", "source", F.split(_norm("text"), " ").alias("a"))
        .filter(F.size("a") >= 8)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(a) div 8 - 1),"
                    " i -> xxhash64(array_join(slice(a, i*8+1, 8), ' ')))"
                )
            ).alias("chunk"),
        )
    )
    from pyspark.sql import Window

    g = chunks.groupBy("chunk", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cs"),
        F.countDistinct("doc_id").cast("bigint").alias("nd_cs"),
    )
    flagged = g.withColumn(
        "nd", F.sum("nd_cs").over(Window.partitionBy("chunk"))
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.sum("n_cs").cast("bigint").alias("n_chunks"),
            F.sum(F.when(F.col("nd") >= 2, F.col("n_cs")).otherwise(0))
            .cast("bigint")
            .alias("boiler_chunks"),
            F.sum((F.col("nd") >= 2).cast("long"))
            .cast("bigint")
            .alias("distinct_boiler_chunks"),
        )
        .select(
            "source",
            "n_chunks",
            "boiler_chunks",
            "distinct_boiler_chunks",
            F.expr("CAST(boiler_chunks * 1000000 div n_chunks AS BIGINT)").alias(
                "boiler_ppm"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# text: per-lang subword fertility — BPE-ish tokens per whitespace word.
# Fertility is the standard tokenizer-quality metric (how many subwords a
# word fragments into); per-language fertility decides whether a shared
# vocabulary under-serves a language in the training mix. Pure column
# kernels (the same two counters tx_token_counts oracles) + one hash agg.
# ---------------------------------------------------------------------------
@query(
    "tx_subword_fertility",
    f"""
    WITH c AS (
      SELECT lang,
             CAST(CASE WHEN length({_NORM_SQL}) = 0 THEN 0
                  ELSE len({_TOKS_SQL}) END AS BIGINT) AS ws,
             CAST(len(regexp_extract_all(text,
                  '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+)')) AS BIGINT) AS bpe
      FROM documents)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
           CAST(SUM(bpe) * 1000000 // NULLIF(SUM(ws), 0) AS BIGINT) AS fertility_ppm
    FROM c GROUP BY lang ORDER BY lang
    """,
)
def tx_subword_fertility(spark, sf_dir):
    from ..llmdata.text import bpe_ish_token_count, token_count

    d = t(spark, sf_dir, "documents", restore=True)
    c = d.select(
        "lang",
        token_count("text").cast("bigint").alias("ws"),
        bpe_ish_token_count("text").cast("bigint").alias("bpe"),
    )
    return (
        c.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ws").cast("bigint").alias("ws_tokens"),
            F.sum("bpe").cast("bigint").alias("bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            F.expr(
                "CAST(bpe_tokens * 1000000 div NULLIF(ws_tokens, 0) AS BIGINT)"
            ).alias("fertility_ppm"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# lm: Jensen-Shannon divergence of each source's unigram distribution vs
# the whole corpus — the data-mix diagnostic that ranks sources by how
# distributionally far they sit from the blend they feed (high JSD ⇒ the
# source shifts the mix; near-duplicate sources cluster near 0). Computed
# WITHOUT a sources×vocab dense grid: for terms the source lacks (p=0) the
# JSD integrand collapses to ½·q·ln2, so the out-of-vocabulary mass folds
# into one closed-form correction ½·ln2·(1−qcov) and only the (source,
# term) pairs that EXIST are joined — corpus-vocabulary rate, not
# vocabulary×sources rate. Per-term contributions are rounded to 8dp and
# summed through DECIMAL (order-independent, the lm_zipf_slope precedent);
# the corpus-total frame is a 1-row broadcast (BNLJ allowlist).
# ---------------------------------------------------------------------------
@query(
    "lm_js_divergence",
    f"""
    WITH toks AS (SELECT source, UNNEST({_TOKS_SQL}) AS term FROM documents),
    tm AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    cf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tm GROUP BY 1),
    st AS (SELECT source, CAST(SUM(tf) AS BIGINT) AS t_s FROM tm GROUP BY 1),
    tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS t FROM tm),
    c AS (
      SELECT tm.source, cf.cf, st.t_s, tot.t,
             ROUND((tm.tf * 1.0 / st.t_s) * LN(tm.tf * 1.0 / st.t_s)
                 + (cf.cf * 1.0 / tot.t) * LN(cf.cf * 1.0 / tot.t)
                 - (tm.tf * 1.0 / st.t_s + cf.cf * 1.0 / tot.t)
                   * LN((tm.tf * 1.0 / st.t_s + cf.cf * 1.0 / tot.t) / 2),
                 8) AS c
      FROM tm JOIN cf USING (term) JOIN st USING (source) CROSS JOIN tot)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           t_s AS source_tokens,
           ROUND(0.5 * CAST(SUM(CAST(c AS DECIMAL(28,8))) AS DOUBLE)
               + 0.5 * LN(2) * (1.0 - CAST(SUM(cf) AS DOUBLE) / ANY_VALUE(t)),
               6) AS jsd_nats
    FROM c GROUP BY source, t_s ORDER BY source
    """,
)
def lm_js_divergence(spark, sf_dir):
    from ..llmdata.text import _norm

    d = t(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(F.split(_norm("text"), " ")).alias("term"))
    tm = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    cf = tm.groupBy("term").agg(F.sum("tf").cast("bigint").alias("cf"))
    st = tm.groupBy("source").agg(F.sum("tf").cast("bigint").alias("t_s"))
    tot = tm.agg(F.sum("tf").cast("bigint").alias("t"))
    c = (
        tm.join(cf, "term")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "cf",
            "t_s",
            "t",
            F.expr(
                "ROUND((tf * 1.0D / t_s) * LN(tf * 1.0D / t_s)"
                " + (cf * 1.0D / t) * LN(cf * 1.0D / t)"
                " - (tf * 1.0D / t_s + cf * 1.0D / t)"
                "   * LN((tf * 1.0D / t_s + cf * 1.0D / t) / 2), 8)"
            ).alias("c"),
        )
    )
    return (
        c.groupBy("source", "t_s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum(F.col("c").cast("decimal(28,8)")).alias("sc"),
            F.sum("cf").alias("scf"),
            F.first("t").alias("t"),
        )
        .select(
            "source",
            "n_terms",
            F.col("t_s").alias("source_tokens"),
            F.expr(
                "ROUND(0.5 * CAST(sc AS DOUBLE)"
                " + 0.5 * LN(2) * (1.0D - CAST(scf AS DOUBLE) / t), 6)"
            ).alias("jsd_nats"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# ts: 1-D Wasserstein (earth-mover) drift — per event type, the W1
# distance between its value distribution and the all-events blend:
# W1 = ∫|F_et − F_all| dx over the QUANTIZED value grid (1dp buckets).
# Quantization is what makes this a 100 TB shape: the windowed frame is
# the distinct-bucket grid (bounded by the value range × 10, NOT the
# event count), crossed with the handful of event types — so the
# per-event-type cumulative windows run over metadata-rate rows. The
# |F_et − F_all| numerator is exact integer arithmetic
# (|cum_et·t_all − cum_all·t_et|); only the final gap product and the
# grand sum touch doubles (12dp-rounded, DECIMAL-summed).
# ---------------------------------------------------------------------------
@query(
    "ts_wasserstein_drift",
    """
    WITH vt AS (
      SELECT event_type, ROUND(value, 1) AS vb, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    vals AS (SELECT vb, CAST(SUM(n) AS BIGINT) AS n_all FROM vt GROUP BY 1),
    ets AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS t_et FROM vt GROUP BY 1),
    grid AS (
      SELECT e.event_type, v.vb, v.n_all, e.t_et, COALESCE(c.n, 0) AS n_et
      FROM ets e CROSS JOIN vals v
      LEFT JOIN vt c ON c.event_type = e.event_type AND c.vb = v.vb),
    cum AS (
      SELECT event_type, vb, t_et,
             SUM(n_et) OVER w AS cum_et,
             SUM(n_all) OVER w AS cum_all,
             SUM(n_all) OVER (PARTITION BY event_type) AS t_all,
             LEAD(vb) OVER w AS nxt
      FROM grid
      WINDOW w AS (PARTITION BY event_type ORDER BY vb)),
    contrib AS (
      SELECT event_type, t_et,
             CASE WHEN nxt IS NULL THEN CAST(0.0 AS DOUBLE)
                  ELSE ROUND(ABS(cum_et * t_all - cum_all * t_et) * 1.0
                             / (t_et * t_all) * (nxt - vb), 12) END AS c
      FROM cum)
    SELECT event_type,
           t_et AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           ROUND(CAST(SUM(CAST(c AS DECIMAL(38,12))) AS DOUBLE), 8) AS w1_distance
    FROM contrib GROUP BY event_type, t_et ORDER BY event_type
    """,
)
def ts_wasserstein_drift(spark, sf_dir):
    from pyspark.sql import Window

    # NULL measurements carry no distributional mass — and the engines
    # disagree on NULL sort position (Spark NULLS FIRST vs DuckDB NULLS
    # LAST in ASC windows), so the exclusion must be EXPLICIT on both
    # sides rather than left to fixture luck (the with_overlap_chunks
    # null-key lesson, ADVICE r9).
    e = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vt = e.groupBy("event_type", F.round("value", 1).alias("vb")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    vals = vt.groupBy("vb").agg(F.sum("n").cast("bigint").alias("n_all"))
    ets = vt.groupBy("event_type").agg(F.sum("n").cast("bigint").alias("t_et"))
    # dense (event_type x bucket) grid, then left-join the observed counts
    dense = F.broadcast(ets).crossJoin(vals)
    grid = dense.join(
        vt.withColumnRenamed("n", "n_et_raw"), ["event_type", "vb"], "left"
    ).select(
        "event_type",
        "vb",
        "n_all",
        "t_et",
        F.coalesce("n_et_raw", F.lit(0)).cast("bigint").alias("n_et"),
    )
    w = Window.partitionBy("event_type").orderBy("vb")
    w_all = Window.partitionBy("event_type")
    cum = grid.select(
        "event_type",
        "vb",
        "t_et",
        F.sum("n_et").over(w).alias("cum_et"),
        F.sum("n_all").over(w).alias("cum_all"),
        F.sum("n_all").over(w_all).alias("t_all"),
        F.lead("vb").over(w).alias("nxt"),
    )
    contrib = cum.select(
        "event_type",
        "t_et",
        F.expr(
            "CASE WHEN nxt IS NULL THEN CAST(0.0 AS DOUBLE)"
            " ELSE ROUND(ABS(cum_et * t_all - cum_all * t_et) * 1.0D"
            "            / (t_et * t_all) * (nxt - vb), 12) END"
        ).alias("c"),
    )
    return (
        contrib.groupBy("event_type", "t_et")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum(F.col("c").cast("decimal(38,12)")).alias("sc"),
        )
        .select(
            "event_type",
            F.col("t_et").alias("n_events"),
            "n_buckets",
            F.expr("ROUND(CAST(sc AS DOUBLE), 8)").alias("w1_distance"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ml eval: deterministic permutation test — is the urgent-orders mean
# total price different from the rest, or is the observed gap within what
# random label shuffles produce? The significance-test sibling of
# ml_bootstrap_ci, on the same md5-digest-slicing device (4 digests per
# row sliced into 8 independent uniform 16-bit draws = 32 permutations
# for 4 hashes of CPU): permutation b reassigns each row to the treatment
# arm iff u16 < (65536·n_treat) div n — the proportion-preserving
# Bernoulli approximation of the exact permutation distribution (exact
# resampling without replacement is not expressible as a per-row
# decision; the approximation error is O(1/√n) on arm sizes, standard
# for large-n permutation testing). A permutation that leaves one arm
# EMPTY yields a NULL mean difference — such permutations are excluded
# from both the exceed count and the denominator (r10 ADVICE: counting
# them as non-exceeding while still dividing by 33 biases p low), so
# p = (1 + #{valid: |d_b| ≥ |d_obs|}) / (1 + #valid), the add-one form
# that never reports p = 0 and n_perms reports #valid. All means go
# through the round-to-1e-6 ladder, so both engines compare identical
# doubles.
# ---------------------------------------------------------------------------
@query(
    "ml_permutation_test",
    f"""
    WITH x AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS v,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g,
             [md5('p0|' || CAST(o_orderkey AS VARCHAR)),
              md5('p1|' || CAST(o_orderkey AS VARCHAR)),
              md5('p2|' || CAST(o_orderkey AS VARCHAR)),
              md5('p3|' || CAST(o_orderkey AS VARCHAR))] AS dig
      FROM orders),
    pt AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(g) AS BIGINT) AS n_treat,
             ROUND(CAST(SUM(CASE WHEN g = 1 THEN v END) AS DOUBLE)
                   / SUM(g) * 1000000) / 1000000.0
           - ROUND(CAST(SUM(CASE WHEN g = 0 THEN v END) AS DOUBLE)
                   / SUM(1 - g) * 1000000) / 1000000.0 AS obs_diff,
             (65536 * CAST(SUM(g) AS BIGINT)) // COUNT(*) AS cut
      FROM x),
    r AS (
      SELECT b.b, x.v,
             CAST(list_sum(list_transform(
               list_zip(string_split(substring(dig[b.b // 8 + 1],
                                               4 * (b.b % 8) + 1, 4), ''),
                        range(1, 5)),
               p -> (list_position({_HEX}, p[1]) - 1) * power(16, 4 - p[2]))) AS BIGINT)
               AS u
      FROM x CROSS JOIN (SELECT UNNEST(range(0, 32)) AS b) b),
    d AS (
      SELECT r.b,
             ROUND(CAST(SUM(CASE WHEN r.u < pt.cut THEN r.v END) AS DOUBLE)
                   / NULLIF(SUM(CASE WHEN r.u < pt.cut THEN 1 ELSE 0 END), 0)
                   * 1000000) / 1000000.0
           - ROUND(CAST(SUM(CASE WHEN r.u >= pt.cut THEN r.v END) AS DOUBLE)
                   / NULLIF(SUM(CASE WHEN r.u >= pt.cut THEN 1 ELSE 0 END), 0)
                   * 1000000) / 1000000.0
               AS diff
      FROM r CROSS JOIN pt GROUP BY r.b),
    ex AS (
      SELECT CAST(SUM(CASE WHEN ABS(d.diff) >= ABS(pt.obs_diff) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_exceed,
             CAST(COUNT(d.diff) AS BIGINT) AS n_valid
      FROM d CROSS JOIN pt)
    SELECT pt.n_rows, pt.n_treat,
           ROUND(pt.obs_diff, 6) AS obs_diff,
           ex.n_valid AS n_perms,
           ex.n_exceed,
           ROUND((1 + ex.n_exceed) * 1.0 / (1 + ex.n_valid), 6) AS p_value
    FROM pt CROSS JOIN ex
    """,
)
def ml_permutation_test(spark, sf_dir):
    o = t(spark, sf_dir, "orders", restore=True).select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("g"),
        F.array(
            *[
                F.md5(F.concat(F.lit(f"p{i}|"), F.col("o_orderkey").cast("string")))
                for i in range(4)
            ]
        ).alias("dig"),
    )
    pt = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("g").cast("bigint").alias("n_treat"),
        (
            F.round(
                F.sum(F.when(F.col("g") == 1, F.col("v"))).cast("double")
                / F.sum("g")
                * 1000000
            )
            / 1000000.0
            - F.round(
                F.sum(F.when(F.col("g") == 0, F.col("v"))).cast("double")
                / F.sum(F.lit(1) - F.col("g"))
                * 1000000
            )
            / 1000000.0
        ).alias("obs_diff"),
        F.expr("(65536 * CAST(SUM(g) AS BIGINT)) div COUNT(*)").alias("cut"),
    )
    r = o.withColumn("b", F.explode(F.sequence(F.lit(0), F.lit(31)))).withColumn(
        "u",
        F.conv(
            F.expr(
                "substring(element_at(dig, CAST(b div 8 AS INT) + 1),"
                " 4 * (b % 8) + 1, 4)"
            ),
            16,
            10,
        ).cast("bigint"),
    )
    d = (
        r.crossJoin(F.broadcast(pt.select("cut")))
        .groupBy("b")
        .agg(
            (
                F.round(
                    F.sum(F.when(F.col("u") < F.col("cut"), F.col("v"))).cast("double")
                    / F.nullif(
                        F.sum(F.when(F.col("u") < F.col("cut"), 1).otherwise(0)),
                        F.lit(0),
                    )
                    * 1000000
                )
                / 1000000.0
                - F.round(
                    F.sum(F.when(F.col("u") >= F.col("cut"), F.col("v"))).cast(
                        "double"
                    )
                    / F.nullif(
                        F.sum(F.when(F.col("u") >= F.col("cut"), 1).otherwise(0)),
                        F.lit(0),
                    )
                    * 1000000
                )
                / 1000000.0
            ).alias("diff")
        )
    )
    # empty-arm permutations (diff IS NULL) are excluded from BOTH the
    # exceed count and the p-value denominator (r10 ADVICE)
    ex = (
        d.crossJoin(F.broadcast(pt.select("obs_diff")))
        .agg(
            F.sum(
                (F.abs(F.col("diff")) >= F.abs(F.col("obs_diff"))).cast("long")
            )
            .cast("bigint")
            .alias("n_exceed"),
            F.count("diff").cast("bigint").alias("n_valid"),
        )
    )
    return (
        pt.crossJoin(F.broadcast(ex))
        .select(
            "n_rows",
            "n_treat",
            F.round("obs_diff", 6).alias("obs_diff"),
            F.col("n_valid").alias("n_perms"),
            "n_exceed",
            F.expr("ROUND((1 + n_exceed) * 1.0D / (1 + n_valid), 6)").alias("p_value"),
        )
    )
