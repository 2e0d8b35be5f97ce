"""Empty/degenerate-input behavior of the LLM-data operators and the
API-over-DAG integration (engine.sql against the built pipeline views).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from emdatapipelines_spark.api import QueryEngine
from emdatapipelines_spark.llmdata.dedup import (
    exact_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from emdatapipelines_spark.llmdata.text import chunk_tokens, token_count
from emdatapipelines_spark.pipelines import build_emergency_dag

SF_SMALL = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_ops_on_empty_input(spark):
    empty = _docs(spark, [])
    assert exact_dedup(empty).count() == 0
    assert ngram_jaccard_pairs(empty, threshold=0.1).count() == 0
    assert minhash_signatures(empty, num_hashes=8).count() == 0
    assert simhash(empty, bits=8).count() == 0


def test_dedup_identical_docs(spark):
    d = _docs(spark, [(1, "the same exact text here"), (2, "the same exact text here")])
    # exact dedup keeps min id
    kept = exact_dedup(d).collect()
    assert [r["doc_id"] for r in kept] == [1]
    # identical docs always have identical signatures / fingerprints
    sigs = {r["id"]: r["signature"] for r in minhash_signatures(d, n=2, num_hashes=8).collect()}
    assert sigs[1] == sigs[2]
    fps = {r["id"]: r["simhash"] for r in simhash(d).collect()}
    assert fps[1] == fps[2]
    # jaccard of identical shingle sets is exactly 1
    pairs = ngram_jaccard_pairs(d, n=2, threshold=0.99).collect()
    assert len(pairs) == 1 and pairs[0]["jaccard"] == 1.0


def test_chunking_edges(spark):
    d = _docs(spark, [(1, "short doc"), (2, " ".join(f"w{i}" for i in range(200)))])
    out = d.select("doc_id", F.explode(chunk_tokens("text", chunk_size=64, overlap=16)).alias("c"))
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r["doc_id"], []).append(r["c"])
    # short doc → exactly one chunk containing the whole text
    assert len(by_id[1]) == 1 and by_id[1][0]["chunk_text"] == "short doc"
    # 200 tokens, stride 48 → ceil((200-16)/48) = 4 chunks
    assert len(by_id[2]) == 4
    # overlap: chunk i+1 starts 48 tokens after chunk i
    first_tokens = [c["chunk_text"].split(" ")[0] for c in sorted(by_id[2], key=lambda c: c["chunk_index"])]
    assert first_tokens == ["w0", "w48", "w96", "w144"]


def test_token_count_empty_string(spark):
    d = _docs(spark, [(1, ""), (2, "   "), (3, "one two")])
    got = {r["doc_id"]: r["n"] for r in d.select("doc_id", token_count("text").alias("n")).collect()}
    assert got == {1: 0, 2: 0, 3: 2}


def test_engine_sql_over_built_dag(spark):
    reg = build_emergency_dag(spark, SF_SMALL)
    reg.build(spark)
    eng = QueryEngine(spark)
    df = eng.sql(
        "SELECT region_name, COUNT(*) AS n FROM emergency_events GROUP BY region_name",
        org="research-lab",
        org_type="research",
    )
    assert df.count() > 0
    assert eng.usage_log[-1]["org"] == "research-lab"


def test_connected_components_known_graph(spark):
    from emdatapipelines_spark.llmdata.dedup import connected_components

    # chain 1-2-3-4, separate pair 10-11, triangle 20-21-22
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_new_operators_on_empty_input(spark):
    """Every new operator must degrade cleanly on empty frames — at scale an
    empty partition/batch is a daily occurrence, not an edge case."""
    from pyspark.sql import functions as F

    from emdatapipelines_spark.operators.joins import fuzzy_name_pairs
    from emdatapipelines_spark.operators.reaggregate import (
        merge_partials,
        partial_aggregate,
        salted_aggregate,
    )
    from emdatapipelines_spark.operators.sessions import funnel_stages
    from emdatapipelines_spark.quality.drift import bin_counts, psi_by_bin

    empty = spark.createDataFrame([], "k INT, ts TIMESTAMP, et STRING, x DOUBLE")

    # funnel on no events: all stages exist with zero users
    got = {
        r["stage"]: r["users"]
        for r in funnel_stages(empty, "k", "ts", "et", ["a", "b"]).collect()
    }
    assert got == {"a": 0, "a>b": 0}

    # partial/merge/salted on empty: empty result, correct schema
    partials = partial_aggregate(empty, ["k"], {"x": "x"})
    assert partials.count() == 0
    assert merge_partials(partials, ["k"], ["x"]).count() == 0
    assert salted_aggregate(empty, ["k"], {"x": "x"}, F.col("k")).count() == 0

    # PSI with an empty side: no shared bins, no rows, no division error
    some = bin_counts(spark.range(10).selectExpr("CAST(id AS DOUBLE) AS x"), F.col("x").cast("int"))
    none = bin_counts(empty, F.col("x").cast("int"))
    assert psi_by_bin(some, none).count() == 0

    # fuzzy matcher on empty: empty
    assert fuzzy_name_pairs(empty.select(F.col("et").alias("name")), "name").count() == 0


def test_simhash_drops_empty_and_keeps_row_per_input(spark):
    """Empty/whitespace docs carry no fingerprint — emitting the all-zero
    word would pair every empty doc as a hamming-distance-0 near-dup.
    Duplicate ids are NOT collapsed (one row per input row)."""
    d = _docs(
        spark,
        [(1, "real text here"), (2, ""), (3, "   "), (1, "real text here"), (4, None)],
    )
    rows = simhash(d).collect()
    assert [r["id"] for r in sorted(rows, key=lambda r: r["id"])] == [1, 1]
    assert all(r["simhash"] != 0 for r in rows)


def test_pagerank_empty_edges(spark):
    from emdatapipelines_spark.operators.graph import pagerank_weighted

    empty = spark.createDataFrame([], "src long, dst long, w long")
    out = pagerank_weighted(empty)
    assert out.columns == ["id", "rank"]
    assert out.count() == 0


def test_unigram_surprisal_empty_corpus(spark):
    from emdatapipelines_spark.llmdata.text import unigram_surprisal

    out = unigram_surprisal(_docs(spark, []))
    assert out.columns == ["doc_id", "n_tokens", "mean_surprisal"]
    assert out.count() == 0


def test_incremental_rollup_empty_batch_commits_nothing_wrong(spark, tmp_path):
    """An empty microbatch must still commit (advancing the batch-id ledger)
    without corrupting the stored partials."""
    from emdatapipelines_spark.operators.reaggregate import merge_partials
    from emdatapipelines_spark.streaming.incremental import apply_rollup_batch
    from emdatapipelines_spark.versioned import read_versioned

    table = str(tmp_path / "tbl")
    data = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 1.0)], "k INT, x DOUBLE")
    empty = spark.createDataFrame([], "k INT, x DOUBLE")
    assert apply_rollup_batch(data, 0, table, ["k"], {"x": "x"})
    assert apply_rollup_batch(empty, 1, table, ["k"], {"x": "x"})
    served = {
        r["k"]: (r["x_sum"], r["x_n"])
        for r in merge_partials(read_versioned(spark, table), ["k"], ["x"]).collect()
    }
    assert served == {1: (6.0, 2), 2: (1.0, 1)}


def test_duplicated_ngram_spans_known_docs(spark):
    """Hand-checkable exact-substring spans: two docs share the 6-token run
    'a b c d e f', giving two overlapping 5-gram anchors that must merge
    into ONE maximal span per doc at the right positions; within-doc-only
    repetition does not count (cross-document df >= 2)."""
    from emdatapipelines_spark.llmdata.dedup import duplicated_ngram_spans

    d = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "x y a b c d e f q"),
            (3, "p q r s t p q r s t"),  # repeats only within itself
            (4, "short doc"),  # < n tokens: emits nothing
        ],
    )
    rows = {
        (r["id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in duplicated_ngram_spans(d, n=5, min_docs=2).collect()
    }
    assert rows == {(1, 0, 5, 6), (2, 2, 7, 6)}


def test_remove_duplicated_spans_keeps_one_canonical_copy(spark):
    """Lee et al. removal semantics: the min-id doc keeps the duplicated
    span, every other byte-identical occurrence is cut; non-duplicated text
    and sub-n docs pass through untouched."""
    from emdatapipelines_spark.llmdata.dedup import remove_duplicated_spans

    d = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "x y a b c d e f q"),
            (3, "totally unrelated words only here"),
            (4, "tiny"),
        ],
    )
    out = {r["doc_id"]: r["text"] for r in remove_duplicated_spans(d, n=5, min_docs=2).collect()}
    assert out[1] == "a b c d e f g h"  # min id keeps its span
    assert out[2] == "x y q"  # the 6-token duplicated run is cut
    assert out[3] == "totally unrelated words only here"
    assert out[4] == "tiny"
    # idempotent-ish: a second pass finds nothing left to remove
    d2 = spark.createDataFrame([(k, v) for k, v in out.items()], "doc_id long, text string")
    out2 = {r["doc_id"]: r["text"] for r in remove_duplicated_spans(d2, n=5, min_docs=2).collect()}
    assert out2 == out
