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
