"""Distributed BPE merge learning (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units").

Training a subword tokenizer is a standard step of a training-data
pipeline. The key scale observation: after the one corpus-wide token count,
every BPE iteration operates on the DISTINCT-WORD vocabulary weighted by
frequency — vocab-bounded (millions of rows), not corpus-bounded (trillions
of tokens). So the expensive corpus pass happens once, and each merge step
is a small explode + map-side-combined groupBy + a 1-row driver pull
(the argmax pair), exactly the Pregel-style shape of
`operators/graph.pagerank_weighted`: ``localCheckpoint`` between iterations
keeps the plan flat.

The merge application is a row-local ordered fold over each word's symbol
string (greedy left-to-right, non-overlapping — the published semantics),
expressed with ``F.aggregate`` over a ``chr(31)``-separated symbol string:
pure JVM string arithmetic, no UDF, and bit-identically reproducible by
DuckDB's ``list_reduce`` (the oracle) because both engines run the same
fold on the same strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SEP = "\x1f"
END_MARKER = "</w>"


def _fold_merge(state: Column, a: str, b: str) -> Column:
    """Apply merge (a, b) -> ab to one word's SEP-joined symbol string:
    greedy left-to-right single pass. The accumulator is the merged prefix;
    its last symbol is ``substring_index(acc, SEP, -1)``."""
    syms = F.split(state, SEP)
    last = lambda acc: F.substring_index(acc, SEP, -1)  # noqa: E731
    folded = F.aggregate(
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
        F.element_at(syms, 1),
        lambda acc, x: F.when(
            (last(acc) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.substring(acc, F.lit(1), F.length(acc) - F.length(last(acc))),
                F.lit(a + b),
            ),
        ).otherwise(F.concat(acc, F.lit(SEP), x)),
    )
    return F.when(F.size(syms) <= 1, state).otherwise(folded)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: normalized [a-z0-9]+ word frequencies."""
    from .text import _norm

    toks = F.explode(F.split(_norm(text_col), " ")).alias("tok")
    return (
        docs.select(toks)
        .select(F.regexp_replace("tok", "[^a-z0-9]", "").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def learn_bpe_merges(
    docs: DataFrame, text_col: str = "text", k: int = 8
) -> DataFrame:
    """Learn the first ``k`` BPE merges over the corpus.

    Returns (step, sym_a, sym_b, merged, pair_count) — the merge table a
    tokenizer would persist. Ties in pair count break lexicographically on
    (sym_a, sym_b) so the result is fully deterministic. Stops early if the
    vocabulary runs out of pairs.
    """
    merges_df, _ = learn_bpe(docs, text_col=text_col, k=k)
    return merges_df


def learn_bpe(
    docs: DataFrame, text_col: str = "text", k: int = 8
) -> tuple[DataFrame, DataFrame]:
    """Core training loop: returns (merge table, final vocab mapping).

    The vocab frame (word, state, cnt) carries each distinct word's fully
    merged SEP-joined subword string — the word → tokens dictionary a real
    tokenizer ships. Encoding a corpus then NEVER folds per corpus word:
    it joins the word stream against this vocab-bounded mapping
    (:func:`bpe_token_counts`), which is also why interpreted-HOF fold cost
    stays off the corpus-sized path."""
    spark = docs.sparkSession
    vocab = (
        word_counts(docs, text_col)
        .select(
            "word",
            F.concat(
                F.array_join(F.split("word", ""), SEP), F.lit(SEP + END_MARKER)
            ).alias("state"),
            "cnt",
        )
        .localCheckpoint()
    )
    merges: list[tuple] = []
    for step in range(1, k + 1):
        syms = F.split("state", SEP)
        pair = F.zip_with(
            syms,
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        )
        best = (
            vocab.select(F.explode(pair).alias("p"), "cnt")
            .filter(F.col("p.b").isNotNull())
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .first()
        )
        if best is None:
            break
        a, b, c = best["a"], best["b"], int(best["c"])
        merges.append((step, a, b, a + b, c))
        vocab = vocab.select(
            "word", _fold_merge(F.col("state"), a, b).alias("state"), "cnt"
        ).localCheckpoint()
    merges_df = spark.createDataFrame(
        merges, "step int, sym_a string, sym_b string, merged string, pair_count bigint"
    )
    return merges_df, vocab


def bpe_token_counts(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc BPE token counts via the vocab mapping (the scalable encode):
    explode the doc word stream, equi-join the word → subwords dictionary,
    aggregate counts per doc. The dictionary is vocab-bounded, so Spark
    broadcasts it when small and shuffles on the word key otherwise; no
    per-corpus-word fold ever runs. Docs with zero valid words drop out
    (inner join), matching the SQL twin."""
    from .text import _norm

    words = docs.select(
        F.col(id_col),
        F.explode(F.split(_norm(text_col), " ")).alias("tok"),
    ).select(
        id_col, F.regexp_replace("tok", "[^a-z0-9]", "").alias("word")
    ).filter(F.col("word") != "")
    toks = words.join(vocab.select("word", "state"), "word").select(
        id_col, F.explode(F.split("state", SEP)).alias("sym")
    )
    return toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bpe_tokens"),
        F.countDistinct("sym").cast("bigint").alias("distinct_bpe_tokens"),
    )


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a learned merge list: per word, chars + end marker,
    then each merge applied in order — the standard encode path, still pure
    column expressions (the merge list is a plan-side constant), explode-free
    and row-local."""
    from .text import _norm

    words = F.filter(
        F.transform(
            F.split(_norm(text_col), " "),
            lambda w: F.regexp_replace(w, "[^a-z0-9]", ""),
        ),
        lambda w: w != "",
    )
    return docs.withColumn(
        out_col,
        F.flatten(
            F.transform(
                words,
                lambda w: F.split(
                    _apply_merges_to_word(w, merges), SEP
                ),
            )
        ),
    )


def _apply_merges_to_word(word: Column, merges: list[tuple[str, str]]) -> Column:
    state: Column = F.concat(
        F.array_join(F.split(word, ""), SEP), F.lit(SEP + END_MARKER)
    )
    for a, b in merges:
        state = _fold_merge(state, a, b)
    return state
