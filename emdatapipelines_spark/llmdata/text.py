"""Text analysis operators: token counts, quality scoring, language ID,
fingerprinting. All pure column expressions — JVM-evaluated, no UDFs —
so they run at scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _norm(col):
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def token_count(col="text") -> Column:
    """Whitespace token count (empty string → 0)."""
    n = _norm(col)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(F.split(n, " "))).cast("int")


def bpe_ish_token_count(col="text") -> Column:
    """BPE-ish token estimate: count of word/number/punctuation units via the
    GPT-style pre-tokenizer regex (letters runs, digit runs, punctuation
    runs), a cheap proxy for subword token counts."""
    c = F.col(col) if isinstance(col, str) else col
    units = F.regexp_extract_all(c, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+)"), 1)
    return F.size(units).cast("int")


#: tiny per-language stopword sets for the n-gram/stopword-hit heuristic.
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "une", "un", "des", "du", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "que"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}


def _hits(col, words: list[str]) -> Column:
    """Non-distinct count of tokens appearing in the word set."""
    toks = F.split(_norm(col), " ")
    lits = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lits, t)))


def _argmax_lang(scores: dict[str, Column], default: str) -> Column:
    """First-wins argmax ladder over per-language score columns (tie order
    en→de→fr→es→zh); all-zero → ``default``."""
    order = ["en", "de", "fr", "es", "zh"]
    best = F.greatest(*[scores[lang] for lang in order])
    out = F.when(best <= 0, F.lit(default))
    for lang in order:
        out = out.when(scores[lang] == best, F.lit(lang))
    return out.otherwise(F.lit(default))


def language_id(col="text", default: str = "unknown") -> Column:
    """Stopword-hit language heuristic: the language whose stopword set hits
    the most tokens wins (ties broken by fixed language order en→de→fr→es→zh);
    no hits → ``default``. A real system would use charset n-gram profiles;
    the operator shape (pure expression, argmax over per-language scores) is
    the scalable part.

    Single-expression form — each language's hit count appears twice in the
    tree. For bulk scans prefer :func:`add_language_id`, which stages
    tokenization and per-language counts so each is evaluated once per row.
    """
    scores = {lang: _hits(col, words) for lang, words in LANG_STOPWORDS.items()}
    return _argmax_lang(scores, default)


def add_language_id(df, text_col: str = "text", out: str = "lang_pred", default: str = "unknown"):
    """Staged language ID over a DataFrame: tokenize once, count each
    language's stopword hits once, then argmax over plain int columns.

    The stages are separate projections on purpose: Catalyst's
    CollapseProject keeps non-cheap expressions that are referenced more
    than once in their own projection, so the regex normalization + split
    runs exactly once per row (vs. once per language in the naive
    single-expression form) — at 100 TB the tokenizer is the scan cost.
    """
    toks = F.split(_norm(text_col), " ")
    staged = df.withColumn("__lid_toks", toks)
    hit_cols = {}
    for lang, words in LANG_STOPWORDS.items():
        lits = F.array(*[F.lit(w) for w in words])
        hit_cols[lang] = F.size(
            F.filter(F.col("__lid_toks"), lambda t: F.array_contains(lits, t))
        )
    staged = staged.select("*", *[c.alias(f"__lid_h_{lang}") for lang, c in hit_cols.items()])
    scores = {lang: F.col(f"__lid_h_{lang}") for lang in LANG_STOPWORDS}
    staged = staged.withColumn(out, _argmax_lang(scores, default))
    return staged.drop("__lid_toks", *[f"__lid_h_{lang}" for lang in LANG_STOPWORDS])


def text_quality(col="text") -> dict[str, Column]:
    """Quality-signal columns: n_chars, n_tokens, mean token length,
    stopword ratio (en), punctuation ratio, and a composite 0–1 score.
    Thresholds follow common web-corpus filters (Gopher-style rules)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("int")
    n_tokens = token_count(col)
    mean_tok = F.round(F.length(_norm(col)) / F.greatest(n_tokens, F.lit(1)), 6)
    stop_ratio = F.round(_hits(col, LANG_STOPWORDS["en"]) / F.greatest(n_tokens, F.lit(1)), 6)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    punct_ratio = F.round(punct / F.greatest(n_chars, F.lit(1)), 6)
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_tok >= 2.0) & (mean_tok <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": mean_tok,
        "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "quality_score": F.round(score, 2),
    }


def chunk_tokens(col="text", chunk_size: int = 64, overlap: int = 16) -> Column:
    """Split a document into overlapping token-window chunks — the standard
    pre-training/RAG chunking shape (stride = chunk_size − overlap). Returns
    ``array<struct<chunk_index int, chunk_text string>>``; explode it to get
    one row per chunk. Pure expressions — sequence + slice + concat_ws — so
    chunking runs at scan speed with no Python in the loop.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    toks = F.split(_norm(col), " ")
    n = F.size(toks)
    # chunk starts: 0, stride, 2·stride, … while start < n (at least one)
    n_chunks = F.greatest(F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_index"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, chunk_size)).alias("chunk_text"),
        ),
    )


def unigram_surprisal(df, id_col: str = "doc_id", text_col: str = "text"):
    """Corpus-trained unigram language-model score per document: mean token
    surprisal −ln p(w) with add-one smoothing, p(w) = (c(w)+1)/(N+V). The
    cheap stand-in for perplexity-based quality filtering (CCNet/Gopher
    style): low mean surprisal ≈ predictable/templated text, high ≈ rare-
    token noise — both tails are standard pre-training filter targets.

    Two passes, Spark-first: (1) one shuffle builds the token frequency
    table; (2) the corpus joins against the BROADCAST vocabulary — natural-
    language vocabularies are dimension-sized (Heaps' law: ~millions of
    types at 100 TB, well under broadcast limits after a min-count floor) so
    the scoring pass never shuffles the corpus. N and V are two scalars
    pulled to the driver (bounded by construction).

    Determinism: per-token surprisal is rounded to 8 dp, summed in exact
    DECIMAL, then averaged and rounded to 6 (the `davg` convention; ln is
    cross-engine-stable here — same precedent as the PSI drift score).
    """
    tok = df.select(F.col(id_col), F.explode(F.split(_norm(text_col), " ")).alias("w"))
    # materialize the vocabulary ONCE: both the scalar N/V pull and the
    # broadcast join below consume it, and without truncation the full
    # corpus tokenize+shuffle subtree would run twice. localCheckpoint on a
    # vocab-sized frame is cheap and needs no unpersist bookkeeping.
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=True)
    n, v = freq.agg(F.sum("c"), F.count(F.lit(1))).first()
    if n is None:  # empty corpus: SUM(c) is null; nothing to score
        id_type = dict(df.dtypes)[id_col]
        return df.sparkSession.createDataFrame(
            [], f"`{id_col}` {id_type}, n_tokens bigint, mean_surprisal double"
        )
    surp = F.round(-F.log((F.col("c") + F.lit(1.0)) / F.lit(float(n + v))), 8)
    scored = tok.join(F.broadcast(freq), "w").select(F.col(id_col), surp.alias("s"))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        (
            F.round(
                F.sum(F.col("s").cast("decimal(28,8)")).cast("double")
                / F.count(F.lit(1))
                * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        ).alias("mean_surprisal"),
    )


def bigram_nll(df, id_col: str = "doc_id", text_col: str = "text"):
    """Corpus-trained BIGRAM language-model score per document: mean
    transition surprisal −ln p(w_i | w_{i−1}) with add-one smoothing,
    p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) — the next step up from
    :func:`unigram_surprisal` toward the LM-perplexity quality filter of
    CCNet (Wenzek et al., LREC 2020): documents whose transitions the
    corpus model finds surprising are noise/rare-token tails, documents
    that are too predictable are boilerplate; both are standard
    pre-training culls. (Scores are reported as mean negative log-prob —
    perplexity is its exp, a monotone display transform.)

    Spark-first shape: bigram pairs come from ONE in-row array transform
    (no self-join on position — `transform(sequence(1, n−1))` zips each
    token with its successor inside the row), then (1) one shuffle keyed
    on (w1,w2) builds the transition counts, (2) prefix counts c(w1)
    re-aggregate from those counts (bigram-vocab-rate, not corpus-rate),
    and (3) the scoring pass joins the corpus bigram stream against the
    model on (w1,w2). The model is bigram-type cardinality (Heaps-law
    sublinear in corpus size but potentially beyond broadcast at 100 TB),
    so the join is left to AQE: broadcast when the model is small, shuffle
    hash join on the same (w1,w2) key otherwise. V is one scalar
    (distinct-token count) pulled to the driver.

    Determinism: per-bigram surprisal rounds to 8 dp, sums in exact
    DECIMAL, and the mean rounds in the integer micro-domain (the `davg`
    convention) — hash-agg order cannot move the result.
    """
    toks = df.select(
        F.col(id_col), F.split(_norm(text_col), " ").alias("tk")
    )
    # sequence(1, n-1) REVERSES when n < 2 (Spark infers step −1), so the
    # pair list must be explicitly emptied for 0/1-token docs.
    pair_list = F.when(
        F.size("tk") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("tk") - 2),
            lambda i: F.struct(
                F.get("tk", i).alias("w1"),
                F.get("tk", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    pairs = toks.select(
        F.col(id_col), F.explode(pair_list).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c2 = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=True)  # model reused by c1 reagg + scoring
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    v = toks.select(F.explode("tk").alias("w")).agg(
        F.countDistinct("w")
    ).first()[0]
    if not v:
        id_type = dict(df.dtypes)[id_col]
        return df.sparkSession.createDataFrame(
            [], f"`{id_col}` {id_type}, n_bigrams bigint, avg_bigram_nll double"
        )
    s = F.round(
        -F.log((F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.lit(float(v)))), 8
    )
    scored = (
        pairs.join(c2, ["w1", "w2"]).join(c1, "w1").select(F.col(id_col), s.alias("s"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        (
            F.round(
                F.sum(F.col("s").cast("decimal(28,8)")).cast("double")
                / F.count(F.lit(1))
                * F.lit(1000000.0)
            )
            / F.lit(1000000.0)
        ).alias("avg_bigram_nll"),
    )


def nb_token_quality(
    df,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
):
    """Naive Bayes document quality classifier, trained and applied in one
    job — the fastText-style corpus-filtering workflow (CCNet, GPT-3 §2.2,
    LLaMA): seed a binary label from a cheap heuristic (or a curated
    positive set like Wikipedia), fit token log-odds, score every document,
    keep the high-scoring tail. ``label`` is any 0/1 integer Column over the
    input rows.

    Model: binomial NB with add-``alpha`` smoothing over the shared
    vocabulary V: ``lo(w) = ln((c1(w)+α)/(N1+α|V|)) − ln((c0(w)+α)/
    (N0+α|V|))``; ``score(d) = prior + Σ_{w∈d} lo(w)`` with repeats counted,
    prior the smoothed doc-count log-odds. Returns
    ``(id_col, n_tokens, nb_score)``; score > 0 ⇔ classified positive.

    Spark shape (same as :func:`unigram_surprisal`): ONE shuffle fits the
    model (token groupBy, map-side combined), the fitted vocabulary is
    checkpointed once and BROADCAST back, so the scoring pass never shuffles
    the corpus — N1/N0/|V|/prior are the only driver scalars, all bounded.
    Training is a single pass: NB's sufficient statistics are additive
    counts, which is exactly why it is the right first classifier at 100 TB
    (no SGD iterations, no convergence, trivially mergeable across
    partitions — the same mergeable-partials argument as
    ``operators/reaggregate.py``).

    Determinism: per-token log-odds round to 8 dp, summed in exact DECIMAL
    with the 8-dp prior, and the exact 8-dp decimal casts to double — no
    final re-round, so there is NO half-way boundary for the two engines to
    disagree on (Spark decimal round is HALF_UP, DuckDB's is half-even; a
    re-round to 6 dp measurably diverged on ~1% of fixture rows).
    """
    lab = df.select(
        F.col(id_col), F.col(text_col), label.cast("int").alias("y")
    ).filter(F.col(text_col).isNotNull())
    tok = lab.select(
        F.col(id_col), "y", F.explode(F.split(_norm(text_col), " ")).alias("w")
    )
    cnt = (
        tok.groupBy("w")
        .agg(
            F.sum("y").alias("c1"),
            F.sum(F.lit(1) - F.col("y")).alias("c0"),
        )
        .localCheckpoint(eager=True)
    )
    n1, n0, v = cnt.agg(F.sum("c1"), F.sum("c0"), F.count(F.lit(1))).first()
    if n1 is None:  # empty corpus
        id_type = dict(df.dtypes)[id_col]
        return df.sparkSession.createDataFrame(
            [], f"`{id_col}` {id_type}, n_tokens bigint, nb_score double"
        )
    d1, d0 = lab.agg(F.sum("y"), F.sum(F.lit(1) - F.col("y"))).first()
    import math

    prior = round(
        math.log((d1 + alpha) / (d0 + alpha)), 8
    )  # smoothed doc-count log-odds; exact same float both engines
    denom1, denom0 = float(n1 + alpha * v), float(n0 + alpha * v)
    lo = F.round(
        F.log((F.col("c1") + F.lit(alpha)) / F.lit(denom1))
        - F.log((F.col("c0") + F.lit(alpha)) / F.lit(denom0)),
        8,
    )
    scored = tok.join(F.broadcast(cnt), "w").select(F.col(id_col), lo.alias("lo"))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        (
            # re-narrow the sum to (28,8) BEFORE adding the prior: sum of
            # decimal(28,8) widens to (38,8), and (38,8)+(28,8) would need
            # precision 39 > 38, making Spark silently REDUCE the result
            # scale to 7 — rounding the 8th decimal and diverging from the
            # exact-decimal oracle by up to 5e-8 per doc
            F.sum(F.col("lo").cast("decimal(28,8)")).cast("decimal(28,8)")
            + F.lit(prior).cast("decimal(28,8)")
        )
        .cast("double")
        .alias("nb_score"),
    )


def fingerprint(col="text") -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set (the classic "fingerprint" canonicalization — robust to token
    reordering and duplication)."""
    toks = F.array_sort(F.array_distinct(F.split(_norm(col), " ")))
    return F.md5(F.concat_ws(" ", toks))


def bigram_repetition(df, id_col: str = "doc_id", text_col: str = "text"):
    """Gopher/C4-style repetition signals per document: the fraction of word
    bigram occurrences that are repeats (1 − distinct/total) and the share of
    the single most frequent bigram. High values flag boilerplate, keyword
    stuffing, and degenerate generations — standard pre-training filters.

    ZERO shuffles: every statistic is per-document, so instead of exploding
    bigrams into two keyed aggregations (the v1 shape — two shuffles of the
    full token stream), sort the row's bigram array and fold run-lengths in
    one higher-order ``aggregate`` pass. Per row O(n log n) JVM work, no
    exchange at all — at 100 TB this removes the dominant cost entirely
    (measured 5.0s → sub-second at sf0.1). Emits docs with ≥ 2 tokens.
    """
    toks = F.split(_norm(text_col), " ")
    # O(n) bigrams: zip the array with its one-off shift — indexing via
    # slice-inside-transform is O(i) per element, O(n^2) per document
    n_toks = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n_toks - 1),
        F.slice(toks, 2, n_toks - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    base = df.filter(F.size(toks) >= 2).select(
        F.col(id_col), F.array_sort(bigrams).alias("__bg")
    )
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("maxrun"),
        F.lit(0).cast("long").alias("uniq"),
    )

    def step(acc, x):
        is_new = acc["prev"].isNull() | (acc["prev"] != x)
        one = F.lit(1).cast("long")
        newrun = F.when(is_new, one).otherwise(acc["run"] + one)
        return F.struct(
            x.alias("prev"),
            newrun.alias("run"),
            F.greatest(acc["maxrun"], newrun).alias("maxrun"),
            (acc["uniq"] + F.when(is_new, one).otherwise(F.lit(0).cast("long"))).alias("uniq"),
        )

    stats = F.aggregate(F.col("__bg"), acc0, step)
    n = F.size("__bg").cast("bigint")
    return base.select(
        F.col(id_col),
        n.alias("n_bigrams"),
        stats["uniq"].cast("bigint").alias("distinct_bigrams"),
        F.round(1 - stats["uniq"] * 1.0 / n, 6).alias("dup_bigram_frac"),
        F.round(stats["maxrun"] * 1.0 / n, 6).alias("top_bigram_frac"),
    )


def c4_line_filter(
    col="text",
    *,
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    blocklist: tuple[str, ...] = ("javascript", "lorem ipsum", "cookie policy", "{"),
    min_kept_lines: int = 1,
):
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2) as pure JVM
    higher-order functions — no UDF, no explode: ``split`` -> ``filter`` with
    a lambda -> ``array_join`` stays inside whole-stage codegen, so at 100 TB
    the cost is one codegen'd scan.

    Line rules (a line survives if ALL hold):
      - ends in terminal punctuation (``. ! ? "``), when required;
      - has at least ``min_words_per_line`` whitespace words;
      - contains no blocklisted phrase (case-insensitive).

    Returns (cleaned_text_col, kept_lines_col, doc_keep_predicate): the
    caller projects the first two and filters on the third
    (``kept_lines >= min_kept_lines``).
    """
    lines = F.split(F.col(col) if isinstance(col, str) else col, "\n")

    def line_ok(x):
        ok = F.size(F.split(F.trim(x), "\\s+")) >= F.lit(min_words_per_line)
        if require_terminal_punct:
            ok = ok & x.rlike('[.!?"]\\s*$')
        low = F.lower(x)
        for phrase in blocklist:
            ok = ok & ~low.contains(phrase.lower())
        return ok

    kept = F.filter(lines, line_ok)
    cleaned = F.array_join(kept, "\n")
    n_kept = F.size(kept)
    return cleaned, n_kept, n_kept >= F.lit(min_kept_lines)


def apply_c4_line_filter(df, text_col: str = "text", **kwargs):
    """Project `df` through the C4 line filter: text replaced by its cleaned
    form, `kept_lines` added, below-threshold docs dropped."""
    cleaned, n_kept, keep = c4_line_filter(text_col, **kwargs)
    out = df.withColumn("__clean", cleaned).withColumn("kept_lines", n_kept).filter(keep)
    return out.withColumn(text_col, F.col("__clean")).drop("__clean")


#: Gopher's required-word set (Rae et al. 2021, table A1): a doc must contain
#: at least two of these to pass the "stop word" rule.
GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    col="text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_words: int = 2,
) -> dict[str, Column]:
    """Gopher document-quality rules (Rae et al. 2021, appendix A1.1) as pure
    JVM column expressions — split / filter / regexp HOFs only, so the whole
    filter is one codegen'd scan with zero shuffle and zero Python: the right
    shape for a 100 TB corpus sweep. Defaults are the published thresholds;
    every knob is a parameter because real pipelines tune them per source.

    Returns named signal columns plus ``passes_gopher``. All ratio columns
    are rounded to 6 places BEFORE the threshold comparison so the boolean is
    bit-stable across engines and partitionings.

    Rules (doc passes if ALL hold):
      - word count in [min_words, max_words];
      - mean word length in [min_mean_word_len, max_mean_word_len];
      - (# '#' chars + # ellipses) / words <= max_symbol_ratio;
      - fraction of lines starting with a bullet <= max_bullet_line_frac;
      - fraction of lines ending in an ellipsis <= max_ellipsis_line_frac;
      - fraction of words with an alphabetic char >= min_alpha_word_frac;
      - contains >= min_required_words distinct GOPHER_REQUIRED_WORDS.
    """
    c = F.col(col) if isinstance(col, str) else col
    norm = _norm(col)
    toks = F.split(norm, " ")
    n_words = F.when(F.length(norm) == 0, F.lit(0)).otherwise(F.size(toks)).cast("int")
    nz = F.greatest(n_words, F.lit(1))
    # sum(len(tok)) == len(norm) - (n-1) single-space separators: exact, no
    # aggregate-HOF pass needed.
    mean_word_len = F.round(
        (F.length(norm) - F.greatest(n_words - 1, F.lit(0))) / nz, 6
    )
    hashes = F.length(F.regexp_replace(c, r"[^#]", ""))
    ellipses = F.size(F.regexp_extract_all(c, F.lit(r"(\.\.\.|…)"), 0))
    symbol_ratio = F.round((hashes + ellipses) / nz, 6)
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    alpha_word_frac = F.round(alpha_words / nz, 6)
    lines = F.filter(F.split(c, "\n"), lambda x: F.length(F.trim(x)) > 0)
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_line_frac = F.round(
        F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"^[-*•]"))) / n_lines, 6
    )
    ellipsis_line_frac = F.round(
        F.size(F.filter(lines, lambda x: F.trim(x).rlike(r"(\.\.\.|…)$"))) / n_lines, 6
    )
    req = F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS])
    required_hits = F.size(F.filter(req, lambda w: F.array_contains(toks, w))).cast("int")
    passes = (
        (n_words >= F.lit(min_words))
        & (n_words <= F.lit(max_words))
        & (mean_word_len >= F.lit(min_mean_word_len))
        & (mean_word_len <= F.lit(max_mean_word_len))
        & (symbol_ratio <= F.lit(max_symbol_ratio))
        & (bullet_line_frac <= F.lit(max_bullet_line_frac))
        & (ellipsis_line_frac <= F.lit(max_ellipsis_line_frac))
        & (alpha_word_frac >= F.lit(min_alpha_word_frac))
        & (required_hits >= F.lit(min_required_words))
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "bullet_line_frac": bullet_line_frac,
        "ellipsis_line_frac": ellipsis_line_frac,
        "alpha_word_frac": alpha_word_frac,
        "required_hits": required_hits,
        "passes_gopher": passes,
    }


def bm25_topk(
    docs,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """BM25 full-text retrieval: top-``k`` documents for a bag of query
    terms (Robertson/Spärck Jones probabilistic relevance framework — the
    retrieval baseline every RAG / data-curation pipeline needs next to the
    embedding ANN family). Same normalization as every other tx_* operator.

    Scale shape: token explode → ONE hash-agg keyed on doc_id computing dl
    AND a conditional tf per query term (the term list is a bounded
    literal, so each tf is a map-side `count(when(term = t))` column) —
    the only corpus-rate shuffle is that doc-cardinality partial agg,
    which any dl computation needs. Docs matching no term are filtered
    IMMEDIATELY after the agg, so the (doc, term, tf, dl) posting rows
    that feed scoring are matched-cardinality; nothing re-shuffles the
    per-doc length frame (the former `matched JOIN dl` carried one row
    per corpus doc). Corpus stats (N, Σdl) are a 1-row map-side aggregate
    cross-joined in; df is a per-term count over the matched rows,
    broadcast back. The final score is an ORDERED left fold over the
    term-sorted contribution list, so partial-agg order can never wiggle
    the low bits — results hash-match a single-node engine exactly.

    Returns (doc_id, score, n_terms_matched, rank), rank = row_number over
    (score DESC, doc_id).
    """
    from functools import reduce
    from operator import or_

    from pyspark.sql import Window

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.split(norm, " ")).alias("term")
    )
    terms = list(dict.fromkeys(query_terms))
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count(F.when(F.col("term") == F.lit(tm), 1)).alias(f"__tf{i}")
            for i, tm in enumerate(terms)
        ],
    )
    matched = per_doc.filter(
        reduce(or_, [F.col(f"__tf{i}") > 0 for i in range(len(terms))])
    )
    pairs = matched.select(
        "doc_id",
        "dl",
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.lit(tm).alias("term"), F.col(f"__tf{i}").alias("tf")
                        )
                        for i, tm in enumerate(terms)
                    ]
                ),
                lambda s: s["tf"] > 0,
            )
        ).alias("__p"),
    ).select("doc_id", "dl", F.col("__p.term").alias("term"), F.col("__p.tf").alias("tf"))
    dfreq = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = toks.agg(
        F.countDistinct("doc_id").alias("n_docs"), F.count(F.lit(1)).alias("sum_dl")
    )
    joined = (
        pairs.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl") * 1.0 / F.col("n_docs")
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    per_term = joined.select("doc_id", "term", contrib.alias("c"))
    folded = per_term.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("term", "c"))).alias("__cs"),
        F.count(F.lit(1)).cast("int").alias("n_terms_matched"),
    )
    score = F.round(
        F.aggregate(
            F.transform("__cs", lambda s: s["c"]), F.lit(0.0), lambda a, x: a + x
        ),
        6,
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        folded.select("doc_id", score.alias("score"), "n_terms_matched")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def zipf_fit(vocab: DataFrame, cf_col: str = "cf", term_col: str = "term", top_n: int = 500) -> DataFrame:
    """OLS fit of ln(frequency) against ln(rank) over the top-``top_n``
    vocabulary terms — the Zipf-law diagnostic corpus curators use to spot
    degenerate crawls (boilerplate-heavy or deduplicated-to-death corpora
    bend away from the natural slope ≈ −1).

    Scale shape: the vocabulary frame arrives already aggregated (explode
    + hash-agg upstream); this fit touches only a TakeOrdered top-n of it,
    so the ranking window runs on ≤ top_n rows — bounded, never
    vocab-cardinality. Closed-form moments: x/y and their products round
    to 8 dp and sum in exact DECIMAL, so the slope/intercept/r² are
    partial-agg-order-proof; emitted values round to 6 dp in the oracle's
    operand order.
    """
    from pyspark.sql import Window

    top = vocab.orderBy(F.desc(cf_col), F.col(term_col)).limit(top_n)
    w = Window.orderBy(F.desc(cf_col), F.col(term_col))
    xy = top.withColumn("rnk", F.row_number().over(w)).select(
        F.round(F.log(F.col("rnk").cast("double")), 8).alias("x"),
        F.round(F.log(F.col(cf_col).cast("double")), 8).alias("y"),
    )
    d8 = lambda c: F.sum(c.cast("decimal(28,8)")).cast("double")  # noqa: E731
    s = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        d8(F.col("x")).alias("sx"),
        d8(F.col("y")).alias("sy"),
        d8(F.round(F.col("x") * F.col("y"), 8)).alias("sxy"),
        d8(F.round(F.col("x") * F.col("x"), 8)).alias("sxx"),
        d8(F.round(F.col("y") * F.col("y"), 8)).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num / den
    return s.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias("intercept"),
        F.round((num * num) / (den * deny), 6).alias("r2"),
    )


def flesch_reading_ease(col="text") -> Column:
    """Flesch reading-ease proxy, fully column-expression (zero UDF):

    ``206.835 - 1.015*(words/sentences) - 84.6*(syllables/words)``

    with words = whitespace tokens, sentences = runs of ``[.!?]``
    (floored at 1 so fragments still score), syllables ≈ runs of
    ``[aeiouy]`` in the lowercased text — the standard vowel-group
    approximation (exact syllabification needs a dictionary; the
    approximation is monotone-consistent for ranking/filtering, which is
    what a corpus-quality cut needs). NULL when the text has no words.
    Every operation is an exact integer count followed by one fixed
    IEEE expression, so any engine computes the identical double.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = token_count(col)
    sentences = F.greatest(
        F.size(F.regexp_extract_all(c, F.lit(r"([.!?]+)"), 1)), F.lit(1)
    )
    syllables = F.size(F.regexp_extract_all(F.lower(c), F.lit(r"([aeiouy]+)"), 1))
    return F.when(
        words > 0,
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / words.cast("double")),
    )
