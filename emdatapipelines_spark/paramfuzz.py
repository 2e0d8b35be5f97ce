"""Fuzz phase 4 (VERDICT r13 #6): parameter-sweep differential testing for
the LLM-data operator families.

The relational fuzzer (`fuzz.py`) covers the SQL-expressible grammar; the
dd_/tx_/lm_/sim_ families were each pinned by ONE fixed oracle query plus
unit tests — nothing exercised their PARAMETER spaces (shingle n, bands x
rows, chunk length, BM25 k1/b, BPE merge count, lag grids). This module
draws random parameters per family and checks the engine against
brute-force pure-Python baselines computed from the SAME collected sample,
at sf0.001 scale where the quadratic baselines are trivial.

Families (dispatch = seed % 5):

- ``minhash``: shingle n, num_hashes, (bands, rows_per_band) factorization.
  Baseline: exact Jaccard over all sample pairs from Python shingle sets.
  Invariants: (a) exact-duplicate pairs (J=1) are ALWAYS candidates (equal
  shingle sets => equal signatures => every band collides); (b) no
  candidate pair has J=0 (disjoint sets agree on a minhash position only
  via an xxhash64 collision, ~2^-64); (c) pairs whose S-curve collision
  probability 1-(1-J^r)^b >= 1-1e-6 must ALL be candidates; (d) for
  num_hashes >= 32, signature-agreement estimates of J>=0.8 pairs sit
  within 0.35 of exact (binomial tail < 1e-4 per pair; the whole campaign
  is seed-deterministic, so a green run stays green).
- ``chunk``: chunk_tokens in [5, 40]. Baseline: a pure-Python mirror of
  `substring_dedup_chunks` (global first-occurrence in (doc_id, chunk_idx)
  order). Exact frame equality on (n_chunks, n_dup_chunks, dedup_text).
- ``bm25``: k1 in [0.5, 2.5], b in [0, 1], k in [5, 20], 2-4 query terms
  drawn from the sample vocabulary. Baseline: direct-formula recompute
  (same term-sorted contribution fold). Scores compared at 1e-6; the
  top-k doc sets may differ only by ties within 1e-6 of the k-th score.
- ``bpe``: merge count k in [3, 8] over a bounded word sample. Baseline: a
  pure-Python mirror of the training loop (same greedy left-to-right fold,
  same (count desc, pair asc) tie-break) — the learned MERGE TABLES must
  be identical; plus the roundtrip identity: dropping separators from any
  merged state reproduces word + end-marker exactly.
- ``ts``: ACF over drawn lag grids (max_lag in [3, 12]) and trailing-mean
  windows (w in [2, 8]) on the per-type daily count series. Baseline:
  pure-Python moments from the same collected series; 1e-9 tolerance on
  the final float division only (the engine accumulates integer moments).

Every draw is fully deterministic in its seed (sample selection, parameter
values, engine hashing), so campaigns are reproducible and a green ledger
row cannot rot. Runner: ``scripts/param_fuzz.py N START [sf_dir]``.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

BPE_SEP = "\x1f"
BPE_END = "</w>"


# ---------------------------------------------------------------------------
# pure-Python mirrors of the engine's normalization (dedup._norm_text /
# text._norm: lower, trim, collapse \s+ — ASCII flag matches Java's \s)
# ---------------------------------------------------------------------------
def py_norm(text: str) -> str:
    return re.sub(r"\s+", " ", (text or "").strip().lower(), flags=re.ASCII)


def py_tokens(text: str) -> list[str]:
    return py_norm(text).split(" ")


def py_shingles(text: str, n: int) -> set[str]:
    """Mirror of dedup._shingles: distinct word n-grams; docs shorter than
    n tokens yield their full token run as the single (partial) shingle."""
    toks = py_tokens(text)
    if n == 1 or len(toks) < n:
        return {" ".join(toks[: max(len(toks), 1)])} if len(toks) < n else set(toks)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _sample_docs(spark, sf_dir: str, rng, modulus: int = 7):
    """Deterministic doc sample: one residue class of doc_id — collected
    ONCE and fed back as a createDataFrame so both engines see identical
    bytes (no double fixture scan per draw)."""
    from .queries.registry import t

    res = rng.randrange(modulus)
    rows = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % modulus == res)
        .select("doc_id", "text")
        .collect()
    )
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    return sdf, [(r["doc_id"], r["text"]) for r in rows]


# ---------------------------------------------------------------------------
# family: minhash
# ---------------------------------------------------------------------------
def fam_minhash(spark, sf_dir: str, rng) -> list[str]:
    from .llmdata.dedup import minhash_lsh_candidates, minhash_signatures

    n = rng.choice([2, 3, 4, 5])
    num_hashes = rng.choice([16, 32, 48, 64])
    rows_per_band = rng.choice([r for r in (1, 2, 4, 8) if num_hashes % r == 0])
    bands = num_hashes // rows_per_band

    # full corpus, not a residue sample: the fixture's ~28 high-J planted
    # pairs connect ARBITRARY doc_ids, so any 1-in-7 sample keeps a pair
    # with prob ~1/49 and the recall invariants would be vacuous
    from .queries.registry import t

    raw = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    rows = [(r["doc_id"], r["text"]) for r in raw]
    sdf = spark.createDataFrame(raw, "doc_id long, text string")
    sigs = minhash_signatures(
        sdf, id_col="doc_id", text_col="text", n=n, num_hashes=num_hashes
    ).collect()
    sig_by_id = {r["id"]: list(r["signature"]) for r in sigs}
    sigs_df = spark.createDataFrame(
        [(i, s) for i, s in sig_by_id.items()], "id long, signature array<long>"
    )
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(sigs_df, bands, rows_per_band).collect()
    }

    sets = {i: py_shingles(txt, n) for i, txt in rows}
    ids = sorted(sets)
    errs: list[str] = []
    tag = f"minhash n={n} h={num_hashes} b={bands} r={rows_per_band}"

    # threshold where the S-curve guarantees collision at prob >= 1-1e-6
    def collide_p(j: float) -> float:
        return 1.0 - (1.0 - j**rows_per_band) ** bands

    j_star = next(
        (j / 1000.0 for j in range(1, 1001) if collide_p(j / 1000.0) >= 1 - 1e-6),
        1.0,
    )

    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            sa, sb = sets[a], sets[b]
            inter = len(sa & sb)
            j = inter / len(sa | sb) if (sa or sb) else 1.0
            pair = (a, b)
            if j == 1.0 and pair not in cands:
                errs.append(f"{tag}: exact-dup pair {pair} missed by LSH")
            if j == 0.0 and pair in cands:
                errs.append(f"{tag}: J=0 pair {pair} emitted as candidate")
            if j >= j_star and pair not in cands:
                errs.append(f"{tag}: J={j:.3f}>=J*={j_star:.3f} pair {pair} missed")
            if num_hashes >= 32 and j >= 0.8:
                est = sum(
                    1 for x, y in zip(sig_by_id[a], sig_by_id[b]) if x == y
                ) / float(num_hashes)
                if abs(est - j) > 0.35:
                    errs.append(f"{tag}: est {est:.3f} vs exact {j:.3f} on {pair}")
    return errs


# ---------------------------------------------------------------------------
# family: chunk (substring dedup)
# ---------------------------------------------------------------------------
def fam_chunk(spark, sf_dir: str, rng) -> list[str]:
    from .llmdata.dedup import substring_dedup_chunks

    C = rng.randint(5, 40)
    sdf, rows = _sample_docs(spark, sf_dir, rng)
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dedup_text"])
        for r in substring_dedup_chunks(sdf, chunk_tokens=C).collect()
    }

    # mirror: chunk every doc, then global first-occurrence per chunk text
    # in (doc_id, chunk_idx) order
    chunks: list[tuple[int, int, str]] = []
    for i, txt in rows:
        toks = py_tokens(txt)
        n_chunks = max(1, math.ceil(len(toks) / C))
        for k in range(n_chunks):
            chunks.append((i, k, " ".join(toks[k * C : (k + 1) * C])))
    seen: set[str] = set()
    want: dict[int, list] = {i: [0, 0, []] for i, _ in rows}
    for i, k, c in sorted(chunks):
        want[i][0] += 1
        if c in seen:
            want[i][1] += 1
        else:
            seen.add(c)
            want[i][2].append(c)
    errs = []
    tag = f"chunk C={C}"
    for i, (nc, nd, kept) in want.items():
        w = (nc, nd, " ".join(kept))
        if got.get(i) != w:
            errs.append(f"{tag}: doc {i} engine={got.get(i)!r} mirror={w!r}")
    return errs


# ---------------------------------------------------------------------------
# family: bm25
# ---------------------------------------------------------------------------
def fam_bm25(spark, sf_dir: str, rng) -> list[str]:
    from .llmdata.text import bm25_topk

    k1 = round(rng.uniform(0.5, 2.5), 3)
    b = round(rng.uniform(0.0, 1.0), 3)
    k = rng.randint(5, 20)
    sdf, rows = _sample_docs(spark, sf_dir, rng)

    tok_by_id = {i: py_tokens(txt) for i, txt in rows}
    vocab = Counter(tm for toks in tok_by_id.values() for tm in toks)
    common = [w for w, _ in vocab.most_common(100) if w]
    terms = sorted(set(rng.sample(common, rng.randint(2, 4))))

    got = {
        r["doc_id"]: (r["score"], r["n_terms_matched"], r["rank"])
        for r in bm25_topk(sdf, terms, k=k, k1=k1, b=b).collect()
    }

    # direct-formula mirror, same term-sorted contribution fold
    N = len(tok_by_id)
    sum_dl = sum(len(t) for t in tok_by_id.values())
    avgdl = sum_dl * 1.0 / N
    tf = {
        i: {tm: toks.count(tm) for tm in terms if toks.count(tm) > 0}
        for i, toks in tok_by_id.items()
    }
    matched = {i: d for i, d in tf.items() if d}
    df_t = {tm: sum(1 for d in matched.values() if tm in d) for tm in terms}
    scores = {}
    for i, d in matched.items():
        dl = len(tok_by_id[i])
        s = 0.0
        for tm in sorted(d):  # engine folds in term-sorted order
            idf = math.log(1.0 + (N - df_t[tm] + 0.5) / (df_t[tm] + 0.5))
            denom = d[tm] + k1 * (1.0 - b + b * dl / avgdl)
            s += idf * d[tm] * (k1 + 1.0) / denom
        scores[i] = (round(s, 6), len(d))
    order = sorted(scores, key=lambda i: (-scores[i][0], i))
    want = {i: (scores[i][0], scores[i][1], r + 1) for r, i in enumerate(order[:k])}

    errs = []
    tag = f"bm25 k1={k1} b={b} k={k} terms={terms}"
    kth = min((s for s, _n, _r in want.values()), default=0.0)
    for i in set(got) | set(want):
        if i in got and i in want:
            gs, gn, gr = got[i]
            ws, wn, wr = want[i]
            if abs(gs - ws) > 1e-6 or gn != wn:
                errs.append(f"{tag}: doc {i} engine={got[i]} mirror={want[i]}")
            elif gr != wr and abs(gs - kth) > 1e-6:
                errs.append(f"{tag}: doc {i} rank {gr} vs {wr} off a tie boundary")
        else:
            side = "engine" if i in got else "mirror"
            only = got.get(i) or want.get(i)
            if abs(only[0] - kth) > 1e-6:  # not a boundary tie -> real miss
                errs.append(f"{tag}: doc {i} only in {side} ({only})")
    return errs


# ---------------------------------------------------------------------------
# family: bpe
# ---------------------------------------------------------------------------
def _py_fold_merge(syms: list[str], a: str, b: str) -> list[str]:
    if len(syms) <= 1:
        return syms
    out = [syms[0]]
    for x in syms[1:]:
        if out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def fam_bpe(spark, sf_dir: str, rng) -> list[str]:
    from .llmdata.bpe import learn_bpe

    k = rng.randint(3, 8)
    sdf, rows = _sample_docs(spark, sf_dir, rng, modulus=29)  # ~35 docs
    merges_df, vocab_df = learn_bpe(sdf, k=k)
    got = [
        (r["step"], r["sym_a"], r["sym_b"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("step").collect()
    ]

    # pure-Python training mirror: same word counts, same greedy fold,
    # same (count desc, pair asc) tie-break
    wc: Counter = Counter()
    for _i, txt in rows:
        for tok in py_tokens(txt):
            w = re.sub(r"[^a-z0-9]", "", tok)
            if w:
                wc[w] += 1
    vocab = {w: list(w) + [BPE_END] for w in wc}
    want = []
    for step in range(1, k + 1):
        pc: Counter = Counter()
        for w, cnt in wc.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += cnt
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        want.append((step, a, b, a + b, c))
        vocab = {w: _py_fold_merge(s, a, b) for w, s in vocab.items()}

    errs = []
    tag = f"bpe k={k}"
    if got != want:
        errs.append(f"{tag}: merge tables diverge engine={got} mirror={want}")
    # roundtrip identity on the engine's final vocab states: removing the
    # separators must reproduce word + end marker exactly (merging may
    # never create or destroy characters)
    for r in vocab_df.collect():
        if r["state"].replace(BPE_SEP, "") != r["word"] + BPE_END:
            errs.append(f"{tag}: roundtrip broke for word {r['word']!r}")
    return errs


# ---------------------------------------------------------------------------
# family: ts (ACF lag grid + trailing-mean window)
# ---------------------------------------------------------------------------
def fam_ts(spark, sf_dir: str, rng) -> list[str]:
    from .queries.registry import t

    max_lag = rng.randint(3, 12)
    w = rng.randint(2, 8)
    ev = (
        t(spark, sf_dir, "events")
        .select("event_type", F.col("ts").cast("date").alias("d"))
        .collect()
    )
    daily: Counter = Counter((r["event_type"], r["d"]) for r in ev)
    daily_df = spark.createDataFrame(
        [(et, d, c) for (et, d), c in daily.items()],
        "event_type string, d date, cnt long",
    )

    # engine ACF at lags 1..max_lag (the ts_acf pipeline, lag parameterized)
    a = daily_df.withColumn(
        "k", F.explode(F.sequence(F.lit(1), F.lit(max_lag)))
    ).alias("a")
    b = daily_df.alias("b")
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.d") == F.expr("date_add(a.d, k)")),
    ).select(
        F.col("a.event_type").alias("et"), "k",
        F.col("a.cnt").alias("x"), F.col("b.cnt").alias("y"),
    )
    m = pairs.groupBy("et", "k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    got_acf = {
        (r["et"], r["k"]): (r["n"], r["acf"])
        for r in m.select(
            "et", "k", "n",
            F.when(
                (vx > 0) & (vy > 0),
                num.cast("double")
                / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
            ).alias("acf"),
        ).collect()
    }

    # python mirror: exact integer moments, float only at the end
    by_type: dict[str, dict] = {}
    for (et, d), c in daily.items():
        by_type.setdefault(et, {})[d] = c
    errs = []
    tag = f"ts max_lag={max_lag} w={w}"
    import datetime as _dt

    for et, series in by_type.items():
        for k in range(1, max_lag + 1):
            xs = [
                (c, series[d + _dt.timedelta(days=k)])
                for d, c in series.items()
                if d + _dt.timedelta(days=k) in series
            ]
            if not xs:
                if (et, k) in got_acf:
                    errs.append(f"{tag}: engine emitted empty lag ({et},{k})")
                continue
            n = len(xs)
            sx = sum(x for x, _ in xs); sy = sum(y for _, y in xs)
            sxx = sum(x * x for x, _ in xs); syy = sum(y * y for _, y in xs)
            sxy = sum(x * y for x, y in xs)
            vxp, vyp = n * sxx - sx * sx, n * syy - sy * sy
            acf = (
                (n * sxy - sx * sy) / (math.sqrt(vxp) * math.sqrt(vyp))
                if vxp > 0 and vyp > 0
                else None
            )
            g = got_acf.get((et, k))
            if g is None or g[0] != n:
                errs.append(f"{tag}: ({et},{k}) n engine={g} mirror={n}")
            elif (g[1] is None) != (acf is None) or (
                acf is not None and abs(g[1] - acf) > 1e-9
            ):
                errs.append(f"{tag}: ({et},{k}) acf engine={g[1]} mirror={acf}")

    # trailing mean rowsBetween(-w, -1) over the per-type daily series
    from pyspark.sql import Window

    win = (
        Window.partitionBy("event_type").orderBy("d").rowsBetween(-w, -1)
    )
    got_tm = {
        (r["event_type"], r["d"]): r["tm"]
        for r in daily_df.withColumn("tm", F.avg("cnt").over(win)).collect()
    }
    for et, series in by_type.items():
        ds = sorted(series)
        for idx, d in enumerate(ds):
            lo = max(0, idx - w)
            frame = [series[x] for x in ds[lo:idx]]
            want_tm = (sum(frame) / len(frame)) if frame else None
            g = got_tm.get((et, d), "missing")
            if (g is None) != (want_tm is None) or (
                want_tm is not None
                and (g == "missing" or abs(g - want_tm) > 1e-9)
            ):
                errs.append(f"{tag}: tm ({et},{d}) engine={g} mirror={want_tm}")
    return errs


FAMILIES = [
    ("minhash", fam_minhash),
    ("chunk", fam_chunk),
    ("bm25", fam_bm25),
    ("bpe", fam_bpe),
    ("ts", fam_ts),
]


def run_case(spark, sf_dir: str, seed: int) -> tuple[str, list[str]]:
    """One parameter draw: dispatch by seed, return (family, errors)."""
    import random

    name, fn = FAMILIES[seed % len(FAMILIES)]
    rng = random.Random(seed)
    return name, fn(spark, sf_dir, rng)
