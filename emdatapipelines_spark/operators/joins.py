"""Join operators (SURVEY §2.3 J1–J8).

Scale notes: dimension joins broadcast (no shuffle); fact-fact joins rely on
AQE for skew splitting; the interval join keeps its equi key so Spark plans a
hash/sort-merge join with the range condition as a residual predicate — never
a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast


def dim_enrich_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "left", hint_broadcast: bool = True
) -> DataFrame:
    """J1 — left equi-join against a bounded dimension, broadcast by default.

    ≈ events ⟕ state_codes (`models/marts/emergency_events.sql:83-133`). The
    reference's dims are ≤52 rows; at 100 TB the fact side never shuffles for
    this join.
    """
    d = broadcast(dim) if hint_broadcast else dim
    return fact.join(d, on, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    equi: list[tuple[str, str]],
    ts_col: str,
    start_col: str,
    end_col: str | None = None,
    how: str = "left",
) -> DataFrame:
    """J3 — interval/range join with an equi carrier key.

    ≈ daily weather ⟕ alerts ON ``observation_date BETWEEN a.effective_date
    AND COALESCE(a.expires_date, a.effective_date)`` AND state equi key
    (`models/marts/weather_impacts.sql:159-165`). The equi columns drive the
    hash join; the BETWEEN is a residual filter evaluated post-match, so the
    plan stays shuffle-hash/sort-merge (check with .explain — no
    BroadcastNestedLoopJoin). Null-extension for unmatched left rows is
    preserved exactly (`weather_impacts.sql:149`).
    """
    cond = None
    for l, r in equi:
        c = left[l] == right[r]
        cond = c if cond is None else (cond & c)
    lo = right[start_col]
    hi = F.coalesce(right[end_col], right[start_col]) if end_col else right[start_col]
    cond = cond & (left[ts_col] >= lo) & (left[ts_col] <= hi)
    return left.join(right, cond, how)


def anti_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """J5 — orphan detection: rows of ``df`` with no match in ``other``.

    ≈ the referential-integrity test ``LEFT JOIN state_codes s ... WHERE
    s.state_code IS NULL`` (`tests/data_quality_tests.yml:11-15`) expressed
    as a proper left_anti join (no null-filter trick needed).
    """
    return df.join(other, on, "left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-busting equi join: explode the hot key space with a salt.

    The reference hash-distributes on ``state_code`` — 51 values with CA/TX
    dominating (`resources/database.py:160`), the classic skew shape at
    100 TB. AQE's skew-join split handles most cases (SURVEY §7.4.5); this
    operator is the explicit fallback for joins AQE can't rebalance (e.g.
    both sides huge on one key): the left side gets a random salt in
    [0, salt_buckets), the right side is replicated ``salt_buckets`` times,
    and the join key becomes (key, salt) — one hot partition becomes
    ``salt_buckets`` even ones at the cost of replicating the right side.

    Use when right is the smaller-but-not-broadcastable side.
    """
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_left.join(salted_right, [key, "__salt"], how)
    return out.drop("__salt")


def map_lookup(col, mapping: dict, default=None) -> Column:
    """J8 — literal-dictionary "join" as a map expression.

    ≈ pandas dict-map joins: state→region, incident→severity, month→season
    (`assets/processed_data.py:61-89`, `assets/ml_assets.py:394-397`).
    Constant-folded; zero shuffle, zero UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    pairs = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    looked = F.create_map(pairs)[c]
    return F.coalesce(looked, F.lit(default)) if default is not None else looked


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the columns of the
    latest right row with ``right_ts <= left_ts`` within the same ``on`` key
    (inclusive; left rows with no prior right row get nulls).

    Implemented as union + single window pass — ONE shuffle on the key, no
    range-condition join and no per-key explosion, so cost is
    O(n log n_per_key) regardless of how many right rows precede each left
    row. The naive range join is quadratic per key; this form is the one
    that survives 100 TB. The right side must be unique per
    ``(on..., right_ts)`` — pre-aggregate it if it isn't, or the match is
    nondeterministic.

    Capability twin of the reference's pandas ``merge_asof``-style
    nearest-date feature attachment (pipelines/dagster/emergency_pipeline/
    assets/ml_assets.py:93-116 joins daily summaries by exact date; asof
    generalizes it to irregular timestamps).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    out_names = [f"{c}{suffix}" if c in left.columns else c for c in right_cols]
    payload = F.struct(
        F.col(right_ts).cast("timestamp").alias("__asof_ts"),
        *[F.col(c).alias(n) for c, n in zip(right_cols, out_names)],
    )
    r = right.select(
        *on,
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
    ).select(*on, "__t", "__side", "__payload", *[c for c in left.columns if c not in on])
    l = left.select(
        *on,
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[c for c in left.columns if c not in on],
    )
    from pyspark.sql import Window

    # right rows sort before left rows at equal timestamps -> inclusive match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return matched.select(
        *on,
        *[c for c in left.columns if c not in on],
        F.col("__match.__asof_ts").alias(f"{right_ts}{suffix}" if right_ts in left.columns else right_ts),
        *[F.col(f"__match.{n}").alias(n) for n in out_names],
    )


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int = 2,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Entity-resolution fuzzy self-match: distinct values of ``name_col``
    paired when their Levenshtein distance is ≤ ``max_dist``.

    Never all-pairs: candidates come from a character-BIGRAM equi-join
    (strings sharing no bigram can't be within small edit distance of each
    other — one edit destroys at most 2 of a string's len-1 bigrams, so any
    pair with min length > 2·max_dist + 1 still shares one). The quadratic
    work collapses to per-bigram blocks, the same shape as the shingle join
    in `llmdata/dedup.py`; ``max_gram_df`` caps pathological hot bigrams at
    web scale (dropping grams shared by more than that many names — recall
    then relies on the pair's rarer grams, the standard q-gram trade).

    The reference joins station/county names across sources by exact
    normalized string (`models/staging/*.sql`); this is the resilient twin
    for dirty name columns. Levenshtein runs JVM-side on candidate pairs
    only.
    """
    names = df.select(F.col(name_col).alias("name")).distinct()
    grams = names.select(
        "name",
        F.explode(
            F.array_distinct(
                F.expr("transform(sequence(1, length(name) - 1), i -> substring(name, i, 2))")
            )
        ).alias("g"),
    )
    if max_gram_df is not None:
        keep = grams.groupBy("g").count().filter(F.col("count") <= max_gram_df)
        grams = grams.join(keep.select("g"), "g")
    a, b = grams.alias("a"), grams.alias("b")
    cand = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.name") < F.col("b.name")))
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("name_a", "name_b").cast("int")
    ).filter(F.col("dist") <= max_dist)


def touch_attribution(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_seconds: int = 3600,
) -> DataFrame:
    """First-touch / last-touch marketing attribution: for every
    conversion event, find the earliest and latest touch event by the
    same user in the preceding ``lookback_seconds`` — WITHOUT a range
    join (whose matched-pair count is quadratic per hot user). One
    shuffle on the user key, then a single sorted range-frame window
    pass: every row evaluates ``rangeBetween(-lookback, -1)`` over
    integer epoch-seconds, touches contribute a SORTABLE padded string
    ``sec|event_id|type`` (min = first touch, max = last touch — the
    unique event id makes same-second ties deterministic), and
    conversion rows read the extremes at their own position. Output is
    conversion-grain; conversions with no touch in the window keep NULL
    attribution (unattributed, not dropped).

    The padded-string encoding (not a struct min) is deliberate: both
    engines order strings identically, while struct MIN/MAX comparability
    differs across engines.
    """
    sec = F.unix_timestamp(F.col(ts_col))
    is_touch = F.col(type_col).isin(*touch_types)
    code = F.concat_ws(
        "|",
        F.lpad(sec.cast("string"), 10, "0"),
        F.lpad(F.col(id_col).cast("string"), 12, "0"),
        F.col(type_col),
    )
    base = events.filter(
        F.col(type_col).isin(conversion_type, *touch_types)
    ).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("etype"),
        F.col(ts_col).alias("ets"),
        sec.alias("s"),
        F.when(is_touch, code).alias("tcode"),
    )
    w = (
        Window.partitionBy("u")
        .orderBy("s")
        .rangeBetween(-lookback_seconds, -1)
    )
    attributed = base.select(
        "u",
        "eid",
        "etype",
        "ets",
        F.min("tcode").over(w).alias("first_code"),
        F.max("tcode").over(w).alias("last_code"),
        F.count("tcode").over(w).cast("bigint").alias("n_touches"),
    ).filter(F.col("etype") == conversion_type)
    part = lambda c, i: F.split(F.col(c), r"\|").getItem(i)  # noqa: E731
    return attributed.select(
        F.col("eid").alias("purchase_id"),
        F.col("u").alias("user_id"),
        F.col("ets").alias("purchase_ts"),
        "n_touches",
        part("first_code", 1).cast("bigint").alias("first_touch_id"),
        part("first_code", 2).alias("first_touch_type"),
        part("last_code", 1).cast("bigint").alias("last_touch_id"),
        part("last_code", 2).alias("last_touch_type"),
    ).orderBy("purchase_id")
