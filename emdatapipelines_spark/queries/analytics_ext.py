"""Warehouse-analytics extensions: gaps-and-islands streaks, NTILE decile
profiling, weekly retention cohorts, PSI drift, partial-aggregate re-merge,
salted skew-safe aggregation, and the versioned-sink commit log.

The reference's dashboards consume per-entity activity rollups
(``ops/public_ops.py`` builds usage/latency summaries for Grafana panels);
these queries are the standard analytic shapes a serving layer over the same
tables needs. Each is expressed as pure DataFrame/window ops — one or two
key-partitioned shuffles, no UDFs — so the plans survive a 100x scale-up:

- ``w8_streak_islands``: per-user consecutive-day streaks via the classic
  day-index-minus-row-number island key. Cost = two window passes over the
  same ``user_id`` partitioning (Catalyst reuses one Exchange) + a final
  per-user agg; no joins.
- ``a16_ntile_deciles``: NTILE(10) per market segment with a total tiebreak
  order (acctbal, custkey) so tile assignment is deterministic, then a
  per-(segment, decile) rollup — a single hash partition on segment.
- ``a20_retention_cohorts``: cohort = week of first activity; one
  user-partitioned window pass assigns every active week its cohort, then a
  (cohort, offset) count-distinct. Window-over-join avoids a second
  fact-to-dim shuffle of the user spine.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..operators.reaggregate import merge_partials, partial_aggregate, salted_aggregate
from ..quality.drift import bin_counts, psi_by_bin
from .registry import dsum, query, t


@query(
    "w8_streak_islands",
    """
    WITH days AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
      FROM events
    ), islands AS (
      SELECT user_id, day_idx,
             day_idx - ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day_idx) AS island
      FROM days
    ), streaks AS (
      SELECT user_id, island, COUNT(*) AS streak_len
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
           CAST(SUM(streak_len) AS BIGINT) AS n_active_days
    FROM streaks GROUP BY user_id
    ORDER BY longest_streak DESC, user_id LIMIT 100
    """,
)
def w8_streak_islands(spark, sf_dir):
    """Longest consecutive-active-day streak per user (gaps and islands).

    Reference behavior: the activity-monitor sensors
    (`sensors/public_sensors.py`) track per-source continuity of arrivals;
    this is the per-entity generalization. Day index is an integer offset
    from a fixed epoch so the island key (`day_idx - row_number`) stays in
    pure int arithmetic on both engines.
    """
    days = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
                "day_idx"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_idx")
    islands = days.withColumn("island", F.col("day_idx") - F.row_number().over(w))
    streaks = islands.groupBy("user_id", "island").agg(F.count("*").alias("streak_len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("streak_len").alias("longest_streak"),
            F.sum("streak_len").alias("n_active_days"),
        )
        .orderBy(F.desc("longest_streak"), "user_id")
        .limit(100)
    )


@query(
    "a16_ntile_deciles",
    """
    WITH tiled AS (
      SELECT c_mktsegment, c_acctbal,
             NTILE(10) OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer
    )
    SELECT c_mktsegment, decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(c_acctbal) AS lo,
           MAX(c_acctbal) AS hi,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DECIMAL(28,2))
                AS DOUBLE) AS bal_sum
    FROM tiled GROUP BY c_mktsegment, decile
    ORDER BY c_mktsegment, decile
    """,
)
def a16_ntile_deciles(spark, sf_dir):
    """Account-balance decile profile per market segment.

    NTILE is only deterministic under a total order, so the tile window
    carries the ``c_custkey`` tiebreak — without it two engines may split
    equal balances across adjacent tiles differently. One shuffle on
    segment serves both the window and the rollup.
    """
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    tiled = (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_acctbal", "c_custkey")
        .withColumn("decile", F.ntile(10).over(w))
    )
    return (
        tiled.groupBy("c_mktsegment", "decile")
        .agg(
            F.count("*").alias("n"),
            F.min("c_acctbal").alias("lo"),
            F.max("c_acctbal").alias("hi"),
            dsum("c_acctbal").alias("bal_sum"),
        )
        .orderBy("c_mktsegment", "decile")
    )


@query(
    "a20_retention_cohorts",
    """
    WITH weeks AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk
      FROM events
    ), cohorted AS (
      SELECT user_id, wk,
             MIN(wk) OVER (PARTITION BY user_id) AS cohort_week
      FROM weeks
    )
    SELECT cohort_week,
           CAST(datediff('day', cohort_week, wk) / 7 AS INT) AS week_no,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
    FROM cohorted
    GROUP BY cohort_week, week_no
    ORDER BY cohort_week, week_no
    """,
)
def a20_retention_cohorts(spark, sf_dir):
    """Weekly retention triangle: users grouped by first-active week, counted
    in each subsequent week they return.

    Scale shape: the cohort week comes from a ``MIN OVER (PARTITION BY
    user_id)`` window on the deduped user-week frame instead of a
    groupBy-then-join back. The explicit ``repartition(user_id)`` makes ONE
    exchange of the fact table serve both the (user_id, wk) dedup and the
    user_id window — ``HashPartitioning(user_id)`` satisfies the dedup's
    clustered-distribution requirement on a key superset, so Catalyst
    inserts no second fact-sized shuffle. Both weeks are Monday-truncated
    dates, so the offset division by 7 is exact integer math.
    """
    weeks = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts").cast("date")).cast("date").alias("wk"),
        )
        .repartition(F.col("user_id"))
        .dropDuplicates(["user_id", "wk"])
    )
    cohorted = weeks.withColumn(
        "cohort_week", F.min("wk").over(Window.partitionBy("user_id"))
    )
    return (
        cohorted.groupBy(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("int").alias("week_no"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_no")
    )


@query(
    "q11_drift_psi",
    """
    WITH ref AS (
      SELECT CAST(floor(value / 50) AS INT) AS bin, COUNT(*) AS n
      FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1
    ), cur AS (
      SELECT CAST(floor(value / 50) AS INT) AS bin, COUNT(*) AS n
      FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1
    )
    SELECT r.bin,
           CAST(r.n AS DOUBLE) / (SELECT SUM(n) FROM ref) AS p_ref,
           CAST(c.n AS DOUBLE) / (SELECT SUM(n) FROM cur) AS p_cur,
           (CAST(c.n AS DOUBLE) / (SELECT SUM(n) FROM cur)
            - CAST(r.n AS DOUBLE) / (SELECT SUM(n) FROM ref))
           * ln((CAST(c.n AS DOUBLE) / (SELECT SUM(n) FROM cur))
                / (CAST(r.n AS DOUBLE) / (SELECT SUM(n) FROM ref))) AS psi_term
    FROM ref r JOIN cur c USING (bin)
    ORDER BY bin
    """,
)
def q11_drift_psi(spark, sf_dir):
    """Q-family drift: PSI of the event-value distribution, first half of
    January (reference window) vs the rest (current window).

    The anomaly sensors in the reference compare point statistics batch-over
    -baseline (`sensors/error_sensors.py` latency z-checks); PSI is the
    distributional twin. Each window collapses to ~10 bin rows before the
    (broadcast-trivial) join, so cost is two column-pruned scans.
    """
    ev = t(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    bins = lambda df: bin_counts(  # noqa: E731
        df, F.floor(F.col("value") / 50).cast("int")
    )
    out = psi_by_bin(bins(ev.filter(F.col("ts") < cut)), bins(ev.filter(F.col("ts") >= cut)))
    return out.orderBy("bin")


@query(
    "a19_reaggregate_monthly",
    """
    SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE) AS ship_month,
           l_returnflag,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS price_sum,
           MIN(l_extendedprice) AS price_min,
           MAX(l_extendedprice) AS price_max,
           COUNT(l_extendedprice) AS price_n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
             / COUNT(l_extendedprice) AS price_avg
    FROM lineitem
    GROUP BY ship_month, l_returnflag
    ORDER BY ship_month, l_returnflag
    """,
)
def a19_reaggregate_monthly(spark, sf_dir):
    """Incremental-rollup identity: daily mergeable partials re-aggregated to
    month must equal a direct monthly aggregation of the raw rows.

    This is the maintenance path the reference lacks (its dbt marts rebuild
    from raw rows every run): at 100 TB the monthly rollup reads ~30 partial
    rows per (day, flag) group instead of re-scanning the fact table. The
    oracle IS the direct aggregation, so the driver verifies the merge
    algebra exactly (decimal-sum partials make it order-independent).
    """
    li = t(spark, sf_dir, "lineitem").withColumn(
        "ship_day", F.col("l_shipdate").cast("date")
    )
    daily = partial_aggregate(
        li, ["ship_day", "l_returnflag"], {"price": "l_extendedprice"}, scale=2
    )
    monthly = merge_partials(
        daily.withColumn("ship_month", F.date_trunc("month", "ship_day").cast("date")),
        ["ship_month", "l_returnflag"],
        ["price"],
    )
    return monthly.orderBy("ship_month", "l_returnflag")


@query(
    "a17_salted_skew_agg",
    """
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS value_sum,
           MIN(value) AS value_min,
           MAX(value) AS value_max,
           COUNT(value) AS value_n,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / COUNT(value) AS value_avg
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def a17_salted_skew_agg(spark, sf_dir):
    """Skew-safe rollup over a 5-value hot key (event_type): stage one
    aggregates on (key, salt16) so no reducer owns a whole key's volume;
    stage two merges the 5x16 partials. The oracle is the plain GROUP BY —
    the driver proves the salted plan is value-identical to the direct one.
    """
    ev = t(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        ["event_type"],
        {"value": "value"},
        salt_col=F.col("event_id").cast("int"),
        salt_buckets=16,
    )
    return out.orderBy("event_type")


@query(
    "s17_versioned_history",
    """
    SELECT 0 AS version, 'overwrite' AS mode,
           CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 1, 'append',
           CAST((SELECT COUNT(*) FROM nation)
                + (SELECT COUNT(*) FROM nation WHERE n_nationkey < 5) AS BIGINT)
    ORDER BY version
    """,
)
def s17_versioned_history(spark, sf_dir):
    """Commit log of the versioned snapshot sink (S10/S14 lakehouse twin of
    the reference's StarRocks primary-key tables, `resources/database.py:111-117`):
    overwrite nation as v0, append a 5-row delta as v1, and return the
    history the readers would see. The oracle recomputes both snapshot row
    counts from the raw table, verifying append-by-reference accounting.
    """
    import shutil
    import tempfile

    from ..versioned import history, write_versioned

    n = t(spark, sf_dir, "nation")
    d = tempfile.mkdtemp(prefix="emdp_versioned_")
    try:
        write_versioned(n, d)
        write_versioned(n.filter(F.col("n_nationkey") < 5), d, mode="append")
        rows = [(h["version"], h["mode"], h["rows"]) for h in history(d)]
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(
        rows, "version INT, mode STRING, n_rows BIGINT"
    ).orderBy("version")


@query(
    "w9_funnel_stages",
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT 'click' AS stage, CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS users
    UNION ALL
    SELECT 'click>view', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 'click>view>purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    ORDER BY stage
    """,
)
def w9_funnel_stages(spark, sf_dir):
    """Three-step ordered funnel (click → view → purchase, earliest
    -completion path). The oracle uses the equivalent join-chain min-ts
    formulation; the engine uses the single-Exchange conditional-min window
    chain (`operators/sessions.py: funnel_stages`) — same semantics, one
    shuffle instead of three.
    """
    from ..operators.sessions import funnel_stages

    ev = t(spark, sf_dir, "events")
    out = funnel_stages(ev, "user_id", "ts", "event_type", ["click", "view", "purchase"])
    return out.orderBy("stage")


@query("a21_hll_distinct_rollup")
def a21_hll_distinct_rollup(spark, sf_dir):
    """Approximate-distinct serving from stored sketch partials: daily HLL
    sketches of user_id, merged to a monthly distinct-user estimate
    (`operators/reaggregate.py: hll_partial/hll_merge`). Rows-only driver
    check by design — DataSketches estimates are engine-specific, so there
    is no DuckDB twin; merge determinism and the error bound are
    asserted in tests/test_reaggregate.py. Each row additionally carries
    the exact monthly distinct and the measured estimator error in ppm so
    the driver's rows-only check records the quality bar in-row (VERDICT
    r7 #5 — same protocol as the ANN queries' recall_at_k).
    """
    from ..operators.reaggregate import hll_merge, hll_partial

    ev = t(spark, sf_dir, "events").select(
        F.date_trunc("month", F.col("ts")).cast("date").alias("month"),
        F.col("ts").cast("date").alias("day"),
        "user_id",
    )
    daily = hll_partial(ev, ["month", "day"], "user_id")
    exact = ev.groupBy("month").agg(F.countDistinct("user_id").alias("exact_distinct"))
    return (
        hll_merge(daily, ["month"])
        .join(exact, "month")
        .select(
            "month",
            "approx_distinct",
            "exact_distinct",
            F.round(
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                * 1000000.0
                / F.col("exact_distinct")
            )
            .cast("bigint")
            .alias("err_ppm"),
        )
        .orderBy("month")
    )


@query(
    "j11_fuzzy_name_match",
    """
    WITH names AS (SELECT DISTINCT p_name FROM part),
    bg AS (
      SELECT p_name, UNNEST(list_distinct(
        list_transform(range(1, len(p_name)), i -> substr(p_name, i, 2)))) AS g
      FROM names),
    cand AS (
      SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
      FROM bg a JOIN bg b ON a.g = b.g AND a.p_name < b.p_name)
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 2
    ORDER BY name_a, name_b
    """,
)
def j11_fuzzy_name_match(spark, sf_dir):
    """Entity-resolution fuzzy join over part names: bigram-blocked candidate
    generation (never all-pairs) + JVM Levenshtein on candidates only
    (`operators/joins.py: fuzzy_name_pairs`). The oracle replicates the same
    blocking, so the driver verifies both the distance math and the
    candidate recall.
    """
    from ..operators.joins import fuzzy_name_pairs

    p = t(spark, sf_dir, "part")
    return fuzzy_name_pairs(p, "p_name", max_dist=2).orderBy("name_a", "name_b")


@query(
    "s18_version_diff",
    """
    SELECT 'delete' AS change_type, n_nationkey FROM nation WHERE n_nationkey >= 20
    UNION ALL
    SELECT 'insert', n_nationkey + 100 FROM nation WHERE n_nationkey < 2
    UNION ALL
    SELECT 'update', n_nationkey FROM nation WHERE n_nationkey < 3 AND n_nationkey >= 0
    ORDER BY change_type, n_nationkey
    """,
)
def s18_version_diff(spark, sf_dir):
    """Change data feed between snapshots (`versioned.py: diff_versions` —
    the Delta CDF analog): v0 = nation; v1 = nation with keys ≥ 20 deleted,
    names of keys < 3 rewritten, and two synthetic keys inserted. The oracle
    recomputes the expected change set from the raw table, verifying the
    insert/delete/update classification end to end.
    """
    import shutil
    import tempfile

    from ..versioned import diff_versions, write_versioned

    n = t(spark, sf_dir, "nation")
    v1 = (
        n.filter(F.col("n_nationkey") < 20)
        .withColumn(
            "n_name",
            F.when(F.col("n_nationkey") < 3, F.concat(F.col("n_name"), F.lit("_X")))
            .otherwise(F.col("n_name")),
        )
        .unionByName(
            n.filter(F.col("n_nationkey") < 2).select(
                (F.col("n_nationkey") + 100).cast("int").alias("n_nationkey"),
                F.col("n_name"),
                F.col("n_regionkey"),
            )
        )
    )
    d = tempfile.mkdtemp(prefix="emdp_cdf_")
    try:
        write_versioned(n, d)
        write_versioned(v1, d)
        out = diff_versions(spark, d, 0, 1, keys=["n_nationkey"]).orderBy(
            "change_type", "n_nationkey"
        )
        # materialize before the table dir is removed
        rows = out.collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@query(
    "u4_intersect_except",
    """
    WITH clicks AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT 'intersect' AS set_op,
           CAST((SELECT COUNT(*) FROM (SELECT * FROM clicks INTERSECT SELECT * FROM buyers)) AS BIGINT) AS n_users
    UNION ALL
    SELECT 'except',
           CAST((SELECT COUNT(*) FROM (SELECT * FROM clicks EXCEPT SELECT * FROM buyers)) AS BIGINT)
    ORDER BY set_op
    """,
)
def u4_intersect_except(spark, sf_dir):
    """U-family completion: INTERSECT (clickers who purchased) and EXCEPT
    (clickers who never purchased). Both plan as a single left-semi/anti
    shuffle join over the deduped key sets — no materialized temp tables,
    unlike the reference's staged dbt models.
    """
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    inter = clicks.intersect(buyers).agg(F.count(F.lit(1)).alias("n_users")).withColumn(
        "set_op", F.lit("intersect")
    )
    exc = clicks.exceptAll(buyers).agg(F.count(F.lit(1)).alias("n_users")).withColumn(
        "set_op", F.lit("except")
    )
    return inter.unionByName(exc).select("set_op", "n_users").orderBy("set_op")


@query(
    "o6_keyset_pagination",
    """
    SELECT event_id, ts, event_type, value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
       OR (ts = TIMESTAMP '2024-01-25 00:00:00' AND event_id > 500000)
    ORDER BY ts DESC, event_id ASC
    LIMIT 50
    """,
)
def o6_keyset_pagination(spark, sf_dir):
    """Keyset (seek-method) pagination — the scale-correct replacement for
    the reference API's offset paging (`api/public_api.py` page/limit
    params): the composite-key predicate pushes into the parquet scan, so
    page N costs the same as page 1 instead of scanning N·page_size rows.
    The tuple comparison is expanded to the (ts < T) OR (ts = T AND id > K)
    form both engines plan as a range predicate + TopK.

    Note: on THIS fixture the ts predicate cannot reach the scan because the
    raw parquet stores nanosecond longs and ``t()`` reconstructs the
    timestamp (a computed column blocks pushdown); on a properly-typed table
    it pushes — proven by `tests/test_physical_plans.py:
    test_keyset_pagination_pushes_on_native_timestamps`.
    """
    ev = t(spark, sf_dir, "events")
    boundary_ts = F.lit("2024-01-25 00:00:00").cast("timestamp")
    page = ev.filter(
        (F.col("ts") < boundary_ts)
        | ((F.col("ts") == boundary_ts) & (F.col("event_id") > 500000))
    )
    return (
        page.select("event_id", "ts", "event_type", "value")
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(50)
    )


@query(
    "w10_time_weighted_avg",
    """
    WITH seq AS (
      SELECT event_type, value, epoch_us(ts) AS t_us,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS next_us
      FROM events
    )
    SELECT event_type,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2)) * (next_us - t_us)) AS DOUBLE)
                 / SUM(next_us - t_us), 6) AS twa_value,
           CAST(COUNT(next_us) AS BIGINT) AS n_intervals
    FROM seq WHERE next_us IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def w10_time_weighted_avg(spark, sf_dir):
    """Time-weighted average per event type: each reading is weighted by how
    long it was 'current' (until the next event of the same type) — the
    correct aggregate for irregularly-sampled gauges, where a plain AVG
    over-weights bursts (the reference's weather summaries average raw
    samples, `ops/data_processing_ops.py`, which is only right for uniform
    cadence).

    Determinism: timestamps as integer microseconds on both engines; the
    value×duration product runs in exact DECIMAL (2-dp value is exact in
    DECIMAL(12,2), duration is integer); the final quotient is rounded to
    6 dp because the exact decimal sum exceeds 2^53 and the two engines'
    decimal→double casts differ by 1 ulp there (the `davg` pattern).
    One window pass and the rollup share the event_type partitioning.
    """
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = (
        t(spark, sf_dir, "events")
        .select("event_type", "value", "ts", "event_id")
        .withColumn("t_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn("next_us", F.lead(F.unix_micros(F.col("ts").cast("timestamp"))).over(w))
        .filter(F.col("next_us").isNotNull())
    )
    dur = F.col("next_us") - F.col("t_us")
    return (
        seq.groupBy("event_type")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(12,2)") * dur).cast("double")
                / F.sum(dur),
                6,
            ).alias("twa_value"),
            F.count("next_us").alias("n_intervals"),
        )
        .orderBy("event_type")
    )


@query(
    "s19_from_json_typed",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max,
           CAST(COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) >= 50
                           THEN 1 END) AS BIGINT) AS k_high
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def s19_from_json_typed(spark, sf_dir):
    """Schema-on-read JSON: `from_json` with a declared struct schema (the
    typed counterpart of s5's string-path extraction — this is what a 100 TB
    pipeline should do, because the parsed struct is columnar downstream and
    the parse happens once, not per extracted field). The BIGINT cast on the
    sum mirrors the r1 HUGEINT lesson.
    """
    ev = t(spark, sf_dir, "events", restore=True)
    parsed = ev.withColumn("p", F.from_json("props", "k INT"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum("p.k").cast("bigint").alias("k_sum"),
            F.max("p.k").alias("k_max"),
            F.count(F.when(F.col("p.k") >= 50, F.lit(1))).alias("k_high"),
        )
        .orderBy("event_type")
    )


@query(
    "sql1_revenue_by_region",
    """
    SELECT r.r_name AS region_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def sql1_revenue_by_region(spark, sf_dir):
    """The engine's SQL surface: the same 4-table star query a reference user
    would type, executed verbatim via ``spark.sql`` over registered views —
    proving DataFrame and SQL entries hit the same Catalyst plans (dim joins
    broadcast, decimal-exact revenue). Views are registered per-call with
    unique names to stay re-entrant.
    """
    for name in ("orders", "customer", "nation", "region"):
        t(spark, sf_dir, name, restore=True).createOrReplaceTempView(f"sql1_{name}")
    return spark.sql(
        """
        SELECT r.r_name AS region_name,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
        FROM sql1_orders o
        JOIN sql1_customer c ON o.o_custkey = c.c_custkey
        JOIN sql1_nation n ON c.c_nationkey = n.n_nationkey
        JOIN sql1_region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY r.r_name
        """
    )


# ---------------------------------------------------------------------------
# Graph analytics — exact triangle count over the supplier co-occurrence
# graph (suppliers sharing an order). The engine orients edges by
# (degree, id) so wedge generation is bounded O(m^1.5) under any skew; the
# oracle counts the same orientation-invariant quantity with plain u < v.
# ---------------------------------------------------------------------------
@query(
    "gr_triangles",
    """
    WITH e AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.l_orderkey) >= 5)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
    JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    """,
)
def gr_triangles(spark, sf_dir):
    """Exact triangle count (`operators/graph.py:triangle_count`,
    degree-ordered orientation — Schank & Wagner 2005) over the supplier
    RELATIONSHIP graph: an edge joins two suppliers sharing at least five
    orders. The co-occurrence threshold is load-bearing at scale, exactly
    like `max_shingle_df` in the jaccard join: the UNthresholded
    co-occurrence graph of a random order mix converges to a complete
    graph (measured: half of all supplier pairs qualify at sf1 → 2.5e9
    wedges, 127s), while recurring-relationship edges stay sparse. The
    orientation then bounds the wedge join at O(m^1.5) under hub skew."""
    from ..operators.graph import cooccurrence_edges, triangle_count

    li = t(spark, sf_dir, "lineitem", restore=True).select("l_orderkey", "l_suppkey")
    pairs = cooccurrence_edges(li, "l_orderkey", "l_suppkey", min_shared=5)
    # materialize the thresholded edge list once (localCheckpoint, not
    # persist: the r8 persist A/B lost 3.15->4.62s warm, but cutting the
    # LINEAGE wins — measured sf1 warm 5.2->4.2s, cold 15.9->6.7s; the
    # operator's internal consumers then all read materialized partitions)
    return triangle_count(pairs.localCheckpoint(eager=True), "src", "dst")


# ---------------------------------------------------------------------------
# Iterative graph analytics — weighted PageRank over the nation trade graph
# (customer nation → supplier nation, weighted by distinct order-line flow).
# The Pregel-superstep-as-DataFrame pattern: each of the 3 fixed iterations
# is one join + one combiner aggregate; the oracle unrolls the same three
# supersteps as CTEs with the identical round-then-decimal-sum arithmetic.
# ---------------------------------------------------------------------------
@query(
    "gr_pagerank_trade",
    """
    WITH flow AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      GROUP BY cn.n_name, sn.n_name),
    outw AS (SELECT src, SUM(w) AS wtot FROM flow GROUP BY src),
    nodes AS (SELECT src AS id FROM flow UNION SELECT dst FROM flow),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
    m1 AS (SELECT f.dst AS id, CAST(SUM(CAST(ROUND(r0.r * f.w / ow.wtot, 8)
                                              AS DECIMAL(28,8))) AS DOUBLE) AS m
           FROM flow f JOIN r0 ON f.src = r0.id JOIN outw ow ON f.src = ow.src
           GROUP BY f.dst),
    r1 AS (SELECT nodes.id,
                  ROUND((1.0 - 0.85) / (SELECT n FROM nn)
                        + 0.85 * COALESCE(m1.m, 0.0), 8) AS r
           FROM nodes LEFT JOIN m1 ON nodes.id = m1.id),
    m2 AS (SELECT f.dst AS id, CAST(SUM(CAST(ROUND(r1.r * f.w / ow.wtot, 8)
                                              AS DECIMAL(28,8))) AS DOUBLE) AS m
           FROM flow f JOIN r1 ON f.src = r1.id JOIN outw ow ON f.src = ow.src
           GROUP BY f.dst),
    r2 AS (SELECT nodes.id,
                  ROUND((1.0 - 0.85) / (SELECT n FROM nn)
                        + 0.85 * COALESCE(m2.m, 0.0), 8) AS r
           FROM nodes LEFT JOIN m2 ON nodes.id = m2.id),
    m3 AS (SELECT f.dst AS id, CAST(SUM(CAST(ROUND(r2.r * f.w / ow.wtot, 8)
                                              AS DECIMAL(28,8))) AS DOUBLE) AS m
           FROM flow f JOIN r2 ON f.src = r2.id JOIN outw ow ON f.src = ow.src
           GROUP BY f.dst),
    r3 AS (SELECT nodes.id,
                  ROUND((1.0 - 0.85) / (SELECT n FROM nn)
                        + 0.85 * COALESCE(m3.m, 0.0), 8) AS r
           FROM nodes LEFT JOIN m3 ON nodes.id = m3.id)
    SELECT id AS nation, r AS rank FROM r3 ORDER BY rank DESC, nation
    """,
)
def gr_pagerank_trade(spark, sf_dir):
    """Weighted PageRank over nation→nation trade flow (3 supersteps,
    damping 0.85, `operators/graph.py:pagerank_weighted`). Ranks nations by
    how much order-line volume flows INTO their suppliers from important
    buyer nations — the influence score a hand-built aggregate
    (`disaster_analytics.sql`-style severity rollups in the reference)
    approximates with one level of weighting; PageRank closes the loop."""
    return _pagerank_from_flow(_trade_flow(spark, sf_dir))


def _pagerank_from_flow(flow):
    from ..operators.graph import pagerank_weighted

    ranks = pagerank_weighted(flow, "src", "dst", "w", iterations=3, damping=0.85)
    return ranks.select(F.col("id").alias("nation"), "rank").orderBy(
        F.col("rank").desc(), "nation"
    )


def _sparse_trade_edges(flow):
    """Top-2 destinations per source nation by flow weight (self-loops
    dropped) — the sparse (src, dst) edge frame the BFS/peel/degree
    gr_* family shares. Factored out of the 7 queries that each inlined
    it (r10 VERDICT #3) so the standalone queries and the
    `plans/graph_marts.py` `trade_edges` MV serve from ONE code path —
    byte-equality between the two is then true by construction."""
    rn = F.row_number().over(
        Window.partitionBy("src").orderBy(F.desc("w"), F.col("dst"))
    )
    return (
        flow.filter(F.col("src") != F.col("dst"))
        .withColumn("rn", rn)
        .filter(F.col("rn") <= 2)
        .select("src", "dst")
    )


def _trade_flow(spark, sf_dir):
    """The nation→nation weighted trade edge list shared by the gr_*
    family (directly by gr_pagerank_trade / gr_hits; via
    `_sparse_trade_edges` by the BFS/peel/degree queries). Materialized
    once as the `trade_flow` model in `plans/graph_marts.py`."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    c = F.broadcast(t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    s = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = t(spark, sf_dir, "nation")
    cn = F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("src")))
    sn = F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("dst")))
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(cn, F.col("c_nationkey") == F.col("ck"))
        .join(sn, F.col("s_nationkey") == F.col("sk"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


def _hits_oracle(iters: int) -> str:
    """Unrolled HITS CTEs mirroring operators/graph.py:hits_weighted —
    round-8 per-edge products, exact decimal sums, L1 normalize each
    half-step from uniform h0 = 1.0."""
    parts = [
        """
    flow AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      GROUP BY cn.n_name, sn.n_name),
    nodes AS (SELECT src AS id FROM flow UNION SELECT dst FROM flow),
    h0 AS (SELECT id, 1.0 AS h FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""
    a{i}r AS (SELECT f.dst AS id,
                     CAST(SUM(CAST(ROUND(p.h * f.w, 8) AS DECIMAL(28,8))) AS DOUBLE) AS raw
              FROM flow f JOIN h{i-1} p ON f.src = p.id GROUP BY f.dst),
    a{i}t AS (SELECT CAST(SUM(CAST(raw AS DECIMAL(28,8))) AS DOUBLE) AS tot FROM a{i}r),
    a{i} AS (SELECT n.id, ROUND(COALESCE(r.raw, 0.0) / t.tot, 8) AS a
             FROM nodes n LEFT JOIN a{i}r r ON n.id = r.id CROSS JOIN a{i}t t),
    h{i}r AS (SELECT f.src AS id,
                     CAST(SUM(CAST(ROUND(q.a * f.w, 8) AS DECIMAL(28,8))) AS DOUBLE) AS raw
              FROM flow f JOIN a{i} q ON f.dst = q.id GROUP BY f.src),
    h{i}t AS (SELECT CAST(SUM(CAST(raw AS DECIMAL(28,8))) AS DOUBLE) AS tot FROM h{i}r),
    h{i} AS (SELECT n.id, ROUND(COALESCE(r.raw, 0.0) / t.tot, 8) AS h
             FROM nodes n LEFT JOIN h{i}r r ON n.id = r.id CROSS JOIN h{i}t t)""")
    return (
        "WITH " + ",".join(parts) + f"""
    SELECT n.id AS nation, h{iters}.h AS hub, a{iters}.a AS authority
    FROM nodes n JOIN h{iters} ON n.id = h{iters}.id JOIN a{iters} ON n.id = a{iters}.id
    ORDER BY authority DESC, nation
    """
    )


# ---------------------------------------------------------------------------
# Iterative graph analytics — HITS hubs & authorities (Kleinberg 1999) over
# the same nation trade graph as gr_pagerank_trade: authorities are nations
# whose SUPPLIERS absorb flow from strong buyer nations, hubs are the strong
# buyer nations themselves — the two-sided influence view one PageRank score
# conflates. 2 full (a, h) rounds, L1-normalized half-steps, the same
# round-8 + exact-decimal-sum ladder, so the oracle unrolls bit-identically.
# ---------------------------------------------------------------------------
@query("gr_hits", _hits_oracle(2))
def gr_hits(spark, sf_dir):
    return _hits_from_flow(_trade_flow(spark, sf_dir))


def _hits_from_flow(flow):
    from ..operators.graph import hits_weighted

    out = hits_weighted(flow, "src", "dst", "w", iterations=2)
    return out.select(F.col("id").alias("nation"), "hub", "authority").orderBy(
        F.col("authority").desc(), "nation"
    )


# ---------------------------------------------------------------------------
# Mergeable histogram partials → interpolated quantiles. The quantile member
# of the reaggregation family (a19 exact sums, a21 HLL distincts): daily
# fixed-bin partials merge to any coarser grain by addition, and the
# percentile estimate is a deterministic function of the counts — so unlike
# a sketch it is oracle-checkable. The Spark side deliberately builds DAILY
# partials and merges them; the oracle computes the direct per-type
# histogram — identical by the merge identity.
# ---------------------------------------------------------------------------
@query(
    "a22_histogram_quantiles",
    """
    WITH h AS (
      SELECT event_type,
             LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 10.0) AS INT), 0), 49) AS bin,
             COUNT(*) AS n
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 10.0) AS INT), 0), 49)),
    c AS (
      SELECT event_type, bin, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM h)
    SELECT event_type,
           ROUND(MIN(CASE WHEN cum >= 0.5 * total AND cum - n < 0.5 * total
                 THEN 0.0 + (bin + (0.5 * total - (cum - n)) / n) * 10.0 END), 6) AS p50,
           ROUND(MIN(CASE WHEN cum >= 0.9 * total AND cum - n < 0.9 * total
                 THEN 0.0 + (bin + (0.9 * total - (cum - n)) / n) * 10.0 END), 6) AS p90,
           ROUND(MIN(CASE WHEN cum >= 0.99 * total AND cum - n < 0.99 * total
                 THEN 0.0 + (bin + (0.99 * total - (cum - n)) / n) * 10.0 END), 6) AS p99
    FROM c GROUP BY event_type ORDER BY event_type
    """,
)
def a22_histogram_quantiles(spark, sf_dir):
    """p50/p90/p99 of event value per type, served from MERGED daily
    histogram partials (`operators/reaggregate.py: histogram_partial/
    quantiles_from_histogram`) — the serving layer never re-touches raw
    rows; the oracle's direct histogram equals the merged partials by the
    additive-merge identity."""
    from ..operators.reaggregate import histogram_partial, quantiles_from_histogram

    e = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = histogram_partial(e, ["event_type", "day"], "value", 0.0, 500.0, 50)
    return quantiles_from_histogram(
        daily.drop("day"), ["event_type"], [0.5, 0.9, 0.99], 0.0, 500.0, 50
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Time-series resample + forward fill: a complete daily spine per entity
# (generated, not joined — the spine explodes off the distinct-entity frame
# so no cross join appears in the plan) left-joined with sparse daily
# aggregates, gaps carried forward with last_value(ignoreNulls). The gauge
# resampling every dashboard needs over irregular samples; window shares the
# entity partitioning with the join.
# ---------------------------------------------------------------------------
@query(
    "ts_resample_ffill",
    """
    WITH types AS (SELECT DISTINCT event_type FROM events),
    days AS (SELECT CAST(UNNEST(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                                INTERVAL 1 DAY)) AS DATE) AS day),
    spine AS (SELECT event_type, day FROM types CROSS JOIN days),
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) / COUNT(value) * 1000000.0) / 1000000.0
               AS v
      FROM events WHERE value > 450
      GROUP BY event_type, CAST(ts AS DATE)),
    joined AS (
      SELECT s.event_type, s.day, d.v
      FROM spine s LEFT JOIN daily d ON s.event_type = d.event_type AND s.day = d.day)
    SELECT event_type, day,
           LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
    FROM joined ORDER BY event_type, day
    """,
)
def ts_resample_ffill(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    spine = (
        e.select("event_type")
        .distinct()
        .withColumn(
            "day",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01").cast("date"),
                    F.lit("2024-01-30").cast("date"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ),
        )
    )
    daily = (
        e.filter(F.col("value") > 450)
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            (
                F.round(
                    F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
                    / F.count("value")
                    * F.lit(1000000.0)
                )
                / F.lit(1000000.0)
            ).alias("v")
        )
    )
    joined = spine.join(daily, ["event_type", "day"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "day",
        F.last("v", ignorenulls=True).over(w).alias("v_ffill"),
    ).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# w13 — PERCENT_RANK / CUME_DIST per group: the relative-standing window
# pair (percentile position of each order's price within its priority
# class). Rounds in the integer domain (see davg) — both are ratios of
# ints but ties at the 6th decimal are engine-divergent under plain ROUND.
# ---------------------------------------------------------------------------
@query(
    "w13_percent_rank",
    """
    SELECT o_orderkey, o_orderpriority,
           ROUND(PERCENT_RANK() OVER w * 1000000.0) / 1000000.0 AS pct_rank,
           ROUND(CUME_DIST() OVER w * 1000000.0) / 1000000.0 AS cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def w13_percent_rank(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    r6 = lambda c: F.round(c * F.lit(1000000.0)) / F.lit(1000000.0)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        r6(F.percent_rank().over(w)).alias("pct_rank"),
        r6(F.cume_dist().over(w)).alias("cume_dist"),
    )


# ---------------------------------------------------------------------------
# ts — CUSUM change detection over the per-type daily series. The textbook
# recurrence S_t = max(0, S_{t-1} + (x_t - target - slack)) rewrites to the
# WINDOW identity S_t = P_t - min_{j<=t} P_j over prefix sums P of the
# drift d_t = x_t - target - slack, so the whole detector is two window
# passes — no fold, no iteration, scales as any partitioned window. Flags
# days where the upward CUSUM exceeds h = 2·sigma of the daily means.
# ---------------------------------------------------------------------------
@query(
    "ts_cusum_changepoints",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) / COUNT(value) * 1000000.0) / 1000000.0 AS x
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type,
             CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mu,
             COUNT(*) AS n_days,
             CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE) AS sx
      FROM daily GROUP BY event_type),
    drift AS (
      SELECT d.event_type, d.day, d.x,
             d.x - s.mu - 0.5 * SQRT((s.sxx - s.sx * s.sx / s.n_days) / NULLIF(s.n_days - 1, 0)) AS dft,
             2.0 * SQRT((s.sxx - s.sx * s.sx / s.n_days) / NULLIF(s.n_days - 1, 0)) AS h
      FROM daily d JOIN stats s ON d.event_type = s.event_type),
    prefix AS (
      SELECT event_type, day, x, h,
             SUM(dft) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_t
      FROM drift),
    cusum AS (
      SELECT event_type, day, x, h,
             p_t - LEAST(MIN(p_t) OVER (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS s_t
      FROM prefix)
    SELECT event_type, day, x AS daily_mean,
           ROUND(s_t * 1000000.0) / 1000000.0 AS cusum_stat,
           CAST(s_t > h AS BOOLEAN) AS changepoint
    FROM cusum
    """,
)
def ts_cusum_changepoints(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    r6 = lambda c: F.round(c * F.lit(1000000.0)) / F.lit(1000000.0)
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        r6(
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
            / F.count("value")
        ).alias("x")
    )
    stats = daily.groupBy("event_type").agg(
        (F.sum(F.col("x").cast("decimal(28,6)")).cast("double") / F.count(F.lit(1))).alias("mu"),
        F.count(F.lit(1)).alias("n_days"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,8)")).cast("double").alias("sxx"),
        F.sum(F.col("x").cast("decimal(28,6)")).cast("double").alias("sx"),
    )
    # guard the sample-variance denominator: a single-observation group
    # divides by zero, where Spark doubles yield NULL but DuckDB's IEEE
    # float ops yield inf/nan — force BOTH engines to NULL (oracle uses
    # NULLIF(n_days - 1, 0)) so the edge agrees at any scale
    sigma = F.when(
        F.col("n_days") > 1,
        F.sqrt(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n_days"))
            / (F.col("n_days") - 1)
        ),
    )
    drift = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "x",
        (F.col("x") - F.col("mu") - F.lit(0.5) * sigma).alias("dft"),
        (F.lit(2.0) * sigma).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = F.sum("dft").over(w)
    # include the empty prefix P_0 = 0 (S_0 = 0 in the recurrence)
    s_t = p - F.least(F.min(p).over(w), F.lit(0.0))
    return drift.select(
        "event_type",
        "day",
        F.col("x").alias("daily_mean"),
        r6(s_t).alias("cusum_stat"),
        (s_t > F.col("h")).alias("changepoint"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend: median of pairwise daily slopes per event type —
# the breakdown-resistant twin of the LAG-delta trend queries. Corpus-rate
# work is one daily hash-agg; the pairwise join is calendar-bounded.
# ---------------------------------------------------------------------------
@query(
    "ts_theilsen_trend",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                        / COUNT(*) * 1000000.0) AS BIGINT) AS ppm
      FROM events GROUP BY 1, 2),
    pairs AS (
      SELECT a.event_type,
             CAST(ROUND((b.ppm - a.ppm) * 1.0
                        / date_diff('day', a.d, b.d)) AS BIGINT) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d),
    nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
           FROM daily GROUP BY event_type)
    SELECT p.event_type, nd.n_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           quantile_cont(p.slope, 0.5) AS trend_slope_ppm
    FROM pairs p JOIN nd USING (event_type)
    GROUP BY p.event_type, nd.n_days
    ORDER BY p.event_type
    """,
)
def ts_theilsen_trend(spark, sf_dir):
    from ..quality.anomaly import theil_sen_trend

    e = t(spark, sf_dir, "events")
    return theil_sen_trend(e, "value", "ts", ["event_type"])


# ---------------------------------------------------------------------------
# k-hop reachability over the SPARSE trade graph (each nation keeps its
# top-2 trade destinations): Spark = k unrolled frontier joins with
# per-round set-dedup (operators/graph.py:khop_min_hops); oracle = the
# recursive CTE a SQL engine would write. min_hops = BFS depth.
# ---------------------------------------------------------------------------
@query(
    "gr_khop_reach",
    """
    WITH RECURSIVE flow AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE cn.n_name <> sn.n_name
      GROUP BY cn.n_name, sn.n_name),
    ranked AS (
      SELECT src, dst,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
      FROM flow),
    e AS (SELECT src, dst FROM ranked WHERE rn <= 2),
    hops(src, dst, h) AS (
      SELECT src, dst, 1 FROM e
      UNION ALL
      SELECT hops.src, e.dst, hops.h + 1
      FROM hops JOIN e ON hops.dst = e.src
      WHERE hops.h < 3)
    SELECT src, dst, CAST(MIN(h) AS INT) AS min_hops
    FROM hops GROUP BY src, dst
    ORDER BY src, dst
    """,
)
def gr_khop_reach(spark, sf_dir):
    """Which nations can a nation's trade reach in ≤3 hops, and how fast?
    Sparse edges = top-2 destinations per source nation by lineitem flow
    (dimension-sized after the fact-table hash-agg); reachability via the
    unrolled-BFS operator. The heavy work — the 5-way fact join — is the
    same broadcast-dim plan gr_pagerank_trade uses; the BFS rounds touch
    only the 50-row edge list."""
    return _khop_from_edges(_sparse_trade_edges(_trade_flow(spark, sf_dir)))


def _khop_from_edges(e):
    from ..operators.graph import khop_min_hops

    return khop_min_hops(e, "src", "dst", k=3)


# ---------------------------------------------------------------------------
# Rolling 7-day exact median of daily means per event type — robust twin
# of the trailing-mean window (operators/windows.py:rolling_median;
# Spark lacks percentile-as-window, so the bounded frame is collected,
# sorted, and indexed — constant memory per row).
# ---------------------------------------------------------------------------
@query(
    "w14_rolling_median",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                        / COUNT(*) * 1000000.0) AS BIGINT) AS ppm
      FROM events GROUP BY 1, 2)
    SELECT event_type, day, ppm,
           quantile_cont(ppm, 0.5) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_median_ppm
    FROM daily
    ORDER BY event_type, day
    """,
)
def w14_rolling_median(spark, sf_dir):
    from ..operators.windows import rolling_median

    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
            / F.count(F.lit(1))
            * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("ppm")
    )
    med = rolling_median(daily, "ppm", "day", ["event_type"], window_rows=7)
    return daily.withColumn("rolling_median_ppm", med).orderBy("event_type", "day")


# ---------------------------------------------------------------------------
# Shuffle-key skew diagnostic over lineitem's supplier key: Gini, hottest-
# key share, p99/p50 — the pre-flight numbers for salting/AQE decisions
# (quality/profile.py:key_skew_profile; rank-sum computed on the distinct-
# count frame, never a key-cardinality window).
# ---------------------------------------------------------------------------
@query(
    "a29_key_skew_gini",
    """
    WITH c AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM lineitem GROUP BY 1),
    per AS (SELECT cnt, CAST(COUNT(*) AS BIGINT) AS m FROM c GROUP BY cnt),
    cum AS (SELECT cnt, m,
                   COALESCE(SUM(m) OVER (ORDER BY cnt
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b
            FROM per),
    tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n,
                   CAST(SUM(m * cnt) AS BIGINT) AS s,
                   CAST(SUM(cnt * (m * b + (m * (m + 1)) // 2)) AS BIGINT) AS t,
                   CAST(MAX(cnt) AS BIGINT) AS maxc
            FROM cum),
    q AS (SELECT quantile_cont(cnt, 0.5) AS p50_cnt,
                 quantile_cont(cnt, 0.99) AS p99_cnt
          FROM c)
    SELECT n AS n_keys, s AS total_rows,
           ROUND((2 * t - (n + 1) * s) * 1.0 / (n * s), 6) AS gini,
           ROUND(maxc * 1.0 / s, 6) AS top_share,
           p50_cnt, p99_cnt,
           ROUND(p99_cnt / p50_cnt, 6) AS skew_ratio
    FROM tot CROSS JOIN q
    """,
)
def a29_key_skew_gini(spark, sf_dir):
    from ..quality.profile import key_skew_profile

    l = t(spark, sf_dir, "lineitem")
    return key_skew_profile(l, "l_suppkey")


# ---------------------------------------------------------------------------
# Market-basket association rules over (user, day) baskets of event types
# (operators/aggregates.py:basket_association_rules): which behaviors
# co-occur beyond chance (lift > 1), top-20 by lift.
# ---------------------------------------------------------------------------
@query(
    "a30_assoc_rules",
    """
    WITH items AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type FROM events),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets
           FROM (SELECT DISTINCT user_id, d FROM items)),
    supp AS (SELECT event_type AS it, CAST(COUNT(*) AS BIGINT) AS it_cnt
             FROM items GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS antecedent, b.event_type AS consequent,
             CAST(COUNT(*) AS BIGINT) AS pair_cnt
      FROM items a JOIN items b
        ON a.user_id = b.user_id AND a.d = b.d AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT antecedent, consequent, pair_cnt,
           ROUND(pair_cnt * 1.0 / nb.n_baskets, 6) AS support,
           ROUND(pair_cnt * 1.0 / ca.it_cnt, 6) AS confidence,
           ROUND((pair_cnt * nb.n_baskets * 1.0) / (ca.it_cnt * cb.it_cnt), 6) AS lift
    FROM pairs
    JOIN supp ca ON ca.it = pairs.antecedent
    JOIN supp cb ON cb.it = pairs.consequent
    CROSS JOIN nb
    ORDER BY lift DESC, antecedent, consequent
    LIMIT 20
    """,
)
def a30_assoc_rules(spark, sf_dir):
    from ..operators.aggregates import basket_association_rules

    e = t(spark, sf_dir, "events")
    return basket_association_rules(
        e.select("user_id", F.col("ts").cast("date").alias("d"), "event_type"),
        ["user_id", "d"],
        "event_type",
        top_k=20,
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation between event-type daily series — the robust
# twin of ts_corr_pairs (Pearson on raw counts is dragged by one spiked
# hour; rank-transform first and monotone outliers lose their leverage).
# Ranks use the average-rank tie convention: RANK() + (ties-1)/2.
# ---------------------------------------------------------------------------
@query(
    "ts_spearman_corr",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)
                        / COUNT(*) * 1000000.0) AS BIGINT) AS ppm
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT event_type, d,
             RANK() OVER (PARTITION BY event_type ORDER BY ppm)
               + (COUNT(*) OVER (PARTITION BY event_type, ppm) - 1) / 2.0 AS rk
      FROM daily)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           ROUND(corr(a.rk, b.rk), 4) AS spearman_rho,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM ranked a JOIN ranked b
      ON a.d = b.d AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    ORDER BY type_a, type_b
    """,
)
def ts_spearman_corr(spark, sf_dir):
    """Rank-transform correlation: daily ppm means rank within each type
    (calendar-bounded partitions; average-rank ties so the statistic is
    permutation-deterministic), then the same day-keyed pair join +
    corr aggregate as ts_corr_pairs — one extra window over the
    dimension-sized daily frame buys outlier robustness."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double")
            / F.count(F.lit(1))
            * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("ppm")
    )
    wr = Window.partitionBy("event_type").orderBy("ppm")
    wt = Window.partitionBy("event_type", "ppm")
    ranked = daily.withColumn(
        "rk",
        F.rank().over(wr) + (F.count(F.lit(1)).over(wt) - 1) / 2.0,
    )
    a = ranked.select(
        F.col("event_type").alias("type_a"), F.col("d").alias("da"), F.col("rk").alias("rka")
    )
    b = ranked.select(
        F.col("event_type").alias("type_b"), F.col("d").alias("db"), F.col("rk").alias("rkb")
    )
    return (
        a.join(b, (F.col("da") == F.col("db")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(
            F.round(F.corr("rka", "rkb"), 4).alias("spearman_rho"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Share-of-parent rollup: nation revenue as a share of its region and of
# the total — the OLAP percent-of-parent measure every drill-down grid
# shows. Corpus-rate work is the fact-side hash-agg; both share windows
# run on the 25-row nation frame.
# ---------------------------------------------------------------------------
@query(
    "a33_share_of_parent",
    """
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS nation_rev
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name),
    w AS (
      SELECT region, nation, nation_rev,
             SUM(nation_rev) OVER (PARTITION BY region) AS region_rev,
             SUM(nation_rev) OVER () AS total_rev
      FROM rev)
    SELECT region, nation,
           ROUND(nation_rev * 100.0) / 100.0 AS nation_rev,
           ROUND(nation_rev / region_rev, 6) AS share_of_region,
           ROUND(nation_rev / total_rev, 6) AS share_of_total
    FROM w ORDER BY region, nation
    """,
)
def a33_share_of_parent(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem", restore=True)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    rev = (
        l.join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,4)"
                )
            )
            .cast("double")
            .alias("nation_rev")
        )
    )
    wr = Window.partitionBy("region")
    wt = Window.partitionBy()
    # both windows run on the 25-row nation-grain frame — never corpus rows
    return rev.select(
        "region",
        "nation",
        # integer-domain rounding (davg convention): round(x*100)/100 —
        # round-to-integer of doubles < 2^52 cannot hit a repr-vs-binary tie
        (F.round(F.col("nation_rev") * F.lit(100.0)) / F.lit(100.0)).alias(
            "nation_rev"
        ),
        F.round(F.col("nation_rev") / F.sum("nation_rev").over(wr), 6).alias(
            "share_of_region"
        ),
        F.round(F.col("nation_rev") / F.sum("nation_rev").over(wt), 6).alias(
            "share_of_total"
        ),
    ).orderBy("region", "nation")


# ---------------------------------------------------------------------------
# Autocorrelation function of the daily count series at lags 1..7 per
# event type — the seasonality diagnostic next to ts_seasonal_residuals.
# ACF_k here is the Pearson correlation of the (x_t, x_{t+k}) pair set
# (pairs matched by CALENDAR day, not row adjacency, so missing days
# cannot misalign the lag), with every moment accumulated as an exact
# bigint over the integer counts; the only float ops are the final
# sqrt/divide, one IEEE expression both engines evaluate bit-identically.
# ---------------------------------------------------------------------------
@query(
    "ts_acf",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    lags(k) AS (VALUES (1), (2), (3), (4), (5), (6), (7)),
    pairs AS (
      SELECT a.event_type, l.k, a.cnt AS x, b.cnt AS y
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + l.k),
    m AS (
      SELECT event_type, k,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pairs GROUP BY 1, 2)
    SELECT event_type, CAST(k AS INT) AS lag_days, n AS n_pairs,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                        * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS acf
    FROM m ORDER BY event_type, lag_days
    """,
)
def ts_acf(spark, sf_dir):
    """ACF at lags 1..7 of the per-type daily count series. Corpus-rate
    work is the daily hash-agg; the lag self-join runs on the
    dimension-sized (type, day) frame × 7 lag rows, partitioned by
    event_type. Integer moments (bigint Σx, Σx², Σxy) make the statistic
    partial-agg-order-proof; exact up to |n·Σxy| < 2^53 (~sf100 for this
    fixture), past which widen to decimal."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    a = daily.withColumn(
        "k", F.explode(F.sequence(F.lit(1), F.lit(7)))
    ).alias("a")
    b = daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.d") == F.expr("date_add(a.d, k)")),
        )
        .select(
            F.col("a.event_type").alias("event_type"),
            "k",
            F.col("a.cnt").alias("x"),
            F.col("b.cnt").alias("y"),
        )
    )
    m = pairs.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "event_type",
        F.col("k").cast("int").alias("lag_days"),
        F.col("n").alias("n_pairs"),
        F.when(
            (vx > 0) & (vy > 0),
            num.cast("double") / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
        ).alias("acf"),
    ).orderBy("event_type", "lag_days")


# ---------------------------------------------------------------------------
# Community detection on the sparse nation trade graph: k=3 rounds of
# synchronous min-label propagation (operators/graph.py:
# label_propagation_min) — the deterministic variant of Raghavan label
# propagation; oracle = the same three rounds unrolled as CTEs.
# ---------------------------------------------------------------------------
_LP_EDGES_CTE = """
    WITH flow AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE cn.n_name <> sn.n_name
      GROUP BY cn.n_name, sn.n_name),
    ranked AS (
      SELECT src, dst,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
      FROM flow),
    e AS (SELECT src, dst FROM ranked WHERE rn <= 2),
    adj AS (
      SELECT DISTINCT u, v FROM (
        SELECT src AS u, dst AS v FROM e
        UNION ALL SELECT dst AS u, src AS v FROM e) z
      WHERE u <> v),
    l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM adj)"""

_LP_ROUND = """
    l{i} AS (
      SELECT p.node,
             LEAST(p.lbl, COALESCE(MIN(q.lbl), p.lbl)) AS lbl
      FROM l{j} p
      LEFT JOIN adj a ON a.u = p.node
      LEFT JOIN l{j} q ON q.node = a.v
      GROUP BY p.node, p.lbl)"""


@query(
    "gr_label_prop",
    _LP_EDGES_CTE
    + ","
    + ",".join(_LP_ROUND.format(i=i, j=i - 1) for i in (1, 2, 3))
    + """
    SELECT node, lbl AS community,
           CAST(COUNT(*) OVER (PARTITION BY lbl) AS BIGINT) AS community_size
    FROM l3 ORDER BY node
    """,
)
def gr_label_prop(spark, sf_dir):
    """Trade-graph communities after 3 min-label rounds. The heavy 5-way
    fact join is the same broadcast-dim plan as gr_pagerank_trade; the
    propagation rounds touch only the ~50-row edge list (one node-keyed
    shuffle per round at any graph size)."""
    return _label_prop_from_edges(_sparse_trade_edges(_trade_flow(spark, sf_dir)))


def _label_prop_from_edges(e):
    from ..operators.graph import label_propagation_min

    lbl = label_propagation_min(e, iterations=3)
    return lbl.withColumn(
        "community_size",
        F.count(F.lit(1)).over(Window.partitionBy("community")).cast("bigint"),
    ).orderBy("node")


# ---------------------------------------------------------------------------
# Degree assortativity of the sparse trade graph: Pearson correlation of
# endpoint degrees over the symmetrized edge list (each undirected edge
# contributes both orientations — the standard simplification of Newman
# 2002's remaining-degree coefficient). Integer moments in bigint; the
# only float ops are the final sqrt/divide.
# ---------------------------------------------------------------------------
@query(
    "gr_degree_assortativity",
    _LP_EDGES_CTE
    + """,
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY u),
    pairs AS (
      SELECT du.d AS x, dv.d AS y
      FROM adj a JOIN deg du ON du.node = a.u JOIN deg dv ON dv.node = a.v),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pairs)
    SELECT n AS n_directed_edges,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                        * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS assortativity
    FROM m
    """,
)
def gr_degree_assortativity(spark, sf_dir):
    """Do high-degree nations trade with high-degree nations? Heavy work
    is the same 5-way broadcast-dim fact join every gr_* query shares;
    the degree join and moment agg run on the ~50-row edge frame. At any
    graph size this is |edges| rows through two node-keyed broadcast-able
    joins + one scalar agg."""
    return _assortativity_from_edges(
        _sparse_trade_edges(_trade_flow(spark, sf_dir))
    )


def _assortativity_from_edges(e):
    fwd = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    rev = e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    adj = fwd.unionByName(rev).filter(F.col("u") != F.col("v")).distinct()
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    pairs = (
        adj.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "x"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "y"), "v")
        .select("x", "y")
    )
    m = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        F.col("n").alias("n_directed_edges"),
        F.when(
            (vx > 0) & (vy > 0),
            num.cast("double") / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation with FIXED band thresholds (the shuffle-free
# form: a global NTILE would funnel a billion-customer frame through one
# sort at 100 TB — fixed business bands score each customer map-side
# after the per-customer rollup, the same reasoning as ml_risk_bands).
# Anchor date pinned so recency is deterministic.
# ---------------------------------------------------------------------------
@query(
    "a34_rfm_segments",
    """
    WITH rfm AS (
      SELECT o_custkey,
             datediff('day', MAX(o_orderdate), DATE '1998-08-01') AS rec_days,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey,
             CASE WHEN rec_days <= 90 THEN 5 WHEN rec_days <= 365 THEN 4
                  WHEN rec_days <= 730 THEN 3 WHEN rec_days <= 1460 THEN 2
                  ELSE 1 END AS r_band,
             CASE WHEN freq >= 30 THEN 5 WHEN freq >= 20 THEN 4
                  WHEN freq >= 10 THEN 3 WHEN freq >= 5 THEN 2
                  ELSE 1 END AS f_band,
             CASE WHEN mon >= 3000000 THEN 5 WHEN mon >= 1500000 THEN 4
                  WHEN mon >= 750000 THEN 3 WHEN mon >= 250000 THEN 2
                  ELSE 1 END AS m_band,
             freq, mon
      FROM rfm),
    seg AS (
      SELECT o_custkey, r_band, f_band, m_band, freq, mon,
             CASE WHEN r_band >= 4 AND f_band >= 4 AND m_band >= 4 THEN 'CHAMPION'
                  WHEN r_band >= 4 AND f_band >= 3 THEN 'LOYAL'
                  WHEN r_band >= 4 THEN 'RECENT'
                  WHEN f_band >= 4 THEN 'AT_RISK_HIGH_VALUE'
                  WHEN r_band <= 2 AND f_band <= 2 THEN 'HIBERNATING'
                  ELSE 'NEEDS_ATTENTION' END AS segment
      FROM scored)
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(freq) AS BIGINT) AS total_orders,
           CAST(CAST(SUM(mon) AS DECIMAL(28,2)) AS DOUBLE) AS total_monetary,
           CAST(MIN(r_band) AS INT) AS min_r, CAST(MAX(r_band) AS INT) AS max_r
    FROM seg GROUP BY segment ORDER BY segment
    """,
)
def a34_rfm_segments(spark, sf_dir):
    """Per-customer recency/frequency/monetary rollup (one custkey
    hash-agg over orders), fixed-threshold band scoring (map-side CASE,
    no global sort), segment CASE ladder, and a segment-keyed rollup.
    Monetary stays decimal end-to-end."""
    o = t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(F.lit("1998-08-01").cast("date"), F.max("o_orderdate")).alias("rec_days"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("mon"),
    )
    r_band = (
        F.when(F.col("rec_days") <= 90, 5)
        .when(F.col("rec_days") <= 365, 4)
        .when(F.col("rec_days") <= 730, 3)
        .when(F.col("rec_days") <= 1460, 2)
        .otherwise(1)
    )
    f_band = (
        F.when(F.col("freq") >= 30, 5)
        .when(F.col("freq") >= 20, 4)
        .when(F.col("freq") >= 10, 3)
        .when(F.col("freq") >= 5, 2)
        .otherwise(1)
    )
    m_band = (
        F.when(F.col("mon") >= 3000000, 5)
        .when(F.col("mon") >= 1500000, 4)
        .when(F.col("mon") >= 750000, 3)
        .when(F.col("mon") >= 250000, 2)
        .otherwise(1)
    )
    scored = rfm.select(
        "freq", "mon", r_band.alias("r_band"), f_band.alias("f_band"), m_band.alias("m_band")
    )
    segment = (
        F.when((F.col("r_band") >= 4) & (F.col("f_band") >= 4) & (F.col("m_band") >= 4), "CHAMPION")
        .when((F.col("r_band") >= 4) & (F.col("f_band") >= 3), "LOYAL")
        .when(F.col("r_band") >= 4, "RECENT")
        .when(F.col("f_band") >= 4, "AT_RISK_HIGH_VALUE")
        .when((F.col("r_band") <= 2) & (F.col("f_band") <= 2), "HIBERNATING")
        .otherwise("NEEDS_ATTENTION")
    )
    return (
        scored.withColumn("segment", segment)
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("freq").cast("bigint").alias("total_orders"),
            F.sum("mon").cast("decimal(28,2)").cast("double").alias("total_monetary"),
            F.min("r_band").cast("int").alias("min_r"),
            F.max("r_band").cast("int").alias("max_r"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Bounded-horizon closeness centrality: Σ 1/min_hops over nodes reachable
# in ≤3 hops (harmonic closeness truncated at the BFS depth — the form
# that stays computable with k frontier joins at any graph size). The
# reciprocal sum is kept EXACT by scaling to the lcm: hops ∈ {1,2,3} ⇒
# 6/min_hops ∈ {6,3,2}, summed as bigint.
# ---------------------------------------------------------------------------
@query(
    "gr_closeness_k3",
    """
    WITH RECURSIVE flow AS (
      SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE cn.n_name <> sn.n_name
      GROUP BY cn.n_name, sn.n_name),
    ranked AS (
      SELECT src, dst,
             ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
      FROM flow),
    e AS (SELECT src, dst FROM ranked WHERE rn <= 2),
    hops(src, dst, h) AS (
      SELECT src, dst, 1 FROM e
      UNION ALL
      SELECT hops.src, e.dst, hops.h + 1
      FROM hops JOIN e ON hops.dst = e.src
      WHERE hops.h < 3),
    mh AS (SELECT src, dst, MIN(h) AS min_hops FROM hops GROUP BY src, dst)
    SELECT src AS node,
           CAST(COUNT(*) AS BIGINT) AS n_reachable,
           CAST(SUM(6 // min_hops) AS BIGINT) AS closeness_x6
    FROM mh GROUP BY src ORDER BY node
    """,
)
def gr_closeness_k3(spark, sf_dir):
    """Truncated harmonic closeness over the sparse trade graph: reuses
    the khop_min_hops unrolled BFS (operators/graph.py), then one
    src-keyed rollup of the lcm-scaled reciprocals — everything after
    the shared 5-way fact join touches only the ~50-row edge closure."""
    return _closeness_from_edges(_sparse_trade_edges(_trade_flow(spark, sf_dir)))


def _closeness_from_edges(e):
    from ..operators.graph import khop_min_hops

    mh = khop_min_hops(e, "src", "dst", k=3)
    return (
        mh.groupBy(F.col("src").alias("node"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reachable"),
            F.sum(F.expr("6 div min_hops")).cast("bigint").alias("closeness_x6"),
        )
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# Weekly growth accounting (new / retained / resurrected / churned users
# + quick ratio) — the standard product-analytics decomposition of user
# movement, the companion mart to a20_retention_cohorts. All statuses
# derive from ONE user-partitioned window pass over the distinct
# (user, week) activity frame; churn is attributed to the week AFTER the
# last active week, horizon-capped at the observed max week.
# ---------------------------------------------------------------------------
@query(
    "a35_growth_accounting",
    """
    WITH act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events),
    seq AS (
      SELECT user_id, wk,
             LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
             LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk,
             MIN(wk) OVER (PARTITION BY user_id) AS first_wk
      FROM act),
    horizon AS (SELECT MAX(wk) AS max_wk FROM act),
    status AS (
      SELECT wk,
             CASE WHEN wk = first_wk THEN 1 ELSE 0 END AS is_new,
             CASE WHEN prev_wk = wk - 7 THEN 1 ELSE 0 END AS is_retained,
             CASE WHEN wk <> first_wk AND (prev_wk IS NULL OR prev_wk < wk - 7)
                  THEN 1 ELSE 0 END AS is_resurrected,
             0 AS is_churned
      FROM seq
      UNION ALL
      SELECT wk + 7 AS wk, 0, 0, 0, 1
      FROM seq CROSS JOIN horizon
      WHERE (next_wk IS NULL OR next_wk > wk + 7) AND wk + 7 <= horizon.max_wk)
    SELECT wk,
           CAST(SUM(is_new) AS BIGINT) AS n_new,
           CAST(SUM(is_retained) AS BIGINT) AS n_retained,
           CAST(SUM(is_resurrected) AS BIGINT) AS n_resurrected,
           CAST(SUM(is_churned) AS BIGINT) AS n_churned,
           CASE WHEN SUM(is_churned) > 0
                THEN CAST(SUM(is_new) + SUM(is_resurrected) AS DOUBLE) / SUM(is_churned)
           END AS quick_ratio
    FROM status GROUP BY wk ORDER BY wk
    """,
)
def a35_growth_accounting(spark, sf_dir):
    """New/retained/resurrected/churned per ISO week. Corpus-rate work:
    the distinct (user, week) collapse; then lag/lead/min share one
    user-partitioned sort (single Exchange), the churn branch re-keys
    rows one week forward, and the rollup is week-keyed. Quick ratio =
    (new + resurrected) / churned, one division."""
    e = t(spark, sf_dir, "events")
    act = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    w_seq = Window.partitionBy("user_id").orderBy("wk")
    w_all = Window.partitionBy("user_id")
    seq = act.select(
        "wk",
        F.lag("wk").over(w_seq).alias("prev_wk"),
        F.lead("wk").over(w_seq).alias("next_wk"),
        F.min("wk").over(w_all).alias("first_wk"),
    )
    horizon = act.agg(F.max("wk").alias("max_wk"))
    status = seq.select(
        "wk",
        F.when(F.col("wk") == F.col("first_wk"), 1).otherwise(0).alias("is_new"),
        F.when(F.col("prev_wk") == F.date_sub(F.col("wk"), 7), 1)
        .otherwise(0)
        .alias("is_retained"),
        F.when(
            (F.col("wk") != F.col("first_wk"))
            & (F.col("prev_wk").isNull() | (F.col("prev_wk") < F.date_sub(F.col("wk"), 7))),
            1,
        )
        .otherwise(0)
        .alias("is_resurrected"),
        F.lit(0).alias("is_churned"),
    ).unionByName(
        seq.crossJoin(F.broadcast(horizon))
        .filter(
            (F.col("next_wk").isNull() | (F.col("next_wk") > F.date_add(F.col("wk"), 7)))
            & (F.date_add(F.col("wk"), 7) <= F.col("max_wk"))
        )
        .select(
            F.date_add(F.col("wk"), 7).alias("wk"),
            F.lit(0).alias("is_new"),
            F.lit(0).alias("is_retained"),
            F.lit(0).alias("is_resurrected"),
            F.lit(1).alias("is_churned"),
        )
    )
    agg = status.groupBy("wk").agg(
        F.sum("is_new").cast("bigint").alias("n_new"),
        F.sum("is_retained").cast("bigint").alias("n_retained"),
        F.sum("is_resurrected").cast("bigint").alias("n_resurrected"),
        F.sum("is_churned").cast("bigint").alias("n_churned"),
    )
    return agg.select(
        "wk",
        "n_new",
        "n_retained",
        "n_resurrected",
        "n_churned",
        F.when(
            F.col("n_churned") > 0,
            (F.col("n_new") + F.col("n_resurrected")).cast("double") / F.col("n_churned"),
        ).alias("quick_ratio"),
    ).orderBy("wk")


# ---------------------------------------------------------------------------
# Running-peak max drawdown of each type's daily cumulative value — the
# largest peak-to-trough fall of the running total (the risk stat every
# monitoring/finance mart carries). Daily sums land in the integer cent
# domain (decimal → bigint cents) so running peak, trough, and drawdown
# are exact integers at any scale.
# ---------------------------------------------------------------------------
@query(
    "w15_max_drawdown",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(28,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    cum AS (
      SELECT event_type, d,
             SUM(cents) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bal
      FROM daily),
    dd AS (
      SELECT event_type, d, bal,
             MAX(bal) OVER (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM cum)
    SELECT event_type,
           CAST(MAX(peak - bal) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(bal) AS BIGINT) AS final_peak_cents,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM dd GROUP BY event_type ORDER BY event_type
    """,
)
def w15_max_drawdown(spark, sf_dir):
    """Max drawdown per type: one daily hash-agg (corpus-rate), then two
    stacked windows + the rollup all on the same event_type partitioning
    (one Exchange, Catalyst reuses it). Cents stay bigint throughout."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.col("ts").cast("date").alias("d")).agg(
        (F.sum(F.col("value").cast("decimal(28,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = daily.withColumn("bal", F.sum("cents").over(w_run)).withColumn(
        "peak", F.max("bal").over(w_run)
    )
    return (
        dd.groupBy("event_type")
        .agg(
            F.max(F.col("peak") - F.col("bal")).cast("bigint").alias("max_drawdown_cents"),
            F.max("bal").cast("bigint").alias("final_peak_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# 2-D skyline / Pareto frontier (operators/sorts.py:skyline_2d): which
# suppliers are undominated on (total quantity shipped, net revenue)?
# Engine = the window formulation (one sort of the supplier-cardinality
# frame, no self-join); oracle = the literal NOT EXISTS dominance
# definition, so the two sides prove each other from independent forms.
# ---------------------------------------------------------------------------
@query(
    "o7_skyline",
    """
    WITH s AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))
                  * 10000 AS BIGINT) AS revenue_x10000
      FROM lineitem GROUP BY l_suppkey)
    SELECT l_suppkey, total_qty, revenue_x10000
    FROM s
    WHERE NOT EXISTS (
      SELECT 1 FROM s d
      WHERE (d.total_qty > s.total_qty AND d.revenue_x10000 >= s.revenue_x10000)
         OR (d.total_qty = s.total_qty AND d.revenue_x10000 > s.revenue_x10000))
    ORDER BY total_qty DESC, l_suppkey
    """,
)
def o7_skyline(spark, sf_dir):
    """Supplier Pareto frontier. The corpus-rate pass is the suppkey
    hash-agg; the skyline windows run on the supplier-cardinality frame
    (at larger scales, prefilter to per-cell local skylines first — the
    operator docstring's distributive decomposition)."""
    from ..operators.sorts import skyline_2d

    l = t(spark, sf_dir, "lineitem")
    s = l.groupBy("l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("total_qty"),
        # x10000 (1e-4-dollar units): the 4-dp decimal sum scales to an
        # EXACT integer — a x100 cents cast hit a real half-cent tie at sf1
        # (Spark HALF_UP vs DuckDB's cast rounding disagreed by 1)
        (
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,4)"))
            * 10000
        )
        .cast("bigint")
        .alias("revenue_x10000"),
    )
    return skyline_2d(s, "total_qty", "revenue_x10000").orderBy(
        F.desc("total_qty"), F.asc("l_suppkey")
    )


# ---------------------------------------------------------------------------
# Bounded k-core peeling (operators/graph.py:kcore_peel): the densest
# backbone of the trade graph — 3 synchronous rounds dropping nodes
# whose surviving degree < 3; oracle = the same rounds unrolled. Every
# round's frames only shrink, so the Pregel cost is bounded by round 1.
# ---------------------------------------------------------------------------
_KC_ROUND = """
    k{i} AS (
      SELECT u FROM (SELECT u, COUNT(*) AS c FROM adj{j} GROUP BY u) z WHERE c >= 3),
    adj{i} AS (
      SELECT a.u, a.v FROM adj{j} a
      JOIN k{i} x ON x.u = a.u
      JOIN k{i} y ON y.u = a.v)"""


@query(
    "gr_kcore",
    _LP_EDGES_CTE
    + ","
    + "adj0 AS (SELECT u, v FROM adj),"
    + ",".join(_KC_ROUND.format(i=i, j=i - 1) for i in (1, 2, 3))
    + """
    SELECT u AS node, CAST(COUNT(*) AS INT) AS degree
    FROM adj3 GROUP BY u ORDER BY node
    """,
)
def gr_kcore(spark, sf_dir):
    """3-core survivors (after 3 peel rounds) of the sparse trade graph
    with their surviving degrees. The heavy 5-way fact join is shared
    with the other gr_* queries; each peel round is one degree hash-agg
    + two semi-joins over the shrinking ~50-row edge frame."""
    return _kcore_from_edges(_sparse_trade_edges(_trade_flow(spark, sf_dir)))


def _kcore_from_edges(e):
    from ..operators.graph import kcore_peel

    return kcore_peel(e, k=3, rounds=3)


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau statistic over the lag-1..7 autocorrelations —
# "is this series white noise?", the standard residual-diagnostic next
# to ts_acf (whose pair-Pearson ACF variant it reuses; documented
# divergence from the textbook shared-mean ACF). Q = n(n+2)·Σ r_k²/(n−k)
# with the 7-term sum as an ORDERED fold (k-sorted list_reduce /
# F.aggregate), so float association is pinned; non-estimable lags
# (zero variance / no pairs) are skipped like SQL SUM skips NULL.
# ---------------------------------------------------------------------------
@query(
    "ts_ljungbox",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2),
    nd AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1),
    lags(k) AS (VALUES (1), (2), (3), (4), (5), (6), (7)),
    pairs AS (
      SELECT a.event_type, l.k, a.cnt AS x, b.cnt AS y
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b ON b.event_type = a.event_type AND b.d = a.d + l.k),
    m AS (
      SELECT event_type, k,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pairs GROUP BY 1, 2),
    acf AS (
      SELECT event_type, k,
             CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                  THEN CAST(n * sxy - sx * sy AS DOUBLE)
                       / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                          * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
             END AS r
      FROM m),
    terms AS (
      SELECT acf.event_type, acf.k,
             acf.r * acf.r / (nd.n_days - acf.k) AS t,
             nd.n_days
      FROM acf JOIN nd USING (event_type)
      WHERE acf.r IS NOT NULL AND nd.n_days > acf.k),
    folded AS (
      SELECT event_type, MAX(n_days) AS n_days,
             CAST(COUNT(*) AS INT) AS n_lags,
             list_reduce(
               list_transform(list_sort(list(struct_pack(k := k, t := t))), x -> x.t),
               (a, b) -> a + b) AS s
      FROM terms GROUP BY event_type)
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days, n_lags,
           n_days * (n_days + 2) * s AS q_ljungbox
    FROM folded ORDER BY event_type
    """,
)
def ts_ljungbox(spark, sf_dir):
    """Ljung-Box Q per event type from the same integer-moment ACF
    pipeline as ts_acf; the only float steps are the per-lag r_k (fixed
    IEEE expressions) and the 7-term ordered fold."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    a = daily.withColumn("k", F.explode(F.sequence(F.lit(1), F.lit(7)))).alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.d") == F.expr("date_add(a.d, k)")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        "k",
        F.col("a.cnt").alias("x"),
        F.col("b.cnt").alias("y"),
    )
    m = pairs.groupBy("event_type", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    acf = m.select(
        "event_type",
        "k",
        F.when(
            (vx > 0) & (vy > 0),
            num.cast("double") / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
        ).alias("r"),
    )
    terms = (
        acf.join(nd, "event_type")
        .filter(F.col("r").isNotNull() & (F.col("n_days") > F.col("k")))
        .select(
            "event_type",
            "k",
            (F.col("r") * F.col("r") / (F.col("n_days") - F.col("k"))).alias("t"),
            "n_days",
        )
    )
    folded = terms.groupBy("event_type").agg(
        F.max("n_days").alias("n_days"),
        F.count(F.lit(1)).cast("int").alias("n_lags"),
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("k", "t"))), lambda x: x["t"]
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("s"),
    )
    return folded.select(
        "event_type",
        F.col("n_days").cast("bigint").alias("n_days"),
        "n_lags",
        (F.col("n_days") * (F.col("n_days") + 2) * F.col("s")).alias("q_ljungbox"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Diversified top-k (o-family): global top-10 orders by price with AT
# MOST 2 per customer — the result-diversification constraint every
# leaderboard/search surface needs (plain top-k lets one hot entity
# monopolize the list). Two stacked rank filters, both of which Spark
# executes as WindowGroupLimit (per-partition partial top-k): no global
# materialized sort at any scale.
# ---------------------------------------------------------------------------
@query(
    "o8_diverse_topk",
    """
    WITH percust AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS cr
      FROM orders QUALIFY cr <= 2),
    ranked AS (
      SELECT o_orderkey, o_custkey, o_totalprice, cr,
             ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM percust QUALIFY rnk <= 10)
    SELECT CAST(rnk AS INT) AS rank, o_orderkey, o_custkey, o_totalprice,
           CAST(cr AS INT) AS nth_of_customer
    FROM ranked ORDER BY rank
    """,
)
def o8_diverse_topk(spark, sf_dir):
    """Per-customer cap (≤2) then global top-10: the customer window
    prunes to ≤2 rows/customer map-side, the global window prunes to 10
    — both WindowGroupLimit, so the exchange carries only candidates."""
    o = t(spark, sf_dir, "orders")
    w_cust = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    percust = (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("cr", F.row_number().over(w_cust))
        .filter(F.col("cr") <= 2)
    )
    w_all = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        percust.withColumn("rnk", F.row_number().over(w_all))
        .filter(F.col("rnk") <= 10)
        .select(
            F.col("rnk").cast("int").alias("rank"),
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("cr").cast("int").alias("nth_of_customer"),
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# Cohort LTV curves: customers cohorted by first-order year; cumulative
# revenue per cohort across cohort age (years since first order) — the
# lifetime-value mart behind every retention dashboard, the revenue twin
# of a20's user-count cohorts. Money stays decimal; the cumulative pass
# runs on the (cohort × age) frame, never the fact table.
# ---------------------------------------------------------------------------
@query(
    "a37_cohort_ltv",
    """
    WITH first_order AS (
      SELECT o_custkey, MIN(EXTRACT(YEAR FROM o_orderdate)) AS cohort_year
      FROM orders GROUP BY o_custkey),
    facts AS (
      SELECT f.cohort_year,
             EXTRACT(YEAR FROM o.o_orderdate) - f.cohort_year AS age_years,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
      FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey),
    cell AS (
      SELECT CAST(cohort_year AS INT) AS cohort_year,
             CAST(age_years AS INT) AS age_years,
             CAST(SUM(rev) AS DECIMAL(28,2)) AS rev,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM facts GROUP BY 1, 2),
    sized AS (
      SELECT cohort_year, CAST(COUNT(*) AS BIGINT) AS cohort_customers
      FROM first_order GROUP BY 1)
    SELECT c.cohort_year, c.age_years, c.n_orders, s.cohort_customers,
           CAST(c.rev AS DOUBLE) AS period_revenue,
           CAST(CAST(SUM(c.rev) OVER (PARTITION BY c.cohort_year ORDER BY c.age_years
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(28,2)) AS DOUBLE)
             AS cumulative_revenue
    FROM cell c JOIN sized s USING (cohort_year)
    ORDER BY cohort_year, age_years
    """,
)
def a37_cohort_ltv(spark, sf_dir):
    """First-order-year cohorts → (cohort, age) revenue cells → running
    LTV. Corpus-rate work: the first-order agg and one fact re-join
    (both custkey-keyed, AQE broadcast-able dim side); the cumulative
    window touches only the years×years cell frame. Decimal end-to-end,
    cast double only at emission."""
    o = t(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort_year")
    )
    facts = o.join(first, "o_custkey").select(
        F.col("cohort_year"),
        (F.year("o_orderdate") - F.col("cohort_year")).alias("age_years"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("rev"),
    )
    cell = facts.groupBy(
        F.col("cohort_year").cast("int").alias("cohort_year"),
        F.col("age_years").cast("int").alias("age_years"),
    ).agg(
        F.sum("rev").cast("decimal(28,2)").alias("rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    sized = first.groupBy(F.col("cohort_year").cast("int").alias("cohort_year")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_customers")
    )
    w_run = (
        Window.partitionBy("cohort_year")
        .orderBy("age_years")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cell.join(sized, "cohort_year")
        .select(
            "cohort_year",
            "age_years",
            "n_orders",
            "cohort_customers",
            F.col("rev").cast("double").alias("period_revenue"),
            F.sum("rev").over(w_run).cast("decimal(28,2)").cast("double").alias("cumulative_revenue"),
        )
        .orderBy("cohort_year", "age_years")
    )


# ---------------------------------------------------------------------------
# Seasonal strength (Hyndman FPP): F_s = max(0, 1 − Var(residual)/
# Var(value)) per event type over the day-of-week decomposition that
# ts_seasonal_residuals proves. Squares round to 4 dp before the decimal
# sum so the UNSCALED sum stays < 2^53 — the ml_ridge_2d lesson: DuckDB
# converts high-scale decimals to double in two roundings, so moment
# sums must keep their unscaled integers exactly double-representable.
# ---------------------------------------------------------------------------
@query(
    "ts_seasonal_strength",
    """
    WITH prof AS (
      SELECT event_type, isodow(ts) AS dow,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) / COUNT(value) * 1000000.0) / 1000000.0 AS seasonal
      FROM events GROUP BY 1, 2),
    r AS (
      SELECT e.event_type, e.value,
             ROUND(e.value - p.seasonal, 6) AS resid
      FROM events e
      JOIN prof p ON e.event_type = p.event_type AND isodow(e.ts) = p.dow),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(ROUND(value * value, 4) AS DECIMAL(28,4))) AS DOUBLE) AS svv,
             CAST(SUM(CAST(resid AS DECIMAL(28,6))) AS DOUBLE) AS sr,
             CAST(SUM(CAST(ROUND(resid * resid, 4) AS DECIMAL(28,4))) AS DOUBLE) AS srr
      FROM r GROUP BY event_type)
    SELECT event_type, n,
           (svv - sv * sv / n) / n AS var_value,
           (srr - sr * sr / n) / n AS var_resid,
           GREATEST(0.0, 1.0 - ((srr - sr * sr / n) / n)
                              / ((svv - sv * sv / n) / n)) AS seasonal_strength
    FROM m ORDER BY event_type
    """,
)
def ts_seasonal_strength(spark, sf_dir):
    """How much of each type's variance the weekly profile explains.
    One profile hash-agg (35 rows) broadcast back, one moment hash-agg
    per type; the strength formula is a fixed IEEE expression on
    decimal-exact moments."""
    from .registry import davg

    e = t(spark, sf_dir, "events", restore=True).withColumn(
        "dow", (F.weekday("ts") + 1).cast("int")
    )
    prof = e.groupBy("event_type", "dow").agg(davg("value").alias("seasonal"))
    r = e.join(F.broadcast(prof), ["event_type", "dow"]).select(
        "event_type",
        "value",
        F.round(F.col("value") - F.col("seasonal"), 6).alias("resid"),
    )
    m = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("sv"),
        F.sum(F.round(F.col("value") * F.col("value"), 4).cast("decimal(28,4)"))
        .cast("double")
        .alias("svv"),
        F.sum(F.col("resid").cast("decimal(28,6)")).cast("double").alias("sr"),
        F.sum(F.round(F.col("resid") * F.col("resid"), 4).cast("decimal(28,4)"))
        .cast("double")
        .alias("srr"),
    )
    var_v = (F.col("svv") - F.col("sv") * F.col("sv") / F.col("n")) / F.col("n")
    var_r = (F.col("srr") - F.col("sr") * F.col("sr") / F.col("n")) / F.col("n")
    return m.select(
        "event_type",
        "n",
        var_v.alias("var_value"),
        var_r.alias("var_resid"),
        F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_v).alias("seasonal_strength"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Reciprocity of the directed trade graph: what fraction of top-2 trade
# edges are reciprocated? Pure integer ratio over the edge frame.
# ---------------------------------------------------------------------------
@query(
    "gr_reciprocity",
    _LP_EDGES_CTE
    + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocal,
           CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS reciprocity
    FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src
    """,
)
def gr_reciprocity(spark, sf_dir):
    """Edge-level reciprocity: the directed edge list left-joins its own
    transpose (both ~50 rows after the shared fact-join rollup); one
    integer-ratio division out."""
    return _reciprocity_from_edges(_sparse_trade_edges(_trade_flow(spark, sf_dir)))


def _reciprocity_from_edges(e):
    r = e.select(F.col("dst").alias("src"), F.col("src").alias("dst")).withColumn(
        "__rec", F.lit(1)
    )
    j = e.join(r, ["src", "dst"], "left")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum(F.coalesce(F.col("__rec"), F.lit(0))).cast("bigint").alias("n_reciprocal"),
        (
            F.sum(F.coalesce(F.col("__rec"), F.lit(0))).cast("double") / F.count(F.lit(1))
        ).alias("reciprocity"),
    )


# ---------------------------------------------------------------------------
# Link prediction by common-neighbor Jaccard: for NON-adjacent nation
# pairs sharing ≥1 neighbor in the undirected trade graph, score
# |N(u)∩N(v)| / |N(u)∪N(v)| — the classic structural-similarity
# candidate list (Liben-Nowell & Kleinberg 2003). Wedge self-join on the
# edge frame; score kept as exact ppm integers.
# ---------------------------------------------------------------------------
@query(
    "gr_link_prediction",
    _LP_EDGES_CTE
    + """,
    deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY u),
    wedge AS (
      SELECT a.v AS u, b.v AS v, CAST(COUNT(*) AS BIGINT) AS common
      FROM adj a JOIN adj b ON a.u = b.u AND a.v < b.v
      GROUP BY a.v, b.v),
    nonadj AS (
      SELECT w.u, w.v, w.common
      FROM wedge w LEFT JOIN adj e ON e.u = w.u AND e.v = w.v
      WHERE e.u IS NULL)
    SELECT n.u, n.v, n.common AS common_neighbors,
           du.d AS deg_u, dv.d AS deg_v,
           (n.common * CAST(1000000 AS BIGINT)) // (du.d + dv.d - n.common) AS jaccard_ppm
    FROM nonadj n
    JOIN deg du ON du.node = n.u
    JOIN deg dv ON dv.node = n.v
    ORDER BY jaccard_ppm DESC, n.u, n.v
    LIMIT 10
    """,
)
def gr_link_prediction(spark, sf_dir):
    """Top-10 missing-edge candidates by neighbor-set Jaccard. The wedge
    join and degree joins run on the ~50-row symmetrized edge frame (one
    checkpointed derivation shared with the other gr_* rounds); at web
    scale the wedge join is the m^1.5-bounded shape triangle counting
    already uses."""
    return _link_prediction_from_edges(
        _sparse_trade_edges(_trade_flow(spark, sf_dir))
    )


def _link_prediction_from_edges(e):
    fwd = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    rev = e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    adj = fwd.unionByName(rev).filter(F.col("u") != F.col("v")).distinct()
    deg = adj.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    a, b = adj.alias("a"), adj.alias("b")
    wedge = (
        a.join(b, (F.col("a.u") == F.col("b.u")) & (F.col("a.v") < F.col("b.v")))
        .groupBy(F.col("a.v").alias("u"), F.col("b.v").alias("v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    nonadj = wedge.join(adj, ["u", "v"], "anti")
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("deg_v"))
    return (
        nonadj.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.col("common").alias("common_neighbors"),
            "deg_u",
            "deg_v",
            F.expr(
                "(common * CAST(1000000 AS BIGINT)) div (deg_u + deg_v - common)"
            ).alias("jaccard_ppm"),
        )
        .orderBy(F.desc("jaccard_ppm"), F.asc("u"), F.asc("v"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Graph: directed weighted modularity of the REGION partition over the
# nation trade graph (Newman 2004, directed form: Q = Σ_c e_c/m −
# (out_c/m)(in_c/m)) — the quality score for a community assignment, here
# scoring how much trade stays within geographic regions vs crosses them.
# Complements gr_label_prop (finds communities) with the metric that
# evaluates one. All inputs are exact integer edge weights; the per-region
# terms are IEEE doubles of exact ints, rounded to 8 then DECIMAL-summed
# (hash-agg order cannot move Q), Q broadcast back as a 1-row aggregate.
# ---------------------------------------------------------------------------
@query(
    "gr_modularity_regions",
    """
    WITH flow AS (
      SELECT c.c_nationkey AS src_n, s.s_nationkey AS dst_n, COUNT(*) AS w
      FROM orders o
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2),
    lab AS (SELECT n_nationkey, n_regionkey FROM nation),
    rflow AS (
      SELECT a.n_regionkey AS rs, b.n_regionkey AS rd, CAST(SUM(f.w) AS BIGINT) AS w
      FROM flow f JOIN lab a ON f.src_n = a.n_nationkey
                  JOIN lab b ON f.dst_n = b.n_nationkey
      GROUP BY 1, 2),
    m AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM rflow),
    per AS (
      SELECT r.r_regionkey AS region_key, r.r_name AS region,
             CAST(COALESCE(SUM(CASE WHEN f.rs = f.rd THEN f.w END), 0) AS BIGINT) AS w_within
      FROM region r LEFT JOIN rflow f ON f.rs = r.r_regionkey AND f.rd = r.r_regionkey
      GROUP BY 1, 2),
    outs AS (SELECT rs AS region_key, CAST(SUM(w) AS BIGINT) AS w_out FROM rflow GROUP BY 1),
    ins AS (SELECT rd AS region_key, CAST(SUM(w) AS BIGINT) AS w_in FROM rflow GROUP BY 1),
    terms AS (
      SELECT p.region_key, p.region, p.w_within,
             COALESCE(o.w_out, 0) AS w_out, COALESCE(i.w_in, 0) AS w_in,
             ROUND((p.w_within * 1.0 / t.m
                    - (COALESCE(o.w_out, 0) * 1.0 / t.m)
                      * (COALESCE(i.w_in, 0) * 1.0 / t.m)), 8) AS term
      FROM per p
      LEFT JOIN outs o ON p.region_key = o.region_key
      LEFT JOIN ins i ON p.region_key = i.region_key
      CROSS JOIN m t),
    q AS (SELECT CAST(SUM(CAST(term AS DECIMAL(28,8))) AS DOUBLE) AS q_total FROM terms)
    SELECT terms.region, terms.w_within, terms.w_out, terms.w_in, terms.term,
           ROUND(q.q_total * 1000000) / 1000000.0 AS q_modularity
    FROM terms CROSS JOIN q ORDER BY terms.region
    """,
)
def gr_modularity_regions(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    c = F.broadcast(t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    s = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = t(spark, sf_dir, "nation")
    la = F.broadcast(n.select(F.col("n_nationkey").alias("sn"), F.col("n_regionkey").alias("rs")))
    lb = F.broadcast(n.select(F.col("n_nationkey").alias("dn"), F.col("n_regionkey").alias("rd")))
    # SINGLE-CONSUMER chain (r9): rflow previously fed 5 lazy consumers
    # (m / within / outs / ins / terms) and Catalyst did NOT dedupe them —
    # the r8 executed plan scanned lineitem 6x in the FINAL AQE plan
    # section (the full plan string shows 12 FileScan nodes only because
    # it repeats the tree under "== Initial Plan =="; same convention as
    # tests/test_multi_consumer_reuse.py, which counts final-plan text
    # only — 41 distinct query stages, zero ReusedExchange). Instead of
    # persist, each tiny
    # rflow row (regions^2 <= 25) explodes into its out- and in-side
    # contributions, ONE region_key agg folds them, and m / q_total come
    # from global windows over the 5-row region frame — the whole query is
    # now one linear plan: fact join -> (rs,rd) agg -> explode -> region
    # agg -> two 5-row windows. Guard: tests/test_physical_plans.py
    # asserts one lineitem scan.
    from pyspark.sql import Window

    rflow = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(la, F.col("c_nationkey") == F.col("sn"))
        .join(lb, F.col("s_nationkey") == F.col("dn"))
        .groupBy("rs", "rd")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    zero = F.lit(0).cast("bigint")
    contrib = rflow.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("rs").alias("region_key"),
                    F.col("w").alias("w_out"),
                    zero.alias("w_in"),
                    F.when(F.col("rs") == F.col("rd"), F.col("w"))
                    .otherwise(zero)
                    .alias("w_within"),
                ),
                F.struct(
                    F.col("rd").alias("region_key"),
                    zero.alias("w_out"),
                    F.col("w").alias("w_in"),
                    zero.alias("w_within"),
                ),
            )
        ).alias("c")
    ).select("c.*")
    per_region = contrib.groupBy("region_key").agg(
        F.sum("w_within").cast("bigint").alias("w_within"),
        F.sum("w_out").cast("bigint").alias("w_out"),
        F.sum("w_in").cast("bigint").alias("w_in"),
    )
    reg = t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("region_key"), F.col("r_name").alias("region")
    )
    w_all = Window.partitionBy()  # 5-row region frame: a global window is safe
    terms = (
        reg.join(per_region, "region_key", "left")
        .select(
            "region",
            F.coalesce("w_within", zero).cast("bigint").alias("w_within"),
            F.coalesce("w_out", zero).cast("bigint").alias("w_out"),
            F.coalesce("w_in", zero).cast("bigint").alias("w_in"),
        )
        # m = SUM over rflow w: every rflow row lands its w in exactly one
        # region's w_out, so the global w_out sum is the same BIGINT
        .withColumn("m", F.sum("w_out").over(w_all))
        .withColumn(
            "term",
            F.round(
                F.col("w_within") * 1.0 / F.col("m")
                - (F.col("w_out") * 1.0 / F.col("m"))
                * (F.col("w_in") * 1.0 / F.col("m")),
                8,
            ),
        )
    )
    return (
        terms.withColumn(
            "q_total",
            F.sum(F.col("term").cast("decimal(28,8)")).over(w_all).cast("double"),
        )
        .select(
            "region",
            "w_within",
            "w_out",
            "w_in",
            "term",
            (F.round(F.col("q_total") * 1000000.0) / 1000000.0).alias("q_modularity"),
        )
        .orderBy("region")
    )


# ---------------------------------------------------------------------------
# Graph analytics: global clustering coefficient — C = 3·triangles /
# wedges over the SAME thresholded supplier co-occurrence graph as
# gr_triangles (≥5 shared orders). Wedges = Σ_v C(deg v, 2) is one
# explode + hash agg on the edge list; triangles reuse the degree-ordered
# O(m^1.5) operator; both 1-row frames cross-join. All-BIGINT ppm output.
# ---------------------------------------------------------------------------
@query(
    "gr_clustering_coeff",
    """
    WITH e AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.l_orderkey) >= 5),
    deg AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
      GROUP BY id),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM e e1
      JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
    st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(SUM(d) // 2 AS BIGINT) AS n_edges,
             CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg)
    SELECT st.n_nodes, st.n_edges, st.n_wedges, tri.n_triangles,
           CAST((3 * tri.n_triangles * 1000000) // st.n_wedges AS BIGINT)
             AS global_clustering_ppm
    FROM st CROSS JOIN tri
    """,
)
def gr_clustering_coeff(spark, sf_dir):
    from ..operators.graph import (
        cooccurrence_edges,
        endpoint_degrees,
        triangle_count,
    )

    li = t(spark, sf_dir, "lineitem", restore=True).select("l_orderkey", "l_suppkey")
    pairs = cooccurrence_edges(li, "l_orderkey", "l_suppkey", min_shared=5)
    # one materialization feeds both the triangle machinery and the wedge
    # agg (measured sf1 warm 6.4->4.5s, cold 17.9->7.0s vs lazy recompute)
    pairs = pairs.localCheckpoint(eager=True)
    tri = triangle_count(pairs, "src", "dst")
    deg = endpoint_degrees(pairs)
    st = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.expr("CAST(SUM(d) div 2 AS BIGINT)").alias("n_edges"),
        F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("n_wedges"),
    )
    return st.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.expr(
            "CAST((3 * n_triangles * CAST(1000000 AS BIGINT)) div n_wedges AS BIGINT)"
        ).alias("global_clustering_ppm"),
    )


# ---------------------------------------------------------------------------
# Graph analytics: degree-distribution power-law fit — OLS slope of
# ln(count) on ln(degree) over the distinct-degree histogram of the
# supplier co-occurrence graph (the log-log regression every "is this
# graph scale-free?" report starts with; slope ≈ −α). The regression runs
# on the DEGREE HISTOGRAM (≤ max-degree rows), so after one edge-list agg
# the fit costs nothing at any scale. Determinism: ln() terms round to
# 8dp, all sums are exact DECIMAL sums of rounded terms, one final IEEE
# division (the ml_ridge_2d ladder).
# ---------------------------------------------------------------------------
@query(
    "gr_powerlaw_degree",
    """
    WITH e AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.l_orderkey) >= 5),
    deg AS (
      SELECT id, COUNT(*) AS d
      FROM (SELECT u AS id FROM e UNION ALL SELECT v FROM e)
      GROUP BY id),
    hist AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM deg GROUP BY d),
    pts AS (SELECT ROUND(LN(d), 8) AS x, ROUND(LN(cnt), 8) AS y FROM hist),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(28,8))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(28,8))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(x * y, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ROUND(x * x, 8) AS DECIMAL(28,8))) AS DOUBLE) AS sxx
      FROM pts)
    SELECT n AS n_degree_points,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1000000) / 1000000.0
             AS loglog_slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n * 1000000)
             / 1000000.0 AS loglog_intercept
    FROM s
    """,
)
def gr_powerlaw_degree(spark, sf_dir):
    from ..operators.graph import cooccurrence_edges, endpoint_degrees

    li = t(spark, sf_dir, "lineitem", restore=True).select("l_orderkey", "l_suppkey")
    pairs = cooccurrence_edges(li, "l_orderkey", "l_suppkey", min_shared=5)
    # explode both endpoints in one pass: a union of two selects would
    # re-plan the whole thresholded self-join twice (multi-consumer lesson)
    deg = endpoint_degrees(pairs)
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    pts = hist.select(
        F.round(F.log(F.col("d").cast("double")), 8).alias("x"),
        F.round(F.log(F.col("cnt").cast("double")), 8).alias("y"),
    )
    dec = "decimal(28,8)"
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 8).cast(dec)).cast("double").alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 8).cast(dec)).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").alias("n_degree_points"),
        (F.round(slope * 1000000.0) / 1000000.0).alias("loglog_slope"),
        (
            F.round((F.col("sy") - slope * F.col("sx")) / F.col("n") * 1000000.0)
            / 1000000.0
        ).alias("loglog_intercept"),
    )


# ---------------------------------------------------------------------------
# Graph analytics: connected components of the supplier co-occurrence graph
# — the partition structure every per-component rollup needs (and the
# graph-side twin of dedup's cluster step: dd_embedding_clusters runs the
# same operator over similarity edges). Engine: iterative min-label
# propagation with pointer jumping (O(log diameter) rounds,
# llmdata/dedup.py:connected_components); oracle: recursive-CTE
# reachability + MIN label — different algorithm, same fixpoint.
# Output covers nodes with >= 1 edge (isolated suppliers have no component
# identity in an edge-list graph).
# ---------------------------------------------------------------------------
@query(
    "gr_components",
    """
    WITH RECURSIVE e AS (
      SELECT a.l_suppkey AS u, b.l_suppkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.l_orderkey) >= 5),
    edges AS (SELECT u AS a, v AS b FROM e UNION SELECT v, u FROM e),
    reach AS (
      SELECT DISTINCT a AS id, a AS r FROM edges
      UNION
      SELECT reach.id, e2.b FROM reach JOIN edges e2 ON reach.r = e2.a),
    comp AS (SELECT id, MIN(r) AS c FROM reach GROUP BY id)
    SELECT id AS node, c AS component_id,
           CAST(COUNT(*) OVER (PARTITION BY c) AS BIGINT) AS component_size
    FROM comp ORDER BY node
    """,
)
def gr_components(spark, sf_dir):
    from ..operators.graph import cooccurrence_edges

    li = t(spark, sf_dir, "lineitem", restore=True).select("l_orderkey", "l_suppkey")
    edges = cooccurrence_edges(li, "l_orderkey", "l_suppkey", min_shared=5)
    return _components_from_edges(edges)


def _components_from_edges(edges):
    from ..llmdata.dedup import connected_components

    cc = connected_components(edges, id_a="src", id_b="dst")
    w = Window.partitionBy("cluster_id")
    return (
        cc.select(
            F.col("doc_id").alias("node"),
            F.col("cluster_id").alias("component_id"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("component_size"),
        )
        .orderBy("node")
    )
