"""Relational + scalar operator queries (SURVEY §2.2–§2.8) over the driver
fixtures, each with a DuckDB oracle. Section tags (P/J/A/W/O/U/§2.8) refer to
the SURVEY §2 inventory rows the query exercises.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..functions.macros import federal_fiscal_year, season, surrogate_key
from ..operators.aggregates import privacy_round
from ..operators.joins import anti_join, dim_enrich_join, interval_join, map_lookup
from ..operators.projections import null_out_of_range
from ..operators.sorts import case_rank, top_k_by_group
from ..operators.upsert import upsert_last_wins
from ..operators.windows import lag_over, lead_over, rolling_time_count, row_number_code, trailing_mean, trend_label
from .registry import davg, dsum, query, t


# ---------------------------------------------------------------------------
# A1/A2 — pricing summary rollup (TPC-H Q1 shape: the reference's daily
# per-station rollup A1, weather_impacts.sql:35-72)
# ---------------------------------------------------------------------------
@query(
    "a1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)/COUNT(l_quantity) * 1000000.0) / 1000000.0 AS avg_qty,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE)/COUNT(l_discount) * 1000000.0) / 1000000.0 AS avg_disc,
           COUNT(*) AS count_order,
           COUNT(CASE WHEN l_quantity > 45 THEN 1 END) AS high_qty_orders,
           MAX(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS has_deep_discount
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem", restore=True).filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc_price.cast("decimal(28,6)")).cast("double").alias("sum_disc_price"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_discount", scale=6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
        F.count(F.when(F.col("l_quantity") > 45, 1)).alias("high_qty_orders"),
        F.max(F.when(F.col("l_discount") >= 0.05, 1).otherwise(0)).alias("has_deep_discount"),
    )


# ---------------------------------------------------------------------------
# P1 — projection + rename + casts (stg_* SELECT lists)
# ---------------------------------------------------------------------------
@query(
    "p1_project_cast",
    """
    SELECT l_orderkey AS order_key, l_linenumber AS line_number,
           CAST(FLOOR(l_quantity) AS INT) AS qty_int,
           UPPER(l_returnflag) AS return_flag,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    """,
)
def p1_project_cast(spark, sf_dir):
    # restore=False: a pure projection has no shuffle to feed — the starved-
    # scan repartition would be its ONLY exchange, pure overhead at any scale
    # (the plan guard test_projection_queries_stay_codegen pins this).
    return t(spark, sf_dir, "lineitem", restore=False).select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.floor("l_quantity").cast("int").alias("qty_int"),
        F.upper("l_returnflag").alias("return_flag"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


# ---------------------------------------------------------------------------
# P2+P3 — NOT NULL key filter + sliding date-range predicate (pinned clock)
# ---------------------------------------------------------------------------
@query(
    "p3_recent_events",
    """
    SELECT event_type, COUNT(*) AS event_count,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_id IS NOT NULL AND user_id IS NOT NULL
      AND ts >= TIMESTAMP '2024-01-18 00:00:00'
    GROUP BY event_type
    """,
)
def p3_recent_events(spark, sf_dir):
    # as_of 2024-02-01 minus 14 days = 2024-01-18 (clock-injected P3 predicate)
    e = t(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull()
        & F.col("user_id").isNotNull()
        & (F.col("ts") >= F.lit("2024-01-18 00:00:00"))
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_count"), dsum("value").alias("total_value")
    )


# ---------------------------------------------------------------------------
# P4+P5 — enum filter + config-driven range filter
# ---------------------------------------------------------------------------
@query(
    "p4_enum_filter",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_totalprice BETWEEN 1000 AND 400000
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def p4_enum_filter(spark, sf_dir):
    from ..operators.projections import config_filter

    o = config_filter(
        t(spark, sf_dir, "orders"),
        {"o_orderpriority": {"in": ["1-URGENT", "2-HIGH"]}, "o_totalprice": {"min": 1000, "max": 400000}},
    )
    return o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total_price")
    )


# ---------------------------------------------------------------------------
# P7 — range-validating projection (null outside range)
# ---------------------------------------------------------------------------
@query(
    "p7_range_validate",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity BETWEEN 5 AND 45 THEN ROUND(l_quantity, 0) END AS qty_validated,
           CASE WHEN l_discount BETWEEN 0.0 AND 0.08 THEN ROUND(l_discount, 2) END AS discount_validated
    FROM lineitem
    """,
)
def p7_range_validate(spark, sf_dir):
    # restore=False: pure projection — see p1_project_cast.
    l = t(spark, sf_dir, "lineitem", restore=False)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        null_out_of_range("l_quantity", 5, 45, scale=0).alias("qty_validated"),
        null_out_of_range("l_discount", 0.0, 0.08, scale=2).alias("discount_validated"),
    )


# ---------------------------------------------------------------------------
# J1 — dim-enrichment broadcast join chain (customer ⟕ nation ⟕ region)
# ---------------------------------------------------------------------------
@query(
    "j1_dim_enrich",
    """
    SELECT r.r_name AS region_name, COUNT(*) AS customer_count,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_acctbal,
           ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,4))) AS DOUBLE)/COUNT(c.c_acctbal) * 1000000.0) / 1000000.0 AS avg_acctbal
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j1_dim_enrich(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    enriched = dim_enrich_join(
        dim_enrich_join(c, n, c["c_nationkey"] == n["n_nationkey"]),
        r,
        n["n_regionkey"] == r["r_regionkey"],
    )
    return enriched.groupBy(F.col("r_name").alias("region_name")).agg(
        F.count(F.lit(1)).alias("customer_count"),
        dsum("c_acctbal").alias("total_acctbal"),
        davg("c_acctbal").alias("avg_acctbal"),
    )


# ---------------------------------------------------------------------------
# J2 — composite-key fact join + yearly agg (disaster_analytics.sql:132-135)
# ---------------------------------------------------------------------------
@query(
    "j2_fact_join_yearly",
    """
    SELECT CAST(YEAR(o.o_orderdate) AS INT) AS order_year, o.o_orderstatus,
           COUNT(*) AS line_count,
           CAST(SUM(CAST(l.l_extendedprice*(1-l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY order_year, o.o_orderstatus
    """,
)
def j2_fact_join_yearly(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    joined = l.join(o, l["l_orderkey"] == o["o_orderkey"])
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year"), "o_orderstatus"
    ).agg(
        F.count(F.lit(1)).alias("line_count"),
        F.sum(rev.cast("decimal(28,6)")).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# J3 — interval/range join with equi carrier (weather_impacts.sql:159-165):
# purchases within 1 hour of a click by the same user, null-extending
# ---------------------------------------------------------------------------
@query(
    "j3_interval_join",
    """
    SELECT a.user_id, COUNT(DISTINCT a.event_id) AS n_clicks, COUNT(b.ts) AS n_conversions
    FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') a
    LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    GROUP BY a.user_id
    """,
)
def j3_interval_join(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
    )
    a = clicks.withColumnRenamed("ts", "c_ts")
    cond = (
        (a["user_id"] == purch["p_user"])
        & (purch["p_ts"] >= a["c_ts"])
        & (purch["p_ts"] <= a["c_ts"] + F.expr("INTERVAL 1 HOUR"))
    )
    # equi key (user_id) carries the hash join; the time range is a residual
    # predicate — same plan shape as interval_join()
    joined = a.join(purch, cond, "left")
    return joined.groupBy("user_id").agg(
        F.countDistinct("event_id").alias("n_clicks"), F.count("p_ts").alias("n_conversions")
    )


# ---------------------------------------------------------------------------
# J5 — anti join: customers with no 'P'-status order
# ---------------------------------------------------------------------------
@query(
    "j5_anti_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def j5_anti_join(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return anti_join(
        c, o.select(F.col("o_custkey").alias("c_custkey")), ["c_custkey"]
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# J8 — literal dict-map lookup join (processed_data.py:61-89)
# ---------------------------------------------------------------------------
@query(
    "j8_map_lookup",
    """
    SELECT CASE o_orderpriority
             WHEN '1-URGENT' THEN 'critical' WHEN '2-HIGH' THEN 'high'
             WHEN '3-MEDIUM' THEN 'normal' ELSE 'low' END AS priority_band,
           COUNT(*) AS n_orders
    FROM orders GROUP BY priority_band
    """,
)
def j8_map_lookup(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    band = map_lookup(
        "o_orderpriority",
        {"1-URGENT": "critical", "2-HIGH": "high", "3-MEDIUM": "normal"},
        default="low",
    )
    return o.groupBy(band.alias("priority_band")).agg(F.count(F.lit(1)).alias("n_orders"))


# ---------------------------------------------------------------------------
# A4 — privacy-thresholded aggregation (HAVING >= 5 + ROUND(x, -3))
# ---------------------------------------------------------------------------
@query(
    "a4_privacy_agg",
    """
    SELECT o_custkey, COUNT(*) AS group_size,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE), -3) AS total_rounded
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
    """,
)
def a4_privacy_agg(spark, sf_dir):
    from ..operators.aggregates import privacy_threshold_agg

    o = t(spark, sf_dir, "orders")
    agg = privacy_threshold_agg(
        o,
        ["o_custkey"],
        [F.sum(F.col("o_totalprice").cast("decimal(28,2)")).cast("double").alias("__total")],
        min_group_size=5,
    )
    return agg.select(
        "o_custkey", "group_size", F.round("__total", -3).alias("total_rounded")
    )


# ---------------------------------------------------------------------------
# A5 — COUNT DISTINCT (exact; approx_count_distinct is the 100 TB variant)
# ---------------------------------------------------------------------------
@query(
    "a5_count_distinct",
    """
    SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS distinct_suppliers,
           COUNT(DISTINCT l_partkey) AS distinct_parts, COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a5_count_distinct(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("distinct_suppliers"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# A6/U2 — union-of-aggregates profile scan (data_quality_metrics.sql:7-121)
# ---------------------------------------------------------------------------
@query(
    "a6_union_profile",
    """
    SELECT 'lineitem' AS table_name, COUNT(*) AS row_count,
           COUNT(DISTINCT (l_orderkey, l_linenumber)) AS distinct_keys FROM lineitem
    UNION ALL
    SELECT 'orders', COUNT(*), COUNT(DISTINCT o_orderkey) FROM orders
    UNION ALL
    SELECT 'customer', COUNT(*), COUNT(DISTINCT c_custkey) FROM customer
    """,
)
def a6_union_profile(spark, sf_dir):
    from ..operators.aggregates import union_of_aggregates

    l = t(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("row_count"),
        F.countDistinct("l_orderkey", "l_linenumber").alias("distinct_keys"),
    ).select(F.lit("lineitem").alias("table_name"), "row_count", "distinct_keys")
    o = t(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("row_count"), F.countDistinct("o_orderkey").alias("distinct_keys")
    ).select(F.lit("orders").alias("table_name"), "row_count", "distinct_keys")
    c = t(spark, sf_dir, "customer").agg(
        F.count(F.lit(1)).alias("row_count"), F.countDistinct("c_custkey").alias("distinct_keys")
    ).select(F.lit("customer").alias("table_name"), "row_count", "distinct_keys")
    return union_of_aggregates([l, o, c])


# ---------------------------------------------------------------------------
# A10 + §2.8 hash — surrogate keys (md5 concat)
# ---------------------------------------------------------------------------
@query(
    "a10_surrogate_key",
    """
    SELECT md5(concat_ws('_', n.n_name, CAST(YEAR(o.o_orderdate) AS INT))) AS analytics_id,
           n.n_name AS nation_name, CAST(YEAR(o.o_orderdate) AS INT) AS order_year,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, order_year
    """,
)
def a10_surrogate_key(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    joined = o.join(c, o["o_custkey"] == c["c_custkey"]).join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    )
    agg = joined.groupBy(
        F.col("n_name").alias("nation_name"),
        F.year("o_orderdate").cast("int").alias("order_year"),
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    return agg.select(
        surrogate_key("nation_name", "order_year").alias("analytics_id"),
        "nation_name",
        "order_year",
        "n_orders",
    )


# ---------------------------------------------------------------------------
# W1 — LAG year-over-year trend (disaster_analytics.sql:108-111,143-158)
# ---------------------------------------------------------------------------
@query(
    "w1_lag_yoy",
    """
    WITH yearly AS (
      SELECT o_orderpriority, CAST(YEAR(o_orderdate) AS INT) AS order_year, COUNT(*) AS n_orders
      FROM orders GROUP BY 1, 2)
    SELECT o_orderpriority, order_year, n_orders,
           LAG(n_orders, 1) OVER (PARTITION BY o_orderpriority ORDER BY order_year) AS prev_year_orders,
           ROUND((n_orders - LAG(n_orders, 1) OVER (PARTITION BY o_orderpriority ORDER BY order_year))
                 * 100.0 / LAG(n_orders, 1) OVER (PARTITION BY o_orderpriority ORDER BY order_year), 4) AS yoy_pct,
           CASE
             WHEN ROUND((n_orders - LAG(n_orders, 1) OVER (PARTITION BY o_orderpriority ORDER BY order_year))
                 * 100.0 / LAG(n_orders, 1) OVER (PARTITION BY o_orderpriority ORDER BY order_year), 4) > 10 THEN 'INCREASING'
             WHEN ROUND((n_orders - LAG(n_orders, 1) OVER (PARTITION BY o_orderpriority ORDER BY order_year))
                 * 100.0 / LAG(n_orders, 1) OVER (PARTITION BY o_orderpriority ORDER BY order_year), 4) < -10 THEN 'DECREASING'
             WHEN LAG(n_orders, 1) OVER (PARTITION BY o_orderpriority ORDER BY order_year) IS NOT NULL THEN 'STABLE'
           END AS trend
    FROM yearly
    """,
)
def w1_lag_yoy(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_orderpriority", F.year("o_orderdate").cast("int").alias("order_year")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    prev = lag_over("n_orders", ["o_orderpriority"], ["order_year"])
    yoy = F.round((F.col("n_orders") - prev) * 100.0 / prev, 4)
    return (
        yearly.withColumn("prev_year_orders", prev)
        .withColumn("yoy_pct", yoy)
        .withColumn("trend", trend_label(F.col("yoy_pct")))
    )


# ---------------------------------------------------------------------------
# W2 — ROW_NUMBER public-code generator (public_disasters.sql:44)
# ---------------------------------------------------------------------------
@query(
    "w2_row_number_code",
    """
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
           concat('ORD-', CAST(o_custkey AS VARCHAR), '-',
                  lpad(CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS VARCHAR), 3, '0')) AS public_code
    FROM orders
    """,
)
def w2_row_number_code(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    seq = row_number_code(["o_custkey"], ["o_orderdate", "o_orderkey"])
    return o.select(
        "o_orderkey",
        "o_custkey",
        seq.alias("order_seq"),
        F.concat(
            F.lit("ORD-"),
            F.col("o_custkey").cast("string"),
            F.lit("-"),
            F.lpad(seq.cast("string"), 3, "0"),
        ).alias("public_code"),
    )


# ---------------------------------------------------------------------------
# W3 — rolling 90-day time-range count (ml_assets.py:81-83 30D analog)
# ---------------------------------------------------------------------------
@query(
    "w3_rolling_count",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                          RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) - 1 AS prior_orders_90d
    FROM orders
    """,
)
def w3_rolling_count(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return rolling_time_count(
        o, ["o_custkey"], "o_orderdate", days=90, out_col="prior_orders_90d"
    ).select("o_orderkey", "o_custkey", "o_orderdate", "prior_orders_90d")


# ---------------------------------------------------------------------------
# W4 — shifted trailing mean over 5 rows (ml_assets.py:86-88)
# ---------------------------------------------------------------------------
@query(
    "w4_trailing_mean",
    """
    SELECT o_orderkey, o_custkey,
           ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), 6) AS trailing_avg_price
    FROM orders
    """,
)
def w4_trailing_mean(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    out = trailing_mean(
        o, "o_totalprice", ["o_custkey"], ["o_orderdate", "o_orderkey"], n_rows=5,
        out_col="trailing_avg_price",
    )
    return out.select(
        "o_orderkey", "o_custkey", F.round("trailing_avg_price", 6).alias("trailing_avg_price")
    )


# ---------------------------------------------------------------------------
# W5 — LEAD targets (ml_assets.py:146-151)
# ---------------------------------------------------------------------------
@query(
    "w5_lead_target",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           LEAD(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order_date,
           date_diff('day', CAST(o_orderdate AS DATE),
                     CAST(LEAD(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE)) AS days_to_next,
           CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                     CAST(LEAD(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE)) <= 30
                THEN 1 ELSE 0 END AS next_order_30d
    FROM orders
    """,
)
def w5_lead_target(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    nxt = lead_over("o_orderdate", ["o_custkey"], ["o_orderdate", "o_orderkey"])
    days = F.datediff(nxt, F.col("o_orderdate"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        nxt.alias("next_order_date"),
        days.alias("days_to_next"),
        F.when(days <= 30, 1).otherwise(0).alias("next_order_30d"),
    )


# ---------------------------------------------------------------------------
# O2+O3 — custom CASE sort + LIMIT (public_assets.py:142-149)
# ---------------------------------------------------------------------------
@query(
    "o2_case_sort_limit",
    """
    SELECT o_orderkey, o_orderpriority, o_orderdate,
           CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                WHEN '3-MEDIUM' THEN 3 ELSE 4 END AS priority_rank
    FROM orders
    ORDER BY priority_rank, o_orderdate DESC, o_orderkey
    LIMIT 100
    """,
)
def o2_case_sort_limit(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    rank = case_rank("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"], default_rank=4)
    return (
        o.select("o_orderkey", "o_orderpriority", "o_orderdate", rank.alias("priority_rank"))
        .orderBy(F.asc("priority_rank"), F.desc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# O4 — top-k groups by aggregate (public_resources.py:563-572)
# ---------------------------------------------------------------------------
@query(
    "o4_topk_nations",
    """
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY revenue DESC, nation_name LIMIT 10
    """,
)
def o4_topk_nations(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    joined = o.join(c, o["o_custkey"] == c["c_custkey"]).join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    ).select(F.col("n_name").alias("nation_name"), "o_totalprice")
    return top_k_by_group(
        joined, ["nation_name"], dsum("o_totalprice"), k=10, metric_name="revenue"
    )


# ---------------------------------------------------------------------------
# U1/U3 — schema-aligned UNION ALL (emergency_events.sql:15-81)
# ---------------------------------------------------------------------------
@query(
    "u1_union_entities",
    """
    SELECT 'customer' AS entity_type, c_custkey AS entity_key, c_name AS entity_name,
           c_acctbal AS acct_balance FROM customer
    UNION ALL
    SELECT 'supplier', s_suppkey, s_name, s_acctbal FROM supplier
    """,
)
def u1_union_entities(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("entity_type"),
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.col("c_acctbal").alias("acct_balance"),
    )
    s = t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("entity_type"),
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.col("s_acctbal").alias("acct_balance"),
    )
    return c.unionByName(s)


# ---------------------------------------------------------------------------
# §2.8 strings — upper/trim/lower/concat/substring/lpad/length/like/regexp
# ---------------------------------------------------------------------------
@query(
    "s1_string_funcs",
    """
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           lower(trim(p_brand)) AS brand_lower,
           substring(p_type, 1, 5) AS type_prefix,
           lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
           length(p_name) AS name_len,
           concat_ws('|', p_brand, p_type) AS brand_type,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CASE WHEN p_type LIKE '%ECO%' THEN 1 ELSE 0 END AS is_economy
    FROM part
    """,
)
def s1_string_funcs(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower(F.trim(F.col("p_brand"))).alias("brand_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.when(F.col("p_type").like("%ECO%"), 1).otherwise(0).alias("is_economy"),
    )


# ---------------------------------------------------------------------------
# §2.8 dates — year/month/quarter/doy/datediff/date_format/fiscal/season
# ---------------------------------------------------------------------------
@query(
    "s2_date_funcs",
    """
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(dayofyear(o_orderdate) AS INT) AS order_doy,
           strftime(o_orderdate, '%Y%m%d') AS date_key,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_before_2000,
           CAST(YEAR(o_orderdate) + CASE WHEN MONTH(o_orderdate) >= 10 THEN 1 ELSE 0 END AS INT) AS fiscal_year,
           CASE WHEN MONTH(o_orderdate) IN (12,1,2) THEN 'WINTER'
                WHEN MONTH(o_orderdate) IN (3,4,5) THEN 'SPRING'
                WHEN MONTH(o_orderdate) IN (6,7,8) THEN 'SUMMER'
                ELSE 'FALL' END AS order_season,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders
    """,
)
def s2_date_funcs(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.dayofyear("o_orderdate").cast("int").alias("order_doy"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("date_key"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_before_2000"
        ),
        federal_fiscal_year("o_orderdate").alias("fiscal_year"),
        season("o_orderdate").alias("order_season"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
    )


# ---------------------------------------------------------------------------
# §2.8 math/conditional — round/abs/least/greatest/coalesce/nullif-ratio
# ---------------------------------------------------------------------------
@query(
    "s3_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS net_price,
           abs(l_quantity - 25) AS qty_dev,
           least(l_quantity, 30.0) AS qty_capped,
           greatest(l_discount, 0.01) AS disc_floor,
           coalesce(l_tax, 0.0) AS tax_or_zero,
           round(l_extendedprice / nullif(l_discount, 0), 4) AS price_per_discount
    FROM lineitem
    """,
)
def s3_math_funcs(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem", restore=True)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        # decimal arithmetic before rounding: Spark's round(double) uses the
        # shortest-repr decimal while other engines round the exact binary
        # value — products of 2-decimal factors land exactly on .xx5
        # boundaries, so round in exact decimal space
        F.round(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")),
            2,
        ).cast("double").alias("net_price"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.least(F.col("l_quantity"), F.lit(30.0)).alias("qty_capped"),
        F.greatest(F.col("l_discount"), F.lit(0.01)).alias("disc_floor"),
        F.coalesce(F.col("l_tax"), F.lit(0.0)).alias("tax_or_zero"),
        F.round(F.col("l_extendedprice") / F.nullif(F.col("l_discount"), F.lit(0)), 4).alias(
            "price_per_discount"
        ),
    )


# ---------------------------------------------------------------------------
# §2.8 conditional ladders — CASE risk banding (stg_noaa_weather.sql:60-65)
# ---------------------------------------------------------------------------
@query(
    "s4_case_ladder",
    """
    SELECT CASE WHEN value >= 400 THEN 'CRITICAL' WHEN value >= 200 THEN 'HIGH'
                WHEN value >= 50 THEN 'MEDIUM' ELSE 'LOW' END AS risk_level,
           CASE WHEN value >= 400 THEN 'CATASTROPHIC' WHEN value >= 300 THEN 'MAJOR'
                WHEN value >= 200 THEN 'MODERATE' WHEN value >= 100 THEN 'MINOR'
                ELSE 'MINIMAL' END AS impact_category,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY risk_level, impact_category
    """,
)
def s4_case_ladder(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    v = F.col("value")
    risk = (
        F.when(v >= 400, "CRITICAL").when(v >= 200, "HIGH").when(v >= 50, "MEDIUM").otherwise("LOW")
    )
    impact = (
        F.when(v >= 400, "CATASTROPHIC")
        .when(v >= 300, "MAJOR")
        .when(v >= 200, "MODERATE")
        .when(v >= 100, "MINOR")
        .otherwise("MINIMAL")
    )
    return e.groupBy(risk.alias("risk_level"), impact.alias("impact_category")).agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value")
    )


# ---------------------------------------------------------------------------
# §2.8 JSON — get_json_object over the events props column
# ---------------------------------------------------------------------------
@query(
    "s5_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           COUNT(json_extract_string(props, '$.k')) AS n_with_k
    FROM events GROUP BY event_type
    """,
)
def s5_json_extract(spark, sf_dir):
    e = t(spark, sf_dir, "events", restore=True)
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_with_k")
    )


# ---------------------------------------------------------------------------
# S10 — keyed upsert (last-wins) semantics (resources/database.py:86-138)
# ---------------------------------------------------------------------------
@query(
    "s10_upsert_last_wins",
    """
    WITH existing AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version, 0 AS src FROM orders),
    incoming AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice * 1.1 AS o_totalprice, 2 AS version, 1 AS src
      FROM orders WHERE o_orderkey % 3 = 0),
    merged AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC, src DESC) AS rn
      FROM (SELECT * FROM existing UNION ALL SELECT * FROM incoming))
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_after_upsert
    FROM merged WHERE rn = 1 GROUP BY o_orderstatus
    """,
)
def s10_upsert_last_wins(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    existing = o.withColumn("version", F.lit(1))
    incoming = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn("version", F.lit(2))
    )
    merged = upsert_last_wins(existing, incoming, ["o_orderkey"], "version")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double").alias("total_after_upsert"),
    )


# ---------------------------------------------------------------------------
# S13 — retention filter (database.py:211-226)
# ---------------------------------------------------------------------------
@query(
    "s13_retention",
    """
    SELECT event_type, COUNT(*) AS retained_events
    FROM events WHERE ts >= TIMESTAMP '2024-01-12 00:00:00'
    GROUP BY event_type
    """,
)
def s13_retention(spark, sf_dir):
    from ..audit import retention_filter
    from ..clock import Clock
    from datetime import datetime

    e = t(spark, sf_dir, "events")
    kept = retention_filter(e, "ts", retention_days=20, clock=Clock(datetime(2024, 2, 1)))
    return kept.groupBy("event_type").agg(F.count(F.lit(1)).alias("retained_events"))
