"""Second tranche of SURVEY §2 operator queries (P6, A3, A7, percentiles,
J4, J6, O1, SCD2, Q9, §2.12 macro functions), each with a DuckDB oracle.
Section tags refer to the SURVEY §2 inventory rows the query exercises.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..clock import DEFAULT_CLOCK
from ..functions.macros import (
    alert_priority,
    categorize_disaster_impact,
    event_severity,
    mask_sensitive,
    standardize_state_code,
)
from ..operators.aggregates import conditional_count, windowed_agg
from ..operators.projections import active_alert_predicate
from .registry import davg, dsum, query, t

_AS_OF = DEFAULT_CLOCK.iso_ts()


# ---------------------------------------------------------------------------
# P6 — active/expired predicate with null handling (public_assets.py:140-141)
# ---------------------------------------------------------------------------
@query(
    "p6_active_alerts",
    f"""
    WITH alerts AS (
      SELECT event_id, event_type, ts AS effective_ts,
             CASE WHEN event_type = 'error' THEN NULL
                  ELSE ts + INTERVAL 5 DAY END AS expires_ts
      FROM events)
    SELECT event_type, COUNT(*) AS active_alerts
    FROM alerts
    WHERE expires_ts > TIMESTAMP '{_AS_OF}' OR expires_ts IS NULL
       OR effective_ts >= TIMESTAMP '{_AS_OF}' - INTERVAL 24 HOUR
    GROUP BY event_type
    """,
)
def p6_active_alerts(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    alerts = e.select(
        "event_id",
        "event_type",
        F.col("ts").alias("effective_ts"),
        F.when(F.col("event_type") != "error", F.col("ts") + F.expr("INTERVAL 5 DAYS")).alias(
            "expires_ts"
        ),
    )
    active = alerts.filter(
        active_alert_predicate("effective_ts", "expires_ts", DEFAULT_CLOCK.timestamp())
    )
    return active.groupBy("event_type").agg(F.count(F.lit(1)).alias("active_alerts"))


# ---------------------------------------------------------------------------
# A2+A3 — multi-dim yearly trend aggregation with conditional counts
# (disaster_analytics.sql:52-76)
# ---------------------------------------------------------------------------
@query(
    "a3_yearly_trend",
    """
    SELECT o_orderstatus, CAST(YEAR(o_orderdate) AS INT) AS order_year, o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_large,
           COUNT(CASE WHEN MONTH(o_orderdate) IN (6,7,8) THEN 1 END) AS n_summer,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE)/COUNT(o_totalprice) * 1000000.0) / 1000000.0 AS avg_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderstatus, order_year, o_orderpriority
    """,
)
def a3_yearly_trend(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        "o_orderstatus",
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        conditional_count(F.col("o_totalprice") > 200000).alias("n_large"),
        conditional_count(F.month("o_orderdate").isin(6, 7, 8)).alias("n_summer"),
        davg("o_totalprice").alias("avg_price"),
        F.max("o_totalprice").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# A7 — generic config-driven aggregation with a time bucket
# (ops/data_processing_ops.py:221-283); same shape serves streaming
# ---------------------------------------------------------------------------
@query(
    "a7_config_window_agg",
    """
    SELECT event_type,
           time_bucket(INTERVAL '6 hours', ts) AS window_start,
           time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours' AS window_end,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)/COUNT(value) * 1000000.0) / 1000000.0 AS avg_value,
           MAX(value) AS max_value,
           COUNT(*) AS record_count
    FROM events GROUP BY event_type, window_start, window_end
    """,
)
def a7_config_window_agg(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    out = windowed_agg(
        e,
        ["event_type"],
        "ts",
        "6 hours",
        {"avg_value": davg("value"), "max_value": F.max("value")},
    )
    return out.select(
        "event_type", "window_start", "window_end", "avg_value", "max_value", "record_count"
    )


# ---------------------------------------------------------------------------
# A5 note / metrics surface — exact percentiles (p50/p95/p99 from
# ops/public_ops.py:543-549; percentile_approx is the 100 TB variant)
# ---------------------------------------------------------------------------
@query(
    "a11_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a11_percentiles(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem", restore=True)
    # one percentile buffer evaluating all three fractions (single sort per
    # group) instead of three independent exact-percentile aggregates
    pcts = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    agg = l.groupBy("l_returnflag").agg(pcts.alias("__p"))
    return agg.select(
        "l_returnflag",
        F.round(F.element_at("__p", 1), 4).alias("p50_price"),
        F.round(F.element_at("__p", 2), 4).alias("p95_price"),
        F.round(F.element_at("__p", 3), 4).alias("p99_price"),
    )


# ---------------------------------------------------------------------------
# J4 — date-key left join of two daily aggregates
# (public_weather_alerts.sql:109-112)
# ---------------------------------------------------------------------------
@query(
    "j4_date_key_join",
    """
    WITH od AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS day_revenue
      FROM orders GROUP BY 1),
    ld AS (
      SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_shipments
      FROM lineitem GROUP BY 1)
    SELECT od.d AS activity_date, od.n_orders, od.day_revenue,
           COALESCE(ld.n_shipments, 0) AS n_shipments
    FROM od LEFT JOIN ld ON od.d = ld.d
    """,
)
def j4_date_key_join(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    od = o.groupBy(F.col("o_orderdate").cast("date").alias("activity_date")).agg(
        F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("day_revenue")
    )
    ld = l.groupBy(F.col("l_shipdate").cast("date").alias("activity_date")).agg(
        F.count(F.lit(1)).alias("n_shipments")
    )
    joined = od.join(ld, "activity_date", "left")
    return joined.select(
        "activity_date",
        "n_orders",
        "day_revenue",
        F.coalesce("n_shipments", F.lit(0)).alias("n_shipments"),
    )


# ---------------------------------------------------------------------------
# J6 — inner consistency join + mismatch filter
# (tests/data_quality_tests.yml:327-335)
# ---------------------------------------------------------------------------
@query(
    "j6_consistency_join",
    """
    SELECT o.o_orderstatus, COUNT(*) AS mismatched_lines
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) < CAST(o.o_orderdate AS DATE)
    GROUP BY o.o_orderstatus
    """,
)
def j6_consistency_join(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    joined = l.join(o, l["l_orderkey"] == o["o_orderkey"]).filter(
        F.col("l_shipdate").cast("date") < F.col("o_orderdate").cast("date")
    )
    return joined.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("mismatched_lines"))


# ---------------------------------------------------------------------------
# O1+O3 — recency ordering + LIMIT (assets/public_assets.py:60)
# ---------------------------------------------------------------------------
@query(
    "o1_recent_limit",
    """
    SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
    FROM events
    ORDER BY ts DESC, event_id
    LIMIT 50
    """,
)
def o1_recent_limit(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return (
        e.select("event_id", "event_type", "ts", "value")
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# SCD2 (dbt snapshot, strategy='timestamp') — order-status history as
# (valid_from, valid_to, is_current) versions per customer
# (snapshots/disaster_declarations_snapshot.sql:4-13)
# ---------------------------------------------------------------------------
@query(
    "scd2_status_history",
    """
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             LAG(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_status
      FROM orders),
    changes AS (
      SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from, o_orderkey
      FROM ordered WHERE prev_status IS NULL OR prev_status != o_orderstatus),
    versions AS (
      SELECT o_custkey, o_orderstatus, valid_from,
             LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY valid_from, o_orderkey) AS valid_to
      FROM changes)
    SELECT o_custkey, o_orderstatus, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM versions
    """,
)
def scd2_status_history(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.withColumn("prev_status", F.lag("o_orderstatus").over(w))
        .filter(F.col("prev_status").isNull() | (F.col("prev_status") != F.col("o_orderstatus")))
        .select("o_custkey", "o_orderstatus", F.col("o_orderdate").alias("valid_from"), "o_orderkey")
    )
    wv = Window.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    return changes.select(
        "o_custkey",
        "o_orderstatus",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


# ---------------------------------------------------------------------------
# Q9 — composite weighted quality report (data_quality_ops.py:738-872,
# weights ≈ jobs/quality_jobs.py:125-132), one pass over events
# ---------------------------------------------------------------------------
@query(
    "q9_quality_report",
    f"""
    WITH m AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(user_id) * 1.0 / COUNT(*) AS c_user,
             COUNT(event_type) * 1.0 / COUNT(*) AS c_type,
             COUNT(value) * 1.0 / COUNT(*) AS c_value,
             COUNT(CASE WHEN value BETWEEN 0 AND 1000 THEN 1 END) * 1.0 / COUNT(value) AS validity,
             COUNT(DISTINCT event_id) * 1.0 / COUNT(*) AS consistency,
             CAST(FLOOR((epoch(TIMESTAMP '{_AS_OF}') - epoch(MAX(CAST(ts AS TIMESTAMP)))) / 3600) AS BIGINT) AS staleness_hours
      FROM events),
    s AS (
      SELECT n_rows,
             ROUND((c_user + c_type + c_value) / 3, 6) AS completeness,
             ROUND(validity, 6) AS validity,
             ROUND(consistency, 6) AS consistency,
             CASE WHEN staleness_hours <= 72 THEN 1.0 ELSE 0.0 END AS freshness,
             staleness_hours
      FROM m)
    SELECT n_rows, completeness, validity, consistency, freshness, staleness_hours,
           ROUND(0.4*completeness + 0.3*validity + 0.2*consistency + 0.1*freshness, 6) AS overall_score,
           CASE WHEN 0.4*completeness + 0.3*validity + 0.2*consistency + 0.1*freshness >= 0.95 THEN 'EXCELLENT'
                WHEN 0.4*completeness + 0.3*validity + 0.2*consistency + 0.1*freshness >= 0.85 THEN 'GOOD'
                WHEN 0.4*completeness + 0.3*validity + 0.2*consistency + 0.1*freshness >= 0.70 THEN 'FAIR'
                ELSE 'CRITICAL' END AS status
    FROM s
    """,
)
def q9_quality_report(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    m = e.agg(
        n.alias("n_rows"),
        (F.count("user_id") / n).alias("c_user"),
        (F.count("event_type") / n).alias("c_type"),
        (F.count("value") / n).alias("c_value"),
        (F.count(F.when(F.col("value").between(0, 1000), 1)) / F.count("value")).alias(
            "validity_raw"
        ),
        (F.countDistinct("event_id") / n).alias("consistency_raw"),
        (
            F.floor(
                (
                    F.unix_timestamp(DEFAULT_CLOCK.timestamp())
                    - F.unix_timestamp(F.max("ts"))
                )
                / 3600
            )
        ).alias("staleness_hours"),
    )
    s = m.select(
        "n_rows",
        F.round((F.col("c_user") + F.col("c_type") + F.col("c_value")) / 3, 6).alias(
            "completeness"
        ),
        F.round("validity_raw", 6).alias("validity"),
        F.round("consistency_raw", 6).alias("consistency"),
        F.when(F.col("staleness_hours") <= 72, 1.0).otherwise(0.0).alias("freshness"),
        "staleness_hours",
    )
    overall = (
        0.4 * F.col("completeness")
        + 0.3 * F.col("validity")
        + 0.2 * F.col("consistency")
        + 0.1 * F.col("freshness")
    )
    return s.select(
        "n_rows",
        "completeness",
        "validity",
        "consistency",
        "freshness",
        "staleness_hours",
        F.round(overall, 6).alias("overall_score"),
        F.when(overall >= 0.95, "EXCELLENT")
        .when(overall >= 0.85, "GOOD")
        .when(overall >= 0.70, "FAIR")
        .otherwise("CRITICAL")
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape — shipping priority: selective dim filter → fact join →
# agg → top-k. The classic scan-join-agg pipeline end-to-end.
# ---------------------------------------------------------------------------
@query(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15 00:00:00"))
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15 00:00:00"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev.cast("decimal(28,6)")).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape — local supplier volume: 6-way join (2 broadcast dims) with
# a same-nation residual predicate, grouped revenue.
# ---------------------------------------------------------------------------
@query(
    "tpch_q5_local_supplier",
    """
    SELECT n.n_name AS nation_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY nation_name
    """,
)
def tpch_q5_local_supplier(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return joined.groupBy(F.col("n_name").alias("nation_name")).agg(
        F.sum(rev.cast("decimal(28,6)")).cast("double").alias("revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape — order priority checking: the LEFT SEMI join (EXISTS).
# Rounds out the join surface next to j5's anti join; the semi join
# deduplicates the fact side before the shuffle reaches the aggregate, so
# no row multiplication ever happens (the 100 TB reason to prefer it over
# join+distinct). Adapted to the fixture schema: "orders with at least one
# returned lineitem" (lineitem has no commit/receipt dates).
# ---------------------------------------------------------------------------
@query(
    "tpch_q4_priority_semi",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_priority_semi(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00"))
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape — customer order-count distribution: outer join with a
# join-condition predicate (not a post-filter — the rejected rows must still
# null-extend), then an aggregation OVER an aggregation. The histogram's
# second groupBy runs on |customers| rows, already reduced by the first.
# ---------------------------------------------------------------------------
@query(
    "tpch_q13_custdist",
    """
    WITH co AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM co GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_custdist(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    co = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"]) & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        co.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape — large-volume orders: HAVING-filtered aggregate joined
# back to its facts. The aggregate runs first and reduces lineitem to the
# handful of qualifying order keys; the join back is keyed on that tiny set,
# which AQE demotes to a broadcast at runtime.
# ---------------------------------------------------------------------------
@query(
    "tpch_q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    SELECT c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def tpch_q18_large_orders(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("qty"))
        .filter(F.col("qty") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(big, o["o_orderkey"] == F.col("big_orderkey"))
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(l.alias("li"), F.col("li.l_orderkey") == o["o_orderkey"])
        .groupBy("c_name", o["o_orderkey"], "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("li.l_quantity").cast("decimal(28,6)")).cast("double").alias("total_qty")
        )
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# §2.12 — scoring macro functions as column expressions
# (calculate_event_severity / categorize_disaster_impact /
#  generate_emergency_alert_priority)
# ---------------------------------------------------------------------------
@query(
    "fn_event_scoring",
    """
    WITH base AS (
      SELECT event_id,
             CASE event_type WHEN 'error' THEN 'HURRICANE' WHEN 'purchase' THEN 'FLOOD'
                  WHEN 'click' THEN 'SEVERE STORM' WHEN 'view' THEN 'WINTER STORM'
                  ELSE 'OTHER' END AS incident_type,
             CAST(FLOOR(value / 25) AS INT) AS duration_days,
             user_id * 20000 AS population,
             CASE WHEN value >= 400 THEN 'CRITICAL' WHEN value >= 200 THEN 'HIGH'
                  WHEN value >= 50 THEN 'MEDIUM' ELSE 'LOW' END AS risk_level,
             CASE WHEN value >= 300 THEN 'Immediate' WHEN value >= 100 THEN 'Expected'
                  ELSE 'Future' END AS urgency,
             CASE user_id % 3 WHEN 0 THEN 'Observed' WHEN 1 THEN 'Likely'
                  ELSE 'Possible' END AS certainty
      FROM events),
    scored AS (
      SELECT event_id, incident_type,
             LEAST(
               CASE WHEN incident_type IN ('HURRICANE','TORNADO','EARTHQUAKE') THEN 8
                    WHEN incident_type IN ('FLOOD','FIRE','WILDFIRE') THEN 6
                    WHEN incident_type IN ('SEVERE STORM','WINTER STORM','SNOWSTORM') THEN 4
                    ELSE 2 END
               + CASE WHEN duration_days > 30 THEN 2 WHEN duration_days > 7 THEN 1 ELSE 0 END
               + CASE WHEN population > 100000 THEN 2 WHEN population > 10000 THEN 1 ELSE 0 END,
               10) AS severity,
             GREATEST(LEAST(
               CASE WHEN risk_level = 'CRITICAL' THEN 1 WHEN risk_level = 'HIGH' THEN 2
                    WHEN risk_level = 'MEDIUM' THEN 3 ELSE 4 END
               + CASE WHEN urgency = 'Immediate' THEN -1 WHEN urgency = 'Expected' THEN 0 ELSE 1 END
               + CASE WHEN certainty = 'Observed' THEN -1 WHEN certainty = 'Likely' THEN 0 ELSE 1 END
               + CASE WHEN COALESCE(population, 0) > 100000 THEN -1 ELSE 0 END,
               5), 1) AS priority
      FROM base)
    SELECT event_id, incident_type, severity,
           CASE WHEN severity >= 8 THEN 'CATASTROPHIC' WHEN severity >= 6 THEN 'MAJOR'
                WHEN severity >= 4 THEN 'MODERATE' WHEN severity >= 2 THEN 'MINOR'
                ELSE 'MINIMAL' END AS impact_category,
           priority
    FROM scored
    """,
)
def fn_event_scoring(spark, sf_dir):
    from ..operators.joins import map_lookup

    e = t(spark, sf_dir, "events")
    base = e.select(
        "event_id",
        map_lookup(
            "event_type",
            {
                "error": "HURRICANE",
                "purchase": "FLOOD",
                "click": "SEVERE STORM",
                "view": "WINTER STORM",
            },
            default="OTHER",
        ).alias("incident_type"),
        F.floor(F.col("value") / 25).cast("int").alias("duration_days"),
        (F.col("user_id") * 20000).alias("population"),
        F.when(F.col("value") >= 400, "CRITICAL")
        .when(F.col("value") >= 200, "HIGH")
        .when(F.col("value") >= 50, "MEDIUM")
        .otherwise("LOW")
        .alias("risk_level"),
        F.when(F.col("value") >= 300, "Immediate")
        .when(F.col("value") >= 100, "Expected")
        .otherwise("Future")
        .alias("urgency"),
        F.when(F.col("user_id") % 3 == 0, "Observed")
        .when(F.col("user_id") % 3 == 1, "Likely")
        .otherwise("Possible")
        .alias("certainty"),
    )
    sev = event_severity("incident_type", "duration_days", "population")
    return base.select(
        "event_id",
        "incident_type",
        sev.alias("severity"),
        categorize_disaster_impact(sev).alias("impact_category"),
        alert_priority("risk_level", "urgency", "certainty", "population").alias("priority"),
    )


# ---------------------------------------------------------------------------
# §2.12 — state-code standardization + compliance masking
# (standardize_state_code ~110-branch macro; federal_compliance masking)
# ---------------------------------------------------------------------------
def _state_case_sql(expr: str) -> str:
    """DuckDB CASE twin of the standardize_state_code literal map."""
    from ..functions.macros import _STATES

    branches = []
    for code, name, fips in _STATES:
        branches.append(f"WHEN {expr} IN ('{code}','{name}','{fips}') THEN '{code}'")
    return "CASE " + " ".join(branches) + f" ELSE {expr} END"


@query(
    "fn_state_mask",
    f"""
    WITH base AS (
      SELECT s_suppkey, UPPER(TRIM(lpad(CAST(s_suppkey % 60 AS VARCHAR), 2, '0'))) AS fips_in,
             UPPER(TRIM(s_name)) AS name_in, s_name,
             CASE WHEN s_suppkey % 4 = 0 THEN 'CONFIDENTIAL'
                  WHEN s_suppkey % 4 = 1 THEN 'RESTRICTED'
                  WHEN s_suppkey % 4 = 2 THEN 'INTERNAL' ELSE 'PUBLIC' END AS data_classification
      FROM supplier)
    SELECT s_suppkey,
           {_state_case_sql('fips_in')} AS state_from_fips,
           {_state_case_sql('name_in')} AS name_passthrough,
           data_classification,
           CASE WHEN data_classification IN ('RESTRICTED','CONFIDENTIAL')
                THEN concat(substring(s_name, 1, 2), repeat('*', greatest(length(s_name) - 2, 0)))
                ELSE s_name END AS name_masked
    FROM base
    """,
)
def fn_state_mask(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    base = s.select(
        "s_suppkey",
        F.lpad((F.col("s_suppkey") % 60).cast("string"), 2, "0").alias("fips_in"),
        F.col("s_name").alias("name_in"),
        "s_name",
        F.when(F.col("s_suppkey") % 4 == 0, "CONFIDENTIAL")
        .when(F.col("s_suppkey") % 4 == 1, "RESTRICTED")
        .when(F.col("s_suppkey") % 4 == 2, "INTERNAL")
        .otherwise("PUBLIC")
        .alias("data_classification"),
    )
    return base.select(
        "s_suppkey",
        standardize_state_code("fips_in").alias("state_from_fips"),
        standardize_state_code("name_in").alias("name_passthrough"),
        "data_classification",
        mask_sensitive("s_name", "data_classification").alias("name_masked"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q7 shape — volume shipping between two nation pairs. The two nation
# dims are broadcast (25 rows each); the only shuffle is the final 3-key
# aggregate after the fact-fact join on orderkey. The symmetric nation-pair
# predicate is applied post-join on the two broadcast-enriched columns.
# ---------------------------------------------------------------------------
@query(
    "tpch_q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(dsum(rev.cast("decimal(28,6)"), 6).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape — returned-item revenue ranking: fact-fact join pruned by
# a quarter-wide date filter on orders (pushed to the scan), revenue agg on
# customer grain, top-20 by revenue. Nation dim broadcast.
# ---------------------------------------------------------------------------
@query(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    n = t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .join(l.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev.cast("decimal(28,6)"), 6).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape — promo revenue share for one ship-month. Part dim is
# broadcast; the month filter prunes the lineitem scan; the two conditional
# decimal sums are map-side-combined into a single scalar. The ratio is
# computed on the two exact sums (decimal -> double) so the result is
# partitioning-independent.
# ---------------------------------------------------------------------------
@query(
    "tpch_q14_promo_effect",
    """
    SELECT ROUND(100.0
             * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                             THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))
                             ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE),
           6) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def tpch_q14_promo_effect(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(28,6)"))
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("promo_revenue_pct")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape — small-quantity revenue for one brand: per-part average
# computed as an exact decimal mean (partitioning-independent), joined back
# to the brand-filtered facts. The part dim filter cuts the probe side
# before the per-part aggregate is even computed, and the joined-back
# aggregate is tiny -> broadcast under AQE.
# ---------------------------------------------------------------------------
@query(
    "tpch_q17_small_quantity",
    """
    WITH brand_parts AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#7'),
    pa AS (
      SELECT l.l_partkey,
             0.5 * (CAST(SUM(CAST(l.l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*))
               AS half_avg_qty
      FROM lineitem l JOIN brand_parts bp ON l.l_partkey = bp.p_partkey
      GROUP BY l.l_partkey)
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0 * 1000000.0) / 1000000.0
             AS avg_yearly
    FROM lineitem l
    JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < pa.half_avg_qty
    """,
)
def tpch_q17_small_quantity(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    brand_parts = F.broadcast(p.filter(F.col("p_brand") == "Brand#7").select("p_partkey"))
    pa = (
        l.join(brand_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(
            (
                0.5
                * (
                    F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double")
                    / F.count(F.lit(1))
                )
            ).alias("half_avg_qty")
        )
        .select(F.col("l_partkey").alias("pa_partkey"), "half_avg_qty")
    )
    return (
        l.join(pa, F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (
                F.round(
                    F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("double")
                    / 7.0
                    * F.lit(1000000.0)
                )
                / F.lit(1000000.0)
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# P2 — NOT NULL key gate as a staging filter (stg_fema_disasters.sql:52-54,
# stg_noaa_weather.sql:78-79): empty-string-to-NULL coercion followed by a
# required-keys filter. The coercion + filter are a single narrow projection
# stage; nothing shuffles.
# ---------------------------------------------------------------------------
@query(
    "p2_notnull_keys",
    """
    WITH staged AS (
      SELECT event_id, user_id, ts,
             NULLIF(TRIM(event_type), '') AS event_type,
             CASE WHEN value <= 0 THEN NULL ELSE value END AS value
      FROM events)
    SELECT event_id, user_id, ts, event_type, value
    FROM staged
    WHERE event_id IS NOT NULL AND user_id IS NOT NULL
      AND ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL
    """,
)
def p2_notnull_keys(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    staged = e.select(
        "event_id",
        "user_id",
        "ts",
        F.nullif(F.trim("event_type"), F.lit("")).alias("event_type"),
        F.when(F.col("value") <= 0, None).otherwise(F.col("value")).alias("value"),
    )
    cond = None
    for c in ["event_id", "user_id", "ts", "event_type", "value"]:
        cc = F.col(c).isNotNull()
        cond = cc if cond is None else (cond & cc)
    return staged.filter(cond)


# ---------------------------------------------------------------------------
# A9 — whole-frame profile metrics in one pass (data_processing_ops.py:
# 388-430, data_quality_ops.py:142-190): row count, key-duplicate count,
# per-column null fractions, and distinct cardinalities. One full scan, one
# partial-aggregated reduce to a single row — no per-column jobs.
# ---------------------------------------------------------------------------
@query(
    "a9_profile_metrics",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS dup_event_ids,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
           ROUND(SUM(CASE WHEN props IS NULL OR props = '' THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS null_frac_props,
           ROUND(SUM(CASE WHEN value IS NULL OR value <= 0 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS invalid_frac_value
    FROM events
    """,
)
def a9_profile_metrics(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    n = F.count(F.lit(1))
    return e.agg(
        n.cast("bigint").alias("n_rows"),
        (n - F.countDistinct("event_id")).cast("bigint").alias("dup_event_ids"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.countDistinct("event_type").cast("bigint").alias("n_event_types"),
        F.round(
            F.sum(
                F.when(F.col("props").isNull() | (F.col("props") == ""), 1).otherwise(0)
            )
            * 1.0
            / n,
            6,
        ).alias("null_frac_props"),
        F.round(
            F.sum(F.when(F.col("value").isNull() | (F.col("value") <= 0), 1).otherwise(0))
            * 1.0
            / n,
            6,
        ).alias("invalid_frac_value"),
    )


# ---------------------------------------------------------------------------
# J9 (beyond ref) — backward as-of join: each purchase picks up the latest
# prior-or-simultaneous click per user. Spark lacks a native ASOF join; the
# operator (operators/joins.py asof_join) is union + one window pass — a
# single shuffle on the key, no range join, no per-key blowup. The oracle is
# DuckDB's native ASOF LEFT JOIN. Right side is pre-aggregated to one row
# per (user_id, ts) so the match is deterministic in both engines.
# ---------------------------------------------------------------------------
@query(
    "j9_asof_latest_click",
    """
    WITH clicks AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(value) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, CAST(ts AS TIMESTAMP)),
    purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
      FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS click_ts, c.click_value
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def j9_asof_latest_click(spark, sf_dir):
    from ..operators.joins import asof_join

    e = t(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["click_value"],
    )
    return out.select(
        "event_id", "user_id", "ts", "value",
        F.col("ts_right").alias("click_ts"), "click_value",
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape — forecast revenue change: a pure filter+scalar-aggregate
# scan. All three predicates push to the parquet scan (PushedFilters shows
# l_shipdate/l_discount/l_quantity); no shuffle at all — the partial
# aggregates merge in a single-row final stage. At 100 TB this is the
# canonical "embarrassingly parallel" scan: cost is IO, and IO is minimized
# by pushdown + ReadSchema pruning to 4 columns.
# ---------------------------------------------------------------------------
@query(
    "tpch_q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape — national market share: the deepest join tree in the
# suite (lineitem ⋈ orders ⋈ customer ⋈ part ⋈ supplier ⋈ nation ⋈ region).
# Plan strategy: every dimension side (part-filtered, supplier+nation,
# customer-in-region) is broadcast, so the only shuffle is the
# lineitem ⋈ orders fact-fact join on orderkey, then a tiny per-year
# aggregate. The region/nation/part filters cut the build sides BEFORE the
# broadcast, which is what keeps them broadcast-able at 100 TB (dims grow
# with catalog size, not fact volume).
# ---------------------------------------------------------------------------
@query(
    "tpch_q8_market_share",
    """
    WITH asia_cust AS (
      SELECT c.c_custkey
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'),
    all_volumes AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6)) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN asia_cust ac ON o.o_custkey = ac.c_custkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01')
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_8' THEN volume
                               ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM all_volumes
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")

    asia_cust = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    econ_parts = F.broadcast(p.filter(F.col("p_type") == "ECONOMY").select("p_partkey"))
    supp_nation = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    vols = (
        l.join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(econ_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(28,6)")
    return (
        vols.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_8", F.col("volume")).otherwise(zero))
                .cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape — top supplier by quarterly revenue. The revenue CTE is
# one shuffle (groupBy l_suppkey after a pushed shipdate filter); the max
# is a single-row aggregate of the ALREADY-aggregated frame (supplier
# cardinality, not fact cardinality) broadcast back as a filter — no second
# pass over lineitem, no window-over-unpartitioned-frame. Ties are kept
# (TPC-H semantics) and the output is ordered by s_suppkey.
# ---------------------------------------------------------------------------
@query(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    revenue = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("total_revenue"))
    )
    max_rev = F.broadcast(revenue.agg(F.max("total_revenue").alias("max_revenue")))
    return (
        revenue.join(max_rev, F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape (adapted: the fixture customer table has no c_phone, so
# the "country code" group is c_nationkey) — customers with above-average
# positive balances in a fixed nation set and NO orders. The average is a
# single scalar from the dim-sized customer table (broadcast scalar join);
# the no-orders probe is a LEFT ANTI join on o_custkey, shuffling only the
# nation-filtered customer slice against orders' key column.
# ---------------------------------------------------------------------------
@query(
    "tpch_q22_sales_opportunity",
    """
    WITH target AS (
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
    avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
      FROM target WHERE c_acctbal > 0.0)
    SELECT tg.c_nationkey AS cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(tg.c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS totacctbal
    FROM target tg, avg_bal
    WHERE tg.c_acctbal > avg_bal.avg_acctbal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = tg.c_custkey)
    GROUP BY tg.c_nationkey
    ORDER BY tg.c_nationkey
    """,
)
def tpch_q22_sales_opportunity(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    target = c.filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = F.broadcast(
        target.filter(F.col("c_acctbal") > 0.0).agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(28,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_acctbal")
        )
    )
    return (
        target.join(avg_bal)
        .filter(F.col("c_acctbal") > F.col("avg_acctbal"))
        .join(o.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# S16 — MERGE INTO (CDC apply): the reference's ON DUPLICATE KEY UPDATE
# upsert (database.py:111-117) + retention DELETE (database.py:215-218)
# generalized to full MERGE clause semantics in one shuffle. A day-20 CDC
# batch of per-user activity is merged onto the pre-day-20 snapshot:
# matched users accumulate deltas, users whose change batch contains an
# 'error' event are deleted, unseen (non-error) users are inserted.
# ---------------------------------------------------------------------------
@query(
    "s16_merge_cdc",
    """
    WITH target AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total_value,
             COUNT(*) AS n_events
      FROM events WHERE ts < TIMESTAMP '2024-01-20' GROUP BY user_id),
    source AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS delta_value,
             COUNT(*) AS delta_events,
             MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_error
      FROM events WHERE ts >= TIMESTAMP '2024-01-20' GROUP BY user_id)
    SELECT CASE WHEN t.user_id IS NOT NULL THEN t.user_id ELSE s.user_id END AS user_id,
           CASE WHEN t.user_id IS NOT NULL AND s.user_id IS NOT NULL
                  THEN t.total_value + s.delta_value
                WHEN t.user_id IS NULL THEN s.delta_value
                ELSE t.total_value END AS total_value,
           CASE WHEN t.user_id IS NOT NULL AND s.user_id IS NOT NULL
                  THEN t.n_events + s.delta_events
                WHEN t.user_id IS NULL THEN s.delta_events
                ELSE t.n_events END AS n_events
    FROM target t FULL OUTER JOIN source s ON t.user_id = s.user_id
    WHERE NOT (s.user_id IS NOT NULL AND s.has_error = 1)
    """,
)
def s16_merge_cdc(spark, sf_dir):
    from ..operators.merge import merge_into

    e = t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")
    target = (
        e.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(dsum("value", 2).alias("total_value"), F.count(F.lit(1)).alias("n_events"))
    )
    source = (
        e.filter(F.col("ts") >= cutoff)
        .groupBy("user_id")
        .agg(
            dsum("value", 2).alias("delta_value"),
            F.count(F.lit(1)).alias("delta_events"),
            F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("has_error"),
        )
    )
    return merge_into(
        target,
        source,
        on=["user_id"],
        when_matched_update={
            "total_value": F.col("t.total_value") + F.col("s.delta_value"),
            "n_events": F.col("t.n_events") + F.col("s.delta_events"),
        },
        when_matched_delete_condition=F.col("s.has_error") == 1,
        when_not_matched_insert={
            "user_id": F.col("s.user_id"),
            "total_value": F.col("s.delta_value"),
            "n_events": F.col("s.delta_events"),
        },
        when_not_matched_insert_condition=F.col("s.has_error") == 0,
    )


# ---------------------------------------------------------------------------
# A13 — ROLLUP grouping sets: subtotal + grand-total rows in ONE aggregation
# pass (the reference computes its dashboard subtotal tiers with separate
# queries per level, ops/public_ops.py; grouping sets collapse that into a
# single shuffle with map-side partial aggregation). grouping_id
# disambiguates rollup NULLs from data NULLs.
# ---------------------------------------------------------------------------
@query(
    "a13_rollup_totals",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def a13_rollup_totals(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 2).alias("total_price"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "total_price")
    )


# ---------------------------------------------------------------------------
# A14 — CUBE grouping sets: all 2^k marginal combinations in one pass.
# ---------------------------------------------------------------------------
@query(
    "a14_cube_margins",
    """
    SELECT event_type, CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
           CAST(GROUPING(event_type, CAST(EXTRACT(dow FROM ts) AS BIGINT)) AS BIGINT) AS gid,
           COUNT(*) AS n_events
    FROM events
    GROUP BY CUBE(event_type, CAST(EXTRACT(dow FROM ts) AS BIGINT))
    """,
)
def a14_cube_margins(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    # Spark dayofweek: Sunday=1 .. Saturday=7; DuckDB dow: Sunday=0 — shift.
    dow = (F.dayofweek("ts") - F.lit(1)).cast("bigint")
    return (
        e.select("event_type", dow.alias("dow"))
        .cube("event_type", "dow")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("event_type", "dow", "gid", "n_events")
    )


# ---------------------------------------------------------------------------
# A15 — PIVOT (long -> wide conditional aggregation): daily event-type
# matrix. Spark's pivot with an EXPLICIT value list compiles to the same
# single-shuffle conditional-aggregate plan as the SQL CASE form — never
# omit the list, or Spark runs an extra distinct pass over the pivot column
# (two jobs, unbounded width) before it can even plan.
# ---------------------------------------------------------------------------
@query(
    "a15_pivot_daily_matrix",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY 1
    """,
)
def a15_pivot_daily_matrix(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        e.select(F.date_trunc("day", "ts").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )


# ---------------------------------------------------------------------------
# J14 — first/last-touch attribution inside a 1h lookback, WITHOUT a range
# join (operators/joins.py:touch_attribution): one user-keyed shuffle +
# one range-frame window over epoch seconds; touches carry a sortable
# padded sec|id|type string so MIN = first touch and MAX = last touch
# deterministically even on same-second ties.
# ---------------------------------------------------------------------------
@query(
    "j14_attribution",
    """
    WITH base AS (
      SELECT user_id AS u, event_id AS eid, event_type AS etype, ts AS ets,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
             CASE WHEN event_type IN ('view', 'click') THEN
               lpad(CAST(CAST(FLOOR(epoch(ts)) AS BIGINT) AS VARCHAR), 10, '0')
               || '|' || lpad(CAST(event_id AS VARCHAR), 12, '0')
               || '|' || event_type
             END AS tcode
      FROM events
      WHERE event_type IN ('purchase', 'view', 'click')),
    w AS (
      SELECT u, eid, etype, ets,
             MIN(tcode) OVER win AS first_code,
             MAX(tcode) OVER win AS last_code,
             CAST(COUNT(tcode) OVER win AS BIGINT) AS n_touches
      FROM base
      WINDOW win AS (PARTITION BY u ORDER BY s
                     RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING))
    SELECT eid AS purchase_id, u AS user_id, ets AS purchase_ts, n_touches,
           -- NULLIF: duckdb split_part yields '' on NULL input where spark yields NULL
           CAST(NULLIF(split_part(first_code, '|', 2), '') AS BIGINT) AS first_touch_id,
           NULLIF(split_part(first_code, '|', 3), '') AS first_touch_type,
           CAST(NULLIF(split_part(last_code, '|', 2), '') AS BIGINT) AS last_touch_id,
           NULLIF(split_part(last_code, '|', 3), '') AS last_touch_type
    FROM w WHERE etype = 'purchase'
    ORDER BY purchase_id
    """,
)
def j14_attribution(spark, sf_dir):
    from ..operators.joins import touch_attribution

    return touch_attribution(t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Overlapping-interval coalescing (operators/windows.py:coalesce_intervals):
# each event opens a 30-minute activity interval; merge overlaps per type
# into maximal islands — the range form of gaps-and-islands (w8 is the
# point form, w6 the gap-timeout form). All bounds in epoch microseconds
# (bigint) so island extents are exact integers in any engine.
# ---------------------------------------------------------------------------
@query(
    "j15_interval_coalesce",
    """
    WITH iv AS (
      SELECT event_type, event_id, epoch_us(ts) AS s,
             epoch_us(ts) + 1800000000 AS e
      FROM events),
    m AS (
      SELECT event_type, s, e,
             MAX(e) OVER (PARTITION BY event_type ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme,
             CASE WHEN MAX(e) OVER (PARTITION BY event_type ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  OR s > MAX(e) OVER (PARTITION BY event_type ORDER BY s, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS nw,
             event_id
      FROM iv),
    isl AS (
      SELECT event_type, s, e,
             SUM(nw) OVER (PARTITION BY event_type ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM m),
    merged AS (
      SELECT event_type, island, MIN(s) AS island_start, MAX(e) AS island_end,
             CAST(COUNT(*) AS BIGINT) AS n_merged
      FROM isl GROUP BY 1, 2)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(n_merged) AS BIGINT) AS n_events,
           CAST(SUM(island_end - island_start) AS BIGINT) AS covered_us,
           CAST(MAX(n_merged) AS BIGINT) AS max_island_events
    FROM merged GROUP BY event_type ORDER BY event_type
    """,
)
def j15_interval_coalesce(spark, sf_dir):
    """Merge each type's 30-minute event intervals into maximal islands,
    then roll up island count, total covered time, and the largest
    island. One event_type-keyed shuffle feeds both window passes and
    the island agg (Exchange reuse); bounds stay bigint microseconds so
    coverage sums are exact."""
    from ..operators.windows import coalesce_intervals

    e = t(spark, sf_dir, "events")
    iv = e.select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + F.lit(1800000000).cast("bigint")).alias("e"),
    )
    merged = coalesce_intervals(
        iv, "s", "e", ["event_type"], order_tiebreak=["event_id"]
    )
    return (
        merged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum("n_merged").cast("bigint").alias("n_events"),
            F.sum(F.col("island_end") - F.col("island_start")).cast("bigint").alias("covered_us"),
            F.max("n_merged").cast("bigint").alias("max_island_events"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Null-safe equi-join (SQL IS NOT DISTINCT FROM ≡ Spark eqNullSafe ≡ the
# <=> operator): the join-semantics surface plain equi-joins silently
# drop — NULL keys match NULL keys. Two halves of the event stream are
# bucketed on a NULLABLE key (low values get no bucket) and full-outer
# null-safe joined, so the NULL×NULL row in the output proves the
# semantics end-to-end.
# ---------------------------------------------------------------------------
@query(
    "j16_nullsafe_join",
    """
    WITH keyed AS (
      SELECT event_id,
             CASE WHEN value >= 100 THEN CAST(FLOOR(value / 100) AS BIGINT) END AS k
      FROM events),
    l AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS cnt_l
          FROM keyed WHERE event_id % 2 = 0 GROUP BY k),
    r AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS cnt_r
          FROM keyed WHERE event_id % 2 = 1 GROUP BY k)
    SELECT COALESCE(l.k, r.k) AS k,
           l.k IS NULL AND r.k IS NULL
             AND (l.cnt_l IS NOT NULL OR r.cnt_r IS NOT NULL) AS is_null_bucket,
           COALESCE(l.cnt_l, 0) AS cnt_even,
           COALESCE(r.cnt_r, 0) AS cnt_odd
    FROM l FULL JOIN r ON l.k IS NOT DISTINCT FROM r.k
    ORDER BY k NULLS FIRST
    """,
)
def j16_nullsafe_join(spark, sf_dir):
    """Full-outer join of the even/odd event halves on a nullable bucket
    key using eqNullSafe — Spark plans it as a regular hash join on the
    null-safe key (no fallback to nested loops); the NULL bucket lands
    as ONE matched row instead of two dangling ones."""
    e = t(spark, sf_dir, "events")
    keyed = e.select(
        "event_id",
        F.when(F.col("value") >= 100, F.floor(F.col("value") / 100).cast("bigint")).alias("k"),
    )
    l = (
        keyed.filter(F.col("event_id") % 2 == 0)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt_l"))
        .alias("l")
    )
    r = (
        keyed.filter(F.col("event_id") % 2 == 1)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt_r"))
        .alias("r")
    )
    j = l.join(r, F.col("l.k").eqNullSafe(F.col("r.k")), "full")
    return j.select(
        F.coalesce(F.col("l.k"), F.col("r.k")).alias("k"),
        (
            F.col("l.k").isNull()
            & F.col("r.k").isNull()
            & (F.col("cnt_l").isNotNull() | F.col("cnt_r").isNotNull())
        ).alias("is_null_bucket"),
        F.coalesce(F.col("cnt_l"), F.lit(0)).alias("cnt_even"),
        F.coalesce(F.col("cnt_r"), F.lit(0)).alias("cnt_odd"),
    ).orderBy(F.asc_nulls_first("k"))
