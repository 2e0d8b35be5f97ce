"""Quality-operator queries (SURVEY §2.10 Q1–Q10) with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..quality.checks import accuracy_outlier_count, validity_checks
from ..quality.freshness import freshness_check
from ..quality.pii import pii_scan
from ..quality.profile import completeness_profile
from ..quality.anomaly import concentration_anomaly
from ..quality.dbt_tests import (
    TestCase,
    run_test_suite,
    test_accepted_range,
    test_accepted_values,
    test_not_null,
    test_relationships,
    test_unique,
)
from ..clock import Clock
from .registry import query, t
from datetime import datetime

_CLOCK = Clock(datetime(2024, 2, 1))


# ---------------------------------------------------------------------------
# Q1 — completeness profile in one pass
# ---------------------------------------------------------------------------
@query(
    "q1_completeness",
    """
    SELECT 'lineitem' AS source_table, COUNT(*) AS row_count,
           ROUND(1.0 - (
             (SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
            + SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
            + SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)
            + SUM(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END)
            + SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
            + SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)
            + SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)
            + SUM(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END)
            + SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
            + SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END)
            + SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
             ) * 1.0 / (COUNT(*) * 11)), 6) AS completeness,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_l_orderkey,
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_l_quantity,
           CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_l_shipdate
    FROM lineitem
    """,
)
def q1_completeness(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    return completeness_profile(
        l, "lineitem", critical_cols=["l_orderkey", "l_quantity", "l_shipdate"]
    )


# ---------------------------------------------------------------------------
# Q2 — z-score outlier count from exact moments
# ---------------------------------------------------------------------------
@query(
    "q2_outliers",
    """
    WITH m AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS s,
             CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS ss,
             CAST(COUNT(o_totalprice) AS DOUBLE) AS n
      FROM orders)
    SELECT CAST(SUM(CASE WHEN ABS((o_totalprice - m.s/m.n) / SQRT((m.ss - m.s*m.s/m.n)/(m.n-1))) > 3
                    THEN 1 ELSE 0 END) AS BIGINT) AS outlier_count,
           COUNT(o_totalprice) AS checked_count
    FROM orders, m
    """,
)
def q2_outliers(spark, sf_dir):
    return accuracy_outlier_count(t(spark, sf_dir, "orders", restore=True), "o_totalprice", z_threshold=3.0)


# ---------------------------------------------------------------------------
# Q3 — consistency: duplicates over key + temporal-order violations
# ---------------------------------------------------------------------------
@query(
    "q3_consistency",
    """
    WITH base AS (
      SELECT COUNT(*) AS row_count,
             CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS ship_before_order
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    d AS (
      SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS duplicate_rows FROM (
        SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber) g)
    SELECT base.row_count, base.ship_before_order, d.duplicate_rows FROM base, d
    """,
)
def q3_consistency(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    joined = l.join(o, l["l_orderkey"] == o["o_orderkey"])
    base = joined.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum((F.col("l_shipdate") < F.col("o_orderdate")).cast("bigint")).alias(
            "ship_before_order"
        ),
    )
    dupes = (
        l.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("duplicate_rows"))
    )
    return base.crossJoin(dupes)


# ---------------------------------------------------------------------------
# Q4 — freshness vs pinned clock (SLA banding)
# ---------------------------------------------------------------------------
@query(
    "q4_freshness",
    """
    SELECT 'events' AS source_name, MAX(ts) AS latest_ts,
           CAST(FLOOR((epoch(TIMESTAMP '2024-02-01 00:00:00') - FLOOR(epoch(MAX(ts))))/60) AS BIGINT) AS age_minutes,
           CASE WHEN FLOOR((epoch(TIMESTAMP '2024-02-01 00:00:00') - FLOOR(epoch(MAX(ts))))/60) > 10080 THEN 'ERROR'
                WHEN FLOOR((epoch(TIMESTAMP '2024-02-01 00:00:00') - FLOOR(epoch(MAX(ts))))/60) > 1440 THEN 'WARN'
                ELSE 'PASS' END AS freshness_status
    FROM events
    """,
)
def q4_freshness(spark, sf_dir):
    return freshness_check(
        t(spark, sf_dir, "events"),
        "ts",
        "events",
        warn_minutes=1440,
        error_minutes=10080,
        clock=_CLOCK,
    )


# ---------------------------------------------------------------------------
# Q5 — declarative validity rules (pattern/enum/range)
# ---------------------------------------------------------------------------
@query(
    "q5_validity",
    """
    SELECT COUNT(*) AS row_count,
           CAST(SUM(CASE WHEN c_name IS NOT NULL AND NOT regexp_matches(c_name, 'Customer#[0-9]{9}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS bad_pattern_c_name,
           CAST(SUM(CASE WHEN c_mktsegment IS NOT NULL AND c_mktsegment NOT IN
                    ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')
                    THEN 1 ELSE 0 END) AS BIGINT) AS bad_enum_c_mktsegment,
           CAST(SUM(CASE WHEN c_acctbal IS NOT NULL AND c_acctbal NOT BETWEEN -1000.0 AND 10000.0
                    THEN 1 ELSE 0 END) AS BIGINT) AS bad_range_c_acctbal
    FROM customer
    """,
)
def q5_validity(spark, sf_dir):
    return validity_checks(
        t(spark, sf_dir, "customer"),
        {
            "c_name": {"pattern": "Customer#[0-9]{9}"},
            "c_mktsegment": {"enum": ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]},
            "c_acctbal": {"min": -1000.0, "max": 10000.0},
        },
    )


# ---------------------------------------------------------------------------
# Q7 — PII regex scan over documents.text
# ---------------------------------------------------------------------------
@query(
    "q7_pii_scan",
    """
    SELECT 'text' AS column_name, 'ssn' AS pii_type,
           CAST(COALESCE(SUM(CASE WHEN regexp_matches(text, '\\d{3}-\\d{2}-\\d{4}') THEN 1 ELSE 0 END), 0) AS BIGINT) AS match_count
    FROM documents
    UNION ALL
    SELECT 'text', 'phone',
           CAST(COALESCE(SUM(CASE WHEN regexp_matches(text, '\\(?\\d{3}\\)?[-.\\s]?\\d{3}[-.\\s]?\\d{4}') THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'text', 'email',
           CAST(COALESCE(SUM(CASE WHEN regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'text', 'credit_card',
           CAST(COALESCE(SUM(CASE WHEN regexp_matches(text, '\\d{4}[-\\s]?\\d{4}[-\\s]?\\d{4}[-\\s]?\\d{4}') THEN 1 ELSE 0 END), 0) AS BIGINT)
    FROM documents
    """,
)
def q7_pii_scan(spark, sf_dir):
    return pii_scan(t(spark, sf_dir, "documents", restore=True), string_cols=["text"])


# ---------------------------------------------------------------------------
# Q10 — dbt-style generic test suite (one intentionally failing range test)
# ---------------------------------------------------------------------------
@query(
    "q10_test_suite",
    """
    WITH results AS (
      SELECT 'not_null_c_custkey' AS test_name,
             (SELECT COUNT(*) FROM customer WHERE c_custkey IS NULL) AS failures
      UNION ALL
      SELECT 'unique_o_orderkey',
             (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM (
                SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1) g)
      UNION ALL
      SELECT 'fk_orders_customer',
             (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
                SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'accepted_values_l_returnflag',
             (SELECT COUNT(*) FROM lineitem WHERE l_returnflag IS NOT NULL
                AND l_returnflag NOT IN ('A','N','R'))
      UNION ALL
      SELECT 'accepted_range_l_discount',
             (SELECT COUNT(*) FROM lineitem WHERE l_discount IS NOT NULL
                AND l_discount NOT BETWEEN 0.0 AND 0.05))
    SELECT test_name, failures,
           CASE WHEN failures = 0 THEN 'pass' ELSE 'fail' END AS status
    FROM results
    """,
)
def q10_test_suite(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    cases = [
        TestCase("not_null_c_custkey", test_not_null(c, "c_custkey")),
        TestCase("unique_o_orderkey", test_unique(o, "o_orderkey")),
        TestCase("fk_orders_customer", test_relationships(o, "o_custkey", c, "c_custkey")),
        TestCase("accepted_values_l_returnflag", test_accepted_values(l, "l_returnflag", ["A", "N", "R"])),
        # deliberately failing test: discounts run up to 0.10 in the fixture
        TestCase("accepted_range_l_discount", test_accepted_range(l, "l_discount", 0.0, 0.05)),
    ]
    return run_test_suite(cases)


# ---------------------------------------------------------------------------
# Q6 — concentration anomaly (dimensional skew probe)
# ---------------------------------------------------------------------------
@query(
    "q6_concentration",
    """
    WITH counts AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
    tot AS (SELECT SUM(n) AS total FROM counts),
    top AS (SELECT event_type, n FROM counts ORDER BY n DESC, event_type LIMIT 1)
    SELECT top.event_type AS top_value, top.n AS top_count,
           ROUND(top.n * 1.0 / tot.total, 6) AS share,
           (top.n * 1.0 / tot.total) > 0.5 AS is_concentrated
    FROM top, tot
    """,
)
def q6_concentration(spark, sf_dir):
    return concentration_anomaly(t(spark, sf_dir, "events"), "event_type", threshold=0.5)


# ---------------------------------------------------------------------------
# Q7 twin — PII redaction transform: the scrub a training-corpus export runs
# after the scan. PII-bearing text is synthesized deterministically from
# events columns (the fixture tables carry no real PII), then masked by the
# chained-regexp_replace transform; the oracle applies the identical
# patterns in the identical order with DuckDB's 'g' flag.
# ---------------------------------------------------------------------------
@query(
    "q7_pii_redact",
    r"""
    WITH raw AS (
      SELECT event_id,
             'reach user' || CAST(user_id AS VARCHAR) || ' at user'
             || CAST(user_id AS VARCHAR) || '@mail-' || CAST(user_id % 7 AS VARCHAR)
             || '.example.com or call (303) 555-'
             || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0')
             || ' ssn ' || lpad(CAST(user_id % 1000 AS VARCHAR), 3, '0') || '-'
             || lpad(CAST(event_id % 100 AS VARCHAR), 2, '0') || '-'
             || lpad(CAST((event_id * 7) % 10000 AS VARCHAR), 4, '0')
             || ' card 4111-1111-1111-' || lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0')
             AS contact
      FROM events)
    SELECT event_id,
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(contact,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
            '\d{4}[-\s]?\d{4}[-\s]?\d{4}[-\s]?\d{4}', '[CREDIT_CARD]', 'g'),
          '\(?\d{3}\)?[-.\s]?\d{3}[-.\s]?\d{4}', '[PHONE]', 'g'),
        '\d{3}-\d{2}-\d{4}', '[SSN]', 'g') AS contact_redacted
    FROM raw
    """,
)
def q7_pii_redact(spark, sf_dir):
    from ..quality.pii import pii_redact
    from .registry import _restore_scan_parallelism

    # map-only query: no shuffle ever parallelizes it, so the single-row-
    # group fixture file pins the whole regex chain to ONE core (the other
    # events queries hit a groupBy immediately — see _RESTORE_SPLITS).
    # A real 100 TB table is millions of splits; this restores that shape.
    e = _restore_scan_parallelism(
        spark,
        t(spark, sf_dir, "events", restore=True),
        cache_key=f"{sf_dir}/events.parquet#q7",
    )
    sid = F.col("user_id").cast("string")
    eid = F.col("event_id")
    raw = e.select(
        "event_id",
        F.concat(
            F.lit("reach user"), sid, F.lit(" at user"), sid,
            F.lit("@mail-"), (F.col("user_id") % 7).cast("string"),
            F.lit(".example.com or call (303) 555-"),
            F.lpad((eid % 10000).cast("string"), 4, "0"),
            F.lit(" ssn "), F.lpad((F.col("user_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"), F.lpad((eid % 100).cast("string"), 2, "0"),
            F.lit("-"), F.lpad(((eid * 7) % 10000).cast("string"), 4, "0"),
            F.lit(" card 4111-1111-1111-"),
            F.lpad((eid % 10000).cast("string"), 4, "0"),
        ).alias("contact"),
    )
    return raw.select("event_id", pii_redact("contact").alias("contact_redacted"))


# ---------------------------------------------------------------------------
# ENC — column-level encryption round-trip (utils/encryption.py:25-250 twin).
# GCM ciphertexts carry a random IV, so the oracle checks the INVARIANTS:
# decrypt(encrypt(x)) == x, ciphertext != plaintext, and a different
# tenant's key fails to decrypt (try_aes_decrypt → null).
# ---------------------------------------------------------------------------
@query(
    "enc_roundtrip",
    """
    SELECT c_custkey, c_name AS name_roundtrip,
           TRUE AS cipher_differs, TRUE AS wrong_tenant_fails
    FROM customer
    """,
)
def enc_roundtrip(spark, sf_dir):
    from ..crypto import decrypt_column, encrypt_column, field_key

    master = "fixture-master-secret"
    k_a = field_key(master, "c_name", tenant_id="tenant_a")
    k_b = field_key(master, "c_name", tenant_id="tenant_b")
    c = t(spark, sf_dir, "customer")
    enc = c.select("c_custkey", "c_name", encrypt_column("c_name", k_a).alias("cipher"))
    return enc.select(
        "c_custkey",
        decrypt_column("cipher", k_a).alias("name_roundtrip"),
        (F.col("cipher") != F.col("c_name")).alias("cipher_differs"),
        F.isnull(decrypt_column("cipher", k_b)).alias("wrong_tenant_fails"),
    )


# ---------------------------------------------------------------------------
# ALERTS — declarative rule evaluation over per-type event metrics
# (sensors/error_sensors.py:75-101 tiered thresholds; :349-411 escalation).
# Metrics: per-event_type decimal-exact avg(value) + freshness age vs the
# pinned clock; two gt-rules with warn/critical tiers fire a mixed set.
# ---------------------------------------------------------------------------
@query(
    "alert_rules_fired",
    """
    WITH g AS (
      SELECT event_type AS entity,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE)/COUNT(value) * 1000000.0) / 1000000.0 AS avg_value,
             CAST(FLOOR((epoch(TIMESTAMP '2024-02-01 00:00:00') - FLOOR(epoch(MAX(ts))))/60) AS DOUBLE) AS age_minutes
      FROM events GROUP BY event_type),
    m AS (
      SELECT entity, 'avg_value' AS metric, avg_value AS value FROM g
      UNION ALL
      SELECT entity, 'age_minutes', age_minutes FROM g),
    r AS (SELECT * FROM (VALUES
       ('avg_value_high','avg_value',49.0,50.5),
       ('events_stale','age_minutes',1450.0,1470.0)) AS t(rule_name, rule_metric, warn, crit))
    SELECT m.entity, r.rule_name, m.metric, m.value,
           CASE WHEN m.value > r.crit THEN r.crit ELSE r.warn END AS threshold,
           CASE WHEN m.value > r.crit THEN 'critical' ELSE 'warning' END AS severity
    FROM m JOIN r ON m.metric = r.rule_metric
    WHERE m.value > r.warn
    """,
)
def alert_rules_fired(spark, sf_dir):
    from ..quality.alerts import AlertRule, evaluate_alert_rules
    from .registry import davg

    e = t(spark, sf_dir, "events")
    g = e.groupBy(F.col("event_type").alias("entity")).agg(
        davg("value", 4, 6).alias("avg_value"),
        # epoch via unix_micros on a defensively-cast column: legal for both
        # TIMESTAMP and TIMESTAMP_NTZ inputs (cast("double") is not)
        F.floor(
            (
                F.lit(1706745600)
                - F.floor(F.unix_micros(F.max("ts").cast("timestamp")) / F.lit(1e6))
            )
            / 60
        ).cast("double").alias("age_minutes"),
    )
    metrics = g.select(
        "entity",
        F.explode(
            F.array(
                F.struct(F.lit("avg_value").alias("metric"), F.col("avg_value").alias("value")),
                F.struct(F.lit("age_minutes").alias("metric"), F.col("age_minutes").alias("value")),
            )
        ).alias("kv"),
    ).select("entity", "kv.metric", "kv.value")
    rules = [
        AlertRule("avg_value_high", "avg_value", "gt", warn=49.0, crit=50.5),
        AlertRule("events_stale", "age_minutes", "gt", warn=1450.0, crit=1470.0),
    ]
    return evaluate_alert_rules(metrics, rules)


# ---------------------------------------------------------------------------
# TENANT — row-level tenant isolation view (tenant_resources.py:317-387
# filter injection + scope restriction, re-expressed as a pushable
# predicate). Fixture mapping: nation = geographic scope, mktsegment
# stands in for the classification column.
# ---------------------------------------------------------------------------
@query(
    "tenant_scoped_view",
    """
    SELECT c_custkey, n.n_name AS scope, c_mktsegment AS classification,
           'colorado_state' AS tenant_id
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_3','NATION_7')
      AND c_mktsegment IN ('AUTOMOBILE','BUILDING')
    """,
)
def tenant_scoped_view(spark, sf_dir):
    from ..tenant import TenantSpec, tenant_view

    spec = TenantSpec(
        tenant_id="colorado_state",
        allowed_scopes=["NATION_3", "NATION_7"],
        allowed_classifications=["AUTOMOBILE", "BUILDING"],
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).select(
        "c_custkey", F.col("n_name").alias("scope"), F.col("c_mktsegment").alias("classification")
    )
    return tenant_view(joined, spec, scope_col="scope", classification_col="classification")


# ---------------------------------------------------------------------------
# Q13 — robust per-group outliers via median/MAD (Hampel's rule): the
# heavy-tail-safe twin of q2's z-score scan. Exact per-group percentiles
# are the oracle baseline; the 100 TB path swaps in approx_percentile
# sketches (documented in the operator docstring).
# ---------------------------------------------------------------------------
@query(
    "q13_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS m
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, ABS(e.value - med.m) AS ad, med.m AS m
      FROM events e JOIN med USING (event_type)),
    mad AS (
      SELECT event_type, quantile_cont(ad, 0.5) AS md
      FROM dev GROUP BY event_type)
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           ROUND(MAX(d.m), 6) AS median_value,
           ROUND(MAX(mad.md), 6) AS mad,
           CAST(SUM(CASE WHEN ROUND(d.ad, 6) > ROUND(3.0 * 1.4826 * mad.md, 6)
                         THEN 1 ELSE 0 END) AS BIGINT) AS outlier_count
    FROM dev d JOIN mad USING (event_type)
    GROUP BY d.event_type
    """,
)
def q13_mad_outliers(spark, sf_dir):
    from ..quality.anomaly import mad_outliers

    e = t(spark, sf_dir, "events")
    return mad_outliers(e, "value", ["event_type"], k=3.0)


# ---------------------------------------------------------------------------
# Q14 — chi-square independence of event mix vs weekday + Cramér's V
# (quality/stats.py:chi2_independence). Contingency agg is the only
# corpus-rate pass; everything downstream is cell-cardinality.
# ---------------------------------------------------------------------------
@query(
    "q14_chi2_independence",
    """
    WITH cells AS (
      SELECT event_type AS x, CAST(isodow(ts) AS INT) AS y,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2),
    rm AS (SELECT x, CAST(SUM(o) AS BIGINT) AS nx FROM cells GROUP BY x),
    cm AS (SELECT y, CAST(SUM(o) AS BIGINT) AS ny FROM cells GROUP BY y),
    shape AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rm) AS r,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM cm) AS c,
                     (SELECT CAST(SUM(o) AS BIGINT) FROM cells) AS n),
    grid AS (
      SELECT rm.x, cm.y, rm.nx, cm.ny, COALESCE(cells.o, 0) AS o
      FROM rm CROSS JOIN cm LEFT JOIN cells ON cells.x = rm.x AND cells.y = cm.y),
    stat AS (
      SELECT CAST(SUM(CAST(ROUND(
               (o - (nx * ny * 1.0) / shape.n) * (o - (nx * ny * 1.0) / shape.n)
               / ((nx * ny * 1.0) / shape.n), 8) AS DECIMAL(28,8))) AS DOUBLE) AS chi2_raw
      FROM grid CROSS JOIN shape)
    SELECT n, r, c,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           ROUND(chi2_raw, 6) AS chi2,
           ROUND(SQRT(chi2_raw / (n * LEAST(r - 1, c - 1))), 6) AS cramers_v
    FROM shape CROSS JOIN stat
    """,
)
def q14_chi2_independence(spark, sf_dir):
    from ..quality.stats import chi2_independence

    e = t(spark, sf_dir, "events")
    return chi2_independence(
        e.select("event_type", (F.weekday("ts") + 1).alias("dow")),
        "event_type",
        "dow",
    )


# ---------------------------------------------------------------------------
# A32 — mutual information between event type and weekday (nats) with
# marginal entropies and min-normalized NMI (quality/stats.py).
# ---------------------------------------------------------------------------
@query(
    "a32_mutual_information",
    """
    WITH cells AS (
      SELECT event_type AS x, CAST(isodow(ts) AS INT) AS y,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2),
    rm AS (SELECT x, CAST(SUM(o) AS BIGINT) AS nx FROM cells GROUP BY x),
    cm AS (SELECT y, CAST(SUM(o) AS BIGINT) AS ny FROM cells GROUP BY y),
    nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    mi AS (
      SELECT CAST(SUM(CAST(ROUND(
               (o * 1.0 / nn.n) * LN((o * nn.n * 1.0) / (nx * ny)), 8)
             AS DECIMAL(28,8))) AS DOUBLE) AS mi_raw
      FROM cells JOIN rm USING (x) JOIN cm USING (y) CROSS JOIN nn),
    hx AS (
      SELECT CAST(SUM(CAST(ROUND(
               -(nx * 1.0 / nn.n) * LN(nx * 1.0 / nn.n), 8)
             AS DECIMAL(28,8))) AS DOUBLE) AS hx_raw
      FROM rm CROSS JOIN nn),
    hy AS (
      SELECT CAST(SUM(CAST(ROUND(
               -(ny * 1.0 / nn.n) * LN(ny * 1.0 / nn.n), 8)
             AS DECIMAL(28,8))) AS DOUBLE) AS hy_raw
      FROM cm CROSS JOIN nn)
    SELECT nn.n,
           ROUND(mi_raw, 6) AS mi_nats,
           ROUND(hx_raw, 6) AS h_x,
           ROUND(hy_raw, 6) AS h_y,
           CASE WHEN LEAST(hx_raw, hy_raw) > 0
                THEN ROUND(mi_raw / LEAST(hx_raw, hy_raw), 6) END AS nmi
    FROM nn CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy
    """,
)
def a32_mutual_information(spark, sf_dir):
    from ..quality.stats import mutual_information

    e = t(spark, sf_dir, "events")
    return mutual_information(
        e.select("event_type", (F.weekday("ts") + 1).alias("dow")),
        "event_type",
        "dow",
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test (quality/drift.py:ks_two_sample):
# returned vs accepted lineitems compared on the 50-level quantity
# distribution — the distributional companion to q11's PSI. Integer-domain
# gap |k1*n2 - k2*n1| makes the argmax engine-deterministic.
# ---------------------------------------------------------------------------
@query(
    "q15_ks_test",
    """
    WITH per AS (
      SELECT l_quantity AS v,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS BIGINT) AS c2
      FROM lineitem
      WHERE l_returnflag IN ('R', 'A')
      GROUP BY 1),
    cum AS (
      SELECT v,
             SUM(c1) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k1,
             SUM(c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k2
      FROM per),
    d AS (
      SELECT CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2,
             CAST(v AS DOUBLE) AS at_value,
             CAST(ABS(k1 * t.n2 - k2 * t.n1) AS BIGINT) AS dn
      FROM cum CROSS JOIN (SELECT MAX(k1) AS n1, MAX(k2) AS n2 FROM cum) t)
    SELECT n1, n2, at_value,
           CAST(dn AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_d
    FROM d ORDER BY dn DESC, at_value LIMIT 1
    """,
)
def q15_ks_test(spark, sf_dir):
    """KS statistic between returned ('R') and accepted ('A') lineitem
    quantity distributions: one corpus-rate hash-agg to the 50-row
    distinct-value frame, cumulative window + bigint gap there, one row
    out."""
    from ..quality.drift import ks_two_sample

    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag").isin("R", "A"))
    return ks_two_sample(l, "l_quantity", F.col("l_returnflag") == "R")


# ---------------------------------------------------------------------------
# Per-column entropy profile (quality/stats.py:column_entropy): the
# schema-health signal drift monitors track — constant columns (H→0),
# id-like columns (norm H→1), and modal concentration, across four
# representative columns of the events table.
# ---------------------------------------------------------------------------
_ENT_COL_SQL = """
      SELECT '{name}' AS column_name,
             CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS cardinality,
             ROUND(CAST(SUM(CAST(ROUND(
               -(cnt * 1.0 / t.n_tot) * LN(cnt * 1.0 / t.n_tot), 8)
             AS DECIMAL(28,8))) AS DOUBLE), 6) AS entropy_nats,
             CAST(MAX(cnt) AS BIGINT) AS modal_count
      FROM (SELECT {expr} AS v, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1) p
      CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM events) t
      GROUP BY t.n_tot"""


@query(
    "q16_entropy_profile",
    f"""
    WITH raw AS (
      {_ENT_COL_SQL.format(name="event_type", expr="event_type")}
      UNION ALL
      {_ENT_COL_SQL.format(name="weekday", expr="CAST(isodow(ts) AS INT)")}
      UNION ALL
      {_ENT_COL_SQL.format(name="user_bucket", expr="user_id % 100")}
      UNION ALL
      {_ENT_COL_SQL.format(name="value_decade", expr="CAST(FLOOR(value / 100) AS BIGINT)")}
    )
    SELECT column_name, n, cardinality, entropy_nats,
           CASE WHEN cardinality > 1
                THEN ROUND(entropy_nats / LN(CAST(cardinality AS DOUBLE)), 6)
           END AS norm_entropy,
           CAST(modal_count AS DOUBLE) / n AS modal_share
    FROM raw ORDER BY column_name
    """,
)
def q16_entropy_profile(spark, sf_dir):
    """Entropy, normalized entropy, and modal share for event_type,
    ISO weekday, user bucket, and value decade — each column is one
    value-count hash-agg + a 1-row total broadcast; ln terms follow the
    8-dp-round-then-decimal-sum convention shared with a32/q14."""
    from ..quality.stats import multi_column_entropy

    e = t(spark, sf_dir, "events")
    # one scan for all four profiles (r14): the former union of four
    # column_entropy frames re-scanned events once per column
    out = multi_column_entropy(
        e,
        [
            ("event_type", "event_type"),
            ("weekday", (F.weekday("ts") + 1).cast("int")),
            ("user_bucket", F.col("user_id") % 100),
            ("value_decade", F.floor(F.col("value") / 100).cast("bigint")),
        ],
    )
    return out.orderBy("column_name")


# ---------------------------------------------------------------------------
# Luhn checksum validation (the card/IMEI/ID check digit) as a pure
# column fold — the classic format-validation function a PII/quality
# scanner needs beyond regex shape checks (q7 finds number-LIKE strings;
# Luhn separates plausible identifiers from random digits). Fixture:
# deterministic 16-digit strings derived from customer keys, ~1/10 of
# which are made Luhn-valid by construction of the check digit.
# ---------------------------------------------------------------------------
@query(
    "q17_luhn_check",
    """
    WITH nums AS (
      SELECT c_custkey,
             lpad(CAST(c_custkey * 7919 % 1000000000000000 AS VARCHAR), 15, '0') AS body
      FROM customer),
    digits AS (
      SELECT c_custkey, body,
             list_transform(list_zip(string_split(reverse(body), ''), range(1, 16)),
               p -> CASE WHEN p[2] % 2 = 1
                         THEN CASE WHEN 2 * CAST(p[1] AS INT) > 9
                                   THEN 2 * CAST(p[1] AS INT) - 9
                                   ELSE 2 * CAST(p[1] AS INT) END
                         ELSE CAST(p[1] AS INT) END) AS weighted
      FROM nums),
    summed AS (
      SELECT c_custkey, body,
             CAST(list_sum(weighted) AS BIGINT) AS s
      FROM digits),
    full_num AS (
      SELECT c_custkey,
             body || CAST((10 - s % 10) % 10 AS VARCHAR) AS card16,
             CASE WHEN c_custkey % 10 = 0 THEN 0 ELSE 1 END AS corrupt
      FROM summed),
    final AS (
      SELECT c_custkey,
             CASE WHEN corrupt = 1
                  THEN substring(card16, 1, 15)
                       || CAST((CAST(substring(card16, 16, 1) AS INT) + 1) % 10 AS VARCHAR)
                  ELSE card16 END AS card16
      FROM full_num),
    checked AS (
      SELECT c_custkey, card16,
             CAST(list_sum(list_transform(
               list_zip(string_split(reverse(card16), ''), range(1, 17)),
               p -> CASE WHEN p[2] % 2 = 0
                         THEN CASE WHEN 2 * CAST(p[1] AS INT) > 9
                                   THEN 2 * CAST(p[1] AS INT) - 9
                                   ELSE 2 * CAST(p[1] AS INT) END
                         ELSE CAST(p[1] AS INT) END)) AS BIGINT) % 10 = 0 AS luhn_valid
      FROM final)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN luhn_valid THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(SUM(CASE WHEN NOT luhn_valid THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid
    FROM checked
    """,
)
def q17_luhn_check(spark, sf_dir):
    """Luhn validation of synthetic 16-digit identifiers (check digit
    constructed, then 9/10 corrupted): the digit fold is a pure column
    HOF — map-rate, no shuffle beyond the final 1-row count."""
    c = t(spark, sf_dir, "customer")
    body = F.lpad(
        ((F.col("c_custkey") * 7919) % F.lit(1000000000000000)).cast("string"), 15, "0"
    )

    def luhn_sum(numcol, nlen, double_odd_positions):
        # fold over reversed digits; position parity decides doubling
        pairs = F.zip_with(
            F.split(F.reverse(numcol), ""),
            F.sequence(F.lit(1), F.lit(nlen)),
            lambda ch, i: F.struct(ch.alias("ch"), i.alias("i")),
        )
        par = 1 if double_odd_positions else 0
        return F.aggregate(
            F.slice(pairs, 1, nlen),
            F.lit(0),
            lambda acc, p: acc
            + F.when(
                p["i"] % 2 == par,
                F.when(
                    2 * p["ch"].cast("int") > 9, 2 * p["ch"].cast("int") - 9
                ).otherwise(2 * p["ch"].cast("int")),
            ).otherwise(p["ch"].cast("int")),
        )
    s = luhn_sum(body, 15, True)
    card = F.concat(body, ((10 - s % 10) % 10).cast("string"))
    corrupted = F.when(
        F.col("c_custkey") % 10 == 0, card
    ).otherwise(
        F.concat(
            F.substring(card, 1, 15),
            ((F.substring(card, 16, 1).cast("int") + 1) % 10).cast("string"),
        )
    )
    checked = c.select(corrupted.alias("card16")).select(
        (luhn_sum(F.col("card16"), 16, False) % 10 == 0).alias("luhn_valid")
    )
    return checked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.sum(F.when(F.col("luhn_valid"), 1).otherwise(0)).cast("bigint").alias("n_valid"),
        F.sum(F.when(~F.col("luhn_valid"), 1).otherwise(0)).cast("bigint").alias("n_invalid"),
    )


# ---------------------------------------------------------------------------
# governance: k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
# 2007) — the release-risk check upstream of a4_privacy_agg's suppression:
# equivalence classes over the quasi-identifier pair (nation, market
# segment), with rows-at-risk below k ∈ {2, 5, 10} and the minimum
# l-diversity of the sensitive attribute (account-balance band) per class.
# One groupBy builds the class frame; the k ladder is an in-row explode
# (no join); every output is an exact integer / floor-div ppm.
# ---------------------------------------------------------------------------
@query(
    "q20_k_anonymity",
    """
    WITH cls AS (
      SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS INT)) AS BIGINT) AS l_div
      FROM customer GROUP BY 1, 2),
    ks AS (SELECT UNNEST([2, 5, 10]) AS k)
    SELECT CAST(ks.k AS INT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN c.n < ks.k THEN 1 ELSE 0 END) AS BIGINT) AS classes_below_k,
           CAST(SUM(CASE WHEN c.n < ks.k THEN c.n ELSE 0 END) AS BIGINT) AS rows_at_risk,
           CAST((SUM(CASE WHEN c.n < ks.k THEN c.n ELSE 0 END) * 1000000) // SUM(c.n)
                AS BIGINT) AS risk_ppm,
           CAST(MIN(c.l_div) AS BIGINT) AS min_l_diversity
    FROM cls c CROSS JOIN ks GROUP BY ks.k ORDER BY k
    """,
)
def q20_k_anonymity(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    cls = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct(F.floor(F.col("c_acctbal") / 1000).cast("int"))
        .cast("bigint")
        .alias("l_div"),
    )
    fan = cls.withColumn("k", F.explode(F.array(F.lit(2), F.lit(5), F.lit(10))))
    return (
        fan.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum(F.when(F.col("n") < F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("classes_below_k"),
            F.sum(F.when(F.col("n") < F.col("k"), F.col("n")).otherwise(0))
            .cast("bigint")
            .alias("rows_at_risk"),
            F.sum("n").alias("__tot"),
            F.min("l_div").cast("bigint").alias("min_l_diversity"),
        )
        .select(
            F.col("k").cast("int").alias("k"),
            "n_classes",
            "classes_below_k",
            "rows_at_risk",
            F.expr("CAST((rows_at_risk * 1000000) div __tot AS BIGINT)").alias(
                "risk_ppm"
            ),
            "min_l_diversity",
        )
        .orderBy("k")
    )
