"""TPC-H-shaped coverage extension: the remaining canonical ad-hoc query
shapes (Q2/Q9/Q11/Q12/Q16/Q19/Q20/Q21) adapted to the fixture schema.

The fixtures carry no ``partsupp`` table, so the part↔supplier bridge is
derived as ``SELECT DISTINCT l_partkey, l_suppkey FROM lineitem`` — the
observed supply relationships — and cost/availability proxies come from the
columns that exist (``s_acctbal``, ``p_retailprice``, quantities). What each
query exercises is the OPERATOR shape the reference's dbt marts lean on
(`dbt_projects/emergency_data/models/marts/*.sql` join+agg pyramids;
correlated existence checks ≈ the consistency tests in
`tests/data_quality_tests.yml`): min-per-group joined back (Q2), multi-dim
profit rollup (Q9), scalar-subquery HAVING threshold (Q11), conditional
pivot counts (Q12), NOT-IN anti join + COUNT DISTINCT (Q16), OR-bracket
predicate pushdown (Q19), semi-join chain off an aggregate gate (Q20), and
EXISTS/NOT-EXISTS correlated semi/anti pair (Q21).

Scale notes: every dim-side frame (part filters, supplier sets, the scalar
total in Q11) is broadcast — the only big-table shuffles are the
aggregations themselves; Q21's two correlated checks hash-partition on
``l_orderkey`` once and reuse that exchange for both the semi and the anti
probe.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .registry import query, t


# ---------------------------------------------------------------------------
# TPC-H Q2 shape — min-cost supplier per part: per-group MIN joined back to
# the candidate set (the classic argmin-per-key), dims broadcast.
# ---------------------------------------------------------------------------
@query(
    "tpch_q2_min_cost_supplier",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM part p
      JOIN ps ON ps.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'),
    mn AS (SELECT p_partkey, MIN(s_acctbal) AS min_bal FROM cand GROUP BY p_partkey)
    SELECT c.p_partkey, c.s_suppkey, c.s_name, c.s_acctbal, c.n_name
    FROM cand c JOIN mn ON c.p_partkey = mn.p_partkey AND c.s_acctbal = mn.min_bal
    ORDER BY c.s_acctbal DESC, c.p_partkey, c.s_suppkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    ps = l.select("l_partkey", "l_suppkey").distinct()
    pf = F.broadcast(
        p.filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")).select("p_partkey")
    )
    sn = F.broadcast(
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        ps.join(pf, ps["l_partkey"] == pf["p_partkey"])
        .join(sn, ps["l_suppkey"] == sn["s_suppkey"])
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    mn = cand.groupBy(F.col("p_partkey").alias("mn_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        cand.join(
            F.broadcast(mn),
            (cand["p_partkey"] == mn["mn_partkey"]) & (cand["s_acctbal"] == mn["min_bal"]),
        )
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_suppkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape — product-type profit by nation and year. Cost proxy:
# 40% of retail price × quantity (no partsupp.ps_supplycost in fixtures).
# ---------------------------------------------------------------------------
@query(
    "tpch_q9_product_profit",
    """
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - 0.4 * p.p_retailprice * l.l_quantity
                    AS DECIMAL(28,6))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_type = 'PROMO'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = F.broadcast(
        t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
        .select("p_partkey", "p_retailprice")
    )
    s = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    n = F.broadcast(t(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.4 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .join(s, l["l_suppkey"] == s["s_suppkey"])
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit.cast("decimal(28,6)")).cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape — important stock: per-part value vs a scalar-subquery
# fraction of the total. Value proxy: Σ p_retailprice over the part's
# observed suppliers from two nations. The total is decimal-exact so the
# threshold comparison is partitioning-independent.
# ---------------------------------------------------------------------------
@query(
    "tpch_q11_important_stock",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    sn AS (SELECT s_suppkey FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
           WHERE n.n_name IN ('NATION_1','NATION_2')),
    v AS (SELECT ps.l_partkey AS p_partkey,
                 CAST(SUM(CAST(p.p_retailprice AS DECIMAL(28,4))) AS DOUBLE) AS part_value
          FROM ps
          JOIN sn ON ps.l_suppkey = sn.s_suppkey
          JOIN part p ON p.p_partkey = ps.l_partkey
          GROUP BY ps.l_partkey)
    SELECT p_partkey, part_value FROM v
    WHERE part_value > (SELECT CAST(SUM(CAST(part_value AS DECIMAL(28,4))) AS DOUBLE) * 0.001
                        FROM v)
    ORDER BY part_value DESC, p_partkey
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    p = F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_retailprice"))
    sn = F.broadcast(
        s.join(
            F.broadcast(n.filter(F.col("n_name").isin("NATION_1", "NATION_2"))),
            s["s_nationkey"] == n["n_nationkey"],
        ).select("s_suppkey")
    )
    ps = l.select("l_partkey", "l_suppkey").distinct()
    v = (
        ps.join(sn, ps["l_suppkey"] == sn["s_suppkey"])
        .join(p, ps["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(F.col("p_retailprice").cast("decimal(28,4)")).cast("double").alias("part_value"))
    )
    # scalar subquery as a global window: |v| is part-dimension-sized, so one
    # single-partition window pass beats a 1-row broadcast cross join (which
    # plans as BroadcastNestedLoopJoin and trips the plan guard)
    w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    thr = F.sum(F.col("part_value").cast("decimal(28,4)")).over(w).cast("double") * 0.001
    return (
        v.withColumn("__thr", thr)
        .filter(F.col("part_value") > F.col("__thr"))
        .select("p_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape — late-shipment priority pivot: conditional counts by
# line status ("late" := shipped >90 days after order date; the fixture has
# no ship mode / commit date columns).
# ---------------------------------------------------------------------------
@query(
    "tpch_q12_late_priority",
    """
    SELECT l.l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_linestatus
    ORDER BY linestatus
    """,
)
def tpch_q12_late_priority(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linestatus", "l_shipdate")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("linestatus")
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape — supplier count per part descriptor, excluding a
# supplier denylist (NOT IN → anti join; exclusion proxy: negative balance).
# ---------------------------------------------------------------------------
@query(
    "tpch_q16_supplier_cnt",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_cnt(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    ps = l.select("l_partkey", "l_suppkey").distinct()
    pf = F.broadcast(
        p.filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        ).select("p_partkey", "p_brand", "p_type", "p_size")
    )
    denied = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(denied), ps["l_suppkey"] == denied["s_suppkey"], "left_anti")
        .join(pf, ps["l_partkey"] == pf["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape — OR-bracketed predicate revenue: three (brand, size,
# quantity) brackets OR'd together. Catalyst pushes the common part-side
# conjuncts into the dim scan and plans one hash join, not three.
# ---------------------------------------------------------------------------
@query(
    "tpch_q19_bracket_revenue",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_bracket_revenue(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    p = F.broadcast(t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size"))
    q = F.col("l_quantity")
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .filter(bracket)
        .agg(F.sum(rev.cast("decimal(28,6)")).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape — suppliers gated by an aggregate threshold over promo
# parts ("shipped more than N units of a promo part in 1997"); availability
# threshold is absolute (no partsupp.availqty in fixtures).
# ---------------------------------------------------------------------------
@query(
    "tpch_q20_promo_suppliers",
    """
    WITH promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
    qty AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty
      FROM lineitem
      WHERE YEAR(l_shipdate) = 1997
        AND l_partkey IN (SELECT p_partkey FROM promo)
      GROUP BY l_suppkey, l_partkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) > 60)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s JOIN qty ON s.s_suppkey = qty.l_suppkey
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20_promo_suppliers(spark, sf_dir):
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    promo = F.broadcast(
        t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    qty = (
        l.filter(F.year("l_shipdate") == 1997)
        .join(promo, l["l_partkey"] == promo["p_partkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,2)")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 60)
        .select("l_suppkey")
    )
    return (
        s.join(qty, s["s_suppkey"] == qty["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape — the correlated EXISTS / NOT EXISTS pair: suppliers who
# were the SOLE returned-flag supplier in a finished multi-supplier order.
# Both correlated probes hash on l_orderkey; the fixture has no commit/
# receipt dates, so l_returnflag='R' stands in for "kept waiting".
# ---------------------------------------------------------------------------
@query(
    "tpch_q21_sole_fault_supplier",
    """
    WITH l1 AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
    pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM pairs p2
                  WHERE p2.l_orderkey = l1.l_orderkey AND p2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l1 l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
)
def tpch_q21_sole_fault_supplier(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = F.broadcast(t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    pairs = li.select(
        F.col("l_orderkey").alias("p_orderkey"), F.col("l_suppkey").alias("p_suppkey")
    ).distinct()
    l3 = l1.select(F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey"))
    fo = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    base = l1.join(fo, l1["l_orderkey"] == fo["o_orderkey"]).select("l_orderkey", "l_suppkey")
    # EXISTS: some OTHER supplier appears in the same order
    base = base.join(
        pairs,
        (base["l_orderkey"] == pairs["p_orderkey"]) & (base["l_suppkey"] != pairs["p_suppkey"]),
        "left_semi",
    )
    # NOT EXISTS: no OTHER supplier has a returned line in the same order
    base = base.join(
        l3,
        (base["l_orderkey"] == l3["x_orderkey"]) & (base["l_suppkey"] != l3["x_suppkey"]),
        "left_anti",
    )
    return (
        base.join(s, base["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
