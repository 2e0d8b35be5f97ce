"""Randomized differential testing vs DuckDB (VERDICT r10 #2).

The fixed 275-query oracle inventory is saturated; the residual
correctness risk is UNTESTED COMPOSITIONS — decimal/null/rounding corners
of operators composed in ways no hand-paired query exercises. This module
generates seeded random query plans over the driver fixture schemas
(FIXTURES.md §A) and renders each plan TWICE: once as PySpark DataFrame
operations (the engine under test — joins/aggregates/windows built with
the DataFrame API, scalar expressions as Spark-SQL fragments) and once as
DuckDB SQL (the oracle). A case passes when both engines return the same
canonical row set (tests/oracle_harness.py semantics: columns sorted by
name, doubles rounded to 6, order-insensitive).

Dialect safety: the generator draws only from the function surface the
hand-written oracle pairs already proved dialect-stable (`s1`–`s5`
string/date/math/CASE/JSON queries): ||, upper/lower (ASCII-only
columns), substring/trim/replace/length, year/month/day, +/-/* on
integers, CASE/NULLIF/COALESCE, comparisons/IN/LIKE/BETWEEN, and the
decimal-sum ladder for aggregating doubles (SUM over DECIMAL(18,2) stays
exact in both engines; double sums are never compared directly).

Phase 2 (VERDICT r11 #2) converts four of the five formerly-excluded
hazard surfaces into TESTED BRIDGES:

- **AVG** (Spark: exact decimal avg half-up at scale 6; DuckDB: plain
  double): both sides render ``CAST(AVG(CAST(x AS DECIMAL(18,2))) AS
  DOUBLE)`` and the column (``t``-prefixed) is compared with a tolerance
  of |Δ| ≤ 2e-6 ∨ rel 1e-9 — exactly the last-digit headroom Spark's
  scale-6 rounding can consume, while any real engine bug (wrong group,
  dropped rows, NULL mishandling) still trips it.
- **bare SUM(int)** (DuckDB widens to HUGEINT): asymmetric dual render —
  Spark emits the BARE ``SUM(x)`` (native bigint) while the oracle wraps
  ``CAST(SUM(x) AS BIGINT)``, so Spark's un-cast sum surface is now on
  the tested path.
- **ROUND**: the decimal rung is bridged — ``ROUND(SUM(DECIMAL)·m, 1)``
  is exact and HALF-AWAY-FROM-ZERO in both engines (probed: DuckDB
  ``round(2.345::DECIMAL(18,3), 2) = 2.35`` matches Spark HALF_UP).
  ROUND on computed DOUBLES stays excluded: that is a real, documented
  semantic divergence (shortest-repr vs exact-binary, SEMANTICS.md §),
  not a harness gap.
- **events table** (nanosecond parquet timestamps): Spark loads through
  the engine's boundary normalizer (``queries/registry.t``: nanosAsLong
  → truncate to micros) and DuckDB's reader truncates ns → TIMESTAMP the
  same way (probed byte-equal min/max); events now participates in every
  shape, including its FK edge onto customer.

Phase 3 (VERDICT r12 #5) deepens the grammar where phase 2 stopped:

- **Three-hop FK chains** (fact → dim → dim → dim, mixed forward/
  reverse — reverse hops stay bounded by the child table's cardinality
  because the parent key is unique) and **SELF-JOINS** over the FK
  graph's non-unique keys (lineitem×lineitem on l_orderkey, orders×
  orders on o_custkey, …): the copy's columns are renamed ``sj_*`` in
  BOTH dialects, the join is the multiplying kind the reverse-FK grammar
  could never produce, and self-joined cases cap the remaining chain at
  one forward hop so candidate volume stays bucket-bounded at sf0.1.
- **DECIMAL arithmetic with scale growth**: the fixture doubles are
  2-decimal-clean (probed: 0 rows where x != round(x,2) in any double
  column), so ``CAST(x AS DECIMAL(12,2))`` is representation-exact in
  both engines and ``dec×dec`` (scale 4), ``dec±dec``, ``dec×int`` and
  ``SUM/MIN(dec×dec)`` compare exactly. Division never happens in
  decimal (DuckDB decimal ÷ anything → DOUBLE by design): the division
  rung is a DOUBLE bridge — both sides compute the identical IEEE
  ``CAST(dec AS DOUBLE) / NULLIF(CAST(dec AS DOUBLE), 0.0)``.
- **Numeric HAVING on aggregates-of-expressions**: when the first
  aggregate is integer-typed the post-aggregate filter becomes a real
  numeric predicate (``HAVING-shape WHERE c0 > k``), and SUM arguments
  draw depth-2 composed expressions.
- **ROUND on computed doubles — the LAST hazard exclusion — becomes a
  GUARDED BRIDGE**: probing 48k computed doubles at scales 0-3 found
  zero divergence away from .5 boundaries, while ulp-adjacent
  boundary values (shortest-repr ``-9.65`` stored as ``-9.6499…``)
  flip: Spark rounds the shortest-repr decimal (→ −9.6), DuckDB 1.0
  rounds the printf-style decimal value (→ −9.7). The divergence is
  confined to |frac(x·10) − 0.5| ≲ 1e-13·|x·10|, so the grammar renders
  ``CASE WHEN ABS(x*10 - FLOOR(x*10) - 0.5) > 1e-6 THEN ROUND(x, 1)
  ELSE NULL END`` identically to both engines: the guard is computed on
  the SAME double in both, the measure-zero boundary zone nulls out
  deterministically, and everything else compares exactly
  (SEMANTICS.md records the probe).

Still excluded by construction: non-ASCII casing/collation (utf8proc vs
Java locale tables — real divergence surface, not comparable), and the
ulp-wide .5-boundary zone of ROUND-on-computed-doubles (above — now a
guarded null-out instead of a blanket exclusion).

Phase 2 also widens the GRAMMAR: seeded NULL injection (a per-case
null-mask ``CASE WHEN (int_anchor % m) = r THEN NULL ELSE col END``
rendered identically to both engines — NULLs now reach predicates, join
keys, group keys, window order, and set ops, not just LEFT-JOIN/CASE/
NULLIF corners), two-join FK chains (fact → dim → dim and mixed
forward/reverse), a fourth ``setop`` shape (UNION ALL / UNION /
EXCEPT ALL / INTERSECT ALL — DataFrame union/distinct/exceptAll/
intersectAll vs the SQL set operators), and bounded window frames
(``ROWS BETWEEN k PRECEDING AND CURRENT ROW``, ``ROWS BETWEEN k
PRECEDING AND j FOLLOWING``, the default peer frame ``RANGE BETWEEN
UNBOUNDED PRECEDING AND CURRENT ROW``, LAG/LEAD at offsets 1–3).

Determinism: every random choice flows from the case seed and every
literal is drawn ONCE then rendered to both dialects (the r11 NULLIF
lesson); window functions order by ALL columns NULLS FIRST so ties occur
only between fully identical rows (the fixtures carry full-row
duplicates) and every output is deterministic as a multiset; the
null-mask anchors on int key columns so the same rows null out in both
engines.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F


# ---------------------------------------------------------------------------
# fixture schema metadata (FIXTURES.md §A; literal pools from sf0.001 stats,
# stable across scale factors since the generators are seeded)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class Col:
    name: str
    typ: str  # int | double | str | ts
    #: literal pool for predicates (cut points / enum values / dates)
    lits: tuple = ()
    #: ASCII-only content — safe for upper/lower/min/max collation
    ascii_safe: bool = True


@dataclass(frozen=True)
class Table:
    name: str
    cols: tuple
    #: unique-key columns (window total-order suffix)
    uniq: tuple

    def col(self, name: str) -> Col:
        return next(c for c in self.cols if c.name == name)


TABLES: dict[str, Table] = {
    t.name: t
    for t in (
        Table(
            "orders",
            (
                Col("o_orderkey", "int", (100, 400, 900)),
                Col("o_custkey", "int", (25, 70, 120)),
                Col("o_orderstatus", "str", ("F", "O", "P")),
                Col("o_totalprice", "double", (120000.0, 250000.0, 380000.0)),
                Col("o_orderdate", "ts", ("1996-06-01", "1998-03-15", "2000-01-01")),
                Col(
                    "o_orderpriority",
                    "str",
                    ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
                ),
            ),
            ("o_orderkey",),
        ),
        Table(
            "lineitem",
            (
                Col("l_orderkey", "int", (100, 400, 900)),
                Col("l_partkey", "int", (30, 90, 160)),
                Col("l_suppkey", "int", (2, 5, 8)),
                Col("l_linenumber", "int", (1, 2, 3)),
                Col("l_quantity", "double", (12.5, 25.5, 38.0)),
                Col("l_extendedprice", "double", (26000.0, 52000.0, 80000.0)),
                Col("l_discount", "double", (0.03, 0.05, 0.07)),
                Col("l_tax", "double", (0.02, 0.04, 0.06)),
                Col("l_returnflag", "str", ("A", "N", "R")),
                Col("l_linestatus", "str", ("F", "O")),
                Col("l_shipdate", "ts", ("1996-06-01", "1998-03-15", "2000-01-01")),
            ),
            ("l_orderkey", "l_linenumber"),
        ),
        Table(
            "customer",
            (
                Col("c_custkey", "int", (25, 70, 120)),
                Col("c_name", "str", ()),
                Col("c_nationkey", "int", (5, 12, 18)),
                Col("c_acctbal", "double", (1500.0, 4300.0, 7000.0)),
                Col(
                    "c_mktsegment",
                    "str",
                    ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"),
                ),
            ),
            ("c_custkey",),
        ),
        Table(
            "supplier",
            (
                Col("s_suppkey", "int", (2, 5, 8)),
                Col("s_name", "str", ()),
                Col("s_nationkey", "int", (5, 12, 18)),
                Col("s_acctbal", "double", (1900.0, 3100.0, 4100.0)),
            ),
            ("s_suppkey",),
        ),
        Table(
            "part",
            (
                Col("p_partkey", "int", (30, 90, 160)),
                Col("p_name", "str", ()),
                Col("p_brand", "str", ("Brand#1", "Brand#13", "Brand#2", "Brand#5")),
                Col(
                    "p_type",
                    "str",
                    ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"),
                ),
                Col("p_size", "int", (10, 22, 36)),
                Col("p_retailprice", "double", (905.0, 910.0, 915.0)),
            ),
            ("p_partkey",),
        ),
        Table(
            "nation",
            (
                Col("n_nationkey", "int", (5, 12, 18)),
                Col("n_name", "str", ("NATION_0", "NATION_1", "NATION_12", "NATION_5")),
                Col("n_regionkey", "int", (1, 2, 3)),
            ),
            ("n_nationkey",),
        ),
        Table(
            "region",
            (
                Col("r_regionkey", "int", (1, 2, 3)),
                Col(
                    "r_name",
                    "str",
                    ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"),
                ),
            ),
            ("r_regionkey",),
        ),
        Table(
            "documents",
            (
                Col("doc_id", "int", (120, 250, 380)),
                Col("text", "str", (), ascii_safe=False),
                Col("lang", "str", ("de", "en", "es", "fr", "zh")),
                Col("source", "str", ("src0", "src1", "src12", "src5")),
                Col("n_chars", "int", (180, 310, 440)),
            ),
            ("doc_id",),
        ),
        # phase 2: the nanosecond-timestamp table, bridged — Spark loads
        # through queries/registry.t (nanosAsLong → micros) and DuckDB's
        # parquet reader truncates ns → TIMESTAMP identically (probed
        # byte-equal min/max at sf0.001)
        Table(
            "events",
            (
                Col("event_id", "int", (200, 500, 800)),
                Col("ts", "ts", ("2024-01-05", "2024-01-15", "2024-01-25")),
                Col("user_id", "int", (3, 7, 12)),
                Col(
                    "event_type",
                    "str",
                    ("click", "error", "purchase", "signup", "view"),
                ),
                Col("value", "double", (50.0, 120.0, 250.0)),
                Col("props", "str", ()),
            ),
            ("event_id",),
        ),
    )
}

#: FK edges (left_table, left_col, right_table, right_col) — join the
#: right (dimension/parent) side onto the left
FKS = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
)

#: phase 3 — self-join keys per table: non-unique, group-size-bounded at
#: sf0.1 (lines/order ~4, orders/customer ~10, rows/nation and
#: rows/region fixed small for supplier and nation)
_SELF_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_custkey",
    "customer": "c_nationkey",
    "supplier": "s_nationkey",
    "nation": "n_regionkey",
}


@dataclass
class Expr:
    """A scalar expression rendered for both dialects."""

    spark: str
    duck: str
    typ: str

    @classmethod
    def same(cls, sql: str, typ: str) -> "Expr":
        return cls(sql, sql, typ)


@dataclass
class Case:
    """One generated differential case: a DataFrame builder + oracle SQL."""

    seed: int
    duck_sql: str
    build: object = field(repr=False)  # Callable[[SparkSession, str], DataFrame]
    shape: str = ""


class _Gen:
    """Seeded plan generator. All choices flow from ``self.r``."""

    def __init__(self, seed: int):
        self.r = random.Random(seed)
        self.seed = seed

    # -- NULL injection (phase 2) --------------------------------------------
    def gen_masks(self, table: Table) -> dict:
        """Seeded null-mask for ≤2 of a table's columns: ``CASE WHEN
        (int_anchor % m) = v THEN NULL ELSE col END``, one expression
        string rendered verbatim to BOTH dialects (drawn once — the r11
        NULLIF dual-render lesson). The anchor column itself is never
        masked, so the same rows null out deterministically in both
        engines."""
        int_anchors = [c for c in table.cols if c.typ == "int"]
        if not int_anchors or self.r.random() >= 0.4:
            return {}
        anchor = self.r.choice(int_anchors).name
        maskable = [c for c in table.cols if c.name != anchor]
        if not maskable:
            return {}
        chosen = self.r.sample(maskable, min(self.r.randint(1, 2), len(maskable)))
        out = {}
        for c in chosen:
            m = self.r.randint(2, 5)
            v = self.r.randint(0, m - 1)
            out[c.name] = (
                f"CASE WHEN ({anchor} % {m}) = {v} THEN NULL ELSE {c.name} END"
            )
        return out

    # -- scalar expressions -------------------------------------------------
    def _col(self, env: list[Col], typ: str) -> Col | None:
        opts = [c for c in env if c.typ == typ]
        return self.r.choice(opts) if opts else None

    def gen_int(self, env: list[Col], d: int) -> Expr:
        c = self._col(env, "int")
        choices = ["lit"] + (["col"] * 4 if c is not None else [])
        if d > 0:
            choices += ["add", "sub", "mul", "case", "datepart", "len", "nullif"]
        k = self.r.choice(choices)
        if k == "col":
            return Expr.same(c.name, "int")
        if k == "lit":
            return Expr.same(str(self.r.randint(0, 50)), "int")
        if k == "add":
            a, b = self.gen_int(env, d - 1), self.gen_int(env, d - 1)
            return Expr(f"({a.spark} + {b.spark})", f"({a.duck} + {b.duck})", "int")
        if k == "sub":
            a, b = self.gen_int(env, d - 1), self.gen_int(env, d - 1)
            return Expr(f"({a.spark} - {b.spark})", f"({a.duck} - {b.duck})", "int")
        if k == "mul":
            a = self.gen_int(env, d - 1)
            m = self.r.randint(2, 7)
            return Expr(f"({a.spark} * {m})", f"({a.duck} * {m})", "int")
        if k == "case":
            p = self.gen_pred(env, d - 1)
            a, b = self.gen_int(env, d - 1), self.gen_int(env, d - 1)
            els = b.spark if self.r.random() < 0.8 else "NULL"
            els_d = b.duck if els != "NULL" else "NULL"
            return Expr(
                f"(CASE WHEN {p.spark} THEN {a.spark} ELSE {els} END)",
                f"(CASE WHEN {p.duck} THEN {a.duck} ELSE {els_d} END)",
                "int",
            )
        if k == "datepart":
            tc = self._col(env, "ts")
            if tc is None:
                return self.gen_int(env, 0)
            fn = self.r.choice(("year", "month", "day"))
            return Expr(
                f"CAST({fn}({tc.name}) AS INT)",
                f"CAST({fn}({tc.name}) AS INT)",
                "int",
            )
        if k == "len":
            s = self.gen_str(env, 0)
            return Expr(
                f"CAST(length({s.spark}) AS INT)",
                f"CAST(length({s.duck}) AS INT)",
                "int",
            )
        if k == "nullif":
            a = self.gen_int(env, 0)
            lit = self.r.randint(0, 10)
            return Expr(
                f"NULLIF({a.spark}, {lit})",
                f"NULLIF({a.duck}, {lit})",
                "int",
            )
        raise AssertionError(k)

    def gen_str(self, env: list[Col], d: int) -> Expr:
        c = self._col(env, "str")
        choices = ["lit"] + (["col"] * 4 if c is not None else [])
        if d > 0 and c is not None:
            choices += ["upper", "lower", "concat", "substr", "trim", "replace", "case"]
        k = self.r.choice(choices)
        if k == "col":
            return Expr.same(c.name, "str")
        if k == "lit":
            return Expr.same(f"'{self.r.choice(('x', 'yy', 'Z_', 'a1'))}'", "str")
        if k in ("upper", "lower"):
            # ASCII-only columns: Java vs utf8proc casing diverges on
            # locale-sensitive codepoints
            ac = self._col([c2 for c2 in env if c2.ascii_safe], "str")
            if ac is None:
                return self.gen_str(env, 0)
            return Expr.same(f"{k}({ac.name})", "str")
        if k == "concat":
            a, b = self.gen_str(env, d - 1), self.gen_str(env, d - 1)
            return Expr(f"({a.spark} || {b.spark})", f"({a.duck} || {b.duck})", "str")
        if k == "substr":
            a = self.gen_str(env, d - 1)
            p, ln = self.r.randint(1, 3), self.r.randint(1, 8)
            return Expr(
                f"substring({a.spark}, {p}, {ln})",
                f"substring({a.duck}, {p}, {ln})",
                "str",
            )
        if k == "trim":
            a = self.gen_str(env, d - 1)
            if self.r.random() < 0.4:
                fn = self.r.choice(("lpad", "rpad"))
                n = self.r.randint(3, 12)
                pad = self.r.choice(("_", "0", "ab"))
                return Expr(
                    f"{fn}({a.spark}, {n}, '{pad}')",
                    f"{fn}({a.duck}, {n}, '{pad}')",
                    "str",
                )
            return Expr(f"trim({a.spark})", f"trim({a.duck})", "str")
        if k == "replace":
            a = self.gen_str(env, d - 1)
            frm = self.r.choice(("a", "e", "1", "N"))
            to = self.r.choice(("", "_", "xx"))
            return Expr(
                f"replace({a.spark}, '{frm}', '{to}')",
                f"replace({a.duck}, '{frm}', '{to}')",
                "str",
            )
        if k == "case":
            p = self.gen_pred(env, d - 1)
            a, b = self.gen_str(env, d - 1), self.gen_str(env, d - 1)
            return Expr(
                f"(CASE WHEN {p.spark} THEN {a.spark} ELSE {b.spark} END)",
                f"(CASE WHEN {p.duck} THEN {a.duck} ELSE {b.duck} END)",
                "str",
            )
        raise AssertionError(k)

    def gen_pred(self, env: list[Col], d: int) -> Expr:
        kinds = ["int_cmp", "str_eq"]
        ic = [c for c in env if c.typ == "int" and c.lits]
        sc = [c for c in env if c.typ == "str" and c.lits]
        dc = [c for c in env if c.typ == "double" and c.lits]
        tc = [c for c in env if c.typ == "ts" and c.lits]
        if dc:
            kinds.append("dbl_cmp")
        if tc:
            kinds += ["ts_cmp", "ts_between"]
        if sc:
            kinds += ["str_in", "str_like"]
        if d > 0:
            kinds += ["and", "or", "not"]
        k = self.r.choice(kinds)
        if k == "int_cmp":
            if ic and self.r.random() < 0.7:
                c = self.r.choice(ic)
                if self.r.random() < 0.2 and len(c.lits) >= 2:
                    lo, hi = sorted(self.r.sample(list(c.lits), 2))
                    return Expr.same(f"({c.name} BETWEEN {lo} AND {hi})", "bool")
                op = self.r.choice(("<", "<=", ">", ">=", "=", "<>"))
                lit = self.r.choice(c.lits)
                return Expr.same(f"({c.name} {op} {lit})", "bool")
            a, b = self.gen_int(env, 0), self.gen_int(env, 0)
            op = self.r.choice(("<", "<=", ">", ">=", "=", "<>"))
            return Expr(f"({a.spark} {op} {b.spark})", f"({a.duck} {op} {b.duck})", "bool")
        if k == "dbl_cmp":
            c = self.r.choice(dc)
            op = self.r.choice(("<", "<=", ">", ">="))
            return Expr.same(f"({c.name} {op} {self.r.choice(c.lits)})", "bool")
        if k == "ts_cmp":
            c = self.r.choice(tc)
            op = self.r.choice(("<", ">=", ">"))
            return Expr.same(
                f"({c.name} {op} TIMESTAMP '{self.r.choice(c.lits)}')", "bool"
            )
        if k == "ts_between":
            c = self.r.choice(tc)
            lo, hi = sorted(self.r.sample(list(c.lits), 2))
            return Expr.same(
                f"({c.name} BETWEEN TIMESTAMP '{lo}' AND TIMESTAMP '{hi}')", "bool"
            )
        if k == "str_eq":
            if sc:
                c = self.r.choice(sc)
                return Expr.same(f"({c.name} = '{self.r.choice(c.lits)}')", "bool")
            a = self.gen_str(env, 0)
            return Expr(f"({a.spark} = 'x')", f"({a.duck} = 'x')", "bool")
        if k == "str_in":
            c = self.r.choice(sc)
            vals = self.r.sample(list(c.lits), min(len(c.lits), self.r.randint(1, 3)))
            inl = ", ".join(f"'{v}'" for v in vals)
            return Expr.same(f"({c.name} IN ({inl}))", "bool")
        if k == "str_like":
            c = self.r.choice(sc)
            v = self.r.choice(c.lits)
            pat = v[: self.r.randint(1, max(1, len(v) - 1))] + "%"
            return Expr.same(f"({c.name} LIKE '{pat}')", "bool")
        if k == "and":
            a, b = self.gen_pred(env, d - 1), self.gen_pred(env, d - 1)
            return Expr(f"({a.spark} AND {b.spark})", f"({a.duck} AND {b.duck})", "bool")
        if k == "or":
            a, b = self.gen_pred(env, d - 1), self.gen_pred(env, d - 1)
            return Expr(f"({a.spark} OR {b.spark})", f"({a.duck} OR {b.duck})", "bool")
        if k == "not":
            a = self.gen_pred(env, d - 1)
            return Expr(f"(NOT {a.spark})", f"(NOT {a.duck})", "bool")
        raise AssertionError(k)

    def gen_scalar(self, env: list[Col], d: int) -> Expr:
        roll = self.r.random()
        if roll < 0.18 and any(c.typ == "double" for c in env):
            return self.gen_dec(env, d)
        return self.gen_int(env, d) if roll < 0.6 else self.gen_str(env, d)

    # -- decimal arithmetic / guarded-ROUND grammar (phase 3) -----------------
    def gen_dec(self, env: list[Col], d: int) -> Expr:
        """Decimal-arithmetic scalar (phase 3). Sound because the fixture
        doubles are 2-decimal-clean, so the DECIMAL(12,2) cast is
        representation-exact in both engines (see module docstring);
        division and ROUND go through their double bridges."""
        a = self._col(env, "double")
        b = self._col(env, "double")
        if a is None or b is None:
            return self.gen_int(env, d)
        k = self.r.choice(
            ("mul", "add", "sub", "mul_int", "div_bridge", "round_bridge")
        )
        A = f"CAST({a.name} AS DECIMAL(12,2))"
        B = f"CAST({b.name} AS DECIMAL(12,2))"
        if k == "mul":  # (12,2)×(12,2) → scale-4 product, exact both sides
            return Expr.same(f"({A} * {B})", "dec")
        if k == "add":
            return Expr.same(f"({A} + {B})", "dec")
        if k == "sub":
            return Expr.same(f"({A} - {B})", "dec")
        if k == "mul_int":
            m = self.r.randint(2, 9)
            return Expr.same(f"({A} * {m})", "dec")
        if k == "div_bridge":
            # DuckDB has no decimal division (dec ÷ x → DOUBLE); both
            # sides perform the identical IEEE double division instead
            return Expr.same(
                f"(CAST({A} AS DOUBLE) / NULLIF(CAST({B} AS DOUBLE), 0.0))",
                "dbl",
            )
        # round_bridge: ROUND on a COMPUTED double, guarded against the
        # ulp-wide .5-boundary zone where the engines' rounding models
        # genuinely diverge (module docstring / SEMANTICS.md)
        xk = self.r.choice(("add", "sub", "mul", "mul_int"))
        m = self.r.randint(2, 9)
        x = {
            "add": f"({a.name} + {b.name})",
            "sub": f"({a.name} - {b.name})",
            "mul": f"({a.name} * {b.name})",
            "mul_int": f"({a.name} * {m})",
        }[xk]
        return Expr.same(
            f"(CASE WHEN ABS({x} * 10.0 - FLOOR({x} * 10.0) - 0.5) > 0.000001"
            f" THEN ROUND({x}, 1) ELSE NULL END)",
            "dbl",
        )

    # -- aggregates ---------------------------------------------------------
    def gen_agg(self, env: list[Col]) -> Expr:
        k = self.r.choice(
            ("count", "count_distinct", "min_int", "max_int", "sum_int",
             "min_str", "max_str", "min_ts", "max_ts", "sum_dec",
             "min_dbl", "max_dbl", "sum_int_bare", "avg_dec", "round_dec",
             "sum_dec_mul", "min_dec_mul")
        )
        ic = self._col(env, "int")
        if k in ("sum_dec_mul", "min_dec_mul"):
            # phase 3: aggregate over a scale-growing decimal product —
            # the TPC-H revenue idiom, exact in both engines because the
            # DECIMAL(12,2) casts are representation-exact on the
            # 2-decimal-clean fixture doubles
            a = self._col(env, "double")
            b = self._col(env, "double")
            if a is None or b is None:
                return Expr.same("CAST(COUNT(*) AS BIGINT)", "int")
            fn = "SUM" if k == "sum_dec_mul" else "MIN"
            return Expr.same(
                f"{fn}(CAST({a.name} AS DECIMAL(12,2))"
                f" * CAST({b.name} AS DECIMAL(12,2)))",
                "dec",
            )
        if k == "sum_int_bare":
            # phase-2 bridge (HUGEINT exclusion): Spark's BARE SUM(int) —
            # natively bigint — vs the oracle's explicitly narrowed
            # CAST(SUM AS BIGINT); asymmetric dual render by design.
            # phase 3: depth-2 argument (aggregate-of-expression)
            a = self.gen_int(env, 2)
            return Expr(f"SUM({a.spark})", f"CAST(SUM({a.duck}) AS BIGINT)", "int")
        if k == "avg_dec":
            # phase-2 bridge (AVG exclusion): exact decimal input both
            # sides; Spark's decimal avg rounds half-up at scale 6, DuckDB
            # returns the full double — compared tolerantly (|Δ| ≤ 2e-6 ∨
            # rel 1e-9) via the t-prefixed column contract in run_case
            dcol = self._col(env, "double")
            if dcol is None:
                return Expr.same("CAST(COUNT(*) AS BIGINT)", "int")
            sql = f"CAST(AVG(CAST({dcol.name} AS DECIMAL(18,2))) AS DOUBLE)"
            return Expr(sql, sql, "dbl_tol")
        if k == "round_dec":
            # phase-2 bridge (ROUND exclusion, decimal rung): all-decimal
            # arithmetic is exact and rounds HALF-AWAY-FROM-ZERO in both
            # engines; the computed-DOUBLE rung stays excluded
            # (shortest-repr vs exact-binary, SEMANTICS.md)
            dcol = self._col(env, "double")
            if dcol is None:
                return Expr.same("CAST(COUNT(*) AS BIGINT)", "int")
            m = self.r.randint(2, 9)
            sql = f"ROUND(SUM(CAST({dcol.name} AS DECIMAL(18,2))) * {m}, 1)"
            return Expr(sql, sql, "dec")
        if k in ("min_dbl", "max_dbl"):
            # min/max of a stored double is an exact parquet value — safe
            # to compare (no arithmetic, both engines return the same bits)
            dcol = self._col(env, "double")
            if dcol is None:
                return Expr.same("CAST(COUNT(*) AS BIGINT)", "int")
            return Expr.same(f"{k[:3].upper()}({dcol.name})", "dbl")
        if k == "count":
            return Expr.same("CAST(COUNT(*) AS BIGINT)", "int")
        if k == "count_distinct" and ic is not None:
            return Expr.same(f"CAST(COUNT(DISTINCT {ic.name}) AS BIGINT)", "int")
        if k in ("min_int", "max_int") and ic is not None:
            fn = k[:3].upper()
            return Expr.same(f"CAST({fn}({ic.name}) AS BIGINT)", "int")
        if k == "sum_int":
            a = self.gen_int(env, 2)  # phase 3: aggregate-of-expression
            return Expr(
                f"CAST(SUM({a.spark}) AS BIGINT)",
                f"CAST(SUM({a.duck}) AS BIGINT)",
                "int",
            )
        if k in ("min_str", "max_str"):
            sc = self._col([c for c in env if c.ascii_safe], "str")
            if sc is None:
                return Expr.same("CAST(COUNT(*) AS BIGINT)", "int")
            return Expr.same(f"{k[:3].upper()}({sc.name})", "str")
        if k in ("min_ts", "max_ts"):
            tcol = self._col(env, "ts")
            if tcol is None:
                return Expr.same("CAST(COUNT(*) AS BIGINT)", "int")
            return Expr.same(f"{k[:3].upper()}({tcol.name})", "ts")
        if k == "sum_dec":
            dcol = self._col(env, "double")
            if dcol is None:
                return Expr.same("CAST(COUNT(*) AS BIGINT)", "int")
            # exact decimal sum in BOTH engines; compared as Decimal
            return Expr.same(f"SUM(CAST({dcol.name} AS DECIMAL(18,2)))", "dec")
        return Expr.same("CAST(COUNT(*) AS BIGINT)", "int")

    # -- window expressions ---------------------------------------------------
    def gen_window(self, env: list[Col], part: Expr, order_sql: str) -> Expr:
        k = self.r.choice(
            ("row_number", "rank", "lag", "lead", "run_sum",
             "bounded_sum", "centered_agg", "peer_sum")
        )
        over = f"OVER (PARTITION BY {part.spark} ORDER BY {order_sql})"
        over_d = f"OVER (PARTITION BY {part.duck} ORDER BY {order_sql})"
        if k == "row_number":
            return Expr(
                f"CAST(ROW_NUMBER() {over} AS BIGINT)",
                f"CAST(ROW_NUMBER() {over_d} AS BIGINT)",
                "int",
            )
        if k == "rank":
            return Expr(
                f"CAST(RANK() {over} AS BIGINT)",
                f"CAST(RANK() {over_d} AS BIGINT)",
                "int",
            )
        if k in ("lag", "lead"):
            a = self.gen_int(env, 1)
            fn = k.upper()
            off = self.r.randint(1, 3)  # phase 2: offsets past the frontier
            return Expr(
                f"{fn}({a.spark}, {off}) {over}",
                f"{fn}({a.duck}, {off}) {over_d}",
                "int",
            )
        if k == "run_sum":
            a = self.gen_int(env, 1)
            frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            return Expr(
                f"CAST(SUM({a.spark}) OVER (PARTITION BY {part.spark}"
                f" ORDER BY {order_sql} {frame}) AS BIGINT)",
                f"CAST(SUM({a.duck}) OVER (PARTITION BY {part.duck}"
                f" ORDER BY {order_sql} {frame}) AS BIGINT)",
                "int",
            )
        if k == "bounded_sum":
            # phase 2: bounded trailing frame — deterministic as a multiset
            # because ties in the all-column order occur only between
            # FULL-ROW duplicates, which are interchangeable in any frame
            a = self.gen_int(env, 1)
            kk = self.r.randint(1, 4)
            frame = f"ROWS BETWEEN {kk} PRECEDING AND CURRENT ROW"
            return Expr(
                f"CAST(SUM({a.spark}) OVER (PARTITION BY {part.spark}"
                f" ORDER BY {order_sql} {frame}) AS BIGINT)",
                f"CAST(SUM({a.duck}) OVER (PARTITION BY {part.duck}"
                f" ORDER BY {order_sql} {frame}) AS BIGINT)",
                "int",
            )
        if k == "centered_agg":
            # phase 2: centered frame with a FOLLOWING edge
            a = self.gen_int(env, 1)
            kk, jj = self.r.randint(1, 3), self.r.randint(1, 3)
            fn = self.r.choice(("SUM", "MIN", "MAX", "COUNT"))
            frame = f"ROWS BETWEEN {kk} PRECEDING AND {jj} FOLLOWING"
            arg = a.spark if fn != "COUNT" else "*"
            arg_d = a.duck if fn != "COUNT" else "*"
            return Expr(
                f"CAST({fn}({arg}) OVER (PARTITION BY {part.spark}"
                f" ORDER BY {order_sql} {frame}) AS BIGINT)",
                f"CAST({fn}({arg_d}) OVER (PARTITION BY {part.duck}"
                f" ORDER BY {order_sql} {frame}) AS BIGINT)",
                "int",
            )
        if k == "peer_sum":
            # phase 2: the default PEER frame (RANGE UNBOUNDED→CURRENT) —
            # peers (identical rows under the all-column order) share one
            # value in both engines, so it is fully deterministic
            a = self.gen_int(env, 1)
            frame = "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            return Expr(
                f"CAST(SUM({a.spark}) OVER (PARTITION BY {part.spark}"
                f" ORDER BY {order_sql} {frame}) AS BIGINT)",
                f"CAST(SUM({a.duck}) OVER (PARTITION BY {part.duck}"
                f" ORDER BY {order_sql} {frame}) AS BIGINT)",
                "int",
            )
        raise AssertionError(k)


def generate_case(seed: int) -> Case:
    """Generate one differential case from ``seed``: a random
    scan → [filter] → [join] → (project | aggregate | window) plan,
    rendered as a Spark DataFrame builder and as DuckDB oracle SQL."""
    g = _Gen(seed)
    r = g.r

    base = TABLES[r.choice(list(TABLES))]
    env: list[Col] = list(base.cols)
    uniq: list[str] = list(base.uniq)

    # phase 2: seeded NULL injection — the mask is ONE expression string
    # rendered to both dialects, anchored on an int column so the same
    # rows null out in both engines (fixtures carry no native NULLs)
    base_masks = g.gen_masks(base)
    base_pred = g.gen_pred(env, 1) if r.random() < 0.65 else None

    # phase 3: SELF-JOIN over a non-unique FK-graph key — the copy's
    # columns are renamed sj_* in BOTH dialects. The multiplying join the
    # reverse-FK grammar can't produce; keys chosen so the blow-up stays
    # group-size-bounded at sf0.1 (lines per order ~4, orders per
    # customer ~10, rows per nation/region fixed). A self-joined case
    # caps the remaining chain at ONE forward hop.
    self_join = None
    self_key = _SELF_KEYS.get(base.name)
    if self_key is not None and r.random() < 0.18:
        spred = g.gen_pred(list(base.cols), 1) if r.random() < 0.5 else None
        self_join = (self_key, "sj_", spred)
        env = env + [
            Col("sj_" + c.name, c.typ, c.lits, c.ascii_safe) for c in base.cols
        ]
        uniq = uniq + ["sj_" + u for u in base.uniq]

    # phase 3: up to THREE chained FK joins (fact → dim → dim → dim, or
    # mixed forward/reverse) — the join key of a later hop may come from
    # any table already inner/left-joined into the accumulated frame.
    # Reverse hops are row-bounded by the child table (parent keys are
    # unique), so even triple chains stay fixture-scale; after a
    # self-join only forward (1:1) hops are allowed.
    joins: list[tuple] = []
    used = {base.name}
    avail = {base.name}
    hop_p = (0.55, 0.4, 0.25) if self_join is None else (0.4,)
    for p_join in hop_p:
        if r.random() >= p_join:
            break
        fk_opts: list[tuple] = []
        for lt, lc, rt, rc in FKS:
            if lt in avail and rt not in used:
                fk_opts.append((lc, TABLES[rt], rc, False))
            if rt in avail and lt not in used and self_join is None:
                # reverse edge: join the child/fact side onto this parent —
                # a 1-many join (parent keys repeat); extend the unique key
                fk_opts.append((rc, TABLES[lt], lc, True))
        if not fk_opts:
            break
        lc, other, rc, rev = r.choice(fk_opts)
        how = (
            r.choice(("inner", "left_semi", "left_anti"))
            if rev
            else r.choice(("inner", "left", "left_semi", "left_anti"))
        )
        omasks = g.gen_masks(other)
        right_pred = g.gen_pred(list(other.cols), 1) if r.random() < 0.5 else None
        joins.append((other, lc, rc, how, right_pred, omasks))
        used.add(other.name)
        if how in ("inner", "left"):
            env = env + list(other.cols)
            avail.add(other.name)
            if rev:
                uniq = uniq + [u for u in other.uniq if u not in uniq]

    shape = r.choices(
        ("project", "aggregate", "window", "setop"), weights=(3, 4, 3, 2)
    )[0]

    # ---- rendering --------------------------------------------------------
    def scan_sql(table: Table, masks: dict) -> str:
        if not masks:
            return table.name
        cols = ", ".join(
            f"{masks[c.name]} AS {c.name}" if c.name in masks else c.name
            for c in table.cols
        )
        return f"(SELECT {cols} FROM {table.name})"

    def sub_sql() -> str:
        cur = f"SELECT * FROM {scan_sql(base, base_masks)}"
        if base_pred is not None:
            cur += f" WHERE {base_pred.duck}"
        cur = f"({cur})"
        if self_join is not None:
            key, pref, spred = self_join
            ren = ", ".join(f"{c.name} AS {pref}{c.name}" for c in base.cols)
            o = f"SELECT {ren} FROM {base.name}"
            if spred is not None:
                o += f" WHERE {spred.duck}"
            cur = (
                f"(SELECT * FROM {cur} fz_sl JOIN ({o}) fz_sr"
                f" ON fz_sl.{key} = fz_sr.{pref}{key})"
            )
        for i, (other, lc, rc, how, right_pred, omasks) in enumerate(joins):
            o = f"SELECT * FROM {scan_sql(other, omasks)}"
            if right_pred is not None:
                o += f" WHERE {right_pred.duck}"
            if how in ("left_semi", "left_anti"):
                ex = "EXISTS" if how == "left_semi" else "NOT EXISTS"
                cur = (
                    f"(SELECT * FROM {cur} fz_l{i} WHERE {ex} "
                    f"(SELECT 1 FROM ({o}) fz_r{i}"
                    f" WHERE fz_l{i}.{lc} = fz_r{i}.{rc}))"
                )
            else:
                jt = "JOIN" if how == "inner" else "LEFT JOIN"
                cur = (
                    f"(SELECT * FROM {cur} fz_l{i} {jt} ({o}) fz_r{i}"
                    f" ON fz_l{i}.{lc} = fz_r{i}.{rc})"
                )
        return cur

    def build_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .queries.registry import t as load

        df = load(spark, sf_dir, base.name)
        for cname, msql in base_masks.items():
            df = df.withColumn(cname, F.expr(msql))
        if base_pred is not None:
            df = df.filter(F.expr(base_pred.spark))
        if self_join is not None:
            key, pref, spred = self_join
            sdf = load(spark, sf_dir, base.name)
            if spred is not None:
                sdf = sdf.filter(F.expr(spred.spark))
            sdf = sdf.select(
                *[F.col(c.name).alias(pref + c.name) for c in base.cols]
            )
            df = df.join(sdf, df[key] == sdf[pref + key], "inner")
        for other, lc, rc, how, right_pred, omasks in joins:
            odf = load(spark, sf_dir, other.name)
            for cname, msql in omasks.items():
                odf = odf.withColumn(cname, F.expr(msql))
            if right_pred is not None:
                odf = odf.filter(F.expr(right_pred.spark))
            df = df.join(odf, df[lc] == odf[rc], how)
        return df

    if shape == "project":
        n = r.randint(2, 5)
        exprs = [g.gen_scalar(env, 2) for _ in range(n)]
        distinct = r.random() < 0.25
        sel = ", ".join(f"{e.duck} AS c{i}" for i, e in enumerate(exprs))
        dk = "DISTINCT " if distinct else ""
        duck = f"SELECT {dk}{sel} FROM {sub_sql()} fz"

        def build(spark, sf_dir, exprs=exprs, distinct=distinct):
            df = build_sub(spark, sf_dir).select(
                *[F.expr(e.spark).alias(f"c{i}") for i, e in enumerate(exprs)]
            )
            return df.distinct() if distinct else df

    elif shape == "aggregate":
        nk = r.randint(0, 2)
        key_env = [c for c in env if c.typ in ("int", "str") and c.lits]
        keys = []
        for _ in range(nk):
            if key_env and r.random() < 0.7:
                kc = r.choice(key_env)
                keys.append(Expr.same(kc.name, kc.typ))
            else:
                keys.append(g.gen_int(env, 1))
        na = r.randint(1, 3)
        aggs = [g.gen_agg(env) for _ in range(na)]
        # tolerance contract: AVG-bridge columns are t-prefixed so
        # run_case compares them with the |Δ| ≤ 2e-6 ∨ rel 1e-9 band
        anames = [
            ("t" if a.typ == "dbl_tol" else "c") + str(i) for i, a in enumerate(aggs)
        ]
        having = r.random() < 0.35 and aggs[0].typ != "dbl_tol"
        key_sel = ", ".join(f"{k.duck} AS k{i}" for i, k in enumerate(keys))
        agg_sel = ", ".join(f"{a.duck} AS {nm}" for a, nm in zip(aggs, anames))
        sel = ", ".join(x for x in (key_sel, agg_sel) if x)
        duck = f"SELECT {sel} FROM {sub_sql()} fz"
        if keys:
            duck += " GROUP BY " + ", ".join(str(i + 1) for i in range(len(keys)))
        # post-aggregate filter (the HAVING shape). Phase 3: when the
        # first aggregate is integer-typed the cut is a REAL numeric
        # predicate over the aggregate-of-expression (both dialects
        # identical; NULL > k is not-true in both); otherwise the
        # phase-2 stringified cut applies.
        hv_num = aggs[0].typ == "int"
        hv_cut = (
            str(r.choice((0, 2, 10, 100, 5000)))
            if hv_num
            else r.choice(("1", "3", "A", "2"))
        )
        if having and keys:
            if hv_num:
                duck = f"SELECT * FROM ({duck}) fz_h WHERE {anames[0]} > {hv_cut}"
            else:
                duck = (
                    f"SELECT * FROM ({duck}) fz_h"
                    f" WHERE CAST({anames[0]} AS VARCHAR) >= '{hv_cut}'"
                )
        else:
            having = False

        def build(spark, sf_dir, keys=keys, aggs=aggs, having=having,
                  hv_num=hv_num, hv_cut=hv_cut, anames=anames):
            df = build_sub(spark, sf_dir)
            acols = [
                F.expr(a.spark).alias(nm) for a, nm in zip(aggs, anames)
            ]
            if keys:
                out = df.groupBy(
                    *[F.expr(k.spark).alias(f"k{i}") for i, k in enumerate(keys)]
                ).agg(*acols)
            else:
                out = df.agg(*acols)
            if having:
                if hv_num:
                    out = out.filter(F.expr(f"{anames[0]} > {hv_cut}"))
                else:
                    out = out.filter(
                        F.expr(f"CAST({anames[0]} AS STRING) >= '{hv_cut}'")
                    )
            return out

    elif shape == "setop":
        # phase 2: set operations — two differently-filtered branches of
        # the SAME sub-plan, projected through ONE shared expression list
        # (drawn once, rendered to both dialects), composed with the four
        # multiset/distinct operators. Spark: unionAll / unionAll+distinct
        # / exceptAll / intersectAll; DuckDB: the SQL set operators. Both
        # engines treat NULLs as equal in set-op grouping (probed).
        op = r.choice(("union_all", "union", "except_all", "intersect_all"))
        n = r.randint(2, 4)
        exprs = [g.gen_scalar(env, 2) for _ in range(n)]
        p1 = g.gen_pred(env, 1)
        p2 = g.gen_pred(env, 1)
        sel = ", ".join(f"{e.duck} AS c{i}" for i, e in enumerate(exprs))
        kw = {
            "union_all": "UNION ALL",
            "union": "UNION",
            "except_all": "EXCEPT ALL",
            "intersect_all": "INTERSECT ALL",
        }[op]
        sub = sub_sql()
        duck = (
            f"SELECT {sel} FROM {sub} fz1 WHERE {p1.duck}"
            f" {kw} "
            f"SELECT {sel} FROM {sub} fz2 WHERE {p2.duck}"
        )

        def build(spark, sf_dir, exprs=exprs, p1=p1, p2=p2, op=op):
            df = build_sub(spark, sf_dir)
            cols = [F.expr(e.spark).alias(f"c{i}") for i, e in enumerate(exprs)]
            d1 = df.filter(F.expr(p1.spark)).select(*cols)
            d2 = df.filter(F.expr(p2.spark)).select(*cols)
            if op == "union_all":
                return d1.unionAll(d2)
            if op == "union":
                return d1.unionAll(d2).distinct()
            if op == "except_all":
                return d1.exceptAll(d2)
            return d1.intersectAll(d2)

    else:  # window
        part_env = [c for c in env if c.typ in ("int", "str") and c.lits]
        if part_env:
            pc = r.choice(part_env)
            part = Expr.same(pc.name, pc.typ)
        else:
            part = g.gen_int(env, 1)
        # ORDER BY every available column: the synthetic fixtures carry
        # full-row duplicates (even (l_orderkey, l_linenumber) repeats), so
        # a short key leaves LAG/LEAD legitimately nondeterministic — the
        # fuzzer's first real finding (seeds 37/366) was this harness
        # assumption, not an engine bug. With ties confined to IDENTICAL
        # rows, every window function's output is deterministic as a
        # multiset, which is what the order-insensitive compare checks.
        # NULLS FIRST pins the one dialect default that differs (Spark ASC
        # = NULLS FIRST, DuckDB ASC = NULLS LAST — matters under LEFT JOIN
        # null-extension).
        order_cols = [c.name for c in env]
        order_sql = ", ".join(f"{c} ASC NULLS FIRST" for c in order_cols)
        nw = r.randint(1, 2)
        wexprs = [g.gen_window(env, part, order_sql) for _ in range(nw)]
        plain = [g.gen_scalar(env, 1)]
        sel_parts = [f"{part.duck} AS k0"]
        sel_parts += [f"{e.duck} AS p{i}" for i, e in enumerate(plain)]
        sel_parts += [f"{w.duck} AS w{i}" for i, w in enumerate(wexprs)]
        # carry the head of the key so rows stay distinguishable for the
        # order-insensitive compare
        carry = list(uniq)[:2]
        sel_parts += [f"{u} AS u{i}" for i, u in enumerate(carry)]
        duck = f"SELECT {', '.join(sel_parts)} FROM {sub_sql()} fz"

        def build(spark, sf_dir, part=part, plain=plain, wexprs=wexprs,
                  carry=carry):
            df = build_sub(spark, sf_dir)
            cols = [F.expr(part.spark).alias("k0")]
            cols += [F.expr(e.spark).alias(f"p{i}") for i, e in enumerate(plain)]
            cols += [F.expr(w.spark).alias(f"w{i}") for i, w in enumerate(wexprs)]
            cols += [F.col(u).alias(f"u{i}") for i, u in enumerate(carry)]
            return df.select(*cols)

    join_tag = ("+self" if self_join is not None else "") + "".join(
        f"+{j[3]}:{j[0].name}" for j in joins
    )
    mask_tag = "~null" if (base_masks or any(j[5] for j in joins)) else ""
    return Case(
        seed=seed,
        duck_sql=duck,
        build=build,
        shape=f"{base.name}{join_tag}{mask_tag}->{shape}",
    )


def run_case(case: Case, spark: SparkSession, con, sf_dir: str) -> str | None:
    """Run one case on both engines; return None on match, else a
    description of the divergence."""
    from tests.oracle_harness import canonical_rows

    try:
        sdf = case.build(spark, sf_dir)
        s_cols = list(sdf.columns)
        s_rows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # Spark-side failure IS a finding
        return f"spark error: {type(e).__name__}: {e}"
    try:
        res = con.execute(case.duck_sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    except Exception as e:
        return f"duckdb error: {type(e).__name__}: {e}"
    if sorted(s_cols) != sorted(d_cols):
        return f"columns: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return f"rowcount: spark={len(s_rows)} duck={len(d_rows)}"
    cs = canonical_rows(s_cols, s_rows)
    cd = canonical_rows(d_cols, d_rows)
    bad = [(a, b) for a, b in zip(cs, cd) if a != b]
    if bad and any(c.startswith("t") for c in s_cols):
        # AVG-bridge columns (t-prefixed): Spark's exact decimal avg is
        # half-up-rounded at scale 6 while DuckDB carries the full double,
        # so the canonical round-to-6 can flip the last digit — re-compare
        # those columns with the documented tolerance band
        if _tolerant_match(s_cols, s_rows, d_cols, d_rows):
            return None
    if bad:
        return f"{len(bad)} row mismatches; first: {bad[0]!r}"
    return None


def _tolerant_match(s_cols, s_rows, d_cols, d_rows) -> bool:
    """Multiset row match where ``t``-prefixed (AVG-bridge) columns compare
    as floats within |Δ| ≤ 2e-6 ∨ rel 1e-9 — the headroom Spark's scale-6
    decimal-avg rounding can consume — and every other column compares
    canonically exact. Rows are grouped by their exact cells; within each
    group the tolerant tuples are sorted and compared pairwise."""
    import math
    from collections import defaultdict

    from tests.oracle_harness import _canon

    def keyed(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        names = [cols[i] for i in order]
        tol = [j for j, nm in enumerate(names) if nm.startswith("t")]
        exact = [j for j in range(len(names)) if j not in tol]
        g = defaultdict(list)
        for row in rows:
            ordered = [row[i] for i in order]
            key = tuple(_canon(ordered[j]) for j in exact)
            g[key].append(
                tuple(
                    None if ordered[j] is None else float(ordered[j]) for j in tol
                )
            )
        return g

    gs, gd = keyed(s_cols, s_rows), keyed(d_cols, d_rows)
    if set(gs) != set(gd):
        return False
    srt = lambda t: tuple(  # noqa: E731 - None-safe sort key
        (v is None, v if v is not None else 0.0) for v in t
    )
    for key, a in gs.items():
        b = gd[key]
        if len(a) != len(b):
            return False
        for ta, tb in zip(sorted(a, key=srt), sorted(b, key=srt)):
            for x, y in zip(ta, tb):
                if x is None or y is None:
                    if x is not None or y is not None:
                        return False
                elif not math.isclose(x, y, rel_tol=1e-9, abs_tol=2e-6):
                    return False
    return True
