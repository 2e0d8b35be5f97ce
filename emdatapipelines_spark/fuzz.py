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
exact in both engines; double sums are never compared directly). Known
cross-engine hazards are excluded by construction rather than worked
around: no AVG (Spark returns decimal, DuckDB double), no ROUND on
computed doubles (half-up vs exact-binary, SEMANTICS.md), no bare
SUM(int) (DuckDB widens to HUGEINT — always CAST ... AS BIGINT), no
events table (nanosecond timestamps).

Determinism: every random choice flows from the case seed; window
functions always order by a unique key suffix so rank/lag/lead are
well-defined; fixture tables carry no NULLs, so NULLs only arise from
constructs the plan itself introduces identically in both dialects
(LEFT JOIN misses, CASE ELSE NULL, NULLIF, LAG frontiers).
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
)


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
        return self.gen_int(env, d) if self.r.random() < 0.5 else self.gen_str(env, d)

    # -- aggregates ---------------------------------------------------------
    def gen_agg(self, env: list[Col]) -> Expr:
        k = self.r.choice(
            ("count", "count_distinct", "min_int", "max_int", "sum_int",
             "min_str", "max_str", "min_ts", "max_ts", "sum_dec",
             "min_dbl", "max_dbl")
        )
        ic = self._col(env, "int")
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
            a = self.gen_int(env, 1)
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
        k = self.r.choice(("row_number", "rank", "lag", "lead", "run_sum"))
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
            return Expr(
                f"{fn}({a.spark}, 1) {over}",
                f"{fn}({a.duck}, 1) {over_d}",
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

    base_pred = g.gen_pred(env, 1) if r.random() < 0.65 else None

    join_spec = None
    fk_opts = [fk for fk in FKS if fk[0] == base.name] + [
        (fk[2], fk[3], fk[0], fk[1], "rev") for fk in FKS if fk[2] == base.name
    ]
    if fk_opts and r.random() < 0.55:
        fk = r.choice(fk_opts)
        if len(fk) == 5:
            # reverse edge: join the child/fact side onto this parent —
            # a 1-many join (parent keys repeat); keep it for inner/semi/
            # anti coverage but extend the unique key with the child's
            lt, lc, rt, rc = fk[0], fk[1], fk[2], fk[3]
            other = TABLES[rt]
            how = r.choice(("inner", "left_semi", "left_anti"))
        else:
            lt, lc, rt, rc = fk
            other = TABLES[rt]
            how = r.choice(("inner", "left", "left_semi", "left_anti"))
        right_pred = g.gen_pred(list(other.cols), 1) if r.random() < 0.5 else None
        join_spec = (other, lc, rc, how, right_pred)
        if how in ("inner", "left"):
            env = env + list(other.cols)
            if len(fk) == 5:
                uniq = uniq + [u for u in other.uniq if u not in uniq]

    shape = r.choices(("project", "aggregate", "window"), weights=(3, 4, 3))[0]

    # ---- rendering --------------------------------------------------------
    def sub_sql() -> str:
        b = f"SELECT * FROM {base.name}"
        if base_pred is not None:
            b += f" WHERE {base_pred.duck}"
        if join_spec is None:
            return f"({b})"
        other, lc, rc, how, right_pred = join_spec
        o = f"SELECT * FROM {other.name}"
        if right_pred is not None:
            o += f" WHERE {right_pred.duck}"
        if how in ("left_semi", "left_anti"):
            ex = "EXISTS" if how == "left_semi" else "NOT EXISTS"
            return (
                f"(SELECT * FROM ({b}) fz_l WHERE {ex} "
                f"(SELECT 1 FROM ({o}) fz_r WHERE fz_l.{lc} = fz_r.{rc}))"
            )
        jt = "JOIN" if how == "inner" else "LEFT JOIN"
        return f"(SELECT * FROM ({b}) fz_l {jt} ({o}) fz_r ON fz_l.{lc} = fz_r.{rc})"

    def build_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
        from .queries.registry import t as load

        df = load(spark, sf_dir, base.name)
        if base_pred is not None:
            df = df.filter(F.expr(base_pred.spark))
        if join_spec is not None:
            other, lc, rc, how, right_pred = join_spec
            odf = load(spark, sf_dir, other.name)
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
        having = r.random() < 0.3
        key_sel = ", ".join(f"{k.duck} AS k{i}" for i, k in enumerate(keys))
        agg_sel = ", ".join(f"{a.duck} AS c{i}" for i, a in enumerate(aggs))
        sel = ", ".join(x for x in (key_sel, agg_sel) if x)
        duck = f"SELECT {sel} FROM {sub_sql()} fz"
        if keys:
            duck += " GROUP BY " + ", ".join(str(i + 1) for i in range(len(keys)))
        # post-aggregate filter (the HAVING shape): keep groups where the
        # first agg, stringified, sorts above a seed-chosen cut — exercises
        # filter-over-aggregate with a dialect-safe predicate
        hv_cut = r.choice(("1", "3", "A", "2"))
        if having and keys:
            duck = (
                f"SELECT * FROM ({duck}) fz_h"
                f" WHERE CAST(c0 AS VARCHAR) >= '{hv_cut}'"
            )
        else:
            having = False

        def build(spark, sf_dir, keys=keys, aggs=aggs, having=having,
                  hv_cut=hv_cut):
            df = build_sub(spark, sf_dir)
            acols = [F.expr(a.spark).alias(f"c{i}") for i, a in enumerate(aggs)]
            if keys:
                out = df.groupBy(
                    *[F.expr(k.spark).alias(f"k{i}") for i, k in enumerate(keys)]
                ).agg(*acols)
            else:
                out = df.agg(*acols)
            if having:
                out = out.filter(F.expr(f"CAST(c0 AS STRING) >= '{hv_cut}'"))
            return out

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

    join_tag = f"+{join_spec[3]}:{join_spec[0].name}" if join_spec else ""
    return Case(
        seed=seed,
        duck_sql=duck,
        build=build,
        shape=f"{base.name}{join_tag}->{shape}",
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
    if bad:
        return f"{len(bad)} row mismatches; first: {bad[0]!r}"
    return None
