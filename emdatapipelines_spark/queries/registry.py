"""Query/oracle registry + shared fixture helpers.

Determinism conventions (FIXTURES.md):
- pinned clock ``AS_OF = 2024-02-01 00:00:00`` (events span 2024-01);
- sums/avgs over doubles go through DECIMAL (exact, partitioning-independent)
  and are cast back to double;
- every computed column is aliased identically in the Spark query and the
  oracle SQL; LIMIT queries carry a full deterministic ORDER BY.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

AS_OF = "2024-02-01 00:00:00"


def query(name: str, oracle: str | None = None):
    """Register a fixture query; ``oracle`` is the DuckDB-dialect SQL twin
    (None → driver runs a weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str, restore: bool = False) -> DataFrame:
    """Load a fixture table, normalizing event time at the boundary.

    Fixture generations have carried ``ts`` as nanosecond parquet timestamps
    (unrepresentable in Spark — read as raw nanos via ``nanosAsLong`` and
    truncated to micros) and as pandas-written ``timestamp[us]`` without the
    UTC flag (surfaced by pyspark 4.x as TIMESTAMP_NTZ, which the event-time
    surface refuses). ``normalize_event_time`` folds both into session-tz
    TIMESTAMP; under the session's pinned UTC zone this matches DuckDB's
    ``epoch()`` on the naive value, so oracle hashes are unaffected."""
    from ..eventtime import normalize_event_time

    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Schema cache (r14 guide §1.2 "don't compute things you throw away"):
    # a schema-less ``spark.read.parquet`` runs footer inference on EVERY
    # call — measured 70–80 ms/call vs 11 ms with an explicit schema, and
    # the bench pays t() inside fn() on every pass (~40 s across the
    # 287-query suite). The schema of a fixture file is immutable metadata
    # (a production catalog serves it without touching the data), so infer
    # once per (path, size, mtime) and pass it explicitly thereafter. The
    # DATA is still read from parquet on every action — nothing about
    # results or row contents is cached here.
    try:
        st = os.stat(path)
        key = (path, st.st_size, st.st_mtime_ns)
    except OSError:
        key = (path, -1, -1)
    sch = _SCHEMA_CACHE.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(sch).parquet(path)
    df = normalize_event_time(df, "ts") if name == "events" else normalize_event_time(df)
    if restore and name in _RESTORE_SPLITS:
        df = _restore_scan_parallelism(spark, df, cache_key=path, table=name)
    return df


# (path, size, mtime_ns) -> StructType. Keyed on file identity, not just
# path, so a rewritten fixture (tests regenerate tmp files) re-infers.
_SCHEMA_CACHE: dict[tuple[str, int, int], object] = {}


# Tables whose per-ROW compute can dominate a scan stage (text kernels, hash
# folds, Arrow batches — documents/embeddings since r6) PLUS the big fact
# tables (r14, guide §2.5 "one huge unsplittable file"): the fixture files
# are single-row-group parquet, so the whole map side of any query — scan,
# md5/xxhash fan-outs, explodes, per-row expression chains, partial
# aggregation — runs on ONE core regardless of local[N]. Profiling showed
# e.g. ml_permutation_test executing 16 tasks/pass: a 150k-row × 32-draw
# explode+conv pipeline confined to a single task. A real 100 TB table is
# millions of row groups and fans out for free; the ingest-boundary
# round-robin repartition restores that, and the small dims (nation, region,
# supplier, customer, part) stay unsplit — they broadcast or reduce
# immediately, and an extra exchange before a broadcast is pure loss.
#
# r15 (VERDICT r14 #1, the restore-aware cost model): ``restore`` is now
# OPT-IN per call. A full per-query A/B at sf0.1 (scripts/ab_restore.py,
# alternating arms in one session; table in OPTIMIZATION_r15.md) measured
# the ingest exchange as pure overhead for ~200 of 287 queries
# (+0.1–1.2 s each, Σ ≈ 51 s of suite floor) and a win ≥ 0.04 s for only
# the 56 heavy-map queries (up to 4.3 s for sk_count_min) — exactly the
# text-kernel / md5-fan-out / explode×32 / co-occurrence-self-join
# shapes the device was built for. Those 56 (plus the mart builders and
# heavy scripts) now pass ``restore=True`` explicitly; at any real scale
# the flag is inert either way (a naturally-split table never probes as
# starved), so this is a local-fixture cost decision made by measurement,
# not a scale-dependent config.
_RESTORE_SPLITS = {"documents", "embeddings", "orders", "lineitem", "events"}

# Deterministic restore keys (guide §2.5): a keyless ``repartition(n)`` is
# round-robin, which pays a LOCAL SORT of its whole input before the
# exchange (``spark.sql.execution.sortBeforeRepartition``, on by default so
# retried tasks reproduce the same row→partition map — SPARK-38388).
# Hash-partitioning on a deterministic high-cardinality key needs no such
# sort (the assignment is a pure row function) and is the guide's own
# recommended form. Measured (sf0.1 lineitem, warm noop): full-width scan
# 814→447 ms, 2-col agg 465→312 ms; partition balance 18.1k–19.5k rows
# across 32. Same retry-safety, same parallelism, same results (the query
# surface is partition-order independent: fuzz-proven, decimal sums,
# sorted collect_lists).
_RESTORE_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# (path, cores) -> is the scan starved? The split count of a fixture file
# never changes within a process, but the .rdd.getNumPartitions() probe
# costs ~0.13s of plan conversion PER t() CALL — across a 170-query bench
# suite that probe alone was ~half of the round-5 "regression" on the
# documents/embeddings query families (measured in SCALING.md round-6).
_STARVED_CACHE: dict[tuple[str, int], bool] = {}


def _restore_scan_parallelism(
    spark: SparkSession, df: DataFrame, cache_key: str, table: str | None = None
) -> DataFrame:
    """Restore the input parallelism a real table has.

    The fixture parquet files are written as a SINGLE row group, which makes
    them unsplittable: every scan-side operator — the shuffle-free text
    kernels, SimHash folds, PII regex chains, Arrow batches — runs on ONE
    core regardless of ``local[N]``. That is a local-fixture artifact with
    no cluster analog: a 100 TB table is millions of row groups/files and
    Spark fans the scan out for free. A round-robin repartition at the
    ingest boundary is exactly what a user does when handed one unsplittable
    file; the exchange moves this small table once and is dwarfed by the
    per-row compute it parallelizes (measured: dd_simhash sf1 17.0s → ~2s).
    Only applied when the scan really is starved (fewer splits than half the
    session's cores); naturally-split multi-file tables pass through.
    """
    cores = spark.sparkContext.defaultParallelism
    if cores <= 2:
        return df
    key = (cache_key, cores)
    starved = _STARVED_CACHE.get(key)
    if starved is None:
        starved = df.rdd.getNumPartitions() < max(2, cores // 2)
        _STARVED_CACHE[key] = starved
    if not starved:
        return df
    rk = _RESTORE_KEYS.get(table or "")
    if rk is not None and rk in df.columns:
        # deterministic hash restore — no sort-before-repartition (see
        # _RESTORE_KEYS); xxhash64 of the non-null high-cardinality key
        # spreads evenly and is retry-stable by construction
        return df.repartition(cores, F.xxhash64(F.col(rk)))
    return df.repartition(cores)


def dsum(col, scale: int = 2):
    """Exact decimal sum cast back to double (order-independent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


def davg(col, scale: int = 4, nd: int = 6):
    """Deterministic mean: exact decimal sum ÷ count, rounded in the
    INTEGER domain (``round(x·10^nd)/10^nd``).

    ``round(double, nd)`` itself is NOT cross-engine safe: Spark rounds the
    shortest decimal repr (HALF_UP) while DuckDB rounds the exact binary
    value, and they disagree exactly when the true ratio's repr lands on a
    .…5 boundary at position nd+1 — first observed at sf0.1 where
    a7_config_window_agg's avg hit 56.4133125 (spark 56.413312 vs duckdb
    56.413313). Scaled to the integer domain the tie value k+0.5 IS
    exactly representable, and both engines round it half-away-from-zero
    identically; every oracle mirrors ``ROUND(x * 10^nd) / 10^nd``."""
    c = F.col(col) if isinstance(col, str) else col
    mean = F.sum(c.cast(f"decimal(28,{scale})")).cast("double") / F.count(c)
    p = float(10**nd)
    return F.round(mean * F.lit(p)) / F.lit(p)
