#!/usr/bin/env python
"""Benchmark harness: run the full query inventory at sf0.1 and emit ONE JSON line.

Contract (driver): ``{"metric": ..., "value": N, "unit": "sec", "queries":
{"q1": sec, ...}, "sf": ...}`` on stdout. Inputs come from
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Each query is forced end-to-end with the built-in ``noop`` sink so every
column is materialized through the whole plan (a bare ``count()`` would let
Catalyst prune the projection and under-report the work). One warmup query
amortizes JVM startup, and each query runs ``$SPARK_GRAFT_BENCH_PASSES``
times (default 3). Reported per-query numbers (round 6, after the r5
artifact's 1.9x contention swings on untouched queries cost a round of
ambiguity):

- ``queries``   — MIN of the warm passes (passes 2..N): the least-noise
  estimate of the plan's intrinsic cost; suite-level GC/codegen contention
  only ever ADDS time, so the min is the comparable number round-to-round.
- ``median_pass`` — median across the same warm passes: shows run-to-run
  spread; a big min/median gap flags contention, not a plan change.
- ``cold_pass`` — pass-1 times (codegen+footer-read cost, diagnosis trail).

``--isolate [N]`` additionally re-times the N slowest queries (default 20)
in a FRESH JVM each (subprocess running ``--one``), so a suspected
regression can be attributed: suite-min >> isolated-min ⇒ suite contention;
isolated-min itself moved ⇒ a real plan/cost change. Isolated numbers land
in BENCH_FULL.json under ``isolated`` (never in the stdout contract line).

``--gate`` (round 8): after a bounded retry of any query whose warm-min
exceeds its own cold pass by >1.25x (a physical impossibility for a fixed
plan — only contention does that), exit 2 if any inversion survives, so a
contended run cannot be committed as the round's artifact. The surviving
set is recorded under ``inversions`` either way.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import subprocess
import sys
import time


def _force(df) -> None:
    """Execute the full plan, all columns, no driver-side result transfer."""
    df.write.mode("overwrite").format("noop").save()


def _session():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from emdatapipelines_spark.session import get_spark

    spark = get_spark(app_name="emdatapipelines-bench")
    spark.sparkContext.setLogLevel("ERROR")
    return spark, entrymod.queries()


def _time_passes(spark, fn, sf_dir: str, passes: int) -> tuple[list[float], float]:
    """Returns (per-pass seconds, max pinned MB observed after any pass).

    The pinned high-water (VERDICT r12 stretch #8) combines two reads:
    the block manager AFTER the query returns (raw-registry queries whose
    pins are still live here), and the cachectl gauge noted INSIDE the
    ``__spark_entry__`` pin-scope wrapper just before it releases — for
    driver-wrapped pinning queries the post-return read is too late (the
    wrapper already released; r13 ADVICE), so the in-wrapper gauge is the
    only honest peak for exactly the queries the metric targets."""
    from emdatapipelines_spark.cachectl import (
        pinned_bytes,
        release_tracked,
        take_pinned_high_water,
    )

    out = []
    pinned_hw = 0
    for _ in range(passes):
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        out.append(time.perf_counter() - t0)
        pinned_hw = max(pinned_hw, pinned_bytes(spark), take_pinned_high_water())
        # r11 VERDICT #1: queries that pin intermediates (eager
        # localCheckpoints, persisted shingle frames) register them on the
        # cachectl ledger; release AFTER materialization so pinned blocks
        # never leak into the next pass/query's memory budget. clearCache
        # still sweeps catalog-level caches (cannot reach checkpoints).
        release_tracked()
        spark.catalog.clearCache()
    return out, round(pinned_hw / (1024 * 1024), 2)


def _host_calibration() -> float:
    """Fixed single-core pure-python loop (~0.5s on a healthy core),
    timed best-of-3. Round 7 found two same-code same-fixture bench runs
    3h apart disagreeing by a UNIFORM 1.19× (pure scans and fresh-JVM
    isolates of untouched queries included) — shared-host speed drift.
    Every artifact now carries this scalar so cross-artifact deltas can
    be separated into host drift (calibration moved too) vs real plan
    changes (calibration steady)."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        x = 0
        for i in range(3_000_000):
            x += i * i
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def run_one(name: str, sf_dir: str, passes: int) -> int:
    """Single-query mode (used by --isolate subprocesses): fresh JVM, one
    same-query warmup, then ``passes`` timed passes; prints min/median."""
    from emdatapipelines_spark.cachectl import release_tracked

    spark, queries = _session()
    fn = queries[name]
    _force(fn(spark, sf_dir))  # warm this query's codegen in the fresh JVM
    release_tracked()
    spark.catalog.clearCache()
    times, _pinned = _time_passes(spark, fn, sf_dir, passes)
    print(
        json.dumps(
            {
                "query": name,
                "min_sec": round(min(times), 4),
                "median_sec": round(statistics.median(times), 4),
                "host_calib_sec": _host_calibration(),
            }
        )
    )
    return 0


#: r10 VERDICT #6 — tx_nb_quality and tpch_q5_local_supplier doubled at
#: sf0.1 on byte-identical code (sub-2s, within historical gating noise,
#: but twice in a row would not be). They join the isolated re-measure set
#: every run so BENCH artifacts carry fresh-JVM numbers that settle
#: drift-vs-plan.
#:
#: r12 VERDICT #1 — the driver's r12 gated run showed the ITERATIVE
#: multi-job family (k-core peel, HITS, k-hop BFS, components, label
#: propagation, k-means) at 1.7–3.5× calibrated vs r11 while the builder's
#: same-code gated run was flat; suite/host contention is the hypothesis,
#: but the family had no isolated numbers so the protocol's
#: suite-vs-isolated attribution rule could not fire. They ride in every
#: isolation set (including the default no-flag run, below) so both
#: driver- and builder-produced artifacts always carry fresh-JVM numbers
#: for the most scheduler-sensitive queries.
DRIFT_WATCH = (
    "tx_nb_quality",
    "tpch_q5_local_supplier",
    "gr_kcore",
    "gr_hits",
    "gr_khop_reach",
    "gr_components",
    "gr_label_prop",
    "ml_kmeans_model",
)


def regression_watch(
    timings: dict[str, float], prev: dict[str, float], cap: int = 10
) -> list[str]:
    """Queries whose gated min is >= 1.5x their committed previous-round
    value (VERDICT r14 #5/#6): exactly the set the driver's PERF comparison
    will flag as regressed. They join the isolation set so the artifact
    carries a fresh-JVM twin for every prospective PERF regression and
    contention self-attributes in THIS artifact (no cross-run diff needed).
    Ranked worst-ratio-first and capped (default +10 subprocesses) so a
    fully-contended window cannot turn the bench into 287 isolated reruns.
    Sub-0.2s previous values stay out (ratio of noise)."""
    flagged = sorted(
        (
            (timings[n] / prev[n], n)
            for n in timings
            if prev.get(n, 0.0) >= 0.2 and timings[n] >= prev[n] * 1.5
        ),
        reverse=True,
    )
    return [n for _, n in flagged[:cap]]


def _previous_bench_queries(here: str) -> dict[str, float]:
    """Per-query map of the COMMITTED previous BENCH_FULL.json (the value
    the driver's PERF comparison reads). ``git show HEAD:`` so an earlier
    run this session overwriting the working file cannot shift the
    reference; falls back to the on-disk file outside a git checkout."""
    try:
        proc = subprocess.run(
            ["git", "-C", here, "show", "HEAD:BENCH_FULL.json"],
            capture_output=True, text=True, timeout=60,
        )
        if proc.returncode == 0:
            return dict(json.loads(proc.stdout).get("queries", {}))
    except (OSError, ValueError, subprocess.SubprocessError):
        pass
    try:
        with open(os.path.join(here, "BENCH_FULL.json"), encoding="utf-8") as fh:
            return dict(json.load(fh).get("queries", {}))
    except (OSError, ValueError):
        return {}


def pinned_breaches(
    pinned: dict[str, float], ratchet: dict[str, float]
) -> dict[str, list[float]]:
    """Per-query pinned-MB ceiling check (VERDICT r13 #5): ceiling is the
    committed high-water x 1.5, floored at 64 MB (queries with no committed
    value get the bare floor). Returns {name: [observed_mb, ceiling_mb]}
    for every breach — a cache-lifetime leak now fails the gated run
    instead of only widening a diagnostic column."""
    out: dict[str, list[float]] = {}
    for name, mb in pinned.items():
        ceiling = max(64.0, ratchet.get(name, 0.0) * 1.5)
        if mb > ceiling:
            out[name] = [mb, round(ceiling, 2)]
    return out


def _isolate(names: list[str], sf_dir: str, passes: int) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for name in names:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name],
            capture_output=True,
            text=True,
            env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir,
                 "SPARK_GRAFT_BENCH_PASSES": str(passes)},
            timeout=1800,
        )
        line = next(
            (l for l in reversed(proc.stdout.splitlines()) if l.startswith("{")), None
        )
        if proc.returncode == 0 and line:
            rec = json.loads(line)
            out[name] = {"min_sec": rec["min_sec"], "median_sec": rec["median_sec"]}
        else:
            out[name] = {"error": (proc.stderr or "no output")[-500:]}
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))

    args = sys.argv[1:]
    if args[:1] == ["--one"]:
        return run_one(args[1], sf_dir, passes)
    isolate_n = 0
    if args[:1] == ["--isolate"]:
        isolate_n = int(args[1]) if len(args) > 1 else 20

    spark, queries = _session()

    # Warmup: trigger codegen/JIT + parquet footer reads once.
    from emdatapipelines_spark.cachectl import release_tracked

    warm = queries.get("a1_pricing_summary") or next(iter(queries.values()))
    _force(warm(spark, sf_dir))
    release_tracked()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    cold: dict[str, float] = {}
    pinned: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in sorted(queries):
        try:
            # Benchmark isolation: operators that persist() intermediates
            # (e.g. the jaccard shingle frame) leak cached blocks into the
            # NEXT query's memory budget — across 145+ queries the
            # accumulated cache thrashes eviction and inflated heavy-query
            # times up to 3x, run-order dependent. A production driver owns
            # its cache lifecycle; the bench isolates per query (clearCache
            # inside _time_passes).
            ts, pin_mb = _time_passes(spark, queries[name], sf_dir, passes)
            cold[name] = round(ts[0], 4)
            warm_ts = ts[1:] if len(ts) > 1 else ts
            timings[name] = round(min(warm_ts), 4)
            medians[name] = round(statistics.median(warm_ts), 4)
            if pin_mb >= 0.5:  # sub-half-MB noise stays out of the artifact
                pinned[name] = pin_mb
        except Exception as exc:  # noqa: BLE001 - report, don't abort the suite
            # keep head+tail so the artifact records the full exception class
            # and the end of the message (truncating mid-token loses both)
            msg = f"{type(exc).__name__}: {exc}"
            # artifact keeps first+last 2 KB (stdout line carries names only)
            failures[name] = msg if len(msg) <= 4096 else msg[:2048] + " ... " + msg[-2048:]

    # Zero-inversion gate (VERDICT r7 #2): warm-min > cold×1.25 is
    # physically impossible for a fixed plan on a quiet host (the warm
    # passes re-run the identical plan the cold pass just paid codegen
    # for) — it can only mean suite/host contention polluted the warm
    # passes. Re-time the inverted queries once (bounded retry: min over
    # more passes is still the min); anything still inverted is recorded
    # in ``inversions`` and, under --gate, fails the run so a contended
    # artifact cannot be committed as the round's number.
    def _inversions() -> dict[str, list[float]]:
        return {
            n: [timings[n], cold[n]]
            for n in timings
            if cold[n] > 0.5 and timings[n] > cold[n] * 1.25
        }

    for name in list(_inversions()):
        try:
            ts, _pin = _time_passes(spark, queries[name], sf_dir, passes)
        except Exception:  # noqa: BLE001 - keep the original numbers
            continue
        cold[name] = min(cold[name], round(ts[0], 4))
        warm_ts = ts[1:] if len(ts) > 1 else ts
        timings[name] = min(timings[name], round(min(warm_ts), 4))
        # keep provenance consistent with the min: the retried query's
        # median must also be the min across both runs, else the artifact
        # mixes a min from run A with a median from run B.
        medians[name] = min(medians[name], round(statistics.median(warm_ts), 4))
    inversions = _inversions()

    total = round(sum(timings.values()), 4)
    line = {
        "metric": "suite_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "passes": passes,
        "per_query_stat": "min_of_warm_passes",
        "median_pass": medians,
        "host_calib_sec": _host_calibration(),
        # pinned-block high-water per query (VERDICT r12 stretch #8): the
        # bytes the query held in the block manager at its peak, read
        # post-materialization / pre-release — a cache-lifetime leak now
        # shows up as a growing pinned_mb column, not a 2.5× gated anomaly
        "pinned_mb": pinned,
    }
    if passes > 1:
        line["cold_pass"] = cold
        line["inversions"] = inversions  # {} on a clean run
    if failures:
        line["failures"] = failures
    # Isolation set: every run — INCLUDING the driver's flag-less refresh —
    # isolates its OWN top-N gated queries plus the fixed DRIFT_WATCH
    # family (r13 VERDICT #1: the r13 driver run inflated a NEW family,
    # ml_pca_2d 10x / ts_ljungbox 6.4x / lm_bpe_roundtrip 3x, and none had
    # isolated twins because the flag-less path isolated only DRIFT_WATCH —
    # the fix-the-family-after-it-inflates pattern). Flag-less default is
    # top-10 (~50s of fresh-JVM reruns at sf0.1 — the cap on the extra
    # wall cost); --isolate N widens it.
    top = sorted(timings, key=lambda n: -timings[n])[: (isolate_n or 10)]
    for name in DRIFT_WATCH:
        if name in timings and name not in top:
            top.append(name)
    # r15 (VERDICT r14 #5/#6): also isolate every query PERF would flag as
    # regressed vs the committed previous artifact, so contention artifacts
    # carry their own fresh-JVM refutation. Bounded at +10 subprocesses.
    here = os.path.dirname(os.path.abspath(__file__))
    for name in regression_watch(timings, _previous_bench_queries(here)):
        if name not in top:
            top.append(name)
    if top:
        line["isolated"] = _isolate(top, sf_dir, passes)
        # Machine-readable contention attribution: gated >= 1.5x the same
        # query's fresh-JVM isolated min can only be suite/host contention
        # (the isolated run re-times the identical plan) — list it in the
        # artifact so a judge/driver can attribute inflation from this
        # artifact alone, no cross-run diff needed. Sub-0.2s isolated
        # times stay out (ratio of noise).
        line["contended"] = {
            n: {
                "gated_sec": timings[n],
                "isolated_sec": iso["min_sec"],
                "ratio": round(timings[n] / iso["min_sec"], 2),
            }
            for n, iso in line["isolated"].items()
            if iso.get("min_sec", 0) >= 0.2
            and timings.get(n, 0.0) >= iso["min_sec"] * 1.5
        }

    # Pinned-MB ratchet gate (VERDICT r13 #5): ceilings derive from the
    # committed per-sf high-water file; breaches land in the artifact and
    # fail a --gate run. The file is written only when its sf section is
    # missing (bootstrap) — ratcheting it UP after a legit footprint
    # increase is a deliberate, committed edit, never automatic.
    ratchet_path = os.path.join(here, "BENCH_pinned_ratchet.json")
    sf_key = str(sf)
    breaches: dict[str, list[float]] = {}
    try:
        with open(ratchet_path, "r", encoding="utf-8") as fh:
            ratchet_all = json.load(fh)
    except (OSError, ValueError):
        ratchet_all = {}
    if sf_key in ratchet_all:
        breaches = pinned_breaches(pinned, ratchet_all[sf_key])
        if breaches:
            line["pinned_breaches"] = breaches
    else:
        ratchet_all[sf_key] = pinned
        with open(ratchet_path, "w", encoding="utf-8") as fh:
            json.dump(ratchet_all, fh, indent=1, sort_keys=True)

    # Full record to a repo artifact (the driver keeps only the LAST 2000
    # chars of stdout — BENCH_r01.json's "tail" proved it — so the full
    # per-query map lives here and the stdout line is trimmed to fit).
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as fh:
        json.dump(line, fh, indent=1, sort_keys=True)

    budget = 1820
    out = dict(line)
    out.pop("cold_pass", None)  # full maps live in BENCH_FULL.json
    out.pop("median_pass", None)
    out.pop("isolated", None)
    out.pop("pinned_mb", None)
    if failures:
        out["failures"] = sorted(failures)  # names only; messages in BENCH_FULL.json
    q = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    while len(json.dumps({**out, "queries": q}, separators=(",", ":"))) > budget and len(q) > 1:
        q.pop(next(reversed(q)))  # drop the fastest remaining query
    out["queries"] = q
    if len(q) < len(timings):
        out["omitted_fast_queries"] = len(timings) - len(q)
        out["detail"] = "BENCH_FULL.json"
    if inversions:
        out["inversions"] = sorted(inversions)
    print(json.dumps(out, separators=(",", ":")))
    if "--gate" in args and inversions:
        print(f"GATE: {len(inversions)} warm>cold inversion(s) survived retry: "
              f"{sorted(inversions)}", file=sys.stderr)
        return 2
    if "--gate" in args and breaches:
        print(f"GATE: {len(breaches)} pinned-MB ceiling breach(es): "
              f"{ {n: v for n, v in sorted(breaches.items())} }", file=sys.stderr)
        return 2
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
