"""Property-fuzz of the registry build/refresh/run_due/staleness state
machine (VERDICT r12 stretch #7): random DAGs, random refresh intervals,
random tick/read sequences, checked op-for-op against a pure-Python mirror
of the scheduler contract:

- ``build(select, now)`` builds the selection + transitive deps, stamps
  ``last_built``.
- ``run_due(now)`` rebuilds every interval-carrying model whose interval
  elapsed (or that was never built) PLUS the built transitive dependents,
  dependency order, and stamps them.
- a ``results[]`` read under ``warn`` warns iff any interval-carrying
  model on the chain (self + ancestors) is built and elapsed; under
  ``rebuild`` it fires run_due's cascade inline (stale roots + built
  dependents) exactly once, stamping everything it touched.

Model fns ignore their deps (``s.range``), so builds are plan-construction
only — the fuzz exercises the SCHEDULER, and hundreds of ops run in
seconds. Seeded: failures reproduce."""

from __future__ import annotations

import random
import warnings
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from emdatapipelines_spark.plans.registry import (
    Model,
    ModelRegistry,
    StaleModelWarning,
)


class Mirror:
    """Pure-Python model of the scheduler state machine."""

    def __init__(self, deps: dict[str, list[str]], intervals: dict[str, timedelta | None]):
        self.deps = deps
        self.intervals = intervals
        self.topo = self._topo()
        self.last: dict[str, datetime] = {}
        self.built: set[str] = set()

    def _topo(self) -> list[str]:
        order, state = [], {}

        def visit(n):
            if state.get(n) == 2:
                return
            state[n] = 1
            for d in self.deps[n]:
                visit(d)
            state[n] = 2
            order.append(n)

        for n in self.deps:
            visit(n)
        return order

    def ancestors(self, name: str) -> list[str]:
        seen: set[str] = set()

        def expand(n):
            for d in self.deps[n]:
                if d not in seen:
                    seen.add(d)
                    expand(d)

        expand(name)
        return [n for n in self.topo if n in seen]

    def build(self, select: list[str] | None, now: datetime) -> None:
        if select is None:
            wanted = set(self.deps)
        else:
            wanted = set(select)
            for s in select:
                wanted.update(self.ancestors(s))
        for n in self.topo:
            if n in wanted:
                self.built.add(n)
                self.last[n] = now

    def run_due(self, now: datetime) -> list[str]:
        roots = {
            n
            for n, iv in self.intervals.items()
            if iv is not None and (self.last.get(n) is None or now - self.last[n] >= iv)
        }
        if not roots:
            return []
        stale = set(roots)
        for n in self.topo:
            if n in stale:
                continue
            if n in self.built and any(d in stale for d in self.deps[n]):
                stale.add(n)
        out = [n for n in self.topo if n in stale]
        for n in out:
            self.last[n] = now
            self.built.add(n)
        return out

    def stale_chain(self, name: str, now: datetime) -> list[str]:
        return [
            n
            for n in self.ancestors(name) + [name]
            if self.intervals[n] is not None
            and self.last.get(n) is not None
            and now - self.last[n] >= self.intervals[n]
        ]

    def read_rebuild(self, name: str, now: datetime) -> list[str]:
        chain = self.stale_chain(name, now)
        if not chain:
            return []
        affected = set(chain) | {name}
        for n in self.topo:
            if n in affected:
                continue
            if n in self.built and any(d in affected for d in self.deps[n]):
                affected.add(n)
        out = [
            n
            for n in self.topo
            if n in affected and (n in self.built or n == name)
        ]
        for n in out:
            self.last[n] = now
            self.built.add(n)
        return out


def _random_dag(rng: random.Random):
    n = rng.randint(4, 9)
    names = [f"m{i}" for i in range(n)]
    deps = {
        nm: [names[j] for j in range(i) if rng.random() < 0.35]
        for i, nm in enumerate(names)
    }
    intervals = {
        nm: rng.choice([None, None, timedelta(minutes=rng.choice([2, 5, 10]))])
        for nm in names
    }
    return names, deps, intervals


def _make_registry(spark, names, deps, intervals, policy, calls):
    reg = ModelRegistry(stale_policy=policy)
    for nm in names:
        # fns ignore deps: the fuzz targets the scheduler, not Spark plans
        reg.register(
            Model(
                nm,
                (lambda s, d, _n=nm: s.range(2).select(F.lit(_n).alias("m"), "id")),
                deps=list(deps[nm]),
                materialization="table" if hash(nm) % 2 else "view",
                refresh_interval=intervals[nm],
            )
        )
    orig = reg.refresh_materialized

    def counting(s, n, now=None):
        calls.append(n)
        return orig(s, n, now=now)

    reg.refresh_materialized = counting
    return reg


def _run_case(spark, seed: int, policy: str) -> None:
    rng = random.Random(seed)
    names, deps, intervals = _random_dag(rng)
    calls: list[str] = []
    reg = _make_registry(spark, names, deps, intervals, policy, calls)
    mirror = Mirror(deps, intervals)

    t = datetime(2024, 3, 1)
    # initial build of a random non-empty selection (sometimes everything)
    select = None if rng.random() < 0.4 else rng.sample(names, rng.randint(1, len(names)))
    reg.build(spark, select=select, now=t)
    mirror.build(select, t)
    assert set(reg.results.keys()) == mirror.built, f"seed={seed} build set"
    assert reg.last_built == mirror.last, f"seed={seed} build stamps"

    for step in range(14):
        ctx = f"seed={seed} policy={policy} step={step}"
        t += timedelta(minutes=rng.choice([1, 2, 3, 5, 7, 11]))
        op = rng.random()
        if op < 0.45:  # cron tick
            got = reg.run_due(spark, t)
            want = mirror.run_due(t)
            assert got == want, f"{ctx} run_due: {got} != {want}"
        else:  # consumer read of a built model
            if not mirror.built:
                continue
            name = rng.choice(sorted(mirror.built))
            reg.now_provider = lambda _t=t: _t
            calls.clear()
            if policy == "rebuild":
                reg.results[name]
                want = mirror.read_rebuild(name, t)
                assert calls == want, f"{ctx} read {name}: {calls} != {want}"
            else:
                chain = mirror.stale_chain(name, t)
                with warnings.catch_warnings(record=True) as caught:
                    warnings.simplefilter("always")
                    reg.results[name]
                stale_warns = [
                    w for w in caught if issubclass(w.category, StaleModelWarning)
                ]
                assert bool(stale_warns) == bool(chain), f"{ctx} warn {name}"
                assert calls == [], f"{ctx} warn policy rebuilt {calls}"
            reg.now_provider = None
        assert reg.last_built == mirror.last, f"{ctx} stamps diverged"
        assert set(reg.results.keys()) == mirror.built, f"{ctx} built set diverged"


def test_scheduler_property_fuzz_rebuild_policy(spark):
    for seed in range(40):
        _run_case(spark, seed, "rebuild")


def test_scheduler_property_fuzz_warn_policy(spark):
    for seed in range(40, 80):
        _run_case(spark, seed, "warn")
