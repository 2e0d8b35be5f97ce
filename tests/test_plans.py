"""Model-registry DAG semantics (dbt build analog): topo order, selective
builds, MV refresh, cycle detection.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from emdatapipelines_spark.plans.registry import Model, ModelRegistry


def _dag(spark):
    reg = ModelRegistry()

    @reg.model("src_nums")
    def src_nums(s, deps):
        return s.range(10).withColumnRenamed("id", "n")

    @reg.model("stg_even", deps=["src_nums"], materialization="table")
    def stg_even(s, deps):
        return deps["src_nums"].filter(F.col("n") % 2 == 0)

    @reg.model("mart_sum", deps=["stg_even"])
    def mart_sum(s, deps):
        return deps["stg_even"].agg(F.sum("n").alias("total"))

    return reg


def test_build_topo_and_views(spark):
    reg = _dag(spark)
    results = reg.build(spark)
    assert set(results) == {"src_nums", "stg_even", "mart_sum"}
    assert results["mart_sum"].first()["total"] == 20
    # every model is queryable as a temp view (the dbt ref()/source() analog)
    assert spark.sql("SELECT COUNT(*) AS c FROM stg_even").first()["c"] == 5


def test_materialized_names_public_accessor(spark):
    # r11 ADVICE: harnesses force-materialize the cached layer through this
    # instead of iterating private ``_models`` state
    reg = _dag(spark)
    assert reg.materialized_names() == ["stg_even"]


def test_selective_build_pulls_deps(spark):
    reg = _dag(spark)
    results = reg.build(spark, select=["mart_sum"])
    assert "src_nums" in results and "mart_sum" in results


def test_refresh_materialized(spark):
    reg = _dag(spark)
    reg.build(spark)
    refreshed = reg.refresh_materialized(spark, "stg_even")
    assert refreshed.count() == 5


def test_stale_read_warns(spark):
    """VERDICT r11 stretch #7: a consumer reading results[] between cron
    ticks gets a StaleModelWarning when the model's refresh_interval has
    elapsed under the injected read clock."""
    import warnings
    from datetime import datetime, timedelta

    from emdatapipelines_spark.plans.registry import StaleModelWarning

    reg = ModelRegistry()  # default policy: warn

    @reg.model("mv_counts", materialization="table",
               refresh_interval=timedelta(minutes=5))
    def mv_counts(s, deps):
        return s.range(5).agg(F.count("*").alias("c"))

    t0 = datetime(2024, 1, 1, 12, 0)
    reg.build(spark, now=t0)
    reg.now_provider = lambda: t0 + timedelta(minutes=1)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # fresh read must NOT warn
        assert reg.results["mv_counts"].first()["c"] == 5
    reg.now_provider = lambda: t0 + timedelta(minutes=9)
    with pytest.warns(StaleModelWarning, match="mv_counts"):
        reg.results["mv_counts"]


def test_stale_read_rebuilds_under_policy(spark):
    from datetime import datetime, timedelta

    reg = ModelRegistry(stale_policy="rebuild")
    builds = []

    @reg.model("mv_live", materialization="table",
               refresh_interval=timedelta(minutes=5))
    def mv_live(s, deps):
        builds.append(1)
        return s.range(3).agg(F.count("*").alias("c"))

    t0 = datetime(2024, 1, 1, 12, 0)
    reg.build(spark, now=t0)
    assert len(builds) == 1
    stale_t = t0 + timedelta(minutes=30)
    reg.now_provider = lambda: stale_t
    df = reg.results["mv_live"]  # stale read → rebuilt inline
    assert len(builds) == 2
    assert df.first()["c"] == 3
    assert reg.last_built["mv_live"] == stale_t
    # the rebuild stamped last_built, so the next read is fresh: no rebuild
    reg.results["mv_live"]
    assert len(builds) == 2


def test_internal_build_reads_bypass_guard(spark):
    """Dep reads inside build()/refresh_materialized are not consumer
    reads — the guard must not warn or recurse there."""
    import warnings
    from datetime import datetime, timedelta

    reg = ModelRegistry()

    @reg.model("root", materialization="table",
               refresh_interval=timedelta(minutes=1))
    def root(s, deps):
        return s.range(4).withColumnRenamed("id", "n")

    @reg.model("child", deps=["root"])
    def child(s, deps):
        return deps["root"].agg(F.sum("n").alias("t"))

    t0 = datetime(2024, 1, 1)
    reg.build(spark, now=t0)
    reg.now_provider = lambda: t0 + timedelta(hours=1)  # root long stale
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # run_due/refresh paths read deps internally — must stay silent
        reg.run_due(spark, t0 + timedelta(hours=1))


def test_cycle_detection(spark):
    reg = ModelRegistry()
    reg.register(Model("a", lambda s, d: s.range(1), deps=["b"]))
    reg.register(Model("b", lambda s, d: s.range(1), deps=["a"]))
    with pytest.raises(ValueError, match="cycle"):
        reg.topo_order()


def test_scheduled_refresh_loop(spark):
    """Cron-tick semantics (reference `definitions.py:84-94`: 10-min ingest /
    5-min MV refresh): a tick rebuilds exactly the models whose interval has
    elapsed — stale rebuilt, fresh skipped — against an injected clock."""
    from datetime import datetime, timedelta

    builds = {"ingest": 0, "mv": 0}
    reg = ModelRegistry()

    @reg.model("ingest", refresh_interval=timedelta(minutes=10))
    def ingest(s, deps):
        builds["ingest"] += 1
        return s.range(5).withColumnRenamed("id", "n")

    @reg.model("mv", deps=["ingest"], materialization="table",
               refresh_interval=timedelta(minutes=5))
    def mv(s, deps):
        builds["mv"] += 1
        return deps["ingest"].agg(F.sum("n").alias("total"))

    t0 = datetime(2024, 2, 1, 0, 0, 0)
    reg.build(spark, now=t0)
    assert builds == {"ingest": 1, "mv": 1}

    # +5 min: only the MV is due; the 10-min ingest is still fresh
    ran = reg.run_due(spark, t0 + timedelta(minutes=5))
    assert ran == ["mv"] and builds == {"ingest": 1, "mv": 2}

    # +4 more min: nothing due — the loop must not busy-rebuild
    assert reg.run_due(spark, t0 + timedelta(minutes=9)) == []
    assert builds == {"ingest": 1, "mv": 2}

    # +10 min: both due, rebuilt in dependency order, results stay correct
    ran = reg.run_due(spark, t0 + timedelta(minutes=10))
    assert ran == ["ingest", "mv"] and builds == {"ingest": 2, "mv": 3}
    assert reg.results["mv"].first()["total"] == 10


def test_run_due_cascades_to_built_dependents(spark):
    """r10 ADVICE: a refreshed root invalidates built downstream models —
    run_due must rebuild the transitive dependents (in dependency order),
    not leave them serving results computed against the unpersisted old
    cache. Never-built models stay on-demand."""
    from datetime import datetime, timedelta

    builds = {"root": 0, "mid": 0, "leaf": 0, "never_built": 0}
    reg = ModelRegistry()

    @reg.model("root", materialization="table",
               refresh_interval=timedelta(minutes=5))
    def root(s, deps):
        builds["root"] += 1
        return s.range(4).withColumnRenamed("id", "n")

    @reg.model("mid", deps=["root"], materialization="table")
    def mid(s, deps):
        builds["mid"] += 1
        return deps["root"].filter(F.col("n") % 2 == 0)

    @reg.model("leaf", deps=["mid"])
    def leaf(s, deps):
        builds["leaf"] += 1
        return deps["mid"].agg(F.sum("n").alias("total"))

    @reg.model("never_built", deps=["root"])
    def never_built(s, deps):
        builds["never_built"] += 1
        return deps["root"]

    t0 = datetime(2024, 2, 1)
    reg.build(spark, select=["leaf"], now=t0)
    assert builds == {"root": 1, "mid": 1, "leaf": 1, "never_built": 0}

    ran = reg.run_due(spark, t0 + timedelta(minutes=6))
    # root due; mid/leaf cascade because they were built on it; the
    # never-built dependent is NOT pulled in
    assert ran == ["root", "mid", "leaf"]
    assert builds == {"root": 2, "mid": 2, "leaf": 2, "never_built": 0}
    assert reg.results["leaf"].first()["total"] == 2
