"""Named-model registry with dependency ordering.

≈ the dbt DAG (`dbt parse` → refs → topological build,
`dbt_projects/emergency_data/models/**`) plus Dagster's asset graph
(`definitions.py:73-79`): each model is a named DataFrame-producing function
with declared dependencies; the registry topo-sorts, builds each model once,
and registers results as temp views so downstream models (and `spark.sql`)
can ``ref()`` them. Materialization ``table`` caches the DataFrame (the
"CREATE TABLE AS" analog); ``view`` stays lazy.

Post-hooks model the reference's async MV refresh (`public_disasters.sql:13`)
and audit inserts.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Model:
    name: str
    fn: Callable[..., DataFrame]  # (spark, {dep_name: DataFrame}) -> DataFrame
    deps: list[str] = field(default_factory=list)
    materialization: str = "view"  # view | table
    post_hooks: list[Callable[[SparkSession, DataFrame], None]] = field(default_factory=list)


class ModelRegistry:
    def __init__(self) -> None:
        self._models: dict[str, Model] = {}
        self.results: dict[str, DataFrame] = {}

    def register(self, model: Model) -> None:
        if model.name in self._models:
            raise ValueError(f"duplicate model name: {model.name}")
        self._models[model.name] = model

    def model(self, name: str, deps: list[str] | None = None, materialization: str = "view"):
        """Decorator form: ``@registry.model("stg_x", deps=["src"])``."""

        def wrap(fn):
            self.register(Model(name, fn, deps or [], materialization))
            return fn

        return wrap

    def topo_order(self) -> list[str]:
        order: list[str] = []
        state: dict[str, int] = {}

        def visit(n: str) -> None:
            if state.get(n) == 2:
                return
            if state.get(n) == 1:
                raise ValueError(f"model dependency cycle through {n}")
            state[n] = 1
            for d in self._models[n].deps:
                if d in self._models:
                    visit(d)
            state[n] = 2
            order.append(n)

        for n in self._models:
            visit(n)
        return order

    def build(self, spark: SparkSession, select: list[str] | None = None) -> dict[str, DataFrame]:
        """Build models in dependency order; register each as a temp view."""
        wanted = set(select) if select else None
        for name in self.topo_order():
            if wanted is not None and name not in wanted and not self._is_dep_of(name, wanted):
                continue
            m = self._models[name]
            deps = {d: self.results[d] for d in m.deps if d in self.results}
            df = m.fn(spark, deps)
            if m.materialization == "table":
                df = df.cache()
            df.createOrReplaceTempView(name)
            self.results[name] = df
            for hook in m.post_hooks:
                hook(spark, df)
        return self.results

    def _is_dep_of(self, name: str, wanted: set[str]) -> bool:
        seen: set[str] = set()

        def expand(n: str) -> None:
            for d in self._models[n].deps:
                if d not in seen:
                    seen.add(d)
                    if d in self._models:
                        expand(d)

        for w in wanted:
            if w in self._models:
                expand(w)
        return name in seen

    def refresh_materialized(self, spark: SparkSession, name: str) -> DataFrame:
        """S12 — async-MV analog: re-run one model (and re-cache), leaving the
        rest of the DAG untouched (`macros/create_starrocks_materialized_view.sql:2-16`)."""
        m = self._models[name]
        deps = {d: self.results[d] for d in m.deps if d in self.results}
        df = m.fn(spark, deps)
        old = self.results.get(name)
        if old is not None:
            try:
                old.unpersist()
            except Exception:
                pass
        if m.materialization == "table":
            df = df.cache()
        df.createOrReplaceTempView(name)
        self.results[name] = df
        return df
