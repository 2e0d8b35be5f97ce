"""Model registry / pipeline DAG (replaces the dbt DAG + Dagster jobs)."""

from .registry import Model, ModelRegistry  # noqa: F401
