"""End-to-end pipeline DAGs built on the model registry."""

from .emergency import build_emergency_dag  # noqa: F401
