"""Batch source connectors (SURVEY §2.1 S1–S7).

REST/config-driven ingestion lives in :mod:`.rest`; file/seed readers live in
:mod:`..io`; streaming transports in :mod:`..streaming.sources`.
"""

from .rest import RestSourceConfig, fetch_records, ingest_rest_source  # noqa: F401
from .resilience import RetryPolicy, health_check, resilient_fetcher  # noqa: F401
from .config_loader import SourcesConfig, load_sources_yaml, parse_sources_config  # noqa: F401
