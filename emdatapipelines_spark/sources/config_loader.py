"""YAML source-configuration loader with environment interpolation.

Twin of the reference's config stack (``config/config_loader.py`` —
ConfigManager YAML loading :55-137, ``get_source_config`` :139-157,
``get_enabled_sources`` :190-200, env-sourced settings
``get_environment_config`` :380-395, missing-file defaults :288-312; and
``config/sources.yml``'s shape: ``global_settings`` + one block per
source with ``api`` / ``endpoints`` / classification / retention /
``api_key_env_var``).

Output is the engine's own runtime types: each (source, endpoint) pair
becomes a :class:`~..sources.rest.RestSourceConfig` and each source a
:class:`~.resilience.RetryPolicy`, so a ``sources.yml`` drives
``ingest_rest_source`` end-to-end. String values support ``${VAR}`` /
``${VAR:-default}`` interpolation (resolved at load, driver-side — config
is control-plane data and never rides the cluster).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from .resilience import RetryPolicy
from .rest import RestSourceConfig

try:  # optional dependency, like the reference's yaml import
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-([^}]*))?\}")

RESERVED_KEYS = ("global_settings",)

DEFAULT_GLOBALS = {
    # config/sources.yml global_settings block
    "default_timeout_seconds": 30,
    "default_rate_limit_per_minute": 60,
    "default_retry_attempts": 3,
    "default_retry_delay_seconds": 1,
}


def interpolate_env(value, env: dict | None = None):
    """Resolve ``${VAR}`` / ``${VAR:-default}`` in strings, recursively
    through dicts/lists. Unset vars without a default resolve to ''."""
    env = os.environ if env is None else env
    if isinstance(value, str):
        return _ENV_RE.sub(lambda m: str(env.get(m.group(1), m.group(2) or "")), value)
    if isinstance(value, dict):
        return {k: interpolate_env(v, env) for k, v in value.items()}
    if isinstance(value, list):
        return [interpolate_env(v, env) for v in value]
    return value


@dataclass
class SourceSpec:
    """One parsed source block (reference SourceConfig :16-27)."""

    name: str
    description: str = ""
    enabled: bool = True
    api: dict = field(default_factory=dict)
    endpoints: dict = field(default_factory=dict)
    data_classification: str = "PUBLIC"
    update_frequency: str = "hourly"
    retention_days: int = 365
    filters: dict = field(default_factory=dict)
    quality: dict = field(default_factory=dict)


@dataclass
class SourcesConfig:
    global_settings: dict
    sources: dict[str, SourceSpec]

    def enabled_sources(self) -> list[str]:
        """`get_enabled_sources` :190-200."""
        return [n for n, s in self.sources.items() if s.enabled]

    def retry_policy(self, source: str) -> RetryPolicy:
        """Per-source resilience policy from api + global settings."""
        s = self.sources[source]
        g = self.global_settings
        rate = s.api.get("rate_limit_per_minute", g["default_rate_limit_per_minute"])
        return RetryPolicy(
            max_attempts=int(s.api.get("retry_attempts", g["default_retry_attempts"])),
            base_delay=float(s.api.get("retry_delay_seconds", g["default_retry_delay_seconds"])),
            min_interval=60.0 / float(rate) if rate else 0.0,
        )

    def rest_config(self, source: str, endpoint: str) -> RestSourceConfig:
        """(source, endpoint) → runtime RestSourceConfig for
        ``ingest_rest_source``. The endpoint's ``path`` is joined onto the
        api ``base_url``; an api key named by ``api_key_env_var`` lands in
        params under ``api_key_param`` when the source requires one."""
        s = self.sources[source]
        ep = s.endpoints[endpoint]
        params = dict(ep.get("params", {}))
        if "batch_size" in ep:
            params.setdefault("$limit", ep["batch_size"])
        if s.api.get("api_key_required"):
            key = os.environ.get(s.api.get("api_key_env_var", ""), "")
            params[s.api.get("api_key_param", "api_key")] = key
        return RestSourceConfig(
            name=f"{source}_{endpoint}",
            endpoint=s.api.get("base_url", "") + ep.get("path", ""),
            params=params,
            required_fields=list(ep.get("required_fields", s.quality.get("required_fields", []))),
            type_map=dict(ep.get("type_map", {})),
            key_field=ep.get("key_field"),
            classification=s.data_classification,
            fan_out_param=ep.get("fan_out_param"),
            fan_out_values=list(ep.get("fan_out_values", [])),
        )


def parse_sources_config(raw: dict, env: dict | None = None) -> SourcesConfig:
    """Dict (already YAML-parsed) → typed config, with env interpolation."""
    raw = interpolate_env(raw or {}, env)
    g = {**DEFAULT_GLOBALS, **(raw.get("global_settings") or {})}
    sources: dict[str, SourceSpec] = {}
    for name, block in raw.items():
        if name in RESERVED_KEYS or not isinstance(block, dict):
            continue
        sources[name] = SourceSpec(
            name=block.get("name", name),
            description=block.get("description", ""),
            enabled=bool(block.get("enabled", True)),
            api=block.get("api") or {},
            endpoints=block.get("endpoints") or {},
            data_classification=block.get("data_classification", "PUBLIC"),
            update_frequency=block.get("update_frequency", "hourly"),
            retention_days=int(block.get("retention_days", 365)),
            filters=block.get("filters") or {},
            quality=block.get("quality") or {},
        )
    return SourcesConfig(global_settings=g, sources=sources)


def load_sources_yaml(path: str, env: dict | None = None) -> SourcesConfig:
    """Load a ``sources.yml``-shaped file (`_load_sources_config` :82-91;
    a missing file falls back to defaults like :288-312 — here that is an
    empty source set with default globals)."""
    if yaml is None:  # pragma: no cover
        raise ImportError("pyyaml is required to load YAML source configs")
    if not os.path.exists(path):
        return parse_sources_config({}, env)
    with open(path, "r", encoding="utf-8") as fh:
        return parse_sources_config(yaml.safe_load(fh) or {}, env)
