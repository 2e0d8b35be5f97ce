"""YAML source-config loader (sources/config_loader.py) — twin of
config/config_loader.py:55-200,288-312. Fixture YAML → RestSourceConfig →
ingest_rest_source end-to-end with a fake fetcher."""

from __future__ import annotations

import textwrap

from emdatapipelines_spark.sources.config_loader import (
    RetryPolicy,
    interpolate_env,
    load_sources_yaml,
    parse_sources_config,
)

FIXTURE_YAML = textwrap.dedent(
    """
    global_settings:
      default_rate_limit_per_minute: 120
      default_retry_attempts: 5

    fema:
      name: "FEMA OpenFEMA"
      enabled: true
      api:
        base_url: "${FEMA_BASE:-https://www.fema.gov/api/open/v2/}"
        rate_limit_per_minute: 60
        retry_attempts: 2
      endpoints:
        disaster_declarations:
          path: "DisasterDeclarationsSummaries"
          batch_size: 1000
          required_fields: [disasterNumber, state]
          type_map: {disasterNumber: bigint}
          key_field: state
      data_classification: "PUBLIC"
      retention_days: 2555

    usda:
      enabled: false
      api:
        base_url: "https://quickstats.nass.usda.gov/"
        api_key_required: true
        api_key_env_var: "USDA_API_KEY"
        api_key_param: "key"
      endpoints:
        crops: {path: "api_GET/"}
    """
)


def _write(tmp_path, text):
    p = tmp_path / "sources.yml"
    p.write_text(text)
    return str(p)


def test_interpolate_env_patterns():
    env = {"HOST": "example.org"}
    assert interpolate_env("https://${HOST}/v1", env) == "https://example.org/v1"
    assert interpolate_env("${MISSING:-fallback}", env) == "fallback"
    assert interpolate_env("${MISSING}", env) == ""
    assert interpolate_env({"a": ["${HOST}"]}, env) == {"a": ["example.org"]}
    assert interpolate_env(42, env) == 42


def test_load_parse_and_typed_accessors(tmp_path):
    cfg = load_sources_yaml(_write(tmp_path, FIXTURE_YAML), env={})
    assert cfg.enabled_sources() == ["fema"]
    assert cfg.global_settings["default_rate_limit_per_minute"] == 120
    # per-source overrides beat globals; rate cap becomes min_interval
    rp = cfg.retry_policy("fema")
    assert rp == RetryPolicy(max_attempts=2, base_delay=1.0, min_interval=1.0)
    # globals fill gaps for sources without api overrides
    assert cfg.retry_policy("usda").max_attempts == 5

    rc = cfg.rest_config("fema", "disaster_declarations")
    assert rc.name == "fema_disaster_declarations"
    assert rc.endpoint == "https://www.fema.gov/api/open/v2/DisasterDeclarationsSummaries"
    assert rc.params == {"$limit": 1000}
    assert rc.required_fields == ["disasterNumber", "state"]
    assert rc.type_map == {"disasterNumber": "bigint"}
    assert rc.key_field == "state" and rc.classification == "PUBLIC"


def test_api_key_from_env(tmp_path, monkeypatch):
    monkeypatch.setenv("USDA_API_KEY", "sekret")
    cfg = load_sources_yaml(_write(tmp_path, FIXTURE_YAML))
    rc = cfg.rest_config("usda", "crops")
    assert rc.params["key"] == "sekret"


def test_env_interpolation_in_base_url(tmp_path, monkeypatch):
    monkeypatch.setenv("FEMA_BASE", "http://localhost:9999/")
    cfg = load_sources_yaml(_write(tmp_path, FIXTURE_YAML))
    assert cfg.rest_config("fema", "disaster_declarations").endpoint.startswith(
        "http://localhost:9999/"
    )


def test_missing_file_yields_default_globals(tmp_path):
    cfg = load_sources_yaml(str(tmp_path / "nope.yml"))
    assert cfg.sources == {}
    assert cfg.global_settings["default_retry_attempts"] == 3


def test_yaml_to_ingest_end_to_end(tmp_path, spark):
    from emdatapipelines_spark.sources.rest import ingest_rest_source

    cfg = load_sources_yaml(_write(tmp_path, FIXTURE_YAML), env={})
    rc = cfg.rest_config("fema", "disaster_declarations")
    calls = []

    def fake_fetch(endpoint, params):
        calls.append((endpoint, dict(params)))
        return {
            "DisasterDeclarationsSummaries": [
                {"disasterNumber": "4001", "state": "CO"},
                {"disasterNumber": "4002"},  # missing state -> null backfill
            ]
        }

    df = ingest_rest_source(spark, rc, fake_fetch)
    rows = {r["disasterNumber"]: r for r in df.collect()}
    assert calls[0][0].endswith("DisasterDeclarationsSummaries")
    assert calls[0][1]["$limit"] == 1000
    assert rows[4001]["state"] == "CO"
    assert rows[4002]["state"] is None
    assert all(r["data_source"] == "fema_disaster_declarations" for r in rows.values())
