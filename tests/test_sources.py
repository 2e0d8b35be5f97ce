"""REST source connectors (S1–S5): container sniffing, GeoJSON flattening,
fan-out, null backfill, coerce-to-null typing, audit columns. The fetcher is
a fake — no network.
"""

from __future__ import annotations

import json

from emdatapipelines_spark.sources import RestSourceConfig, fetch_records, ingest_rest_source


def test_container_sniffing_variants():
    cfg = RestSourceConfig(name="generic", endpoint="http://x")
    for key in ("data", "results", "items", "records"):
        recs = fetch_records(cfg, lambda url, p, k=key: {k: [{"a": 1}, {"a": 2}]})
        assert len(recs) == 2
    # bare list payload
    assert len(fetch_records(cfg, lambda url, p: [{"a": 1}])) == 1
    # unknown container name falls back to first list-of-dicts value
    assert len(fetch_records(cfg, lambda url, p: {"DisasterDeclarationsSummaries": [{"a": 1}]})) == 1


def test_geojson_feature_flattening():
    cfg = RestSourceConfig(name="noaa_alerts", endpoint="http://x")
    payload = {
        "features": [
            {
                "id": "alert-1",
                "properties": {"event": "Tornado Warning", "severity": "Extreme"},
                "geometry": {"type": "Polygon", "coordinates": [[[0, 0], [1, 1]]]},
            },
            {"id": "alert-2", "properties": {"event": "Flood Watch"}, "geometry": None},
        ]
    }
    recs = fetch_records(cfg, lambda url, p: payload)
    assert recs[0]["event"] == "Tornado Warning"
    assert json.loads(recs[0]["geometry"])["type"] == "Polygon"
    assert recs[0]["geometry_type"] == "Polygon"
    assert recs[1]["geometry"] is None


def test_fan_out_per_station():
    cfg = RestSourceConfig(
        name="coagmet",
        endpoint="http://x",
        fan_out_param="station",
        fan_out_values=["s1", "s2", "s3"],
    )
    calls = []

    def fetcher(url, params):
        calls.append(params["station"])
        return {"data": [{"temp": 20}, {"temp": 21}]}

    recs = fetch_records(cfg, fetcher)
    assert calls == ["s1", "s2", "s3"]
    assert len(recs) == 6
    assert {r["station"] for r in recs} == {"s1", "s2", "s3"}


def test_ingest_conform_backfill_coerce_audit(spark):
    cfg = RestSourceConfig(
        name="fema",
        endpoint="http://x",
        required_fields=["disaster_number", "state", "declaration_date"],
        type_map={"disaster_number": "int", "declaration_date": "timestamp"},
        classification="PUBLIC",
    )
    payload = {
        "data": [
            {"disaster_number": "4001", "state": "CO", "declaration_date": "2024-01-05 00:00:00"},
            {"disaster_number": "not-a-number", "state": "TX", "declaration_date": "bad-date"},
            {"state": "WA"},  # missing fields entirely
        ]
    }
    df = ingest_rest_source(spark, cfg, lambda url, p: payload)
    rows = {r["state"]: r for r in df.collect()}
    # declared coercion succeeded
    assert rows["CO"]["disaster_number"] == 4001
    # coerce-to-null on malformed values (pandas errors='coerce' analog)
    assert rows["TX"]["disaster_number"] is None and rows["TX"]["declaration_date"] is None
    # required-field backfill
    assert rows["WA"]["disaster_number"] is None
    # audit contract
    for c in ("ingestion_timestamp", "data_source", "data_classification",
              "retention_date", "processed_at", "processing_version"):
        assert c in df.columns
    assert rows["CO"]["data_source"] == "fema" and rows["CO"]["data_classification"] == "PUBLIC"
