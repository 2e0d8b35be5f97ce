"""Config-driven REST API sources (SURVEY §2.1 S1–S5).

≈ the reference's ingestion assets: FEMA OData params
(`assets/raw_data.py:38-99`), NOAA GeoJSON feature flattening
(`assets/raw_data.py:107-184`), CoAgMet station fan-out
(`assets/raw_data.py:192-279`), USDA keyed yearly params
(`assets/raw_data.py:287-356`), and the generic configurable source with
container-key sniffing + null backfill + coerce-to-null typing
(`assets/raw_data.py:364-436`, `ops/data_ingestion_ops.py:46-188`).

Design: the HTTP fetch itself is an injectable callable (tests use fakes; a
real deployment passes a requests/aiohttp wrapper). Fetching is driver-side —
correct for control-plane-sized API payloads; at scale the landed JSON files
are read with ``spark.read.json`` instead (S6) and everything downstream of
``conform_records`` is identical.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

from ..audit import with_audit_columns
from ..clock import DEFAULT_CLOCK, Clock

#: container keys sniffed, in order (`assets/raw_data.py:395-405`).
CONTAINER_KEYS = ("data", "results", "items", "records", "features")

#: Fetcher signature: (endpoint, params) -> parsed JSON (dict or list).
Fetcher = Callable[[str, dict], object]


@dataclass
class RestSourceConfig:
    """One REST source (≈ one entry of `config/sources.yml`)."""

    name: str
    endpoint: str
    params: dict = field(default_factory=dict)
    #: required output fields — missing ones are backfilled with nulls
    #: (`ops/data_ingestion_ops.py:167-174`)
    required_fields: list[str] = field(default_factory=list)
    #: {field: spark_type_ddl} coercions, errors → null
    #: (`ops/data_ingestion_ops.py:177-188` ``errors='coerce'``)
    type_map: dict = field(default_factory=dict)
    #: geographic/entity partition key (Kafka message key, S9)
    key_field: str | None = None
    classification: str = "PUBLIC"
    #: fan-out: fetch once per item of this param list (CoAgMet stations, S3)
    fan_out_param: str | None = None
    fan_out_values: list = field(default_factory=list)


def _extract_container(payload) -> list[dict]:
    """Find the record list in a JSON payload by sniffing known container
    keys; a bare list is already the records (`raw_data.py:395-405`)."""
    if isinstance(payload, list):
        return payload
    if isinstance(payload, dict):
        for k in CONTAINER_KEYS:
            v = payload.get(k)
            if isinstance(v, list):
                if k == "features":
                    return [_flatten_feature(f) for f in v]
                return v
        # OData-style single container fallback: first list-valued key
        for v in payload.values():
            if isinstance(v, list) and (not v or isinstance(v[0], dict)):
                return v
    return []


def _flatten_feature(feature: dict) -> dict:
    """GeoJSON feature → flat record: properties keep their names, geometry
    is serialized to a JSON string (`assets/emergency_scrapers.py:228`
    ``json.dumps(alert.get('geometry'))``)."""
    rec = dict(feature.get("properties") or {})
    rec["feature_id"] = feature.get("id")
    geom = feature.get("geometry")
    rec["geometry"] = json.dumps(geom) if geom is not None else None
    if isinstance(geom, dict):
        rec["geometry_type"] = geom.get("type")
    return rec


def fetch_records(config: RestSourceConfig, fetcher: Fetcher) -> list[dict]:
    """Fetch all records for a source, fanning out if configured (S3's
    station→readings pattern, `raw_data.py:192-279`)."""
    if config.fan_out_param and config.fan_out_values:
        out: list[dict] = []
        for v in config.fan_out_values:
            params = {**config.params, config.fan_out_param: v}
            recs = _extract_container(fetcher(config.endpoint, params))
            for r in recs:
                r.setdefault(config.fan_out_param, v)
            out.extend(recs)
        return out
    return _extract_container(fetcher(config.endpoint, dict(config.params)))


def conform_records(
    spark: SparkSession,
    records: Iterable[dict],
    config: RestSourceConfig,
    schema: StructType | None = None,
    clock: Clock = DEFAULT_CLOCK,
) -> DataFrame:
    """Records → conformed DataFrame: required-field null backfill, declared
    type coercion with errors→null, audit columns.

    ``try_cast`` is the distributed twin of pandas ``errors='coerce'``
    (`data_ingestion_ops.py:177-188`): a malformed value nulls out instead of
    failing the batch — the quality layer (Q1–Q8) then quantifies the damage.
    """
    rows = [json.loads(json.dumps(r, default=str)) for r in records]
    if schema is not None:
        df = spark.createDataFrame(rows, schema=schema)
    elif rows:
        # declared-but-tolerant landing: without a declared schema every field
        # lands as a string (nested values as JSON text) and ``type_map``
        # casts the declared ones. This survives all-null columns and
        # mixed-type fields that break type inference on messy API payloads.
        keys: list[str] = []
        for r in rows:
            for k in r:
                if k not in keys:
                    keys.append(k)
        str_rows = [
            tuple(
                None
                if r.get(k) is None
                else (r[k] if isinstance(r[k], str) else json.dumps(r[k]))
                for k in keys
            )
            for r in rows
        ]
        df = spark.createDataFrame(str_rows, ", ".join(f"`{k}` string" for k in keys))
    else:
        df = spark.createDataFrame([], "record_id string")
    for f_name in config.required_fields:
        if f_name not in df.columns:
            df = df.withColumn(f_name, F.lit(None).cast("string"))
    for f_name, ddl in config.type_map.items():
        if f_name in df.columns:
            df = df.withColumn(f_name, F.col(f_name).cast("string").try_cast(ddl))
    return with_audit_columns(df, config.name, config.classification, clock=clock)


def ingest_rest_source(
    spark: SparkSession,
    config: RestSourceConfig,
    fetcher: Fetcher,
    schema: StructType | None = None,
    clock: Clock = DEFAULT_CLOCK,
) -> DataFrame:
    """S1–S5 end-to-end: fetch → container-extract → conform → audit."""
    return conform_records(spark, fetch_records(config, fetcher), config, schema, clock)
