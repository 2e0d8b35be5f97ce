"""Multi-tenant isolation: Spark-native twin of the reference tenant stack
(``tenant_resources.py`` — TenantConfig YAML registry :24-105, tenant
filter injection :317-339, access validation :340-348, query
classification for audit :350-361, result scope filtering :363-387,
per-tenant schema setup :388-426, TenantEncryptionManager :161-206,
TenantAuditLogger :107-159; config shape from ``tenant_config.yml``).

Spark-first re-expression: the reference injects ``WHERE tenant_id=…``
into SQL strings and post-filters driver-side result lists; here tenant
scope is a COLUMN predicate applied to the DataFrame before anything else
— Catalyst pushes it into the parquet scan (partition pruning when the
layout partitions by the scope column), so isolation costs nothing extra
at 100 TB and can never be "forgotten" downstream because the returned
frame simply contains no out-of-scope rows. Storage isolation is a
per-tenant path prefix (the schema-per-tenant twin); crypto isolation
delegates to :mod:`.crypto`'s per-tenant key derivation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from .sources.config_loader import interpolate_env

try:  # optional, like the reference's yaml import
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

#: classification lattice (low → high); a tenant may read levels ≤ its own
CLASSIFICATION_ORDER = ("PUBLIC", "INTERNAL", "RESTRICTED", "CONFIDENTIAL")


@dataclass
class TenantSpec:
    """One tenant block (`tenant_config.yml`: organization, classification
    level, data_restrictions.allowed_* scopes, database schema)."""

    tenant_id: str
    organization: str = ""
    classification_level: str = "PUBLIC"
    #: scope values (reference ``allowed_states``); empty/["ALL"] = no limit
    allowed_scopes: list[str] = field(default_factory=list)
    allowed_classifications: list[str] = field(default_factory=list)
    schema: str = ""
    retention_days: int = 365

    def effective_classifications(self) -> list[str]:
        """Explicit list wins; otherwise everything ≤ classification_level."""
        if self.allowed_classifications:
            return self.allowed_classifications
        if self.classification_level in CLASSIFICATION_ORDER:
            i = CLASSIFICATION_ORDER.index(self.classification_level)
            return list(CLASSIFICATION_ORDER[: i + 1])
        return [self.classification_level]


class TenantRegistry:
    """Tenant registry (`TenantConfig` :24-105)."""

    def __init__(self, tenants: dict[str, TenantSpec]):
        self._tenants = dict(tenants)

    def get(self, tenant_id: str) -> TenantSpec:
        if tenant_id not in self._tenants:
            raise KeyError(f"unknown tenant: {tenant_id!r}")
        return self._tenants[tenant_id]

    def all_tenants(self) -> list[str]:
        """`get_all_tenants` :102-105."""
        return sorted(self._tenants)

    def validate_access(self, tenant_id: str) -> bool:
        """`_validate_tenant_access` :340-348 (existence check; RBAC is the
        deployment's concern)."""
        return tenant_id in self._tenants


def parse_tenant_config(raw: dict, env: dict | None = None) -> TenantRegistry:
    raw = interpolate_env(raw or {}, env)
    out: dict[str, TenantSpec] = {}
    for tid, block in (raw.get("tenants") or {}).items():
        if not isinstance(block, dict):
            continue
        restrictions = block.get("data_restrictions") or {}
        out[tid] = TenantSpec(
            tenant_id=tid,
            organization=block.get("organization", ""),
            classification_level=block.get("classification_level", "PUBLIC"),
            allowed_scopes=list(restrictions.get("allowed_states", [])),
            allowed_classifications=list(restrictions.get("allowed_classifications", [])),
            schema=(block.get("database") or {}).get("schema", f"tenant_{tid}"),
            retention_days=int((block.get("database") or {}).get("backup_retention_days", 365)),
        )
    return TenantRegistry(out)


def load_tenant_yaml(path: str, env: dict | None = None) -> TenantRegistry:
    if yaml is None:  # pragma: no cover
        raise ImportError("pyyaml is required to load tenant configs")
    with open(path, "r", encoding="utf-8") as fh:
        return parse_tenant_config(yaml.safe_load(fh) or {}, env)


def tenant_scope_predicate(
    spec: TenantSpec, scope_col: str, classification_col: str | None = None
) -> Column:
    """The isolation predicate (`_inject_tenant_filter` :317-339 +
    `_filter_results_by_tenant` :363-387, as one pushable expression)."""
    pred = F.lit(True)
    if spec.allowed_scopes and "ALL" not in spec.allowed_scopes:
        pred = F.col(scope_col).isin(spec.allowed_scopes)
    if classification_col is not None:
        pred = pred & F.col(classification_col).isin(spec.effective_classifications())
    return pred


def tenant_view(
    df: DataFrame,
    spec: TenantSpec,
    scope_col: str,
    classification_col: str | None = None,
) -> DataFrame:
    """Row-level-secured view of ``df`` for one tenant: scope + classification
    filters plus a ``tenant_id`` column, applied BEFORE any downstream logic
    so the predicate reaches the scan."""
    return df.filter(tenant_scope_predicate(spec, scope_col, classification_col)).withColumn(
        "tenant_id", F.lit(spec.tenant_id)
    )


def tenant_storage_path(base: str, spec: TenantSpec) -> str:
    """Per-tenant physical isolation (`setup_tenant_database` :388-426 —
    schema-per-tenant becomes path-per-tenant on object storage)."""
    return f"{base.rstrip('/')}/{spec.schema or 'tenant_' + spec.tenant_id}"


def classify_action(sql_or_action: str) -> str:
    """`_classify_query` :350-361 — READ/WRITE/DDL/OTHER for audit rows."""
    head = sql_or_action.strip().upper().split(" ")[0] if sql_or_action.strip() else ""
    if head == "SELECT":
        return "READ"
    if head in ("INSERT", "UPDATE", "DELETE", "MERGE"):
        return "WRITE"
    if head in ("CREATE", "DROP", "ALTER"):
        return "DDL"
    return "OTHER"
