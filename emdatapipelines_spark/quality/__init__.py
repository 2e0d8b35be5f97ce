"""Data-quality / validation subsystem (SURVEY §2.10 Q1–Q11).

The reference treats quality as a first-class surface: a 5-dimension scoring
system (`ops/data_quality_ops.py`), declarative validation schemas
(`config/validation_schemas.py`), PII scanning (`utils/data_validation.py:400-427`)
and dbt column/singular tests. Here every check is a DataFrame → metrics
aggregation computed in one distributed pass (never collect-then-inspect).
"""

from .profile import completeness_profile, column_profile  # noqa: F401
from .checks import accuracy_outlier_count, consistency_checks, validity_checks  # noqa: F401
from .freshness import freshness_check  # noqa: F401
from .pii import pii_scan, PII_PATTERNS  # noqa: F401
from .dbt_tests import (  # noqa: F401
    test_not_null,
    test_unique,
    test_relationships,
    test_accepted_values,
    test_accepted_range,
    run_test_suite,
)
from .report import composite_quality_score  # noqa: F401
from .drift import bin_counts, psi_by_bin  # noqa: F401
from .alerts import AlertRule, evaluate_alert_rules  # noqa: F401
from .alerts import AlertRule, evaluate_alert_rules, escalate_entities  # noqa: F401
