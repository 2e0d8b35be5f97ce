"""Injectable clock — deterministic replacement for NOW()/CURRENT_DATE().

The reference leans on wall-clock SQL (``DATE_SUB(CURRENT_DATE(), INTERVAL n
DAY)`` in `dbt_projects/emergency_data/models/marts/disaster_analytics.sql:34`,
`models/public/public_disasters.sql:37`, freshness checks in
`pipelines/dagster/emergency_pipeline/ops/data_quality_ops.py:329-365`, …)
roughly 60 times. For deterministic, oracle-comparable results every operator
in this engine that needs "now" takes a :class:`Clock` and uses its literal
columns instead of ``F.current_timestamp()``.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, datetime, timedelta

from pyspark.sql import Column, functions as F

#: Default pinned "now" for fixture queries (see FIXTURES.md determinism
#: rules). events.parquet spans 2024-01-01..2024-01-30, so this sits just
#: after the stream's end.
DEFAULT_AS_OF = datetime(2024, 2, 1, 0, 0, 0)


@dataclass(frozen=True)
class Clock:
    """A frozen point-in-time standing in for the session wall clock."""

    as_of: datetime = DEFAULT_AS_OF

    def timestamp(self) -> Column:
        """``CURRENT_TIMESTAMP()`` / ``NOW()`` as a literal column."""
        return F.to_timestamp(F.lit(self.as_of.strftime("%Y-%m-%d %H:%M:%S")))

    def date(self) -> Column:
        """``CURRENT_DATE()`` as a literal column."""
        return F.to_date(F.lit(self.as_of.date().isoformat()))

    def date_sub(self, days: int) -> Column:
        """``DATE_SUB(CURRENT_DATE(), INTERVAL days DAY)``."""
        return F.date_sub(self.date(), days)

    def ts_sub(self, **delta) -> Column:
        """``NOW() - INTERVAL ...`` (timedelta kwargs)."""
        t = self.as_of - timedelta(**delta)
        return F.to_timestamp(F.lit(t.strftime("%Y-%m-%d %H:%M:%S")))

    # plain-Python accessors for driver-side rule logic
    def py_date(self) -> date:
        return self.as_of.date()

    def py_timestamp(self) -> datetime:
        return self.as_of

    # literal strings for embedding into oracle SQL text
    def iso_ts(self) -> str:
        return self.as_of.strftime("%Y-%m-%d %H:%M:%S")

    def iso_date_sub(self, days: int) -> str:
        return (self.as_of.date() - timedelta(days=days)).isoformat()

    def iso_ts_sub(self, **delta) -> str:
        return (self.as_of - timedelta(**delta)).strftime("%Y-%m-%d %H:%M:%S")


DEFAULT_CLOCK = Clock()
