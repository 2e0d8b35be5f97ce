"""Event-time normalization layer.

Real lakes hand Spark a mix of timestamp physical types: pandas/Arrow-written
parquet carries ``timestamp[us]`` WITHOUT the ``isAdjustedToUTC`` flag, which
pyspark 4.x surfaces as TIMESTAMP_NTZ, and some writers emit nanosecond
precision Spark cannot represent at all. The engine's event-time surface
(``withWatermark``, ``unix_micros``, ``session_window``) requires TIMESTAMP
(with local-tz semantics), so every load path funnels through this module.

Convention: the engine pins ``spark.sql.session.timeZone=UTC``
(`session.py:46`), so casting a naive NTZ value to TIMESTAMP re-tags the same
wall-clock instant as UTC — exactly how DuckDB's ``epoch()`` interprets a
naive timestamp, which keeps oracle hashes identical.

The reference never needed this layer because StarRocks DATETIME is always
naive (`resources/database.py:156-166`); Spark's richer type system makes the
normalization explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def normalize_event_time(df: DataFrame, *cols: str) -> DataFrame:
    """Cast NTZ / nano-precision event-time columns to session-tz TIMESTAMP.

    With no explicit ``cols``, every TIMESTAMP_NTZ column in the schema is
    normalized (idempotent: TIMESTAMP columns pass through untouched, so the
    call is safe on already-clean frames and on streaming DataFrames, where
    it preserves watermark eligibility).
    """
    dtypes = dict(df.dtypes)
    targets = list(cols) if cols else [c for c, t in dtypes.items() if t == "timestamp_ntz"]
    for c in targets:
        t = dtypes.get(c)
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        elif t == "bigint":
            # nanosAsLong raw nanos: integer `div`, not floor(double /) —
            # nanosecond epochs exceed 2^53 so double division loses the
            # low microseconds
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def epoch_seconds(col) -> F.Column:
    """Exact epoch seconds (double) for TIMESTAMP or TIMESTAMP_NTZ input.

    ``cast(ts as double)`` is only legal on TIMESTAMP; going through
    ``unix_micros`` on a defensively-cast column works for both and is
    bit-identical for in-range (< 2^53 µs) epochs.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp")) / F.lit(1_000_000.0)
