"""Business-logic scalar functions as Column expressions.

Each function documents the reference macro/lambda whose semantics it
reproduces (file:line cited); all are pure Spark column expressions.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, functions as F


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# severity / risk / impact scoring
# ---------------------------------------------------------------------------

def event_severity(incident_type, duration_days, population_affected) -> Column:
    """Event severity score 1–10.

    ≈ `macros/calculate_event_severity.sql:1-10`: a base score by incident
    type plus duration and population adders, capped at 10.
    """
    t = F.upper(_col(incident_type))
    base = (
        F.when(t.isin("HURRICANE", "TORNADO", "EARTHQUAKE"), F.lit(8))
        .when(t.isin("FLOOD", "FIRE", "WILDFIRE"), F.lit(6))
        .when(t.isin("SEVERE STORM", "WINTER STORM", "SNOWSTORM"), F.lit(4))
        .otherwise(F.lit(2))
    )
    dur = F.coalesce(_col(duration_days), F.lit(0))
    pop = F.coalesce(_col(population_affected), F.lit(0))
    adders = (
        F.when(dur > 30, F.lit(2)).when(dur > 7, F.lit(1)).otherwise(F.lit(0))
        + F.when(pop > 100000, F.lit(2)).when(pop > 10000, F.lit(1)).otherwise(F.lit(0))
    )
    return F.least(base + adders, F.lit(10))


def risk_score(temperature, precipitation, wind_speed) -> Column:
    """Additive 0–9 weather risk score.

    ≈ `macros/calculate_risk_score.sql:2-21`: 3 points per extreme dimension
    (temp ≤ −10 or ≥ 35 °C; precipitation ≥ 25; wind ≥ 60), else 1 point per
    elevated dimension, else 0. Null-safe (null dimension contributes 0).
    """
    t, p, w = _col(temperature), _col(precipitation), _col(wind_speed)
    t_pts = (
        F.when(t.isNull(), F.lit(0))
        .when((t <= -10) | (t >= 35), F.lit(3))
        .when((t <= 0) | (t >= 30), F.lit(1))
        .otherwise(F.lit(0))
    )
    p_pts = (
        F.when(p.isNull(), F.lit(0))
        .when(p >= 25, F.lit(3))
        .when(p >= 10, F.lit(1))
        .otherwise(F.lit(0))
    )
    w_pts = (
        F.when(w.isNull(), F.lit(0))
        .when(w >= 60, F.lit(3))
        .when(w >= 30, F.lit(1))
        .otherwise(F.lit(0))
    )
    return t_pts + p_pts + w_pts


def categorize_disaster_impact(score) -> Column:
    """Score → impact category band.

    ≈ `macros/categorize_disaster_impact.sql:1-8`:
    ≥8 CATASTROPHIC, ≥6 MAJOR, ≥4 MODERATE, ≥2 MINOR, else MINIMAL.
    """
    s = _col(score)
    return (
        F.when(s >= 8, F.lit("CATASTROPHIC"))
        .when(s >= 6, F.lit("MAJOR"))
        .when(s >= 4, F.lit("MODERATE"))
        .when(s >= 2, F.lit("MINOR"))
        .otherwise(F.lit("MINIMAL"))
    )


def alert_priority(risk_level, urgency, certainty, population) -> Column:
    """Composite emergency-alert priority 1 (highest) – 5.

    ≈ `macros/generate_emergency_alert_priority.sql:2-19`: risk/urgency/
    certainty ladders combined with LEAST/COALESCE guards.
    """
    r, u, c, p = _col(risk_level), _col(urgency), _col(certainty), _col(population)
    r_pts = (
        F.when(F.upper(r) == "CRITICAL", F.lit(1))
        .when(F.upper(r) == "HIGH", F.lit(2))
        .when(F.upper(r) == "MEDIUM", F.lit(3))
        .otherwise(F.lit(4))
    )
    u_adj = F.when(u == "Immediate", F.lit(-1)).when(u == "Expected", F.lit(0)).otherwise(F.lit(1))
    c_adj = F.when(c == "Observed", F.lit(-1)).when(c == "Likely", F.lit(0)).otherwise(F.lit(1))
    p_adj = F.when(F.coalesce(p, F.lit(0)) > 100000, F.lit(-1)).otherwise(F.lit(0))
    return F.greatest(F.least(r_pts + u_adj + c_adj + p_adj, F.lit(5)), F.lit(1))


def alert_status(expires_ts, clock_ts: Column) -> Column:
    """ACTIVE/EXPIRED flag (pandas lambda at `assets/processed_data.py:165-169`;
    SQL form at `models/public/public_weather_alerts.sql:77-81`)."""
    e = _col(expires_ts)
    return F.when(e.isNull() | (e > clock_ts), F.lit("ACTIVE")).otherwise(F.lit("EXPIRED"))


# ---------------------------------------------------------------------------
# calendar
# ---------------------------------------------------------------------------

def federal_fiscal_year(d) -> Column:
    """US federal fiscal year: Oct–Dec belong to the next FY.

    ≈ `macros/get_federal_fiscal_year.sql:2-7` and
    `assets/processed_data.py:56-58`.
    """
    c = _col(d)
    return (F.year(c) + F.when(F.month(c) >= 10, F.lit(1)).otherwise(F.lit(0))).cast("int")


def season(d) -> Column:
    """Month → season bucket (≈ `models/marts/emergency_events.sql:104-109`)."""
    m = F.month(_col(d))
    return (
        F.when(m.isin(12, 1, 2), F.lit("WINTER"))
        .when(m.isin(3, 4, 5), F.lit("SPRING"))
        .when(m.isin(6, 7, 8), F.lit("SUMMER"))
        .otherwise(F.lit("FALL"))
    )


def seasonal_risk_factor(d, incident_type) -> Column:
    """Seasonal risk multiplier by (season, hazard type).

    ≈ `macros/get_seasonal_risk_factors.sql:2-10` + the month→multiplier map
    in `assets/ml_assets.py:394-397`.
    """
    s = season(d)
    t = F.upper(_col(incident_type))
    return (
        F.when((s == "SUMMER") & t.isin("FIRE", "WILDFIRE", "DROUGHT"), F.lit(1.5))
        .when((s == "SPRING") & t.isin("FLOOD", "TORNADO", "SEVERE STORM"), F.lit(1.4))
        .when((s == "WINTER") & t.isin("WINTER STORM", "SNOWSTORM", "FREEZE"), F.lit(1.5))
        .when((s == "FALL") & t.isin("HURRICANE",), F.lit(1.3))
        .otherwise(F.lit(1.0))
    )


def timestampdiff_hours(start, end) -> Column:
    """MySQL ``TIMESTAMPDIFF(HOUR, a, b)`` floor semantics
    (`models/staging/stg_noaa_weather.sql:54-57`) — Spark has no direct
    equivalent, so: floor((unix(b) − unix(a)) / 3600)."""
    return F.floor((F.unix_timestamp(_col(end)) - F.unix_timestamp(_col(start))) / 3600).cast("long")


# ---------------------------------------------------------------------------
# numeric helpers
# ---------------------------------------------------------------------------

def safe_ratio(num, den, scale: int | None = None) -> Column:
    """Division guarded by NULLIF(den, 0)
    (`models/public/public_agricultural_data.sql:53`)."""
    n, d = _col(num), _col(den)
    r = n / F.when(d != 0, d)
    return F.round(r, scale) if scale is not None else r


def zscore(value, mean_col, std_col, clip: float | None = 3.0) -> Column:
    """(x − mean)/std with optional ±clip, std-0 guarded
    (`assets/ml_assets.py:363-376`)."""
    z = (_col(value) - _col(mean_col)) / F.when(_col(std_col) != 0, _col(std_col))
    if clip is not None:
        z = F.greatest(F.least(z, F.lit(float(clip))), F.lit(-float(clip)))
    return z


def heat_index(temperature, humidity) -> Column:
    """Simplified heat index ``temp − ((100 − humidity)/5)`` when temp > 26.7 °C
    (`models/staging/stg_coagmet_data.sql:57-61`)."""
    t, h = _col(temperature), _col(humidity)
    return F.when((t > 26.7) & h.isNotNull(), F.round(t - ((F.lit(100.0) - h) / 5.0), 2)).otherwise(t)


def mask_sensitive(col, classification, is_admin: bool = False) -> Column:
    """Mask a sensitive column for non-admin readers.

    ≈ `macros/federal_compliance.sql:15-25`: for RESTRICTED/CONFIDENTIAL
    classifications a non-admin reader sees
    ``CONCAT(LEFT(col, 2), REPEAT('*', LENGTH(col) - 2))``; admins and
    lower classifications see the raw value.
    """
    c, k = _col(col), _col(classification)
    if is_admin:
        return c
    masked = F.concat(
        F.substring(c, 1, 2), F.repeat(F.lit("*"), F.greatest(F.length(c) - 2, F.lit(0)))
    )
    return F.when(k.isin("RESTRICTED", "CONFIDENTIAL"), masked).otherwise(c)


def surrogate_key(*cols) -> Column:
    """Deterministic surrogate key ``MD5(CONCAT_WS('_', ...))``
    (`models/marts/disaster_analytics.sql:81`, `weather_impacts.sql:94`)."""
    return F.md5(F.concat_ws("_", *[_col(c).cast("string") for c in cols]))


# ---------------------------------------------------------------------------
# state-code standardization
# ---------------------------------------------------------------------------

_STATES = [
    ("AL", "ALABAMA", "01"), ("AK", "ALASKA", "02"), ("AZ", "ARIZONA", "04"),
    ("AR", "ARKANSAS", "05"), ("CA", "CALIFORNIA", "06"), ("CO", "COLORADO", "08"),
    ("CT", "CONNECTICUT", "09"), ("DE", "DELAWARE", "10"), ("FL", "FLORIDA", "12"),
    ("GA", "GEORGIA", "13"), ("HI", "HAWAII", "15"), ("ID", "IDAHO", "16"),
    ("IL", "ILLINOIS", "17"), ("IN", "INDIANA", "18"), ("IA", "IOWA", "19"),
    ("KS", "KANSAS", "20"), ("KY", "KENTUCKY", "21"), ("LA", "LOUISIANA", "22"),
    ("ME", "MAINE", "23"), ("MD", "MARYLAND", "24"), ("MA", "MASSACHUSETTS", "25"),
    ("MI", "MICHIGAN", "26"), ("MN", "MINNESOTA", "27"), ("MS", "MISSISSIPPI", "28"),
    ("MO", "MISSOURI", "29"), ("MT", "MONTANA", "30"), ("NE", "NEBRASKA", "31"),
    ("NV", "NEVADA", "32"), ("NH", "NEW HAMPSHIRE", "33"), ("NJ", "NEW JERSEY", "34"),
    ("NM", "NEW MEXICO", "35"), ("NY", "NEW YORK", "36"), ("NC", "NORTH CAROLINA", "37"),
    ("ND", "NORTH DAKOTA", "38"), ("OH", "OHIO", "39"), ("OK", "OKLAHOMA", "40"),
    ("OR", "OREGON", "41"), ("PA", "PENNSYLVANIA", "42"), ("RI", "RHODE ISLAND", "44"),
    ("SC", "SOUTH CAROLINA", "45"), ("SD", "SOUTH DAKOTA", "46"), ("TN", "TENNESSEE", "47"),
    ("TX", "TEXAS", "48"), ("UT", "UTAH", "49"), ("VT", "VERMONT", "50"),
    ("VA", "VIRGINIA", "51"), ("WA", "WASHINGTON", "53"), ("WV", "WEST VIRGINIA", "54"),
    ("WI", "WISCONSIN", "55"), ("WY", "WYOMING", "56"), ("DC", "DISTRICT OF COLUMBIA", "11"),
    ("PR", "PUERTO RICO", "72"),
]


def standardize_state_code(c) -> Column:
    """Normalize 2-letter code / full state name / FIPS → 2-letter code.

    ≈ the ~110-branch CASE in `macros/standardize_state_code.sql:2-115`,
    expressed as a literal-map lookup (constant-folded by Catalyst; no join,
    no UDF). Unknown inputs pass through upper-trimmed, matching the macro's
    ELSE branch.
    """
    x = F.upper(F.trim(_col(c)))
    pairs = []
    for code, name, fips in _STATES:
        pairs += [F.lit(code), F.lit(code), F.lit(name), F.lit(code), F.lit(fips), F.lit(code)]
    m = F.create_map(list(pairs))
    return F.coalesce(m[x], x)


def state_name_for_code(c) -> Column:
    """2-letter code → full name (title case not applied; reference seeds
    carry the display name — `seeds/state_codes.csv`)."""
    x = F.upper(F.trim(_col(c)))
    pairs = list(chain.from_iterable((F.lit(code), F.lit(name)) for code, name, _ in _STATES))
    return F.create_map(pairs)[x]
