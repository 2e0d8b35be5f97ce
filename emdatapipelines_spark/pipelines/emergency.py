"""The reference's full transformation DAG, rebuilt Spark-first over the
driver fixtures: sources → staging → marts → metrics → public.

Layer-for-layer parity with the dbt project
(`dbt_projects/emergency_data/models/**`):

- staging  ≈ `stg_fema_disasters.sql` / `stg_noaa_weather.sql`
  (P1 project/cast/trim, P2 not-null keys, risk ladder, audit columns)
- marts    ≈ `emergency_events.sql` (U1 union to a common schema + J1 dim
  enrichment + severity/season macros), `disaster_analytics.sql`
  (A3 multi-dim trend agg + W1 LAG YoY + A10 surrogate key)
- metrics  ≈ `data_quality_metrics.sql` (A6 union-of-aggregates profile)
- public   ≈ `public_disasters.sql` / `public_agricultural_data.sql`
  (A4 privacy threshold + rounding, W2 public code, classification filter,
  async-MV refresh via `ModelRegistry.refresh_materialized`)

Fixture mapping: `orders` plays the disaster-declaration feed (priority →
incident type), `events` plays the weather-alert stream (value → magnitude),
`nation` plays the state_codes seed dim.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from ..audit import with_audit_columns
from ..clock import DEFAULT_CLOCK
from ..functions.macros import season, surrogate_key
from ..operators.aggregates import conditional_count, privacy_round, privacy_threshold_agg
from ..operators.windows import lag_over, trend_label
from ..plans.registry import ModelRegistry
from ..queries.registry import t


def build_emergency_dag(
    spark: SparkSession, sf_dir: str, registry: ModelRegistry | None = None
) -> ModelRegistry:
    """``registry``: pass a pre-built registry (e.g. one carrying a
    GovernanceLog, or one the graph/text marts are also registered on) to
    compose the emergency DAG into a larger governed run
    (`pipelines/governed.py`)."""
    reg = registry if registry is not None else ModelRegistry()

    # -- sources ------------------------------------------------------------
    @reg.model("src_declarations")
    def src_declarations(s, deps):
        return t(s, sf_dir, "orders")

    @reg.model("src_alerts")
    def src_alerts(s, deps):
        return t(s, sf_dir, "events")

    @reg.model("seed_regions")
    def seed_regions(s, deps):
        return t(s, sf_dir, "nation").join(
            t(s, sf_dir, "region"), on=[F.col("n_regionkey") == F.col("r_regionkey")], how="left"
        ).select(
            F.col("n_nationkey").alias("region_key"),
            F.col("n_name").alias("region_name"),
            F.col("r_name").alias("super_region"),
        )

    # -- staging ------------------------------------------------------------
    @reg.model("stg_declarations", deps=["src_declarations"], materialization="table")
    def stg_declarations(s, deps):
        o = deps["src_declarations"]
        out = o.select(
            F.col("o_orderkey").alias("declaration_id"),
            (F.col("o_custkey") % 25).alias("region_key"),
            F.upper(F.trim(F.col("o_orderpriority"))).alias("incident_type"),
            F.col("o_orderdate").cast("date").alias("declaration_date"),
            F.col("o_totalprice").cast("decimal(12,2)").alias("estimated_cost"),
        ).filter(
            F.col("declaration_id").isNotNull()
            & F.col("region_key").isNotNull()
            & F.col("declaration_date").isNotNull()
        )
        return with_audit_columns(out, "declarations_feed", "PUBLIC")

    @reg.model("stg_alerts", deps=["src_alerts"], materialization="table")
    def stg_alerts(s, deps):
        e = deps["src_alerts"]
        v = F.col("value")
        out = e.select(
            F.col("event_id").alias("alert_id"),
            (F.col("user_id") % 25).alias("region_key"),
            F.upper(F.trim(F.col("event_type"))).alias("alert_type"),
            F.col("ts").cast("date").alias("alert_date"),
            v.alias("magnitude"),
            F.when(v >= 400, "CRITICAL")
            .when(v >= 200, "HIGH")
            .when(v >= 50, "MEDIUM")
            .otherwise("LOW")
            .alias("risk_level"),
        ).filter(F.col("alert_id").isNotNull() & F.col("alert_date").isNotNull())
        return with_audit_columns(out, "alerts_stream", "PUBLIC")

    # -- marts --------------------------------------------------------------
    @reg.model("emergency_events", deps=["stg_declarations", "stg_alerts", "seed_regions"],
               materialization="table")
    def emergency_events(s, deps):
        d = deps["stg_declarations"].select(
            F.lit("DECLARATION").alias("event_source"),
            F.col("declaration_id").alias("event_key"),
            "region_key",
            F.col("incident_type").alias("event_category"),
            F.col("declaration_date").alias("event_date"),
            F.col("estimated_cost").cast("double").alias("event_magnitude"),
        )
        a = deps["stg_alerts"].select(
            F.lit("ALERT").alias("event_source"),
            F.col("alert_id").alias("event_key"),
            "region_key",
            F.col("alert_type").alias("event_category"),
            F.col("alert_date").alias("event_date"),
            F.col("magnitude").alias("event_magnitude"),
        )
        unified = d.unionByName(a)
        dims = deps["seed_regions"]
        return (
            unified.join(F.broadcast(dims), "region_key", "left")
            .withColumn("event_season", season("event_date"))
            .withColumn("event_year", F.year("event_date").cast("int"))
        )

    @reg.model("disaster_analytics", deps=["emergency_events"], materialization="table")
    def disaster_analytics(s, deps):
        ev = deps["emergency_events"]
        yearly = ev.groupBy("region_name", "event_year", "event_source").agg(
            F.count(F.lit(1)).alias("event_count"),
            conditional_count(F.col("event_magnitude") > 200).alias("major_events"),
            F.sum(F.col("event_magnitude").cast("decimal(28,2)")).cast("double").alias(
                "total_magnitude"
            ),
        )
        prev = lag_over("event_count", ["region_name", "event_source"], ["event_year"])
        yoy = F.round((F.col("event_count") - prev) * 100.0 / prev, 4)
        return (
            yearly.withColumn("prev_year_count", prev)
            .withColumn("yoy_pct", yoy)
            .withColumn("trend", trend_label(F.col("yoy_pct")))
            .withColumn("analytics_id", surrogate_key("region_name", "event_year", "event_source"))
        )

    @reg.model("weather_impacts", deps=["stg_alerts"], materialization="table")
    def weather_impacts(s, deps):
        """≈ `models/marts/weather_impacts.sql`: A1 daily rollup per region +
        J3 interval join back to high-risk alert windows, with the exact
        null-extending semantics (`weather_impacts.sql:149`:
        ``COALESCE(a.alert_id IS NOT NULL, FALSE)``)."""
        alerts = deps["stg_alerts"]
        daily = alerts.groupBy("region_key", "alert_date").agg(
            F.count(F.lit(1)).alias("n_alerts"),
            F.avg("magnitude").alias("avg_magnitude"),
            F.max("magnitude").alias("max_magnitude"),
            F.count(F.when(F.col("risk_level") != "LOW", 1)).alias("elevated_alerts"),
        )
        # high-risk windows: [alert_date, alert_date + 2 days]
        windows = (
            alerts.filter(F.col("risk_level").isin("HIGH", "CRITICAL"))
            .select(
                F.col("region_key").alias("w_region"),
                F.col("alert_id").alias("window_alert_id"),
                F.col("alert_date").alias("window_start"),
                F.date_add("alert_date", 2).alias("window_end"),
            )
        )
        cond = (
            (daily["region_key"] == windows["w_region"])
            & (daily["alert_date"] >= windows["window_start"])
            & (daily["alert_date"] <= windows["window_end"])
        )
        joined = daily.join(windows, cond, "left")
        return (
            joined.groupBy("region_key", "alert_date", "n_alerts", "avg_magnitude",
                           "max_magnitude", "elevated_alerts")
            .agg(F.count("window_alert_id").alias("overlapping_windows"))
            .withColumn(
                "has_concurrent_alert",
                F.coalesce(F.col("overlapping_windows") > 0, F.lit(False)),
            )
        )

    # -- metrics ------------------------------------------------------------
    @reg.model("data_quality_metrics", deps=["stg_declarations", "stg_alerts"])
    def data_quality_metrics(s, deps):
        frames = []
        for name in ("stg_declarations", "stg_alerts"):
            df = deps[name]
            key = "declaration_id" if name == "stg_declarations" else "alert_id"
            frames.append(
                df.agg(
                    F.count(F.lit(1)).alias("row_count"),
                    F.countDistinct(key).alias("distinct_keys"),
                    F.max("ingestion_timestamp").alias("last_ingested"),
                ).select(F.lit(name).alias("table_name"), "row_count", "distinct_keys", "last_ingested")
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    # -- public -------------------------------------------------------------
    @reg.model("public_disasters", deps=["emergency_events"], materialization="table")
    def public_disasters(s, deps):
        ev = deps["emergency_events"].filter(F.col("event_source") == "DECLARATION")
        from pyspark.sql import Window

        seq = F.row_number().over(
            Window.partitionBy("region_key", "event_date").orderBy("event_key")
        )
        return ev.select(
            F.concat(
                F.lit("PUB-"),
                F.date_format("event_date", "yyyyMMdd"),
                F.lit("-"),
                F.col("region_key").cast("string"),
                F.lit("-"),
                F.lpad(seq.cast("string"), 3, "0"),
            ).alias("public_code"),
            "region_name",
            "event_category",
            "event_date",
            "event_year",
            "event_season",
        )

    @reg.model("public_region_stats", deps=["emergency_events"], materialization="table")
    def public_region_stats(s, deps):
        ev = deps["emergency_events"]
        agg = privacy_threshold_agg(
            ev,
            ["region_name", "event_year"],
            [
                F.sum(F.col("event_magnitude").cast("decimal(28,2)")).cast("double").alias(
                    "__total"
                )
            ],
            min_group_size=5,
        )
        return agg.select(
            "region_name",
            "event_year",
            "group_size",
            privacy_round("__total", -3).alias("total_magnitude_rounded"),
        )

    return reg
