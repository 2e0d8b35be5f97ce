"""SparkSession factory tuned for the engine's execution profile.

Replaces the reference's scattered engine configs (Flink parallelism in
`flink/conf/flink-conf.yml:17-20`, StarRocks fragment parallelism/memory in
`starrocks/fe.conf:33-38`, page cache in `starrocks/be.conf:26-28`) with one
Spark conf surface. Design point: tests run on ``local[N]`` but every setting
is chosen to also hold on a 1000-executor cluster reading ~100 TB — AQE
handles runtime re-planning (partition coalescing, skew-join splitting),
broadcast thresholds keep dim joins shuffle-free, and Arrow makes the
pandas-interchange path vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "emdatapipelines-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    AQE is on so skewed keys (the reference's 51-state hash-distribution key,
    `resources/database.py:160`, is inherently skewed) are split at runtime,
    and post-shuffle partitions coalesce to the data's real size.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", max(cpus, 8))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # NOTE (r11): canChangeCachedPlanOutputPartitioning stays at its
        # FALSE default. Enabling it fixed cached-MV serving (AQE could
        # coalesce stages above InMemoryTableScans) but coalesces
        # byte-small/CPU-heavy persisted frames too — dd_containment's
        # verify join dropped from 32 tasks to 4 and slowed ~1.5x. The MV
        # fix that survives both workloads is partition-sizing the mart
        # roots themselves (coalesce(1) on dimension-sized models in
        # plans/graph_marts.py); with that, serving is equally fast with
        # the conf off (A/B in SCALING.md round-11).
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
