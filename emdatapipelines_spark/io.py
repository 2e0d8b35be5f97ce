"""Table IO — fixture loading plus the partitioned-write layout planner.

Read side replaces the reference's dbt external sources (S3 parquet/json/csv,
`dbt_projects/emergency_data/models/sources/sources.yml:26-28`) and seed CSVs.
Write side replaces StarRocks physical DDL: hash distribution + range
partitioning + sort keys (`resources/database.py:140-174`,
`macros/create_partitioned_table.sql:1-27`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver fixture table (see TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or FIXTURE_TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_csv_seed(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Typed seed-dimension reader (≈ dbt seeds, `dbt_project.yml:86-104`)."""
    return spark.read.csv(path, header=True, schema=schema)


def read_json_source(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """JSON landing-file reader with corrupt-record tolerance — the batch
    analog of the reference's ignore-parse-errors Kafka scan
    (`resources/flink.py:217-226`)."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt_record"
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a managed table hash-bucketed on join/aggregation keys.

    The true Spark analog of StarRocks ``DISTRIBUTED BY HASH(k) BUCKETS n``
    (`resources/database.py:156-166`): two tables bucketed the same way
    join/aggregate with NO exchange — the shuffle is paid once at write time
    instead of on every read query. See tests/test_bucketing.py for the
    plan-level proof (join of two bucketed tables contains zero Exchange
    operators). At 100 TB this converts the nightly fact-fact join from the
    dominant shuffle into a local merge.
    """
    writer = df.write.mode(mode).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def optimal_bucket_count(row_estimate: int) -> int:
    """Bucket-count heuristic by table size.

    Mirrors the reference's StarRocks sizing rule (1/4/8/16/32 buckets by row
    count, `macros/get_optimal_bucket_count.sql:2-14`) as a write-layout
    helper: at 100 TB the same idea scales to "partitions sized ~128 MB".
    """
    if row_estimate < 100_000:
        return 1
    if row_estimate < 1_000_000:
        return 4
    if row_estimate < 10_000_000:
        return 8
    if row_estimate < 100_000_000:
        return 16
    return 32


def write_olap_table(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    distribute_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    buckets: int | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Write a table with OLAP physical layout.

    ≈ StarRocks ``PARTITION BY RANGE(date) DISTRIBUTED BY HASH(key) BUCKETS n``
    with ``duplicate_key`` sort columns (`resources/database.py:156-166`;
    model configs like `models/staging/stg_fema_disasters.sql:2-13`):

    - ``partitionBy(date_col)`` → partition pruning on read (the reference's
      range partitions),
    - ``repartition(buckets, keys)`` → hash distribution / co-located joins,
    - ``sortWithinPartitions`` → the duplicate_key sort order (row-group
      min/max skipping on read).
    """
    out = df
    if distribute_by:
        out = out.repartition(buckets or 8, *distribute_by)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode).option("compression", compression)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
