"""Table IO — fixture loading plus the partitioned-write layout planner.

Read side replaces the reference's dbt external sources (S3 parquet/json/csv,
`dbt_projects/emergency_data/models/sources/sources.yml:26-28`) and seed CSVs.
Write side replaces StarRocks physical DDL: hash distribution + range
partitioning + sort keys (`resources/database.py:140-174`,
`macros/create_partitioned_table.sql:1-27`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
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
    """Load one driver fixture table (see TESTDATA.md), normalizing any
    TIMESTAMP_NTZ event-time columns at the boundary (eventtime.py)."""
    from .eventtime import normalize_event_time

    return normalize_event_time(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))


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


def zorder_column(
    df: DataFrame,
    cols: list[str],
    bounds: dict[str, tuple[float, float]] | None = None,
    bits: int = 16,
    out: str = "__z",
) -> DataFrame:
    """Morton (Z-order) interleave of 2+ numeric columns into one sort key.

    A single-column sort clusters min/max file statistics for that column
    only; sorting by the interleaved key clusters files into hyper-rectangles
    that are tight in EVERY participating dimension, so a conjunctive range
    predicate (x BETWEEN .. AND y BETWEEN ..) prunes files/row-groups on all
    dimensions at once — the standard multi-dim data-skipping layout
    (Delta OPTIMIZE ZORDER BY's mechanism).

    Columns are min-max quantized to ``bits`` levels; ``bounds`` pins the
    quantization range (pass stored table stats — at 100 TB you never want a
    pre-pass); when omitted, one tiny agg computes them. The interleave is a
    chain of shift/mask JVM expressions — whole-stage codegen, no UDFs.
    """
    if len(cols) < 2:
        raise ValueError("zorder needs at least 2 columns")
    if bounds is None:
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"{c}__lo"), F.max(c).alias(f"{c}__hi")]
        row = df.agg(*aggs).collect()[0]
        bounds = {c: (row[f"{c}__lo"], row[f"{c}__hi"]) for c in cols}

    quantized = []
    for c in cols:
        lo, hi = bounds[c]
        span = (hi - lo) or 1
        q = F.least(
            F.lit((1 << bits) - 1),
            F.greatest(
                F.lit(0),
                ((F.col(c).cast("double") - F.lit(float(lo))) / F.lit(float(span))
                 * F.lit((1 << bits) - 1)).cast("long"),
            ),
        )
        quantized.append(q)

    z = F.lit(0).cast("long")
    n = len(cols)
    for bit in range(bits):
        for d, q in enumerate(quantized):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, bit).bitwiseAND(F.lit(1)), bit * n + d)
            )
    return df.withColumn(out, z)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write parquet clustered by the Morton key: range-partition on the key
    (so each output file owns a contiguous Z-range = a tight hyper-rectangle)
    and sort within partitions (so row-group stats inside each file are tight
    too). The key column itself is dropped from the stored schema."""
    zdf = zorder_column(df, cols, bits=bits)
    (
        zdf.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
