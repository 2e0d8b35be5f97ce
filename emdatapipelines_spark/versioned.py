"""Versioned table sink — snapshot isolation + time travel on plain parquet.

The reference's serving tables are StarRocks primary-key tables whose
ingestion jobs overwrite/merge in place (`resources/database.py:111-117`)
with retention cleanup (`database.py:215-218`); readers see whatever the
last committed load left. This module gives the lakehouse equivalent the
way Delta/Iceberg do it, reduced to the two mechanisms that matter:

  - **atomic snapshot commit**: each write lands under ``v=N/`` and becomes
    visible only when the single small ``_LATEST`` pointer file is atomically
    replaced (rename) — readers never observe a half-written snapshot;
  - **time travel**: ``read_versioned(..., version=k)`` pins any retained
    snapshot; ``history()`` lists commits with row counts and modes.

Scale notes: the pointer/manifest are O(1) metadata — data files are written
once, never rewritten (append mode reuses prior snapshot FILES by reference,
not by copy, so a 100 TB table's append commit costs only the new
partitions). ``vacuum`` deletes snapshots past a retention count, never the
files a retained manifest still references.

**Commit-protocol boundary (what this module assumes and what it does not
provide).** The commit point is ``os.replace`` of the ``_LATEST`` pointer —
atomic on POSIX filesystems (local disk, NFSv4, HDFS via a rename-capable
client), NOT on S3-style object stores, where "rename" is copy+delete and
two writers can interleave. The protocol additionally assumes a SINGLE
WRITER per table: concurrent writers can both compute ``prev+1``, and the
stager's orphan cleanup (``shutil.rmtree`` of an un-pointed ``v=N/``) could
delete the other writer's in-flight stage. Multi-writer or object-store
deployments need the same escalation the lakehouse formats made: a
conditional put / put-if-absent of the version object (S3 now supports
If-None-Match, GCS has generation preconditions) or an external lock/catalog
service arbitrating the pointer, exactly as Delta's LogStore and Iceberg's
catalog commit do. Readers are unaffected either way — they only follow the
pointer to an immutable manifest.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

_LATEST = "_LATEST"
_MANIFEST = "_manifest.json"


def _table_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def _latest_version(path: str) -> int | None:
    try:
        with open(os.path.join(path, _LATEST), "r", encoding="utf-8") as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return None


def _count_parquet_rows(data_dir: str) -> int:
    """Exact row count of the files this commit just wrote, from parquet
    footer metadata — O(#new files) driver-side reads instead of a Spark
    job scanning the data back (the same accounting cost a Delta/Iceberg
    commit pays to record its file list)."""
    import glob

    import pyarrow.parquet as pq

    total = 0
    for f in glob.glob(os.path.join(data_dir, "**", "part-*.parquet"), recursive=True):
        total += pq.ParquetFile(f).metadata.num_rows
    return total


def _manifest(path: str, version: int) -> dict:
    with open(os.path.join(path, f"v={version}", _MANIFEST), "r", encoding="utf-8") as fh:
        return json.load(fh)


class AuditFailed(RuntimeError):
    """Raised by write_versioned when the pre-publish audit reports
    violations; the staged snapshot is discarded and readers keep seeing
    the previous version."""

    def __init__(self, violations: list[str]):
        super().__init__("; ".join(violations))
        self.violations = violations


def write_versioned(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    meta: dict | None = None,
    audit=None,
) -> int:
    """Commit ``df`` as the next snapshot of the table at ``path``.

    ``mode='overwrite'`` makes the new snapshot exactly ``df``;
    ``mode='append'`` makes it previous-snapshot ∪ ``df`` — implemented by
    REFERENCING the previous snapshot's data directories in the new
    manifest, so append never rewrites history (constant metadata cost, no
    data copy). Returns the committed version number.

    ``audit`` enables write-audit-publish: a callable receiving the STAGED
    snapshot DataFrame (read back from the files just written — what readers
    would actually see) and returning a list of violation strings. The
    pointer flips only on an empty list; otherwise the staged directory is
    deleted and :class:`AuditFailed` raises, so a bad batch can never become
    visible — the quality layer's checks (`quality/dbt_tests.py`,
    `quality/schema.py`) plug in directly.
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode: {mode}")
    path = _table_dir(path)
    prev = _latest_version(path)
    version = 0 if prev is None else prev + 1
    vdir = os.path.join(path, f"v={version}")
    if os.path.isdir(vdir):
        # the pointer never reached this version, so the directory is an
        # orphan from a crashed stage/audit — readers can't have seen it
        import shutil

        shutil.rmtree(vdir)
    data_dir = os.path.join(vdir, "data")

    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(data_dir)

    dirs = [os.path.join(f"v={version}", "data")]
    rows = _count_parquet_rows(data_dir)
    pinned: list[dict] = []
    if mode == "append" and prev is not None:
        prev_m = _manifest(path, prev)
        dirs = prev_m["data_dirs"] + dirs
        pinned = list(prev_m.get("pinned") or [])  # carry retention survivors
        rows += prev_m["rows"]

    manifest = {
        "version": version,
        "mode": mode,
        "rows": rows,
        "data_dirs": dirs,
        "pinned": pinned,
        "partition_by": partition_by or [],
        "committed_at": time.time(),
        "meta": meta or {},
    }
    with open(os.path.join(vdir, _MANIFEST), "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)

    if audit is not None:
        import shutil

        # read the staged snapshot through the manifest (pointer not yet
        # flipped, so readers still see the previous version)
        staged = read_versioned(df.sparkSession, path, version)
        violations = list(audit(staged))
        if violations:
            shutil.rmtree(vdir, ignore_errors=True)
            raise AuditFailed(violations)

    # atomic pointer flip = the commit point
    tmp = os.path.join(path, f"{_LATEST}.tmp.{version}")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(path, _LATEST))
    return version


def read_versioned(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read a snapshot (default: latest committed). Plain data roots are read
    with normal partition discovery; ``pinned`` partition-subdir entries
    (written by ``drop_partitions``) reconstruct their partition column from
    the manifest's recorded value + dtype."""
    from functools import reduce

    from pyspark.sql import functions as F

    v = _latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed snapshot at {path}")
    m = _manifest(path, v)
    frames = []
    # mergeSchema: additive schema evolution — an append commit may carry
    # columns older snapshots lack; without the merged footer schema the
    # read silently DROPS the new columns (first footer wins). Old rows
    # surface null for added columns, the standard lakehouse semantic.
    # One read PER data root (not one multi-root read): with partitioned
    # tables, multi-root partition discovery anchors at the roots' common
    # ancestor and trips over the v=N/data segments
    # (CONFLICTING_DIRECTORY_STRUCTURES); per-root reads discover each
    # root's own partition columns and the union re-aligns by name.
    for d in m["data_dirs"]:
        frames.append(
            spark.read.option("mergeSchema", "true").parquet(os.path.join(path, d))
        )
    for e in m.get("pinned") or []:
        frames.append(
            spark.read.parquet(os.path.join(path, e["dir"])).withColumn(
                e["col"], F.lit(e["value"]).cast(e["dtype"])
            )
        )
    if not frames:
        raise FileNotFoundError(f"snapshot v={v} at {path} references no data")
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)


def history(path: str) -> list[dict]:
    """Commit log, oldest first (version/mode/rows/committed_at/meta)."""
    out = []
    latest = _latest_version(path)
    if latest is None:
        return out
    for v in range(latest + 1):
        try:
            m = _manifest(path, v)
        except OSError:
            continue  # vacuumed
        row = {k: m[k] for k in ("version", "mode", "rows", "committed_at")}
        row["meta"] = m.get("meta", {})
        out.append(row)
    return out


def batch_watermark(path: str) -> int | None:
    """Highest applied streaming batch id recorded in ANY retained commit's
    meta (``max_batch_id`` preferred, per-commit ``batch_id`` fallback),
    scanning newest→oldest. This is the source of truth the exactly-once
    layer (`streaming/incremental.py`) checks replays against; scanning ALL
    retained manifests — not just the latest — is what makes the mark
    survive any interleaving of maintenance commits (a retention commit
    landing after the last rollup commit must not hide the mark from a
    subsequent ``compact`` + ``vacuum``).

    A commit whose meta carries ``watermark_reset`` stops the scan: ids at
    or before the reset point are forgotten, which is how a table is
    re-pointed at a FRESH checkpoint (whose epoch ids restart at 0) without
    every new batch being mistaken for a replay (see
    :func:`reset_batch_watermark`)."""
    latest = _latest_version(path)
    if latest is None:
        return None
    hw: int | None = None
    for v in range(latest, -1, -1):
        try:
            m = _manifest(path, v)
        except OSError:
            continue  # vacuumed
        meta = m.get("meta") or {}
        if meta.get("watermark_reset"):
            break
        for k in ("max_batch_id", "batch_id"):
            val = meta.get(k)
            if val is not None and (hw is None or val > hw):
                hw = val
    return hw


def reset_batch_watermark(path: str) -> None:
    """Forget the applied-batch high-water mark: marks the LATEST manifest
    so :func:`batch_watermark` stops scanning at it. Use when deliberately
    re-pointing a table at a fresh streaming checkpoint (epoch ids restart
    at 0) — without the reset, every batch below the stale mark would be
    silently treated as a replay and skipped, losing data. Metadata-only:
    snapshot content and readers are unaffected."""
    latest = _latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"no committed snapshot at {path}")
    vdir = os.path.join(path, f"v={latest}")
    m = _manifest(path, latest)
    m.setdefault("meta", {})["watermark_reset"] = True
    tmp = os.path.join(vdir, f"{_MANIFEST}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(m, fh)
    os.replace(tmp, os.path.join(vdir, _MANIFEST))


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop snapshot manifests older than the last ``keep_last``, then any
    data directory no retained manifest references. Returns removed versions."""
    import shutil

    latest = _latest_version(path)
    if latest is None:
        return []
    retained = set(range(max(0, latest - keep_last + 1), latest + 1))
    referenced: set[str] = set()
    for v in retained:
        try:
            m = _manifest(path, v)
        except OSError:
            continue
        referenced.update(m["data_dirs"])
        referenced.update(e["dir"] for e in m.get("pinned") or [])
    removed = []
    for v in range(latest + 1):
        if v in retained:
            continue
        vdir = os.path.join(path, f"v={v}")
        if not os.path.isdir(vdir):
            continue
        man = os.path.join(vdir, _MANIFEST)
        if os.path.exists(man):
            os.remove(man)
        droot = os.path.join(f"v={v}", "data")
        data = os.path.join(vdir, "data")
        if droot not in referenced and os.path.isdir(data):
            pinned_children = {
                r[len(droot) + 1 :].split("/", 1)[0]
                for r in referenced
                if r.startswith(droot + "/")
            }
            if pinned_children:
                # a retention commit still references some partition subdirs:
                # reclaim only the dropped ones
                for sub in os.listdir(data):
                    if sub not in pinned_children:
                        target = os.path.join(data, sub)
                        if os.path.isdir(target):
                            shutil.rmtree(target)
                        else:
                            os.remove(target)
            else:
                shutil.rmtree(data)
        if not os.listdir(vdir):
            os.rmdir(vdir)
        removed.append(v)
    return removed


def diff_versions(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    keys: list[str],
) -> DataFrame:
    """Change data feed between two snapshots: per-key 'insert' / 'delete' /
    'update' rows (the Delta CDF analog, computed rather than stored).

    Unchanged rows are dropped by a row-hash comparison, so the feed's size
    tracks the real change volume, not the table size. Cost: one full outer
    join on the key columns — shuffle both snapshots once; with the table
    partitioned/bucketed on ``keys`` (io.py layout) this is a co-located
    join. Row hash = xxhash64 over the non-key columns in a fixed column
    order, computed JVM-side.
    """
    from pyspark.sql import functions as F

    old = read_versioned(spark, path, v_from)
    new = read_versioned(spark, path, v_to)
    val_cols = sorted(c for c in old.columns if c not in keys)
    if sorted(c for c in new.columns if c not in keys) != val_cols:
        raise ValueError("snapshot schemas differ; diff requires matching columns")
    # key-only tables can never 'update'; hash a constant so the join still
    # classifies inserts/deletes
    h = F.xxhash64(*val_cols) if val_cols else F.lit(0)
    o = old.select(*keys, h.alias("__h_old"))
    n = new.select(*keys, h.alias("__h_new"))
    joined = o.join(n, keys, "full_outer")
    return (
        joined.withColumn(
            "change_type",
            F.when(F.col("__h_old").isNull(), F.lit("insert"))
            .when(F.col("__h_new").isNull(), F.lit("delete"))
            .when(F.col("__h_old") != F.col("__h_new"), F.lit("update")),
        )
        .filter(F.col("change_type").isNotNull())
        .select("change_type", *keys)
    )


def compact(spark: SparkSession, path: str, num_files: int | None = None) -> int:
    """Rewrite the CURRENT snapshot as a fresh overwrite commit with a
    controlled file count — the small-file maintenance op for tables grown
    by many append-by-reference commits (each append adds a directory; read
    fan-out grows with commit count until compaction folds them back to
    one). History is preserved: prior versions stay readable until
    ``vacuum`` drops them, and the compaction commit records its source
    version in ``meta``. Returns the new version number.
    """
    latest = _latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"no committed snapshot at {path}")
    cur = read_versioned(spark, path, latest)
    if num_files is not None:
        cur = cur.coalesce(num_files)
    meta: dict = {"compaction_of": latest}
    # carry the streaming exactly-once high-water mark through maintenance:
    # after vacuum drops pre-compaction commits, this commit's meta is the
    # only survivor recording which batch ids were applied. Derived from ALL
    # retained manifests, not just the latest — the latest commit may be a
    # retention commit whose meta never carried the mark, and taking only
    # its meta would drop the mark and double-count a replayed batch after
    # compact+vacuum.
    hw = batch_watermark(path)
    if hw is not None:
        meta["max_batch_id"] = hw
    return write_versioned(cur, path, meta=meta)


def drop_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keep,
) -> int:
    """Retention commit: the next snapshot REFERENCES only the surviving
    partition directories of the current one — S13 retention at scale means
    dropping whole partitions, never row-scanning, and here it also never
    rewrites: dropping 90 of 100 TB costs one manifest write.

    ``keep`` is a predicate over the partition's string value (as written in
    the ``col=value`` directory name). The surviving entries are pinned in
    the manifest with their partition value + dtype so readers reconstruct
    the partition column exactly (reading a ``day=5`` subdir directly loses
    the column otherwise). Requires the table to have been written with
    ``partition_by=[partition_col]``. Returns the new version.
    """
    latest = _latest_version(path)
    if latest is None:
        raise FileNotFoundError(f"no committed snapshot at {path}")
    m = _manifest(path, latest)
    if partition_col not in m.get("partition_by", []) and not m.get("pinned"):
        raise ValueError(
            f"table is not partitioned by {partition_col!r} (partition_by="
            f"{m.get('partition_by')})"
        )
    dtype = dict(read_versioned(spark, path, latest).dtypes)[partition_col]

    pinned: list[dict] = []
    rows = 0
    candidates = list(m.get("pinned") or [])
    for d in m["data_dirs"]:
        full = os.path.join(path, d)
        for sub in sorted(os.listdir(full)):
            if sub.startswith(f"{partition_col}="):
                candidates.append(
                    {"dir": f"{d}/{sub}", "col": partition_col,
                     "value": sub.split("=", 1)[1], "dtype": dtype}
                )
    for entry in candidates:
        if keep(entry["value"]):
            pinned.append(entry)
            rows += _count_parquet_rows(os.path.join(path, entry["dir"]))

    version = latest + 1
    vdir = os.path.join(path, f"v={version}")
    os.makedirs(vdir, exist_ok=True)
    # propagate the exactly-once high-water mark so a retention commit being
    # the latest when compact/vacuum run cannot lose it
    ret_meta: dict = {"retained_partitions": len(pinned)}
    hw = batch_watermark(path)
    if hw is not None:
        ret_meta["max_batch_id"] = hw
    manifest = {
        "version": version,
        "mode": "retention",
        "rows": rows,
        "data_dirs": [],
        "pinned": pinned,
        "partition_by": m.get("partition_by", []),
        "committed_at": time.time(),
        "meta": ret_meta,
    }
    with open(os.path.join(vdir, _MANIFEST), "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
    tmp = os.path.join(path, f"{_LATEST}.tmp.{version}")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(path, _LATEST))
    return version
