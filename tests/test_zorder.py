"""Z-order layout (io.py: zorder_column/write_zordered): the Morton key must
cluster files into hyper-rectangles tight in EVERY dimension, measured from
real parquet footer min/max statistics — the same stats Spark's scan uses for
row-group skipping."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from emdatapipelines_spark.io import write_zordered, zorder_column


def _file_bounds(path: str, cols: list[str]) -> list[dict]:
    out = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(idx[c]).statistics
                lo[c] = st.min if lo[c] is None else min(lo[c], st.min)
                hi[c] = st.max if hi[c] is None else max(hi[c], st.max)
        out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def _files_overlapping(bounds: list[dict], box: dict) -> int:
    n = 0
    for b in bounds:
        if all(b[c][0] <= box[c][1] and b[c][1] >= box[c][0] for c in box):
            n += 1
    return n


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    # x and y are independent: a single-column sort can only tighten one
    df = spark.range(0, 65536).selectExpr(
        "CAST(id % 256 AS LONG) AS x", "CAST(id DIV 256 AS LONG) AS y"
    )
    zpath = str(tmp_path / "zordered")
    xpath = str(tmp_path / "xsorted")
    write_zordered(df, zpath, ["x", "y"], num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    zb = _file_bounds(zpath, ["x", "y"])
    xb = _file_bounds(xpath, ["x", "y"])
    assert len(zb) == 16 and len(xb) == 16

    # small box in both dimensions: Z stays local; never worse than x-sort
    box = {"x": (0, 31), "y": (0, 31)}
    z_hit = _files_overlapping(zb, box)
    x_hit = _files_overlapping(xb, box)
    assert z_hit <= x_hit
    assert z_hit <= 4     # 16 files over a 2-dim grid: a 1/8 x 1/8 box is local

    # the discriminator: a filter on y ONLY. The x-sorted layout cannot prune
    # it at all (every file spans all of y); Z-order must. This cannot be
    # rescued by lucky range boundaries, unlike the 2-dim box above
    # (repartitionByRange samples its boundaries, so exact per-file splits
    # wobble between runs).
    ybox = {"x": (0, 255), "y": (0, 31)}
    assert _files_overlapping(xb, ybox) == 16
    assert _files_overlapping(zb, ybox) <= 8

    # correctness: the layout is a permutation, nothing lost
    assert spark.read.parquet(zpath).count() == 65536
    got = spark.read.parquet(zpath).filter("x < 32 AND y < 32").count()
    want = df.filter("x < 32 AND y < 32").count()
    assert got == want


def test_zorder_key_is_codegen_expression(spark):
    df = spark.range(0, 100).selectExpr("id AS x", "id * 3 AS y")
    z = zorder_column(df, ["x", "y"], bounds={"x": (0, 99), "y": (0, 297)})
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # deterministic: same inputs → same keys
    a = [r["__z"] for r in z.collect()]
    b = [r["__z"] for r in z.collect()]
    assert a == b


def test_zorder_locality_beats_row_order(spark):
    """Adjacent Z-keys must be close in both dims: the average per-file
    bounding-box area under Z-layout is far below the unsorted layout's."""
    import random

    rows = [(random.Random(7 * i).randrange(1024), random.Random(11 * i + 3).randrange(1024))
            for i in range(20000)]
    df = spark.createDataFrame(rows, "x LONG, y LONG")
    z = zorder_column(df, ["x", "y"], bounds={"x": (0, 1023), "y": (0, 1023)})
    sample = z.orderBy("__z").limit(2000).collect()
    # walk consecutive pairs: mean manhattan distance must reflect locality
    dists = [
        abs(a["x"] - b["x"]) + abs(a["y"] - b["y"])
        for a, b in zip(sample, sample[1:])
    ]
    mean_z = sum(dists) / len(dists)
    assert mean_z < 100  # random order would average ~683 (2/3 * 1024)
