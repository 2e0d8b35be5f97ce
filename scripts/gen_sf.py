#!/usr/bin/env python
"""Generate a scaled fixture set by key-shifted replication of sf0.1.

The driver ships sf{0.001,0.01,0.1}; the scale arguments in SCALING.md are
plan-level. This script materializes an sf1-equivalent (10x sf0.1: ~6M-row
lineitem) so the suite can be MEASURED at the next decade, converting
"scale-shaped" claims into recorded evidence (VERDICT r4 next-round #2).

Replication design (replica r in 0..9, replica 0 = the original rows):

- Entity keys shift by r*KEY_OFF per replica (custkey, orderkey, suppkey,
  partkey, event_id, user_id, doc_id, vec_id), preserving referential
  integrity, per-key group sizes, and join fan-outs exactly; global
  cardinalities scale linearly, the way a real corpus grows.
- nation/region are dimensions — copied unchanged.
- p_name gets a per-replica 3-letter suffix whose pairwise Levenshtein
  distance is 3 > the fuzzy matcher's max_dist, so j11's within-replica
  near-pairs scale linearly instead of exploding combinatorially across
  identical cross-replica copies.
- documents: a per-replica marker token is interleaved every 4 tokens
  (replica 0 untouched). Within-replica shingle structure (near-dup pairs,
  Jaccard values) is preserved; cross-replica Jaccard collapses (most
  3-shingles contain the marker), so dedup candidate volume scales
  linearly — replicating verbatim would instead create 10-clone clusters
  (45 cross pairs per doc) that distort candidate-join timings by ~45x.
  n_chars is recomputed (the quality suite asserts n_chars==length(text)).
- embeddings: deterministic per-(replica, vector) Gaussian noise (sigma
  0.05) so cross-replica vectors are near but not identical — ANN bucket
  occupancy scales smoothly with no degenerate exact-duplicate spikes.

Usage: python scripts/gen_sf.py [--src /root/testdata/sf0.1]
                                [--out /root/repo/.testdata/sf1] [--rep 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

KEY_OFF = 100_000_000
# pairwise Levenshtein distance 3 (> fuzzy max_dist 2): no cross-replica
# pairs. One distinct letter per replica, so ANY two suffixes differ in all
# 3 positions — extended to 20 entries for sf2 (rep 20) probes.
NAME_SUFFIX = ["", " bbb", " ccc", " ddd", " fff", " ggg", " hhh", " jjj", " kkk", " mmm",
               " nnn", " ppp", " qqq", " rrr", " sss", " ttt", " vvv", " www", " xxx", " zzz"]


def gen_relational(con, src: str, out: str, rep: int) -> None:
    con.execute(f"CREATE OR REPLACE VIEW r AS SELECT range AS rr FROM range({rep})")
    for tbl in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{tbl}.parquet') TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    suffixes = "[" + ", ".join(f"'{s}'" for s in NAME_SUFFIX[:rep]) + "]"
    jobs = {
        "customer": f"""
            SELECT c_custkey + rr*{KEY_OFF} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{src}/customer.parquet', r""",
        "supplier": f"""
            SELECT s_suppkey + rr*{KEY_OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
            FROM '{src}/supplier.parquet', r""",
        "part": f"""
            SELECT p_partkey + rr*{KEY_OFF} AS p_partkey,
                   p_name || ({suffixes})[rr + 1] AS p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM '{src}/part.parquet', r""",
        "orders": f"""
            SELECT o_orderkey + rr*{KEY_OFF} AS o_orderkey,
                   o_custkey + rr*{KEY_OFF} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{src}/orders.parquet', r""",
        "lineitem": f"""
            SELECT l_orderkey + rr*{KEY_OFF} AS l_orderkey,
                   l_partkey + rr*{KEY_OFF} AS l_partkey,
                   l_suppkey + rr*{KEY_OFF} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                   l_returnflag, l_linestatus, l_shipdate
            FROM '{src}/lineitem.parquet', r""",
        "events": f"""
            SELECT event_id + rr*{KEY_OFF} AS event_id, ts,
                   user_id + rr*{KEY_OFF} AS user_id, event_type, value, props
            FROM '{src}/events.parquet', r""",
    }
    for tbl, sql in jobs.items():
        con.execute(
            f"COPY ({sql}) TO '{out}/{tbl}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 200000)"  # splittable scans
        )


def gen_documents(src: str, out: str, rep: int) -> None:
    pdf = pq.read_table(f"{src}/documents.parquet").to_pandas()
    frames = [pdf]
    for r in range(1, rep):
        cp = pdf.copy()
        cp["doc_id"] = cp["doc_id"] + r * KEY_OFF
        marker = f"zq{r}"

        def tag(text: str) -> str:
            toks = text.split(" ")
            outt = []
            for i, tk in enumerate(toks):
                outt.append(tk)
                if i % 4 == 3:
                    outt.append(marker)
            return " ".join(outt)

        cp["text"] = cp["text"].map(tag)
        cp["n_chars"] = cp["text"].str.len().astype("int64")
        frames.append(cp)
    allp = pd.concat(frames, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(allp, preserve_index=False),
        f"{out}/documents.parquet",
        row_group_size=2000,  # multi-row-group => Spark can split the scan
    )


def gen_embeddings(src: str, out: str, rep: int) -> None:
    tbl = pq.read_table(f"{src}/embeddings.parquet")
    pdf = tbl.to_pandas()
    dim = len(pdf["embedding"].iloc[0])
    frames = [pdf]
    for r in range(1, rep):
        cp = pdf.copy()
        cp["vec_id"] = cp["vec_id"] + r * KEY_OFF
        rng = np.random.RandomState(4242 + r)
        noise = rng.normal(0.0, 0.05, size=(len(cp), dim)).astype(np.float32)
        base = np.vstack(cp["embedding"].to_numpy()).astype(np.float32)
        cp["embedding"] = list(base + noise)
        frames.append(cp)
    allp = pd.concat(frames, ignore_index=True)
    allp["embedding"] = allp["embedding"].map(lambda v: np.asarray(v, dtype=np.float32))
    out_tbl = pa.Table.from_pandas(allp, preserve_index=False, schema=tbl.schema)
    pq.write_table(out_tbl, f"{out}/embeddings.parquet", row_group_size=1000)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.testdata/sf1")
    ap.add_argument("--rep", type=int, default=10)
    args = ap.parse_args()
    assert args.rep <= len(NAME_SUFFIX), "add suffixes for rep > 10"
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    gen_relational(con, args.src, args.out, args.rep)
    gen_documents(args.src, args.out, args.rep)
    gen_embeddings(args.src, args.out, args.rep)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        n = duckdb.sql(f"SELECT count(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t:10s} {n:>10,}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
