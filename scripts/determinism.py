#!/usr/bin/env python3
"""Determinism sweep (dev tool): compare two Verify output dirs produced
with different parallelism (SPARK_GRAFT_CPUS=4 vs 8) — every query's
result rows must be identical, proving no query's output depends on
partitioning (the cluster-scale property: task count changes must never
change answers).

Usage:
  SPARK_GRAFT_CPUS=4 sbt "runMain graft.Verify <sfDir> /tmp/det_c4"
  SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify <sfDir> /tmp/det_c8"
  python3 scripts/determinism.py /tmp/det_c4 /tmp/det_c8
"""
import sys, glob, os
import duckdb

def main(a_dir, b_dir):
    con = duckdb.connect()
    names = sorted(os.path.basename(p) for p in glob.glob(f"{a_dir}/q*"))
    n_pass = n_fail = 0
    for name in names:
        fa = glob.glob(f"{a_dir}/{name}/*.parquet")
        fb = glob.glob(f"{b_dir}/{name}/*.parquet")
        if not fa or not fb:
            print(f"FAIL {name}: missing parquet ({len(fa)}/{len(fb)})")
            n_fail += 1
            continue
        # dumped row order may legitimately differ where a query's trailing
        # ORDER BY has ties; compare as sorted-multiset over all columns
        da = con.execute(f"SELECT * FROM read_parquet({fa!r})").df()
        db = con.execute(f"SELECT * FROM read_parquet({fb!r})").df()
        cols = sorted(da.columns)
        da = da[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        db = db[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        if da.equals(db):
            n_pass += 1
        else:
            print(f"FAIL {name}: content differs across parallelism")
            n_fail += 1
    print(f"== determinism: {n_pass} identical / {n_fail} differ ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
