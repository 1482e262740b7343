#!/usr/bin/env python3
"""Determinism sweep (dev tool): compare two Verify output dirs produced
with different parallelism (SPARK_GRAFT_CPUS=4 vs 8) — every query's
result rows must be identical, proving no query's output depends on
partitioning (the cluster-scale property: task count changes must never
change answers).

Usage:
  SPARK_GRAFT_CPUS=4 sbt "runMain graft.Verify <sfDir> /tmp/det_c4"
  SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify <sfDir> /tmp/det_c8"
  python3 scripts/determinism.py /tmp/det_c4 /tmp/det_c8 [OUT.json]

With a third arg, writes a per-query artifact:
  {query: {"hash_a": ..., "hash_b": ..., "equal": bool}}
where each hash is a sha256 over the column-name-sorted,
row-sorted result content (the driver-compare canonical form).
"""
import sys, glob, os
import duckdb

def content_hash(df):
    import hashlib
    cols = sorted(df.columns)
    d = df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    return hashlib.sha256(d.to_csv(index=False).encode()).hexdigest()

def main(a_dir, b_dir, out_json=None):
    report = {}
    con = duckdb.connect()
    names = sorted(os.path.basename(p) for p in glob.glob(f"{a_dir}/q*"))
    n_pass = n_fail = 0
    for name in names:
        fa = glob.glob(f"{a_dir}/{name}/*.parquet")
        fb = glob.glob(f"{b_dir}/{name}/*.parquet")
        if not fa or not fb:
            print(f"FAIL {name}: missing parquet ({len(fa)}/{len(fb)})")
            report[name] = {"hash_a": None, "hash_b": None, "equal": False}
            n_fail += 1
            continue
        # dumped row order may legitimately differ where a query's trailing
        # ORDER BY has ties; compare as sorted-multiset over all columns
        da = con.execute(f"SELECT * FROM read_parquet({fa!r})").df()
        db = con.execute(f"SELECT * FROM read_parquet({fb!r})").df()
        cols = sorted(da.columns)
        da = da[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        db = db[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
        eq = da.equals(db)
        report[name] = {"hash_a": content_hash(da), "hash_b": content_hash(db),
                        "equal": bool(eq)}
        if eq:
            n_pass += 1
        else:
            print(f"FAIL {name}: content differs across parallelism")
            n_fail += 1
    if out_json:
        import json
        with open(out_json, "w") as f:
            json.dump({"n_identical": n_pass, "n_differ": n_fail,
                       "queries": report}, f, indent=1, sort_keys=True)
        print(f"wrote {out_json}")
    print(f"== determinism: {n_pass} identical / {n_fail} differ ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
