#!/usr/bin/env python3
"""Oracle output-type audit (dev tool): DESCRIBE every SparkEntry.oracleSql
entry against DuckDB and fail if any output column's type is outside the
whitelist of types the driver's hasher treats identically to Spark's
parquet output. Round-9 lesson: SUM(BIGINT) in DuckDB promotes to
HUGEINT (INT128) — equal values, different hash → driver hash-fail.

Usage: python3 scripts/oracle_types.py <sfDir> <outDir>
(outDir = a graft.Verify dump containing oracle_sql.json)
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Types Spark can emit 1:1 in its parquet output (signed ints, floats,
# strings, temporal, bool, decimal≤38). Anything DuckDB-only — HUGEINT
# (what SUM(BIGINT) silently promotes to), unsigned ints, INTERVAL —
# can never hash-match a Spark column and must be CAST in the oracle.
# An INTEGER/SMALLINT oracle column is allowed here because Spark can
# emit int32/int16 too; a *mismatched* width is check.py's strict
# dtype compare's job, not this static audit's.
OK_PREFIXES = ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "VARCHAR",
               "DOUBLE", "FLOAT", "DATE", "TIMESTAMP", "BOOLEAN",
               "DECIMAL(")


def type_ok(t):
    t = t.strip()
    if t.endswith("[]"):
        return type_ok(t[:-2])
    if t.startswith("DECIMAL("):
        # precision must fit the driver's decimal(38) ceiling
        try:
            prec = int(t[len("DECIMAL("):].split(",")[0].rstrip(")"))
        except ValueError:
            return False
        return prec <= 38
    return any(t == p or t.startswith(p) for p in OK_PREFIXES
               if not p.endswith("("))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name in sorted(oracles):
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE error: {e}")
            bad += 1
            continue
        for col, typ, *_ in desc:
            if not type_ok(typ):
                print(f"FAIL {name}: column {col} has oracle type {typ} "
                      f"(cast it in the oracle SQL)")
                bad += 1
    print(f"== oracle type audit: {len(oracles)} oracles, {bad} offenders ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
