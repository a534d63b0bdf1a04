#!/usr/bin/env python3
"""Audit oracle SQL for HUGEINT-typed output columns.

DuckDB's sum() over BIGINT returns HUGEINT; the driver's pandas
canonicalizer renders HUGEINT as float64 while Spark emits int64 —
a guaranteed hash mismatch even when every value agrees. Any oracle
whose result schema contains HUGEINT (or UHUGEINT) is a latent red
row: wrap the offending aggregate in CAST(... AS BIGINT).

Usage: dev/audit_hugeint.py <sfDir> <verifyOutDir-with-oracle_sql.json>
(exit 1 if any flagged).
"""
import sys, os, json
import duckdb

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    flagged = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            bad = [(c, str(ty)) for c, ty in zip(rel.columns, rel.types)
                   if "HUGEINT" in str(ty).upper()]
        except Exception as e:
            print(f"ERR  {name}: {e}"); flagged += 1; continue
        if bad:
            print(f"FLAG {name}: {bad}"); flagged += 1
    print(f"== {flagged} flagged of {len(oracle)} ==")
    sys.exit(1 if flagged else 0)

if __name__ == "__main__":
    main()
