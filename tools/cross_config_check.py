#!/usr/bin/env python3
"""Cross-config determinism probe (SURVEY §5 / verify-skill recipe):
byte-compares every query's Verify output between two runs (e.g. the
4-cpu driver config vs local[32]). Any diff = partition-order
nondeterminism that the DuckDB oracle compare could miss whenever both
engines happen to round the same way.

Usage: python3 tools/cross_config_check.py <outDirA> <outDirB>
"""
import sys, os
import duckdb

def main():
    a, b = sys.argv[1], sys.argv[2]
    keys = sorted(d for d in os.listdir(a)
                  if os.path.isdir(os.path.join(a, d)))
    keys_b = {d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d))}
    con = duckdb.connect()
    bad, missing = [], sorted(set(keys) ^ keys_b)
    for k in keys:
        if k not in keys_b:
            continue
        ra = con.sql(f"SELECT * FROM read_parquet('{a}/{k}/*.parquet')").fetchall()
        rb = con.sql(f"SELECT * FROM read_parquet('{b}/{k}/*.parquet')").fetchall()
        if ra != rb:
            bad.append(k)
            print(f"DIFF {k}: {len(ra)} vs {len(rb)} rows")
    print(f"{len(keys) - len(bad)} identical, {len(bad)} diff, "
          f"{len(missing)} present in only one run {missing[:5]}")
    sys.exit(1 if (bad or missing) else 0)

if __name__ == "__main__":
    main()
