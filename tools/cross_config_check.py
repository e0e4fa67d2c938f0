#!/usr/bin/env python3
"""Cross-config determinism probe (SURVEY §5 / verify-skill recipe):
byte-compares every query's Verify output between two runs (e.g. the
4-cpu driver config vs local[32]). Any diff = partition-order
nondeterminism that the DuckDB oracle compare could miss whenever both
engines happen to round the same way.

Row order matters by default because Verify writes coalesce(1) single
parquet parts and the driver's hash is order-sensitive; for multi-part
outputs (whose part-file glob order is not meaningful) pass
--sorted to compare order-insensitively (ADVICE r6).

Usage: python3 tools/cross_config_check.py [--sorted] <outDirA> <outDirB>
"""
import sys, os
import duckdb


def _key(row):
    return tuple(repr(v) for v in row)


def main():
    args = [x for x in sys.argv[1:] if x != "--sorted"]
    order_insensitive = "--sorted" in sys.argv[1:]
    a, b = args[0], args[1]
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
        if order_insensitive:
            ra, rb = sorted(ra, key=_key), sorted(rb, key=_key)
        if ra != rb:
            bad.append(k)
            # print the first differing row, not just counts — equal
            # counts with different contents were indistinguishable
            # before (ADVICE r6)
            first = next(((i, x, y) for i, (x, y)
                          in enumerate(zip(ra, rb)) if x != y), None)
            if first is None:
                print(f"DIFF {k}: {len(ra)} vs {len(rb)} rows "
                      f"(length mismatch)")
            else:
                i, x, y = first
                print(f"DIFF {k}: {len(ra)} vs {len(rb)} rows; "
                      f"first differing row {i}:\n  A={x}\n  B={y}")
    print(f"{len(keys) - len(bad)} identical, {len(bad)} diff, "
          f"{len(missing)} present in only one run {missing[:5]}")
    sys.exit(1 if (bad or missing) else 0)

if __name__ == "__main__":
    main()
