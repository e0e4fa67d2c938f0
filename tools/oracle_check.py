#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (SURVEY.md §5.1).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [keys...]

Loads each <verifyOutDir>/<name> parquet (our Verify.scala output), runs the
matching SQL from oracle_sql.json in DuckDB against views named after the
testdata tables, and compares: row count, column names, dtypes, and values
(columns sorted by name, rows in file order). Exits nonzero on any mismatch.
"""
import json, math, sys
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and represent with enough digits
        if v == 0.0:
            return "0.0"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    unknown = only - set(oracle)
    if unknown:
        print(f"ERROR: no such oracle key(s): {sorted(unknown)}")
        sys.exit(2)
    failures, passed = [], 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            ours = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            ours_df = ours.fetchall()
            ours_cols = ours.columns
            ours_types = [str(t) for t in ours.types]
            ref = con.sql(sql)
            ref_df = ref.fetchall()
            ref_cols = ref.columns
            ref_types = [str(t) for t in ref.types]
        except Exception as e:
            failures.append((name, f"EXEC ERROR: {e}"))
            continue
        if sorted(ours_cols) != sorted(ref_cols):
            failures.append((name, f"columns {sorted(ours_cols)} != {sorted(ref_cols)}"))
            continue
        # compare dtypes per column name
        od = dict(zip(ours_cols, ours_types))
        rd = dict(zip(ref_cols, ref_types))
        dt_mismatch = {c: (od[c], rd[c]) for c in od if od[c] != rd[c]}
        if dt_mismatch:
            failures.append((name, f"dtype mismatch {dt_mismatch}"))
            continue
        if len(ours_df) != len(ref_df):
            failures.append((name, f"rows {len(ours_df)} != {len(ref_df)}"))
            continue
        # columns sorted by name, rows in file order (driver semantics)
        o_ix = [ours_cols.index(c) for c in sorted(ours_cols)]
        r_ix = [ref_cols.index(c) for c in sorted(ref_cols)]
        bad = None
        for i, (orow, rrow) in enumerate(zip(ours_df, ref_df)):
            o = [canon(orow[j]) for j in o_ix]
            r = [canon(rrow[j]) for j in r_ix]
            if o != r:
                bad = (i, o, r)
                break
        if bad:
            failures.append((name, f"row {bad[0]}: ours={bad[1]} ref={bad[2]}"))
            continue
        passed += 1
        print(f"PASS {name} ({len(ours_df)} rows)")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"\n{passed} passed, {len(failures)} failed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
