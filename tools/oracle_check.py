#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (SURVEY.md §5.1).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [keys...]

Loads each <verifyOutDir>/<name> parquet (our Verify.scala output), runs the
matching SQL from oracle_sql.json in DuckDB against views named after the
testdata tables, and compares: row count, column names, dtypes, and values
(columns sorted by name, rows in file order). Exits nonzero on any mismatch.
"""
import glob, hashlib, json, math, sys
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


# ---- strict representation hash (VERDICT r6 item 5) ------------------
# The value compare above reads OUR parquet through DuckDB, which
# normalizes physical representation (decimal scale/width, timestamp
# unit) into DuckDB's type system — exactly the layer where the driver's
# hash diverged on q_agg_decimal for three rounds while values matched.
# The strict pass re-reads our parquet through PYARROW (a different
# reader, like the driver's), normalizes dtypes textually, and compares
# a sha256 over every cell's canonical string INCLUDING decimal scale.

def _strict_cell(v):
    import datetime, decimal
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return "DEC:" + str(v)  # str keeps scale: 5.00 != 5.000
    if isinstance(v, (datetime.datetime,)):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_strict_cell(x) for x in v) + "]"
    if isinstance(v, dict):  # pyarrow struct → dict
        return "{" + ",".join(f"{k}:{_strict_cell(v[k])}" for k in sorted(v)) + "}"
    return repr(v)


def _norm_pa_type(t):
    import pyarrow as pa
    if pa.types.is_decimal(t):
        return f"DECIMAL({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _norm_pa_type(t.value_type) + "[]"
    if pa.types.is_struct(t):
        return "STRUCT(" + ",".join(
            f"{f.name} {_norm_pa_type(f.type)}" for f in t) + ")"
    if pa.types.is_timestamp(t):
        return "TIMESTAMP"
    m = {"int64": "BIGINT", "int32": "INTEGER", "int16": "SMALLINT",
         "int8": "TINYINT", "double": "DOUBLE", "float": "FLOAT",
         "string": "VARCHAR", "large_string": "VARCHAR", "bool": "BOOLEAN",
         "date32[day]": "DATE", "binary": "BLOB", "large_binary": "BLOB"}
    return m.get(str(t), str(t).upper())


def _norm_duck_type(s):
    s = s.replace(" ", "")
    return "TIMESTAMP" if s.startswith("TIMESTAMP") else s


def _strict_hash(cols, types, rows_cells):
    order = sorted(range(len(cols)), key=lambda j: cols[j])
    h = hashlib.sha256()
    h.update("|".join(f"{cols[j]}:{types[j]}" for j in order).encode())
    for row in rows_cells:
        for j in order:
            h.update(row[j].encode())
            h.update(b"\x00")
    return h.hexdigest()


def strict_check(out_dir, name, ref_cols, ref_types, ref_rows):
    """Returns None if the pyarrow-read spark output strict-hashes equal
    to the DuckDB oracle result, else a message naming the divergence."""
    import pyarrow.parquet as pq
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    tbl = pq.read_table(files)
    o_cols = tbl.column_names
    o_types = [_norm_pa_type(f.type) for f in tbl.schema]
    r_types = [_norm_duck_type(t) for t in ref_types]
    od, rd = dict(zip(o_cols, o_types)), dict(zip(ref_cols, r_types))
    dt = {c: (od[c], rd.get(c)) for c in od if od[c] != rd.get(c)}
    if dt:
        return f"strict dtype mismatch (pyarrow vs duckdb): {dt}"
    o_rows = [[_strict_cell(r[c]) for c in o_cols] for r in tbl.to_pylist()]
    r_strict = [[_strict_cell(v) for v in row] for row in ref_rows]
    oh = _strict_hash(o_cols, o_types, o_rows)
    rh = _strict_hash(ref_cols, r_types, r_strict)
    if oh != rh:
        o_ix = sorted(range(len(o_cols)), key=lambda j: o_cols[j])
        r_ix = sorted(range(len(ref_cols)), key=lambda j: ref_cols[j])
        for i, (orow, rrow) in enumerate(zip(o_rows, r_strict)):
            o = [orow[j] for j in o_ix]
            r = [rrow[j] for j in r_ix]
            if o != r:
                return f"strict hash {oh[:12]}!={rh[:12]}; first diff row {i}: ours={o} ref={r}"
        return f"strict hash {oh[:12]}!={rh[:12]} (schema-level repr)"
    return None


def selftest():
    """Proves the decimal-representation canary bites (VERDICT r6 item 5):
    builds a fixture whose parquet column is DECIMAL(12,3) while the
    oracle emits DECIMAL(12,2) — numerically equal values, different
    representation — and asserts the check FAILS it and PASSES the
    matched-scale control. Exit 0 iff both behave as expected."""
    import os, tempfile
    con = duckdb.connect()
    with tempfile.TemporaryDirectory() as tmp:
        for name, scale in (("fix_bad", 3), ("fix_ok", 2)):
            os.makedirs(f"{tmp}/out/{name}")
            con.execute(
                f"COPY (SELECT CAST(1.50 AS DECIMAL(12,{scale})) AS v) TO "
                f"'{tmp}/out/{name}/part-0.parquet' (FORMAT PARQUET)")
        with open(f"{tmp}/out/oracle_sql.json", "w") as f:
            json.dump({n: "SELECT CAST(1.50 AS DECIMAL(12,2)) AS v"
                       for n in ("fix_bad", "fix_ok")}, f)
        os.makedirs(f"{tmp}/sf")
        for t in TABLES:
            con.execute(f"COPY (SELECT 1 AS dummy) TO "
                        f"'{tmp}/sf/{t}.parquet' (FORMAT PARQUET)")
        import subprocess
        r = subprocess.run(
            [sys.executable, __file__, f"{tmp}/sf", f"{tmp}/out"],
            capture_output=True, text=True)
        out = r.stdout + r.stderr
        bad_caught = "FAIL fix_bad" in out
        ok_passed = "PASS fix_ok" in out
        print(out)
        print(f"selftest: scale-mismatch caught={bad_caught}, "
              f"control passed={ok_passed}")
        sys.exit(0 if bad_caught and ok_passed else 1)


def main():
    if sys.argv[1:2] == ["--selftest"]:
        selftest()
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
        # value compare passed — run the strict representation hash so a
        # divergence the DuckDB read normalizes away fails HERE, before
        # the driver sees it (the q_agg_decimal r4-r6 lesson).
        try:
            strict = strict_check(out_dir, name, ref_cols, ref_types, ref_df)
        except Exception as e:
            strict = f"STRICT EXEC ERROR: {e}"
        if strict:
            failures.append((name, strict))
            continue
        passed += 1
        print(f"PASS {name} ({len(ours_df)} rows)")
    for name, msg in failures:
        print(f"FAIL {name}: {msg}")
    print(f"\n{passed} passed, {len(failures)} failed")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
