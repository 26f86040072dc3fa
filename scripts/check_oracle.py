#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracleSql in
DuckDB against the sf parquet tables and compare (rows+values) with the
parquet the Verify main wrote. Usage: check_oracle.py <sfDir> <outDir>."""
import sys, json, glob, os, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    got_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not got_files:
        print(f"MISSING OUTPUT  {name}")
        fail += 1
        continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"ORACLE ERROR    {name}: {e}")
        fail += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet({got_files!r})").fetchdf()
    # driver sorts columns by name before hashing
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"COLS MISMATCH   {name}: oracle={list(exp.columns)} got={list(got.columns)}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"ROWS MISMATCH   {name}: oracle={len(exp)} got={len(got)}")
        fail += 1
        continue
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    bad = None
    for c in exp.columns:
        a, b = exp[c], got[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eqs = [(x == y) or (isinstance(x, float) and isinstance(y, float)
                       and (math.isnan(x) and math.isnan(y) or x == y))
                       for x, y in zip(a, b)]
            else:
                eqs = [str(x) == str(y) for x, y in zip(a, b)]
        except Exception as e:
            bad = (c, f"compare error {e}")
            break
        if not all(eqs):
            i = eqs.index(False)
            bad = (c, f"row {i}: oracle={a[i]!r} got={b[i]!r}")
            break
    if bad:
        print(f"VALUE MISMATCH  {name}: col {bad[0]} {bad[1]}")
        fail += 1
    else:
        print(f"OK              {name} ({len(exp)} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
