#!/usr/bin/env python3
"""Report dtype divergences between each oracleSql result (DuckDB) and the
parquet the Verify main wrote. The driver's hash normalizes integer widths
today, but one canonicalization change would redden every int32-vs-int64
row — sweep them to zero instead. Usage: dtype_sweep.py <sfDir> <outDir>."""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
n_div = 0
n_err = 0  # missing outputs / broken oracle SQL redden the sweep too
for name, sql in sorted(oracle.items()):
    got_files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not got_files:
        print(f"MISSING OUTPUT  {name}")
        n_err += 1
        continue
    try:
        exp = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").fetchdf()
    except Exception as e:
        print(f"ORACLE ERROR    {name}: {e}")
        n_err += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet({got_files!r}) LIMIT 0").fetchdf()
    # a column present on only one side is itself a divergence (rename /
    # drop drift) — the intersection alone would silently ignore it
    for c in sorted(set(exp.columns) ^ set(got.columns)):
        side = "oracle" if c in exp.columns else "spark"
        print(f"COLUMN {name}.{c}: only on {side} side")
        n_div += 1
    for c in sorted(set(exp.columns) & set(got.columns)):
        a, b = str(exp[c].dtype), str(got[c].dtype)
        # object==object (strings/arrays) fine; identical fine
        if a != b:
            print(f"DTYPE  {name}.{c}: oracle={a} spark={b}")
            n_div += 1
print(f"\n{n_div} divergences, {n_err} errors")
sys.exit(1 if (n_div or n_err) else 0)
