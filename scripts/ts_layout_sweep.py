#!/usr/bin/env python3
"""Timestamp-layout sweep: run the WHOLE SparkEntry query surface against
an NTZ and a TZ copy of the sf0.001 testdata and diff the outputs.

Round 7 lost three queries when the driver testdata's parquet `ts`
columns shifted from zoned to untagged `timestamp[us]` (Spark 4 reads
the latter as TIMESTAMP_NTZ, which `unix_micros` rejects) — an
environment change invisible to unit specs that build their own typed
frames. This sweep catches that class BEFORE the driver runs: both
layouts must produce the same per-query row counts and values (the
session zone is pinned UTC, so the layouts are value-identical by
construction; timestamp columns are compared as wall-clock strings).

Usage: ts_layout_sweep.py [sfDir] [workDir]
Exit 0 = every query ran on both layouts and matched.
"""
import sys, json, glob, os, shutil, subprocess
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
WORK = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ts_layout_sweep"


def make_copy(mode: str) -> str:
    """Copy of SFDIR with every timestamp column cast to the mode's
    layout: 'ntz' -> timestamp[us], 'tz' -> timestamp[us, tz=UTC]
    (naive values are interpreted as UTC — the pinned session zone)."""
    out = f"{WORK}/{mode}"
    os.makedirs(out, exist_ok=True)
    for p in sorted(glob.glob(f"{SFDIR}/*.parquet")):
        dst = f"{out}/{os.path.basename(p)}"
        t = pq.read_table(p)
        fields = []
        for f in t.schema:
            if pa.types.is_timestamp(f.type):
                ty = pa.timestamp("us", tz="UTC") if mode == "tz" \
                    else pa.timestamp("us")
                fields.append(pa.field(f.name, ty))
            else:
                fields.append(f)
        pq.write_table(t.cast(pa.schema(fields)), dst)
    return out


def run_verify(sfdir: str, outdir: str) -> None:
    shutil.rmtree(outdir, ignore_errors=True)
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sfdir} {outdir}"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def norm(v) -> str:
    """Wall-clock string form: a tz-aware and a naive rendering of the
    same UTC instant must compare equal."""
    s = str(v)
    return s.replace("+00:00", "").replace(" UTC", "")


def main() -> int:
    dirs = {m: make_copy(m) for m in ("ntz", "tz")}
    outs = {}
    for m, d in dirs.items():
        outs[m] = f"{WORK}/out_{m}"
        print(f"verify[{m}] over {d} ...", flush=True)
        run_verify(d, outs[m])

    oracle = json.load(open(f"{outs['ntz']}/oracle_sql.json"))
    con = duckdb.connect()
    n_bad = 0
    for name in sorted(oracle):
        sides = {}
        for m in ("ntz", "tz"):
            files = glob.glob(f"{outs[m]}/{name}/*.parquet")
            if not files:
                print(f"MISSING [{m}] {name}")
                sides = None
                break
            df = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            df = df.reindex(sorted(df.columns), axis=1)
            df = df.sort_values(list(df.columns)).reset_index(drop=True)
            sides[m] = df
        if sides is None:
            n_bad += 1
            continue
        a, b = sides["ntz"], sides["tz"]
        if list(a.columns) != list(b.columns):
            print(f"COLS   {name}: ntz={list(a.columns)} tz={list(b.columns)}")
            n_bad += 1
        elif len(a) != len(b):
            print(f"ROWS   {name}: ntz={len(a)} tz={len(b)}")
            n_bad += 1
        else:
            diff_col = next(
                (c for c in a.columns
                 if [norm(x) for x in a[c]] != [norm(x) for x in b[c]]),
                None)
            if diff_col is not None:
                print(f"VALUES {name}: col {diff_col} diverges between layouts")
                n_bad += 1
            else:
                print(f"OK     {name} ({len(a)} rows)")
    print(f"\n{len(oracle)} queries, {n_bad} layout divergences")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
