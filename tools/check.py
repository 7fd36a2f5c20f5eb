#!/usr/bin/env python3
"""Dev harness mirroring the driver's t2 correctness gate: run graft.Verify
at a given SF, then execute each oracle SQL in DuckDB over the same parquet
tables and compare (schema column set, row count, sorted-value hash).

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify] [only_query ...]
"""
import sys, os, json, subprocess, glob

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
rest = sys.argv[3:]
SKIP = "--skip-verify" in rest
ONLY = [a for a in rest if not a.startswith("--")]

if not SKIP:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)

con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # a table may be a single driver-written file or a Spark-written
    # DIRECTORY of part files (e.g. ScaleData's sf1 output)
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to ns for cross-engine compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

fails = 0
names = ONLY or sorted(oracle)
for name in names:
    sql = oracle[name]
    spark_dir = f"{OUT}/{name}"
    try:
        got = canon(pd.read_parquet(spark_dir))
        want = canon(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows spark={len(got)} oracle={len(want)}")
        fails += 1; continue
    # Dtype-family check BEFORE any coercion: the driver's gate hashes
    # dtype-sensitively, so an int64-vs-float64 drift (e.g. DuckDB HUGEINT
    # from sum(BIGINT) surfacing as float64) must FAIL here too, not be
    # masked by astype coercion (that masking shipped the x_spj red row).
    def family(dt):
        k = dt.kind  # i/u -> int, f -> float, b -> bool, M -> datetime, O/other -> obj
        return {"i": "int", "u": "int", "f": "float", "b": "bool",
                "M": "datetime"}.get(k, "obj")
    dtype_bad = [(c, got[c].dtype, want[c].dtype) for c in got.columns
                 if family(got[c].dtype) != family(want[c].dtype)]
    if dtype_bad:
        c, gd, wd = dtype_bad[0]
        print(f"FAIL {name}: dtype col {c}: spark={gd} oracle={wd} "
              f"({len(dtype_bad)} drifting cols)")
        fails += 1; continue
    neq = []
    for c in got.columns:
        a, b = got[c], want[c].astype(got[c].dtype, errors="ignore") if hasattr(want[c], "astype") else want[c]
        try:
            eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
        except Exception:
            eq = a.astype(str).values == b.astype(str).values
        if not eq.all():
            i = (~eq).nonzero()[0][0]
            neq.append((c, i, a.iloc[i], b.iloc[i]))
    if neq:
        c, i, av, bv = neq[0]
        print(f"FAIL {name}: col {c} row {i}: spark={av!r} oracle={bv!r} ({len(neq)} bad cols)")
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")

missing = [d for d in sorted(os.listdir(OUT))
           if os.path.isdir(f"{OUT}/{d}") and d not in oracle]
if missing:
    print("rows-only (no oracle):", ", ".join(missing))
sys.exit(1 if fails else 0)
