#!/usr/bin/env python3
"""sf1 hash-parity sweep: like tools/check.py --skip-verify, but each
DuckDB oracle runs in a subprocess with a per-query timeout so the
O(n^2)-by-definition oracles (exact all-pairs at 10x data) time out and
are reported as SKIP(timeout) instead of wedging the sweep.

Usage: python3 tools/check_sf1.py [sfdir] [outdir] [timeout_s]
"""
import sys, os, json, glob, multiprocessing as mp

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_sf1"
TIMEOUT = int(sys.argv[3]) if len(sys.argv) > 3 else 120


def run_oracle(sql, sf, q):
    import duckdb, pandas as pd
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p)[:-8]
        # driver testdata is one file per table; ScaleData output is a
        # Spark-written DIRECTORY of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    df = con.execute(sql).fetchdf()
    df.to_parquet(f"/tmp/_sf1_oracle_{q}.parquet")


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    import pandas as pd
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    ok, fail, skip = [], [], []
    for name in sorted(oracle):
        spark_dir = f"{OUT}/{name}"
        if not os.path.isdir(spark_dir):
            fail.append((name, "no spark dump"))
            continue
        p = mp.Process(target=run_oracle, args=(oracle[name], SF, name))
        p.start()
        p.join(TIMEOUT)
        if p.is_alive():
            p.terminate(); p.join()
            skip.append(name)
            print(f"SKIP {name} (oracle > {TIMEOUT}s at sf1)")
            continue
        if p.exitcode != 0:
            fail.append((name, f"oracle exit {p.exitcode}"))
            print(f"FAIL {name}: oracle exit {p.exitcode}")
            continue
        try:
            got = canon(pd.read_parquet(spark_dir))
            want = canon(pd.read_parquet(f"/tmp/_sf1_oracle_{name}.parquet"))
        except Exception as e:
            fail.append((name, str(e))); print(f"FAIL {name}: {e}"); continue
        if list(got.columns) != list(want.columns):
            fail.append((name, "cols")); print(f"FAIL {name}: cols"); continue
        if len(got) != len(want):
            fail.append((name, f"rows {len(got)} vs {len(want)}"))
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); continue
        bad = None
        for c in got.columns:
            try:
                w = want[c].astype(got[c].dtype, errors="ignore")
            except Exception:
                w = want[c]
            if str(got[c].dtype).startswith("float") or str(got[c].dtype) == "float64":
                import numpy as np
                if not np.allclose(got[c].fillna(0), w.astype(float).fillna(0),
                                   rtol=1e-9, atol=1e-9, equal_nan=True):
                    bad = c; break
            elif not got[c].equals(w):
                bad = c; break
        if bad:
            fail.append((name, f"col {bad}")); print(f"FAIL {name}: col {bad}")
        else:
            ok.append(name); print(f"OK   {name} ({len(got)} rows)")
    print(f"\nsf1 parity: {len(ok)} OK, {len(fail)} FAIL, "
          f"{len(skip)} SKIP(oracle-timeout)")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
