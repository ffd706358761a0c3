#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only —
NOT part of the engine). Usage:

    python3 scripts/oracle_check.py <verify_out_dir> <sf_dir>

Assumes `sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"` already
ran. For each query: load the Spark parquet result and the DuckDB
oracle result, sort columns by name, sort rows, compare exactly.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = normalize(pd.concat([pd.read_parquet(f) for f in spark_files]))
            want = normalize(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} vs oracle {want.shape}")
            print("  spark cols:", list(got.columns), "oracle cols:", list(want.columns))
            n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        mism = []
        for c in got.columns:
            a, b = got[c].values, want[c].values
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eq = (pd.isna(a) & pd.isna(b)) | (a == b)
            else:
                eq = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).values
            if not eq.all():
                i = int(np.argmin(eq))
                mism.append(f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r} ({(~eq).sum()} diffs)")
        if mism:
            print(f"FAIL {name}: " + "; ".join(mism[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({got.shape[0]} rows)"); n_pass += 1
    # queries without oracle: rows-only
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracles:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(pd.read_parquet(f).shape[0] for f in files) if files else 0
            print(f"{'PASS' if n > 0 else 'FAIL'} {name} (rows-only: {n} rows)")
            if n > 0: n_pass += 1
            else: n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
