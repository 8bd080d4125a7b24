#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against Verify output.

Mimics the driver's t2 gate: run each oracle SQL in DuckDB over the same
parquet tables, canonicalize both results (sort columns by name, sort
rows, round doubles to 6 dp, timestamps to ISO-UTC strings), and compare
hashes. Usage:  check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            except Exception:
                pass
            s = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            s = s.round(6)
            s = s.where(~(s == -0.0), 0.0)
        elif s.dtype == object:
            s = s.astype(str)
        out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output")
            n_bad += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            print(f"READERR  {name}: {e}")
            n_bad += 1
            continue
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"ROWS     {name}: spark={len(got)} oracle={len(exp)}")
            n_bad += 1
            continue
        if not got.equals(exp):
            neq = (got != exp)
            bad_cols = [c for c in got.columns if neq[c].any()]
            print(f"VALUES   {name}: differing cols={bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"         first diff [{c}] row {idx}: "
                      f"spark={got[c][idx]!r} oracle={exp[c][idx]!r}")
            n_bad += 1
            continue
        print(f"OK       {name} ({len(got)} rows)")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
