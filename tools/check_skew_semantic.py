#!/usr/bin/env python3
"""Out-of-band DuckDB differential for the dedup_semantic mega-cell
split mirror.

The driver's gate corpora are balanced (max cell pop ~1.2x expected),
so the split branch of the oracle never fires there. This check replays
the SAME oracle SQL (minCos rewritten to SkewSemantic's 0.95) over the
10x-skew corpus written by `runMain graft.tools.SkewSemantic <skewDir>`
and compares row-for-row with the Spark result — proving the oracle's
two split levels mirror Similarity.splitHotCells on a corpus where the
hot branch actually executes.

Usage: check_skew_semantic.py <skewDir> <verifyOutDir>
  <skewDir>      output of graft.tools.SkewSemantic
  <verifyOutDir> any graft.Verify output dir holding oracle_sql.json
"""
import glob
import json
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(skew_dir: str, verify_dir: str) -> int:
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{skew_dir}/embeddings/*.parquet'")
    sql = json.load(open(f"{verify_dir}/oracle_sql.json"))["dedup_semantic"]
    sql = sql.replace(">= 0.40", ">= 0.95")  # SkewSemantic runs minCos=0.95
    exp = canon(con.execute(sql).df())
    got = canon(pd.concat(
        [pd.read_parquet(f)
         for f in glob.glob(f"{skew_dir}/result/*.parquet")]))
    ok = exp.astype(str).equals(got.astype(str))
    print(f"rows spark={len(got)} oracle={len(exp)} equal={ok}")
    if not ok:
        mism = (exp.astype(str) != got.astype(str)).any(axis=1)
        print(f"mismatching rows: {int(mism.sum())}")
        print(exp[mism].head(10))
        print(got[mism].head(10))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
