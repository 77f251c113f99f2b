#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle SQL in
DuckDB over the testdata parquet tables and diff against the Spark
result parquet written by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cmp(name, a: pd.DataFrame, b: pd.DataFrame) -> str:
    if sorted(a.columns) != sorted(b.columns):
        return f"SCHEMA cols spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    a, b = norm(a), norm(b)
    for c in a.columns:
        av, bv = a[c], b[c]
        # driver hashes values dtype-exactly: a DuckDB HUGEINT (-> float64)
        # vs a Spark int64 passes a tolerant compare but fails the hash
        if pd.api.types.is_float_dtype(av) != pd.api.types.is_float_dtype(bv):
            return f"DTYPE col={c} spark={av.dtype} oracle={bv.dtype}"
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            try:
                bad = ~((av == bv) | (av.isna() & bv.isna()))
            except Exception:
                bad = av.astype(str) != bv.astype(str)
        if bad.any():
            i = bad.idxmax()
            return (f"VALUE col={c} row={i} spark={a[c][i]!r} oracle={b[c][i]!r} "
                    f"(+{int(bad.sum())-1} more)")
    return "OK"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # driver drops are single files; MakeSf's sf1 tables are
        # directories of part files — glob those
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark output")
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE-ERROR {e}")
            continue
        r = cmp(name, spark_df, odf)
        print(f"{name}: {r}  ({len(spark_df)} rows)")
        n_ok += r == "OK"
    print(f"== {n_ok} OK")


if __name__ == "__main__":
    main()
