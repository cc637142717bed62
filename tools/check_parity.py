#!/usr/bin/env python3
"""Local stand-in for the driver's t2 check: run each oracle_sql.json entry
in DuckDB over the same parquet tables and diff against the Spark parquet
output written by graft.Verify. Strict: row order and exact values compared
(floats bit-exact) after sorting columns by name, mirroring the driver.

Usage: check_parity.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], (list, tuple)) or \
               len(sample) and type(sample.iloc[0]).__name__ == "ndarray":
                df[c] = df[c].map(
                    lambda v: tuple(v) if v is not None else None)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            spark = norm(pd.read_parquet(f"{outdir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            duck = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if list(spark.columns) != list(duck.columns):
            print(f"FAIL {name}: cols spark={list(spark.columns)} "
                  f"duck={list(duck.columns)}"); n_fail += 1; continue
        if len(spark) != len(duck):
            print(f"FAIL {name}: rows spark={len(spark)} duck={len(duck)}")
            n_fail += 1; continue
        bad = []
        for c in spark.columns:
            a, b = spark[c], duck[c]
            na_a, na_b = a.isna(), b.isna()
            if not na_a.equals(na_b):
                bad.append(f"{c}: null-pattern ({int(na_a.sum())} vs {int(na_b.sum())})")
                continue
            av, bv = a[~na_a], b[~na_b]
            try:
                neq = av.values != bv.values
            except Exception:
                neq = [x != y for x, y in zip(av, bv)]
            n_neq = int(pd.Series(neq).sum())
            if n_neq:
                detail = ""
                if pd.api.types.is_float_dtype(a):
                    d = (av.astype(float) - bv.astype(float)).abs().max()
                    detail = f" maxdiff={d:.3e}"
                idx = pd.Series(neq)[pd.Series(neq)].index[0]
                detail += f" first@{idx}: {av.iloc[idx]!r} vs {bv.iloc[idx]!r}"
                bad.append(f"{c}: {n_neq} diffs{detail}")
        # dtype check (schema-match analog)
        for c in spark.columns:
            if str(spark[c].dtype) != str(duck[c].dtype):
                bad.append(f"{c}: dtype {spark[c].dtype} vs {duck[c].dtype}")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(spark)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
