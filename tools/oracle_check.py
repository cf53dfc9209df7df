#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the same tables, and compares
row count, schema (column names + dtypes) and exact values. Strictly stricter
than any plausible driver compare: values must match bit-for-bit in the
query's own output order after sorting columns by name.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
            if not eq.all():
                i = int(np.argmin(eq))
                return False, f"col {c} row {i}: {av[i]!r} != {bv[i]!r} (maxdiff {np.nanmax(np.abs(av.astype(float)-bv.astype(float)))})"
        else:
            def cell_eq(x, y):
                if isinstance(x, (list, np.ndarray)) or isinstance(y, (list, np.ndarray)):
                    return list(x) == list(y)
                try:
                    if pd.isna(x) and pd.isna(y):
                        return True
                except (TypeError, ValueError):
                    pass
                return x == y
            try:
                eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
            except Exception:
                eq = np.array([cell_eq(x, y) for x, y in zip(av, bv)])
            if not np.asarray(eq).all():
                i = int(np.argmin(np.asarray(eq)))
                return False, f"col {c} row {i}: {av[i]!r} != {bv[i]!r}"
    return True, ""


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        # dtype comparison (informational; value compare is the gate)
        dt_note = ""
        for c in spark_df.columns.intersection(duck_df.columns):
            if str(spark_df[c].dtype) != str(duck_df[c].dtype):
                dt_note += f" [dtype {c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}]"
        ok, why = values_equal(spark_df, duck_df)
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows){dt_note}")
            n_pass += 1
        else:
            print(f"FAIL {name}: {why}{dt_note}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
