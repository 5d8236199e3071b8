#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB with views
named after the tables in sfDir, sort columns by name + rows by all
columns, and compare values. Prints PASS/FAIL per query.
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noora = 0
    import glob
    for qdir in sorted(d for d in glob.glob(f"{out_dir}/*") if not d.endswith(".json")):
        import os
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        spark_df = pd.read_parquet(qdir)
        if name not in oracle:
            n_noora += 1
            print(f"ROWS-ONLY {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: oracle SQL error: {e}")
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            n_fail += 1
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            n_fail += 1
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            continue
        # normalize timestamps/dates to comparable form
        for c in a.columns:
            for df in (a, b):
                if str(df[c].dtype).startswith("datetime"):
                    df[c] = df[c].astype("datetime64[us]")
        mismatch = None
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                ok = values_equal(x, y)
                if not ok and x is not None and y is not None:
                    try:
                        ok = str(x) == str(y)
                    except Exception:
                        pass
                if not ok and (x is None) != (y is None):
                    ok = False
                if not ok:
                    mismatch = (c, i, x, y)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, x, y = mismatch
            n_fail += 1
            print(f"FAIL {name}: col={c} row={i}: spark={x!r} ({type(x).__name__}) duck={y!r} ({type(y).__name__})")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(a)} rows")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
