#!/usr/bin/env python3
"""Dev harness mirroring the driver's correctness gate: for each query
output under the verify dir, run the paired oracle SQL in DuckDB over the
same test tables and diff (schema-sorted columns, exact values).

Usage: python3 tools/check_oracle.py <sfDir> <verifyDir> [query ...]
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    df = con.execute(
        "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
    ).df()
    con.close()
    return df


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s = spark_df[sorted(spark_df.columns)]
        d = duck_df[sorted(duck_df.columns)]
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        ok = True
        for c in s.columns:
            sv, dv = s[c], d[c]
            # normalize timestamps to ns for compare
            if "datetime" in str(sv.dtype) or "datetime" in str(dv.dtype):
                sv = pd.to_datetime(sv).astype("datetime64[ns]")
                dv = pd.to_datetime(dv).astype("datetime64[ns]")
            try:
                eq = (sv.values == dv.values) | (pd.isna(sv.values) & pd.isna(dv.values))
            except Exception:
                eq = sv.astype(str).values == dv.astype(str).values
            if not eq.all():
                idx = (~eq).nonzero()[0][:3]
                print(f"FAIL {name}: col '{c}' differs at rows {list(idx)}: "
                      f"spark={[sv.iloc[i] for i in idx]} duck={[dv.iloc[i] for i in idx]} "
                      f"(dtypes {sv.dtype}/{dv.dtype}, {int((~eq).sum())} diffs)")
                ok = False
                break
        if ok:
            dt_note = ""
            for c in s.columns:
                if str(s[c].dtype) != str(d[c].dtype):
                    dt_note += f" [dtype {c}: {s[c].dtype} vs {d[c].dtype}]"
            print(f"PASS {name} ({len(s)} rows){dt_note}")
            n_pass += 1
        else:
            n_fail += 1
    # queries without oracle: rows-only note
    import os
    for name in sorted(os.listdir(outdir)):
        if os.path.isdir(f"{outdir}/{name}") and name not in oracle:
            df = load_spark(outdir, name)
            print(f"NOORACLE {name}: {0 if df is None else len(df)} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")


if __name__ == "__main__":
    main()
