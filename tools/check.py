#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (sorted columns, sorted
rows, value-level). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

GLOB_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
               "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in GLOB_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = normalize(pd.read_parquet(f"{out_dir}/{name}"))
            want = normalize(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        eq = True
        for c in got.columns:
            a, b = got[c], want[c]
            if str(a.dtype).startswith("float"):
                neq = ~((a == b) | (a.isna() & b.isna()))
            else:
                neq = ~((a.astype(str) == b.astype(str)))
            if neq.any():
                i = neq.idxmax()
                print(f"FAIL {name}: col {c} row {i}: {a[i]!r} != {b[i]!r} "
                      f"({int(neq.sum())} diffs)")
                eq = False
                break
        if eq:
            print(f"OK   {name} ({len(got)} rows)")
        else:
            n_bad += 1
    print(f"{'PASS' if n_bad == 0 else 'FAIL'}: {len(oracle) - n_bad}/{len(oracle)}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
