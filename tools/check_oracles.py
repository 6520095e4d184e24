#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
graft.Verify output parquet against its DuckDB oracle SQL.

Usage: python3 tools/check_oracles.py <verify_outDir> <sfDir>
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_rows_only = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracles:
            status = "ROWS-ONLY"
            ok = len(got) > 0
            n_rows_only += 1
            print(f"{name:24s} {status}: rows={len(got)} {'OK' if ok else 'EMPTY!'}")
            if not ok:
                n_bad += 1
            continue
        want = con.sql(oracles[name]).df()
        g, w = canon(got), canon(want)
        schema_ok = list(g.columns) == list(w.columns) and \
            all(str(a) == str(b) for a, b in zip(g.dtypes, w.dtypes))
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False)
            values_ok = True
        except AssertionError as e:
            values_ok = False
            err = str(e).split("\n")[0:6]
        if schema_ok and values_ok:
            n_ok += 1
            print(f"{name:24s} OK: rows={len(g)}")
        else:
            n_bad += 1
            print(f"{name:24s} MISMATCH schema_ok={schema_ok} values_ok={values_ok}")
            print(f"  spark dtypes: {dict(zip(g.columns, map(str, g.dtypes)))}")
            print(f"  duck  dtypes: {dict(zip(w.columns, map(str, w.dtypes)))}")
            if not values_ok:
                print("  " + "\n  ".join(err))
                print("  spark head:\n", g.head(3))
                print("  duck head:\n", w.head(3))
    print(f"\nsummary: {n_ok} oracle-exact, {n_rows_only} rows-only, {n_bad} BAD")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
