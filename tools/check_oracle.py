#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify) and compares it
to the oracle SQL in <outDir>/oracle_sql.json executed by DuckDB over the
testdata tables.

Mirrors the DRIVER's pandas canonicalisation (not a looser variant): both
sides go through DataFrame -> columns sorted by name -> sort_values over all
columns -> stringified cell compare. In particular a raw array/list column
raises TypeError("unhashable type") here exactly like it does in the driver
(pandas factorize during sort_values), so local green implies driver green.
"""
import sys, json, glob, os
import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    # driver behavior: sort_values factorizes object columns -> dies on ndarray
    df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df


def cell(v):
    if isinstance(v, float):
        return f"{v!r}"
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no result parquet"); failures += 1; continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"[ERR ] {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: got {list(got.columns)} want {list(want.columns)}")
            failures += 1; continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: got={len(got)} want={len(want)}")
            failures += 1; continue
        g = ["|".join(cell(v) for v in row) for row in got.itertuples(index=False)]
        w = ["|".join(cell(v) for v in row) for row in want.itertuples(index=False)]
        if g == w:
            print(f"[OK  ] {name}: {len(g)} rows")
        else:
            bad = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"[FAIL] {name}: {sum(1 for a, b in zip(g, w) if a != b)} mismatched rows")
            for a, b in bad:
                print(f"   got: {a[:160]}")
                print(f"  want: {b[:160]}")
            failures += 1
    print(f"{'ALL OK' if failures == 0 else str(failures) + ' FAILURES'}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
