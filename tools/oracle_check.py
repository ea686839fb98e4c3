#!/usr/bin/env python3
"""Builder-side oracle pre-flight (optimization rounds): compare Verify's
parquet dumps against the DuckDB oracle SQL, the same shape as the driver's
check (rows, schema names, exact values after sorting columns by name).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [q1,q2,...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"{name}: MISSING spark output")
            fails += 1
            continue
        s = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        o = con.execute(oracle[name]).fetchdf()
        s = s.reindex(sorted(s.columns), axis=1)
        o = o.reindex(sorted(o.columns), axis=1)
        # queries ORDER BY a key that may have ties — canonicalize row order
        # on every column (stringified: mixed/NaN-bearing cols sort stably)
        if list(s.columns) == list(o.columns) and len(s.columns):
            key = lambda df: df.astype(str).apply(tuple, axis=1).argsort(kind="stable")
            s = s.iloc[key(s)].reset_index(drop=True)
            o = o.iloc[key(o)].reset_index(drop=True)
        problems = []
        if list(s.columns) != list(o.columns):
            problems.append(f"schema {list(s.columns)} vs {list(o.columns)}")
        if len(s) != len(o):
            problems.append(f"rows {len(s)} vs {len(o)}")
        if not problems:
            for c in s.columns:
                sv, ov = s[c], o[c]
                try:
                    eq = (sv.astype(object).where(pd.notnull(sv), None) ==
                          ov.astype(object).where(pd.notnull(ov), None)) | \
                         (pd.isnull(sv) & pd.isnull(ov))
                except Exception as e:
                    problems.append(f"col {c}: compare error {e}")
                    continue
                if not bool(eq.all()):
                    bad = (~eq).idxmax()
                    problems.append(
                        f"col {c} differs at row {bad}: {sv[bad]!r} vs {ov[bad]!r}")
        if problems:
            fails += 1
            print(f"{name}: FAIL  " + "; ".join(problems))
        else:
            print(f"{name}: ok ({len(s)} rows)")
    sys.exit(1 if fails else 0)

main()
