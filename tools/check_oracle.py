#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (written by graft.Verify) and compares it
to the oracle SQL in <outDir>/oracle_sql.json executed by DuckDB over the
testdata tables. Mimics the driver: sorts columns by name, compares row
multisets of stringified values.
"""
import sys, json, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    def cell(v):
        if isinstance(v, float):
            return f"{v!r}"
        if isinstance(v, list):
            return "[" + ",".join(str(x) for x in v) + "]"
        return str(v)
    return sorted("|".join(cell(r[i]) for i in order) for r in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
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
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            got_cols = [d[0] for d in con.description]
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); failures += 1; continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"[COLS] {name}: got {sorted(got_cols)} want {sorted(want_cols)}")
            failures += 1; continue
        g, w = canon(got, got_cols), canon(want, want_cols)
        if g == w:
            print(f"[OK  ] {name}: {len(g)} rows")
        else:
            print(f"[FAIL] {name}: rows got={len(g)} want={len(w)}")
            diff_g = [x for x in g if x not in set(w)][:3]
            diff_w = [x for x in w if x not in set(g)][:3]
            for d in diff_g: print(f"   got-only: {d[:160]}")
            for d in diff_w: print(f"  want-only: {d[:160]}")
            failures += 1
    print(f"{'ALL OK' if failures == 0 else str(failures) + ' FAILURES'}")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
