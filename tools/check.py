#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir] [--skip-verify]

1. Runs `sbt "runMain graft.Verify <sfDir> <outDir>"` (unless --skip-verify).
2. For each query result parquet + its oracle SQL, runs the SQL in DuckDB
   over views of the same parquet tables, sorts columns by name and rows by
   value, and compares cell-by-cell.
"""
import json, subprocess, sys, glob, os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--skip-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", f'runMain graft.Verify {sf} {out}'],
            capture_output=True, text=True, cwd="/root/repo")
        errs = [l for l in (r.stdout + r.stderr).splitlines()
                if "[verify]" in l or "error]" in l.lower() and "INFO" not in l]
        for l in errs[:30]:
            print(l)
        if r.returncode != 0:
            print("VERIFY FAILED rc=", r.returncode)
            sys.exit(1)

    import duckdb
    import pandas as pd
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out)):
        qdir = os.path.join(out, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        if name not in oracle:
            status = "SKIP(rows-only)" if len(got) > 0 else "FAIL(rows=0)"
            print(f"{status} {name}: rows={len(got)}")
            n_skip += len(got) > 0
            n_fail += len(got) == 0
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        ok, msg = compare(got, exp)
        print(("PASS" if ok else "FAIL"), name, msg)
        n_pass += ok
        n_fail += not ok
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

def compare(got, exp):
    import pandas as pd
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(exp.columns)}"
    if len(got) != len(exp):
        return False, f"row count {len(got)} vs {len(exp)}"
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    for c in got.columns:
        gv, ev = g[c], e[c]
        try:
            eq = (gv == ev) | (gv.isna() & ev.isna())
        except Exception:
            eq = gv.astype(str) == ev.astype(str)
        if not eq.all():
            i = (~eq).idxmax()
            return False, f"col {c} row {i}: got={gv[i]!r} exp={ev[i]!r} (dtype {gv.dtype}/{ev.dtype})"
    return True, f"rows={len(got)}"

if __name__ == "__main__":
    main()
