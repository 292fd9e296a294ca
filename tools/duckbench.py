#!/usr/bin/env python3
"""Matched-work DuckDB comparison (BASELINE.md 2x target).

Times every oracle SQL in DuckDB over the same parquet tables, then joins
against a Bench JSON line's per-query seconds and reports the ratio on the
matched-work subset (oracle >= 20ms, excluding rows-only entries with no
oracle). Spark seconds are floor-adjusted the same way adjusted_total is:
per-query noop plus marginal job floor for extra jobs.

Usage: python3 tools/duckbench.py <sfDir> <oracle_sql.json> <bench.json> [out.json]

With the optional 4th arg, the per-query report and the matched-work
summary are also written as JSON (the committed DUCKBENCH_r{N}.json
artifact that makes the <=2x gate auditable without a re-run).
"""
import json, sys, time, os

def main():
    sf, oracle_path, bench_path = sys.argv[1], sys.argv[2], sys.argv[3]
    out_path = sys.argv[4] if len(sys.argv) > 4 else None
    import duckdb
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    bench = json.loads(open(bench_path).read())
    qs, jobs = bench["queries"], bench.get("jobs", {})
    warm = bench.get("queries_warm", {})
    noop = bench.get("overhead_per_query", 0.0)
    jf = bench.get("overhead_per_extra_job", 0.0)
    rows = []
    for name, sql in sorted(oracle.items()):
        if name not in qs:
            continue
        try:
            con.execute(sql).fetchall()  # warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                ts.append(time.perf_counter() - t0)
            duck = sorted(ts)[1]
        except Exception as e:
            print(f"SKIP {name}: duckdb error {str(e).splitlines()[0][:120]}")
            continue
        spark_adj = max(qs[name] - noop - jf * max(jobs.get(name, 1) - 1, 0), 0.0)
        # warm = re-execution of the SAME DataFrame (plan + AQE stages
        # reused): the steady-state serving number, pinning how much of a
        # cold ratio is plan-construction floor rather than row work
        rows.append((name, duck, qs[name], spark_adj, warm.get(name)))
    matched = [r for r in rows if r[1] >= 0.02]

    # Mechanical per-entry verdict (round-12 verdict ask #2b): an entry
    # passes iff its BEST ratio — cold floor-adjusted or warm steady-state
    # re-execution — is within the 2x gate. When the adj column alone is
    # >2x, the emitted decomposition shows what the residue is made of:
    # `floor_s` (jobs x measured per-job floor, already subtracted in adj)
    # and `fresh_minus_warm_s` (per-fresh-execution plan/orchestration
    # cost that re-running the same DataFrame does not pay). No prose
    # defense: the artifact itself carries the explanation or the fail.
    def verdict_of(duck, raw, adj, w, j):
        best = (min(adj, w) if w is not None else adj) / max(duck, 1e-9)
        v = {"ratio_best": best, "verdict": "pass" if best <= 2.0 else "fail"}
        if adj / max(duck, 1e-9) > 2.0:
            v["residual_decomposition"] = {
                "jobs": j,
                "floor_s": noop + jf * max(j - 1, 0),
                "fresh_minus_warm_s": (raw - w) if w is not None else None,
                "row_work_ratio_warm": (w / max(duck, 1e-9))
                                       if w is not None else None,
            }
        return v

    for name, duck, raw, adj, w in sorted(matched, key=lambda r: -(r[3] / max(r[1], 1e-9))):
        ws = f" warm={w*1000:8.1f}ms wratio={w/max(duck,1e-9):6.2f}" if w is not None else ""
        vd = verdict_of(duck, raw, adj, w, jobs.get(name, 1))["verdict"]
        print(f"{name:28s} duck={duck*1000:8.1f}ms spark={raw*1000:8.1f}ms adj={adj*1000:8.1f}ms ratio={adj/max(duck,1e-9):6.2f}{ws} {vd}")
    if matched:
        sduck = sum(r[1] for r in matched)
        sadj = sum(r[3] for r in matched)
        sraw = sum(r[2] for r in matched)
        mw = [r for r in matched if r[4] is not None]
        wpart = ""
        if mw:
            wpart = (f" ratio_warm={sum(r[4] for r in mw) / max(sum(r[1] for r in mw), 1e-9):.2f}"
                     f" (warm on {len(mw)})")
        print(f"== matched-work subset (oracle>=20ms): {len(matched)} queries; "
              f"duck={sduck:.2f}s spark_raw={sraw:.2f}s spark_adj={sadj:.2f}s "
              f"ratio_adj={sadj/sduck:.2f} ratio_raw={sraw/sduck:.2f}{wpart}")
    print(f"== all {len(rows)} oracle-timed queries: duck={sum(r[1] for r in rows):.2f}s "
          f"spark_adj={sum(r[3] for r in rows):.2f}s")
    if out_path:
        report = {
            "sf": sf,
            "bench": os.path.basename(bench_path),
            "overhead_per_query": noop,
            "overhead_per_extra_job": jf,
            "queries": {
                name: {"duck_s": duck, "spark_raw_s": raw, "spark_adj_s": adj,
                       "jobs": jobs.get(name, 1),
                       "ratio_adj": adj / max(duck, 1e-9),
                       **({"spark_warm_s": w,
                           "ratio_warm": w / max(duck, 1e-9)}
                          if w is not None else {}),
                       **(verdict_of(duck, raw, adj, w, jobs.get(name, 1))
                          if duck >= 0.02 else {})}
                for name, duck, raw, adj, w in rows
            },
            "matched_subset": {
                "min_oracle_s": 0.02,
                "n": len(matched),
                "duck_s": sum(r[1] for r in matched),
                "spark_raw_s": sum(r[2] for r in matched),
                "spark_adj_s": sum(r[3] for r in matched),
                "ratio_adj": (sum(r[3] for r in matched) /
                              max(sum(r[1] for r in matched), 1e-9)),
                "ratio_raw": (sum(r[2] for r in matched) /
                              max(sum(r[1] for r in matched), 1e-9)),
                "ratio_warm": (sum(r[4] for r in matched if r[4] is not None) /
                               max(sum(r[1] for r in matched if r[4] is not None), 1e-9)),
                # the committed per-entry gate: cold-adjusted OR warm
                # (steady-state) must be within 2x for every matched query
                "max_entry_ratio_best": max(
                    (min(r[3], r[4]) if r[4] is not None else r[3]) / max(r[1], 1e-9)
                    for r in matched) if matched else 0.0,
                "per_entry_pass": sum(
                    1 for r in matched
                    if verdict_of(r[1], r[2], r[3], r[4],
                                  jobs.get(r[0], 1))["verdict"] == "pass"),
                "per_entry_total": len(matched),
            },
        }
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {out_path}")

if __name__ == "__main__":
    main()
