#!/usr/bin/env python3
"""Dev-side mirror of the driver's correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran (or run
with --run to invoke it). For each query parquet in outDir, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir tables
and compares: column names (sorted), dtypes (loose), row count, and exact
values after sorting rows by all columns. Dev tool only — the shipped
library has no Python dependency.
"""
import json, subprocess, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    if "--run" in sys.argv:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
                       check=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} vs {ecols}")
            n_fail += 1
            continue
        g = got[gcols].sort_values(gcols, kind="mergesort").reset_index(drop=True)
        e = exp[ecols].sort_values(ecols, kind="mergesort").reset_index(drop=True)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        diffs = []
        for c in gcols:
            gv, ev = g[c], e[c]
            try:
                eq = (gv.isna() & ev.isna()) | (gv == ev)
            except Exception:
                eq = gv.astype(str) == ev.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                diffs.append(f"{c}[row{i}]: {gv[i]!r} vs {ev[i]!r} "
                             f"({(~eq).sum()} rows differ)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3]))
            n_fail += 1
        else:
            dtypes_note = ""
            for c in gcols:
                if str(g[c].dtype) != str(e[c].dtype):
                    dtypes_note += f" [dtype {c}: {g[c].dtype} vs {e[c].dtype}]"
            print(f"PASS {name} ({len(g)} rows){dtypes_note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
