#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 scripts/local_check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet written by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the
sf_dir parquet tables, and compares: schema (column names), row count,
and exact values after sorting rows by all columns. Reports per-query
PASS/FAIL and, for doubles, the max abs diff when values are close but
not bit-equal (to catch float-summation drift early).
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracle:
            print(f"ok   {name}: rows-only ({len(got)} rows)"); n_pass += 1
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        # the driver's hash is dtype-sensitive: a DuckDB HUGEINT (SUM over
        # BIGINT) reaches pandas as float64 while Spark emits int64, and
        # `==` below would still pass (283.0 == 283) — the exact seam that
        # made round 10's local gate green while the driver's hash failed
        # (q126). Treat a kind mismatch as FAIL.
        kind_mism = [f"{c}: spark={got[c].dtype} oracle={exp[c].dtype}"
                     for c in gc if got[c].dtype.kind != exp[c].dtype.kind]
        if kind_mism:
            print(f"FAIL {name}: dtype seam {kind_mism}"); n_fail += 1; continue
        g = got[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
        e = exp[ec].sort_values(by=ec, kind="mergesort").reset_index(drop=True)
        mism = []
        for c in gc:
            a, b = g[c], e[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                bad = (~eq).sum()
                detail = ""
                if a.dtype.kind == "f" and b.dtype.kind == "f":
                    detail = f" maxdiff={ (a-b).abs().max() }"
                mism.append(f"{c}:{bad}{detail}")
        if mism:
            print(f"FAIL {name}: value mismatch {mism}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
