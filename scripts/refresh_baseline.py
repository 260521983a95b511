#!/usr/bin/env python3
"""Refresh bench_baseline.json from N trusted Bench records.

Takes per-query MIN across the given target/bench_last.json-format
records (each itself a min-of-reps run), writes bench_baseline.json with
n_queries DERIVED from the merged query map — the count can no longer
drift from the entries (VERDICT r9 item 4) — and refuses records that
are subset runs (bench_only stamp) or from mismatched scale dirs.

Usage: python3 scripts/refresh_baseline.py run1.json run2.json ... \
           [--note "..."] [--out bench_baseline.json]
"""
import json
import sys

args = sys.argv[1:]
note = ""
out = "bench_baseline.json"
if "--note" in args:
    i = args.index("--note")
    note = args[i + 1]
    del args[i:i + 2]
if "--out" in args:
    i = args.index("--out")
    out = args[i + 1]
    del args[i:i + 2]
if not args:
    sys.exit("need at least one bench record")

runs = []
for p in args:
    with open(p) as f:
        r = json.load(f)
    if r.get("bench_only"):
        sys.exit(f"{p}: subset run (bench_only={r['bench_only']!r}) — "
                 "baseline needs full sweeps")
    runs.append((p, r))

sfs = {r["sf"] for _, r in runs}
if len(sfs) != 1:
    sys.exit(f"mixed scale dirs across records: {sfs}")
names = set()
for _, r in runs:
    names.update(r["queries"])
merged = {}
for q in sorted(names):
    ts = [r["queries"][q] for _, r in runs if q in r["queries"]]
    ok = [t for t in ts if t >= 0]
    if len(ts) != len(runs):
        print(f"warning: {q} present in only {len(ts)}/{len(runs)} records")
    merged[q] = min(ok) if ok else -1
errs = sorted(q for q, t in merged.items() if t < 0)
if errs:
    sys.exit(f"erroring queries cannot enter the baseline: {errs}")

total = round(sum(merged.values()), 4)
doc = {
    "metric": "total", "value": total, "unit": "sec",
    "n_queries": len(merged), "sf": sfs.pop(),
    "git_heads": sorted({r.get("git_head", "?") for _, r in runs}),
    "note": note or f"per-query min across {len(runs)} Bench runs",
    "queries": merged,
}
with open(out, "w") as f:
    json.dump(doc, f, indent=1, sort_keys=False)
    f.write("\n")
print(f"wrote {out}: {len(merged)} queries, total {total} s")
