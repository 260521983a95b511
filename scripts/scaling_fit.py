#!/usr/bin/env python3
"""Fit per-query wall-time scaling exponents from the scaling sweep.

Reads target/scale/bench_sf{0.1,0.5,1.0}.json (written by
scripts/scaling_sweep.sh), fits log(t) = alpha*log(sf) + c per query by
least squares over the three points, and prints a markdown table sorted
by exponent. alpha ~ 1 = corpus-linear; sub-linear happens when a fixed
per-query overhead (session/planning/small-side work) still dominates at
these sizes; alpha >> 1 is a scale red flag.

Usage: python3 scripts/scaling_fit.py [outdir]
"""
import json
import math
import sys

positional = [a for a in sys.argv[1:] if not a.startswith("--")
              and (sys.argv[sys.argv.index(a) - 1] != "--gate")]
outdir = positional[0] if positional else "target/scale"
sfs = ["0.1", "0.5", "1.0"]
runs = {}
for sf in sfs:
    with open(f"{outdir}/bench_sf{sf}.json") as f:
        runs[sf] = json.load(f)

queries = sorted(runs["0.1"]["queries"])
rows = []
for q in queries:
    pts = [(float(sf), runs[sf]["queries"].get(q, -1)) for sf in sfs]
    if any(t is None or t < 0 for _, t in pts):
        rows.append((q, pts, None))
        continue
    xs = [math.log(x) for x, _ in pts]
    ys = [math.log(t) for _, t in pts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    alpha = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs)
    rows.append((q, pts, alpha))

rows.sort(key=lambda r: -(r[2] if r[2] is not None else 99))
print("| query | sf0.1 s | sf0.5 s | sf1.0 s | exponent | marginal (0.5→1.0) |")
print("| --- | ---: | ---: | ---: | ---: | ---: |")
for q, pts, alpha in rows:
    t = {f"{x:g}": v for x, v in pts}
    a = f"{alpha:.2f}" if alpha is not None else "ERR"
    # slope over the top octave alone: least polluted by the fixed
    # per-query overhead that flattens the full fit at these sizes
    marg = (f"{math.log(t['1'] / t['0.5']) / math.log(2):.2f}"
            if alpha is not None and t['0.5'] > 0 else "ERR")
    print(f"| {q} | {t['0.1']:.2f} | {t['0.5']:.2f} | {t['1']:.2f} | {a} | {marg} |")

tot = [sum(v for v in runs[sf]['queries'].values() if v >= 0) for sf in sfs]
print(f"\ntotals: sf0.1 {tot[0]:.1f} s, sf0.5 {tot[1]:.1f} s, sf1.0 {tot[2]:.1f} s")

# --gate [MAX]: the slow-tier CI mode (VERDICT r10 item 8) — fail when
# any query's full-fit exponent exceeds MAX (default 1.2) or errored at
# any scale point, so the one measurement that answers the 100 TB brief
# cannot silently rot. Run after scripts/scaling_sweep.sh on a QUIET box
# (1-min load < 1 — see the measurement-hygiene recipe).
if "--gate" in sys.argv:
    i = sys.argv.index("--gate")
    max_alpha = float(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 1.2
    bad = [(q, a) for q, _, a in rows if a is None or a > max_alpha]
    if bad:
        for q, a in bad:
            print(f"SCALING GATE FAIL {q}: exponent "
                  f"{'ERR' if a is None else f'{a:.2f}'} > {max_alpha}")
        sys.exit(1)
    print(f"SCALING GATE PASS: all {len(rows)} exponents <= {max_alpha}")
