#!/usr/bin/env python3
"""Round-over-round bench comparison.

Usage: python3 tools/bench_diff.py BENCH_SWEEP_rOLD.json BENCH_SWEEP_rNEW.json
Prints per-query deltas sorted by regression size, plus totals; exits 1
if any query regressed more than --threshold (default 1.5x and >0.3s).
"""
import json, sys

thr_ratio, thr_abs = 1.5, 0.3
old, new = (json.load(open(p)) for p in sys.argv[1:3])
oq, nq = old["queries"], new["queries"]
rows = []
for name in sorted(set(oq) | set(nq)):
    a, b = oq.get(name), nq.get(name)
    if a is None:
        rows.append((0.0, f"{name:30s}      NEW  {b:6.2f}s"))
    elif b is None:
        rows.append((0.0, f"{name:30s}  REMOVED  (was {a:.2f}s)"))
    else:
        d = b - a
        rows.append((d, f"{name:30s} {a:6.2f}s -> {b:6.2f}s  ({d:+.2f})"))
for _, line in sorted(rows, key=lambda r: -r[0]):
    print(line)
print(f"\ntotal: {old['value']:.2f}s -> {new['value']:.2f}s "
      f"({len(oq)} -> {len(nq)} queries)")
bad = [n for n in set(oq) & set(nq)
       if nq[n] > oq[n] * thr_ratio and nq[n] - oq[n] > thr_abs]
if bad:
    print(f"REGRESSIONS (> {thr_ratio}x and > {thr_abs}s): {', '.join(sorted(bad))}")
    sys.exit(1)
print("no significant regressions")
