#!/usr/bin/env python3
"""Compare two Bench JSON records (min-of-N per query): regression gate +
headline deltas. Usage: bench_compare.py BEFORE.json AFTER.json [top_n]"""
import json, sys

b = json.load(open(sys.argv[1]))
a = json.load(open(sys.argv[2]))
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
bm, am = b["queries_min"], a["queries_min"]
common = sorted(set(bm) & set(am))
print(f"common queries: {len(common)}  "
      f"before min-sum {sum(bm[k] for k in common):.1f}s  "
      f"after min-sum {sum(am[k] for k in common):.1f}s")
deltas = sorted(((am[k] - bm[k], k) for k in common))
print("\nbiggest improvements (min-of-3 sec):")
for d, k in deltas[:top_n]:
    if d < -0.2:
        print(f"  {bm[k]:7.2f} -> {am[k]:7.2f}  ({d:+.2f})  {k}")
print("\nregressions > +0.5s AND > 1.5x:")
reg = [(d, k) for d, k in deltas if d > 0.5 and am[k] > 1.5 * bm[k]]
for d, k in sorted(reg, reverse=True):
    print(f"  {bm[k]:7.2f} -> {am[k]:7.2f}  ({d:+.2f})  {k}")
if not reg:
    print("  none")
