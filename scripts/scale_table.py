#!/usr/bin/env python3
"""Generate the BASELINE.md measured-scaling markdown table from two
BENCH_DETAIL.json files. Usage: scale_table.py sf_small.json sf_big.json"""
import json, math, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
qa, qb = a["queries"], b["queries"]
rows = []
for q in sorted(set(qa) & set(qb)):
    r = qb[q] / qa[q]
    rows.append((q, qa[q], qb[q], r, math.log10(r)))
rows.sort(key=lambda x: -x[3])
print("| query | sf0.1 s | sf1 s | ratio | exp |")
print("|---|---|---|---|---|")
for q, s, t, r, e in rows:
    print(f"| {q} | {s:.3f} | {t:.3f} | {r:.2f} | {e:.2f} |")
ta = sum(qa[q] for q, *_ in rows)
tb = sum(qb[q] for q, *_ in rows)
print(f"\nsubset totals: {ta:.2f} s -> {tb:.2f} s ({tb/ta:.1f}x at 10x data)")
