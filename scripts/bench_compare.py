#!/usr/bin/env python3
"""Compare a BENCH_DETAIL.json run against the frozen baseline JSON
embedded in BASELINE.md. Prints per-query ratios sorted worst-first and
summary stats. Usage: bench_compare.py [BENCH_DETAIL.json]"""
import json, re, statistics, sys

detail = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
run = json.load(open(detail))
md = open("BASELINE.md").read()
m = re.search(r"## Frozen bench JSON.*?```json\n(.*?)\n```", md, re.S)
base = json.loads(m.group(1))

rq, bq = run["queries"], base["queries"]
common = sorted(set(rq) & set(bq))
ratios = {q: rq[q] / bq[q] for q in common if bq[q] > 0}
print(f"run total {run['value']:.2f}s over {len(rq)} vs frozen {base['value']:.2f}s over {len(bq)}")
print(f"common {len(common)}, median ratio {statistics.median(ratios.values()):.3f}")
over2 = {q: r for q, r in ratios.items() if r > 2.0}
print(f">2x: {len(over2)}")
for q, r in sorted(ratios.items(), key=lambda kv: -kv[1])[:15]:
    print(f"  {q:32s} {rq[q]:7.3f} vs {bq[q]:7.3f} = {r:5.2f}x")
missing = set(bq) - set(rq)
extra = set(rq) - set(bq)
if missing: print("missing from run:", sorted(missing))
if extra: print("not in baseline:", sorted(extra))
