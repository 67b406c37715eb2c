#!/usr/bin/env python3
"""Print the comma-joined names of the N most expensive registered
queries by FROZEN force-mode cost (BASELINE.md) — the "core tier" used
by scripts/drift_check.sh for fast per-commit drift iteration. The
membership is derived from the frozen JSON at call time, so freshly
registered queries join the tier automatically once their frozen cost
ranks; nothing is ever removed from the registry or the full per-round
gate. Usage: core_tier.py [N=90]
"""
import json, re, sys

n = int(sys.argv[1]) if len(sys.argv) > 1 else 90
md = open("BASELINE.md").read()
m = re.search(r"## Frozen force-mode bench JSON.*?```json\n(.*?)\n```",
              md, re.S)
if m is None:
    sys.exit("no frozen force-mode JSON in BASELINE.md")
q = json.loads(m.group(1))["queries"]
top = sorted(q.items(), key=lambda kv: -kv[1])[:n]
print(",".join(name for name, _ in top))
