#!/usr/bin/env python3
"""Print the comma-joined names of the N most expensive registered
queries by FROZEN cost (BASELINE.md) — the "core tier" used by
scripts/drift_check.sh for fast per-commit drift iteration. The
membership is derived from the frozen JSON at call time, so freshly
registered queries join the tier automatically once their frozen cost
ranks; nothing is ever removed from the registry or the full per-round
gate.

The tier is ranked against the SAME baseline the drift gate will
compare against: force-mode frozen costs by default, default-mode when
SPARK_GRAFT_BENCH_FORCE=0 is exported (or --default is passed) — so
"top N by cost" and the yardstick always come from one baseline.
Usage: core_tier.py [N=90] [--default|--force]
"""
import json, os, re, sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
n = int(args[0]) if args else 90
force = os.environ.get("SPARK_GRAFT_BENCH_FORCE", "1") != "0"
if "--force" in sys.argv[1:]:
    force = True
if "--default" in sys.argv[1:]:
    force = False
section = ("## Frozen force-mode bench JSON" if force
           else "## Frozen bench JSON")
md = open("BASELINE.md").read()
m = re.search(re.escape(section) + r".*?```json\n(.*?)\n```", md, re.S)
if m is None:
    sys.exit(f"no baseline section {section!r} in BASELINE.md")
q = json.loads(m.group(1))["queries"]
top = sorted(q.items(), key=lambda kv: -kv[1])[:n]
print(",".join(name for name, _ in top))
