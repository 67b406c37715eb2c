#!/usr/bin/env python3
"""Compare a BENCH_DETAIL.json run against the frozen baseline JSON
embedded in BASELINE.md. Prints per-query ratios sorted worst-first and
summary stats. Usage: bench_compare.py [BENCH_DETAIL.json] [--fail]

--fail: exit 1 if the run total exceeds 2x frozen OR any query slower
than 0.3s frozen exceeds 2x its frozen time (sub-0.3s queries jitter up
to +-2x run-to-run per the BASELINE.md variance protocol, so they are
reported but don't gate) OR any >2x query — including sub-0.3s ones —
regressed by more than 0.5s ABSOLUTE (the jitter floor must not become
a hole: a 0.05s query that genuinely blows up to 0.8s is a real
regression even though its frozen denominator sits in the jitter band;
timer noise on those entries stays within ~0.1s absolute). This is the
CI-style drift wire: run it after any plan-touching change so drift is
caught on the builder's own run, before the driver measures it.

--subset: the run deliberately covers only part of the registry (the
drift_check.sh core tier): compare the total against the SUM of the
frozen entries for the queries actually run, and don't treat the rest
of the baseline as "missing".

--expect=q1,q2,...: the names the subset run was ASKED to cover.
Without this, subset mode rebuilds the yardstick from the queries that
actually ran, so a tier query that crashed or was skipped silently
vanishes from both sides and the missing-query gate is vacuous; with
it, any expected name absent from the run is a hard gate failure."""
import json, re, statistics, sys

args = [a for a in sys.argv[1:] if not a.startswith("--")]
expect = set()
for a in sys.argv[1:]:
    if a.startswith("--expect="):
        expect = {q for q in a[len("--expect="):].split(",") if q}
fail_mode = "--fail" in sys.argv[1:]
subset_mode = "--subset" in sys.argv[1:]
detail = args[0] if args else "BENCH_DETAIL.json"
run = json.load(open(detail))
md = open("BASELINE.md").read()
# Two frozen baselines live in BASELINE.md: the force-mode JSON
# ("Frozen force-mode bench JSON", the primary drift gate since round
# 11 — it prices materialized plans, free of the ~25% count-pruning
# artifact) and the default-mode JSON ("Frozen bench JSON", kept for
# driver-run comparisons). Auto-select by the run's own mode (the
# "force":true tag Bench emits); --force/--default override.
want_force = run.get("force", False)
if "--force" in sys.argv[1:]:
    want_force = True
if "--default" in sys.argv[1:]:
    want_force = False
section = ("## Frozen force-mode bench JSON" if want_force
           else "## Frozen bench JSON")
m = re.search(re.escape(section) + r".*?```json\n(.*?)\n```", md, re.S)
if m is None:
    sys.exit(f"no baseline section {section!r} in BASELINE.md")
base = json.loads(m.group(1))
print(f"baseline: {section[3:]}")

rq, bq = run["queries"], base["queries"]
if subset_mode:
    # tiered run: the frozen yardstick is the sum over the queries run
    bq = {q: t for q, t in bq.items() if q in rq}
    base = dict(base, value=round(sum(bq.values()), 3))
    print(f"subset mode: frozen yardstick = sum over the {len(bq)} run queries")
common = sorted(set(rq) & set(bq))
ratios = {q: rq[q] / bq[q] for q in common if bq[q] > 0}
print(f"run total {run['value']:.2f}s over {len(rq)} vs frozen {base['value']:.2f}s over {len(bq)}")
print(f"common {len(common)}, median ratio {statistics.median(ratios.values()):.3f}")
over2 = {q: r for q, r in ratios.items() if r > 2.0}
print(f">2x: {len(over2)}")
for q, r in sorted(ratios.items(), key=lambda kv: -kv[1])[:15]:
    print(f"  {q:32s} {rq[q]:7.3f} vs {bq[q]:7.3f} = {r:5.2f}x")
missing = set(bq) - set(rq)
if expect:
    # a subset run is judged against what it was ASKED to run, not
    # what survived — a crashed tier query must fail the gate
    missing |= expect - set(rq)
extra = set(rq) - set(bq)
if missing: print("missing from run:", sorted(missing))
if extra: print("not in baseline:", sorted(extra))

if fail_mode:
    total_ratio = run["value"] / base["value"]
    # Ratio gate with a denominator floor (frozen >= 0.3s), PLUS an
    # absolute-delta guard so the floor can't hide a real small-query
    # blow-up: a >2x entry below the floor still gates when it
    # regressed by > 0.5s of wall clock.
    gating = {q: r for q, r in over2.items()
              if bq[q] >= 0.3 or rq[q] - bq[q] > 0.5}
    bad = []
    if total_ratio > 2.0:
        bad.append(f"total {total_ratio:.2f}x frozen")
    if gating:
        bad.append("gating >2x queries (frozen >=0.3s or delta >0.5s): " +
                   ", ".join(f"{q}={r:.2f}x (+{rq[q] - bq[q]:.2f}s)"
                             for q, r in sorted(gating.items())))
    if missing:
        bad.append(f"{len(missing)} baseline queries missing from the run")
    if bad:
        print("DRIFT GATE FAILED: " + "; ".join(bad))
        sys.exit(1)
    print(f"DRIFT GATE OK: total {total_ratio:.2f}x, "
          f"{len(over2)} jitter-band >2x (all frozen <0.3s and delta <=0.5s)")
