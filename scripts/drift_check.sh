#!/usr/bin/env bash
# Bench-drift CI wire (VERDICT r8 item 6): run the bench at the
# driver's config (sf0.1, local[32], median-of-3) and gate against the
# frozen baseline in BASELINE.md. Fails (exit 1) if the total exceeds
# 2x frozen or any query with a frozen time >= 0.3s exceeds 2x — the
# same letter the judge applies, caught on the builder's box first.
#
# Usage: scripts/drift_check.sh [report-file]
#   report-file (default DRIFT_REPORT.md): committed per-round record.
#
# Tiering (round 14 — the registry crossed 270 queries and a full run
# is ~2.5 min of pure bench time plus builds): set
#   SPARK_GRAFT_DRIFT_TIER=core   (or core<N>, e.g. core90)
# to gate only the N (default 90) most expensive queries by FROZEN
# force-mode cost — ~80% of the frozen total, the per-commit iteration
# wire. Membership is derived from BASELINE.md at run time
# (scripts/core_tier.py), so newly registered queries join the tier as
# soon as their frozen cost ranks. The FULL registry remains the
# per-round wrap-up gate (default when the variable is unset); the
# committed DRIFT_REPORT.md should come from a full run.
set -euo pipefail
cd "$(dirname "$0")/.."

TIER="${SPARK_GRAFT_DRIFT_TIER:-full}"
# a tiered run must not overwrite the committed full-run record
if [[ "$TIER" == core* ]]; then
  REPORT="${1:-/tmp/DRIFT_CORE.md}"
else
  REPORT="${1:-DRIFT_REPORT.md}"
fi
ONLY=""
SUBSET_FLAG=""
TIER_NOTE="full registry"
if [[ "$TIER" == core* ]]; then
  N="${TIER#core}"
  N="${N:-90}"
  ONLY="$(python3 scripts/core_tier.py "$N")"
  SUBSET_FLAG="--subset"
  TIER_NOTE="core tier: top $N by frozen force cost"
fi

# Force mode is the default since round 11: it times materialized
# plans (bit_xor(xxhash64(*)) over every output cell) so aggregate
# kernels can't hide behind count()-pruning; bench_compare auto-selects
# the matching frozen baseline. SPARK_GRAFT_BENCH_FORCE=0 reverts to
# default-mode timing against the default-mode baseline.
# NB: SPARK_GRAFT_ONLY must stay UNSET for a full run — Bench treats
# an empty-string filter as "match nothing", not "match all".
if [[ -n "$ONLY" ]]; then export SPARK_GRAFT_ONLY="$ONLY"; else unset SPARK_GRAFT_ONLY; fi
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_BENCH_FORCE="${SPARK_GRAFT_BENCH_FORCE:-1}" \
  sbt -batch "runMain graft.Bench" >/tmp/drift_bench.log 2>&1 || {
    echo "bench run failed; tail of log:"; tail -20 /tmp/drift_bench.log
    exit 1
  }

# Bench writes BENCH_DETAIL.json cwd-relative (the repo root). The
# committed copy is the FULL-run drift artifact — a tiered run must not
# leave a subset JSON in its place, so park the tier detail in /tmp and
# restore the committed record.
DETAIL="BENCH_DETAIL.json"
EXPECT_FLAG=""
if [[ "$TIER" == core* ]]; then
  DETAIL="/tmp/BENCH_CORE.json"
  mv BENCH_DETAIL.json "$DETAIL"
  git checkout -- BENCH_DETAIL.json
  # gate on the names the tier was ASKED to run, not what survived
  EXPECT_FLAG="--expect=$ONLY"
fi

{
  echo "# Drift report — $(date -u +%Y-%m-%dT%H:%MZ)"
  echo
  echo "\`scripts/drift_check.sh\`: bench ($TIER_NOTE; sf0.1, local[32],"
  echo "median-of-3) on the builder's box vs the frozen BASELINE.md JSON."
  echo
  echo '```'
  python3 scripts/bench_compare.py "$DETAIL" --fail $SUBSET_FLAG $EXPECT_FLAG
  echo '```'
} | tee "$REPORT"
