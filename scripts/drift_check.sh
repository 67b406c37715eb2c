#!/usr/bin/env bash
# Bench-drift CI wire (VERDICT r8 item 6): run the full bench at the
# driver's config (sf0.1, local[32], median-of-3) and gate against the
# frozen baseline in BASELINE.md. Fails (exit 1) if the total exceeds
# 2x frozen or any query with a frozen time >= 0.3s exceeds 2x — the
# same letter the judge applies, caught on the builder's box first.
#
# Usage: scripts/drift_check.sh [report-file]
#   report-file (default DRIFT_REPORT.md): committed per-round record.
set -euo pipefail
cd "$(dirname "$0")/.."
REPORT="${1:-DRIFT_REPORT.md}"

# Force mode is the default since round 11: it times materialized
# plans (bit_xor(xxhash64(*)) over every output cell) so aggregate
# kernels can't hide behind count()-pruning; bench_compare auto-selects
# the matching frozen baseline. SPARK_GRAFT_BENCH_FORCE=0 reverts to
# default-mode timing against the default-mode baseline.
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
SPARK_GRAFT_BENCH_FORCE="${SPARK_GRAFT_BENCH_FORCE:-1}" \
  sbt -batch "runMain graft.Bench" >/tmp/drift_bench.log 2>&1 || {
    echo "bench run failed; tail of log:"; tail -20 /tmp/drift_bench.log
    exit 1
  }

{
  echo "# Drift report — $(date -u +%Y-%m-%dT%H:%MZ)"
  echo
  echo "\`scripts/drift_check.sh\`: full bench (sf0.1, local[32],"
  echo "median-of-3) on the builder's box vs the frozen BASELINE.md JSON."
  echo
  echo '```'
  python3 scripts/bench_compare.py BENCH_DETAIL.json --fail
  echo '```'
} | tee "$REPORT"
