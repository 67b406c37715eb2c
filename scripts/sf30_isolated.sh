#!/usr/bin/env bash
# Dedicated-JVM sf30 pass (round-13 item 1): each query runs ALONE in
# its own fresh sbt-forked JVM — no chunk sharing, so an OOM or budget
# blowout is attributable to THE query, not to chunk-suffix poisoning
# (the round-12 failure mode: one mid-chunk driver OOM killed SparkEnv
# and failed the rest of the chunk).
#
# Protocol: force mode, iters=1, SPARK_GRAFT_WARM_SPREAD=0 (the
# single-query JVM warms its own plan via Bench's sacrificial untimed
# re-run; the 10-query spread costs minutes/JVM at sf30 and adds
# nothing to a tens-of-seconds measurement), 24g driver heap (the
# established sf30 harness heap), TWO runs per query with the per-query
# MIN — the same position-variance control as the fwd/rev protocol,
# expressed as run-repetition since a one-query JVM has no "position".
#
# Usage: scripts/sf30_isolated.sh q_a q_b ... [out defaults to
# /tmp/sf30_isolated]. Writes per-run logs + summary.txt there and
# restores the committed BENCH_DETAIL.json afterwards.
set -uo pipefail
cd "$(dirname "$0")/.."

OUT="${SF30_OUT:-/tmp/sf30_isolated}"
SF="${SF30_DIR:-scaledata/sf30}"
RUNS="${SF30_RUNS:-2}"
mkdir -p "$OUT"

for q in "$@"; do
  for run in $(seq 1 "$RUNS"); do
    log="$OUT/${q}_r${run}.log"
    start=$(date +%s)
    SPARK_GRAFT_ONLY="$q" \
    SPARK_GRAFT_BENCH_ITERS=1 \
    SPARK_GRAFT_BENCH_FORCE=1 \
    SPARK_GRAFT_WARM_SPREAD=0 \
    SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_SF_DIR="$SF" \
    SPARK_DRIVER_MEM="${SF30_MEM:-24g}" \
      timeout 2400 sbt -batch "runMain graft.Bench" >"$log" 2>&1
    rc=$?
    wall=$(( $(date +%s) - start ))
    line=$(grep -o '{"metric".*' "$log" | tail -1)
    echo "$q run=$run exit=$rc wall=${wall}s $line" >> "$OUT/summary.txt"
    echo "$q run=$run exit=$rc wall=${wall}s"
  done
done
git checkout -- BENCH_DETAIL.json 2>/dev/null || true
echo "done; summary at $OUT/summary.txt"
