#!/usr/bin/env bash
# Shuffle-scratch poller (r15 — SCALE.md disk accounting, VERDICT r14
# item 2): samples the Spark local-dir scratch (blockmgr-* shuffle
# files + spark-* app dirs under /tmp) every INTERVAL seconds while a
# measured run is in flight and records the byte total per sample; the
# MAX line is the per-run peak scratch. Run alongside one isolated
# bench JVM; kill by PID when the run ends.
#
# Usage: scripts/scratch_poll.sh OUTFILE [INTERVAL=5]
set -u
OUT="$1"; INT="${2:-5}"
: > "$OUT"
while true; do
  B=$(du -sb /tmp/blockmgr-* /tmp/spark-* 2>/dev/null | awk '{s+=$1} END {print s+0}')
  echo "$(date +%s) $B" >> "$OUT"
  sleep "$INT"
done
