#!/usr/bin/env bash
# Healthy-window bench harness (round 11, VERDICT r10 item 2).
#
# This VM class shows multi-second CPU-steal windows lasting tens of
# minutes; a bench run started inside one prices the stall, not the
# code. Probe first with graft.ProbeOverhead and only run the bench
# (and optionally FloorRecord) when the host reads healthy:
#   healthy bands (BASELINE.md): df_range1 75-95 ms, rdd_1task 11-25 ms
#   gate: df_range1 <= ${GATE_DF_MS:-110} ms
#
# Usage:  tools/healthy_bench.sh [bench|floors|both]
# Exit:   0 = ran (output in target/), 3 = host degraded, try later.
set -u
cd "$(dirname "$0")/.."
MODE="${1:-bench}"
GATE_DF_MS="${GATE_DF_MS:-110}"

PROBE=$(sbt "runMain graft.ProbeOverhead" 2>&1 | grep "^PROBE")
echo "$PROBE"
DF_MS=$(echo "$PROBE" | sed -n 's/.*df_range1_ms=\([0-9.]*\).*/\1/p')
if [ -z "$DF_MS" ]; then echo "probe failed"; exit 2; fi
OK=$(python3 -c "print(1 if float('$DF_MS') <= float('$GATE_DF_MS') else 0)")
if [ "$OK" != "1" ]; then
  echo "DEGRADED: df_range1 ${DF_MS} ms > gate ${GATE_DF_MS} ms — retry later"
  exit 3
fi
echo "HEALTHY: df_range1 ${DF_MS} ms <= ${GATE_DF_MS} ms"

if [ "$MODE" = "floors" ] || [ "$MODE" = "both" ]; then
  sbt "runMain graft.FloorRecord" 2>&1 | tail -3
fi
if [ "$MODE" = "bench" ] || [ "$MODE" = "both" ]; then
  sbt "runMain graft.Bench" 2>&1 | grep '"metric"' | tee target/healthy_bench.json
fi
