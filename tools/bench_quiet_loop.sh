#!/bin/bash
# Quiet-window curated-bench retry loop (round-14 verdict task 1).
#
# PREFERRED acceptance path: one contiguous quiet run. When no contiguous
# quiet window exists on the host (three sessions of r13/r14 evidence),
# use tools/bench_composite.sh instead — the per-query quiet-composite
# fallback (r15 verdict task 1), which gates each SAMPLE on adjacent calib
# slices and retries per-query across the session.
#
# Waits for the host to quiet (1-min loadavg < 0.7, 5-min < 1.5), runs the
# curated bench into a STAGING root (never clobbering the committed
# BENCH_local.json), and applies the standing acceptance rule:
#   in-run calib spread (max/min of calib.series) < 1.4  AND  raw total < 100 s.
# Every attempt's full artifact is retained under $STAGE/attempts/ for the
# BENCH_ATTEMPTS ledger. On acceptance the loop immediately regenerates
# GROWTH_SPAN.json in the SAME quiet window (staged too), then exits 0.
set -u
STAGE=${STAGE:-/tmp/bench_stage_r14}
mkdir -p "$STAGE/attempts"
# seed the staged root with the committed artifact: Bench.priorMedians
# reads $GRAFT_REPO_ROOT/BENCH_local.json for the sustained-stall priors
cp /root/repo/BENCH_local.json "$STAGE/BENCH_local.json"
i=0
while true; do
  read -r L1 L5 _ < /proc/loadavg
  if ! python3 -c "exit(0 if float('$L1')<0.7 and float('$L5')<1.5 else 1)"; then
    sleep 45; continue
  fi
  i=$((i+1))
  echo "[loop] attempt $i starting at $(date +%H:%M:%S), load=$L1 $L5"
  (cd /root/repo && GRAFT_BENCH_CURATED=1 GRAFT_REPO_ROOT="$STAGE" \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    timeout 3600 sbt -batch "runMain graft.Bench" \
    > "$STAGE/attempts/run_$i.log" 2>&1)
  if [ ! -s "$STAGE/BENCH_local.json" ]; then
    echo "[loop] attempt $i produced no artifact"; sleep 60; continue
  fi
  cp "$STAGE/BENCH_local.json" "$STAGE/attempts/attempt_$i.json"
  verdict=$(python3 - "$STAGE/attempts/attempt_$i.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
s = (d.get('calib') or {}).get('series') or []
spread = (max(s) / min(s)) if s else 99.0
ok = spread < 1.4 and d.get('value', 1e9) < 100.0
print(('ACCEPT' if ok else 'REJECT')
      + f" total={d.get('value')} min={d.get('total_min')} spread={round(spread, 3)}"
      + f" load={d.get('loadavg_start')}->{d.get('loadavg_end')} peak={d.get('load_peak')}")
EOF
)
  echo "[loop] attempt $i: $verdict"
  case "$verdict" in
    ACCEPT*)
      cp "$STAGE/attempts/attempt_$i.json" "$STAGE/ACCEPTED.json"
      echo "[loop] accepted on attempt $i — regenerating GROWTH_SPAN in the same window"
      (cd /root/repo && GRAFT_REPO_ROOT="$STAGE" SPARK_GRAFT_CPUS=32 \
        timeout 5400 sbt -batch "runMain graft.tools.GrowthSpan" \
        > "$STAGE/growthspan.log" 2>&1)
      read -r GL1 GL5 _ < /proc/loadavg
      echo "[loop] growth span done, load now $GL1 $GL5"
      exit 0
      ;;
  esac
  # the attempt overwrote the staged priors with itself — restore
  cp /root/repo/BENCH_local.json "$STAGE/BENCH_local.json"
  sleep 90
done
