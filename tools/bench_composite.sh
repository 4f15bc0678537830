#!/bin/bash
# Quiet-composite curated bench (round-15 verdict task 1).
#
# Fallback acceptance shape for a host where no contiguous ~13-minute quiet
# window exists: Bench runs in GRAFT_BENCH_COMPOSITE=1 mode, bracketing every
# timed sample with two parallel calib slices and retrying queries
# round-robin across the whole session until each holds 3 samples whose BOTH
# adjacent slices are <= 1.3x the committed artifact's calib floor. The
# contiguous rule (tools/bench_quiet_loop.sh) remains the preferred path; a
# fully quiet host makes this mode degenerate to the old three-pass shape.
#
# Acceptance: mode == quiet_composite AND composite.unquiet empty AND
# total < 100 s. Every sample + adjacent probes is disclosed in the artifact
# (composite_per_query), so the gate is recheckable after the fact.
#
# Memory-bandwidth baseline (r15 verdict task 7): the accepted artifact's
# calib.mem_s is the committed quiet floor of the 512 MiB streaming probe
# (Bench.memSlice) at 32 threads. It is disclosed per sample (pre_mem /
# post_mem brackets in composite_per_query) as ATTRIBUTION evidence for
# the LLC/DRAM-steal co-tenant signature (CPU probes quiet, queries
# uniformly inflated); a future round may GATE on it — mem bracket <=
# 1.3x the committed mem_s floor — now that a committed baseline exists.
#
# Runs via plain `java` against a SNAPSHOT of the compiled classes so the
# repo's sbt build stays free for concurrent work and later commits can't
# mutate the running bench.
set -u
STAGE=${STAGE:-/tmp/bench_composite_r15}
REPO=${REPO:-/root/repo}
BUDGET=${BUDGET:-10800}
mkdir -p "$STAGE"
# seed the staged root with the committed artifact: it is BOTH the
# sustained-stall prior source and the quiet-gate floor source
cp "$REPO/BENCH_local.json" "$STAGE/BENCH_local.json"
# CORRECTNESS_r*.json drives the common-subset headline; stage the newest
latest_corr=$(ls "$REPO"/CORRECTNESS_r*.json | sort | tail -1)
cp "$latest_corr" "$STAGE/"
rm -rf "$STAGE/classes"
cp -r "$REPO/target/scala-2.13/classes" "$STAGE/classes"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
echo "[composite] starting, budget ${BUDGET}s, stage $STAGE, load $(cut -d' ' -f1-3 /proc/loadavg)"
(cd "$STAGE" && \
GRAFT_BENCH_CURATED=1 GRAFT_BENCH_COMPOSITE=1 GRAFT_REPO_ROOT="$STAGE" \
GRAFT_BENCH_BUDGET_S="$BUDGET" \
GRAFT_COMPOSITE_MAX_ATTEMPTS="${GRAFT_COMPOSITE_MAX_ATTEMPTS:-40}" \
SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
SPARK_GRAFT_CPUS=32 \
java $ADD_OPENS -Xmx16g \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$STAGE/classes:/opt/spark/jars/*" graft.Bench \
  > "$STAGE/run.log" 2>&1)
rc=$?
echo "[composite] bench exited rc=$rc"
if [ ! -s "$STAGE/BENCH_local.json" ]; then
  echo "[composite] NO ARTIFACT"; exit 1
fi
python3 - "$STAGE/BENCH_local.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
comp = d.get('composite') or {}
unquiet = comp.get('unquiet')
ok = (d.get('mode') == 'quiet_composite' and unquiet == []
      and d.get('value', 1e9) < 100.0)
print(('ACCEPT' if ok else 'REJECT')
      + f" total={d.get('value')} min={d.get('total_min')}"
      + f" unquiet={unquiet} prior_not_reached={comp.get('prior_not_reached')}"
      + f" rounds={comp.get('rounds')}"
      + f" hot_skips={comp.get('hot_skips')} elapsed={comp.get('elapsed_s')}"
      + f" gate={comp.get('gate_s')} failed={d.get('failed')}")
sys.exit(0 if ok else 3)
EOF
exit $?
