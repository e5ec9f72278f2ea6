#!/bin/bash
# Wait for a healthy host window (first-touch-fault canary < threshold),
# then land ONE record per window, alternating bench.py and
# scaling_bench.py — each takes 10-25 min and this VM's healthy windows
# can be shorter than both back-to-back.  Loops forever, numbering
# successive window records (bench_r5_window2.json, window3, ...) so
# reruns after code changes land fresh artifacts; holds
# /tmp/sparc_bench.lock while measuring so other workloads can yield.
set -u
cd /root/repo
THRESH=${CANARY_THRESH:-4.0}
LOG=/tmp/healthy_bench.log
LOCK=/tmp/sparc_bench.lock
WIN=${WINDOW_START:-2}
SWIN=${SCALING_WINDOW_START:-1}
# capture schedule: consume PLAN left-to-right (one entry per landed
# capture), then fall back to strict alternation.  Lets a session that
# still needs 3 consecutive clean scaling records (the vs-ceiling
# agreement claim) weight the plan toward scaling without editing the
# loop body.
PLAN=${PLAN:-}
NEXT=bench
advance() {
  if [ -n "$PLAN" ]; then
    NEXT=${PLAN%% *}
    [ "$PLAN" = "${PLAN#* }" ] && PLAN="" || PLAN=${PLAN#* }
  else
    [ "$1" = bench ] && NEXT=scaling || NEXT=bench
  fi
}
advance scaling
START_TS=$(date +%s)
echo "watcher start $(date) thresh=$THRESH" >> "$LOG"

# Threshold decay: if the host never qualifies, relax the gate +2.0 per
# hour without a capture (cap 20) and SAY SO in the log — a record with
# honest canary context beats no record (the artifact embeds
# host_canary_s either way).  Resets to the base threshold on capture.
BASE_THRESH=$THRESH
relax() {
  local hrs=$(( ($(date +%s) - START_TS) / 3600 ))
  THRESH=$(python3 -c "print(min($BASE_THRESH + 2.0*$hrs, 20.0))")
}

canary() {
  timeout 300 python3 -c "
import time, numpy as np
t0=time.perf_counter(); np.random.default_rng(1).integers(0,255,100_000_000).astype(np.uint8)
print(round(time.perf_counter()-t0,1))" 2>/dev/null | tail -1
}

while true; do
  while [ -e "$LOCK" ]; do sleep 30; done
  relax
  c1=$(canary); c1=${c1:-999}
  echo "canary $c1 thresh=$THRESH $(date +%T)" >> "$LOG"
  if python3 -c "exit(0 if float('$c1') < $THRESH else 1)"; then
    sleep 20
    c2=$(canary); c2=${c2:-999}
    echo "canary2 $c2 $(date +%T)" >> "$LOG"
    if python3 -c "exit(0 if float('$c2') < $THRESH else 1)"; then
      # acquire the lock ATOMICALLY right before measuring: mkdir fails
      # if another process holds it, closing the TOCTOU race that put a
      # concurrent pytest inside the window-4 capture (a bare -e test +
      # touch still let two processes both pass the test)
      if ! mkdir "$LOCK" 2>/dev/null; then continue; fi
      if [ "$NEXT" = bench ]; then
        echo "healthy window $WIN - running bench $(date +%T)" >> "$LOG"
        rm -f BENCH_RESULT.json
        timeout 2400 python bench.py > /tmp/bench_healthy.out 2>&1
        rc=$?
        echo "bench rc=$rc $(date +%T)" >> "$LOG"
        # bench.py writes the full record to BENCH_RESULT.json (stdout can
        # be truncated by wrappers); fall back to the stdout grep
        if [ -s BENCH_RESULT.json ]; then
          cp BENCH_RESULT.json /tmp/bench_healthy.json
        else
          grep -o '{"metric".*' /tmp/bench_healthy.out | tail -1 > /tmp/bench_healthy.json
        fi
        if [ -s /tmp/bench_healthy.json ] && [ $rc -eq 0 ]; then
          cp /tmp/bench_healthy.json "BENCH/bench_r5_window${WIN}.json"
          echo "bench recorded window${WIN} $(date +%T)" >> "$LOG"
          WIN=$((WIN + 1))
          advance bench
        fi
      else
        echo "healthy window - running scaling $(date +%T)" >> "$LOG"
        SPARC_SCALING_OUT=/tmp/scaling_capture.json \
          timeout 3000 python scaling_bench.py > /tmp/scaling_healthy.out 2>&1
        src=$?
        echo "scaling rc=$src $(date +%T)" >> "$LOG"
        if [ $src -eq 0 ] && [ -s /tmp/scaling_capture.json ]; then
          # promote to the official scaling.json ONLY when every pair's
          # embedded canaries stayed clean — a storm tail on one leg
          # (window-c: end canary 10.5) must not clobber a clean record
          if python3 -c "
import json, sys
recs = json.load(open('/tmp/scaling_capture.json'))
sys.exit(0 if all(max(r['host_canary_s']) < 8.0 for r in recs) else 1)"; then
            cp /tmp/scaling_capture.json BENCH/scaling.json
            # numbered so consecutive clean records accumulate — the
            # vs-ceiling claim needs 3 consecutive records agreeing
            cp /tmp/scaling_capture.json "BENCH/scaling_r5_window${SWIN}.json"
            echo "scaling recorded (clean) window${SWIN} $(date +%T)" >> "$LOG"
            SWIN=$((SWIN + 1))
          else
            cp /tmp/scaling_capture.json \
              "BENCH/scaling_r5_storm_$(date +%H%M).json"
            echo "scaling kept as storm record $(date +%T)" >> "$LOG"
          fi
          advance scaling
        fi
      fi
      rmdir "$LOCK" 2>/dev/null || rm -rf "$LOCK"
      sleep 180
    fi
  fi
  sleep 90
done
