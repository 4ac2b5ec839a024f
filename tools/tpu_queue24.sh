#!/bin/bash
# Round-4 TPU queue #24 — re-run of queue 23's bench + HBM-report jobs,
# which all died with rc=127: queue 23 passed no `rd` positional, so
# run_if consumed "python" as rd and executed `timeout N -u bench.py`.
# Chained on queue 23's real PID (pidfile).
cd /root/repo
echo $$ > /tmp/q24.pid
mkdir -p results results_archive

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 19:25:00' +%s)}"
ST=/tmp/tpu_queue24.status

archive() {
  local name="$1"
  mkdir -p "results_archive/$name"
  [ -f "results/$name.out" ] && gzip -c "results/$name.out" \
      > "results_archive/$name/stdout.txt.gz"
}

run_if() {
  local est="$1" name="$2"; shift 2
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt "$est" ]; then
    echo "SKIP $name (need ${est}s, have ${rem}s)" >> "$ST"
    return
  fi
  echo "START $name $(date -u +%H:%M:%S)" >> "$ST"
  timeout "$est" "$@" > "results/$name.out" 2>&1
  echo "DONE $name rc=$? $(date -u +%H:%M:%S)" >> "$ST"
  archive "$name"
  sleep 90
}

run_if 2700 bench_r4b python -u bench.py
run_if 600 hbm_flagship python -u tools/hbm_report.py flagship 20
run_if 600 hbm_i2gnn python -u tools/hbm_report.py i2gnn 20
run_if 600 hbm_ngnn python -u tools/hbm_report.py ngnn 20
run_if 600 hbm_ppgn python -u tools/hbm_report.py ppgn 20
echo TPU_QUEUE24_ALL_DONE >> "$ST"
