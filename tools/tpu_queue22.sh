#!/bin/bash
# Round-4 TPU queue #22 (chained on queue 21): once the quality runs
# finish, refresh the official bench with the fusion-boundary HBM
# fields (bench_r4b) and archive per-model "where do the bytes go"
# reports (tools/hbm_report.py) — the evidence base for the BASELINE.md
# roofline verdicts. Warm compile cache => ~25 min total.
cd /root/repo
mkdir -p results results_archive

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 19:30:00' +%s)}"
ST=/tmp/tpu_queue22.status

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
}

run_if 2700 bench_r4b python -u bench.py
run_if 600 hbm_flagship python -u tools/hbm_report.py flagship 20
run_if 600 hbm_i2gnn python -u tools/hbm_report.py i2gnn 20
run_if 600 hbm_ngnn python -u tools/hbm_report.py ngnn 20
run_if 600 hbm_ppgn python -u tools/hbm_report.py ppgn 20
echo TPU_QUEUE22_ALL_DONE >> "$ST"
