#!/bin/bash
# Round-3 TPU queue, coda (chained on tools/tpu_queue11.sh): final
# bench.py with the flipped GPS/PPGN configs, and an I2GNN step profile
# to back the roofline note on its bench row.
cd /root/repo
mkdir -p results results_archive

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 10:20:00' +%s)}"
ST=/tmp/tpu_queue12.status

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

run_if 2100 bench_r3_final python -u bench.py
run_if 1200 profile_i2gnn python -u tools/profile_step.py /tmp/prof_i2 i2gnn
echo TPU_QUEUE12_ALL_DONE >> "$ST"
