#!/bin/bash
# Round-3 TPU queue, phase 2 (chained on tools/tpu_queue7.sh's bash):
#   1. GPS layout A/B (flat vs uniform+dedup) — decides whether
#      bench.py's GPS section flips to the fast layout.
#   2. Full bench.py run — committed BENCH numbers for BASELINE.md
#      (the driver reruns bench at round end either way).
#   3. GPS quality row on peptides-struct (VERDICT "weak" #8).
cd /root/repo
mkdir -p results results_archive

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 10:20:00' +%s)}"
ST=/tmp/tpu_queue8.status

archive() {
  local name="$1" rd="$2"
  mkdir -p "results_archive/$name"
  [ -f "results/$name.out" ] && gzip -c "results/$name.out" \
      > "results_archive/$name/stdout.txt.gz"
  if [ -n "$rd" ] && [ -d "$rd" ]; then
    [ -f "$rd/log.txt" ] && gzip -c "$rd/log.txt" \
        > "results_archive/$name/log.txt.gz"
    for f in config.json cmd_input.txt agg.json config.yaml; do
      [ -f "$rd/$f" ] && cp "$rd/$f" "results_archive/$name/"
    done
  fi
}

run_if() {
  local est="$1" name="$2" rd="$3"; shift 3
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt "$est" ]; then
    echo "SKIP $name (need ${est}s, have ${rem}s)" >> "$ST"
    return
  fi
  echo "START $name $(date -u +%H:%M:%S)" >> "$ST"
  timeout "$est" "$@" > "results/$name.out" 2>&1
  echo "DONE $name rc=$? $(date -u +%H:%M:%S)" >> "$ST"
  archive "$name" "$rd"
}

run_if 1500 gps_layout_ab "" python -u /tmp/bench_gps_ab.py
run_if 1800 bench_r3_full "" python -u bench.py
run_if 3000 gps_pepstruct_canonical results/gps_pepstruct_canonical \
  python -u run_gps.py --cfg configs/gps/peptides-struct-GPS.yaml \
    out_dir results/gps_pepstruct_canonical
echo TPU_QUEUE8_ALL_DONE >> "$ST"
