#!/bin/bash
# Round-3 TPU queue, phase 2 (replaces tpu_queue8.sh; chained on
# tools/tpu_queue7.sh's bash). Order = VERDICT priority:
#   1. PPGN_eff count_cycle t0 retune, take 2 — the first attempt (lr
#      2e-3, no clipping) was on a strong trajectory (val 0.065 raw at
#      ep 34 vs the r02 run's 0.28 at ep 800) before a single-epoch
#      gradient explosion poisoned Adam; rerun with --grad_clip 1.0.
#   2. GPS layout A/B (flat vs uniform+dedup) — decides bench.py's GPS
#      section.
#   3. Full bench.py — committed BENCH numbers for BASELINE.md.
#   4. GPS quality row on peptides-struct (optional tail).
cd /root/repo
mkdir -p results results_archive

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 10:20:00' +%s)}"
ST=/tmp/tpu_queue9.status

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

run_if 5400 count_cycle_t0_ppgn_clip results/count_cycle_t0_ppgn_clip \
  python -u run_graphcount.py --model PPGN_eff --target 0 --h 3 \
    --batch_size 128 --lr 2e-3 --lr_decay_factor 0.7 --patience 20 \
    --grad_clip 1.0 --epochs 1500 --num_graphs 5000 --num_workers 2 \
    --res_dir results/count_cycle_t0_ppgn_clip
run_if 1500 gps_layout_ab "" python -u /tmp/bench_gps_ab.py
run_if 1800 bench_r3_full "" python -u bench.py
run_if 3000 gps_pepstruct_canonical results/gps_pepstruct_canonical \
  python -u run_gps.py --cfg configs/gps/peptides-struct-GPS.yaml \
    out_dir results/gps_pepstruct_canonical
echo TPU_QUEUE9_ALL_DONE >> "$ST"
