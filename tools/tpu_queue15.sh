#!/bin/bash
# Round-3 TPU queue, last breadth row (chained on tpu_queue13.sh):
# PPGN_eff on count_cycle t2 (5-cycles) with the proven
# round-3 recipe — 5-cycles are OUTSIDE the flagship encoding's
# provable power but inside PPGN-class expressivity; at 5k graphs the
# flagship sits at 0.0195 normalized.
cd /root/repo
mkdir -p results results_archive

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 10:20:00' +%s)}"
ST=/tmp/tpu_queue15.status

archive() {
  local name="$1" rd="$2"
  mkdir -p "results_archive/$name"
  [ -f "results/$name.out" ] && gzip -c "results/$name.out" \
      > "results_archive/$name/stdout.txt.gz"
  if [ -n "$rd" ] && [ -d "$rd" ]; then
    [ -f "$rd/log.txt" ] && gzip -c "$rd/log.txt" \
        > "results_archive/$name/log.txt.gz"
    for f in config.json cmd_input.txt; do
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

run_if 3600 count_cycle_t2_ppgn_clip results/count_cycle_t2_ppgn_clip \
  python -u run_graphcount.py --model PPGN_eff \
    --target 2 --h 2 --batch_size 128 --lr 2e-3 --lr_decay_factor 0.7 \
    --patience 20 --grad_clip 1.0 --epochs 800 --num_graphs 5000 \
    --num_workers 2 --res_dir results/count_cycle_t2_ppgn_clip
echo TPU_QUEUE14_ALL_DONE >> "$ST"
