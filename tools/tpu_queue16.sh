#!/bin/bash
# Round-3 TPU queue, final window: PPGN 5-cycles retry at a gentler lr
# (the 2e-3 run collapsed to a degenerate fixed point at ep 71), then a
# full bench.py pass that doubles as a compile-cache warmup for the
# driver's end-of-round bench.
cd /root/repo
mkdir -p results results_archive

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 10:20:00' +%s)}"
ST=/tmp/tpu_queue16.status

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

run_if 2700 count_cycle_t2_ppgn_lr5e4 results/count_cycle_t2_ppgn_lr5e4 \
  python -u run_graphcount.py --model PPGN_eff --target 2 --h 2 \
    --batch_size 128 --lr 5e-4 --lr_decay_factor 0.7 --patience 25 \
    --grad_clip 1.0 --epochs 700 --num_graphs 5000 --num_workers 2 \
    --res_dir results/count_cycle_t2_ppgn_lr5e4
run_if 1800 bench_warmup "" python -u bench.py
echo TPU_QUEUE16_ALL_DONE >> "$ST"
