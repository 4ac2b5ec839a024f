#!/bin/bash
# Round-4 TPU queue #20 (chained on queue 19's bash PID): opportunistic
# fills if queue 19 finishes before its deadline. The GPS zoo-tail
# quality rows moved to tools/cpu_queue_gps.sh (they don't need the
# chip); what remains here is chip-bound:
#  1. cgra_t4_ppgn_n10k — extend the zoo-beats-flagship t4 result with
#                   2x data (round-4 best 0.10804 @5k)
#  2. i2gnn blocked profile — per-fusion HBM breakdown of the blocked
#                   copy layout (tools/profile_step.py --model i2gnn)
cd /root/repo
mkdir -p results results_archive

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 19:05:00' +%s)}"
ST=/tmp/tpu_queue20.status

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

run_if 3600 cgra_t4_ppgn_n10k results/cgra_t4_ppgn_n10k \
  python -u run_graphcount.py --dataset count_graphlet --model PPGN_eff \
    --target 4 --h 4 --batch_size 128 --lr 5e-4 --lr_decay_factor 0.8 \
    --patience 30 --grad_clip 1.0 --epochs 900 --num_graphs 10000 \
    --num_workers 2 --res_dir results/cgra_t4_ppgn_n10k
echo TPU_QUEUE20_ALL_DONE >> "$ST"
