#!/bin/bash
# Round-2 session-2 TPU queue, phase 3 (runs after tpu_queue4.sh's bash
# exits): extend the hard-target evidence (t3 6-cycles at 40k graphs —
# the 20k run was tail-artifact-dominated) and add a quality number for
# the PPGN_eff counting model (it has a bench line but no quality row).
# Same deadline guard as queue4 so the chip is free for the end-of-round
# bench.
cd /root/repo
mkdir -p results results_archive

Q4_PID="${1:-}"
if [ -n "$Q4_PID" ]; then
  while kill -0 "$Q4_PID" 2>/dev/null; do sleep 60; done
fi

DEADLINE="${DEADLINE:-1787278800}"   # 02:20 UTC

archive() {
  local name="$1" rd="$2"
  mkdir -p "results_archive/$name"
  [ -f "results/$name.out" ] && gzip -c "results/$name.out" \
      > "results_archive/$name/stdout.txt.gz"
  if [ -n "$rd" ] && [ -d "$rd" ]; then
    [ -f "$rd/log.txt" ] && gzip -c "$rd/log.txt" \
        > "results_archive/$name/log.txt.gz"
    [ -f "$rd/config.json" ] && cp "$rd/config.json" "results_archive/$name/"
    [ -f "$rd/cmd_input.txt" ] && cp "$rd/cmd_input.txt" "results_archive/$name/"
  fi
}

run_if() {
  local est="$1" name="$2" rd="$3"; shift 3
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt "$est" ]; then
    echo "SKIP $name (need ${est}s, have ${rem}s)" >> /tmp/tpu_queue5.status
    return
  fi
  echo "START $name $(date -u +%H:%M:%S)" >> /tmp/tpu_queue5.status
  timeout "$est" "$@" > "results/$name.out" 2>&1
  echo "DONE $name rc=$? $(date -u +%H:%M:%S)" >> /tmp/tpu_queue5.status
  archive "$name" "$rd"
}

run_if 3300 ccyc_t3_n40k results/ccyc_t3_n40k \
  python -u run_graphcount.py --target 3 --h 3 --batch_size 128 --lr 1e-2 \
    --epochs 1400 --num_graphs 40000 --num_workers 2 \
    --res_dir results/ccyc_t3_n40k
run_if 2100 count_cycle_t0_ppgn results/count_cycle_t0_ppgn \
  python -u run_graphcount.py --model PPGN_eff --target 0 --h 3 \
    --batch_size 128 --lr 5e-3 --epochs 800 --num_graphs 1500 \
    --num_workers 2 --res_dir results/count_cycle_t0_ppgn
echo TPU_QUEUE5_ALL_DONE >> /tmp/tpu_queue5.status
