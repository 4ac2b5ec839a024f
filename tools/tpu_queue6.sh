#!/bin/bash
# Round-2 session-2 TPU queue, phase 4 (after tpu_queue5.sh's bash
# exits): regenerate the remaining BASELINE.md-cited quality rows whose
# artifacts were wiped (count_cycle t1, QM9 t1/t2, count_graphlet
# t0/t1/t2). count_cycle_t1 and the QM9 targets reuse the featurization
# caches written by queue4's t0 runs (features are target-agnostic).
# Deadline slightly later than queue4/5: chip must still be free well
# before the end-of-round bench (~02:57).
cd /root/repo
mkdir -p results results_archive

Q5_PID="${1:-}"
if [ -n "$Q5_PID" ]; then
  while kill -0 "$Q5_PID" 2>/dev/null; do sleep 60; done
fi

DEADLINE="${DEADLINE:-1787279700}"   # 02:35 UTC

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
    echo "SKIP $name (need ${est}s, have ${rem}s)" >> /tmp/tpu_queue6.status
    return
  fi
  echo "START $name $(date -u +%H:%M:%S)" >> /tmp/tpu_queue6.status
  timeout "$est" "$@" > "results/$name.out" 2>&1
  echo "DONE $name rc=$? $(date -u +%H:%M:%S)" >> /tmp/tpu_queue6.status
  archive "$name" "$rd"
}

run_if 1500 count_cycle_t1_n5000 results/count_cycle_t1_n5000 \
  python -u run_graphcount.py --target 1 --h 3 --batch_size 128 --lr 1e-2 \
    --epochs 1500 --num_graphs 5000 --num_workers 2 \
    --res_dir results/count_cycle_t1_n5000
run_if 1200 qm9_t1_canonical results/qm9_t1_canonical \
  python -u run_qm9.py --target 1 --num_graphs 5000 --epochs 200 \
    --res_dir results/qm9_t1_canonical
run_if 1200 qm9_t2_canonical results/qm9_t2_canonical \
  python -u run_qm9.py --target 2 --num_graphs 5000 --epochs 200 \
    --res_dir results/qm9_t2_canonical
run_if 1500 count_graphlet_t0_n5000 results/count_graphlet_t0_n5000 \
  python -u run_graphcount.py --dataset count_graphlet --target 0 --h 1 \
    --batch_size 128 --lr 8e-3 --epochs 1200 --num_graphs 5000 \
    --num_workers 2 --res_dir results/count_graphlet_t0_n5000
run_if 1500 count_graphlet_t2_n5000 results/count_graphlet_t2_n5000 \
  python -u run_graphcount.py --dataset count_graphlet --target 2 --h 1 \
    --batch_size 128 --lr 4e-3 --epochs 1200 --num_graphs 5000 \
    --num_workers 2 --res_dir results/count_graphlet_t2_n5000
run_if 1800 count_graphlet_t1_n5000 results/count_graphlet_t1_n5000 \
  python -u run_graphcount.py --dataset count_graphlet --target 1 --h 4 \
    --batch_size 256 --lr 4e-3 --epochs 1200 --num_graphs 5000 \
    --num_workers 2 --res_dir results/count_graphlet_t1_n5000
echo TPU_QUEUE6_ALL_DONE >> /tmp/tpu_queue6.status
