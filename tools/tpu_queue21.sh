#!/bin/bash
# Round-4 TPU queue #21 (replaces #20; chained on queue 19's bash PID):
#  1. ccyc_t2_n160k — RETRY of the compressed-pool data-scaling point.
#     The first attempt died on a torn featurize-cache read: queue 19's
#     cache-wait glob matched the train .npz while the CPU-side prep
#     (running pre-atomic-publish code) was still writing it
#     (BadZipFile). Caches are complete now; this retry also waits for
#     the prep's done marker.
#  2. cgra_t4_ppgn_n10k — t4 2x-data follow-up if time remains.
cd /root/repo
mkdir -p results results_archive

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
for i in $(seq 1 60); do
  [ -f /tmp/prep160k.done ] && break
  sleep 30
done

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 19:05:00' +%s)}"
ST=/tmp/tpu_queue21.status

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

run_if 6000 ccyc_t2_n160k results/ccyc_t2_n160k \
  python -u run_graphcount.py --target 2 --h 2 --batch_size 128 \
    --lr 5e-3 --epochs 1200 --num_graphs 160000 --compress_pools \
    --num_workers 2 --res_dir results/ccyc_t2_n160k
# t3 PPGN retry: the 14:26 attempt hit RESOURCE_EXHAUSTED right after
# bench_r4 exited (residual device memory over the tunnel); 900 epochs
# is plenty (t4's best epoch was 467)
run_if 3400 ccyc_t3_ppgn results/ccyc_t3_ppgn \
  python -u run_graphcount.py --model PPGN_eff --target 3 --h 3 \
    --batch_size 128 --lr 5e-4 --lr_decay_factor 0.8 --patience 30 \
    --grad_clip 1.0 --epochs 900 --num_graphs 5000 \
    --num_workers 2 --res_dir results/ccyc_t3_ppgn
run_if 3600 cgra_t4_ppgn_n10k results/cgra_t4_ppgn_n10k \
  python -u run_graphcount.py --dataset count_graphlet --model PPGN_eff \
    --target 4 --h 4 --batch_size 128 --lr 5e-4 --lr_decay_factor 0.8 \
    --patience 30 --grad_clip 1.0 --epochs 900 --num_graphs 10000 \
    --num_workers 2 --res_dir results/cgra_t4_ppgn_n10k
echo TPU_QUEUE21_ALL_DONE >> "$ST"
