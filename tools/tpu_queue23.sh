#!/bin/bash
# Round-4 TPU queue #23 — consolidated tail of the round after the
# orphan-queue incident (earlier queue launches reported a parent-shell
# PID from $!, so "killed" queues survived as orphans and double-ran
# jobs; this queue writes its own PID to /tmp/q23.pid so it can be
# killed for real). Chained on the surviving 160k run's timeout PID.
# Order = value: t3 PPGN row -> roofline bench + HBM reports -> t4@10k.
# 90 s settles between TPU jobs (tunnel frees a dead client's HBM
# asynchronously — a back-to-back start OOM'd at 14:26).
cd /root/repo
echo $$ > /tmp/q23.pid
mkdir -p results results_archive

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 19:25:00' +%s)}"
ST=/tmp/tpu_queue23.status

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
  sleep 90  # let the tunnel release the dead client's HBM
}

# the 160k run itself was supervised by the (dead) orphan queue —
# archive its results now that it has exited
archive ccyc_t2_n160k results/ccyc_t2_n160k
echo "ARCHIVED ccyc_t2_n160k $(date -u +%H:%M:%S)" >> "$ST"
sleep 90

run_if 3400 ccyc_t3_ppgn results/ccyc_t3_ppgn \
  python -u run_graphcount.py --model PPGN_eff --target 3 --h 3 \
    --batch_size 128 --lr 5e-4 --lr_decay_factor 0.8 --patience 30 \
    --grad_clip 1.0 --epochs 900 --num_graphs 5000 \
    --num_workers 2 --res_dir results/ccyc_t3_ppgn
run_if 2700 bench_r4b python -u bench.py
run_if 600 hbm_flagship python -u tools/hbm_report.py flagship 20
run_if 600 hbm_i2gnn python -u tools/hbm_report.py i2gnn 20
run_if 600 hbm_ngnn python -u tools/hbm_report.py ngnn 20
run_if 600 hbm_ppgn python -u tools/hbm_report.py ppgn 20
run_if 2900 cgra_t4_ppgn_n10k results/cgra_t4_ppgn_n10k \
  python -u run_graphcount.py --dataset count_graphlet --model PPGN_eff \
    --target 4 --h 4 --batch_size 128 --lr 5e-4 --lr_decay_factor 0.8 \
    --patience 30 --grad_clip 1.0 --epochs 700 --num_graphs 10000 \
    --num_workers 2 --res_dir results/cgra_t4_ppgn_n10k
echo TPU_QUEUE23_ALL_DONE >> "$ST"
