#!/bin/bash
# Round-5 TPU queue #28 (chained on 27b): third attempt at the t4
# completion run, SEGMENTED — the two prior attempts wedged in a
# device dispatch ~25-30 min in (epochs 234 and 192; the t2@160k
# failure signature). Mitigation: run in 500-epoch segments in FRESH
# processes, warm-starting from the previous segment's best
# checkpoint via --load_ckpt if available; a wedge then costs one
# segment, not the run. Falls back to plain segments if the driver
# has no resume flag (each segment still extends the recorded curve).
cd /root/repo
echo $$ > /tmp/q28.pid
mkdir -p results results_archive

WAIT_PID="${WAIT_PID:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  sleep 90
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-22 02:50:00' +%s)}"
ST=/tmp/tpu_queue28.status

archive() {
  local name="$1" rd="results/$1"
  mkdir -p "results_archive/$name"
  [ -f "results/$name.out" ] && gzip -c "results/$name.out" \
      > "results_archive/$name/stdout.txt.gz"
  if [ -d "$rd" ]; then
    [ -f "$rd/log.txt" ] && gzip -c "$rd/log.txt" \
        > "results_archive/$name/log.txt.gz"
    for f in config.json cmd_input.txt; do
      [ -f "$rd/$f" ] && cp "$rd/$f" "results_archive/$name/"
    done
  fi
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
  sleep 90
}

for seg in 1 2 3; do
  EXTRA=""
  PREV="results/cgra_t4_seg$((seg - 1))/ckpt"
  if [ "$seg" -gt 1 ] && [ -d "$PREV" ]; then
    EXTRA="--load_ckpt $PREV"
  fi
  run_if 3300 cgra_t4_seg$seg python -u run_graphcount.py \
      --dataset count_graphlet --target 4 --h 4 --model PPGN_eff \
      --num_graphs 10000 --batch_size 128 --lr 5e-4 \
      --lr_decay_factor 0.8 --patience 30 --grad_clip 1.0 \
      --epochs 500 $EXTRA --res_dir results/cgra_t4_seg$seg
done
echo TPU_QUEUE28_ALL_DONE >> "$ST"
