#!/bin/bash
# Round-2 session-2 TPU queue, phase 2: regenerate the BASELINE.md-cited
# quality runs whose results/ artifacts were wiped by the machine restart
# before they could be archived (VERDICT item 2: every cited number needs
# an in-repo artifact). Waits for the t2@80k run (started by
# tpu_queue3.sh) to release the chip; every run is deadline-guarded so
# the chip is free again before the end-of-round bench.
cd /root/repo
mkdir -p results results_archive

# wait for the t2 run (exact PID recorded at launch) to finish
T2_PID="${1:-}"
if [ -n "$T2_PID" ]; then
  while kill -0 "$T2_PID" 2>/dev/null; do sleep 60; done
fi

DEADLINE="${DEADLINE:-1787278800}"   # 02:20 UTC — no new run after this

archive() { # archive <name> <res_dir or "">
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

run_if() { # run_if <est_seconds> <name> <res_dir or ""> <cmd...>
  local est="$1" name="$2" rd="$3"; shift 3
  local now rem; now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt "$est" ]; then
    echo "SKIP $name (need ${est}s, have ${rem}s)" >> /tmp/tpu_queue4.status
    return
  fi
  echo "START $name $(date -u +%H:%M:%S)" >> /tmp/tpu_queue4.status
  timeout "$est" "$@" > "results/$name.out" 2>&1
  echo "DONE $name rc=$? $(date -u +%H:%M:%S)" >> /tmp/tpu_queue4.status
  archive "$name" "$rd"
}

run_if 600 sr_canonical "" \
  python -u run_sr.py
run_if 600 sr_canonical_s1 "" \
  python -u run_sr.py --seed 1
run_if 1800 exp_canonical "" \
  python -u run_exp.py --splits 10
run_if 1500 csl_canonical "" \
  python -u run_csl.py --folds 5
run_if 2100 count_cycle_t0_n5000 results/count_cycle_t0_n5000 \
  python -u run_graphcount.py --target 0 --h 3 --batch_size 128 --lr 5e-3 \
    --epochs 2000 --num_graphs 5000 --num_workers 2 --analyze \
    --res_dir results/count_cycle_t0_n5000
run_if 3000 zinc_canonical results/zinc_canonical \
  python -u run_zinc.py --layers 5 --lr 5e-4 --num_graphs 8000 --epochs 800 \
    --res_dir results/zinc_canonical
run_if 1500 zinc_cycle_canonical results/zinc_cycle_canonical \
  python -u run_zinc_cycle.py --h 3 --target 0 --num_graphs 4000 \
    --epochs 400 --res_dir results/zinc_cycle_canonical
run_if 2400 gps_canonical "" \
  python -u run_gps.py --cfg configs/gps/zinc-GPS.yaml \
    dataset.num_graphs 4000 train.epochs 300
run_if 1800 qm9_t0_canonical results/qm9_t0_canonical \
  python -u run_qm9.py --target 0 --num_graphs 5000 --epochs 250 \
    --res_dir results/qm9_t0_canonical
echo TPU_QUEUE4_ALL_DONE >> /tmp/tpu_queue4.status
