#!/bin/bash
# Round-3 TPU queue, final phase (replaces tpu_queue10.sh; chained on
# tools/tpu_queue9.sh's bash):
#   1-2. degenerate single-chip driver smokes of --mesh halo / dp_ep
#        (VERDICT item-4's "1-device TPU" half).
#   3.   count_graphlet t4 non-data lever, take 2: h=5 is structurally
#        impossible (the ESC encoding's base-6 packing bounds h <= 4,
#        same as the reference's 1800-dim layout — the h5 run failed
#        with exactly that error), so the lever is model WIDTH:
#        hidden 512 at the README config (h=4, bs 32, 20k graphs).
#   4.   peptides-struct GPS row if not already archived.
cd /root/repo
mkdir -p results results_archive

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 10:20:00' +%s)}"
ST=/tmp/tpu_queue11.status

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

run_if 900 smoke_tpu_mesh_halo results/smoke_tpu_mesh_halo \
  python -u run_graphcount.py --target 0 --h 2 --num_graphs 60 \
    --batch_size 8 --epochs 2 --mesh halo --mesh_devices 1 \
    --membership_pools 1 --res_dir results/smoke_tpu_mesh_halo
run_if 900 smoke_tpu_mesh_dp_ep results/smoke_tpu_mesh_dp_ep \
  python -u run_graphcount.py --target 0 --h 2 --num_graphs 60 \
    --batch_size 8 --epochs 2 --mesh dp_ep --mesh_devices 1 --mesh_dp 1 \
    --membership_pools 1 --res_dir results/smoke_tpu_mesh_dp_ep
run_if 4200 cgra_t4_w512_n20k results/cgra_t4_w512_n20k \
  python -u run_graphcount.py --dataset count_graphlet --target 4 --h 4 \
    --batch_size 32 --lr 5e-3 --hidden 512 --epochs 1200 \
    --num_graphs 20000 --num_workers 2 \
    --res_dir results/cgra_t4_w512_n20k
if [ ! -d results_archive/gps_pepstruct_canonical ]; then
  run_if 3000 gps_pepstruct_canonical results/gps_pepstruct_canonical \
    python -u run_gps.py --cfg configs/gps/peptides-struct-GPS.yaml \
      out_dir results/gps_pepstruct_canonical
fi
echo TPU_QUEUE11_ALL_DONE >> "$ST"
