#!/bin/bash
# Round-3 TPU queue, final phase (chained on tools/tpu_queue9.sh):
# degenerate single-chip driver smokes of the new mesh modes (the
# VERDICT item-4 "degenerate 1-device TPU" half; the 4-virtual-device
# halves live in tests/test_driver_mesh.py), then the peptides-struct
# GPS row if time remains.
cd /root/repo
mkdir -p results results_archive

PREV_PID="${1:-}"
if [ -n "$PREV_PID" ]; then
  while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
fi

DEADLINE="${DEADLINE:-$(date -ud '2026-08-21 10:20:00' +%s)}"
ST=/tmp/tpu_queue10.status

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
run_if 3000 gps_pepstruct_canonical results/gps_pepstruct_canonical \
  python -u run_gps.py --cfg configs/gps/peptides-struct-GPS.yaml \
    out_dir results/gps_pepstruct_canonical
echo TPU_QUEUE10_ALL_DONE >> "$ST"
