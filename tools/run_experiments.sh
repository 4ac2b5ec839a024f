#!/bin/bash
# Multi-config / multi-seed sweep launcher — the role of the reference's
# GraphGPS/run/run_experiments.sh + wrapper.sb (SLURM there; serial here,
# since this host drives a single tunneled TPU chip and concurrent TPU
# processes contend; see .claude/skills/verify/SKILL.md).
#
# Usage: tools/run_experiments.sh [seeds] [cfg ...]
#   tools/run_experiments.sh 3 configs/gps/zinc-GPS.yaml configs/gps/zinc-GPS-linear.yaml
set -e
cd "$(dirname "$0")/.."
SEEDS="${1:-1}"
shift || true
CFGS=("$@")
[ ${#CFGS[@]} -eq 0 ] && CFGS=(configs/gps/zinc-GPS.yaml)
for cfg in "${CFGS[@]}"; do
  name=$(basename "$cfg" .yaml)
  echo "=== $cfg (num_runs=$SEEDS) ==="
  python -u run_gps.py --cfg "$cfg" num_runs "$SEEDS" \
    out_dir "results/sweep_$name" 2>&1 | tail -3
done
