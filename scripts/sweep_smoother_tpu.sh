#!/bin/bash
# Round-4 smoother + batch sweep on the real TPU (VERDICT round-3 item 1):
# re-validates the round-3 CPU sweep winners under the round-4 correction
# cascade, then scans batch size at the winning smoother (the trailing batch
# dim is the TPU lane dim — B=8 uses 8/128 lanes of every VPU op).
# Appends one bench.py JSON line per config to results/smoother_sweep_r4_tpu.jsonl.
set -u
cd "$(dirname "$0")/.."
out=results/smoother_sweep_r4_tpu.jsonl
: > "$out"
for cfg in "2 0.25" "4 0.10" "6 0.08" "8 0.06"; do
  set -- $cfg
  echo "=== smooth_degree=$1 smooth_alpha=$2" >&2
  timeout 900 python bench.py --smooth_degree "$1" --smooth_alpha "$2" \
    2>/dev/null | tail -1 >> "$out"
done
echo "=== batch scan at sweep winner (filled in by the runner)" >&2
