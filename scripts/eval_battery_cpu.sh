#!/bin/bash
# Full-fidelity (64+32 sample) quality evals of a trained checkpoint on the
# host CPU, for when the accelerator is unavailable. Covers the three
# source-view settings BASELINE tracks (1-view SRN-style, 2-view, 3-view
# DTU-style). One JSON-ish line per setting. Slow (~10-25 min each on CPU).
#
# Usage: scripts/eval_battery_cpu.sh <expname> [limit]
set -uo pipefail
cd "$(dirname "$0")/.."
NAME="${1:-r3train}"
LIMIT="${2:-16}"
for SRC in "0" "0 4" "0 4 8"; do
  NV=$(echo "$SRC" | wc -w)
  echo "=== ${NV}-view (-P \"$SRC\") limit=$LIMIT ==="
  python -m pixelnerf_tpu.apps.eval_approx -n "$NAME" -c conf/exp/srn.conf \
    -F synthetic --override data.num_objects=2048 --cpu \
    -P "$SRC" --limit "$LIMIT" -B 4 2>&1 | tail -3
done
