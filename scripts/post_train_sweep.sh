#!/usr/bin/env bash
# Post-training verification sweep against the r2train checkpoint:
# approx eval -> full eval on a few objects -> offline metrics reduce ->
# orbit video -> mesh extraction. Mirrors the reference's eval workflow
# (eval_approx.py / eval.py / calc_metrics.py / gen_video.py).
set -ex
cd "$(dirname "$0")/.."
NAME=${1:-r2train}
OVR="data.num_objects=64"

# seeded 1-view-per-object quality number (reference eval_approx.py)
PIXELNERF_NO_TB=1 python -m pixelnerf_tpu.apps.eval_approx -n "$NAME" \
  -c conf/exp/srn.conf -F synthetic --override "$OVR" -P 0 \
  --override model.dtype=bfloat16 -R 8192 \
  --split test --limit 16 --batch_size 4 2>&1 | tail -5

# full evaluator with finish.txt resume on a handful of objects
rm -rf results/eval_$NAME
PIXELNERF_NO_TB=1 python -m pixelnerf_tpu.apps.eval -n "$NAME" \
  -c conf/exp/srn.conf -F synthetic --override "$OVR" \
  --override model.dtype=bfloat16 -R 16384 \
  --split test --limit 4 -P "0" -O results/eval_$NAME \
  --write_depth 2>&1 | tail -4

# offline metrics map-reduce over the rendered frames
python -m pixelnerf_tpu.apps.calc_metrics -D results/synthetic_gt_$NAME \
  -O results/eval_$NAME --reduce_only 2>&1 | tail -4 || true

# orbit video from one test object
PIXELNERF_NO_TB=1 python -m pixelnerf_tpu.apps.gen_video -n "$NAME" \
  -c conf/exp/srn.conf -F synthetic --override "$OVR" -P 0 \
  --override model.dtype=bfloat16 -R 16384 \
  --split test --subset 0 --num_views 30 --fps 10 2>&1 | tail -3

echo SWEEP DONE
