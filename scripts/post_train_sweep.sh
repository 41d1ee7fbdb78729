#!/usr/bin/env bash
# Post-training verification sweep against a trained checkpoint:
# approx eval -> full eval on a few objects -> offline metrics map+reduce
# over the rendered frames -> orbit video -> mesh extraction. Mirrors the
# reference's eval workflow (eval_approx.py / eval.py / calc_metrics.py /
# gen_video.py). bf16 inference (0.002 dB delta, PERF.md) with ray chunks
# sized for 16 GB HBM — the reference's 50k default assumes larger parts.
set -ex
set -o pipefail
cd "$(dirname "$0")/.."
NAME=${1:-r2train}
OVR=${2:-data.num_objects=64}   # match the trained run, e.g. data.num_objects=2048

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

# offline metrics map (adapter GT) + reduce over the rendered frames
python -m pixelnerf_tpu.apps.calc_metrics -D . -F synthetic \
  -O results/eval_$NAME 2>&1 | tail -4

# orbit video from one test object
PIXELNERF_NO_TB=1 python -m pixelnerf_tpu.apps.gen_video -n "$NAME" \
  -c conf/exp/srn.conf -F synthetic --override "$OVR" -P 0 \
  --override model.dtype=bfloat16 -R 16384 \
  --split test --subset 0 --num_views 30 --fps 10 2>&1 | tail -3

# vertex-colored mesh from the same object
PIXELNERF_NO_TB=1 python -m pixelnerf_tpu.apps.recon -n "$NAME" \
  -c conf/exp/srn.conf -F synthetic --override "$OVR" \
  --override model.dtype=bfloat16 \
  --split test --subset 0 --reso 64 -P 0 2>&1 | tail -2

echo SWEEP DONE
