"""Export a committed-size demo checkpoint from a training run.

The reference ships pretrained weights users download before running any
eval/video app (reference README.md:85-100); this environment has no
egress, so the repo commits a small in-env-trained demo checkpoint
instead. This script strips the optimizer state from a live
``train_state.msgpack`` and stores the params in bfloat16 (the
recommended inference dtype — 0.002 dB vs f32, PERF.md), roughly a 6x
size cut vs the full TrainState (no Adam moments, half-width params).

The output keeps the ``train_state.msgpack`` filename so every eval app
loads it through the normal structure-free path
(``pixelnerf_tpu.train.state.load_variables``); resuming TRAINING from
it also works via ``load_checkpoint``'s partial-restore fallback (the
optimizer state is reinitialized, loudly).

Usage:
    python scripts/export_demo_checkpoint.py \
        --src runs/demo_srn_train/checkpoints/srn_demo \
        --dst demo/checkpoints/srn_demo
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True,
                    help="checkpoint dir holding a full train_state.msgpack")
    ap.add_argument("--dst", required=True, help="output checkpoint dir")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()

    import flax.serialization
    import jax.numpy as jnp

    from pixelnerf_tpu.train.state import CKPT_NAME, load_variables

    raw = load_variables(args.src)
    if raw is None:
        raise SystemExit(f"no loadable checkpoint under {args.src}")

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else np.float32

    def cast(x):
        x = np.asarray(x)
        # only downcast float params; ints (if any) pass through. BatchNorm
        # statistics stay f32 below — running var spans orders of magnitude
        # and bf16's 8-bit mantissa would cost real accuracy there.
        return x.astype(dt) if np.issubdtype(x.dtype, np.floating) else x

    import jax.tree_util as jtu

    out = {
        "params": jtu.tree_map(cast, raw["params"]),
        "step": int(raw.get("step", 0)),
    }
    if raw.get("batch_stats"):
        out["batch_stats"] = jtu.tree_map(np.asarray, raw["batch_stats"])

    os.makedirs(args.dst, exist_ok=True)
    path = os.path.join(args.dst, CKPT_NAME)
    data = flax.serialization.msgpack_serialize(out)
    with open(path, "wb") as f:
        f.write(data)
    print(f"wrote {path}: {len(data) / 1e6:.1f} MB "
          f"(step {out['step']}, params {args.dtype})")


if __name__ == "__main__":
    main()
