#!/usr/bin/env python
"""Evaluate a series of checkpoint snapshots into a quality curve.

During long runs the trainer overwrites ``train_state.msgpack`` in place;
snapshotting that file periodically (``cp train_state.msgpack
train_state_step<N>.msgpack``) preserves the trajectory. This script runs
the seeded batched evaluator (``apps.eval_approx`` — PSNR/SSIM on unseen
split objects) against every snapshot and prints one JSON line per point,
giving the PSNR-vs-steps curve that distinguishes learning from
memorization (the reference has no such tool; its eval is one-checkpoint).

    python scripts/quality_curve.py -n r3train -c conf/exp/srn.conf \
        -F synthetic --override data.num_objects=2048 -P "0 4" \
        --split test --limit 16 --batch_size 4

Snapshots are discovered as ``checkpoints/<name>/train_state_step*.msgpack``
plus the live ``train_state.msgpack`` (labeled by its trained step).
"""
from __future__ import annotations

import argparse
import glob
import io
import json
import os
import re
import shutil
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="PSNR/SSIM curve over checkpoint snapshots",
        allow_abbrev=False,
    )
    ap.add_argument("--name", "-n", required=True)
    ap.add_argument("--checkpoints_path", default="checkpoints")
    ap.add_argument(
        "--steps", default=None,
        help="comma-separated step subset (default: all snapshots)",
    )
    args, passthrough = ap.parse_known_args(argv)

    ckdir = os.path.join(args.checkpoints_path, args.name)
    snaps = []
    for path in glob.glob(os.path.join(ckdir, "train_state_step*.msgpack")):
        m = re.search(r"step(\d+)\.msgpack$", path)
        if m:
            snaps.append((int(m.group(1)), path))
    live = os.path.join(ckdir, "train_state.msgpack")
    if os.path.isfile(live):
        snaps.append((None, live))  # step read from the state itself
    if not snaps:
        raise SystemExit(f"no snapshots under {ckdir}")
    want = (
        {int(s) for s in args.steps.split(",")} if args.steps else None
    )

    from pixelnerf_tpu.apps.eval_approx import main as eval_approx_main

    # label the live checkpoint by the step stored in its TrainState
    resolved = []
    for step, path in snaps:
        if step is None:
            try:
                from flax import serialization

                with open(path, "rb") as f:
                    step = int(
                        serialization.msgpack_restore(f.read())["step"]
                    )
            except Exception:
                pass  # unreadable/legacy state: keep the null label
        resolved.append((step, path))
    resolved.sort(key=lambda s: (s[0] is None, s[0]))

    curve = []
    for step, path in resolved:
        if want is not None and (step is None or step not in want):
            continue
        with tempfile.TemporaryDirectory() as tmp:
            os.makedirs(os.path.join(tmp, args.name))
            shutil.copy(path, os.path.join(tmp, args.name, "train_state.msgpack"))
            buf = io.StringIO()
            with redirect_stdout(buf):
                res = eval_approx_main(
                    ["-n", args.name, "--checkpoints_path", tmp] + passthrough
                )
        point = {
            "step": step,
            "file": os.path.basename(path),
            "psnr": round(float(res[0]), 4) if res else None,
            "ssim": round(float(res[1]), 4) if res else None,
        }
        if res is None:
            point["raw_tail"] = buf.getvalue().strip().splitlines()[-3:]
        curve.append(point)
        print(json.dumps(point), flush=True)
    return curve


if __name__ == "__main__":
    main()
