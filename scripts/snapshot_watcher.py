#!/usr/bin/env python
"""Snapshot a live training checkpoint into step-tagged copies.

The trainer overwrites ``checkpoints/<name>/train_state.msgpack`` in place
(reference trainlib/trainer.py keeps only the latest file the same way);
``scripts/quality_curve.py`` wants ``train_state_step<N>.msgpack`` snapshots
to plot PSNR-vs-steps. This watcher polls the live file's mtime and, only
when it changed, deserializes the state dict to read its trained step (no
model construction needed), copying the file to a step-tagged name whenever
the step advanced by ``--every`` since the last snapshot.

    python scripts/snapshot_watcher.py -n r4train --every 2000 &
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_step(path: str):
    import flax.serialization

    with open(path, "rb") as f:
        state = flax.serialization.msgpack_restore(f.read())
    return int(state["step"])


def snapshot_if_due(live: str, last_snap: int, every: int):
    """Copy ``live`` to a step-tagged sibling when its step advanced by
    ``every`` since ``last_snap``. Returns the new last_snap (unchanged when
    not due). Copy FIRST, then read the step from the copy: the trainer can
    os.replace() the live file at any moment, and reading the step before
    copying could tag the snapshot with a step that no longer matches its
    contents. Copy-then-rename also keeps readers from seeing a torn file."""
    tmp = live + ".snap.tmp"
    shutil.copyfile(live, tmp)
    try:
        step = read_step(tmp)
        if step - last_snap < every:
            return last_snap
        dst = os.path.join(
            os.path.dirname(live), f"train_state_step{step}.msgpack"
        )
        os.replace(tmp, dst)
        tmp = None
        print(f"[snapshot] step {step} -> {dst}", flush=True)
        return step
    finally:
        if tmp is not None and os.path.exists(tmp):
            os.remove(tmp)


def main(argv=None):
    ap = argparse.ArgumentParser(allow_abbrev=False)
    ap.add_argument("--name", "-n", required=True)
    ap.add_argument("--ckpt_root", default="checkpoints")
    ap.add_argument("--every", type=int, default=2000,
                    help="min step delta between snapshots")
    ap.add_argument("--poll", type=float, default=120.0,
                    help="seconds between polls of the live file")
    ap.add_argument("--max_wait", type=float, default=3600.0,
                    help="exit if the live file does not appear/advance "
                    "for this long")
    args = ap.parse_args(argv)

    live = os.path.join(args.ckpt_root, args.name, "train_state.msgpack")
    last_snap = -args.every  # snapshot the first checkpoint seen
    last_change = time.time()
    last_mtime = 0.0
    while True:
        if os.path.exists(live):
            try:
                mtime = os.path.getmtime(live)
                if mtime != last_mtime:
                    last_change = time.time()
                    last_snap = snapshot_if_due(live, last_snap, args.every)
                    # only mark the mtime consumed once the read+copy
                    # succeeded — a torn read retries on the next poll
                    last_mtime = mtime
            except Exception as e:  # torn read etc.: retry next poll
                print(f"[snapshot] skipped: {e}", flush=True)
        if time.time() - last_change > args.max_wait:
            print("[snapshot] live file idle too long; exiting", flush=True)
            return
        time.sleep(args.poll)


if __name__ == "__main__":
    main()
