"""Fetch the VGG-LPIPS weights calc_metrics needs (networked environments).

The reference's third headline metric is VGG-LPIPS (reference
eval/calc_metrics.py:186; README totals include it). This image ships no
torchvision/lpips weights and has no egress, so metric runs here skip LPIPS
(loudly). In an environment WITH network access, run:

    python scripts/fetch_lpips_weights.py --out weights/lpips_vgg.pth

which downloads the torchvision ImageNet ``vgg16`` feature weights and the
official lpips v0.1 VGG linear heads, verifies them, merges them into a
single .pth consumable by ``utils/lpips.py::LPIPS.from_torch_file`` (the
importer accepts torchvision ``features.<idx>.*`` keys plus
``lin<k>.model.1.weight`` heads), and smoke-tests the import.

Verification: the torchvision artifact embeds the first 8 hex chars of its
sha256 in the filename (``vgg16-397923af.pth``) — checked here. The lpips
lin-head file publishes no digest, so it is validated structurally (exact
key set lin0..lin4, shapes (1, C, 1, 1) with C = 64/128/256/512/512) and
its sha256 is printed for the record.
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
import tempfile
import urllib.request

VGG16_URL = "https://download.pytorch.org/models/vgg16-397923af.pth"
LIN_URL = (
    "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
    "master/lpips/weights/v0.1/vgg.pth"
)
LIN_WIDTHS = (64, 128, 256, 512, 512)


def _fetch(url: str) -> bytes:
    print(f"fetching {url}")
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.read()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="weights/lpips_vgg.pth")
    parser.add_argument(
        "--skip_verify", action="store_true",
        help="warn instead of failing on verification mismatch",
    )
    args = parser.parse_args(argv)

    import torch

    def check(ok: bool, msg: str):
        if ok:
            return
        if args.skip_verify:
            print("WARNING:", msg, file=sys.stderr)
        else:
            raise SystemExit(msg + " (re-run with --skip_verify to accept)")

    vgg_bytes = _fetch(VGG16_URL)
    digest = hashlib.sha256(vgg_bytes).hexdigest()
    # torchvision hub convention: filename carries sha256[:8]
    expect_prefix = VGG16_URL.rsplit("-", 1)[1].split(".")[0]
    check(
        digest.startswith(expect_prefix),
        f"vgg16 sha256 {digest} does not start with {expect_prefix}",
    )
    print(f"vgg16 sha256 {digest} OK")

    lin_bytes = _fetch(LIN_URL)
    print(f"lin-heads sha256 {hashlib.sha256(lin_bytes).hexdigest()} (recorded)")

    with tempfile.TemporaryDirectory() as td:
        vgg_path = os.path.join(td, "vgg16.pth")
        lin_path = os.path.join(td, "lin.pth")
        with open(vgg_path, "wb") as f:
            f.write(vgg_bytes)
        with open(lin_path, "wb") as f:
            f.write(lin_bytes)
        vgg_sd = torch.load(vgg_path, map_location="cpu", weights_only=True)
        lin_sd = torch.load(lin_path, map_location="cpu", weights_only=True)

    # structural validation of the lin heads
    want_keys = {f"lin{k}.model.1.weight" for k in range(5)}
    check(
        set(lin_sd.keys()) == want_keys,
        f"unexpected lin-head keys: {sorted(lin_sd.keys())}",
    )
    for k, width in enumerate(LIN_WIDTHS):
        shape = tuple(lin_sd[f"lin{k}.model.1.weight"].shape)
        check(
            shape == (1, width, 1, 1),
            f"lin{k} shape {shape} != (1, {width}, 1, 1)",
        )

    merged = {k: v for k, v in vgg_sd.items() if k.startswith("features.")}
    merged.update(lin_sd)

    out_dir = os.path.dirname(os.path.abspath(args.out))
    os.makedirs(out_dir, exist_ok=True)
    torch.save(merged, args.out)

    # smoke-test: the JAX importer must accept the merged file
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pixelnerf_tpu.utils.lpips import LPIPS

    lp = LPIPS.from_torch_file(args.out)
    import numpy as np

    d = lp(np.zeros((1, 64, 64, 3), np.float32), np.ones((1, 64, 64, 3), np.float32))
    print(f"wrote {args.out}; import OK, lpips(black, white) = {float(d[0]):.4f}")
    print(f"use: python -m pixelnerf_tpu.apps.calc_metrics ... --lpips_weights {args.out}")


if __name__ == "__main__":
    main()
