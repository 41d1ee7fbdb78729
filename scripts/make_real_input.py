#!/usr/bin/env python
"""Produce photo-like raw inputs for the real-image walkthrough.

The reference ships real car photos under ``input/`` and documents
preproc.py -> eval_real.py (README.md "Overview of flags", input/*.png).
This environment has no network to fetch photos, so this script renders a
stand-in: an UNSEEN synthetic sphere scene (test-stage seed — never trained
on) composited over a cluttered non-white background with soft shadow,
vignette and sensor noise, at an off-center position — i.e. everything the
GrabCut preprocessor has to actually undo (segment, ellipse-fit, crop,
white-composite, resize).

    python scripts/make_real_input.py --out raw/
then
    python -m pixelnerf_tpu.apps.preproc --input raw --output input
    python -m pixelnerf_tpu.apps.eval_real -n r5train --input input ...
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_photo(seed: int, size: int = 420, obj_px: int = 240,
               offset=(0.1, -0.06)):
    """One photo-like image: rendered unseen scene over clutter."""
    from pixelnerf_tpu.data.synthetic import SyntheticSphereDataset

    import cv2

    # test stage => scenes disjoint from every training stage. Search a few
    # (scene, view) pairs for one whose silhouette is a single connected
    # component — the segmenter keeps the largest component, same as the
    # reference's "instance 0" assumption (scripts/preproc.py:240)
    ds = SyntheticSphereDataset(
        num_objects=8, num_views=4, image_size=(obj_px, obj_px),
        stage="test", seed=seed,
    )
    rgb = mask = None
    for obj in range(8):
        for v in range(4):
            r, _d, m = ds.render_view((seed + obj) % 8, ds._poses((seed + obj) % 8)[v])
            n, _ = cv2.connectedComponents(m.astype(np.uint8))
            if n == 2 and m.mean() > 0.08:  # background + ONE blob
                rgb, mask = r, m
                break
        if rgb is not None:
            break
    assert rgb is not None, "no single-component view found"

    rng = np.random.default_rng(100 + seed)
    # product-style backdrop (the documented adequacy domain of the GrabCut
    # fallback): muted warm gradient + a few faint blobs, distinctly
    # non-white so the white-composite step is observable
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    base = np.array([0.62, 0.58, 0.52], np.float32)
    bg = base[None, None] * (0.8 + 0.3 * (1 - yy))[..., None]
    for _ in range(5):
        cx, cy, r = rng.uniform(0, 1, 3)
        col = base * rng.uniform(0.85, 1.1)
        d2 = (xx - cx) ** 2 + (yy - cy) ** 2
        w = np.exp(-d2 / (0.03 + 0.1 * r))[..., None]
        bg = bg * (1 - 0.3 * w) + col * 0.3 * w

    # paste the object off-center with a soft drop shadow
    oy = int(size * (0.5 + offset[1]) - obj_px / 2)
    ox = int(size * (0.5 + offset[0]) - obj_px / 2)
    img = bg.copy()
    m = mask.astype(np.float32)
    # shadow: blurred mask shifted down-right
    import cv2

    sh = cv2.GaussianBlur(m, (0, 0), obj_px * 0.04)
    sy, sx = oy + int(obj_px * 0.06), ox + int(obj_px * 0.04)
    img[sy:sy + obj_px, sx:sx + obj_px] *= (1 - 0.45 * sh)[..., None]
    patch = img[oy:oy + obj_px, ox:ox + obj_px]
    img[oy:oy + obj_px, ox:ox + obj_px] = (
        patch * (1 - m[..., None]) + rgb * m[..., None]
    )

    # vignette + sensor noise + mild gamma, like a phone photo
    r2 = (xx - 0.5) ** 2 + (yy - 0.5) ** 2
    img *= (1.0 - 0.35 * r2)[..., None]
    img = np.clip(img + rng.normal(0, 0.012, img.shape), 0, 1) ** 1.05
    return (img * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="raw")
    ap.add_argument("--count", type=int, default=2)
    args = ap.parse_args()
    import imageio.v2 as imageio

    os.makedirs(args.out, exist_ok=True)
    for i in range(args.count):
        path = os.path.join(args.out, f"photo{i + 1}.png")
        imageio.imwrite(path, make_photo(seed=i + 1))
        print("wrote", path)


if __name__ == "__main__":
    main()
