"""Record a golden LPIPS fixture from the REAL ``lpips`` package.

``utils/lpips.py`` is golden-tested against an in-repo torch referee that
reimplements the published algorithm (tests/test_lpips.py) — but a shared
misreading of the algorithm would fool both sides. This recorder pins our
implementation to the actual package's outputs (the exact function the
reference calls at eval/calc_metrics.py:186): run it once in a networked
environment, commit the (tiny) fixture, and
``tests/test_lpips.py::test_lpips_matches_recorded_package_outputs``
auto-unskips.

    pip install lpips torchvision
    python scripts/fetch_lpips_weights.py --out weights/lpips_vgg.pth
    python scripts/record_lpips_golden.py \
        --weights weights/lpips_vgg.pth --out tests/fixtures/lpips_golden.npz

The fixture stores only the deterministic input SEEDS, their sha256 (so the
replaying side proves it regenerated the same pixels), and the package's
distances — a few hundred bytes, no weights. The replay side additionally
needs ``weights/lpips_vgg.pth`` (same file the recorder used; its sha256 is
stored too).
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Deterministic test images: seeded uniform noise + a smooth gradient pair,
# in [-1, 1] NHWC exactly as lpips.LPIPS(net='vgg') consumes (it wants NCHW;
# both sides permute identically). MUST match tests/test_lpips.py.
CASES = ((17, (2, 64, 64, 3)), (29, (1, 37, 51, 3)), (43, (3, 32, 32, 3)))


def golden_inputs():
    pairs = []
    for seed, shape in CASES:
        rng = np.random.default_rng(seed)
        a = rng.uniform(-1, 1, shape).astype(np.float32)
        b = np.clip(a + rng.normal(0, 0.15, shape), -1, 1).astype(np.float32)
        pairs.append((a, b))
    return pairs


def inputs_digest(pairs) -> str:
    h = hashlib.sha256()
    for a, b in pairs:
        h.update(a.tobytes())
        h.update(b.tobytes())
    return h.hexdigest()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", default="weights/lpips_vgg.pth")
    parser.add_argument("--out", default="tests/fixtures/lpips_golden.npz")
    args = parser.parse_args(argv)

    import lpips  # the real package — networked environments only
    import torch

    model = lpips.LPIPS(net="vgg", verbose=False)
    model.eval()

    pairs = golden_inputs()
    dists = []
    with torch.no_grad():
        for a, b in pairs:
            ta = torch.from_numpy(a).permute(0, 3, 1, 2)
            tb = torch.from_numpy(b).permute(0, 3, 1, 2)
            dists.append(model(ta, tb).reshape(-1).numpy())

    with open(args.weights, "rb") as f:
        weights_sha = hashlib.sha256(f.read()).hexdigest()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez(
        args.out,
        dists=np.concatenate(dists).astype(np.float32),
        case_seeds=np.array([s for s, _ in CASES], np.int64),
        inputs_sha256=np.array(inputs_digest(pairs)),
        weights_sha256=np.array(weights_sha),
        lpips_version=np.array(getattr(lpips, "__version__", "unknown")),
    )
    print(f"wrote {args.out}: dists={np.concatenate(dists)}")
    print(f"inputs sha256 {inputs_digest(pairs)[:16]}… weights {weights_sha[:16]}…")


if __name__ == "__main__":
    main()
