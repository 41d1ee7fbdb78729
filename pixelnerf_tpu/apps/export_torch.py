"""Export a trained checkpoint as a reference-compatible torch state_dict.

    python -m pixelnerf_tpu.apps.export_torch -n my_exp \
        --out checkpoints/my_exp/pixel_nerf_latest

The resulting file loads directly into the reference's PixelNeRFNet
(models.py:268-298), closing the loop: reference checkpoints import here
(automatic in the eval apps), and models trained here export back.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..models.torch_import import export_state_dict
from ..train.state import load_variables


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", "-n", type=str, required=True)
    parser.add_argument("--checkpoints_path", type=str, default="checkpoints")
    parser.add_argument("--out", type=str, default=None,
                        help="output path (default: <ckpt_dir>/pixel_nerf_latest)")
    args = parser.parse_args(argv)

    ckpt_dir = os.path.join(args.checkpoints_path, args.name)
    variables = load_variables(ckpt_dir)
    assert variables is not None, f"no checkpoint found in {ckpt_dir}"
    step = variables.pop("step", 0)
    sd = export_state_dict(variables)
    out = args.out or os.path.join(ckpt_dir, "pixel_nerf_latest")
    try:
        import torch

        torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, out)
    except ImportError:
        out = out + ".npz"
        np.savez(out, **{k: np.asarray(v) for k, v in sd.items()})
    print(f"Exported step-{int(np.asarray(step))} weights "
          f"({len(sd)} tensors) to {out}")


if __name__ == "__main__":
    main()
