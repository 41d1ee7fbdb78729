"""LPIPS perceptual distance (VGG variant) in pure JAX.

The reference's third headline metric is VGG-LPIPS via the ``lpips`` package
(reference eval/calc_metrics.py:186, README totals include LPIPS). That
package (and torchvision) is not installed here, so this module implements
the metric natively:

- a VGG16 feature trunk (convs + maxpools, NHWC) exposing the five LPIPS
  taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3;
- the LPIPS distance: input scaling by the published shift/scale constants,
  per-tap channel-unit-normalization, squared difference, learned 1x1
  "linear head" channel weighting, spatial average, sum over taps
  (Zhang et al., CVPR 2018 — the formula the lpips package computes);
- a weight importer for the torch formats in the wild: a full
  ``lpips.LPIPS(net='vgg').state_dict()`` (``net.sliceK.<idx>.*`` +
  ``lin<k>.model.1.weight``) or a torchvision ``vgg16`` state_dict
  (``features.<idx>.*``) paired with an ``lpips`` lin-head file.

Images are NHWC float in [-1, 1] (the lpips package's convention).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features conv indices, grouped by LPIPS slice; maxpool
# sits between groups. Channel widths per group:
_VGG_PLAN: Sequence[Sequence[int]] = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
_VGG_WIDTHS: Sequence[int] = (64, 128, 256, 512, 512)

# lpips.ScalingLayer constants (inputs in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(rng: Optional[np.random.Generator] = None) -> Dict[str, Any]:
    """Random-weight parameter tree (shape contract; real use imports weights)."""
    rng = rng or np.random.default_rng(0)
    params: Dict[str, Any] = {"convs": [], "lins": []}
    c_in = 3
    for group, width in zip(_VGG_PLAN, _VGG_WIDTHS):
        g = []
        for _ in group:
            g.append(
                {
                    "kernel": rng.normal(0, 0.05, (3, 3, c_in, width)).astype(np.float32),
                    "bias": np.zeros((width,), np.float32),
                }
            )
            c_in = width
        params["convs"].append(g)
        params["lins"].append(
            np.abs(rng.normal(0, 0.05, (width,))).astype(np.float32)
        )
    return params


def _vgg_taps(params: Dict[str, Any], x: jax.Array) -> List[jax.Array]:
    """VGG16 forward returning the five LPIPS tap activations (NHWC)."""
    taps = []
    for gi, group in enumerate(params["convs"]):
        if gi > 0:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        for conv in group:
            x = jax.lax.conv_general_dilated(
                x,
                jnp.asarray(conv["kernel"]),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.asarray(conv["bias"])
            x = jax.nn.relu(x)
        taps.append(x)
    return taps


def lpips_distance(params: Dict[str, Any], img0: jax.Array, img1: jax.Array) -> jax.Array:
    """LPIPS distance between image batches.

    :param img0, img1: (B, H, W, 3) in [-1, 1]
    :return: (B,) distances
    """
    # dtype-polymorphic: follow the input dtype so a bf16 metric path works
    # (conv requires matching operand dtypes)
    shift = jnp.asarray(_SHIFT, img0.dtype)
    scale = jnp.asarray(_SCALE, img0.dtype)
    x0 = (img0 - shift) / scale
    x1 = (img1 - shift) / scale
    taps0 = _vgg_taps(params, x0)
    taps1 = _vgg_taps(params, x1)
    total = 0.0
    for t0, t1, lin in zip(taps0, taps1, params["lins"]):
        n0 = t0 / (jnp.sqrt(jnp.sum(t0 ** 2, axis=-1, keepdims=True)) + 1e-10)
        n1 = t1 / (jnp.sqrt(jnp.sum(t1 ** 2, axis=-1, keepdims=True)) + 1e-10)
        diff = (n0 - n1) ** 2                                    # (B, H, W, C)
        val = jnp.sum(diff * jnp.asarray(lin), axis=-1)          # 1x1 conv, no bias
        total = total + jnp.mean(val, axis=(1, 2))               # spatial average
    return total


class LPIPS:
    """Convenience wrapper: ``LPIPS(params)(img0, img1) -> (B,) numpy``."""

    def __init__(self, params: Dict[str, Any]):
        self.params = params
        self._fn = jax.jit(lambda a, b: lpips_distance(self.params, a, b))

    def __call__(self, img0, img1) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray(img0), jnp.asarray(img1)))

    @classmethod
    def from_torch_file(cls, path: str) -> "LPIPS":
        return cls(load_torch_lpips(path))


def import_lpips_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Torch state_dict (lpips.LPIPS full, or torchvision vgg16 + lin heads)
    -> our parameter tree. Tensor values may be torch tensors or numpy."""

    def to_np(v):
        return np.asarray(getattr(v, "numpy", lambda: v)())

    flat = {k: to_np(v) for k, v in state_dict.items()}
    idx_to_group = {}
    for gi, group in enumerate(_VGG_PLAN):
        for ci, idx in enumerate(group):
            idx_to_group[idx] = (gi, ci)

    convs: List[List[Optional[Dict[str, np.ndarray]]]] = [
        [None] * len(g) for g in _VGG_PLAN
    ]
    lins: List[Optional[np.ndarray]] = [None] * len(_VGG_PLAN)
    for key, value in flat.items():
        parts = key.split(".")
        if parts[0].startswith("lin") and parts[0][3:].isdigit():
            # lpips lin head: lin<k>.model.1.weight, shape (1, C, 1, 1)
            lins[int(parts[0][3:])] = value.reshape(-1).astype(np.float32)
            continue
        if "classifier" in parts:
            continue  # torchvision vgg16 fully-connected head — not used
        if parts[-1] not in ("weight", "bias") or not parts[-2].isdigit():
            continue  # scaling_layer.shift/scale etc. — constants we hardcode
        idx = int(parts[-2])
        if idx not in idx_to_group:
            continue  # maxpool/classifier indices
        gi, ci = idx_to_group[idx]
        entry = convs[gi][ci] or {}
        if parts[-1] == "weight":
            entry["kernel"] = value.transpose(2, 3, 1, 0).astype(np.float32)
        else:
            entry["bias"] = value.astype(np.float32)
        convs[gi][ci] = entry

    for gi, group in enumerate(convs):
        for ci, entry in enumerate(group):
            if entry is None or "kernel" not in entry or "bias" not in entry:
                raise ValueError(
                    f"LPIPS import: missing conv weights for slice {gi} conv {ci}"
                )
    if any(l is None for l in lins):
        raise ValueError("LPIPS import: missing lin-head weights (lin0..lin4)")
    return {"convs": convs, "lins": lins}


def load_torch_lpips(path: str) -> Dict[str, Any]:
    """Load LPIPS weights from a torch .pth file (CPU, weights-only safe)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return import_lpips_state_dict(sd)
