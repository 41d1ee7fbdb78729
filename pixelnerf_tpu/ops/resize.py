"""Torch-compatible image resizing as separable matmuls.

The reference upsamples each ResNet stage's feature map with
``F.interpolate(mode='bilinear', align_corners=True)`` before channel-concat
(encoder.py:153-159) and pre-scales inputs with 'area' for downscaling
(encoder.py:117-124). ``jax.image.resize`` has neither align_corners nor
torch-area semantics, so we build explicit 1-D interpolation matrices and
contract them — on TPU this turns resize into two MXU matmuls, which is both
exact and faster than a gather-based resize.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _bilinear_matrix(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic linear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for o in range(out_size):
        if align_corners:
            src = o * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (o + 0.5) * in_size / out_size - 0.5
        src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[o, lo] += 1.0 - w
        m[o, hi] += w
    return m


@functools.lru_cache(maxsize=128)
def _area_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out_size, in_size) adaptive-average (torch 'area' mode) matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for o in range(out_size):
        lo = (o * in_size) // out_size
        hi = -(-((o + 1) * in_size) // out_size)  # ceil
        m[o, lo:hi] = 1.0 / (hi - lo)
    return m


def _apply_separable(x: jax.Array, mh: np.ndarray, mw: np.ndarray) -> jax.Array:
    """x (N, H, W, C) -> (N, H', W', C) via two contractions."""
    # full fp32 precision: on TPU the default matmul precision is bf16, which
    # would quantize the interpolation weights and break torch parity
    mh = jnp.asarray(mh)
    mw = jnp.asarray(mw)
    x = jnp.einsum("oh,nhwc->nowc", mh, x, precision="highest")
    return jnp.einsum("pw,nowc->nopc", mw, x, precision="highest")


def resize_bilinear(
    x: jax.Array, out_h: int, out_w: int, align_corners: bool = True
) -> jax.Array:
    """Bilinear resize of NHWC images, matching torch F.interpolate."""
    _, h, w, _ = x.shape
    if (h, w) == (out_h, out_w):
        return x
    return _apply_separable(
        x, _bilinear_matrix(out_h, h, align_corners), _bilinear_matrix(out_w, w, align_corners)
    )


def resize_area(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Area (adaptive-average) downscale of NHWC images, matching torch."""
    _, h, w, _ = x.shape
    if (h, w) == (out_h, out_w):
        return x
    return _apply_separable(x, _area_matrix(out_h, h), _area_matrix(out_w, w))
