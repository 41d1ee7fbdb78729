"""Pixel-aligned feature gather (``grid_sample``) for TPU.

The reference's single non-GEMM hot op is ``F.grid_sample`` over the encoder
latent (reference src/model/encoder.py:102-108, called per query point from
src/model/models.py:213). Checkpoint parity depends on its exact semantics:
bilinear interpolation, ``padding_mode='border'``, ``align_corners=True``.

This module implements those semantics (plus zeros/reflection padding and
nearest mode for completeness) as pure XLA: four flat gathers + a lerp. XLA
fuses the address arithmetic and the gathers are differentiable (the
transpose is a scatter-add into the feature map, which training needs).

Pallas VMEM-resident variants live in ``gather_pallas.py``; on v5e they
exactly tie XLA's gather (dynamic sub-tile row access is a ~27 cycle/point
hardware floor — see PERF.md), so this XLA path stays the default.

Layout is NHWC (TPU-native), not the reference's NCHW.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """[-1, 1] grid coordinate -> pixel coordinate (torch convention)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(coord: jax.Array, low: float, high: float) -> jax.Array:
    """Reflect coordinate into [low, high] (torch reflection padding)."""
    span = high - low
    coord = jnp.abs(coord - low) % (2.0 * span)
    return low + jnp.minimum(coord, 2.0 * span - coord)


def _compute_source_index(
    coord: jax.Array, size: int, padding_mode: str, align_corners: bool
) -> jax.Array:
    x = _unnormalize(coord, size, align_corners)
    if padding_mode == "border":
        x = jnp.clip(x, 0.0, size - 1)
    elif padding_mode == "reflection":
        if align_corners:
            x = _reflect(x, 0.0, size - 1)
        else:
            x = _reflect(x, -0.5, size - 0.5)
        x = jnp.clip(x, 0.0, size - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"Unknown padding_mode {padding_mode!r}")
    return x


@functools.partial(jax.jit, static_argnames=("mode", "padding_mode", "align_corners"))
def grid_sample(
    features: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "border",
    align_corners: bool = True,
) -> jax.Array:
    """Sample ``features`` at normalized grid points.

    :param features: (N, H, W, C) feature maps (NHWC)
    :param grid: (N, P, 2) sampling locations, (x, y) in [-1, 1]
    :param mode: 'bilinear' | 'nearest'
    :return: (N, P, C) sampled features
    """
    N, H, W, C = features.shape
    P = grid.shape[1]
    gx, gy = grid[..., 0], grid[..., 1]
    ix = _compute_source_index(gx, W, padding_mode, align_corners)
    iy = _compute_source_index(gy, H, padding_mode, align_corners)

    # Flat offset-indexed formulation: fold the batch (view) dimension into
    # the row index against ONE (N*H*W, C) table instead of a batched gather,
    # and keep everything — gathers AND the lerp — in (1, N*P, ...) shape
    # until the very end. Value-identical, but on TPU the batched (N>1)
    # gather costs ~2.3x the per-point floor, and lerping in (N, P, C) with
    # (N, P, 1) weights costs ~2x again (measured NS=2 per 786k points:
    # 46.2 ms batched, 39.4 ms flat-gather + batched lerp, 20.3 ms fully
    # flat — the multi-view conditioning hot path, reference
    # src/model/encoder.py:102-108; see scripts/probe_flat_gather.py).
    # grid may carry more batch entries than the feature map (broadcast:
    # one map sampled by Ng point sets) — offsets then stay 0
    Ng = grid.shape[0]
    assert Ng == N or N == 1, f"batch mismatch: features {N}, grid {Ng}"
    flat = features.reshape(1, N * H * W, C)
    off = (jnp.arange(Ng, dtype=jnp.int32) * (H * W if N > 1 else 0))[:, None]

    def gather(iy_idx: jax.Array, ix_idx: jax.Array) -> jax.Array:
        """Gather pixels at integer (y, x) -> (1, Ng*P, C); zero OOB if needed."""
        if padding_mode == "zeros":
            valid = (
                (ix_idx >= 0) & (ix_idx <= W - 1) & (iy_idx >= 0) & (iy_idx <= H - 1)
            ).reshape(1, Ng * P)
        else:
            valid = None
        ycl = jnp.clip(iy_idx, 0, H - 1)
        xcl = jnp.clip(ix_idx, 0, W - 1)
        idx = (ycl * W + xcl + off).astype(jnp.int32).reshape(1, Ng * P)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        if valid is not None:
            vals = jnp.where(valid[..., None], vals, 0.0)
        return vals

    if mode == "nearest":
        # torch rounds half away from... uses nearbyint (round half to even)
        return gather(
            jnp.round(iy).astype(jnp.int32), jnp.round(ix).astype(jnp.int32)
        ).reshape(Ng, P, C)
    if mode != "bilinear":
        raise ValueError(f"Unknown mode {mode!r}")

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx = (ix - ix0).reshape(1, Ng * P, 1)
    wy = (iy - iy0).reshape(1, Ng * P, 1)
    ix0i = ix0.astype(jnp.int32)
    iy0i = iy0.astype(jnp.int32)

    v00 = gather(iy0i, ix0i)
    v01 = gather(iy0i, ix0i + 1)
    v10 = gather(iy0i + 1, ix0i)
    v11 = gather(iy0i + 1, ix0i + 1)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return (top * (1.0 - wy) + bot * wy).reshape(Ng, P, C)


def build_quad_features(features: jax.Array) -> jax.Array:
    """Precompute the 4 bilinear corners per pixel: (N, H, W, C) -> (N, H, W, 4C).

    Row (y, x) holds [f(y,x), f(y,x+1), f(y+1,x), f(y+1,x+1)] with edge
    clamping — exactly the four corners border-padded bilinear sampling at a
    point in cell (y, x) touches. XLA's TPU gather is index-count-bound (a
    4-corner lookup costs 4 row-gathers), so trading 4x feature memory for a
    single gather per query point makes the pixel-aligned lookup ~4x faster.
    """
    right = jnp.concatenate([features[:, :, 1:], features[:, :, -1:]], axis=2)
    down = jnp.concatenate([features[:, 1:], features[:, -1:]], axis=1)
    downright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    return jnp.concatenate([features, right, down, downright], axis=-1)


@functools.partial(jax.jit, static_argnames=("align_corners",))
def grid_sample_quad(
    quad: jax.Array, grid: jax.Array, align_corners: bool = True
) -> jax.Array:
    """Bilinear/border grid sample against a quad-corner map (ONE gather).

    :param quad: (N, H, W, 4C) from :func:`build_quad_features`
    :param grid: (N, P, 2) normalized (x, y) in [-1, 1]
    :return: (N, P, C) — identical values to
        ``grid_sample(features, grid, 'bilinear', 'border', align_corners)``
    """
    N, H, W, C4 = quad.shape
    P = grid.shape[1]
    C = C4 // 4
    gx, gy = grid[..., 0], grid[..., 1]
    ix = _compute_source_index(gx, W, "border", align_corners)
    iy = _compute_source_index(gy, H, "border", align_corners)
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    # flat offset-indexed single-table gather with the lerp kept in
    # (1, N*P, ...) shape (see grid_sample: both the batched N>1 gather and
    # the (N, P, 1)-weighted lerp are ~2x off the flat formulation on TPU)
    wx = (ix - ix0).reshape(1, N * P, 1)
    wy = (iy - iy0).reshape(1, N * P, 1)
    off = (jnp.arange(N, dtype=jnp.int32) * (H * W))[:, None]
    idx = (iy0.astype(jnp.int32) * W + ix0.astype(jnp.int32) + off).reshape(
        1, N * P
    )

    flat = quad.reshape(1, N * H * W, C4)
    rows = jnp.take_along_axis(flat, idx[..., None], axis=1)   # (1, N*P, 4C)
    v00 = rows[..., 0 * C : 1 * C]
    v01 = rows[..., 1 * C : 2 * C]
    v10 = rows[..., 2 * C : 3 * C]
    v11 = rows[..., 3 * C : 4 * C]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return (top * (1.0 - wy) + bot * wy).reshape(N, P, C)
