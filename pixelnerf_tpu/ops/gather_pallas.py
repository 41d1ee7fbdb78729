"""Pallas TPU kernel: pixel-aligned bilinear gather from a VMEM-resident
feature map.

The render hot loop's only non-GEMM op is the 4-corner bilinear gather
(reference src/model/encoder.py:102-108). XLA's TPU gather streams the
feature table from HBM at an effective ~140-150 GB/s for 1 KB rows
(index-count-bound); but the table itself is tiny — 64x64x512 bf16 = 4 MB
for the reference SRN config — so the whole map fits in VMEM. This kernel
pins the table in VMEM across grid steps and performs per-point dynamic
row loads + the corner lerp on-chip, so HBM traffic drops to the indices,
weights, and the (N, C) output.

Inference-only (no VJP): training keeps the differentiable XLA gather
(its transpose is the scatter-add the encoder gradients need).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # points per grid step (Mosaic rejects larger SMEM index blocks)


def _round_up(x: int, m: int) -> int:
    """Shared by fused_mlp.py / fused_field.py — one canonical copy."""
    return -(-x // m) * m


def packed_bilerp(t0, t1, wx, wy):
    """Unpack two LR-packed int32 rows (:func:`pack_lr_table`) and bilerp.

    The mask/shift/bitcast unpack and the top/bot lerp association are the
    bit-exactness contract vs the XLA bf16 gather — this ONE definition is
    used by both ``_gather_packed_kernel`` and the fused gather+MLP kernel
    (ops/fused_field.py); keep them from diverging.
    """
    f32 = jnp.float32

    def unpack(t):
        left = jax.lax.bitcast_convert_type(t & jnp.int32(-65536), f32)
        right = jax.lax.bitcast_convert_type(t << 16, f32)
        return left, right

    l0, r0 = unpack(t0)
    l1, r1 = unpack(t1)
    top = l0 + wx * (r0 - l0)
    bot = l1 + wx * (r1 - l1)
    return top + wy * (bot - top)


def _gather_kernel(idx_ref, w_ref, table_ref, out_ref, *, tile: int):
    def body(j, _):
        acc = w_ref[j, 0] * table_ref[pl.ds(idx_ref[j, 0], 1), :]
        acc += w_ref[j, 1] * table_ref[pl.ds(idx_ref[j, 1], 1), :]
        acc += w_ref[j, 2] * table_ref[pl.ds(idx_ref[j, 2], 1), :]
        acc += w_ref[j, 3] * table_ref[pl.ds(idx_ref[j, 3], 1), :]
        out_ref[pl.ds(j, 1), :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tile, body, 0)


def _gather_packed_kernel(base_ref, w_ref, table_ref, out_ref, *, tile: int):
    """Bilinear gather from an LR-PACKED int32 table.

    Each int32 lane holds both x-corners of a tap as bf16 halves
    (left << 16 | right; see :func:`pack_lr_table`), so ONE supported
    (1, C) dynamic row load fetches two corners — the per-point cost is
    bounded by the dynamic-load count (~7 cycles each on v5e), and Mosaic
    rejects both bf16 sub-tile rows and dynamic (2, C) slices, making the
    packed-int32 row the only 2-corners-per-load layout that compiles.
    Unpack is mask/shift + same-width bitcast (bf16 -> f32 by zero-filled
    mantissa), so results match the XLA bf16-latent gather bit-for-bit.
    """

    def body(j, _):
        t0 = table_ref[pl.ds(base_ref[j, 0], 1), :]                  # (1, C) i32
        t1 = table_ref[pl.ds(base_ref[j, 1], 1), :]
        row = packed_bilerp(t0, t1, w_ref[j, 0], w_ref[j, 1])
        out_ref[pl.ds(j, 1), :] = row.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tile, body, 0)


def pack_lr_table(latent: jax.Array) -> jax.Array:
    """Pack each pixel and its x-neighbor into int32 lanes (bf16 halves).

    :param latent: (H, W, C) feature map (any float dtype; rounded to bf16)
    :return: (H*W, C) int32 — lane c of row y*W+x holds
        ``bf16(f[y,x,c]) << 16 | bf16(f[y,x+1,c])`` (x-edge clamped; the
        clamped tap's lerp weight is exactly 0, so the duplicate is unused)
    """
    H, W, C = latent.shape
    left = latent.astype(jnp.bfloat16)
    right = jnp.concatenate([left[:, 1:], left[:, -1:]], axis=1)
    lo = jax.lax.bitcast_convert_type(left, jnp.uint16).astype(jnp.uint32)
    hi = jax.lax.bitcast_convert_type(right, jnp.uint16).astype(jnp.uint32)
    packed = (lo << 16) | hi
    # NOTE high half = LEFT: the kernel's `& 0xFFFF0000` keeps left, `<< 16`
    # recovers right.
    return packed.astype(jnp.int32).reshape(H * W, C)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def gather_packed_lerp(
    table: jax.Array,
    base: jax.Array,
    w: jax.Array,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """Bilinear gather via LR-packed row loads (2 loads per point).

    :param table: (R, C) int32 from :func:`pack_lr_table`
    :param base: (N, 2) int32 [y0*W+x0, y1*W+x0] row bases (y1 pre-clamped)
    :param w: (N, 2) float32 [wx, wy] fractional offsets
    :return: (N, C) in ``out_dtype``
    """
    R, C = table.shape
    N = base.shape[0]
    n_pad = _round_up(max(N, 1), TILE)
    if n_pad != N:
        base = jnp.pad(base, ((0, n_pad - N), (0, 0)))
        w = jnp.pad(w, ((0, n_pad - N), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_gather_packed_kernel, tile=TILE),
        out_shape=jax.ShapeDtypeStruct((n_pad, C), out_dtype),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((R, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * n_pad * C,
            bytes_accessed=n_pad * (16 + 2 * C * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
    )(base.astype(jnp.int32), w.astype(jnp.float32), table)
    return out[:N]


def bilinear_pair_bases(
    ix: jax.Array, iy: jax.Array, H: int, W: int
) -> tuple[jax.Array, jax.Array]:
    """Row bases + fractional weights for :func:`gather_pairs_lerp`.

    :param ix, iy: (...,) pixel coords already border-clamped
    :return: base (..., 2) int32 [y0*W+x0, y1*W+x0]; w (..., 2) f32 [wx, wy]
    """
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx = (ix - ix0).astype(jnp.float32)
    wy = (iy - iy0).astype(jnp.float32)
    x0 = jnp.clip(ix0.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(iy0.astype(jnp.int32), 0, H - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)   # clamped: wy == 0 there, exact
    base = jnp.stack([y0 * W + x0, y1 * W + x0], axis=-1)
    w = jnp.stack([wx, wy], axis=-1)
    return base, w


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def gather_rows_lerp(
    table: jax.Array,
    idx: jax.Array,
    w: jax.Array,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Weighted 4-row gather: out[n] = sum_k w[n,k] * table[idx[n,k]].

    :param table: (R, C) feature rows — must fit in VMEM (~<=12 MB)
    :param idx: (N, 4) int32 row indices (pre-clamped)
    :param w: (N, 4) float32 corner weights
    :return: (N, C) in ``out_dtype`` (default: table dtype)
    """
    R, C = table.shape
    N = idx.shape[0]
    out_dtype = out_dtype or table.dtype
    n_pad = _round_up(max(N, 1), TILE)
    if n_pad != N:
        idx = jnp.pad(idx, ((0, n_pad - N), (0, 0)))
        w = jnp.pad(w, ((0, n_pad - N), (0, 0)))

    grid = (n_pad // TILE,)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, tile=TILE),
        out_shape=jax.ShapeDtypeStruct((n_pad, C), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((R, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * n_pad * C,
            bytes_accessed=n_pad * (32 + 2 * C * jnp.dtype(out_dtype).itemsize),
            transcendentals=0,
        ),
    )(idx.astype(jnp.int32), w.astype(jnp.float32), table)
    return out[:N]


def bilinear_corners(
    ix: jax.Array, iy: jax.Array, H: int, W: int
) -> tuple[jax.Array, jax.Array]:
    """Corner row indices + lerp weights for border-padded bilinear sampling.

    :param ix, iy: (...,) unnormalized pixel coords, already border-clamped
        to [0, W-1] / [0, H-1] (ops.grid_sample._compute_source_index)
    :return: idx (..., 4) int32 rows into the (H*W, C) table,
             w (..., 4) f32 weights [w00, w01, w10, w11]
    """
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx = (ix - ix0).astype(jnp.float32)
    wy = (iy - iy0).astype(jnp.float32)
    x0 = jnp.clip(ix0.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(iy0.astype(jnp.int32), 0, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    idx = jnp.stack(
        [y0 * W + x0, y0 * W + x1, y1 * W + x0, y1 * W + x1], axis=-1
    )
    w = jnp.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], axis=-1
    )
    return idx, w
