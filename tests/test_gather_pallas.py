"""Pallas VMEM gather kernels vs the XLA grid_sample (interpret mode on CPU).

On hardware these kernels tie XLA's gather (see PERF.md); they are kept as
the study + a building block for other table widths. Semantics are pinned
here so they can't rot.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.ops.gather_pallas import (
    bilinear_corners,
    bilinear_pair_bases,
    gather_packed_lerp,
    gather_rows_lerp,
    pack_lr_table,
)
from pixelnerf_tpu.ops.grid_sample import _compute_source_index, grid_sample

H = W = 16
C = 128
P = 300  # not a TILE multiple: exercises padding


def _setup(dtype):
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.uniform(-1.2, 1.2, (1, P, 2)).astype(np.float32))
    feats = jnp.asarray(
        rng.normal(size=(1, H, W, C)).astype(np.float32)
    ).astype(dtype)
    ref = np.asarray(grid_sample(feats, grid)[0], np.float32)
    gx, gy = grid[0, :, 0], grid[0, :, 1]
    ix = _compute_source_index(gx, W, "border", True)
    iy = _compute_source_index(gy, H, "border", True)
    return feats, ix, iy, ref


def test_gather_rows_lerp_matches_grid_sample():
    feats, ix, iy, ref = _setup(jnp.float32)
    idx, w = bilinear_corners(ix, iy, H, W)
    out = gather_rows_lerp(
        feats[0].reshape(H * W, C), idx, w, out_dtype=jnp.float32,
        interpret=True,
    )
    assert out.shape == (P, C)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_gather_packed_lerp_matches_bf16_grid_sample():
    feats16, ix, iy, ref16 = _setup(jnp.bfloat16)
    base, w = bilinear_pair_bases(ix, iy, H, W)
    table = pack_lr_table(feats16[0])
    assert table.dtype == jnp.int32 and table.shape == (H * W, C)
    out = gather_packed_lerp(table, base, w, interpret=True)
    # identical inputs (bf16 rows, f32 lerp) => bit-equal to the XLA path
    np.testing.assert_allclose(np.asarray(out), ref16, atol=1e-6)


def test_pack_lr_table_halves():
    """High 16 bits hold the pixel, low 16 its x-neighbor (edge-clamped)."""
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.normal(size=(4, 5, 8)).astype(np.float32))
    t = np.asarray(pack_lr_table(lat)).reshape(4, 5, 8)
    left = np.asarray(lat.astype(jnp.bfloat16), np.float32)
    hi = ((t >> 16) & 0xFFFF).astype(np.uint16)
    lo = (t & 0xFFFF).astype(np.uint16)
    hi_f = (hi.astype(np.uint32) << 16).view(np.float32)
    lo_f = (lo.astype(np.uint32) << 16).view(np.float32)
    np.testing.assert_array_equal(hi_f, left)
    np.testing.assert_array_equal(lo_f[:, :-1], left[:, 1:])
    np.testing.assert_array_equal(lo_f[:, -1], left[:, -1])
