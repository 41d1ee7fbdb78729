"""Time the working Pallas gather formulations vs the XLA gather, full scale.

loop_ds  : per-point dynamic (1, C) row loads — f32 tables only (Mosaic
           rejects sub-8-sublane bf16 addressing on this toolchain; the
           bf16 attempt crashes the compile helper, so it is not tried).
block_mask: aligned (8, C) block load + one-hot sublane reduce — any dtype.

Run: python scripts/bench_gather_pallas.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pixelnerf_tpu.ops.gather_pallas import bilinear_corners, gather_rows_lerp
from pixelnerf_tpu.ops.grid_sample import grid_sample, _compute_source_index

H = W = 64
C = 512
P = 4096 * 96
TILE = 512


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters


from probe_gather_kernels import make_block_mask_kernel  # noqa: E402

k_block_mask = make_block_mask_kernel(C, TILE)


@functools.partial(jax.jit, static_argnames=())
def block_mask_gather(table, idx, w):
    R = table.shape[0]
    N = idx.shape[0]
    return pl.pallas_call(
        k_block_mask,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        grid=(N // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((R, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(idx, w, table)


def main():
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.uniform(-1.1, 1.1, (1, P, 2)).astype(np.float32))
    feats_f32 = jnp.asarray(rng.normal(size=(1, H, W, C)).astype(np.float32))
    ref = np.asarray(grid_sample(feats_f32, grid)[0])

    gx, gy = grid[0, :, 0], grid[0, :, 1]
    ix = _compute_source_index(gx, W, "border", True)
    iy = _compute_source_index(gy, H, "border", True)
    idx, w = bilinear_corners(ix, iy, H, W)
    idx = idx.astype(jnp.int32)
    w = w.astype(jnp.float32)

    table32 = feats_f32[0].reshape(H * W, C)

    out = gather_rows_lerp(table32, idx, w, out_dtype=jnp.float32)
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    t = timeit(
        lambda t_, i_, w_: gather_rows_lerp(t_, i_, w_, out_dtype=jnp.float32),
        table32, idx, w,
    ) * 1e3
    print(f"pallas loop_ds    f32 : {t:7.2f} ms  max|err|={err:.5f}")

    for dt in (jnp.float32, jnp.bfloat16):
        table = table32.astype(dt)
        out = block_mask_gather(table, idx, w)
        err = float(np.max(np.abs(np.asarray(out) - ref)))
        t = timeit(block_mask_gather, table, idx, w) * 1e3
        print(f"pallas block_mask {jnp.dtype(dt).name[:4]:4s}: {t:7.2f} ms  max|err|={err:.5f}")

    t_xla = timeit(lambda f_, g_: grid_sample(f_, g_), feats_f32, grid) * 1e3
    print(f"xla 4-corner f32      : {t_xla:7.2f} ms")
    t16 = timeit(
        lambda f_, g_: grid_sample(f_, g_), feats_f32.astype(jnp.bfloat16), grid
    ) * 1e3
    print(f"xla 4-corner bf16     : {t16:7.2f} ms")


if __name__ == "__main__":
    main()
