"""Microbenchmark: pixel-aligned gather cost vs row width / corner count.

Measures the hot gather (ops/grid_sample) in isolation on the attached TPU:
- 4-corner bilinear at C = 512 / 1536 (raw latent vs baked tz map widths)
- quad-map single-gather variants
- f32 vs bf16 rows

Informs the baked-encoding design: the XLA TPU gather was measured
index-count-bound in round 1, so the 3x wider baked rows should be ~free.
Run: python scripts/bench_gather.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.ops.grid_sample import (
    build_quad_features,
    grid_sample,
    grid_sample_quad,
)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters


def main():
    H = W = 64
    P = 4096 * 96  # points per fine chunk at ray_chunk=4096
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.uniform(-1, 1, (1, P, 2)).astype(np.float32))

    for C in (512, 1536):
        for dt in (jnp.bfloat16, jnp.float32):
            feats = jnp.asarray(
                rng.normal(size=(1, H, W, C)).astype(np.float32)
            ).astype(dt)
            f = jax.jit(lambda f_, g_: grid_sample(f_, g_))
            dt_ms = timeit(f, feats, grid) * 1e3
            gb = P * 4 * C * jnp.dtype(dt).itemsize / 1e9
            print(
                f"4-corner C={C:5d} {jnp.dtype(dt).name:8s}: {dt_ms:7.2f} ms "
                f"({gb / (dt_ms / 1e3):6.1f} GB/s eff, "
                f"{4 * P / dt_ms * 1e3 / 1e6:6.1f} M idx/s)"
            )
        feats = jnp.asarray(
            rng.normal(size=(1, H, W, C)).astype(np.float32)
        ).astype(jnp.bfloat16)
        quad = build_quad_features(feats)
        fq = jax.jit(lambda q_, g_: grid_sample_quad(q_, g_))
        dt_ms = timeit(fq, quad, grid) * 1e3
        gb = P * 4 * C * 2 / 1e9
        print(
            f"quad     C={C:5d} bfloat16: {dt_ms:7.2f} ms "
            f"({gb / (dt_ms / 1e3):6.1f} GB/s eff, "
            f"{P / dt_ms * 1e3 / 1e6:6.1f} M idx/s)"
        )


if __name__ == "__main__":
    main()
