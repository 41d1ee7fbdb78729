"""Bisect why ops.grid_sample (flat form) is slower than an inline flat
gather at NS>1. Variants differ in lerp shape, reshape placement, and the
nested-jit wrapper."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pixelnerf_tpu.ops.grid_sample import _compute_source_index, grid_sample


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters


def make_variant(style):
    def fn(feats, grid):
        ns, h, w, c = feats.shape
        P = grid.shape[1]
        ix = _compute_source_index(grid[..., 0], w, "border", True)
        iy = _compute_source_index(grid[..., 1], h, "border", True)
        ix0 = jnp.floor(ix)
        iy0 = jnp.floor(iy)
        wx = (ix - ix0)[..., None]
        wy = (iy - iy0)[..., None]
        off = (jnp.arange(ns, dtype=jnp.int32) * (h * w))[:, None]
        flat = feats.reshape(1, ns * h * w, c)

        def g(yi, xi):
            yi = jnp.clip(yi, 0, h - 1)
            xi = jnp.clip(xi, 0, w - 1)
            idx = (yi * w + xi + off).astype(jnp.int32).reshape(1, ns * P)
            v = jnp.take_along_axis(flat, idx[..., None], axis=1)
            if style == "reshape_each":
                return v.reshape(ns, P, c)
            return v

        iy0i = iy0.astype(jnp.int32)
        ix0i = ix0.astype(jnp.int32)
        v00 = g(iy0i, ix0i)
        v01 = g(iy0i, ix0i + 1)
        v10 = g(iy0i + 1, ix0i)
        v11 = g(iy0i + 1, ix0i + 1)
        if style == "reshape_each":
            pass  # weights stay (ns, P, 1)
        else:
            wx = wx.reshape(1, ns * P, 1)
            wy = wy.reshape(1, ns * P, 1)
        top = v00 * (1.0 - wx) + v01 * wx
        bot = v10 * (1.0 - wx) + v11 * wx
        out = top * (1.0 - wy) + bot * wy
        return out.reshape(ns, P, c)

    return fn


def main():
    rng = np.random.default_rng(0)
    H = W = 64
    C = 512
    P = 393216
    for NS in (2, 3):
        feats = jnp.asarray(
            rng.normal(size=(NS, H, W, C)).astype(np.float32)
        ).astype(jnp.bfloat16)
        grid = jnp.asarray(rng.uniform(-1, 1, (NS, P, 2)).astype(np.float32))

        t_mod = timeit(
            jax.jit(lambda f, g: grid_sample(f, g, "bilinear", "border", True)),
            feats, grid,
        )
        t_flat = timeit(jax.jit(make_variant("flat_lerp")), feats, grid)
        t_resh = timeit(jax.jit(make_variant("reshape_each")), feats, grid)
        # correctness cross-check
        a = grid_sample(feats, grid, "bilinear", "border", True)
        b = jax.jit(make_variant("flat_lerp"))(feats, grid)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(
            f"NS={NS}: module {t_mod*1e3:6.2f} ms | flat-lerp {t_flat*1e3:6.2f}"
            f" ms | reshape-each {t_resh*1e3:6.2f} ms | err {err:.1e}"
        )


if __name__ == "__main__":
    main()
