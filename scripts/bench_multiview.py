"""Multi-view (NS>1) stage attribution on the real chip.

VERDICT r2 #1: DTU 3-view runs at 40.7% MFU vs 62.7% single-view. This
script isolates where the NS-scaling time goes:

- batched gather (N=NS maps, the shipped formulation) vs a single flat
  offset-indexed gather over the concatenated (NS*H*W, C) table
- per-view elementwise feature stage (camera transform + posenc)
- pre-combine vs post-combine MLP
- full query at NS=1/2/3

Run: python scripts/bench_multiview.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters


def bench_raw_gathers(P=393216, H=64, W=64, C=512, dtype=jnp.bfloat16):
    """Raw 4-corner bilinear gather: batched (N=NS) vs flat offset-indexed."""
    rng = np.random.default_rng(0)
    for NS in (1, 2, 3):
        feats = jnp.asarray(
            rng.normal(size=(NS, H, W, C)).astype(np.float32)
        ).astype(dtype)
        grid = jnp.asarray(
            rng.uniform(-1, 1, (NS, P, 2)).astype(np.float32)
        )

        from pixelnerf_tpu.ops.grid_sample import grid_sample

        t_b = timeit(
            jax.jit(lambda f, g: grid_sample(f, g, "bilinear", "border", True)),
            feats, grid,
        )

        # flat formulation: one (1, NS*H*W, C) table, per-view row offsets
        @jax.jit
        def flat_gather(feats, grid):
            from pixelnerf_tpu.ops.grid_sample import _compute_source_index

            ns, h, w, c = feats.shape
            flat = feats.reshape(1, ns * h * w, c)
            ix = _compute_source_index(grid[..., 0], w, "border", True)
            iy = _compute_source_index(grid[..., 1], h, "border", True)
            ix0 = jnp.floor(ix)
            iy0 = jnp.floor(iy)
            wx = (ix - ix0)[..., None]
            wy = (iy - iy0)[..., None]
            off = (jnp.arange(ns, dtype=jnp.int32) * (h * w))[:, None]

            def g(yi, xi):
                yi = jnp.clip(yi, 0, h - 1)
                xi = jnp.clip(xi, 0, w - 1)
                idx = (yi * w + xi + off).reshape(1, -1)
                return jnp.take_along_axis(flat, idx[..., None], axis=1)

            iy0i = iy0.astype(jnp.int32)
            ix0i = ix0.astype(jnp.int32)
            v00 = g(iy0i, ix0i)
            v01 = g(iy0i, ix0i + 1)
            v10 = g(iy0i + 1, ix0i)
            v11 = g(iy0i + 1, ix0i + 1)
            wx = wx.reshape(1, -1, 1)
            wy = wy.reshape(1, -1, 1)
            top = v00 * (1.0 - wx) + v01 * wx
            bot = v10 * (1.0 - wx) + v11 * wx
            return (top * (1.0 - wy) + bot * wy).reshape(ns, -1, c)

        t_f = timeit(flat_gather, feats, grid)

        # correctness
        a = grid_sample(feats, grid, "bilinear", "border", True)
        b = flat_gather(feats, grid)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(
            f"raw gather NS={NS} ({NS*P} pts total): batched {t_b*1e3:7.2f} ms"
            f" | flat-offset {t_f*1e3:7.2f} ms | maxerr {err:.2e}"
        )


def bench_model_stages():
    from pixelnerf_tpu.config import load_config
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.utils import geometry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_config(os.path.join(root, "conf", "exp", "srn.conf"))
    conf["model"]["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    net = make_model(conf["model"])

    SB, H, W = 1, 128, 128
    rng = np.random.default_rng(0)
    N = 4096 * 96
    for NS in (1, 2, 3):
        images = jnp.asarray(
            rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32)
        )
        pose = np.stack([
            geometry.look_at(
                np.array([np.sin(0.4 * v), 0.2 * v, 1.3 * np.cos(0.4 * v)],
                         np.float32),
                np.zeros(3),
            )
            for v in range(NS)
        ])
        poses = jnp.asarray(pose[None])
        focal = jnp.asarray(np.float32(131.25))
        variables = net.init(
            jax.random.PRNGKey(0), images, poses, focal,
            jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)),
        )
        enc = net.apply(variables, images, poses, focal, method=net.encode)

        xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (SB, N, 3)).astype(np.float32))
        vd = jnp.asarray(rng.normal(size=(SB, N, 3)).astype(np.float32))
        vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

        feat_fn = jax.jit(
            lambda xyz, vd, enc=enc: net.apply(
                variables, enc, xyz, viewdirs=vd, method=net.query_features
            )
        )
        t_feat = timeit(feat_fn, xyz, vd)
        feats = feat_fn(xyz, vd)

        mlp_fn = jax.jit(
            lambda f, enc=enc: net.apply(
                variables, enc, f, coarse=False, method=net.query_mlp
            )
        )
        t_mlp = timeit(mlp_fn, feats)

        full = jax.jit(
            lambda xyz, vd, enc=enc: net.apply(
                variables, enc, xyz, viewdirs=vd, coarse=False, method=net.query
            )
        )
        t_full = timeit(full, xyz, vd)
        print(
            f"model NS={NS} ({N} pts/view-set): features {t_feat*1e3:7.2f} ms"
            f" | MLP {t_mlp*1e3:7.2f} ms | full {t_full*1e3:7.2f} ms"
        )


if __name__ == "__main__":
    print("== raw 4-corner gather: batched vs flat offset-indexed ==")
    bench_raw_gathers()
    print("== model stages at NS=1/2/3 ==")
    bench_model_stages()
