"""Per-stage timing of the render hot loop on the real chip.

Times, in isolation, for the reference SRN config (128^2 source, 1 view,
512x5 MLP):
- features stage: camera transform + uv projection + gather + posenc
- MLP stage: conditioned ResnetFC on precomputed features
- full render chunk (coarse+fine) for reference

Run: python scripts/bench_stages.py
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


def main():
    from pixelnerf_tpu.config import load_config
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.utils import geometry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_config(os.path.join(root, "conf", "exp", "srn.conf"))
    conf["model"]["dtype"] = os.environ.get("BENCH_DTYPE", "bfloat16")
    net = make_model(conf["model"])

    SB, NS, H, W = 1, 1, 128, 128
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32))
    pose = geometry.look_at(np.array([0, 0, 1.3], np.float32), np.zeros(3))
    poses = jnp.asarray(pose[None, None])
    focal = jnp.asarray(np.float32(131.25))
    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal,
        jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)),
    )
    enc = net.apply(variables, images, poses, focal, method=net.encode)

    # chunk-scale point batch: 4096 rays x 96 fine samples
    N = 4096 * 96
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (SB, N, 3)).astype(np.float32))
    xyz = xyz + jnp.array([0.0, 0.0, 0.0])
    vd = jnp.asarray(rng.normal(size=(SB, N, 3)).astype(np.float32))
    vd = vd / jnp.linalg.norm(vd, axis=-1, keepdims=True)

    feat_fn = jax.jit(
        lambda xyz, vd: net.apply(
            variables, enc, xyz, viewdirs=vd, method=net.query_features
        )
    )
    t_feat = timeit(feat_fn, xyz, vd)
    feats = feat_fn(xyz, vd)
    lat_ms = "x".join(str(s) for s in feats[0].shape)
    print(f"features stage ({N} pts, latent {lat_ms} {feats[0].dtype}): "
          f"{t_feat*1e3:.2f} ms")

    for fast in (False, True):
        mlp_fn = jax.jit(
            lambda f, fast=fast: net.apply(
                variables, enc, f, coarse=False, fast=fast, method=net.query_mlp
            )
        )
        t_mlp = timeit(mlp_fn, feats)
        label = "pallas" if fast else "xla"
        print(f"MLP stage {label} ({N} pts): {t_mlp*1e3:.2f} ms")

    full = jax.jit(
        lambda xyz, vd: net.apply(
            variables, enc, xyz, viewdirs=vd, coarse=False, method=net.query
        )
    )
    t_full = timeit(full, xyz, vd)
    print(f"full query ({N} pts): {t_full*1e3:.2f} ms")


if __name__ == "__main__":
    main()
