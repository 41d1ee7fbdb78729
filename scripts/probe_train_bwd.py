"""Attribute the train step's cost: forward loss vs backward variants.

Isolates whether the backward's gather-transpose (scatter-add into the
feature map) is the train-throughput floor. Run on the real chip:

    python scripts/probe_train_bwd.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pixelnerf_tpu.config import ConfigNode, load_config
    from pixelnerf_tpu.models import make_model
    from pixelnerf_tpu.render.renderer import RenderConfig, render_rays_chunked
    from pixelnerf_tpu.train import make_render_loss
    from pixelnerf_tpu.utils import geometry

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = load_config(os.path.join(root, "conf", "exp", "srn.conf"))
    net = make_model(conf["model"])
    cfg = RenderConfig(n_coarse=64, n_fine=32, n_fine_depth=16, white_bkgd=True)
    loss_fn = make_render_loss(conf.get_config("loss", ConfigNode()))

    SB, NS, H, W = 4, 1, 128, 128
    R = 2048
    chunk = 256
    rng = np.random.default_rng(0)
    pose = geometry.look_at(np.array([0.0, 0.1, 1.3], np.float32), np.zeros(3))
    images = jnp.asarray(
        rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32))
    poses = jnp.asarray(np.broadcast_to(pose, (SB, NS, 4, 4)).copy())
    focal = jnp.asarray(np.float32(131.25))
    variables = net.init(
        jax.random.PRNGKey(0), images, poses, focal,
        jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)),
    )
    cam_rays = np.asarray(
        geometry.gen_rays(poses[:, 0], W, H, focal, 0.8, 1.8)
    ).reshape(SB, -1, 8)
    rays = jnp.asarray(
        np.tile(cam_rays, (1, max(1, R // cam_rays.shape[1]), 1))[:, :R])
    rgb_gt = jnp.asarray(rng.uniform(0, 1, (SB, R, 3)).astype(np.float32))

    def forward(params, stop_enc=False, stop_feats=False):
        vs = {**variables, "params": params}
        enc = net.apply(vs, images, poses, focal, method=net.encode)
        if stop_enc:
            enc = jax.tree_util.tree_map(jax.lax.stop_gradient, enc)

        def query_fn(xyz, viewdirs, coarse):
            if stop_feats:
                feats = net.apply(vs, enc, xyz, viewdirs=viewdirs,
                                  method=net.query_features)
                feats = jax.lax.stop_gradient(feats)
                return net.apply(vs, enc, feats, coarse=coarse,
                                 method=net.query_mlp)
            return net.apply(vs, enc, xyz, viewdirs=viewdirs, coarse=coarse,
                             method=net.query)

        out = render_rays_chunked(
            query_fn, rays, jax.random.PRNGKey(0), cfg, ray_chunk=chunk,
            use_viewdirs=True, remat=True,
        )
        loss, _ = loss_fn(out, rgb_gt)
        return loss

    def timeit(fn, label, iters=6):
        f = jax.jit(fn)
        t_c0 = time.perf_counter()
        out = f(variables["params"])
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        t_compile = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(variables["params"])
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:>32}: {dt*1e3:7.1f} ms  ({SB*R/dt/1e3:6.1f}k rays/s,"
              f" compile {t_compile:.0f}s)", flush=True)

    timeit(lambda p: forward(p), "forward loss")
    timeit(lambda p: jax.grad(forward)(p), "grad full")
    timeit(lambda p: jax.grad(lambda q: forward(q, stop_enc=True))(p),
           "grad stop-encoding")
    timeit(lambda p: jax.grad(lambda q: forward(q, stop_feats=True))(p),
           "grad stop-features (MLP only)")


if __name__ == "__main__":
    main()
