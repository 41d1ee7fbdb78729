"""Decompose the train-forward vs inference-render MFU delta (VERDICT r4 #6).

PERF.md's training roofline reports the train forward at 0.60 MFU vs the
inference render's 0.694 and attributes the whole 4x remat re-forward at
the lower number. But the roofline probe's "forward loss" row INCLUDES the
encode (ResNet34 on 4x128^2) and the MSE, while the inference bench times
the render alone from a precomputed encoding. This probe separates the
terms at the exact chip-filling shapes (SB=4, NS=1, R=2048, chunk 256,
bf16, staged query):

  A. render only, precomputed encoding, train=False   (the bench number)
  B. render only, precomputed encoding, train=True    (train-mode sampling)
  C. B + MSE loss                                     (+ loss arithmetic)
  D. encode + render + loss                           (the roofline row)

Run on the real chip:  python scripts/probe_fwd_delta.py
"""
import json
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
    conf["model"]["dtype"] = "bfloat16"
    net = make_model(conf["model"])
    cfg = RenderConfig(n_coarse=64, n_fine=32, n_fine_depth=16,
                       white_bkgd=True)
    loss_fn = make_render_loss(conf.get_config("loss", ConfigNode()))

    SB, NS, H, W, R, chunk = 4, 1, 128, 128, 2048, 256
    rng = np.random.default_rng(0)
    pose = geometry.look_at(np.array([0.0, 0.1, 1.3], np.float32),
                            np.zeros(3))
    images = jnp.asarray(
        rng.uniform(-1, 1, (SB, NS, H, W, 3)).astype(np.float32))
    poses = jnp.asarray(np.broadcast_to(pose, (SB, NS, 4, 4)).copy())
    focal = jnp.asarray(np.float32(131.25))
    variables = net.init(jax.random.PRNGKey(0), images, poses, focal,
                         jnp.zeros((SB, 8, 3)), jnp.ones((SB, 8, 3)))
    enc0 = net.apply(variables, images, poses, focal, method=net.encode)
    cam = np.asarray(
        geometry.gen_rays(poses[:, 0], W, H, focal, 0.8, 1.8)
    ).reshape(SB, -1, 8)
    rays = jnp.asarray(cam[:, :R])
    rgb_gt = jnp.asarray(
        rng.uniform(0, 1, (SB, R, 3)).astype(np.float32))

    def staged_query(vs, enc):
        def features_fn(xyz, viewdirs):
            return net.apply(vs, enc, xyz, viewdirs=viewdirs,
                             method=net.query_features)

        def mlp_fn(feats, coarse):
            return net.apply(vs, enc, feats, coarse=coarse,
                             method=net.query_mlp)

        return features_fn, mlp_fn

    def render(vs, enc, train):
        return render_rays_chunked(
            staged_query(vs, enc), rays, jax.random.PRNGKey(0), cfg,
            ray_chunk=chunk, train=train, use_viewdirs=True,
        )

    variants = {
        "A_render_eval": lambda vs: render(vs, enc0, False)["fine"]["rgb"],
        "B_render_train": lambda vs: render(vs, enc0, True)["fine"]["rgb"],
        "C_render_train_loss": lambda vs: loss_fn(
            render(vs, enc0, True), rgb_gt)[0],
        "D_encode_render_loss": lambda vs: loss_fn(
            render(vs, net.apply(vs, images, poses, focal,
                                 method=net.encode), True), rgb_gt)[0],
    }

    out = {"config": f"SB={SB} NS={NS} R={R} chunk={chunk} bf16 staged"}
    for name, fn in variants.items():
        f = jax.jit(fn)
        o = f(variables)
        jax.device_get(jnp.sum(o))
        t0 = time.perf_counter()
        iters = 12
        for _ in range(iters):
            o = f(variables)
        jax.device_get(jnp.sum(o))
        dt = (time.perf_counter() - t0) / iters
        out[name] = {"ms": round(dt * 1e3, 2),
                     "rays_per_sec": round(SB * R / dt, 1)}
        print(f"{name:>22}: {dt*1e3:7.2f} ms  "
              f"({SB*R/dt/1e3:6.1f}k rays/s)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
